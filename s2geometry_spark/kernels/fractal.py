"""Koch-snowflake fractal loop generator (s2fractal.h / s2fractal.cc) —
the reference's stress-test fixture family: coastline-like loops with a
controllable fractal dimension in [1.0, 2.0), built by recursive 4-way
edge subdivision of an equilateral triangle in the tangent plane at the
loop center and projected to the sphere (3 * 4^n edges at level n;
multi-level fractals stop subdividing each edge at a uniformly random
level in [min_level, max_level]).

Ported as a deterministic generator (NumPy Generator seed instead of an
absl BitGen); used by the coverer / validation / containment stress
tests the reference drives with this class (s2region_coverer_test.cc
RandomCells, s2loop_test.cc fractal loops).
"""

from __future__ import annotations

import math

import numpy as np

__all__ = ["Fractal"]


class Fractal:
    """Mirrors S2Fractal: set ``max_level`` (and optionally ``min_level``
    / ``dimension``) then call ``make_loop(frame_z, nominal_radius)``."""

    def __init__(self, seed: int = 0):
        self._rng = np.random.default_rng(seed)
        self.max_level = -1
        self._min_level_arg = -1
        self.min_level = -1
        self.dimension = math.log(4) / math.log(3)  # standard Koch curve
        self._compute_offsets()

    # -- configuration (s2fractal.cc:35-75) --------------------------------

    def set_max_level(self, max_level: int) -> None:
        assert max_level >= 0
        self.max_level = max_level
        self._compute_min_level()

    def set_min_level(self, min_level: int) -> None:
        assert min_level >= -1
        self._min_level_arg = min_level
        self._compute_min_level()

    def _compute_min_level(self) -> None:
        if 0 <= self._min_level_arg <= self.max_level:
            self.min_level = self._min_level_arg
        else:
            self.min_level = self.max_level

    def set_fractal_dimension(self, dimension: float) -> None:
        assert 1.0 <= dimension < 2.0
        self.dimension = dimension
        self._compute_offsets()

    def _compute_offsets(self) -> None:
        # each subdivision splits an edge into 4 pieces of length
        # edge_fraction; dimension d satisfies 4 * edge_fraction^d = 1
        self.edge_fraction = 4.0 ** (-1.0 / self.dimension)
        self.offset_fraction = math.sqrt(self.edge_fraction - 0.25)

    def set_level_for_approx_max_edges(self, max_edges: int) -> None:
        # values in [3*(4**n)/2, 3*(4**n)*2) map to level n
        self.set_max_level(round(0.5 * math.log2(max_edges / 3)))

    def set_level_for_approx_min_edges(self, min_edges: int) -> None:
        self.set_min_level(round(0.5 * math.log2(min_edges / 3)))

    # -- radius envelope (s2fractal.cc:76-103) ------------------------------

    def min_radius_factor(self) -> float:
        k_min_dim = 1.0852230903040407
        if self.dimension >= k_min_dim:
            return math.sqrt(1 + 3 * self.edge_fraction * (self.edge_fraction - 1))
        return 0.5

    def max_radius_factor(self) -> float:
        return max(1.0, self.offset_fraction * math.sqrt(3) + 0.5)

    # -- vertex generation (s2fractal.cc:105-141) ---------------------------

    def _r2_vertices(self) -> np.ndarray:
        v0 = np.array([1.0, 0.0])
        v1 = np.array([-0.5, math.sqrt(3) / 2])
        v2 = np.array([-0.5, -math.sqrt(3) / 2])
        out: list[np.ndarray] = []
        self._helper(v0, v1, 0, out)
        self._helper(v1, v2, 0, out)
        self._helper(v2, v0, 0, out)
        return np.stack(out)

    def _helper(self, v0, v4, level, out) -> None:
        levels_remaining = self.max_level - level + 1
        if level >= self.min_level and (
            self._rng.random() < 1.0 / levels_remaining
        ):
            out.append(v0)
            return
        d = v4 - v0
        ortho = np.array([-d[1], d[0]])  # Vector2::Ortho (90deg CCW)
        v1 = v0 + self.edge_fraction * d
        v2 = 0.5 * (v0 + v4) - self.offset_fraction * ortho
        v3 = v4 - self.edge_fraction * d
        self._helper(v0, v1, level + 1, out)
        self._helper(v1, v2, level + 1, out)
        self._helper(v2, v3, level + 1, out)
        self._helper(v3, v4, level + 1, out)

    def make_loop(self, center: np.ndarray, nominal_radius_rad: float) -> np.ndarray:
        """(n,3) CCW loop vertices around ``center`` with the first vertex
        toward the frame's x-axis — drawn in the tangent plane at
        ``center`` and gnomonically projected (so the loop never
        self-intersects, same argument as the reference's MakeLoop)."""
        c = np.asarray(center, np.float64)
        c = c / math.sqrt(float(c @ c))
        # tangent frame (S2::GetFrame: any orthonormal basis with z = c)
        ref = np.array([0.0, 0.0, 1.0]) if abs(c[2]) < 0.9 else np.array([1.0, 0.0, 0.0])
        u = np.cross(ref, c)
        u /= np.linalg.norm(u)
        v = np.cross(c, u)
        r2 = self._r2_vertices() * nominal_radius_rad
        P = r2[:, 0:1] * u[None, :] + r2[:, 1:2] * v[None, :] + c[None, :]
        return P / np.linalg.norm(P, axis=1)[:, None]
