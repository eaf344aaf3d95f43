"""S2PolylineSimplifier (s2polyline_simplifier.h/.cc): maximal output
edges that intersect a sequence of target discs and optionally avoid
others — the disc-constraint simplifier S2Builder's simplify_edge_chains
is built on (distinct from S2Polyline::SubsampleVertices, which lives in
kernels/simplify.py).

The class maintains an S1Interval ``window`` of acceptable bearings from
the current source vertex; every disc shrinks (TargetDisc) or carves
(AvoidDisc) that window with CONSERVATIVE error padding (GetSemiwidth's
rounded error budget), so the guarantees hold under exact arithmetic.

``simplify_polyline`` is the header's canonical usage loop
(s2polyline_simplifier.h:28-41): greedy maximal edges staying within
``tolerance`` of every input vertex.  All arithmetic is scalar libm in
PINNED expression shapes so the DuckDB oracle in operators/simplify.py
(disc_simplify_oracle_sql) replays every branch decision bit-for-bit —
the same recipe as subsample_vertices.
"""

from __future__ import annotations

import math

from .simplify import (
    _PI,
    _ivl_contains,
    _ivl_fast_contains,
    _ivl_from_point_expanded,
    _ivl_intersection,
    _ivl_length,
)

__all__ = ["PolylineSimplifier", "simplify_polyline", "chord2_of_radius"]

_DBL_ERR = 0.5 * 2.220446049250313e-16  # 0.5 * DBL_EPSILON


def chord2_of_radius(radius_rad: float) -> float:
    """S1ChordAngle::Radians(r).length2() — pinned (2 sin(r/2))^2."""
    s = 2.0 * math.sin(0.5 * min(math.pi, radius_rad))
    return s * s


class PolylineSimplifier:
    """Port of S2PolylineSimplifier; radii are squared chord lengths."""

    def init(self, src) -> None:
        """Init (s2polyline_simplifier.cc:28-58): start a new output edge
        at ``src``, with the tangent basis built from the SMALLEST
        |component| axis (x_dir/y_dir are intentionally unnormalized)."""
        sx, sy, sz = float(src[0]), float(src[1]), float(src[2])
        self.src = (sx, sy, sz)
        self.lo, self.hi = -_PI, _PI  # full window
        self.ranges_to_avoid: list[tuple[float, float, bool]] = []
        ax, ay, az = abs(sx), abs(sy), abs(sz)
        s = (sx, sy, sz)
        i = (0 if ax < az else 2) if ax < ay else (1 if ay < az else 2)
        j = 0 if i == 2 else i + 1
        k = 2 if i == 0 else i - 1
        y = [0.0, 0.0, 0.0]
        y[i] = 0.0
        y[j] = s[k]
        y[k] = -s[j]
        x = [0.0, 0.0, 0.0]
        x[i] = s[j] * s[j] + s[k] * s[k]
        x[j] = -(s[j] * s[i])
        x[k] = -(s[k] * s[i])
        self.x_dir = tuple(x)
        self.y_dir = tuple(y)

    # -- internals ----------------------------------------------------------

    def _direction(self, p) -> float:
        """GetDirection: bearing of p in the source tangent basis."""
        px, py, pz = float(p[0]), float(p[1]), float(p[2])
        dy = (px * self.y_dir[0] + py * self.y_dir[1]) + pz * self.y_dir[2]
        dx = (px * self.x_dir[0] + py * self.x_dir[1]) + pz * self.x_dir[2]
        return math.atan2(dy, dx)

    def _chord2(self, p) -> float:
        dx = self.src[0] - float(p[0])
        dy = self.src[1] - float(p[1])
        dz = self.src[2] - float(p[2])
        return (dx * dx + dy * dy) + dz * dz

    def _semiwidth(self, p, r2: float, round_direction: int) -> float:
        """GetSemiwidth (s2polyline_simplifier.cc:160-246): half-angle
        subtended at src by the disc, conservatively rounded."""
        a2 = self._chord2(p)
        a2 -= 64.0 * _DBL_ERR * _DBL_ERR * round_direction
        if a2 <= r2:
            return _PI  # disc contains src
        sin2_r = r2 * (1.0 - 0.25 * r2)
        sin2_a = a2 * (1.0 - 0.25 * a2)
        # For points beyond 90 degrees sin2_a shrinks below sin2_r and
        # C++ computes asin(>1) = NaN, which then falls through every
        # comparison and collapses the window to Empty.  Python's
        # math.asin raises instead, so produce the NaN explicitly and
        # let the same comparison semantics (NaN compares false) replay
        # the C++ control flow.
        if sin2_a <= 0.0 or sin2_r > sin2_a:
            semiwidth = float("nan")
        else:
            semiwidth = math.asin(math.sqrt(sin2_r / sin2_a))
        error = 24.0 * _DBL_ERR + 17.0 * _DBL_ERR * semiwidth
        return semiwidth + round_direction * error

    # -- public API ---------------------------------------------------------

    def extend(self, dst) -> bool:
        """Extend (s2polyline_simplifier.cc:60-75): edge <= 90 degrees and
        bearing inside the window (and outside every deferred avoid)."""
        if self._chord2(dst) > 2.0:
            return False
        d = self._direction(dst)
        if not _ivl_contains(self.lo, self.hi, d):
            return False
        for alo, ahi, _ in self.ranges_to_avoid:
            if _ivl_contains(alo, ahi, d):
                return False
        return True

    def target_disc(self, p, r2: float) -> bool:
        """TargetDisc (s2polyline_simplifier.cc:77-102)."""
        semiwidth = self._semiwidth(p, r2, -1)
        if semiwidth >= _PI:
            return True
        if semiwidth < 0.0:
            self.lo, self.hi = _PI, -_PI  # empty
            return False
        center = self._direction(p)
        tlo, thi = _ivl_from_point_expanded(center, semiwidth)
        self.lo, self.hi = _ivl_intersection(self.lo, self.hi, tlo, thi)
        for alo, ahi, on_left in self.ranges_to_avoid:
            self._avoid_range(alo, ahi, on_left)
        self.ranges_to_avoid.clear()
        return _ivl_length(self.lo, self.hi) >= 0.0

    def avoid_disc(self, p, r2: float, disc_on_left: bool) -> bool:
        """AvoidDisc (s2polyline_simplifier.cc:104-130)."""
        semiwidth = self._semiwidth(p, r2, 1)
        if semiwidth >= _PI:
            self.lo, self.hi = _PI, -_PI
            return False
        center = self._direction(p)
        dleft = _PI / 2.0 if disc_on_left else semiwidth
        dright = semiwidth if disc_on_left else _PI / 2.0
        alo = math.remainder(center - dright, 2.0 * _PI)
        ahi = math.remainder(center + dleft, 2.0 * _PI)
        if self.lo == -_PI and self.hi == _PI:  # window still full
            self.ranges_to_avoid.append((alo, ahi, disc_on_left))
            return True
        self._avoid_range(alo, ahi, disc_on_left)
        return _ivl_length(self.lo, self.hi) >= 0.0

    def _avoid_range(self, alo: float, ahi: float, disc_on_left: bool) -> None:
        """AvoidRange (s2polyline_simplifier.cc:132-163): carve the avoid
        interval out of the window, keeping the side the topology needs."""
        if self._window_contains_interval(alo, ahi):
            if disc_on_left:
                self.lo, self.hi = self.lo, alo
            else:
                self.lo, self.hi = ahi, self.hi
        else:
            # window.Intersection(avoid.Complement()); Complement of
            # (alo, ahi) is (ahi, alo)
            self.lo, self.hi = _ivl_intersection(self.lo, self.hi, ahi, alo)

    def _window_contains_interval(self, alo: float, ahi: float) -> bool:
        """S1Interval::Contains(S1Interval) (s1interval.cc:87-97)."""
        lo, hi = self.lo, self.hi
        if lo > hi:  # window inverted
            if alo > ahi:
                return alo >= lo and ahi <= hi
            return (alo >= lo or ahi <= hi) and not (lo == _PI and hi == -_PI)
        if alo > ahi:
            return (lo == -_PI and hi == _PI) or (alo == _PI and ahi == -_PI)
        return alo >= lo and ahi <= hi


def simplify_polyline(xs, ys, zs, tolerance_rad: float) -> list[int]:
    """The canonical simplification loop (s2polyline_simplifier.h:28-41):
    kept vertex indices such that every output edge passes within
    ``tolerance`` of all vertices it replaces.  The degenerate first-edge
    case (adjacent vertices > 90 degrees apart at index 1, where the
    header loop would emit a zero-length edge) keeps vertex 0 without
    the duplicate — the same unified per-run semantics the oracle folds."""
    n = len(xs)
    if n <= 1:
        return list(range(n))
    sim = PolylineSimplifier()
    sim.init((xs[0], ys[0], zs[0]))
    r2 = chord2_of_radius(tolerance_rad)
    kept = [0]
    run_start = 0
    for i in range(1, n):
        v = (xs[i], ys[i], zs[i])
        # the run's first candidate is never Extend-tested (it is the
        # vertex whose failed Extend started this run; for run_start == 0
        # a >90-degree first edge would emit a degenerate edge — unified
        # here by skipping that test, see docstring)
        if i > run_start + 1 and not sim.extend(v):
            kept.append(i - 1)
            sim.init((xs[i - 1], ys[i - 1], zs[i - 1]))
            run_start = i - 1
        sim.target_disc(v, r2)
    kept.append(n - 1)
    return kept
