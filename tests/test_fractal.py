"""Fractal stress fixtures (s2fractal.cc): the generated loops must be
simple (the reference's tangent-plane construction argument), respect
the documented radius envelope, and drive the coverer / containment /
validation machinery at coastline-like edge counts — the same role
S2Fractal plays in s2region_coverer_test.cc and s2loop_test.cc."""

import math

import numpy as np
import pytest

from s2geometry_spark.kernels import predicates
from s2geometry_spark.kernels.coverer import CovererOptions, RegionCoverer
from s2geometry_spark.kernels.fractal import Fractal
from s2geometry_spark.kernels.regions import Loop


def _make(seed, max_level, min_level=-1, dimension=None, radius=0.02,
          center=(1.0, 1.0, 1.0)):
    f = Fractal(seed=seed)
    f.set_max_level(max_level)
    if min_level >= 0:
        f.set_min_level(min_level)
    if dimension is not None:
        f.set_fractal_dimension(dimension)
    c = np.asarray(center, float)
    return f, f.make_loop(c / np.linalg.norm(c), radius)


def test_edge_count_single_level():
    """A single-level fractal at level n has exactly 3 * 4^n vertices."""
    for n in (0, 1, 2, 3):
        _, V = _make(seed=1, max_level=n)
        assert len(V) == 3 * 4 ** n


def test_multi_level_edge_count_between_bounds():
    f, V = _make(seed=2, max_level=4, min_level=1)
    assert 3 * 4 <= len(V) <= 3 * 4 ** 4


def test_loops_are_simple():
    """No self-intersections at any tested dimension/level mix — the
    tangent-plane construction guarantee."""
    for seed, dim in ((3, None), (4, 1.02), (5, 1.5), (6, 1.9)):
        _, V = _make(seed=seed, max_level=3, min_level=1, dimension=dim)
        n = len(V)
        W = np.roll(V, -1, axis=0)
        ii, jj = np.triu_indices(n, k=2)
        keep = ~((ii == 0) & (jj == n - 1))
        ii, jj = ii[keep], jj[keep]
        cross = predicates.edges_cross_batch(V[ii], W[ii], V[jj], W[jj], robust=False)
        assert not cross.any(), f"seed={seed} dim={dim}"


def test_radius_envelope():
    """Every vertex's tangent-plane distance from the center lies within
    [min_radius_factor, max_radius_factor] * nominal radius
    (s2fractal.cc:76-103; measured via gnomonic projection, matching the
    construction)."""
    c = np.array([1.0, 1.0, 1.0]) / math.sqrt(3)
    r = 0.02
    for dim in (1.02, math.log(4) / math.log(3), 1.5):
        f, V = _make(seed=7, max_level=3, dimension=dim, center=c, radius=r)
        dots = V @ c
        tangent_d = np.sqrt(1.0 - dots ** 2) / dots  # gnomonic radius
        assert tangent_d.max() <= f.max_radius_factor() * r * 1.0001
        assert tangent_d.min() >= f.min_radius_factor() * r * 0.9999


def test_contains_center_and_coverer_covers():
    """The fractal loop contains its center; a level-capped covering of
    sampled boundary vertices' cells intersects the loop's cells — the
    CheckCovering-style property the reference drives with fractals."""
    from s2geometry_spark.kernels import cellid

    c = np.array([1.0, -0.5, 0.3])
    c /= np.linalg.norm(c)
    _, V = _make(seed=9, max_level=3, center=c, radius=0.05)
    loop = Loop(V)
    assert bool(loop.contains_point(c))
    # antipode of the center is outside
    assert not bool(loop.contains_point(-c))
    cov = RegionCoverer(CovererOptions(max_cells=32)).get_covering(loop)
    assert 1 <= len(cov) <= 32
    # every loop vertex must land inside some covering cell
    leafs = cellid.from_xyz(V[:, 0], V[:, 1], V[:, 2])
    lo = np.array([cellid.range_min(c) for c in cov], dtype=np.uint64)
    hi = np.array([cellid.range_max(c) for c in cov], dtype=np.uint64)
    for lf in leafs:
        assert bool(((lf >= lo) & (lf <= hi)).any())


def test_determinism():
    _, a = _make(seed=11, max_level=3, min_level=1)
    _, b = _make(seed=11, max_level=3, min_level=1)
    assert np.array_equal(a, b)
    _, c = _make(seed=12, max_level=3, min_level=1)
    assert len(a) != len(c) or not np.array_equal(a, c)
