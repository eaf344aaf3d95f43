"""S2PolylineSimplifier port vs the reference's own CheckSimplify case
table (s2polyline_simplifier_test.cc), plus the tolerance guarantee of
the canonical simplification loop on random walks and fractal chains."""

import math

import numpy as np
import pytest

from s2geometry_spark.kernels.measures import point_edge_chord2
from s2geometry_spark.kernels.polyline_simplifier import (
    PolylineSimplifier,
    chord2_of_radius,
    simplify_polyline,
)
from s2geometry_spark.kernels.textformat import make_point, make_points


def check_simplify(src, dst, target, avoid, disc_on_left, radius_deg, expected):
    r2 = chord2_of_radius(math.radians(radius_deg))
    s = PolylineSimplifier()
    s.init(make_point(src))
    if target:
        for p in make_points(target):
            s.target_disc(p, r2)
    if avoid:
        for p, left in zip(make_points(avoid), disc_on_left):
            s.avoid_disc(p, r2, left)
    assert s.extend(make_point(dst)) == expected, (src, dst, target, avoid)


def test_reuse():
    r2 = chord2_of_radius(math.radians(10))
    s = PolylineSimplifier()
    s.init(np.array([1.0, 0.0, 0.0]))
    n = lambda *v: np.array(v) / np.linalg.norm(v)
    assert s.target_disc(n(1, 1, 0), r2)
    assert s.target_disc(n(1, 1, 0.1), r2)
    assert not s.extend(n(1, 1, 0.4))
    s.init(np.array([0.0, 1.0, 0.0]))
    assert s.target_disc(n(1, 1, 0.3), r2)
    assert s.target_disc(n(1, 1, 0.2), r2)
    assert not s.extend(n(1, 1, 0))


def test_no_constraints():
    check_simplify("0:1", "0:1", "", "", [], 0, True)
    check_simplify("0:1", "1:0", "", "", [], 0, True)
    # (src, dst) longer than 90 degrees is not supported
    check_simplify("0:0", "0:91", "", "", [], 0, False)


def test_target_one_point():
    check_simplify("0:0", "0:2", "0:1", "", [], 1e-10, True)
    check_simplify("0:0", "0:2", "1:1", "", [], 0.9, False)
    # target disc containing the source vertex
    check_simplify("0:0", "0:2", "0:0.1", "", [], 1.0, True)
    # target disc containing the destination vertex
    check_simplify("0:0", "0:2", "0:2.1", "", [], 1.0, True)


def test_avoid_one_point():
    check_simplify("0:0", "0:2", "", "0:1", [True], 1e-10, False)
    check_simplify("0:0", "0:2", "", "1:1", [True], 0.9, True)
    check_simplify("0:0", "0:2", "", "1:1", [False], 1e-10, False)
    # disc behind the source: disc_on_left must not matter
    check_simplify("0:0", "0:2", "", "1:-1", [False], 1.4, True)
    check_simplify("0:0", "0:2", "", "1:-1", [True], 1.4, True)
    check_simplify("0:0", "0:2", "", "-1:-1", [False], 1.4, True)
    check_simplify("0:0", "0:2", "", "-1:-1", [True], 1.4, True)


def test_avoid_several_points():
    # three tiny discs 120 degrees apart; each blocks the 90 degrees to
    # its left, leaving three ~30-degree gaps
    for dst in ("0:2", "1.732:-1", "-1.732:-1"):
        check_simplify("0:0", dst, "", "0.01:2, 1.732:-1.01, -1.732:-0.99",
                       [True, True, True], 0.00001, True)
        check_simplify("0:0", dst, "", "0.01:2, 1.732:-1.01, -1.732:-0.99",
                       [False, False, False], 0.00001, False)


def test_target_and_avoid():
    check_simplify("0:0", "10:10", "2:3, 4:3, 7:8",
                   "4:2, 7:5, 7:9", [True, True, False], 1.0, True)
    check_simplify("0:0", "10:10", "2:3, 4:6, 7:8",
                   "4:2, 7:5, 7:9", [True, True, False], 1.0, False)
    check_simplify("0:0", "10:10", "2:3, 4:3, 7:8",
                   "4:2, 6:5, 7:9", [True, True, False], 1.0, False)


def _forward_walk(n, step_rad, turn_rad, seed):
    """A walk whose heading drifts slowly — monotone progression away
    from any recent vertex, the structure S2Builder feeds the simplifier
    (targets added in increasing order of distance)."""
    rng = np.random.default_rng(seed)
    p = rng.normal(size=3)
    p /= np.linalg.norm(p)
    d = rng.normal(size=3)
    d -= (d @ p) * p
    d /= np.linalg.norm(d)
    out = [p]
    for _ in range(n - 1):
        q = math.cos(step_rad) * out[-1] + math.sin(step_rad) * d
        q /= np.linalg.norm(q)
        # parallel-transport the heading, then jitter it slightly
        d -= (d @ q) * q
        j = rng.normal(size=3)
        j -= (j @ q) * q
        d = d + turn_rad * j
        d /= np.linalg.norm(d)
        out.append(q)
    return np.stack(out)


def _ray_chord2(mids, src, dst):
    """Squared chord distance from each mid to the 90-degree ray from
    ``src`` through ``dst`` — the direction-window object the simplifier
    actually constrains (for backtracking inputs the segment itself can
    miss a targeted disc; S2Builder feeds it monotone chains)."""
    b = dst - (dst @ src) * src
    b /= np.linalg.norm(b)
    A = np.broadcast_to(src, mids.shape)
    B = np.broadcast_to(b, mids.shape)
    return point_edge_chord2(mids, A, B)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_simplify_polyline_tolerance_guarantee(seed):
    """On forward-progressing walks every dropped vertex lies within
    tolerance of the output edge that replaced it; on any input the
    constrained RAY passes within tolerance."""
    tol = 0.02
    V = _forward_walk(200, 0.005, 0.15, seed)
    kept = simplify_polyline(V[:, 0], V[:, 1], V[:, 2], tol)
    assert kept[0] == 0 and kept[-1] == len(V) - 1
    assert len(kept) < len(V) // 4  # it simplifies aggressively
    r2 = chord2_of_radius(tol)
    for a, b in zip(kept, kept[1:]):
        if b - a < 2:
            continue
        mids = V[a + 1:b]
        A = np.broadcast_to(V[a], mids.shape)
        B = np.broadcast_to(V[b], mids.shape)
        d2 = point_edge_chord2(mids, A, B)
        assert (d2 <= r2 * (1 + 1e-12)).all(), (seed, a, b, float(d2.max()))


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_simplify_polyline_ray_guarantee_backtracking(seed):
    """Even on a curling random walk, each output edge's RAY stays
    within tolerance of every vertex it replaced."""
    rng = np.random.default_rng(100 + seed)
    p = rng.normal(size=3)
    p /= np.linalg.norm(p)
    V = [p]
    for _ in range(199):
        d = rng.normal(size=3)
        d -= (d @ V[-1]) * V[-1]
        d /= np.linalg.norm(d)
        q = math.cos(0.005) * V[-1] + math.sin(0.005) * d
        V.append(q / np.linalg.norm(q))
    V = np.stack(V)
    tol = 0.02
    kept = simplify_polyline(V[:, 0], V[:, 1], V[:, 2], tol)
    r2 = chord2_of_radius(tol)
    for a, b in zip(kept, kept[1:]):
        if b - a < 2:
            continue
        d2 = _ray_chord2(V[a + 1:b], V[a], V[b])
        assert (d2 <= r2 * (1 + 1e-9)).all(), (seed, a, b, float(d2.max()))


def test_simplify_polyline_fractal_chain():
    """A coastline-like fractal boundary simplifies with the guarantee
    intact at a coarse tolerance."""
    from s2geometry_spark.kernels.fractal import Fractal

    f = Fractal(seed=5)
    f.set_max_level(4)
    c = np.array([1.0, 2.0, 0.5])
    V = f.make_loop(c / np.linalg.norm(c), 0.05)
    tol = 0.004
    kept = simplify_polyline(V[:, 0], V[:, 1], V[:, 2], tol)
    assert 2 <= len(kept) < len(V)
    r2 = chord2_of_radius(tol)
    for a, b in zip(kept, kept[1:]):
        if b - a < 2:
            continue
        mids = V[a + 1:b]
        A = np.broadcast_to(V[a], mids.shape)
        B = np.broadcast_to(V[b], mids.shape)
        assert (point_edge_chord2(mids, A, B) <= r2 * (1 + 1e-12)).all()


def test_simplify_straight_line_keeps_two():
    """Collinear-ish points along one geodesic collapse to the endpoints."""
    n = 50
    t = np.linspace(0.0, 0.3, n)
    V = np.stack([np.cos(t), np.sin(t), np.zeros(n)], axis=1)
    kept = simplify_polyline(V[:, 0], V[:, 1], V[:, 2], 1e-6)
    assert kept == [0, n - 1]


def test_builder_snap_then_simplify_composition():
    """The S2Builder simplify_edge_chains pipeline shape (s2builder.cc):
    snap a chain to level-L cell centers, then disc-simplify the snapped
    chain.  Outputs are a subset of the snap sites, and for a
    forward-progressing chain every dropped site stays within the
    simplification tolerance of the output edge that replaced it."""
    from s2geometry_spark.kernels import builder

    level = 12
    V = _forward_walk(150, 0.004, 0.1, seed=9)
    S = builder.build_polyline(V, level)
    assert S.shape[0] >= 2
    # tolerance: the snap radius at this level (vertex already moved by
    # up to that much, the reference budgets max_edge_deviation above it)
    tol = 2.0 * math.asin(0.5 * math.sqrt(builder.snap_radius_chord2(level)))
    kept = simplify_polyline(S[:, 0], S[:, 1], S[:, 2], tol)
    assert kept[0] == 0 and kept[-1] == len(S) - 1
    sites = {tuple(p) for p in S}
    r2 = chord2_of_radius(tol)
    for a, b in zip(kept, kept[1:]):
        assert tuple(S[a]) in sites and tuple(S[b]) in sites
        if b - a < 2:
            continue
        mids = S[a + 1:b]
        A = np.broadcast_to(S[a], mids.shape)
        B = np.broadcast_to(S[b], mids.shape)
        assert (point_edge_chord2(mids, A, B) <= r2 * (1 + 1e-9)).all()
