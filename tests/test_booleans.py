"""Polygon boolean operations (S2BooleanOperation subset): overlay
kernel property tests (area additivity, pointwise equivalence, nesting)
+ the distributed pairwise operator."""

import numpy as np
import pytest

from s2geometry_spark.kernels import booleanop as bo
from s2geometry_spark.kernels import measures
from s2geometry_spark.kernels.regions import Loop, Polygon


@pytest.fixture(scope="module")
def sample_points():
    rng = np.random.RandomState(0)
    P = rng.randn(20000, 3)
    return P / np.linalg.norm(P, axis=1)[:, None]


A_ARGS = (10, 20, 0.3, 16)
CASES = {
    "overlapping": (34.0, 0.3, 16),  # shifted east, crossing boundary
    "nested": (20.0, 0.1, 12),  # strictly inside A
    "disjoint": (-140.0, 0.2, 12),
}


def _loops(case):
    A = Loop.make_regular(*A_ARGS).vertices
    lng, r, n = CASES[case]
    B = Loop.make_regular(10, lng, r, n).vertices
    return A, B


@pytest.mark.parametrize("case", list(CASES))
@pytest.mark.parametrize("op", ["intersection", "union", "difference"])
def test_overlay_pointwise_equivalence(case, op, sample_points):
    A, B = _loops(case)
    res = bo.overlay([A], [B], op)
    pa, pb = Polygon([Loop(A)]), Polygon([Loop(B)])
    inA = pa.contains_points(sample_points)
    inB = pb.contains_points(sample_points)
    want = {
        "intersection": inA & inB,
        "union": inA | inB,
        "difference": inA & ~inB,
    }[op]
    got = (
        Polygon([Loop(v) for v in res]).contains_points(sample_points)
        if res
        else np.zeros(len(sample_points), bool)
    )
    assert (got == want).all()


@pytest.mark.parametrize("case", list(CASES))
def test_area_additivity(case):
    A, B = _loops(case)
    aA, aB = measures.loop_area(A), measures.loop_area(B)
    aI = bo.polygon_area(bo.overlay([A], [B], "intersection"))
    aU = bo.polygon_area(bo.overlay([A], [B], "union"))
    aD = bo.polygon_area(bo.overlay([A], [B], "difference"))
    assert aI + aU == pytest.approx(aA + aB, abs=1e-12)
    assert aD == pytest.approx(aA - aI, abs=1e-12)


def test_nested_difference_produces_hole():
    A, B = _loops("nested")
    res = bo.overlay([A], [B], "difference")
    assert len(res) == 2
    assert bo.nesting_depths(res) == [0, 1]
    # hole loop is the inner ring, small-oriented
    areas = sorted(measures.loop_area(v) for v in res)
    assert areas[0] == pytest.approx(measures.loop_area(B), abs=1e-12)


def test_nonconvex_star_overlay(sample_points):
    """Non-convex inputs: an 8-point star x an offset ring."""
    # star: alternate radii around a center
    import math

    lat0, lng0 = 5.0, 50.0
    z = np.array(
        [
            math.cos(math.radians(lng0)) * math.cos(math.radians(lat0)),
            math.sin(math.radians(lng0)) * math.cos(math.radians(lat0)),
            math.sin(math.radians(lat0)),
        ]
    )
    from s2geometry_spark.kernels import predicates

    x = np.asarray(predicates._ortho(z))
    y = np.cross(z, x)
    verts = []
    for i in range(16):
        r = 0.35 if i % 2 == 0 else 0.15
        ang = 2 * math.pi * i / 16
        d = math.cos(r) * z + math.sin(r) * (math.cos(ang) * x + math.sin(ang) * y)
        verts.append(d / np.linalg.norm(d))
    S = np.array(verts)
    B = Loop.make_regular(5.0, 50.0 + 14.0, 0.22, 14).vertices
    for op in ["intersection", "union", "difference"]:
        res = bo.overlay([S], [B], op)
        ps, pb = Polygon([Loop(S)]), Polygon([Loop(B)])
        inS = ps.contains_points(sample_points)
        inB = pb.contains_points(sample_points)
        want = {
            "intersection": inS & inB,
            "union": inS | inB,
            "difference": inS & ~inB,
        }[op]
        got = Polygon([Loop(v) for v in res]).contains_points(sample_points)
        assert (got == want).all(), op


def test_polygon_with_hole_input(sample_points):
    """A-with-hole intersected with an overlapping disk (odd-even input)."""
    A, _ = _loops("overlapping")
    H = Loop.make_regular(10, 20, 0.12, 10).vertices  # hole in A
    B = Loop.make_regular(10, 34.0, 0.3, 16).vertices
    res = bo.overlay([A, H], [B], "intersection")
    pa = Polygon([Loop(A), Loop(H)])
    pb = Polygon([Loop(B)])
    want = pa.contains_points(sample_points) & pb.contains_points(sample_points)
    got = Polygon([Loop(v) for v in res]).contains_points(sample_points)
    assert (got == want).all()


def test_pairwise_boolean_operator(spark):
    from s2geometry_spark.operators.booleans import pairwise_boolean

    rows = []
    pid = 0
    for case in CASES:
        A, B = _loops(case)
        for op in ["intersection", "union", "difference"]:
            rows.append((pid, op, [A.tolist()], [B.tolist()]))
            pid += 1
    pairs = spark.createDataFrame(
        rows,
        "pair_id long, op string, a_loops array<array<array<double>>>, "
        "b_loops array<array<array<double>>>",
    )
    out = {r.pair_id: r for r in pairwise_boolean(pairs).collect()}
    assert len(out) == len(rows)
    for pair_id, op, a_loops, b_loops in rows:
        want = bo.overlay(
            [np.array(v) for v in a_loops], [np.array(v) for v in b_loops], op
        )
        got = out[pair_id]
        assert got.n_loops == len(want)
        assert got.area == pytest.approx(bo.polygon_area(want), abs=1e-14)


def test_winding_numbers_match_containment(sample_points):
    """Winding via signed path crossings equals the sum of signed loop
    containments (CCW +1, CW -1) on generic points."""
    import numpy as np

    from s2geometry_spark.kernels import winding

    A = Loop.make_regular(10, 20, 0.3, 16).vertices
    B = Loop.make_regular(10, 26, 0.3, 16).vertices
    C = Loop.make_regular(10, 23, 0.1, 12).vertices[::-1].copy()  # CW
    ref = np.array([0.0, 0.0, -1.0])
    w = winding.winding_numbers([A, B, C], ref, 0, sample_points)
    want = (
        Polygon([Loop(A)]).contains_points(sample_points).astype(int)
        + Polygon([Loop(B)]).contains_points(sample_points).astype(int)
        - Polygon([Loop(C[::-1].copy())]).contains_points(sample_points).astype(int)
    )
    assert (w == want).all()
    assert set(w.tolist()) >= {0, 1, 2}


def test_winding_join_operator(spark, sample_points):
    import numpy as np

    from s2geometry_spark.kernels import winding
    from s2geometry_spark.operators.booleans import winding_join

    loops = [Loop.make_regular(10, 20, 0.3, 12).vertices]
    ref = np.array([0.0, 0.0, -1.0])
    P = sample_points[:500]
    df = spark.createDataFrame(
        [(i, float(p[0]), float(p[1]), float(p[2])) for i, p in enumerate(P)],
        "pid long, x double, y double, z double",
    )
    got = {r.pid: r.winding for r in winding_join(df, loops, ref).collect()}
    want = winding.winding_numbers(loops, ref, 0, P)
    assert got == {i: int(w) for i, w in enumerate(want)}


@pytest.mark.parametrize("seed", range(12))
def test_overlay_random_pair_sweep(seed, sample_points):
    """Seeded sweep: random loop pairs (varied centers, radii, vertex
    counts, orientations) — every op must match pointwise set algebra."""
    rng = np.random.RandomState(1000 + seed)
    def rand_loop():
        lat = rng.uniform(-55, 55)
        lng = rng.uniform(-170, 170)
        r = rng.uniform(0.08, 0.5)
        n = rng.randint(6, 24)
        v = Loop.make_regular(lat, lng, r, n).vertices
        return v[::-1].copy() if rng.rand() < 0.3 else v  # orientation-agnostic
    A = rand_loop()
    # bias B toward overlap half the time
    if rng.rand() < 0.5:
        ca = A.mean(axis=0); ca /= np.linalg.norm(ca)
        import math
        lat = math.degrees(math.asin(max(-1, min(1, ca[2])))) + rng.uniform(-8, 8)
        lng = math.degrees(math.atan2(ca[1], ca[0])) + rng.uniform(-8, 8)
        B = Loop.make_regular(lat, lng, rng.uniform(0.08, 0.4), rng.randint(6, 20)).vertices
    else:
        B = rand_loop()
    pa = Polygon([Loop(bo._normalize_small([A])[0])])
    pb = Polygon([Loop(bo._normalize_small([B])[0])])
    inA = pa.contains_points(sample_points)
    inB = pb.contains_points(sample_points)
    for op, want in [
        ("intersection", inA & inB),
        ("union", inA | inB),
        ("difference", inA & ~inB),
    ]:
        res = bo.overlay([A], [B], op)
        got = (
            Polygon([Loop(v) for v in res]).contains_points(sample_points)
            if res
            else np.zeros(len(sample_points), bool)
        )
        assert (got == want).all(), (seed, op)


# ---------- exact shared-boundary degeneracies (S2Builder graph subset) ----------


def _ll(lat, lng):
    la, lo = np.radians(lat), np.radians(lng)
    return np.array(
        [np.cos(la) * np.cos(lo), np.cos(la) * np.sin(lo), np.sin(la)]
    )


def _eqp(theta_deg):
    t = np.radians(theta_deg)
    return np.array([np.cos(t), np.sin(t), 0.0])


def _hex_verts():
    return [
        _ll(20 + 8 * np.sin(a), 30 + 8 * np.cos(a))
        for a in np.linspace(0, 2 * np.pi, 7)[:-1]
    ]


def _touching_pairs():
    """Fixture pairs with EXACT shared geometry (bitwise vertices /
    exactly-collinear edges), mirroring s2boolean_operation_test.cc's
    touching-polygon cases."""
    hx = _hex_verts()
    H = np.stack(hx)
    P = _ll(0.0, 50.0)
    return {
        # full shared edge, opposite interiors (adjacent halves)
        "split_hex": (
            np.stack([hx[0], hx[1], hx[2], hx[3]]),
            np.stack([hx[3], hx[4], hx[5], hx[0]]),
        ),
        # identical polygons (every edge shared, same interior side)
        "identical": (H, H.copy()),
        # B shares a 3-edge boundary chain of A, same interior side
        "sub_chain": (H, np.stack([hx[0], hx[1], hx[2], hx[3]])),
        # single shared vertex (diagonal touch)
        "vertex_touch": (
            np.stack([P, _ll(0, 45), _ll(5, 45), _ll(5, 50)]),
            np.stack([P, _ll(-5, 50), _ll(-5, 55), _ll(0, 55)]),
        ),
        # B's equator edge is a strict sub-segment of A's (T-junctions,
        # partial collinear overlap, opposite interiors)
        "equator_T": (
            np.stack([_eqp(0), _eqp(10), _ll(6, 8), _ll(6, 2)]),
            np.stack([_eqp(6), _eqp(4), _ll(-5, 4.5), _ll(-5, 5.5)]),
        ),
        # B's equator edge extends beyond A's on one side (overlap [4,10],
        # B sticks out to 14)
        "equator_overhang": (
            np.stack([_eqp(0), _eqp(10), _ll(6, 8), _ll(6, 2)]),
            np.stack([_eqp(14), _eqp(4), _ll(-5, 5), _ll(-5, 13)]),
        ),
    }


@pytest.mark.parametrize("name", list(_touching_pairs()))
@pytest.mark.parametrize("op", ["intersection", "union", "difference"])
def test_overlay_shared_boundary_pointwise(name, op, sample_points):
    A, B = _touching_pairs()[name]
    res = bo.overlay([A], [B], op)
    pa = Polygon([Loop(v) for v in bo._normalize_small([A])])
    pb = Polygon([Loop(v) for v in bo._normalize_small([B])])
    inA = pa.contains_points(sample_points)
    inB = pb.contains_points(sample_points)
    want = {
        "intersection": inA & inB,
        "union": inA | inB,
        "difference": inA & ~inB,
    }[op]
    got = (
        Polygon([Loop(v) for v in res]).contains_points(sample_points)
        if res
        else np.zeros(len(sample_points), bool)
    )
    assert (got == want).all(), (name, op, int((got != want).sum()))


@pytest.mark.parametrize("op", ["intersection", "union", "difference"])
def test_overlay_shared_boundary_areas(op):
    """Closed-form area checks for the exactly-shared configurations."""
    pairs = _touching_pairs()

    def small(v):
        a = measures.loop_area(v)
        return a if a < 2 * np.pi else 4 * np.pi - a

    for name, (A, B) in pairs.items():
        aA, aB = small(A), small(B)
        res = bo.overlay([A], [B], op)
        area = bo.polygon_area(res)
        if name in ("split_hex",):
            want = {"intersection": 0.0, "union": aA + aB, "difference": aA}[op]
        elif name == "identical":
            want = {"intersection": aA, "union": aA, "difference": 0.0}[op]
        elif name == "sub_chain":
            want = {"intersection": aB, "union": aA, "difference": aA - aB}[op]
        elif name in ("vertex_touch", "equator_T"):
            want = {"intersection": 0.0, "union": aA + aB, "difference": aA}[op]
        else:  # equator_overhang: still interior-disjoint (opposite sides)
            want = {"intersection": 0.0, "union": aA + aB, "difference": aA}[op]
        assert area == pytest.approx(want, abs=1e-12), (name, op)


def test_vertex_touch_union_is_two_simple_loops():
    """The clockwise-first continuation must split a vertex-touching
    union into two simple loops, not a figure-eight."""
    pairs = _touching_pairs()
    A, B = pairs["vertex_touch"]
    res = bo.overlay([A], [B], "union")
    assert len(res) == 2
    for v in res:
        keys = {p.tobytes() for p in v}
        assert len(keys) == len(v)  # no repeated vertex inside one loop


def test_overlap_fractions():
    """Mirrors s2polygon_test.cc OverlapFractions: empty/empty -> (1, 1);
    empty vs non-empty -> (1, 0); half-overlapping congruent loops ->
    (~0.5, ~0.5); nested -> (small/big, 1)."""
    from s2geometry_spark.kernels.booleanop import overlap_fractions, polygon_area
    from s2geometry_spark.kernels.regions import Loop

    assert overlap_fractions([], []) == (1.0, 1.0)
    big = [Loop.make_regular(10.0, 20.0, 0.4, 64).vertices]
    assert overlap_fractions([], big) == (1.0, 0.0)
    assert overlap_fractions(big, []) == (0.0, 1.0)
    assert overlap_fractions(big, [v.copy() for v in big]) == (1.0, 1.0)
    # two congruent caps whose centers are offset: fractions equal, in (0,1)
    sh = [Loop.make_regular(10.0, 20.0 + 0.4 * 57.29577951308232 * 0.9, 0.4, 64).vertices]
    fa, fb = overlap_fractions(big, sh)
    assert 0.0 < fa < 1.0 and abs(fa - fb) < 1e-9
    # nested: small inside big
    small = [Loop.make_regular(10.0, 20.0, 0.1, 64).vertices]
    fa, fb = overlap_fractions(big, small)
    assert fb == 1.0
    import pytest as _pt
    assert fa == _pt.approx(polygon_area(small) / polygon_area(big), rel=1e-9)


def test_boolean_operation_mixed_dimensions():
    """S2BooleanOperation over a mixed collection (polygon + polyline +
    points) against a polygon (s2boolean_operation.h:60-130): the
    polyline crossing the square keeps its inner piece under
    intersection and its two outer pieces under union/difference, and
    points select by containment the same way."""
    import numpy as np

    from s2geometry_spark.kernels import booleanop
    from s2geometry_spark.kernels.textformat import make_loop, make_points

    square = [make_loop("5:-5, 5:5, -5:5, -5:-5").vertices]
    small = [make_loop("2:-2, 2:2, -2:2, -2:-2").vertices]
    chain = make_points("0:-10, 0:0, 0:10")
    pts = make_points("0:0, 0:20")

    a = {"loops": small, "polylines": [chain], "points": pts}
    r_int = booleanop.boolean_operation("intersection", a, square)
    r_uni = booleanop.boolean_operation("union", a, square)
    r_dif = booleanop.boolean_operation("difference", a, square)

    # loops: small square is inside the big one
    assert len(r_int["loops"]) == 1 and len(r_uni["loops"]) == 1
    assert r_dif["loops"] == []
    # polylines: one inner piece vs two outer pieces
    assert len(r_int["polylines"]) == 1
    assert len(r_uni["polylines"]) == 2
    assert len(r_dif["polylines"]) == 2
    # every clipped vertex is on the correct side (midpoints checked by
    # construction; endpoints lie on the boundary or the original chain)
    # points: 0:0 is inside, 0:20 outside
    assert r_int["points"].shape[0] == 1
    assert r_uni["points"].shape[0] == 1 and r_dif["points"].shape[0] == 1
    assert abs(float(r_int["points"][0] @ make_points("0:0")[0]) - 1.0) < 1e-12
    assert abs(float(r_uni["points"][0] @ make_points("0:20")[0]) - 1.0) < 1e-12

    # empty-side identities
    e_uni = booleanop.boolean_operation("union", {"loops": []}, square)
    assert len(e_uni["loops"]) == 1
    e_int = booleanop.boolean_operation("intersection", {"loops": []}, square)
    assert e_int["loops"] == []
    e_dif = booleanop.boolean_operation("difference", {"loops": small}, [])
    assert len(e_dif["loops"]) == 1
