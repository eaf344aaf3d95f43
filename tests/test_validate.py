"""S2Loop::FindValidationError: every error branch + the star-order
simplicity guarantee."""

import math

import numpy as np

from s2geometry_spark.operators.validate import loop_validation, star_order_chains


def _pt(lat, lng):
    la, ln = math.radians(lat), math.radians(lng)
    return np.array(
        [math.cos(la) * math.cos(ln), math.cos(la) * math.sin(ln), math.sin(la)]
    )


def _rows(cid, pts):
    return [(cid, s, float(p[0]), float(p[1]), float(p[2])) for s, p in enumerate(pts)]


def test_loop_validation_branches(spark):
    sq = [_pt(0, 0), _pt(0, 10), _pt(10, 10), _pt(10, 0)]
    bow = [_pt(0, 0), _pt(10, 10), _pt(0, 10), _pt(10, 0)]
    rows = (
        _rows(1, sq)  # valid CCW square
        + _rows(2, [_pt(0, 0), _pt(0, 10)])  # too few
        + _rows(3, [sq[0], sq[1], sq[1], sq[2]])  # duplicate adjacent
        + _rows(4, [sq[0], sq[1], -sq[1], sq[2]])  # antipodal adjacent
        + _rows(5, bow)  # bowtie: edges 0 and 2 cross
    )
    chains = spark.createDataFrame(
        rows, "chain_id long, seq long, x double, y double, z double"
    )
    out = {r.loop_id: r for r in loop_validation(spark, chains).collect()}
    assert (out[1].error_code, out[1].idx_a, out[1].idx_b) == (0, -1, -1)
    assert (out[2].error_code, out[2].n_vertices) == (1, 2)
    assert (out[3].error_code, out[3].idx_a, out[3].idx_b) == (2, 1, 2)
    assert (out[4].error_code, out[4].idx_a, out[4].idx_b) == (3, 1, 2)
    assert (out[5].error_code, out[5].idx_a, out[5].idx_b) == (4, 0, 2)


def test_star_order_makes_loops_simple(spark):
    """Scattered blobs whose raw closings self-intersect become valid
    (code 0) after the angular reorder, and the reorder is a permutation
    of the input vertices."""
    rng = np.random.RandomState(7)
    rows = []
    for cid in range(6):
        base = rng.randn(3)
        base /= np.linalg.norm(base)
        pts = base + 0.2 * rng.randn(12, 3)
        pts /= np.linalg.norm(pts, axis=1, keepdims=True)
        rows += _rows(cid, pts)
    chains = spark.createDataFrame(
        rows, "chain_id long, seq long, x double, y double, z double"
    )
    star = star_order_chains(spark, chains)
    out = loop_validation(spark, star).collect()
    assert all(r.error_code == 0 for r in out), [
        (r.loop_id, r.error_code) for r in out
    ]
    # permutation check: same multiset of coordinates per chain
    a = sorted(map(tuple, chains.select("chain_id", "x", "y", "z").collect()))
    b = sorted(map(tuple, star.select("chain_id", "x", "y", "z").collect()))
    assert a == b


def test_loop_pair_distance_relations(spark):
    """Crossing -> (1, 0); nested -> (2/3, 0); disjoint -> positive min
    distance matching a brute-force four-way replay."""
    from s2geometry_spark.kernels.measures import point_edge_chord2
    from s2geometry_spark.operators.polygon_distance import loop_pair_distance

    sq = [_pt(0, 0), _pt(0, 10), _pt(10, 10), _pt(10, 0)]
    sq_in = [_pt(3, 3), _pt(3, 7), _pt(7, 7), _pt(7, 3)]
    sq_cross = [_pt(5, 5), _pt(5, 15), _pt(15, 15), _pt(15, 5)]
    sq_far = [_pt(40, 40), _pt(40, 50), _pt(50, 50), _pt(50, 40)]
    rows = _rows(1, sq) + _rows(2, sq_in) + _rows(3, sq_cross) + _rows(4, sq_far)
    loops = spark.createDataFrame(
        rows, "chain_id long, seq long, x double, y double, z double"
    )
    pairs = spark.createDataFrame(
        [(1, 3), (1, 2), (2, 1), (1, 4)], "chain_a long, chain_b long"
    )
    out = {
        (r.chain_a, r.chain_b): r
        for r in loop_pair_distance(spark, loops, pairs).collect()
    }
    assert (out[(1, 3)].relation, out[(1, 3)].min_chord2) == (1, 0.0)
    assert (out[(1, 2)].relation, out[(1, 2)].min_chord2) == (2, 0.0)
    assert (out[(2, 1)].relation, out[(2, 1)].min_chord2) == (3, 0.0)
    r = out[(1, 4)]
    assert r.relation == 0 and r.min_chord2 > 0
    A = np.stack(sq)
    B = np.stack(sq_far)
    best = np.inf
    for i in range(4):
        a0, a1 = A[i], A[(i + 1) % 4]
        for j in range(4):
            b0, b1 = B[j], B[(j + 1) % 4]
            best = min(
                best,
                point_edge_chord2(a0[None], b0[None], b1[None])[0],
                point_edge_chord2(a1[None], b0[None], b1[None])[0],
                point_edge_chord2(b0[None], a0[None], a1[None])[0],
                point_edge_chord2(b1[None], a0[None], a1[None])[0],
            )
    assert r.min_chord2 == best


def test_star_sector_key_axis_cases():
    """ADVICE r3: exact u==0 / v==0 bearings must sort at the sector
    boundaries, not wherever ±inf/NaN lands them."""
    import numpy as np

    from s2geometry_spark.operators.validate import _star_sector_key

    # bearings every 45 degrees, in angular order starting at +u axis
    ang = np.radians([0, 45, 90, 135, 180, 225, 270, 315])
    u = np.cos(ang)
    v = np.sin(ang)
    # force EXACT zeros on the axes (cos(pi/2) is only ~6e-17)
    u[[2, 6]] = 0.0
    v[[0, 4]] = 0.0
    q, r = _star_sector_key(u, v)
    assert list(q) == [0, 1, 2, 3, 4, 5, 6, 7]
    assert np.all(np.isfinite(r))
    # shuffled input sorts back to angular order
    perm = np.array([3, 6, 0, 5, 2, 7, 1, 4])
    q2, r2 = _star_sector_key(u[perm], v[perm])
    order = np.lexsort((np.arange(8), r2, q2))
    assert list(perm[order]) == list(range(8))
    # degenerate center point: finite key, no NaN
    q3, r3 = _star_sector_key(np.array([0.0]), np.array([0.0]))
    assert q3[0] == 7 and r3[0] == 0.0


def test_star_sector_key_matches_atan2_order():
    """VERDICT r4 low #5 closure: the (sector, ratio) key must induce
    exactly the atan2 angular order for ANY mix of interior and
    axis-exact bearings — including negative zeros, whose IEEE
    comparison semantics (-0.0 == 0.0) the sector CASE relies on."""
    import numpy as np

    from s2geometry_spark.operators.validate import _star_sector_key

    ang = np.sort(
        np.concatenate(
            [
                np.linspace(0.001, 2 * np.pi - 0.001, 97),
                np.radians([0.0, 90.0, 180.0, 270.0]),
            ]
        )
    )
    u = np.cos(ang)
    v = np.sin(ang)
    # exact axis values, with negative zeros where cos/sin approach 0
    # from below (the sign a real dot product can carry)
    u[np.isclose(ang, np.pi / 2)] = -0.0
    v[np.isclose(ang, 0.0)] = 0.0
    u[np.isclose(ang, 3 * np.pi / 2)] = 0.0
    v[np.isclose(ang, np.pi)] = -0.0
    rng = np.random.default_rng(7)
    perm = rng.permutation(len(ang))
    q, r = _star_sector_key(u[perm], v[perm])
    order = np.lexsort((np.arange(len(ang)), r, q))
    assert list(perm[order]) == list(range(len(ang)))
