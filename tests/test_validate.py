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
