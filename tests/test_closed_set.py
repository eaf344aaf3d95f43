"""ClosedSetNormalizer (s2builderutil_closed_set_normalizer.cc:165-238).

Handcrafted single-graph fixtures hitting every NormalizeEdges branch,
mirroring the reference's test matrix
(s2builderutil_closed_set_normalizer_test.cc): hole discarding, shell
demotion (pair -> polylines, single-vertex -> point), degenerate
polyline -> point, and each suppression rule including the
shell-pair-keeps-coincident-polylines exception."""


from s2geometry_spark.operators.closed_set import normalize_closed_set


def _run(spark, points, lines, polys, deg, suppress=True):
    pts = spark.createDataFrame(
        [tuple(r) for r in points], schema="gid long, v long"
    )
    lns = spark.createDataFrame(
        [tuple(r) for r in lines], schema="gid long, src long, dst long"
    )
    pls = spark.createDataFrame(
        [tuple(r) for r in polys],
        schema="gid long, src long, dst long, deg_id long",
    )
    dgs = spark.createDataFrame(
        [tuple(r) for r in deg],
        schema="gid long, deg_id long, is_hole boolean",
    )
    out = normalize_closed_set(pts, lns, pls, dgs, suppress)
    return {
        (int(r.dim), int(r.src), int(r.dst)): int(r.n)
        for r in out.collect()
    }


# one polygon: boundary triangle 0-1-2, hole pair (10,11), shell pair
# (20,21), hole vertex 30, shell vertex 40
POLYS = (
    [(1, 0, 1, None), (1, 1, 2, None), (1, 2, 0, None)]
    + [(1, 10, 11, 5), (1, 11, 10, 5)]
    + [(1, 20, 21, 6), (1, 21, 20, 6)]
    + [(1, 30, 30, 0), (1, 40, 40, 3)]
)
DEG = [(1, 5, True), (1, 6, False), (1, 0, True), (1, 3, False)]


def test_polygon_dispatch(spark):
    out = _run(spark, [], [], POLYS, DEG)
    # boundary kept in dim 2
    assert out[(2, 0, 1)] == 1 and out[(2, 1, 2)] == 1 and out[(2, 2, 0)] == 1
    # hole pair + hole vertex discarded
    assert (1, 10, 11) not in out and (1, 11, 10) not in out
    assert (0, 30, 30) not in out
    # shell pair demoted to polylines, shell vertex to a point
    assert out[(1, 20, 21)] == 1 and out[(1, 21, 20)] == 1
    assert out[(0, 40, 40)] == 1
    assert len(out) == 6


def test_polyline_suppression_rules(spark):
    lines = [
        (1, 0, 1),  # coincides with boundary edge forward -> dropped
        (1, 2, 1),  # reverse of boundary edge (1,2) -> dropped
        (1, 20, 21),  # coincides with SHELL pair -> KEPT
        (1, 10, 11),  # coincides with HOLE pair -> dropped
        (1, 50, 51),  # free -> kept
        (1, 60, 60),  # isolated degenerate -> point
        (1, 0, 0),  # degenerate at boundary vertex -> suppressed
    ]
    out = _run(spark, [], lines, POLYS, DEG)
    assert (1, 0, 1) not in out  # polyline dropped; boundary edge stays
    assert out[(2, 0, 1)] == 1
    assert (1, 2, 1) not in out
    assert out[(1, 20, 21)] == 2  # demoted pair edge + kept polyline
    assert (1, 10, 11) not in out
    assert out[(1, 50, 51)] == 1
    assert out[(0, 60, 60)] == 1
    assert (0, 0, 0) not in out


def test_point_suppression_and_multiset(spark):
    lines = [(1, 50, 51), (1, 60, 60)]
    points = [(1, 0), (1, 50), (1, 60), (1, 70), (1, 40)]
    out = _run(spark, points, lines, POLYS, DEG)
    assert (0, 0, 0) not in out  # boundary vertex
    assert (0, 50, 50) not in out  # polyline endpoint
    # 60 touches only a DEGENERATE polyline edge: point kept AND the
    # demoted point joins it (multiset n=2)
    assert out[(0, 60, 60)] == 2
    assert out[(0, 70, 70)] == 1
    # 40 is the shell vertex: its own point + the demoted shell = 2
    assert out[(0, 40, 40)] == 2


def test_suppress_false_keeps_lower_dimensions(spark):
    lines = [(1, 0, 1), (1, 2, 1), (1, 10, 11), (1, 60, 60)]
    points = [(1, 0), (1, 60)]
    out = _run(spark, points, lines, POLYS, DEG, suppress=False)
    # coincident polylines all kept; degenerate polyline still demoted
    assert out[(1, 0, 1)] == 1 and out[(1, 2, 1)] == 1
    assert out[(1, 10, 11)] == 1
    assert out[(0, 60, 60)] == 2  # point + demotion
    assert out[(0, 0, 0)] == 1
