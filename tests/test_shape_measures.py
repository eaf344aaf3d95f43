"""s2shape_index_measures parity (operators/shape_measures)."""

import math

import numpy as np
import pytest


def _ring(n=12, lat=0.3):
    ts = 2.0 * math.pi * np.arange(n) / n
    clat = math.cos(lat)
    return np.stack(
        [clat * np.cos(ts), clat * np.sin(ts), np.full(n, math.sin(lat))], axis=1
    )


def test_edge_angle_is_s1angle():
    from s2geometry_spark.operators.shape_measures import _edge_angle

    a = np.array([1.0, 0.0, 0.0])
    b = np.array([0.0, 1.0, 0.0])
    assert _edge_angle(a, b) == pytest.approx(math.pi / 2, abs=1e-15)
    assert _edge_angle(a, a) == 0.0


def test_loop_perimeter_and_approx_area_closed_forms():
    """Constant-latitude ring: perimeter -> small-circle circumference
    as n grows; GetApproxArea == 2*pi - curvature == cap area for a
    fine ring (s2loop_measures.cc:150)."""
    from s2geometry_spark.operators.curvature import _curvature_one
    from s2geometry_spark.operators.shape_measures import _edge_angle

    lat = 0.4
    V = _ring(512, lat=lat)
    perim = 0.0
    n = len(V)
    for k in range(1, n):
        perim += _edge_angle(tuple(V[k - 1]), tuple(V[k]))
    perim += _edge_angle(tuple(V[n - 1]), tuple(V[0]))
    assert perim == pytest.approx(2.0 * math.pi * math.cos(lat), rel=1e-4)
    _, _, curv = _curvature_one(V)
    cap_area = 2.0 * math.pi * (1.0 - math.sin(lat))
    assert 2.0 * math.pi - curv == pytest.approx(cap_area, rel=1e-4)


def test_shape_measures_dimension_rule(spark):
    """GetDimension: indexes with polygons -> 2, polylines only -> 1,
    points only -> 0 (s2shape_index_measures.h:32-38)."""
    import __spark_entry__ as entry
    from tests.conftest import SF_TEST

    import __spark_entry__ as e
    from pyspark.sql import functions as F

    ca = e._chain_points_df(
        spark,
        SF_TEST,
        "customer",
        e._CHAIN_A_EXPR,
        e._CHAIN_A_BASE,
        "c_custkey",
        "c_custkey",
    )
    cids = [r[0] for r in ca.select("chain_id").distinct().collect()]
    n = e.SHAPE_MEASURES_IDX
    has_loop = {c % n for c in cids if c % n <= 5}
    has_line = {c % n for c in cids if c % n <= 6}

    out = entry.q_shape_measures(spark, SF_TEST).toPandas().set_index("index_id")
    for i in out.index:
        want = 2 if i in has_loop else (1 if i in has_line else 0)
        assert out.loc[i, "dim"] == want, i
        if want == 0:
            assert out.loc[i, "length"] == 0.0 and out.loc[i, "area"] == 0.0
            assert out.loc[i, "n_shapes"] == 1  # just the point-set shape
    assert (out["n_points"] > 0).all()


def test_shape_measures_oracle_parity(spark, duck):
    import __spark_entry__ as entry
    from tests.conftest import SF_ORACLE, compare_frames

    q = entry.queries()["shape_measures"]
    sql = entry.oracle_sql()["shape_measures"]
    compare_frames(q(spark, SF_ORACLE), duck.sql(sql))
