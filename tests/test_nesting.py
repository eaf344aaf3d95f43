"""S2ShapeNestingQuery operator: depth/parent on hand-built families
(mirrors s2shape_nesting_query_test.cc's ring-nest cases)."""

import math

import numpy as np


def _ring(lat0, lng0, radius_deg, n=16):
    """Small circle of vertices around (lat0, lng0), CCW."""
    out = []
    lat0, lng0 = math.radians(lat0), math.radians(lng0)
    c = np.array(
        [math.cos(lat0) * math.cos(lng0), math.cos(lat0) * math.sin(lng0),
         math.sin(lat0)]
    )
    # tangent frame
    u = np.cross([0.0, 0.0, 1.0], c)
    u /= np.linalg.norm(u)
    v = np.cross(c, u)
    r = math.radians(radius_deg)
    for i in range(n):
        t = 2 * math.pi * i / n
        p = math.cos(r) * c + math.sin(r) * (math.cos(t) * u + math.sin(t) * v)
        out.append(p / np.linalg.norm(p))
    return np.stack(out)


def test_loop_nesting_rings(spark):
    """Family 1: three concentric rings (depths 0/1/2, parent chain).
    Family 2: two disjoint rings (both depth 0, no parent)."""
    from s2geometry_spark.operators.nesting import loop_nesting

    rows = []
    for m, rad in enumerate((20.0, 12.0, 5.0)):
        V = _ring(40.0, 10.0, rad)
        rows += [
            (1, m, i, float(p[0]), float(p[1]), float(p[2]))
            for i, p in enumerate(V)
        ]
    for m, lng in enumerate((60.0, 120.0)):
        V = _ring(-30.0, lng, 8.0)
        rows += [
            (2, m, i, float(p[0]), float(p[1]), float(p[2]))
            for i, p in enumerate(V)
        ]
    df = spark.createDataFrame(
        rows, "family_id long, member_id long, seq long, x double, y double, z double"
    )
    out = {
        (r.family_id, r.member_id): (r.depth, r.parent_id)
        for r in loop_nesting(spark, df).collect()
    }
    assert out[(1, 0)] == (0, -1)
    assert out[(1, 1)] == (1, 0)
    assert out[(1, 2)] == (2, 1)
    assert out[(2, 0)] == (0, -1)
    assert out[(2, 1)] == (0, -1)
