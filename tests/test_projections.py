"""Web-mercator / plate-carree tile assignment (operators/projections).

Reference semantics: MercatorProjection / PlateCarreeProjection of
s2projections.h:97-152 composed with standard floor z/x/y tiling.  The
brute-force check below uses the TRANSCENDENTAL formulas (atan2 + the
reference's 0.5*ln((1+sin)/(1-sin)) mercator y).  The engine's
boundary-literal comparison form agrees with it everywhere except for
points lying exactly ON a longitude boundary ray (the fixtures contain
x == 0 and x == y points): there the engine's half-plane test against
the rounded (cos, sin) literals may pick the other adjacent tile — an
inherent 1-ulp definition choice, identical on both engines because
the oracle runs the same generated text (see the parity test).
"""

import math

import numpy as np
import pytest

ZOOM = 4


def _brute_fracs(xyz: np.ndarray, zoom: int):
    n = 1 << zoom
    x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    lng = np.array([math.atan2(b, a) for a, b in zip(x, y)])
    lat_sin = np.clip(z, -1.0, 1.0)
    merc_y = 0.5 * np.log((1.0 + lat_sin) / (1.0 - lat_sin))
    lat = np.arcsin(lat_sin)
    fx = n * (lng + math.pi) / (2.0 * math.pi)
    fym = n * (1.0 - merc_y / math.pi) / 2.0
    fyp = n * (math.pi / 2.0 - lat) / math.pi
    return fx, fym, fyp


def _check(eng: np.ndarray, f: np.ndarray, n: int):
    brute = np.clip(np.floor(f), 0, n - 1).astype(np.int64)
    fr = np.abs(f - np.round(f))
    boundary = fr <= 1e-9
    interior_bad = (~boundary) & (eng != brute)
    assert not interior_bad.any(), (
        f"interior mismatch rows {np.nonzero(interior_bad)[0][:5]}"
    )
    # boundary rows: either adjacent tile is acceptable
    lo = np.clip(np.round(f) - 1, 0, n - 1).astype(np.int64)
    hi = np.clip(np.round(f), 0, n - 1).astype(np.int64)
    ok = (~boundary) | (eng == lo) | (eng == hi)
    assert ok.all()


def test_projection_tiles_match_transcendental_bruteforce(spark):
    from pyspark.sql import functions as F

    from s2geometry_spark.operators.projections import (
        lng_tile_expr,
        mercator_ytile_expr,
        plate_carree_ytile_expr,
    )

    import __spark_entry__ as entry

    pts = entry._order_points_xyz(spark, "/root/testdata/sf0.001").select(
        "pid", "x", "y", "z"
    )
    per_point = pts.select(
        "pid",
        F.expr(lng_tile_expr(ZOOM)).alias("xt"),
        F.expr(mercator_ytile_expr(ZOOM)).alias("ytm"),
        F.expr(plate_carree_ytile_expr(ZOOM)).alias("ytp"),
        "x",
        "y",
        "z",
    ).toPandas().sort_values("pid").reset_index(drop=True)
    xyz = per_point[["x", "y", "z"]].to_numpy()
    fx, fym, fyp = _brute_fracs(xyz, ZOOM)
    n = 1 << ZOOM
    _check(per_point["xt"].to_numpy(), fx, n)
    _check(per_point["ytm"].to_numpy(), fym, n)
    _check(per_point["ytp"].to_numpy(), fyp, n)


def test_projection_tiles_group_shape(spark):
    from s2geometry_spark.operators.projections import projection_tiles

    import __spark_entry__ as entry

    pts = entry._order_points_xyz(spark, "/root/testdata/sf0.001").select(
        "pid", "x", "y", "z"
    )
    out = projection_tiles(pts, ZOOM).toPandas()
    n = 1 << ZOOM
    n_pts = pts.count()
    assert out["xt"].between(0, n - 1).all()
    assert out["yt"].between(0, n - 1).all()
    assert set(out["proj"]) == {"mercator", "plate_carree"}
    assert out.groupby("proj")["cnt"].sum().eq(n_pts).all()


def test_projection_tiles_oracle_parity(spark, duck):
    import __spark_entry__ as entry
    from tests.conftest import SF_ORACLE, compare_frames

    q = entry.queries()["webmercator_tiles"]
    sql = entry.oracle_sql()["webmercator_tiles"]
    compare_frames(q(spark, SF_ORACLE), duck.sql(sql))


def test_mercator_row_monotone_and_pole_clamp():
    """The tanh-folded boundaries replicate the reference's infinite
    mercator y at the poles as clamp-to-edge-tile (s2projections.h:134-
    140 documents the infinity)."""
    from s2geometry_spark.operators.projections import mercator_ytile_expr

    import duckdb
    import pandas as pd

    n = 1 << ZOOM
    zs = np.linspace(-1.0, 1.0, 201)
    expr = mercator_ytile_expr(ZOOM, z="z")
    con = duckdb.connect()
    con.register("zz", pd.DataFrame({"z": zs}))
    got = con.sql(f"SELECT {expr} AS yt FROM zz ORDER BY z").df()["yt"].to_numpy()
    assert got[0] == n - 1 and got[-1] == 0
    assert (np.diff(got) <= 0).all()
