"""Map-projection tiling: web-mercator / plate-carree z/x/y tiles (§2.8).

Parity target: the two concrete projections of s2projections.h —
MercatorProjection (s2projections.h:128-152, s2projections.cc:
MercatorProjection::FromLatLng ``y = 0.5*ln((1+sin phi)/(1-sin phi))``)
and PlateCarreeProjection (s2projections.h:97-126, linear in lat/lng).
The reference exposes Project/Unproject point transforms; the
distributed query this engine needs on top of them is the standard
z/x/y web-map TILE ASSIGNMENT (Google-Maps tiling: x east from
lng=-180, y south from the projection's north clamp), which is how a
100-TB image corpus gets binned for map rendering and spatially
balanced sampling.

Bit-exactness strategy — NO transcendentals at query time: a point's
tile index equals the number of fixed tile BOUNDARIES it lies past, so
both engines evaluate the identical generated SQL text consisting only
of IEEE double multiply/subtract/compare against pre-computed boundary
literals (printed once with %.17e, so Spark and DuckDB parse the same
doubles):

* longitude sector: ``lng(p) >= lam_k`` decided by the half-plane sign
  test ``cos(lam_k)*y - sin(lam_k)*x >= 0`` combined with the
  hemisphere bit ``y >= 0`` (exact — no atan2);
* mercator row: mercator-y is monotone in z (unit vector => sin(lat) =
  z), so ``merc_y(p) <= bound_k``  <=>  ``z <= tanh(bound_k)`` with the
  tanh folded into the literal;
* plate-carree row: ``lat(p) <= lat_k``  <=>  ``z <= sin(lat_k)``.

Boundary rows (measure zero for the synthetic fixtures, and identical
on both engines regardless) assign to the east/south tile, matching
``floor`` tiling semantics.

Scale: pure whole-stage-codegen projection + one hash-agg shuffle on
(proj, xt, yt); no UDF, no Python boundary.  At 10^12 rows this is the
same shape as tile_counts — the canonical partial+final count.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PI = math.pi


def _lit(v: float) -> str:
    return "%.17e" % v


def lng_tile_expr(zoom: int, x: str = "x", y: str = "y") -> str:
    """SQL: web-map x-tile (0..2^zoom-1), east from lng = -180."""
    n = 1 << zoom
    preds = []
    for k in range(1, n):
        lam = -_PI + 2.0 * _PI * k / n
        c, s = _lit(math.cos(lam)), _lit(math.sin(lam))
        cross = f"({c})*({y}) - ({s})*({x}) >= 0e0"
        if lam < 0:
            preds.append(f"(({y}) >= 0e0 OR ({cross}))")
        elif lam == 0:
            preds.append(f"(({y}) >= 0e0)")
        else:
            preds.append(f"(({y}) >= 0e0 AND ({cross}))")
    body = " + ".join(f"(CASE WHEN {p} THEN 1 ELSE 0 END)" for p in preds)
    return f"CAST({body} AS BIGINT)"


def mercator_ytile_expr(zoom: int, z: str = "z") -> str:
    """SQL: web-mercator y-tile (0 at the north clamp), south-positive."""
    n = 1 << zoom
    parts = []
    for k in range(1, n):
        zb = math.tanh(_PI * (1.0 - 2.0 * k / n))
        parts.append(f"(CASE WHEN ({z}) <= {_lit(zb)} THEN 1 ELSE 0 END)")
    return f"CAST({' + '.join(parts)} AS BIGINT)"


def plate_carree_ytile_expr(zoom: int, z: str = "z") -> str:
    """SQL: plate-carree y-tile (0 at the north pole), south-positive."""
    n = 1 << zoom
    parts = []
    for k in range(1, n):
        zb = math.sin(_PI / 2.0 - _PI * k / n)
        parts.append(f"(CASE WHEN ({z}) <= {_lit(zb)} THEN 1 ELSE 0 END)")
    return f"CAST({' + '.join(parts)} AS BIGINT)"


def projection_tiles(df: DataFrame, zoom: int) -> DataFrame:
    """(pid, x, y, z unit vector) -> per-(proj, xt, yt) count + min pid.

    One codegen projection pass derives BOTH projections' tile
    coordinates, stack() unpivots them (still map-side), and a single
    hash agg shuffles on the composite tile key.
    """
    base = df.select(
        "pid",
        F.expr(lng_tile_expr(zoom)).alias("xt"),
        F.expr(mercator_ytile_expr(zoom)).alias("yt_merc"),
        F.expr(plate_carree_ytile_expr(zoom)).alias("yt_plate"),
    )
    stacked = base.select(
        "pid",
        "xt",
        F.expr(
            "stack(2, 'mercator', yt_merc, 'plate_carree', yt_plate)"
            " AS (proj, yt)"
        ),
    )
    return stacked.groupBy("proj", "xt", "yt").agg(
        F.count(F.lit(1)).alias("cnt"), F.min("pid").alias("min_pid")
    )


def projection_tiles_oracle_sql(xyz_cte: str, zoom: int) -> str:
    """DuckDB replay over the SAME generated expression text: any drift
    in the boundary-literal generation hash-mismatches."""
    return f"""
WITH {xyz_cte},
t AS (
  SELECT pid,
         {lng_tile_expr(zoom)} AS xt,
         {mercator_ytile_expr(zoom)} AS yt_merc,
         {plate_carree_ytile_expr(zoom)} AS yt_plate
  FROM xyz),
u AS (
  SELECT 'mercator' AS proj, xt, yt_merc AS yt, pid FROM t
  UNION ALL
  SELECT 'plate_carree' AS proj, xt, yt_plate AS yt, pid FROM t)
SELECT proj, CAST(xt AS BIGINT) AS xt, CAST(yt AS BIGINT) AS yt,
       CAST(COUNT(*) AS BIGINT) AS cnt, CAST(MIN(pid) AS BIGINT) AS min_pid
FROM u GROUP BY proj, xt, yt
"""
