"""S2ShapeIndex measures (SURVEY.md §2.7, s2shape_index_measures.cc).

Parity target: the index-level aggregates of s2shape_index_measures.h —
``GetDimension`` (max shape dimension), ``GetNumPoints`` (dimension-0
points only), ``GetLength`` (sum of polyline lengths), ``GetPerimeter``
(sum of polygon loop perimeters) and ``GetApproxArea`` (sum of
``2*pi - GetCurvature(loop)`` per loop — s2loop_measures.cc:150
GetApproxArea, reusing operators/curvature's bit-exact curvature).

A distributed "index" here is a group key over the shape tables: the
fixture assigns points, polyline chains, and polygon loops to
``index_id = id % n_indexes`` with polygons/polylines withheld from the
tail indexes so all three dimensions occur as the index maximum.

Bit-exactness: every edge angle is ``atan2(|a x b|, a . b)`` with
scalar math.atan2 (bit-identical to DuckDB's atan2, see
operators/curvature.py); per-shape sums run in vertex order and
per-index sums in (chain_id) order, each replayed by the oracle as a
recursive-CTE fold — float sums are order-defined, never a bare SUM().

Scale: one shuffle per shape table onto its chain key for the per-shape
kernels, one shuffle onto index_id for the final fold; per-group state
is a single chain / a handful of per-shape scalars.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .curvature import _curvature_one

_TWO_PI = 2.0 * math.pi

_SHAPE_SCHEMA = "index_id long, chain_id long, plen double, perim double, area double"
_OUT_SCHEMA = (
    "index_id long, dim long, n_shapes long, n_points long, "
    "length double, perimeter double, area double"
)


def _edge_angle(a, b) -> float:
    """S1Angle between unit vectors: atan2(|a x b|, a . b)."""
    cx = a[1] * b[2] - a[2] * b[1]
    cy = a[2] * b[0] - a[0] * b[2]
    cz = a[0] * b[1] - a[1] * b[0]
    return math.atan2(
        math.sqrt((cx * cx + cy * cy) + cz * cz), (a[0] * b[0] + a[1] * b[1]) + a[2] * b[2]
    )


def _chain_rows(pdf: pd.DataFrame, closed: bool, n_indexes: int) -> dict:
    pdf = pdf.sort_values("seq")
    V = [tuple(r) for r in pdf[["x", "y", "z"]].to_numpy()]
    n = len(V)
    s = 0.0
    for k in range(1, n):
        s = s + _edge_angle(V[k - 1], V[k])
    cid = int(pdf["chain_id"].iloc[0])
    row = {"index_id": cid % n_indexes, "chain_id": cid}
    if closed:
        s = s + _edge_angle(V[n - 1], V[0])
        _, _, curv = _curvature_one(np.asarray(V))
        row |= {"plen": None, "perim": s, "area": _TWO_PI - curv}
    else:
        row |= {"plen": s, "perim": None, "area": None}
    return row


def shape_measures(
    spark: SparkSession,
    points: DataFrame,
    polylines: DataFrame,
    polygons: DataFrame,
    n_indexes: int = 8,
) -> DataFrame:
    """points: (pid, ...); polylines/polygons: (chain_id, seq, x, y, z).

    -> one s2shape_index_measures row per index_id."""

    def line_rows(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame([_chain_rows(pdf, False, n_indexes)])

    def loop_rows(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame([_chain_rows(pdf, True, n_indexes)])

    lines = polylines.groupBy("chain_id").applyInPandas(line_rows, _SHAPE_SCHEMA)
    loops = polygons.groupBy("chain_id").applyInPandas(loop_rows, _SHAPE_SCHEMA)
    shapes = lines.unionByName(loops)

    pts = points.groupBy((F.col("pid") % n_indexes).alias("index_id")).agg(
        F.count(F.lit(1)).alias("n_points")
    )

    def fold_index(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("chain_id")
        length = 0.0
        perim = 0.0
        area = 0.0
        dim = 0
        for _, r in pdf.iterrows():
            if pd.notna(r["plen"]):
                length = length + float(r["plen"])
                dim = max(dim, 1)
            if pd.notna(r["perim"]):
                perim = perim + float(r["perim"])
                area = area + float(r["area"])
                dim = 2
        return pd.DataFrame(
            [
                {
                    "index_id": int(pdf["index_id"].iloc[0]),
                    "dim": dim,
                    "n_shapes": len(pdf),
                    "length": length,
                    "perimeter": perim,
                    "area": area,
                }
            ]
        )

    folded = shapes.groupBy("index_id").applyInPandas(
        fold_index,
        "index_id long, dim long, n_shapes long, length double, "
        "perimeter double, area double",
    )
    # + 1: each index also carries its one point-set shape (dimension 0)
    return (
        pts.join(folded, "index_id", "left")
        .select(
            "index_id",
            F.coalesce("dim", F.lit(0)).alias("dim"),
            (F.coalesce("n_shapes", F.lit(0)) + F.lit(1)).alias("n_shapes"),
            "n_points",
            F.coalesce("length", F.lit(0.0)).alias("length"),
            F.coalesce("perimeter", F.lit(0.0)).alias("perimeter"),
            F.coalesce("area", F.lit(0.0)).alias("area"),
        )
    )


def shape_measures_oracle_sql(
    lines_sql: str, loops_sql: str, points_sql: str, n_indexes: int = 8
) -> str:
    """DuckDB replay.  lines_sql/loops_sql -> (chain_id, seq, x, y, z);
    points_sql -> (pid).  Ordered folds as recursive CTEs."""
    from .curvature import curvature_oracle_sql

    curv = curvature_oracle_sql(loops_sql)
    return f"""
WITH RECURSIVE
lsrc AS MATERIALIZED ({lines_sql}),
osrc AS MATERIALIZED ({loops_sql}),
lv AS MATERIALIZED (
  SELECT chain_id,
         row_number() OVER (PARTITION BY chain_id ORDER BY seq) - 1 AS rn,
         x, y, z
  FROM lsrc),
ov AS MATERIALIZED (
  SELECT chain_id,
         row_number() OVER (PARTITION BY chain_id ORDER BY seq) - 1 AS rn,
         x, y, z
  FROM osrc),
ln_n AS (SELECT chain_id, COUNT(*) AS n FROM lv GROUP BY chain_id),
on_n AS (SELECT chain_id, COUNT(*) AS n FROM ov GROUP BY chain_id),
-- per-edge angles: atan2(|a x b|, a . b), operand order mirrors the kernel
ln_e AS MATERIALIZED (
  SELECT a.chain_id, a.rn,
         atan2(sqrt((cx*cx + cy*cy) + cz*cz), dotab) AS ang
  FROM (
    SELECT a.chain_id, a.rn,
           a.y*b.z - a.z*b.y AS cx, a.z*b.x - a.x*b.z AS cy,
           a.x*b.y - a.y*b.x AS cz,
           (a.x*b.x + a.y*b.y) + a.z*b.z AS dotab
    FROM lv a JOIN lv b ON b.chain_id = a.chain_id AND b.rn = a.rn + 1
  ) a),
on_e AS MATERIALIZED (
  SELECT a.chain_id, a.rn,
         atan2(sqrt((cx*cx + cy*cy) + cz*cz), dotab) AS ang
  FROM (
    SELECT a.chain_id, a.rn,
           a.y*b.z - a.z*b.y AS cx, a.z*b.x - a.x*b.z AS cy,
           a.x*b.y - a.y*b.x AS cz,
           (a.x*b.x + a.y*b.y) + a.z*b.z AS dotab
    FROM ov a
    JOIN on_n c ON c.chain_id = a.chain_id
    JOIN ov b ON b.chain_id = a.chain_id AND b.rn = (a.rn + 1) % c.n
  ) a),
-- ordered per-chain folds (plain += in rn order)
ln_fold AS (
  SELECT chain_id, rn, ang AS s FROM ln_e WHERE rn = 0
  UNION ALL
  SELECT f.chain_id, e.rn, f.s + e.ang
  FROM ln_fold f JOIN ln_e e ON e.chain_id = f.chain_id AND e.rn = f.rn + 1),
ln_len AS (
  SELECT f.chain_id, f.s AS plen FROM ln_fold f
  JOIN ln_n c ON c.chain_id = f.chain_id AND f.rn = c.n - 2),
on_fold AS (
  SELECT chain_id, rn, ang AS s FROM on_e WHERE rn = 0
  UNION ALL
  SELECT f.chain_id, e.rn, f.s + e.ang
  FROM on_fold f JOIN on_e e ON e.chain_id = f.chain_id AND e.rn = f.rn + 1),
on_perim AS (
  SELECT f.chain_id, f.s AS perim FROM on_fold f
  JOIN on_n c ON c.chain_id = f.chain_id AND f.rn = c.n - 1),
curv AS MATERIALIZED ({curv}),
on_area AS (
  SELECT chain_id, {"%.17e" % _TWO_PI} - curvature AS area FROM curv),
-- per-index ordered folds over shapes (chain_id order)
lrank AS (
  SELECT chain_id % {n_indexes} AS index_id, chain_id, plen,
         row_number() OVER (PARTITION BY chain_id % {n_indexes}
                            ORDER BY chain_id) AS rk
  FROM ln_len),
lsum AS (
  SELECT index_id, rk, plen AS s FROM lrank WHERE rk = 1
  UNION ALL
  SELECT f.index_id, r.rk, f.s + r.plen
  FROM lsum f JOIN lrank r ON r.index_id = f.index_id AND r.rk = f.rk + 1),
llast AS (
  SELECT l.index_id, l.s AS length FROM lsum l
  JOIN (SELECT index_id, max(rk) AS mx FROM lrank GROUP BY index_id) m
    ON m.index_id = l.index_id AND l.rk = m.mx),
orank AS (
  SELECT p.chain_id % {n_indexes} AS index_id, p.chain_id, p.perim, a.area,
         row_number() OVER (PARTITION BY p.chain_id % {n_indexes}
                            ORDER BY p.chain_id) AS rk
  FROM on_perim p JOIN on_area a ON a.chain_id = p.chain_id),
osum AS (
  SELECT index_id, rk, perim AS sp, area AS sa FROM orank WHERE rk = 1
  UNION ALL
  SELECT f.index_id, r.rk, f.sp + r.perim, f.sa + r.area
  FROM osum f JOIN orank r ON r.index_id = f.index_id AND r.rk = f.rk + 1),
olast AS (
  SELECT o.index_id, o.sp AS perimeter, o.sa AS area FROM osum o
  JOIN (SELECT index_id, max(rk) AS mx FROM orank GROUP BY index_id) m
    ON m.index_id = o.index_id AND o.rk = m.mx),
shape_cnt AS (
  SELECT index_id, COUNT(*) AS n_shapes, max(dim) AS dim FROM (
    SELECT chain_id % {n_indexes} AS index_id, 1 AS dim FROM ln_len
    UNION ALL
    SELECT chain_id % {n_indexes} AS index_id, 2 AS dim FROM on_perim)
  GROUP BY index_id),
pts AS (
  SELECT pid % {n_indexes} AS index_id, COUNT(*) AS n_points
  FROM ({points_sql}) GROUP BY pid % {n_indexes})
SELECT p.index_id,
       CAST(COALESCE(s.dim, 0) AS BIGINT) AS dim,
       CAST(COALESCE(s.n_shapes, 0) + 1 AS BIGINT) AS n_shapes,
       CAST(p.n_points AS BIGINT) AS n_points,
       COALESCE(l.length, 0e0) AS length,
       COALESCE(o.perimeter, 0e0) AS perimeter,
       COALESCE(o.area, 0e0) AS area
FROM pts p
LEFT JOIN shape_cnt s ON s.index_id = p.index_id
LEFT JOIN llast l ON l.index_id = p.index_id
LEFT JOIN olast o ON o.index_id = p.index_id
"""
