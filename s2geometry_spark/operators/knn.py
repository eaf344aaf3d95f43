"""k-nearest-neighbor join via staged cell-neighbor ring expansion.

Re-expression of S2ClosestPointQuery's best-first cell search
(s2closest_point_query_base.h:482-769) as distributed dataflow: instead of
a per-query priority queue, every stage is ONE equi-join of queries against
points co-bucketed by a cell-at-level prefix, followed by a windowed top-k.
A query is *certified* at a stage when its k-th candidate distance is
smaller than the minimum possible distance to any point outside the 3x3
neighbor block — the same admissible lower bound the reference's queue
pruning uses (S2Cell::GetDistance / kMinWidth, s2closest_point_query_base.h:556-560).

Uncertified queries escalate to a coarser level (64x the area); the final
fallback is a brute-force cross join for whatever remains (typically none).
Every stage is shuffle-light: the points side is grouped once per level,
and the neighbor explode happens on the (small) query side.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

from .. import functions as s2f
from ..kernels import cellid, metrics


def _neighbor_block_udf(level: int):
    """cells of the 3x3 block (self + AppendAllNeighbors) at ``level`` for
    each query's cell — vectorized, returns array<long> (biased)."""

    @pandas_udf(ArrayType(LongType()))
    def block(cell_biased: pd.Series) -> pd.Series:
        ids = cellid.from_biased(cell_biased.to_numpy(np.int64))
        own = cellid.parent(ids, level)
        idx, nbrs = cellid.append_all_neighbors(own, level)
        out: list[list[int]] = [[int(b)] for b in cellid.to_biased(own)]
        nb = cellid.to_biased(nbrs)
        for i, b in zip(idx, nb):
            out[int(i)].append(int(b))
        return pd.Series([sorted(set(v)) for v in out])

    return block


def _min_outside_chord2(level: int) -> float:
    """Admissible bound: any point OUTSIDE the 3x3 block at ``level`` is at
    least one neighbor-cell width away => angle >= kMinWidth(level); compare
    in squared-chord space (monotone)."""
    ang = metrics.MIN_WIDTH.get_value(level)
    d = 2.0 * math.sin(0.5 * min(math.pi, ang))
    return d * d


def _stage(
    points_with_cell: DataFrame,
    queries: DataFrame,
    level: int,
    k: int,
    qid: str,
    pid: str,
) -> DataFrame:
    """One ring-expansion stage at ``level``; returns per-query top-k with a
    ``certified`` flag."""
    pts = points_with_cell.withColumn("p_blk", s2f.parent_expr("p_cell", level))
    blk = _neighbor_block_udf(level)
    q = queries.withColumn("q_blocks", blk(F.col("q_cell")))
    q = q.withColumn("p_blk", F.explode("q_blocks")).drop("q_blocks")

    joined = q.join(pts, "p_blk", "inner")
    dist = s2f.chord2_expr(
        F.col("qx"), F.col("qy"), F.col("qz"), F.col("px"), F.col("py"), F.col("pz")
    )
    joined = joined.withColumn("dist_chord2", dist)
    w = Window.partitionBy(qid).orderBy(F.col("dist_chord2").asc(), F.col(pid).asc())
    topk = (
        joined.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(qid, "qx", "qy", "qz", "q_cell", pid, "dist_chord2", "rank")
    )
    bound = _min_outside_chord2(level)
    cert = (
        topk.groupBy(qid)
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.max("dist_chord2").alias("_dmax"),
        )
        .withColumn(
            "certified", (F.col("_n") >= k) & (F.col("_dmax") < F.lit(bound))
        )
        .select(qid, "certified")
    )
    return topk.join(cert, qid, "inner")


def knn_join(
    spark: SparkSession,
    points: DataFrame,
    queries: DataFrame,
    k: int,
    start_level: int = 8,
    num_stages: int = 2,
    qid: str = "qid",
    pid: str = "pid",
) -> DataFrame:
    """Top-k nearest points for every query.

    points: (pid, px, py, pz, p_cell[biased leaf]);
    queries: (qid, qx, qy, qz, q_cell[biased leaf]).
    Returns (qid, rank, pid, dist_chord2).

    Stages run at start_level, start_level-3, ... then brute force for the
    (rare) remainder — each stage a cell-prefix equi-join, never a full
    cross join of the fact table.
    """
    points = points.cache()
    remaining = queries
    results = []
    level = start_level
    for _ in range(num_stages):
        if level < 1:
            break
        staged = _stage(points, remaining, level, k, qid, pid).cache()
        results.append(
            staged.where(F.col("certified")).select(qid, "rank", pid, "dist_chord2")
        )
        certified_q = staged.where(F.col("certified")).select(qid).distinct()
        # uncertified AND zero-candidate queries both survive the anti-join
        remaining = remaining.join(certified_q, qid, "left_anti")
        level -= 3

    # brute-force fallback for the (typically empty) remainder
    bf = remaining.crossJoin(points)
    dist = s2f.chord2_expr(
        F.col("qx"), F.col("qy"), F.col("qz"), F.col("px"), F.col("py"), F.col("pz")
    )
    w = Window.partitionBy(qid).orderBy(F.col("dist_chord2").asc(), F.col(pid).asc())
    bf = (
        bf.withColumn("dist_chord2", dist)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(qid, "rank", pid, "dist_chord2")
    )
    results.append(bf)
    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out
