"""Polyline predicates and clipping as distributed joins
(s2polyline.h:158-273: Intersects, IntersectWithPolygon).

* ``chains_to_edges``          — (chain_id, seq, x, y, z) vertex tables
  -> directed edge tables via a per-chain window lag (pure SQL).
* ``polyline_crossing_join``   — S2Polyline::Intersects as a join: two
  chain sets intersect where any edge pair crosses transversally; built
  on the edge-crossing term join, output distinct (chain_a, chain_b).
* ``clip_to_polygon`` (kernel) + ``polyline_clip_join`` — S2Polyline::
  IntersectWithPolygon: split each chain at polygon-boundary crossings,
  keep the sub-arcs inside, re-chain consecutive kept pieces; one
  groupBy(chain) applyInPandas pass with the (broadcast-scale) polygon
  in the closure.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..kernels import predicates
from ..kernels.booleanop import edge_intersection
from ..kernels.regions import Polygon
from .edge_join import edge_crossing_join_cogrouped


def chains_to_edges(
    chains: DataFrame,
    chain_col: str = "chain_id",
    seq_col: str = "seq",
    prefix: str = "a",
) -> DataFrame:
    """(eid, chain, a0x..a1z): one row per chain edge, eid unique.

    Edge endpoints come from a lag window over the vertex sequence —
    JVM-side, one shuffle on the chain key.
    """
    w = Window.partitionBy(chain_col).orderBy(seq_col)
    out = chains.select(
        F.col(chain_col).alias(f"chain_{prefix}"),
        F.col(seq_col).alias("_seq"),
        F.lag("x").over(w).alias(f"{prefix}0x"),
        F.lag("y").over(w).alias(f"{prefix}0y"),
        F.lag("z").over(w).alias(f"{prefix}0z"),
        F.col("x").alias(f"{prefix}1x"),
        F.col("y").alias(f"{prefix}1y"),
        F.col("z").alias(f"{prefix}1z"),
    ).where(F.col(f"{prefix}0x").isNotNull())
    # unique edge id: chain * 2^32 + seq (chain/seq are table-key sized)
    return out.withColumn(
        f"eid_{prefix}",
        F.shiftleft(F.col(f"chain_{prefix}").cast("long"), 32) + F.col("_seq"),
    ).drop("_seq")


def polyline_crossing_join(
    spark: SparkSession,
    chains_a: DataFrame,
    chains_b: DataFrame,
    robust: bool = True,
    broadcast_b: bool = True,
) -> DataFrame:
    """Distinct (chain_a, chain_b) pairs whose polylines cross
    (transversal interior crossing — S2Polyline::Intersects' generic
    position case).

    Uses the COGROUPED crossing join (edge_join.edge_crossing_join_
    cogrouped) with pair_shift=32: each side's term rows ship once per
    coarse cell group, and the in-group kernel dedups straight to chain
    pairs — at sf0.1 this replaces a 27M-row materialized candidate join
    plus a 422k-row edge-pair dedup with ~2.7M cogrouped term rows and a
    ~5k-row chain-pair dedup."""
    ea = chains_to_edges(chains_a, prefix="a")
    eb = chains_to_edges(chains_b, prefix="b")
    pairs = edge_crossing_join_cogrouped(
        spark,
        ea.drop("chain_a"),
        eb.drop("chain_b"),
        robust=robust,
        # swept at sf0.1: one extra subdivision round (~3x fewer
        # in-group pairs on long chain edges) beats the default
        split_rounds=3,
        group_level=4,
        pair_shift=32,
    )
    # the id embeds the chain in bits 32+; pair_shift already applied
    return pairs.select(
        F.col("eid_a").alias("chain_a"), F.col("eid_b").alias("chain_b")
    )


def clip_to_polygon(V: np.ndarray, poly: Polygon) -> list[np.ndarray]:
    """S2Polyline::IntersectWithPolygon: the sub-polylines of chain V
    inside ``poly``.  Splits each edge at boundary crossings (midpoint
    classification per sub-arc), merging consecutive kept sub-arcs."""
    if V.shape[0] < 2:
        return []
    b_edges = []
    for lp in poly.loops:
        vs = lp.vertices
        n = vs.shape[0]
        for i in range(n):
            b_edges.append((vs[i], vs[(i + 1) % n]))
    B0 = np.stack([e[0] for e in b_edges])
    B1 = np.stack([e[1] for e in b_edges])
    pieces: list[list[np.ndarray]] = []
    cur: list[np.ndarray] = []
    for i in range(V.shape[0] - 1):
        a0, a1 = V[i], V[i + 1]
        m = B0.shape[0]
        hit = predicates.edges_cross_batch(
            np.broadcast_to(a0, (m, 3)),
            np.broadcast_to(a1, (m, 3)),
            B0,
            B1,
            robust=True,
        )
        xs = [edge_intersection(a0, a1, B0[j], B1[j]) for j in np.flatnonzero(hit)]
        xs.sort(key=lambda p: -float(np.dot(p, a0)))
        chain = [a0] + xs + [a1]
        for s in range(len(chain) - 1):
            u, v = chain[s], chain[s + 1]
            mid = u + v
            mid = mid / np.linalg.norm(mid)
            if bool(poly.contains_point(mid)):
                if not cur:
                    cur = [u, v]
                elif np.array_equal(cur[-1], u):
                    cur.append(v)
                else:
                    pieces.append(cur)
                    cur = [u, v]
            else:
                if cur:
                    pieces.append(cur)
                    cur = []
    if cur:
        pieces.append(cur)
    return [np.stack(p) for p in pieces if len(p) >= 2]


def buffer_chains(
    chains: DataFrame,
    radius: float,
    num_vertices: int = 24,
    chain_col: str = "chain_id",
    seq_col: str = "seq",
) -> DataFrame:
    """Buffered region per chain (S2BufferOperation approximation,
    kernels.bufferop): one groupBy(chain) applyInPandas pass emitting the
    buffered polygon's loops as vertex rows (chain_id, loop, seq, x, y,
    z) plus the signed polygon area on each row."""
    from ..kernels import bufferop
    from ..kernels.booleanop import polygon_area

    def one_chain(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(seq_col)
        V = pdf[["x", "y", "z"]].to_numpy(np.float64)
        cid = pdf[chain_col].iloc[0]
        loops = bufferop.buffer_polyline(V, radius, num_vertices)
        area = polygon_area(loops)
        rows = []
        for li, lp in enumerate(loops):
            for si in range(lp.shape[0]):
                rows.append(
                    {
                        chain_col: cid,
                        "loop": li,
                        seq_col: si,
                        "x": lp[si, 0],
                        "y": lp[si, 1],
                        "z": lp[si, 2],
                        "area": area,
                    }
                )
        return pd.DataFrame(
            rows, columns=[chain_col, "loop", seq_col, "x", "y", "z", "area"]
        )

    return chains.groupBy(chain_col).applyInPandas(
        one_chain,
        f"{chain_col} long, loop long, {seq_col} long, "
        "x double, y double, z double, area double",
    )


def polyline_clip_join(
    chains: DataFrame,
    poly: Polygon,
    chain_col: str = "chain_id",
    seq_col: str = "seq",
) -> DataFrame:
    """Clip every chain to ``poly``: returns (chain_id, piece, seq, x, y,
    z) — one vertex row per clipped sub-polyline vertex."""

    def one_chain(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(seq_col)
        V = pdf[["x", "y", "z"]].to_numpy(np.float64)
        cid = pdf[chain_col].iloc[0]
        rows = []
        for pi, piece in enumerate(clip_to_polygon(V, poly)):
            for si in range(piece.shape[0]):
                rows.append(
                    {
                        chain_col: cid,
                        "piece": pi,
                        seq_col: si,
                        "x": piece[si, 0],
                        "y": piece[si, 1],
                        "z": piece[si, 2],
                    }
                )
        return pd.DataFrame(
            rows, columns=[chain_col, "piece", seq_col, "x", "y", "z"]
        )

    return chains.groupBy(chain_col).applyInPandas(
        one_chain,
        f"{chain_col} long, piece long, {seq_col} long, "
        "x double, y double, z double",
    )
