"""s2shapeutil::GetReferencePoint as a distributed query.

Parity target: s2shapeutil_get_reference_point.cc:40-105 — the interior
containment seed for arbitrary 2D shapes (what S2LaxPolygonShape and the
boolean machinery use to anchor point-in-polygon semantics when loops
may share vertices or carry degeneracies):

* try the shape's FIRST edge's source vertex: if it is UNBALANCED (some
  incident directed edge has no matching reverse sibling), the vertex's
  containment comes from S2ContainsVertexQuery (the unmatched edge
  immediately clockwise from RefDir(P) — kernels/containsvertex);
* otherwise find the lexicographically smallest unmatched edge by the
  sorted edges-vs-reversed-edges sweep (.cc:80-101) — its source vertex
  is guaranteed unbalanced — and query there.  (The first index where
  the two sorted lists differ is exactly the minimum element of the
  multiset symmetric difference, so the sweep is the relational
  min over {(a,b) : cnt(a,b) != cnt(b,a)});
* if every edge is matched the shape is empty-or-degenerate: contained
  = false (no zero-length chains in this fixture), reference vertex
  emitted as the -1 sentinel (the reference returns S2::Origin()).

Distributed shape: two hash aggregates build the directed-edge counts
and the unmatched set, a broadcast-size per-shape reduction picks the
query vertex, and ONE applyInPandas runs the contains-vertex kernel on
just the chosen vertices' incident edges.  Shapes are independent — the
10^12-row corpus is millions of bounded per-shape groups.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernels.containsvertex import ContainsVertexQuery

__all__ = ["reference_points"]

_OUT_SCHEMA = "gid long, ref_vertex long, contained boolean"
_N_BUCKETS = 256


def _query_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for gid, g in pdf.groupby("gid", sort=False):
        r = g.iloc[0]
        q = ContainsVertexQuery((r["vx"], r["vy"], r["vz"]))
        for t in g.itertuples():
            q.add_edge((t.wx, t.wy, t.wz), int(t.sign))
        rows.append((int(gid), int(r["v"]), q.contains_sign() > 0))
    return pd.DataFrame(rows, columns=["gid", "ref_vertex", "contained"])


def reference_points(edges: DataFrame) -> DataFrame:
    """edges(gid, seq, src, dst, sx..sz, dx..dz) ->
    (gid, ref_vertex, contained), one row per shape."""
    first_v = (
        edges.groupBy("gid")
        .agg(F.min(F.struct("seq", "src")).alias("m"))
        .select("gid", F.col("m.src").alias("v0"))
    )
    cnt = edges.groupBy("gid", F.col("src").alias("a"), F.col("dst").alias("b")).agg(
        F.count(F.lit(1)).alias("n")
    )
    rev = cnt.select("gid", F.col("b").alias("a"), F.col("a").alias("b"),
                     F.col("n").alias("rn"))
    unm = (
        cnt.join(rev, ["gid", "a", "b"], "full_outer")
        .where(
            F.coalesce("n", F.lit(0)) != F.coalesce("rn", F.lit(0))
        )
        .select("gid", "a", "b")
    )
    # the reference's sorted-sweep pick: min (a, b) over the unmatched set
    fallback = unm.groupBy("gid").agg(
        F.min(F.struct("a", "b")).alias("m")
    ).select("gid", F.col("m.a").alias("vf"))
    unb_first = (
        first_v.join(
            unm.select("gid", F.col("a").alias("v0")).distinct(),
            ["gid", "v0"],
            "left_semi",
        ).select("gid", F.col("v0").alias("vu"))
    )
    chosen = (
        first_v.join(unb_first, "gid", "left")
        .join(fallback, "gid", "left")
        .select("gid", F.coalesce("vu", "vf").alias("v"))
    )
    # shapes with every edge matched: contained = false, sentinel vertex
    balanced = chosen.where(F.col("v").isNull()).select(
        "gid",
        F.lit(-1).cast("long").alias("ref_vertex"),
        F.lit(False).alias("contained"),
    )
    # one row per shape — a plain hash join on gid (NOT broadcast: at
    # 10^12 rows there are millions of shapes)
    live = chosen.where(F.col("v").isNotNull())
    outs = edges.join(live, ["gid"]).where(F.col("src") == F.col("v")).select(
        "gid", "v",
        F.col("sx").alias("vx"), F.col("sy").alias("vy"), F.col("sz").alias("vz"),
        F.col("dx").alias("wx"), F.col("dy").alias("wy"), F.col("dz").alias("wz"),
        F.lit(1).alias("sign"),
    )
    ins = edges.join(live, ["gid"]).where(F.col("dst") == F.col("v")).select(
        "gid", "v",
        F.col("dx").alias("vx"), F.col("dy").alias("vy"), F.col("dz").alias("vz"),
        F.col("sx").alias("wx"), F.col("sy").alias("wy"), F.col("sz").alias("wz"),
        F.lit(-1).alias("sign"),
    )
    queried = (
        outs.unionByName(ins)
        .withColumn("bkt", F.pmod(F.col("gid"), F.lit(_N_BUCKETS)))
        .groupBy("bkt")
        .applyInPandas(lambda pdf: _query_bucket(pdf), _OUT_SCHEMA)
    )
    return queried.unionByName(balanced)
