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

from ..kernels.containsvertex import contains_signs_batch

__all__ = ["reference_points"]

_OUT_SCHEMA = "gid long, ref_vertex long, contained boolean"
_N_BUCKETS = 256


def _query_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
    """One vectorized contains-vertex fold over the whole bucket
    (kernels/containsvertex.contains_signs_batch — bit-identical to the
    scalar ContainsVertexQuery, pinned by test); the per-shape Python
    loop this replaces dominated the query wall at corpus scale."""
    gid = pdf["gid"].to_numpy(np.int64)
    target = pdf[["vx", "vy", "vz"]].to_numpy(np.float64)
    far = pdf[["wx", "wy", "wz"]].to_numpy(np.float64)
    sgn = pdf["sign"].to_numpy(np.int64)
    ug, bsign = contains_signs_batch(gid, target, far, sgn)
    verts = (
        pdf[["gid", "v"]]
        .drop_duplicates("gid")
        .set_index("gid")["v"]
        .reindex(ug)
        .to_numpy(np.int64)
    )
    return pd.DataFrame(
        {"gid": ug, "ref_vertex": verts, "contained": bsign > 0}
    )


def reference_points(edges: DataFrame) -> DataFrame:
    """edges(gid, seq, src, dst, sx..sz, dx..dz) ->
    (gid, ref_vertex, contained), one row per shape."""
    from pyspark import StorageLevel

    # the edge table feeds FOUR legs (first-vertex pick, the directed
    # count agg, and both incident-edge projections); persist it so the
    # upstream coordinate derivation runs once — the minhash/ngram
    # recompute-elimination pattern
    edges = edges.persist(StorageLevel.MEMORY_AND_DISK)
    first_v = (
        edges.groupBy("gid")
        .agg(F.min(F.struct("seq", "src")).alias("m"))
        .select("gid", F.col("m.src").alias("v0"))
    )
    # unmatched directed pairs via ONE canonical-key aggregation (the
    # pair (a, b) is unmatched iff cnt(a, b) != cnt(b, a); aggregating
    # on (lo, hi) = (min, max) with a direction flag computes both
    # multiplicities in one map-side-combinable pass — this replaced a
    # full-outer self-join of the directed-count table, which was the
    # query's dominant shuffle).  Self-loops (src == dst) are their own
    # reverse siblings and can never be unmatched.
    unm_canon = (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            "gid",
            F.least("src", "dst").alias("lo"),
            F.greatest("src", "dst").alias("hi"),
            (F.col("src") < F.col("dst")).cast("long").alias("fwd"),
        )
        .groupBy("gid", "lo", "hi")
        .agg(
            F.sum("fwd").alias("nf"),
            (F.count(F.lit(1)) - F.sum("fwd")).alias("nr"),
        )
        .where(F.col("nf") != F.col("nr"))
        .select("gid", "lo", "hi")
    )
    # the reference's sorted-sweep pick = min directed (a, b) over the
    # unmatched set; since (hi, lo) > (lo, hi) rowwise, the global min
    # is min struct(lo, hi)
    fallback = unm_canon.groupBy("gid").agg(
        F.min(F.struct("lo", "hi")).alias("m")
    ).select("gid", F.col("m.lo").alias("vf"))
    # v0 is unbalanced iff it is an endpoint of any unmatched pair
    unb_verts = unm_canon.select(
        "gid", F.explode(F.array("lo", "hi")).alias("v0")
    ).distinct()
    unb_first = first_v.join(unb_verts, ["gid", "v0"], "left_semi").select(
        "gid", F.col("v0").alias("vu")
    )
    # one row per shape, consumed by the incident-edge leg AND (via its
    # null rows) the balanced arm: persist so the unmatched chain runs
    # once.  A plain hash join on gid follows — NOT broadcast: at 10^12
    # rows there are millions of shapes.
    chosen = (
        first_v.join(unb_first, "gid", "left")
        .join(fallback, "gid", "left")
        .select("gid", F.coalesce("vu", "vf").alias("v"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # shapes with every edge matched: contained = false, sentinel vertex
    balanced = chosen.where(F.col("v").isNull()).select(
        "gid",
        F.lit(-1).cast("long").alias("ref_vertex"),
        F.lit(False).alias("contained"),
    )
    live = chosen.where(F.col("v").isNotNull())
    # ONE pass over the edge table for both incident directions: an
    # edge contributes outgoing (+1) when src == v, incoming (-1) when
    # dst == v, and BOTH rows for a degenerate self-loop at v (they
    # cancel in the fold, matching AddEdge's direction-0 contract)
    out_e = F.struct(
        F.col("sx").alias("vx"), F.col("sy").alias("vy"), F.col("sz").alias("vz"),
        F.col("dx").alias("wx"), F.col("dy").alias("wy"), F.col("dz").alias("wz"),
        F.lit(1).alias("sign"),
    )
    in_e = F.struct(
        F.col("dx").alias("vx"), F.col("dy").alias("vy"), F.col("dz").alias("vz"),
        F.col("sx").alias("wx"), F.col("sy").alias("wy"), F.col("sz").alias("wz"),
        F.lit(-1).alias("sign"),
    )
    ent = (
        F.when(
            (F.col("src") == F.col("v")) & (F.col("dst") == F.col("v")),
            F.array(out_e, in_e),
        )
        .when(F.col("src") == F.col("v"), F.array(out_e))
        .otherwise(F.array(in_e))
    )
    incident = (
        edges.join(live, ["gid"])
        .where((F.col("src") == F.col("v")) | (F.col("dst") == F.col("v")))
        .select("gid", "v", F.explode(ent).alias("e"))
        .select("gid", "v", "e.*")
    )
    queried = (
        incident.withColumn("bkt", F.pmod(F.col("gid"), F.lit(_N_BUCKETS)))
        .groupBy("bkt")
        .applyInPandas(lambda pdf: _query_bucket(pdf), _OUT_SCHEMA)
    )
    # materialize the (one-row-per-shape) result eagerly so the two
    # intermediate caches can be released now instead of accumulating
    # for the process lifetime of a long multi-query session (cached
    # plans are pinned by the session's cache manager until unpersisted)
    result = queried.unionByName(balanced).localCheckpoint()
    edges.unpersist()
    chosen.unpersist()
    return result
