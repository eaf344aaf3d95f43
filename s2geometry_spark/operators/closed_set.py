"""ClosedSetNormalizer / NormalizeClosedSet as a pure-Catalyst dataflow.

Parity target: s2builderutil_closed_set_normalizer.h:34-118 +
.cc:165-238 (NormalizeEdges) with directed graphs.  Given the three
dimension layers over a shared vertex namespace — points g0, polyline
edges g1, polygon edges g2 — plus the polygon degeneracy classification
(FindPolygonDegeneracies, already a distributed query:
operators/degeneracies.py), the normalizer:

* keeps non-degenerate polygon edges in dimension 2;
* DISCARDS degenerate polygon holes (they do not change the closed
  point set);
* demotes degenerate polygon shells: sibling pairs become two polyline
  edges, single-vertex loops become points;
* demotes degenerate polyline edges to points;
* with ``suppress_lower_dimensions`` (default true), discards
  lower-dimensional features that coincide with higher-dimensional
  ones: a point at any vertex of a non-degenerate g1/g2 edge, and a
  polyline edge coinciding with a polygon edge in either direction.

The reference implements the suppression as a three-way sorted merge
join over the edge vectors (.cc:176-227); the dataflow formulation is
the order-free reading of the same rules, with one subtlety proven
from the merge-join's branch structure: a polyline edge (x,y), x != y,
is KEPT iff

    (x,y) is an edge of a degenerate SHELL pair          (.cc:197-200:
        the demoted pair explicitly re-adds its coincident polylines)
    OR neither (x,y) nor (y,x) is a polygon edge.

Dropping covers the other three cases: forward coincidence with a
normal polygon edge (.cc:188-190 consumes it), coincidence with a
degenerate HOLE pair (the hole branch adds nothing, so the polyline
then matches the pair's REVERSED sibling in the incoming-edge scan,
.cc:212-215), and reverse-only coincidence (same scan).

The vertex-suppression set is computed from the INPUT graphs
(.cc:89-102), i.e. before any demotion — a point at a vertex whose
only incident edge is a degenerate polyline edge survives, together
with the point that edge demotes to (the output is a multiset; the
reference leaves merging to DuplicateEdges::MERGE, .h:70-73).

Inputs follow the reference's input GraphOptions contract (.cc:70-80):
g1/g2 degenerate edges only where isolated, one copy per sibling pair.
Everything here is joins and hash aggregates — no Python stage at all;
the only kernel work at 10^12 rows is inside the upstream degeneracy
classification.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["normalize_closed_set"]


def normalize_closed_set(
    points: DataFrame,
    lines: DataFrame,
    polys: DataFrame,
    degeneracies: DataFrame,
    suppress_lower_dimensions: bool = True,
) -> DataFrame:
    """points(gid, v); lines(gid, src, dst); polys(gid, src, dst,
    deg_id — NULL for normal boundary edges); degeneracies(gid, deg_id,
    is_hole).  Returns the normalized multiset
    (gid, dim, src, dst, n) with points encoded as src == dst."""
    from pyspark import StorageLevel

    # p2 feeds five branches of the output union (out2, shell_pair,
    # shell_pt, the forward-coincidence join, and sup via polys); without
    # the persist each branch re-runs the upstream degeneracy
    # classification pipeline from scratch
    p2 = polys.join(degeneracies, ["gid", "deg_id"], "left").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    is_deg = F.col("deg_id").isNotNull()
    out2 = p2.where(~is_deg).select(
        "gid", F.lit(2).alias("dim"), "src", "dst"
    )
    shell = is_deg & ~F.col("is_hole")
    shell_pair = p2.where(shell & (F.col("src") != F.col("dst"))).select(
        "gid", F.lit(1).alias("dim"), "src", "dst"
    )
    shell_pt = p2.where(shell & (F.col("src") == F.col("dst"))).select(
        "gid", "src", "dst"
    )

    l_nd = lines.where(F.col("src") != F.col("dst"))
    l_deg = lines.where(F.col("src") == F.col("dst")).select(
        "gid", "src", "dst"
    )
    pts = points.select("gid", F.col("v").alias("src"), F.col("v").alias("dst"))

    if suppress_lower_dimensions:
        # endpoints of non-degenerate INPUT g1/g2 edges (.cc:89-102)
        nd = (
            l_nd.select("gid", F.col("src").alias("v"))
            .unionByName(l_nd.select("gid", F.col("dst").alias("v")))
            .unionByName(
                polys.where(F.col("src") != F.col("dst")).select(
                    "gid", F.col("src").alias("v")
                )
            )
            .unionByName(
                polys.where(F.col("src") != F.col("dst")).select(
                    "gid", F.col("dst").alias("v")
                )
            )
        )
        sup = nd.distinct()

        fwd = p2.select(
            F.col("gid").alias("fgid"),
            F.col("src").alias("fsrc"),
            F.col("dst").alias("fdst"),
            is_deg.alias("f_deg"),
            shell.alias("f_shell"),
        )
        rev = polys.select(
            F.col("gid").alias("rgid"),
            F.col("dst").alias("rsrc"),
            F.col("src").alias("rdst"),
            F.lit(True).alias("has_rev"),
        )
        l_cls = l_nd.join(
            fwd,
            (F.col("gid") == F.col("fgid"))
            & (F.col("src") == F.col("fsrc"))
            & (F.col("dst") == F.col("fdst")),
            "left",
        ).drop("fgid")
        l_cls = l_cls.join(
            rev,
            (F.col("gid") == F.col("rgid"))
            & (F.col("src") == F.col("rsrc"))
            & (F.col("dst") == F.col("rdst")),
            "left",
        ).drop("rgid")
        l_keep = l_cls.where(
            (F.col("f_deg").isNotNull() & F.col("f_shell"))
            | (F.col("fsrc").isNull() & F.col("has_rev").isNull())
        ).select("gid", F.lit(1).alias("dim"), "src", "dst")
        # union the point candidates first so the vertex suppression is
        # ONE anti-join instead of three
        cand0 = pts.unionByName(shell_pt).unionByName(l_deg)
        out0 = cand0.join(
            sup,
            (cand0["gid"] == sup["gid"]) & (cand0["src"] == sup["v"]),
            "left_anti",
        )
    else:
        l_keep = l_nd.select("gid", F.lit(1).alias("dim"), "src", "dst")
        out0 = pts.unionByName(shell_pt).unionByName(l_deg)

    out0 = out0.select("gid", F.lit(0).alias("dim"), "src", "dst")
    out = out2.unionByName(shell_pair).unionByName(l_keep).unionByName(out0)
    return out.groupBy("gid", "dim", "src", "dst").agg(
        F.count(F.lit(1)).alias("n")
    )
