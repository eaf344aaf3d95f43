"""S2CellIndex as a distributed query: Build()'s range decomposition.

Parity target: s2cell_index.h:36-107 / s2cell_index.cc Build() — the
reference stores (cell_id, label) pairs and compiles them into a set of
NON-OVERLAPPING leaf-cell ranges subdividing the sphere, where each
range intersects a fixed set of (cell_id, label) pairs; queries walk
the ranges with RangeIterator / NonEmptyRangeIterator and read each
range's contents with ContentsIterator.  That range table IS the index:
everything else (GetIntersectingLabels, S2ClosestCellQuery seeding) is
a lookup against it.

Distributed re-expression (no btree, no delta-coded contents lists):

1. The labelled-cell set is DATA-DERIVED — each label owns the distinct
   parent cells of its points at a per-label level, so cells of
   different labels overlap hierarchically exactly like a collection of
   S2CellUnions added via ``index.Add(union, label)``.
2. Range boundaries = the distinct ``range_min`` / ``range_max + 2``
   leaf ids over all cells (s2cell_index.cc builds the same boundary
   multiset from its delta list; +2 because leaf ids step by 2).
3. ``range_limit`` = the next boundary — a DISTRIBUTED lead: a window
   partitioned by a coarse (level-4) bucket of the boundary id supplies
   in-bucket successors, and a tiny per-bucket first-boundary table
   (≤ 6·4^4 rows, broadcast) stitches the bucket seams.  No global
   single-partition window anywhere.
4. A range's contents = cells containing its start leaf (no boundary
   lies strictly inside a range, so the start's containment set is the
   whole range's).  "Cells containing leaf s" is resolved as a pure
   equi-join: s's parent at each indexed level against the cell table —
   the ancestor-term trick, whole-stage-codegen integer math only.

Empty gaps between unions drop out of the inner join, matching
NonEmptyRangeIterator (s2cell_index.h:97-99).

Scale: the cell table is bounded by (labels × tile universe at the
indexed levels), independent of fact rows; the boundary table by twice
that.  The only per-fact-row work is the initial distinct.  Join keys
are (level, cell) — AQE broadcasts the cell side when small and
shuffle-hash-joins otherwise; no UDF, no Python boundary, no global
sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import parent_expr, range_max_expr, range_min_expr

# per-label indexed level: BASE_LEVEL + (label % LEVEL_SPAN), so labels
# at different levels produce hierarchically overlapping cells
N_LABELS = 40
BASE_LEVEL = 8
LEVEL_SPAN = 4
BUCKET_LEVEL = 4  # seam-stitch bucket for the distributed lead


def labelled_cells(pts: DataFrame, pid: str = "pid", cell: str = "cell") -> DataFrame:
    """(label, lv, cid, rmin, rmax): the distinct labelled-cell table.

    Mirrors S2CellIndex::Add(cell_id, label) over a data-derived
    collection: label = pid mod N_LABELS, cell = the point's parent at
    that label's level.
    """
    lab = F.pmod(F.col(pid), F.lit(N_LABELS)).cast("long")
    k = F.pmod(lab, F.lit(LEVEL_SPAN))
    # ONE scan: per-level constant parent expressions selected by a
    # when-chain (a 4-way union re-scans the fact table 4 times)
    cid = None
    for i in range(LEVEL_SPAN - 1, -1, -1):
        p = parent_expr(cell, BASE_LEVEL + i)
        cid = p if cid is None else F.when(k == i, p).otherwise(cid)
    cells = pts.select(
        lab.alias("label"),
        (F.lit(BASE_LEVEL) + k).cast("int").alias("lv"),
        cid.alias("cid"),
    ).distinct()
    # rmin/rmax from the id's own lsb (biased ids keep the raw lsb:
    # the bias flips only bit 63, far above any cell's lowest set bit)
    return cells.select(
        "label",
        "lv",
        "cid",
        F.expr("cid - (cid & -cid) + 1").alias("rmin"),
        F.expr("cid + (cid & -cid) - 1").alias("rmax"),
    )


def index_ranges(cells: DataFrame) -> DataFrame:
    """The Build() range table: (range_start, range_limit, cell, label, lv).

    One row per (non-empty range) × (intersecting labelled cell) — the
    exploded form of RangeIterator + ContentsIterator output.
    """
    bounds = (
        cells.select(F.col("rmin").alias("b"))
        .unionByName(cells.select((F.col("rmax") + F.lit(2)).alias("b")))
        .distinct()
        .withColumn("bucket", parent_expr("b", BUCKET_LEVEL))
    )
    in_bucket = Window.partitionBy("bucket").orderBy("b")
    bounds = bounds.withColumn("nxt", F.lead("b").over(in_bucket))
    # per-bucket first boundary: <= 6*4^BUCKET_LEVEL rows — the tiny
    # second level of the two-level distributed lead
    firsts = bounds.groupBy("bucket").agg(F.min("b").alias("first_b"))
    firsts = (
        firsts.withColumn("next_first", F.lead("first_b").over(Window.orderBy("bucket")))
        .select("bucket", "next_first")
    )
    ranges = (
        bounds.join(F.broadcast(firsts), "bucket")
        .withColumn("range_limit", F.coalesce("nxt", "next_first"))
        .where(F.col("range_limit").isNotNull())  # drop the end sentinel
        .select(F.col("b").alias("range_start"), "range_limit")
    )
    # contents: parent of the start leaf at each indexed level,
    # equi-joined against the cell table (ancestor-term resolution);
    # the level fan-out is ONE in-row explode, not a 4-way union
    # (a union would recompute the range derivation per branch)
    probe = ranges.select(
        "range_start",
        "range_limit",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(BASE_LEVEL + k).cast("int").alias("lv"),
                        parent_expr("range_start", BASE_LEVEL + k).alias("cid"),
                    )
                    for k in range(LEVEL_SPAN)
                ]
            )
        ).alias("p"),
    ).select("range_start", "range_limit", "p.lv", "p.cid")
    return probe.join(cells.select("label", "lv", "cid"), ["lv", "cid"]).select(
        "range_start",
        F.col("range_limit").cast("long").alias("range_limit"),
        F.col("cid").alias("cell"),
        "label",
        "lv",
    )


def cell_index_ranges(pts: DataFrame) -> DataFrame:
    return index_ranges(labelled_cells(pts))
