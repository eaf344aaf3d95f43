"""LaxPolygonLayer / LaxPolylineLayer — degeneracy-preserving assembly
(reference: s2builderutil_lax_polygon_layer.cc:1-219,
s2builderutil_lax_polyline_layer.cc:40-106, and the EdgeProcessor
GraphOptions arm they rely on, s2builder_graph.cc EdgeProcessor::Run).

The strict S2PolygonLayer (operators/polygon_layer) discards all
degenerate geometry; the lax layers instead run the graph through
DegenerateEdges::DISCARD_EXCESS + SiblingPairs::DISCARD_EXCESS —
keeping isolated degenerate edges (single-vertex loops) and one copy
of each balanced sibling pair (two-vertex loops) — and assemble
LoopType::CIRCUIT loops (no vertex-simple peeling: a loop may revisit
vertices).  DegenerateBoundaries then selects which degeneracy CLASS
survives: KEEP keeps everything; DISCARD_SHELLS / DISCARD_HOLES drop
the class identified by FindPolygonDegeneracies; DISCARD reproduces
the strict behavior.

Pieces:
* ``process_edges_directed`` — the faithful DIRECTED EdgeProcessor arm
  for DegenerateEdges {DISCARD, DISCARD_EXCESS, KEEP} x SiblingPairs
  {KEEP, DISCARD, DISCARD_EXCESS} with DuplicateEdges::KEEP.
* ``lax_polygon_loops`` — sequential per-graph build (the reference
  layer verbatim, incl. full/empty handling); reference layer-test
  goldens replay in tests/test_lax_layers.py.
* ``lax_polyline_vertices`` — LaxPolylineLayer: KEEP/KEEP/KEEP graph +
  GetPolylines(WALK), single-walk contract.
* ``lax_polygon_loops_grouped`` — the distributed form: one builder
  graph per ``gid``, one shuffle + one applyInPandas (the reference's
  own granularity; millions of bounded builds concurrently at 10^12
  rows — the polygon_layer grouped plan with the lax options).
* ``lax_invariants`` — SQL-checkable per-gid witness of the output
  (edge multiset after graph-option processing + cyclic loop closure),
  the walk_invariants recipe: the CIRCUIT walk order is sequential,
  but which edges survive ProcessEdges and that loops partition them
  into closed cycles are exactly oracle-able.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernels.degeneracies import find_polygon_degeneracies
from .polygon_layer import (
    _canonicalize_loop_order,
    _left_turn_vertex_core,
)

__all__ = [
    "process_edges_directed",
    "lax_polygon_loops",
    "lax_polyline_vertices",
    "lax_polygon_loops_grouped",
    "lax_invariants",
]

_N_BUCKETS = 256

_LOOP_SCHEMA = (
    "gid long, loop_id long, vec_key long, pos long, eid long, "
    "src long, dst long"
)


def process_edges_directed(
    edges: list[tuple[int, int, int]],
    degenerate_edges: str = "discard_excess",
    sibling_pairs: str = "discard_excess",
) -> list[tuple[int, int, int]]:
    """EdgeProcessor::Run, DIRECTED arm, DuplicateEdges::KEEP
    (s2builder_graph.cc — the merge-join over the sorted edge array).

    ``edges``: (input_edge_id, src, dst) rows.  Returns NEW edges as
    (min_input_id, src, dst) in sorted (src, dst) order; the new edge
    id is the list index, exactly the reference's renumbering.  Where
    the reference merges input-id sets we keep the minimum (the only
    value CanonicalizeLoopOrder consumes)."""
    assert degenerate_edges in ("discard", "discard_excess", "keep")
    assert sibling_pairs in ("keep", "discard", "discard_excess")
    by_pair: dict[tuple[int, int], list[int]] = {}
    nondeg_vertices: set[int] = set()
    for iid, s, d in edges:
        by_pair.setdefault((s, d), []).append(iid)
        if s != d:
            nondeg_vertices.add(s)
            nondeg_vertices.add(d)
    out: list[tuple[int, int, int]] = []
    for (s, d) in sorted(by_pair):
        iids = by_pair[(s, d)]
        if s == d:
            if degenerate_edges == "discard":
                continue
            if degenerate_edges == "discard_excess" and s in nondeg_vertices:
                continue
            merge = degenerate_edges == "discard_excess"
            if merge:
                out.append((min(iids), s, d))
            elif sibling_pairs in ("discard", "discard_excess"):
                # discarding sibling options merge the labels of all
                # duplicate edges (AddEdges(n_out, merged))
                out.extend((min(iids), s, d) for _ in iids)
            else:
                out.extend((iid, s, d) for iid in sorted(iids))
            continue
        n_out = len(iids)
        n_in = len(by_pair.get((d, s), ()))
        if sibling_pairs == "keep":
            out.extend((iid, s, d) for iid in sorted(iids))
        elif sibling_pairs == "discard":
            if n_out <= n_in:
                continue
            out.extend((min(iids), s, d) for _ in range(n_out - n_in))
        else:  # discard_excess
            if n_out < n_in:
                continue
            out.extend((min(iids), s, d) for _ in range(max(1, n_out - n_in)))
    return out


def _is_fully_degenerate(edges: list[tuple[int, int, int]]) -> bool:
    """IsFullyDegenerate (s2builderutil_find_polygon_degeneracies.cc):
    every edge is degenerate or has a sibling."""
    pairs = {(s, d) for _, s, d in edges}
    return all(s == d or (d, s) in pairs for _, s, d in edges)


def _circuit_loops(
    edges: list[tuple[int, int, int]], coords: dict[int, tuple]
) -> list[list[int]]:
    """GetDirectedLoops(LoopType::CIRCUIT) over processed edges: walk
    the left-turn permutation's cycles (no peeling), canonicalize each
    rotation and the vector order.  Returns loops as edge-id lists."""
    by_vertex: dict[int, dict[int, tuple[list[int], list[int]]]] = {}
    for e, (_, s, d) in enumerate(edges):
        by_vertex.setdefault(s, {}).setdefault(d, ([], []))[0].append(e)
        by_vertex.setdefault(d, {}).setdefault(s, ([], []))[1].append(e)
    nxt: dict[int, int] = {}
    for v0, by_nbr in by_vertex.items():
        for a, b in _left_turn_vertex_core(v0, by_nbr, coords):
            nxt[a] = b
    mii = {e: iid for e, (iid, _, _) in enumerate(edges)}
    visited: set[int] = set()
    loops: list[list[int]] = []
    for start in range(len(edges)):
        if start in visited or start not in nxt:
            continue
        path: list[int] = []
        e = start
        while e not in visited:
            visited.add(e)
            path.append(e)
            e = nxt[e]
        p0 = _canonicalize_loop_order(path, mii)
        loops.append(path[p0:] + path[:p0])
    loops.sort(key=lambda lp: (mii[lp[0]], lp[0]))
    return loops


def lax_polygon_loops(
    verts: np.ndarray,
    edges: list[tuple[int, int, int]],
    degenerate_boundaries: str = "keep",
    is_full: bool = False,
) -> list[list[int]]:
    """LaxPolygonLayer::BuildDirected for one graph.  ``verts``: (n, 3)
    unit points indexed by vertex id; ``edges``: (input_edge_id, src,
    dst).  Returns loops as VERTEX-id lists (the src of each loop
    edge); a full loop is the empty list.  ``is_full`` plays the
    IsFullPolygonPredicate role (cc:142-147)."""
    assert degenerate_boundaries in (
        "discard", "discard_holes", "discard_shells", "keep",
    )
    coords = {i: tuple(map(float, verts[i])) for i in range(len(verts))}
    if degenerate_boundaries == "discard":
        g = process_edges_directed(edges, "discard", "discard")
    else:
        g = process_edges_directed(edges, "discard_excess", "discard_excess")
    loops: list[list[int]] = []
    if degenerate_boundaries == "discard":
        if not g and is_full:
            loops.append([])
    elif degenerate_boundaries == "keep":
        if _is_fully_degenerate(g) and is_full:
            loops.append([])
    else:
        discard_holes = degenerate_boundaries == "discard_holes"
        pair_list = [(s, d) for _, s, d in g]
        if len(set(pair_list)) != len(pair_list):
            raise ValueError(
                "duplicate directed edges after processing are not "
                "supported by the degeneracy classifier"
            )
        degeneracies = find_polygon_degeneracies(verts, pair_list, is_full)
        if len(degeneracies) == len(g):
            if not degeneracies:
                if is_full:
                    loops.append([])
            elif degeneracies[0][1]:  # is_hole
                loops.append([])
        discard = {e for e, is_hole in degeneracies if is_hole == discard_holes}
        if discard:
            g = [edge for e, edge in enumerate(g) if e not in discard]
    for loop in _circuit_loops(g, coords):
        loops.append([g[e][1] for e in loop])
    return loops


def lax_polyline_vertices(
    edges: list[tuple[int, int, int]]
) -> list[int]:
    """LaxPolylineLayer::Build for one graph: KEEP/KEEP/KEEP graph
    options, GetPolylines(WALK), single-walk contract; returns the
    vertex-id chain (first src then every dst)."""
    from .polyline_walks import build_walks

    if not edges:
        return []
    g = process_edges_directed(edges, "keep", "keep")
    rows = [(e, s, d) for e, (_, s, d) in enumerate(g)]
    walks = build_walks(rows)
    if len(walks) != 1:
        raise ValueError(
            "BUILDER_EDGES_DO_NOT_FORM_POLYLINE: input edges cannot be "
            f"assembled into one polyline (got {len(walks)} walks)"
        )
    walk = walks[0]
    verts = [g[walk[0]][1]]
    verts.extend(g[e][2] for e in walk)
    return verts


# ---------------------------------------------------------------------------
# distributed form
# ---------------------------------------------------------------------------


def _build_group(g: pd.DataFrame, mode: str) -> list[tuple]:
    # vertex ids stay the CALLER's ids (they define the edge sort order
    # the processor and canonicalizations key on — remapping would make
    # the output depend on intra-group row order, which Spark does not
    # guarantee)
    gid = int(g["gid"].iloc[0])
    coords: dict[int, tuple] = {}
    for vid, x, y, z in zip(g["src"], g["sx"], g["sy"], g["sz"]):
        coords[int(vid)] = (float(x), float(y), float(z))
    for vid, x, y, z in zip(g["dst"], g["dx"], g["dy"], g["dz"]):
        coords[int(vid)] = (float(x), float(y), float(z))
    edges = [
        (int(iid), int(s), int(d))
        for iid, s, d in zip(g["eid"], g["src"], g["dst"])
    ]
    if mode == "keep":
        pg = process_edges_directed(edges, "discard_excess", "discard_excess")
    elif mode == "discard":
        pg = process_edges_directed(edges, "discard", "discard")
    else:
        raise ValueError(f"grouped mode {mode!r} not supported")
    mii = {e: iid for e, (iid, _, _) in enumerate(pg)}
    rows: list[tuple] = []
    for loop in _circuit_loops(pg, coords):
        head = loop[0]
        for pos, e in enumerate(loop):
            rows.append(
                (gid, head, mii[head], pos, mii[e], pg[e][1], pg[e][2])
            )
    return rows


def lax_polygon_loops_grouped(
    edges: DataFrame, mode: str = "keep", gid: str = "gid"
) -> DataFrame:
    """Per-graph lax CIRCUIT assembly: ``edges`` carries (gid, eid,
    src, dst, sx..sz, dx..dz); one row per loop edge comes back as
    (gid, loop_id, vec_key, pos, eid, src, dst) with loop_id = the
    loop's first processed-edge id and eid = that edge's min input id.
    One shuffle on the graph key, bounded per-group state — the
    assemble_loops_grouped plan with the lax graph options."""
    work = edges
    if gid != "gid":
        work = work.withColumnRenamed(gid, "gid")
    work = work.withColumn("bkt", F.pmod(F.col("gid"), F.lit(_N_BUCKETS)))

    def bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        rows: list[tuple] = []
        for _, g in pdf.groupby("gid", sort=False):
            rows.extend(_build_group(g, mode))
        return pd.DataFrame(
            rows,
            columns=[
                "gid", "loop_id", "vec_key", "pos", "eid", "src", "dst",
            ],
        ).astype(np.int64)

    return work.groupBy("bkt").applyInPandas(bucket, _LOOP_SCHEMA)


_H_SHIFT = 1 << 26  # entry-fixture vertex ids stay far below 2^26, so
# h = src * 2^26 + dst is injective and 32-row family sums fit int64


def lax_invariants(loop_rows: DataFrame) -> DataFrame:
    """Per-gid SQL-checkable witness of the lax assembly: the loop rows
    must reproduce the post-ProcessEdges edge multiset (count / sum /
    parity-xor of src * 2^20 + dst) and every loop must close
    cyclically (dst_i == src_{(i+1) mod n}); n_open is pinned 0 by the
    oracle."""
    from pyspark.sql import Window

    # the loop table feeds both the witness agg and the closure window:
    # materialize once so the per-graph assembly does not re-run per leg
    loop_rows = loop_rows.localCheckpoint()
    h = (F.col("src") * _H_SHIFT + F.col("dst")).alias("h")
    rows = loop_rows.select(
        "gid", "loop_id", "pos", "src", "dst", h,
        (F.col("src") == F.col("dst")).cast("long").alias("deg"),
    )
    w = Window.partitionBy("gid", "loop_id").orderBy("pos")
    closed = rows.withColumn("nxt_src", F.lead("src").over(w))
    per_loop = closed.groupBy("gid", "loop_id").agg(
        F.sum(
            (
                F.col("nxt_src").isNotNull()
                & (F.col("dst") != F.col("nxt_src"))
            ).cast("long")
        ).alias("mid_open"),
        F.min_by("src", "pos").alias("first_src"),
        F.max_by("dst", "pos").alias("last_dst"),
    )
    loop_open = per_loop.select(
        "gid",
        (
            F.col("mid_open")
            + (F.col("first_src") != F.col("last_dst")).cast("long")
        ).alias("open_cnt"),
    ).groupBy("gid").agg(F.sum("open_cnt").alias("n_open"))
    witness = rows.groupBy("gid").agg(
        F.count(F.lit(1)).alias("n_edges"),
        F.sum("deg").alias("n_degenerate"),
        F.sum("h").alias("sum_h"),
        F.expr("bit_xor(h)").alias("xor_h"),
    )
    return witness.join(loop_open, "gid").select(
        "gid",
        "n_edges",
        "n_degenerate",
        "sum_h",
        "xor_h",
        F.col("n_open").cast("long").alias("n_open"),
    )
