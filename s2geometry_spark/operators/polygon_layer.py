"""S2PolygonLayer / Graph::GetDirectedLoops(SIMPLE) as a distributed query.

Parity target: s2builderutil_s2polygon_layer.h (directed edges, the
default layer configuration) whose loop assembly is
S2Builder::Graph::GetDirectedLoops(LoopType::SIMPLE)
(s2builder_graph.cc:367-417) on top of GetLeftTurnMap
(s2builder_graph.cc:236-321) and AddVertexEdges
(s2builder_graph.cc:196-234):

* per vertex v0, incident edges are gathered neighbor-by-neighbor in
  increasing VertexId order; duplicate out/in runs between the same
  endpoints are ranked by AddVertexEdges (extra incoming first, then
  out/in interleaved — outgoing forward, incoming backward — then extra
  outgoing), so sibling pairs form as many degenerate two-edge loops as
  possible;
* all but the first gathered edge are then sorted CLOCKWISE around v0
  starting from the first edge's endpoint (the comparator is
  !s2pred::OrderedCCW(a, b, min_endpoint, v0), ties by rank);
* incoming edges are matched to the next outgoing edge in that circular
  order by a stack (unmatched leftovers pair circularly: the deepest
  stacked incoming takes the first leftover outgoing) — the LEFT TURN
  MAP, a permutation of the edges whenever indegree == outdegree at
  every vertex;
* loops are peeled from each permutation cycle at every repeated vertex
  (LoopType::SIMPLE path_index logic), each loop rotated so the edge
  AFTER the last maximal min_input_id run comes first
  (CanonicalizeLoopOrder s2builder_graph.cc:322-355 — the put-max-last
  rule preserves vertex order under S2Loop::Invert), and the loop
  vector is ordered by (min_input_id of the first edge, first edge id)
  (CanonicalizeVectorOrder s2builder_graph.cc:357-365).

Why the dataflow formulation is EXACTLY equivalent: the left-turn map
is built independently per vertex (a hash-partitioned applyInPandas —
each group sees precisely the rows GetLeftTurnMap gathers for that
vertex), and with indegree == outdegree it is a permutation of the
edges, so its cycles can be labelled by large/small-star contraction
(O(log n) rounds, operators/graph) and each cycle walked independently from its
minimum edge id — the same start edge the reference's min-unvisited
scan uses for that cycle.  Edge ids are (src, dst)-lexicographic by
construction (the fixture encodes eid = src * 2^28 + dst, an
order-isomorphism onto the reference's sorted edge array — the fixture
has no duplicate directed edges), so every eid comparison the
reference makes is reproduced bit-for-bit.

No driver-side graph state; the only collects are inside
connected_components' fixpoint witness.
"""

from __future__ import annotations

from functools import cmp_to_key

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernels.predicates import ordered_ccw
from .graph import connected_components

_LINK_SCHEMA = "eid long, nxt long"
_LOOP_SCHEMA = (
    "loop_id long, vec_key long, pos long, eid long, src long, dst long"
)

_N_BUCKETS = 256


# ---------------------------------------------------------------------------
# stage A: the left-turn map, one vertex group at a time
# ---------------------------------------------------------------------------


def _add_vertex_edges(out_eids, in_eids, v1, v0_edges):
    """AddVertexEdges (s2builder_graph.cc:196-234): rank the duplicate
    out/in runs between v0 and v1.  ``v0_edges`` rows are
    (incoming, eid, endpoint, rank)."""
    rank = 0
    out_begin, out_end = 0, len(out_eids)
    in_begin, in_end = 0, len(in_eids)
    # any extra incoming edges go at the beginning (taken from the end)
    while in_end - in_begin > out_end - out_begin:
        in_end -= 1
        v0_edges.append((True, in_eids[in_end], v1, rank))
        rank += 1
    # interleave as many outgoing and incoming edges as possible
    while in_end > in_begin:
        v0_edges.append((False, out_eids[out_begin], v1, rank))
        out_begin += 1
        rank += 1
        in_end -= 1
        v0_edges.append((True, in_eids[in_end], v1, rank))
        rank += 1
    # any extra outgoing edges go at the end
    while out_end > out_begin:
        v0_edges.append((False, out_eids[out_begin], v1, rank))
        out_begin += 1
        rank += 1


def _left_turn_vertex_core(
    v0: int,
    by_nbr: dict[int, tuple[list[int], list[int]]],
    coords: dict[int, tuple],
) -> list[tuple[int, int]]:
    """GetLeftTurnMap for ONE vertex: ``by_nbr`` maps each neighbor v1
    to its ([out eids], [in eids]); returns the (in_eid -> out_eid)
    successor pairs created at this vertex."""
    pairs: list[tuple[int, int]] = []
    v0_edges: list[tuple[bool, int, int, int]] = []
    for v1 in sorted(by_nbr):
        outs, ins = by_nbr[v1]
        outs.sort()
        ins.sort()
        if v1 == v0:
            # each degenerate edge becomes its own loop
            pairs.extend((e, e) for e in ins)
            continue
        _add_vertex_edges(outs, ins, v1, v0_edges)
    if not v0_edges:
        return pairs
    o = coords[v0]
    min_ep = v0_edges[0][2]
    ref = coords[min_ep]

    def cmp(a, b):
        # a before b iff !OrderedCCW(a.ep, b.ep, min_ep, v0); same
        # endpoint falls back to rank (s2builder_graph.cc:283-291)
        if a[2] == b[2]:
            return -1 if a[3] < b[3] else 1
        if a[2] == min_ep:
            return -1
        if b[2] == min_ep:
            return 1
        return -1 if not ordered_ccw(coords[a[2]], coords[b[2]], ref, o) else 1

    order = [v0_edges[0]] + sorted(v0_edges[1:], key=cmp_to_key(cmp))
    e_in: list[int] = []
    e_out: list[int] = []
    for incoming, eid, _, _ in order:
        if incoming:
            e_in.append(eid)
        elif e_in:
            pairs.append((e_in.pop(), eid))
        else:
            e_out.append(eid)
    # pair up the leftovers circularly (reference reverses e_out and
    # pops both from the back)
    e_out.reverse()
    while e_out and e_in:
        pairs.append((e_in.pop(), e_out.pop()))
    if e_in:
        raise ValueError(
            "BUILDER_EDGES_DO_NOT_FORM_LOOPS: indegree != outdegree "
            f"at vertex {v0}"
        )
    return pairs


def _left_turn_vertex(g: pd.DataFrame) -> list[tuple[int, int]]:
    """pdf adapter for :func:`_left_turn_vertex_core` (the distributed
    per-vertex path)."""
    coords: dict[int, tuple] = {}
    v0 = int(g["v0"].iloc[0])
    coords[v0] = (
        float(g["v0x"].iloc[0]),
        float(g["v0y"].iloc[0]),
        float(g["v0z"].iloc[0]),
    )
    by_nbr: dict[int, tuple[list[int], list[int]]] = {}
    for r in g.itertuples():
        v1 = int(r.v1)
        coords[v1] = (float(r.v1x), float(r.v1y), float(r.v1z))
        outs, ins = by_nbr.setdefault(v1, ([], []))
        (ins if r.incoming else outs).append(int(r.eid))
    return _left_turn_vertex_core(v0, by_nbr, coords)


def _left_turn_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
    pairs: list[tuple[int, int]] = []
    for _, g in pdf.groupby("v0", sort=False):
        pairs.extend(_left_turn_vertex(g))
    return pd.DataFrame(pairs, columns=["eid", "nxt"]).astype(np.int64)


def left_turn_links(edges: DataFrame) -> DataFrame:
    """edges(eid, src, dst, sx..sz, dx..dz) -> (eid, nxt): the left
    turn map as successor links.

    Scale split: a vertex with exactly one (non-degenerate) incoming
    and one outgoing edge has a FORCED left turn — whatever the
    clockwise order of its two sides, the stack matching (directly or
    via the circular wrap) pairs the incoming with the outgoing — so
    the overwhelmingly common degree-2 case is a pure-Catalyst
    equi-join with no geometry at all.  Only vertices with >= 2
    incident edges on some side enter the Python kernel, which
    replays GetLeftTurnMap faithfully (neighbor gathering order,
    AddVertexEdges ranks, OrderedCCW clockwise sort, stack matching).
    Degenerate self-edges map to themselves (reference semantics) —
    JVM-side unless their vertex is complex (the kernel handles those
    so the interleaving around the vertex stays faithful)."""
    nonself = edges.where(F.col("src") != F.col("dst"))
    # ONE hash agg finds the complex vertices (ind != 1 or outd != 1);
    # they are the high-degree handful (bounded by the geometry's
    # vertex sharing, not by data volume), so they broadcast and every
    # edge-table touch below is map-side
    deg = (
        nonself.select(F.col("dst").alias("v"), F.lit(1).alias("i"))
        .unionByName(
            nonself.select(F.col("src").alias("v"), F.lit(0).alias("i"))
        )
        .groupBy("v")
        .agg(
            F.sum("i").alias("ind"),
            F.sum(F.lit(1) - F.col("i")).alias("outd"),
        )
    )
    complex_v = F.broadcast(
        deg.where((F.col("ind") != 1) | (F.col("outd") != 1)).select("v")
    )
    e_in = nonself.select(F.col("eid").alias("in_eid"), F.col("dst").alias("v"))
    e_out = nonself.select(F.col("eid").alias("out_eid"), F.col("src").alias("v"))
    # anti-join BEFORE the pair join: a hot (complex) vertex must never
    # reach the v-equi-join, where it would fan out ind x outd rows
    links_trivial = (
        e_in.join(complex_v, "v", "left_anti")
        .join(e_out.join(complex_v, "v", "left_anti"), "v")
        .select(F.col("in_eid").alias("eid"), F.col("out_eid").alias("nxt"))
    )
    links_self = (
        edges.where(F.col("src") == F.col("dst"))
        .join(complex_v, edges["src"] == complex_v["v"], "left_anti")
        .select("eid", F.col("eid").alias("nxt"))
    )
    outs = edges.join(complex_v, edges["src"] == complex_v["v"]).select(
        F.col("src").alias("v0"),
        F.col("dst").alias("v1"),
        "eid",
        F.lit(False).alias("incoming"),
        F.col("sx").alias("v0x"),
        F.col("sy").alias("v0y"),
        F.col("sz").alias("v0z"),
        F.col("dx").alias("v1x"),
        F.col("dy").alias("v1y"),
        F.col("dz").alias("v1z"),
    )
    ins = edges.join(complex_v, edges["dst"] == complex_v["v"]).select(
        F.col("dst").alias("v0"),
        F.col("src").alias("v1"),
        "eid",
        F.lit(True).alias("incoming"),
        F.col("dx").alias("v0x"),
        F.col("dy").alias("v0y"),
        F.col("dz").alias("v0z"),
        F.col("sx").alias("v1x"),
        F.col("sy").alias("v1y"),
        F.col("sz").alias("v1z"),
    )
    sides = outs.unionByName(ins).withColumn(
        "bkt", F.pmod(F.col("v0"), F.lit(_N_BUCKETS))
    )
    links_complex = sides.groupBy("bkt").applyInPandas(
        lambda pdf: _left_turn_bucket(pdf), _LINK_SCHEMA
    )
    return links_trivial.unionByName(links_self).unionByName(links_complex)


# ---------------------------------------------------------------------------
# stage C: walk each permutation cycle, peel simple loops, canonicalize
# ---------------------------------------------------------------------------


def _canonicalize_loop_order(loop: list[int], mii: dict[int, int]) -> int:
    """CanonicalizeLoopOrder (s2builder_graph.cc:322-355): the rotation
    start index — the position after the last element of the final
    maximal run of the highest min_input_id (saw_gap logic)."""
    pos = 0
    saw_gap = False
    for i in range(1, len(loop)):
        cmp = mii[loop[i]] - mii[loop[pos]]
        if cmp < 0:
            saw_gap = True
        elif cmp > 0 or not saw_gap:
            pos = i
            saw_gap = False
    pos += 1
    return 0 if pos == len(loop) else pos


def _walk_from(
    start: int,
    nxt: dict[int, int],
    src: dict[int, int],
    dst: dict[int, int],
    mii: dict[int, int],
    visited: set[int],
) -> list[tuple]:
    """Walk one left-turn permutation cycle from ``start``, peeling a
    vertex-simple loop at every repeated vertex (LoopType::SIMPLE,
    s2builder_graph.cc:384-407) and rotating each per
    CanonicalizeLoopOrder."""
    path: list[int] = []
    path_index: dict[int, int] = {}
    rows: list[tuple] = []
    e = start
    while e not in visited:
        visited.add(e)
        path.append(e)
        path_index[src[e]] = len(path) - 1
        j = path_index.get(dst[e])
        if j is not None:
            loop = path[j:]
            del path[j:]
            for e2 in loop:
                path_index.pop(src[e2], None)
            p0 = _canonicalize_loop_order(loop, mii)
            rot = loop[p0:] + loop[:p0]
            head = rot[0]
            rows.extend(
                (head, mii[head], k, e2, src[e2], dst[e2])
                for k, e2 in enumerate(rot)
            )
        e = nxt[e]
    assert not path, "cycle walk did not decompose cleanly"
    return rows


def _walk_cycle(g: pd.DataFrame) -> list[tuple]:
    nxt = dict(zip(g["eid"].astype(int), g["nxt"].astype(int)))
    src = dict(zip(g["eid"].astype(int), g["src"].astype(int)))
    dst = dict(zip(g["eid"].astype(int), g["dst"].astype(int)))
    mii = dict(zip(g["eid"].astype(int), g["iid"].astype(int)))
    rows = _walk_from(min(nxt), nxt, src, dst, mii, set())
    assert len(rows) == len(nxt), "cycle group was not one full cycle"
    return rows


def _walk_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
    rows: list[tuple] = []
    for _, g in pdf.groupby("cycle_id", sort=False):
        rows.extend(_walk_cycle(g))
    return pd.DataFrame(
        rows, columns=["loop_id", "vec_key", "pos", "eid", "src", "dst"]
    ).astype(np.int64)


def assemble_loops(edges: DataFrame) -> DataFrame:
    """edges(eid, iid, src, dst, sx..sz, dx..dz) -> one row per loop
    edge: (loop_id, vec_key, pos, eid, src, dst).

    loop_id = the first edge id of the canonically rotated loop (unique
    per loop); vec_key = min_input_id of that edge — ORDER BY
    (vec_key, loop_id) reproduces CanonicalizeVectorOrder without a
    global window.  REQUIRES indegree == outdegree at every vertex
    (S2Error::BUILDER_EDGES_DO_NOT_FORM_LOOPS raised otherwise)."""
    # materialize the edge fixture once: the degree tables, the four
    # side projections, and the final payload join all scan it, and the
    # upstream derivation (explode + the wide unit-vector expression
    # trees) costs seconds of codegen per re-evaluation (BENCH.md §3)
    edges = edges.localCheckpoint()
    links = left_turn_links(edges)
    comp = connected_components(
        links, "eid", "nxt", node_col="eid", label_col="cycle_id"
    )
    work = (
        edges.select("eid", "iid", "src", "dst")
        .join(links, "eid")
        .join(comp, "eid")
        .withColumn("bkt", F.pmod(F.col("cycle_id"), F.lit(_N_BUCKETS)))
    )
    return work.groupBy("bkt").applyInPandas(
        lambda pdf: _walk_bucket(pdf), _LOOP_SCHEMA
    )


# ---------------------------------------------------------------------------
# the per-graph path: one S2Builder graph per group key
# ---------------------------------------------------------------------------


def _assemble_graph(g: pd.DataFrame) -> list[tuple]:
    """The full reference pipeline for ONE builder graph: GetLeftTurnMap
    over every vertex, then loops walked from each unvisited edge in
    increasing edge-id order (s2builder_graph.cc:384: the min-unvisited
    scan), peeled and canonicalized."""
    eids = g["eid"].to_numpy(np.int64)
    srcs = g["src"].to_numpy(np.int64)
    dsts = g["dst"].to_numpy(np.int64)
    iids = g["iid"].to_numpy(np.int64)
    coords: dict[int, tuple] = {}
    for vid, x, y, z in zip(srcs, g["sx"], g["sy"], g["sz"]):
        coords[int(vid)] = (float(x), float(y), float(z))
    for vid, x, y, z in zip(dsts, g["dx"], g["dy"], g["dz"]):
        coords[int(vid)] = (float(x), float(y), float(z))
    by_vertex: dict[int, dict[int, tuple[list[int], list[int]]]] = {}
    for e, s_, d_ in zip(eids, srcs, dsts):
        e, s_, d_ = int(e), int(s_), int(d_)
        by_vertex.setdefault(s_, {}).setdefault(d_, ([], []))[0].append(e)
        by_vertex.setdefault(d_, {}).setdefault(s_, ([], []))[1].append(e)
    nxt: dict[int, int] = {}
    for v0, by_nbr in by_vertex.items():
        for a, b in _left_turn_vertex_core(v0, by_nbr, coords):
            nxt[a] = b
    src = dict(zip((int(x) for x in eids), (int(x) for x in srcs)))
    dst = dict(zip((int(x) for x in eids), (int(x) for x in dsts)))
    mii = dict(zip((int(x) for x in eids), (int(x) for x in iids)))
    visited: set[int] = set()
    rows: list[tuple] = []
    for e in sorted(nxt):
        if e not in visited:
            rows.extend(_walk_from(e, nxt, src, dst, mii, visited))
    return rows


def _assemble_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
    rows: list[tuple] = []
    for _, g in pdf.groupby("gid", sort=False):
        rows.extend(_assemble_graph(g))
    return pd.DataFrame(
        rows, columns=["loop_id", "vec_key", "pos", "eid", "src", "dst"]
    ).astype(np.int64)


def assemble_loops_grouped(edges: DataFrame, gid: str = "gid") -> DataFrame:
    """Per-graph loop assembly: ``gid`` tags each edge with its builder
    graph — the granularity the reference runs GetDirectedLoops at (one
    S2Builder build per polygon, s2builderutil_s2polygon_layer.h).  A
    10^12-row corpus assembles millions of bounded graphs concurrently
    with ONE shuffle and no iterative rounds; any gid that does not
    SPLIT a graph is valid (merging vertex-disjoint graphs into one
    group changes nothing — their left-turn maps and walks are
    independent and output keys are per-loop).  For a single graph too
    large for one task, use :func:`assemble_loops` (the contraction
    path: distributed per-vertex left turns + O(log n) cycle
    labelling)."""
    work = edges
    if gid != "gid":
        work = work.withColumnRenamed(gid, "gid")
    work = work.withColumn("bkt", F.pmod(F.col("gid"), F.lit(_N_BUCKETS)))
    return work.groupBy("bkt").applyInPandas(
        lambda pdf: _assemble_bucket(pdf), _LOOP_SCHEMA
    )
