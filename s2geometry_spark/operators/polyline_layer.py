"""S2PolylineVectorLayer / Graph::GetPolylines(PATH) as a distributed query.

Parity target: s2builderutil_s2polyline_vector_layer.h:41-90 with the
default options (directed edges, PolylineType::PATH, DuplicateEdges
KEEP) — i.e. S2Builder::Graph::PolylineBuilder::BuildPaths
(s2builder_graph.cc:635-720):

* a vertex is INTERIOR iff indegree == 1 and outdegree == 1; only
  interior vertices appear inside a polyline;
* polylines start at every edge whose source vertex is not interior
  and follow the unique outgoing edge through interior vertices;
* the edges left over form vertex-disjoint all-interior cycles, each
  emitted as a closed polyline canonicalized so the HIGHEST edge id
  comes last — i.e. the loop starts at the cyclic successor of the max
  edge id (CanonicalizeLoopOrder s2builder_graph.cc:756-787 with input
  ids == edge ids; the put-max-last rule preserves vertex order under
  S2Loop::Invert).

Why the dataflow formulation is EXACTLY equivalent: define
next(e) = the unique edge out of e.dst, valid iff e.dst is interior.
If two edges shared a successor its source would have indegree >= 2
(not interior), so next is injective where defined — the link graph
{e — next(e)} decomposes into simple chains (paths) and simple cycles
(loops), which is precisely what BuildPath traverses.

Distributed plan: two hash-agg degree tables, one equi-join to build
the links, large/small-star contraction (operators/graph) to label
chains with their min edge id in O(log n) rounds, then applyInPandas
to sequence the multi-edge chains.  Two overhead rules learned the
hard way (BENCH.md §3):

* single-edge polylines (an edge in NO link — the overwhelmingly
  common case in branch-dense graphs) never enter Python at all: they
  are a pure-Catalyst anti-join projection.  Without this, a graph of
  n mostly-isolated edges pays n per-group pandas invocations
  (measured: 121 s at sf0.1, vs ~3 s after);
* multi-edge chains are grouped by a 256-bucket hash of the chain
  label with in-group pandas slicing, not one group per chain.

No driver-side graph state.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .graph import connected_components

_OUT_SCHEMA = (
    "chain_id long, seq long, eid long, src long, dst long, is_loop boolean"
)


def _sequence_chain(pdf: pd.DataFrame) -> pd.DataFrame:
    """Order one chain/cycle: walk next-links from the head (no
    in-chain predecessor) or, for cycles, from the cyclic successor of
    the max edge id (the CanonicalizeLoopOrder rotation)."""
    nxt = dict(zip(pdf["eid"], pdf["nxt"]))
    edges = {
        int(r.eid): (int(r.src), int(r.dst)) for r in pdf.itertuples()
    }
    targets = {int(v) for v in pdf["nxt"].dropna()}
    heads = [e for e in edges if e not in targets]
    is_loop = not heads
    start = int(nxt[max(edges)]) if is_loop else heads[0]
    chain_id = int(pdf["chain_id"].iloc[0])
    rows = []
    e: float | int | None = start
    seq = 0
    while e is not None and not (seq > 0 and e == start):
        ei = int(e)
        rows.append((chain_id, seq, ei, edges[ei][0], edges[ei][1], is_loop))
        n = nxt.get(ei)
        e = None if pd.isna(n) else int(n)
        seq += 1
    assert len(rows) == len(pdf), "chain walk did not cover the group"
    return pd.DataFrame(
        rows, columns=["chain_id", "seq", "eid", "src", "dst", "is_loop"]
    )


def _sequence_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
    """One pandas invocation per chain-label bucket: sequence every
    chain in the bucket with in-group slicing."""
    return pd.concat(
        [_sequence_chain(g) for _, g in pdf.groupby("chain_id", sort=False)],
        ignore_index=True,
    )


def assemble_polylines(edges: DataFrame) -> DataFrame:
    """edges(eid, src, dst) -> (chain_id, seq, eid, src, dst, is_loop):
    the PATH polyline decomposition, chain_id = min edge id of the
    polyline, seq = position along it."""
    # interior vertices (outdeg == indeg == 1) in ONE degree aggregation
    # over the unioned endpoint view — replaces two per-side aggs plus
    # their join (one shuffle instead of three)
    interior = (
        edges.select(
            F.col("src").alias("iv"), F.lit(1).alias("o"), F.lit(0).alias("i")
        )
        .unionByName(
            edges.select(
                F.col("dst").alias("iv"), F.lit(0).alias("o"), F.lit(1).alias("i")
            )
        )
        .groupBy("iv")
        .agg(F.sum("o").alias("outd"), F.sum("i").alias("ind"))
        .where((F.col("outd") == 1) & (F.col("ind") == 1))
        .select("iv")
    )
    e = edges.alias("e")
    f = edges.alias("f")
    links = (
        e.join(interior, F.col("e.dst") == F.col("iv"))
        .join(f, F.col("e.dst") == F.col("f.src"))
        .select(F.col("e.eid").alias("eid"), F.col("f.eid").alias("nxt"))
    )
    comp = connected_components(
        links, "eid", "nxt", node_col="eid", label_col="chain_id"
    )
    # comp covers exactly the edges participating in a link (multi-edge
    # chains); everything else is a single-edge polyline and stays JVM-side
    trivial = edges.join(comp.select("eid"), "eid", "left_anti").select(
        F.col("eid").alias("chain_id"),
        F.lit(0).cast("long").alias("seq"),
        "eid",
        "src",
        "dst",
        F.lit(False).alias("is_loop"),
    )
    seqd = (
        edges.join(comp, "eid")
        .join(links, "eid", "left")
        .withColumn("bkt", F.pmod(F.col("chain_id"), F.lit(256)))
        .groupBy("bkt")
        .applyInPandas(lambda pdf: _sequence_bucket(pdf), _OUT_SCHEMA)
    )
    return seqd.unionByName(trivial)
