"""Distributed connected components over near-duplicate pair lists.

The dedup operators (minhash_lsh_pairs, simhash_near_pairs,
phash_near_dup, embedding_near_dup) emit PAIRS; a training-data pipeline
needs CLUSTERS — one keeper per transitively-connected group.  This is
the canonical "connected components in MapReduce" step.

Algorithm: iterative min-label propagation (hash-to-min).  Every node
starts labeled with its own id; each round every node takes the min of
its label and its neighbors' labels (one shuffle per round: an
edge-label equi-join + a min aggregation).  A round is a fixpoint check:
the loop stops when no label changed.  Rounds needed = the maximum hop
distance from any node to its component's minimum-id node — for
near-dup clusters (small, dense) this is 2-4; a guard raises loudly
rather than returning a partial labeling if a pathological chain
exceeds ``max_iter`` (for adversarial diameters, the large-star /
small-star algorithm of Kiveris et al., "Connected Components in
MapReduce and Beyond", converges in O(log n) rounds at the cost of two
joins per round — the propagation loop below is the right trade for
near-dup graphs).

Scale notes: labels are localCheckpoint'ed every round — iterative
plans otherwise stack lineage until the optimizer recompiles the whole
history each action.  The edge table is persisted once, read once per
round.  No driver-side graph state: the driver sees only the per-round
changed-row COUNT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    a: str = "doc_a",
    b: str = "doc_b",
    node_col: str = "doc_id",
    label_col: str = "component_id",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``; the
    component id is the minimum node id of the component."""
    e = pairs.select(F.col(a).alias("u"), F.col(b).alias("v"))
    edges = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct()
    edges = edges.persist()

    lbl = (
        edges.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )

    def label_sum(df: DataFrame):
        # exact fixpoint witness: labels are node ids and every round can
        # only DECREASE them (min of self + neighbors), so the total is
        # strictly monotone until convergence.  One narrow single-stage
        # aggregate over the just-checkpointed frame — replaces the old
        # new-vs-old join + filter + count round-trip (2x the per-round
        # driver actions on a tiny iterative workload).  decimal(38,0)
        # keeps the sum exact for any int64 node-id range.
        return df.agg(
            F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
        ).collect()[0].s

    prev = label_sum(lbl)
    for _ in range(max_iter):
        prop = edges.join(lbl, edges["u"] == lbl["node"]).select(
            F.col("v").alias("node"), F.col("label")
        )
        new = (
            lbl.unionByName(prop)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint()
        )
        cur = label_sum(new)
        lbl = new
        if cur == prev:
            edges.unpersist()
            return lbl.select(
                F.col("node").alias(node_col), F.col("label").alias(label_col)
            )
        prev = cur
    edges.unpersist()
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds — "
        "component diameter exceeds the near-dup design envelope; use a "
        "star-contraction round budget (O(log n)) for such graphs"
    )


def components_oracle_sql(pairs_sql: str) -> str:
    """DuckDB replay: transitive closure by recursive CTE over the SAME
    pair-producing SQL, labeled with the component minimum."""
    return f"""
WITH RECURSIVE prs AS ({pairs_sql}),
edges AS (
  SELECT doc_a AS s, doc_b AS t FROM prs
  UNION
  SELECT doc_b, doc_a FROM prs
),
nodes AS (SELECT DISTINCT s AS node FROM edges),
reach(node, r) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT reach.node, e.t FROM reach JOIN edges e ON e.s = reach.r
)
SELECT node AS doc_id, min(r) AS component_id FROM reach GROUP BY 1
"""
