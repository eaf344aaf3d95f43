"""Connected components over near-dup pair lists (operators.graph)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from s2geometry_spark.operators.graph import connected_components


def brute_components(pairs):
    """Union-find ground truth."""
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def run_case(spark, pairs):
    pdf = pd.DataFrame(pairs, columns=["doc_a", "doc_b"])
    df = spark.createDataFrame(pdf)
    got = {
        r.doc_id: r.component_id
        for r in connected_components(df).collect()
    }
    assert got == brute_components(pairs)


class TestConnectedComponents:
    def test_two_components_and_chain(self, spark):
        run_case(
            spark,
            [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (4, 1)],
        )

    def test_star_and_singleton_pair(self, spark):
        run_case(spark, [(5, 1), (5, 2), (5, 3), (5, 4), (100, 200)])

    def test_random_graphs(self, spark):
        rng = np.random.default_rng(7)
        for _ in range(3):
            n = 60
            m = 50
            pairs = [
                (int(a), int(b))
                for a, b in rng.integers(0, n, size=(m, 2))
                if a != b
            ]
            run_case(spark, pairs)

    def test_long_chain_converges(self, spark):
        # hop distance 12 from the far end to the min node
        run_case(spark, [(i, i + 1) for i in range(12)])

    def test_divergence_guard(self, spark):
        pdf = pd.DataFrame([(i, i + 1) for i in range(8)], columns=["doc_a", "doc_b"])
        with pytest.raises(RuntimeError, match="did not converge"):
            connected_components(spark.createDataFrame(pdf), max_iter=2)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])


def test_long_chain_converges(spark):
    """A 600-node path graph (diameter 599) must converge well inside the
    25-round budget — pointer doubling makes rounds O(log diameter)."""
    from s2geometry_spark.operators.graph import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 600)], "doc_a long, doc_b long"
    )
    rows = connected_components(pairs).collect()
    assert len(rows) == 600
    assert all(r.component_id == 1 for r in rows)
