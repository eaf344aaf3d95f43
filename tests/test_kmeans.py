"""Fixed-point distributed k-means: NumPy replay + reproducibility.

The operator's selling point is bit-reproducibility: quantized integer
arithmetic makes the result invariant to partitioning and shuffle
order, which these tests pin directly (the DuckDB oracle parity runs in
test_entry_correctness via the emb_kmeans entry).
"""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from s2geometry_spark.operators.kmeans import (
    KMEANS_INIT_STRIDE,
    KMEANS_Q,
    kmeans_assign,
)

SF = "/root/testdata/sf0.001"


def _numpy_kmeans(emb_rows, k, iters):
    """Reference replay in plain Python/NumPy (same integer arithmetic)."""
    ids = np.array([r[0] for r in emb_rows], np.int64)
    X = np.array([list(r[1]) for r in emb_rows], np.float64)
    A = np.floor(X * float(KMEANS_Q) + 0.5).astype(np.int64)
    order = np.argsort(ids, kind="stable")
    init_ids = [i for i in order if ids[i] % KMEANS_INIT_STRIDE == 0][:k]
    C = A[init_ids].copy()

    def assign():
        D = ((A[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        return np.argmin(D, axis=1), D

    for _ in range(iters):
        cl, _ = assign()
        for c in range(len(C)):
            members = A[cl == c]
            if len(members):
                s = members.sum(axis=0)
                C[c] = np.array(
                    [math.floor(float(si) / float(len(members))) for si in s],
                    np.int64,
                )
    cl, D = assign()
    return {
        int(i): (int(c), int(D[j, c]))
        for j, (i, c) in enumerate(zip(ids, cl))
    }


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_matches_numpy_replay(spark, emb):
    got = {
        r.vec_id: (r.cluster, r.d2)
        for r in kmeans_assign(emb, k=8, iters=2).collect()
    }
    want = _numpy_kmeans(
        [(r.vec_id, r.embedding) for r in emb.collect()], 8, 2
    )
    assert got == want


def test_partitioning_invariance(spark, emb):
    """The whole point: identical output under different partitionings
    (stand-in for different cluster sizes / AQE re-plans)."""
    a = sorted(
        (r.vec_id, r.cluster, r.d2)
        for r in kmeans_assign(emb.repartition(3), k=8, iters=2).collect()
    )
    b = sorted(
        (r.vec_id, r.cluster, r.d2)
        for r in kmeans_assign(
            emb.repartition(17, "vec_id"), k=8, iters=2
        ).collect()
    )
    assert a == b


def test_zero_iters_is_pure_init_assignment(spark, emb):
    out = kmeans_assign(emb, k=4, iters=0)
    rows = out.collect()
    assert len(rows) == emb.count()
    assert {r.cluster for r in rows} <= set(range(4))


def test_d2_is_exact_integer_distance(spark, emb):
    row = kmeans_assign(emb.where(F.col("vec_id") < 120), k=2, iters=1).collect()[0]
    assert isinstance(row.d2, int) and row.d2 >= 0
