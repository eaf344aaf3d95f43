"""Product-quantized ANN (operators/pq) — NumPy replay + invariance."""

import numpy as np
import pandas as pd
import pytest

from s2geometry_spark.operators import pq
from s2geometry_spark.operators.kmeans import KMEANS_INIT_STRIDE, KMEANS_Q


@pytest.fixture(scope="module")
def vecs_pdf():
    rng = np.random.RandomState(7)
    n, dim = 300, 64
    V = rng.randn(n, dim).astype(np.float32)
    return pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": [v for v in V],
        }
    )


def _np_train_encode(pdf, m=pq.PQ_M, kc=pq.PQ_K, iters=pq.PQ_ITERS):
    """Sequential replay of quantize/init/Lloyd/encode."""
    V = np.stack(pdf["embedding"]).astype(np.float64)
    A = np.floor(V * float(KMEANS_Q) + 0.5).astype(np.int64)
    ids = pdf["vec_id"].to_numpy(np.int64)
    init_ids = np.sort(ids[ids % KMEANS_INIT_STRIDE == 0])[:kc]
    sel = np.searchsorted(ids, init_ids)  # ids are sorted in the fixture
    C_full = A[sel]
    sub = A.shape[1] // m
    C = np.stack([C_full[:, j * sub : (j + 1) * sub] for j in range(m)])
    for _ in range(iters):
        Cn = C.copy()
        for j in range(m):
            S = A[:, j * sub : (j + 1) * sub]
            D = ((S[:, None, :] - C[j][None, :, :]) ** 2).sum(axis=2)
            cl = np.argmin(D, axis=1)
            for c in range(kc):
                members = S[cl == c]
                if len(members):
                    Cn[j, c] = np.floor(
                        members.sum(axis=0).astype(np.float64) / len(members)
                    ).astype(np.int64)
        C = Cn
    codes = np.stack(
        [
            np.argmin(
                (
                    (A[:, j * sub : (j + 1) * sub][:, None, :] - C[j][None])
                    ** 2
                ).sum(axis=2),
                axis=1,
            )
            for j in range(m)
        ],
        axis=1,
    )
    return A, C, codes


def test_codebooks_and_codes_match_numpy(spark, vecs_pdf):
    df = spark.createDataFrame(vecs_pdf)
    A, C_want, codes_want = _np_train_encode(vecs_pdf)
    C_got = pq.train_codebooks(df)
    assert np.array_equal(C_got, C_want)
    codes = (
        pq._assign_codes(pq._quantized(df), C_got)
        .toPandas()
        .sort_values("vec_id")
    )
    got = codes[[f"c{j}" for j in range(pq.PQ_M)]].to_numpy()
    assert np.array_equal(got, codes_want)


def test_partitioning_invariance(spark, vecs_pdf):
    df1 = spark.createDataFrame(vecs_pdf).repartition(1)
    df13 = spark.createDataFrame(vecs_pdf).repartition(13)
    q = lambda d: d.where("vec_id % 29 = 0").selectExpr(
        "vec_id AS qid", "embedding AS q_embedding"
    )
    r1 = (
        pq.pq_topk(df1, q(df1), k=3)
        .toPandas()
        .sort_values(["qid", "rank"])
        .reset_index(drop=True)
    )
    r13 = (
        pq.pq_topk(df13, q(df13), k=3)
        .toPandas()
        .sort_values(["qid", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(r1, r13)


def test_adc_distance_is_exact(spark, vecs_pdf):
    """The ADC lookup-table sum equals the direct int64 distance between
    the query's quantized vector and the RECONSTRUCTED code vector."""
    df = spark.createDataFrame(vecs_pdf)
    A, C, codes = _np_train_encode(vecs_pdf)
    sub = A.shape[1] // pq.PQ_M
    qi = 29  # a query vec_id
    qv = A[qi]
    lut = np.stack(
        [
            ((qv[j * sub : (j + 1) * sub][None, :] - C[j]) ** 2).sum(axis=1)
            for j in range(pq.PQ_M)
        ]
    )
    for v in (0, 57, 123):
        adc = sum(lut[j][codes[v, j]] for j in range(pq.PQ_M))
        recon = np.concatenate([C[j][codes[v, j]] for j in range(pq.PQ_M)])
        assert adc == ((qv - recon) ** 2).sum()
