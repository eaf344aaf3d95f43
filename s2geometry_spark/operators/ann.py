"""Similarity search over an embedding column (array<float>).

* cosine_topk_bruteforce — exact top-k: broadcast the (small) query set,
  cross join, JVM-side zip_with/aggregate dot products (no Python), window
  top-k.  The correctness baseline with a bit-exact SQL oracle.
* cosine_topk_lsh        — random-hyperplane LSH: candidates share a
  signature-band bucket; exact refinement on candidates.  The 100-TB
  path: cost O(rows x bands) instead of O(rows x queries).
* ivf_topk               — IVF-style: coarse centroids (deterministic
  sample), route every vector to its nearest centroid (one pass), probe
  the top-`nprobe` centroid lists per query.

Floating-point discipline: every dot/norm folds LEFT-TO-RIGHT over
double-cast elements, so Spark's aggregate() and an explicit left-assoc
SQL sum produce bit-identical doubles (both are sequences of correctly
rounded IEEE ops in the same order).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    sq = F.transform(a, lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))


def cosine_expr(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def dot_sql(a: str, b: str, dim: int) -> str:
    """Left-assoc unrolled SQL dot product (bit-identical to _dot after
    the leading 0.0 + t1 fold step, since 0.0 + x == x exactly)."""
    return " + ".join(
        f"CAST({a}[{i}] AS DOUBLE) * CAST({b}[{i}] AS DOUBLE)"
        for i in range(1, dim + 1)
    )


def norm_sql(a: str, dim: int) -> str:
    sq = " + ".join(
        f"CAST({a}[{i}] AS DOUBLE) * CAST({a}[{i}] AS DOUBLE)"
        for i in range(1, dim + 1)
    )
    return f"sqrt({sq})"


def cosine_topk_bruteforce(
    vectors: DataFrame, queries: DataFrame, k: int = 5
) -> DataFrame:
    """Exact top-k neighbors per query by cosine.

    vectors: (vec_id, embedding); queries: (qid, q_embedding).
    Returns (qid, rank, vec_id, cosine); self-matches (qid == vec_id)
    excluded.  The query side is broadcast — the big side streams once
    with no shuffle until the (tiny) per-query top-k window.
    """
    pairs = vectors.crossJoin(F.broadcast(queries)).where(
        F.col("vec_id") != F.col("qid")
    )
    scored = pairs.select(
        "qid",
        "vec_id",
        cosine_expr(F.col("q_embedding"), F.col("embedding")).alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", F.col("rank").cast("long").alias("rank"), "vec_id", "cosine")
    )


def embedding_near_dup(vectors: DataFrame, tau: float = 0.9) -> DataFrame:
    """All pairs (vec_a < vec_b) with cosine >= tau — brute force,
    oracle-checkable; the LSH variant is the scale path."""
    a = vectors.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    b = vectors.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    pairs = a.crossJoin(b).where(F.col("vec_a") < F.col("vec_b"))
    return (
        pairs.select(
            "vec_a", "vec_b", cosine_expr(F.col("ea"), F.col("eb")).alias("cosine")
        )
        .where(F.col("cosine") >= tau)
    )


# ---------- LSH (random hyperplanes) ----------


def _hyperplanes(dim: int, nbits: int, seed: int = 1234) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from splitmix64 (driver-side
    constants, broadcast via literals)."""
    import numpy as np

    from ..kernels.geotag import splitmix64

    idx = np.arange(dim * nbits, dtype=np.uint64) + np.uint64(seed) * np.uint64(
        0x9E3779B9
    )
    u = (splitmix64(idx) >> np.uint64(11)).astype(np.float64) * (1.0 / (1 << 53))
    g = np.sqrt(-2.0 * np.log(np.clip(u, 1e-300, None))) * np.cos(
        2.0 * np.pi * (splitmix64(idx + np.uint64(77)) >> np.uint64(11)).astype(np.float64) * (1.0 / (1 << 53))
    )
    return g.reshape(nbits, dim).tolist()


def signature_expr(emb: Column, planes: list[list[float]]) -> Column:
    """LSH signature: one long, bit i = sign(dot(emb, plane_i)) — pure SQL."""
    bits = []
    for i, plane in enumerate(planes):
        d = F.aggregate(
            F.zip_with(
                emb,
                F.array(*[F.lit(float(v)) for v in plane]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(d > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long")))
    sig = bits[0]
    for b in bits[1:]:
        sig = sig + b
    return sig


def cosine_topk_lsh(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nbits: int = 16,
    bands: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: candidates agree with the query on >= 1 signature
    band; exact cosine refinement + window top-k on candidates only."""
    planes = _hyperplanes(dim, nbits)
    rows_per_band = nbits // bands
    mask = (1 << rows_per_band) - 1

    def banded(df: DataFrame, id_col: str, emb_col: str) -> DataFrame:
        sig = signature_expr(F.col(emb_col), planes)
        d = df.withColumn("_sig", sig)
        return d.select(
            id_col,
            emb_col,
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(bi).alias("band"),
                            F.shiftright(F.col("_sig"), bi * rows_per_band)
                            .bitwiseAND(F.lit(mask))
                            .alias("bucket"),
                        )
                        for bi in range(bands)
                    ]
                )
            ).alias("b"),
        ).select(id_col, emb_col, "b.band", "b.bucket")

    v_b = banded(vectors, "vec_id", "embedding")
    q_b = banded(queries, "qid", "q_embedding")
    cand = (
        v_b.join(F.broadcast(q_b), ["band", "bucket"])
        .where(F.col("vec_id") != F.col("qid"))
        .dropDuplicates(["qid", "vec_id"])
    )
    scored = cand.select(
        "qid",
        "vec_id",
        cosine_expr(F.col("q_embedding"), F.col("embedding")).alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", F.col("rank").cast("long").alias("rank"), "vec_id", "cosine")
    )


# ---------- IVF-style coarse quantizer ----------


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
) -> DataFrame:
    """IVF: deterministic coarse centroids (every m-th vector), route each
    vector to its nearest centroid (broadcast argmax — one scan), probe the
    nprobe nearest centroid lists per query.  Approximate; recall grows
    with nprobe (nprobe == n_centroids is exact)."""
    cent = (
        vectors.where(F.pmod(F.xxhash64(F.col("vec_id")), F.lit(97)) == 0)
        .orderBy("vec_id")
        .limit(n_centroids)
        .select(F.col("vec_id").alias("cid"), F.col("embedding").alias("c_emb"))
    )

    def route(df: DataFrame, emb_col: str, out: str, topn: int) -> DataFrame:
        scored = df.crossJoin(F.broadcast(cent)).withColumn(
            "_cs", cosine_expr(F.col(emb_col), F.col("c_emb"))
        )
        w = Window.partitionBy(*df.columns).orderBy(F.col("_cs").desc(), F.col("cid"))
        return (
            scored.withColumn("_cr", F.row_number().over(w))
            .where(F.col("_cr") <= topn)
            .select(*df.columns, F.col("cid").alias(out))
        )

    v_r = route(vectors, "embedding", "v_cid", 1)
    q_r = route(queries, "q_embedding", "q_cid", nprobe)
    cand = v_r.join(
        F.broadcast(q_r), F.col("v_cid") == F.col("q_cid")
    ).where(F.col("vec_id") != F.col("qid"))
    scored = cand.select(
        "qid",
        "vec_id",
        cosine_expr(F.col("q_embedding"), F.col("embedding")).alias("cosine"),
    ).dropDuplicates(["qid", "vec_id"])
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", F.col("rank").cast("long").alias("rank"), "vec_id", "cosine")
    )
