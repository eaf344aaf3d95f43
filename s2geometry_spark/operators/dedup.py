"""Document deduplication operators for large-scale training-data pipelines.

Five flavors over the `documents(doc_id, text, lang, source, n_chars)`
table, each picked for a different scale/recall point:

* exact_dedup            — hash-groupBy on md5(text); one shuffle.
* ngram_jaccard_join     — EXACT near-dup pairs: distinct word n-gram
                           shingles -> inverted-index self-join -> exact
                           Jaccard >= tau.  Exhaustive (any pair with
                           Jaccard > 0 shares a shingle), so it has a
                           brute-force SQL oracle.  The self-join key is
                           the shingle: hot shingles are the skew point,
                           which is what the MinHash path fixes at scale.
* minhash_signatures /
  minhash_lsh_pairs      — MinHash + banded LSH: candidates from band
                           buckets only, refined with exact Jaccard.
                           Probabilistic recall (the 100-TB path: cost is
                           O(docs x bands), never O(pairs)).
* simhash64              — 64-bit SimHash + banded Hamming join.
* embedding_near_dup     — cosine near-dup pairs on the embeddings table
                           (see operators/ann.py for the kernel).

All hot-path expressions are JVM-side built-ins (split/transform/xxhash64/
aggregate); no Python UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_SEP = " "


def words_col(text: str | Column = "text") -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, TOKEN_SEP)


# ---------- exact ----------


def exact_dedup(docs: DataFrame) -> DataFrame:
    """One row per distinct text: (text_hash, keeper_doc_id, n_dups).

    Plain partial+final hash agg; at 100 TB this is the cheapest dedup
    and the template for "keep first by key" (min doc_id is the keeper).
    """
    return docs.groupBy(F.md5(F.col("text")).alias("text_hash")).agg(
        F.min("doc_id").alias("keeper_doc_id"),
        F.count(F.lit(1)).alias("n_dups"),
    )


# ---------- exact n-gram Jaccard join ----------


def shingle_set(df: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingle) distinct word n-grams — pure SQL, codegen.

    transform over a sequence of start offsets; documents shorter than n
    words produce no shingles (guarded sequence).
    """
    w = words_col()
    n_w = F.size(w)
    starts = F.when(n_w >= n, F.sequence(F.lit(0), n_w - n)).otherwise(
        F.array().cast("array<int>")
    )
    shingles = F.transform(
        starts, lambda i: F.concat_ws(TOKEN_SEP, F.slice(w, i + 1, n))
    )
    return (
        df.select("doc_id", F.explode(F.array_distinct(shingles)).alias("shingle"))
    )


def ngram_jaccard_join(docs: DataFrame, n: int = 3, tau: float = 0.5) -> DataFrame:
    """EXACT pairs (doc_a < doc_b) with word-n-gram Jaccard >= tau.

    inverted index self-join on the shingle -> per-pair shared count ->
    Jaccard = shared / (|A| + |B| - shared).  Output (doc_a, doc_b,
    jaccard).  Division is double/double in one pinned expression so the
    DuckDB oracle matches bit-for-bit.
    """
    sh = shingle_set(docs, n)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    # EXACT pruning: a shingle appearing in exactly one document can never
    # contribute to a shared count, so drop df==1 shingles before the
    # self-join (typically the large majority of the inverted index).
    df2 = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df")).where(
        F.col("_df") >= 2
    )
    sh2 = sh.join(df2.select("shingle"), "shingle")
    a = sh2.alias("a")
    b = sh2.alias("b")
    pairs = (
        a.join(b, "shingle")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    j = (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("shared").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("shared")).cast("double"),
        )
        .where(F.col("jaccard") >= tau)
    )
    return j.select("doc_a", "doc_b", "jaccard")


def ngram_jaccard_oracle_sql(n: int = 3, tau: float = 0.5) -> str:
    """DuckDB brute-force oracle for ngram_jaccard_join (same tokenizer,
    same pinned arithmetic)."""
    grams = " || ' ' || ".join(f"w[i+{k}]" for k in range(n))
    return f"""
WITH wrds AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (
  SELECT DISTINCT doc_id, {grams} AS shingle
  FROM wrds, UNNEST(generate_series(1, greatest(len(w) - {n - 1}, 0))) AS t(i)
),
szs AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
  FROM sh a JOIN sh b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       CAST(shared AS DOUBLE) / CAST(sa.sz + sb.sz - shared AS DOUBLE) AS jaccard
FROM pairs
JOIN szs sa ON sa.doc_id = doc_a
JOIN szs sb ON sb.doc_id = doc_b
WHERE CAST(shared AS DOUBLE) / CAST(sa.sz + sb.sz - shared AS DOUBLE) >= {tau}
"""


# ---------- MinHash + LSH (the scale path) ----------


def minhash_signatures(docs: DataFrame, num_hashes: int = 32, n: int = 3) -> DataFrame:
    """(doc_id, sig array<long>): sig[i] = min over shingles of
    xxhash64(shingle, seed=i).  One shuffle (groupBy doc)."""
    sh = shingle_set(docs, n)
    # wide flat projection (codegen) + partial/final min agg — no per-row
    # array construction on the exploded shingle table
    hashed = sh.select(
        "doc_id",
        *[F.xxhash64(F.col("shingle"), F.lit(i)).alias(f"h{i}") for i in range(num_hashes)],
    )
    agg = hashed.groupBy("doc_id").agg(
        *[F.min(f"h{i}").alias(f"h{i}") for i in range(num_hashes)]
    )
    return agg.select(
        "doc_id", F.array(*[f"h{i}" for i in range(num_hashes)]).alias("sig")
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
    tau: float = 0.5,
) -> DataFrame:
    """Near-dup pairs via banded LSH + exact-Jaccard refinement.

    Candidates = pairs agreeing on at least one band of num_hashes/bands
    minhash values (bucket equi-join on the band hash: cost linear in
    docs, robust to shingle skew).  Refinement recomputes EXACT Jaccard
    on the candidates only, so precision is 1.0 and only recall is
    probabilistic (P[miss] = (1 - tau^r)^bands).
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(docs, num_hashes, n)
    band_cols = [
        F.struct(
            F.lit(bi).alias("band"),
            F.xxhash64(
                *[F.col("sig")[bi * rows_per_band + r] for r in range(rows_per_band)]
            ).alias("bucket"),
        )
        for bi in range(bands)
    ]
    bands_df = sig.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("b")
    ).select("doc_id", "b.band", "b.bucket")
    a = bands_df.alias("a")
    b = bands_df.alias("b")
    cand = (
        a.join(b, ["band", "bucket"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    # exact refinement restricted to candidates
    sh = shingle_set(docs, n)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    sa = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    shared = (
        cand.join(sa, "doc_a")
        .join(sb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    za = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    zb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    return (
        shared.join(za, "doc_a")
        .join(zb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("shared").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("shared")).cast("double"),
        )
        .where(F.col("jaccard") >= tau)
        .select("doc_a", "doc_b", "jaccard")
    )


# ---------- SimHash ----------


def simhash64(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash long): sign-aggregated 64-bit word-feature hash.

    Pure SQL: per word, xxhash64 gives 64 bits; each bit votes +-1; the
    sign of the per-bit sum is the output bit.  Shape: explode words ->
    64 flat vote columns (codegen) -> partial+final hash agg of 64 sums
    -> recombine.  (An aggregate() fold over the word array would be
    interpreted per element — an order of magnitude slower.)
    """
    tok = docs.select("doc_id", F.explode(words_col()).alias("w")).withColumn(
        "h", F.xxhash64(F.col("w"))
    )
    votes = tok.select(
        "doc_id",
        *[
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
            .alias(f"v{b}")
            for b in range(64)
        ],
    )
    agg = votes.groupBy("doc_id").agg(
        *[F.sum(f"v{b}").alias(f"v{b}") for b in range(64)]
    )
    bit_exprs = [
        (
            F.when(F.col(f"v{b}") > 0, F.lit(1 << b).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
            if b < 63
            else F.when(F.col("v63") > 0, F.lit(-(1 << 63)).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
        for b in range(64)
    ]
    sim = bit_exprs[0]
    for e in bit_exprs[1:]:
        sim = sim + e
    return agg.select("doc_id", sim.alias("simhash"))


def simhash_near_pairs(docs: DataFrame, max_hamming: int = 8) -> DataFrame:
    """Pairs with Hamming(simhash_a, simhash_b) <= max_hamming via the
    4x16-bit band trick (a pair within Hamming 3 of each other shares at
    least one exact 16-bit band; wider radii trade recall)."""
    sim = simhash64(docs)
    bands = sim.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright(F.col("simhash"), 16 * i)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("chunk"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "simhash", "b.band", "b.chunk")
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(b, ["band", "chunk"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sim_a"),
            F.col("b.simhash").alias("sim_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    ham = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return cand.withColumn("hamming", ham).where(
        F.col("hamming") <= max_hamming
    ).select("doc_a", "doc_b", "hamming")
