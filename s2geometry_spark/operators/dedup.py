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

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_SEP = " "


def words_col(text: str | Column = "text") -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, TOKEN_SEP)


# ---------- portable 64-bit string hash (Spark == DuckDB, bit-exact) ----------
#
# xxhash64 is Spark-only, so every operator that must be ORACLE-CHECKABLE
# hashes strings via md5 (available in both engines) and recomposes the
# first 16 hex chars into a signed 64-bit integer:
#   hi32 = int(hex[0:8]), lo32 = int(hex[8:16]); h = (hi32 << 32) + lo32
# Spark's shiftleft wraps into the sign bit (no ANSI overflow) and DuckDB
# gets the same two's-complement value via an explicit signed fold.


def md5_h64(c: Column) -> Column:
    """Signed 64-bit hash of a string column from its md5 (portable)."""
    hx = F.md5(c)
    hi = F.conv(F.substring(hx, 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(hx, 9, 8), 16, 10).cast("long")
    return F.shiftleft(hi, 32) + lo


def md5_h64_sql(expr: str) -> str:
    """DuckDB SQL for the identical signed 64-bit md5 hash."""
    hi = f"(('0x' || substr(md5({expr}), 1, 8))::BIGINT)"
    lo = f"(('0x' || substr(md5({expr}), 9, 8))::BIGINT)"
    return (
        f"((CASE WHEN {hi} >= 2147483648 THEN {hi} - 4294967296 ELSE {hi} END)"
        f" * 4294967296 + {lo})"
    )


def md5_h32(c: Column) -> Column:
    """Unsigned 32-bit md5-derived hash (always fits int64)."""
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def md5_h32_sql(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 8))::BIGINT)"


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

    The shingle table feeds four legs (sizes, df2, and both sides of the
    self-join), so it is persisted for the plan's lifetime — same
    recompute-elimination as minhash_lsh_pairs.
    """
    from pyspark import StorageLevel

    sh = shingle_set(docs, n).persist(StorageLevel.MEMORY_AND_DISK)
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


MINHASH_P = 2147483647  # 2^31 - 1 (prime); all mixing stays within int64


def _minhash_coeffs(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (A_i, B_i) affine-mixing constants < P, A_i odd."""
    from ..kernels.geotag import splitmix64

    idx = np.arange(2 * num_hashes, dtype=np.uint64) + np.uint64(0xD1FF)
    h = (splitmix64(idx) & np.uint64(0x7FFFFFFE)).astype(np.int64)
    return [
        (int(h[2 * i] | 1), int(h[2 * i + 1]) % MINHASH_P)
        for i in range(num_hashes)
    ]


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = 32,
    n: int = 3,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, sig array<long>): sig[i] = min over shingles of the i-th
    affine mix of ONE portable md5-h64 per shingle:
    h_i = (((h64 % P) + P) % P * A_i + B_i) % P, P = 2^31 - 1.

    One md5 per shingle (not per seed — 32 md5s per row made this the
    slowest query in the suite); the integer mixing is exact int64 both
    engines, so the DuckDB oracle reproduces signatures bit-for-bit.
    One shuffle (groupBy doc).

    ``shingles`` lets a caller that already materialized the (doc_id,
    shingle) table (e.g. minhash_lsh_pairs, which also needs it for the
    exact-Jaccard refinement) pass it in so the md5-heavy explode runs
    once, not once per consumer."""
    sh = shingles if shingles is not None else shingle_set(docs, n)
    coeffs = _minhash_coeffs(num_hashes)
    base = (md5_h64(F.col("shingle")) % MINHASH_P + MINHASH_P) % MINHASH_P
    hashed = sh.select(
        "doc_id", base.alias("_b")
    ).select(
        "doc_id",
        *[
            ((F.col("_b") * F.lit(a) + F.lit(b)) % MINHASH_P).alias(f"h{i}")
            for i, (a, b) in enumerate(coeffs)
        ],
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

    The narrow (doc_id, shingle) table and the signature table are
    PERSISTED for the plan's lifetime: the self-join reads signatures
    twice and the refinement reads shingles three times (sa/sb/sizes),
    and without the persist Spark re-runs the md5-heavy explode for
    every leg (~6 scans of the same derivation; the round-2 plan audit
    measured this as the dominant cost of the whole query).  Both are a
    few narrow columns — tiny relative to the documents scan — and fall
    out of block-manager memory LRU-style under pressure.
    """
    from pyspark import StorageLevel

    rows_per_band = num_hashes // bands
    sh = shingle_set(docs, n).persist(StorageLevel.MEMORY_AND_DISK)
    sig = minhash_signatures(docs, num_hashes, n, shingles=sh).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    # bucket key = the band's raw minhash values joined into one string —
    # no hash-collision false candidates, and the DuckDB oracle builds the
    # identical key (a hashed bucket would be fine at scale; raw keys keep
    # the candidate set EXACTLY reproducible)
    band_cols = [
        F.struct(
            F.lit(bi).alias("band"),
            F.concat_ws(
                ",",
                *[F.col("sig")[bi * rows_per_band + r] for r in range(rows_per_band)],
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
    # exact refinement restricted to candidates (reads the persisted sh)
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


def minhash_lsh_oracle_sql(
    num_hashes: int = 32, bands: int = 8, n: int = 3, tau: float = 0.5
) -> str:
    """DuckDB oracle for minhash_lsh_pairs: recomputes the IDENTICAL
    algorithm (seeded md5-h64 min-hashes, banded raw-value buckets, exact
    Jaccard refinement) — bit-exact candidates, not a recall bound."""
    rows_per_band = num_hashes // bands
    grams = " || ' ' || ".join(f"w[i+{k}]" for k in range(n))
    coeffs = _minhash_coeffs(num_hashes)
    P = MINHASH_P
    base = f"((({md5_h64_sql('shingle')}) % {P} + {P}) % {P})"
    mins = ", ".join(
        f"min((b * {a} + {b_}) % {P}) AS h{i}" for i, (a, b_) in enumerate(coeffs)
    )
    band_sel = " UNION ALL ".join(
        "SELECT doc_id, {bi} AS band, {key} AS bucket FROM sig".format(
            bi=bi,
            key=" || ',' || ".join(
                f"CAST(h{bi * rows_per_band + r} AS VARCHAR)"
                for r in range(rows_per_band)
            ),
        )
        for bi in range(bands)
    )
    return f"""
WITH wrds AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (
  SELECT DISTINCT doc_id, {grams} AS shingle
  FROM wrds, UNNEST(generate_series(1, greatest(len(w) - {n - 1}, 0))) AS t(i)
),
shb AS (SELECT doc_id, {base} AS b FROM sh),
sig AS (SELECT doc_id, {mins} FROM shb GROUP BY doc_id),
bands AS ({band_sel}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b USING (band, bucket)
  WHERE a.doc_id < b.doc_id
),
szs AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
shared AS (
  SELECT c.doc_a, c.doc_b, count(*) AS shared
  FROM cand c
  JOIN sh a ON a.doc_id = c.doc_a
  JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       CAST(shared AS DOUBLE) / CAST(sa.sz + sb.sz - shared AS DOUBLE) AS jaccard
FROM shared
JOIN szs sa ON sa.doc_id = doc_a
JOIN szs sb ON sb.doc_id = doc_b
WHERE CAST(shared AS DOUBLE) / CAST(sa.sz + sb.sz - shared AS DOUBLE) >= {tau}
"""


# ---------- SimHash ----------


def simhash64(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash long): sign-aggregated 64-bit word-feature hash.

    Pure SQL: per word, the portable md5-derived hash gives 64 bits; each
    bit votes +-1; the sign of the per-bit sum is the output bit.  Shape:
    explode words -> 64 flat vote columns (codegen) -> partial+final hash
    agg of 64 sums -> recombine.  (An aggregate() fold over the word
    array would be interpreted per element — an order of magnitude
    slower.)  The DuckDB oracle recomputes the identical integer pipeline
    (simhash_oracle_sql).
    """
    tok = docs.select("doc_id", F.explode(words_col()).alias("w")).withColumn(
        "h", md5_h64(F.col("w"))
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


def simhash_oracle_sql(max_hamming: int = 8) -> str:
    """DuckDB oracle for simhash_near_pairs: the identical integer
    pipeline — md5-h64 per word, per-bit +-1 votes, sign recombine, 4x16
    band self-join, popcount Hamming — so the match is bit-exact, not a
    recall bound."""
    h = md5_h64_sql("w")
    # per-bit votes: sum over words of (+1 | -1) on bit b; >> is arithmetic
    # in both engines, and & 1 isolates the bit regardless of sign fill
    votes = ", ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(64)
    )
    # recombine: bit 63 is the sign bit — add -(2^63) instead of 1<<63
    bits = " + ".join(
        f"(CASE WHEN v{b} > 0 THEN {1 << b}::BIGINT ELSE 0::BIGINT END)"
        for b in range(63)
    )
    sim = f"({bits} + (CASE WHEN v63 > 0 THEN -9223372036854775808 ELSE 0::BIGINT END))"
    band_sel = " UNION ALL ".join(
        f"SELECT doc_id, simhash, {i} AS band, (simhash >> {16 * i}) & 65535 AS chunk FROM sims"
        for i in range(4)
    )
    return f"""
WITH tok AS (
  SELECT doc_id, {h} AS h
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
),
agg AS (SELECT doc_id, {votes} FROM tok GROUP BY doc_id),
sims AS (SELECT doc_id, {sim} AS simhash FROM agg),
bands AS ({band_sel}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.simhash AS sim_a, b.simhash AS sim_b
  FROM bands a JOIN bands b USING (band, chunk)
  WHERE a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST(bit_count(xor(sim_a, sim_b)) AS INTEGER) AS hamming
FROM cand WHERE bit_count(xor(sim_a, sim_b)) <= {max_hamming}
"""


def lsh_recall_audit(
    docs: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
    tau: float = 0.5,
) -> DataFrame:
    """Banding-recall audit of the MinHash-LSH scale path against the
    exact n-gram-Jaccard ground truth — the data-quality measurement a
    pipeline runs before trusting LSH parameters at scale.

    One row: (n_exact, n_lsh, tp, fn, fp, recall).  Both pair sets use
    the same exact-Jaccard refinement at ``tau``, so fp is structurally
    0 and recall isolates what the banding misses (a pair of near-dups
    whose signatures collide in no band).  recall is the pinned
    double/double division so the DuckDB oracle matches bit-for-bit.
    """
    ex = ngram_jaccard_join(docs, n, tau).select(
        "doc_a", "doc_b", F.lit(True).alias("in_exact")
    )
    ls = minhash_lsh_pairs(docs, num_hashes, bands, n, tau).select(
        "doc_a", "doc_b", F.lit(True).alias("in_lsh")
    )
    j = ex.join(ls, ["doc_a", "doc_b"], "full_outer")
    agg = j.agg(
        F.count(F.col("in_exact")).alias("n_exact"),
        F.count(F.col("in_lsh")).alias("n_lsh"),
        F.count(F.when(F.col("in_exact") & F.col("in_lsh"), 1)).alias("tp"),
        F.count(F.when(F.col("in_exact") & F.col("in_lsh").isNull(), 1)).alias("fn"),
        F.count(F.when(F.col("in_lsh") & F.col("in_exact").isNull(), 1)).alias("fp"),
    )
    recall = F.when(F.col("n_exact") == 0, F.lit(0.0)).otherwise(
        F.col("tp").cast("double") / F.col("n_exact").cast("double")
    )
    return agg.select("n_exact", "n_lsh", "tp", "fn", "fp", recall.alias("recall"))


def lsh_recall_oracle_sql(
    num_hashes: int = 32, bands: int = 8, n: int = 3, tau: float = 0.5
) -> str:
    """DuckDB replay of lsh_recall_audit: the two pair oracles as CTEs,
    full outer join, identical count/division arithmetic."""
    ex = ngram_jaccard_oracle_sql(n, tau)
    ls = minhash_lsh_oracle_sql(num_hashes, bands, n, tau)
    return f"""
WITH exq AS MATERIALIZED ({ex}),
lsq AS MATERIALIZED ({ls}),
j AS (
  SELECT e.doc_a AS ea, l.doc_a AS la
  FROM exq e FULL OUTER JOIN lsq l
    ON e.doc_a = l.doc_a AND e.doc_b = l.doc_b
),
c AS (
  SELECT count(ea) AS n_exact, count(la) AS n_lsh,
         count(CASE WHEN ea IS NOT NULL AND la IS NOT NULL THEN 1 END) AS tp,
         count(CASE WHEN ea IS NOT NULL AND la IS NULL THEN 1 END) AS fn,
         count(CASE WHEN la IS NOT NULL AND ea IS NULL THEN 1 END) AS fp
  FROM j
)
SELECT n_exact, n_lsh, tp, fn, fp,
       CASE WHEN n_exact = 0 THEN 0.0
            ELSE CAST(tp AS DOUBLE) / CAST(n_exact AS DOUBLE) END AS recall
FROM c
"""


# ---------- Benchmark decontamination (cross-split n-gram overlap) ----------


def decontaminate(docs: DataFrame, n: int = 5, salt: str = "s2split") -> DataFrame:
    """Train/eval n-gram contamination scan — the decontamination pass a
    training pipeline runs so benchmark (val/test) text never leaks into
    the training split (the GPT-3/PaLM-style n-gram overlap check).

    Splits come from :func:`..text.split_assign` (the leakage-safe hash
    rule), so the scan composes with the split the pipeline actually
    ships.  For every (train_doc, eval_doc) pair sharing at least one
    distinct word ``n``-gram: ``shared`` n-grams, both docs' distinct
    n-gram counts, and ``overlap_frac = shared / eval_sz`` — the fraction
    of the EVAL document present verbatim in the train document, which is
    the quantity the drop-decision thresholds on.

    Scale shape: inverted-index join keyed on the n-gram, with the eval
    side ~10% of the corpus and only eval-present n-grams surviving the
    join (at 100 TB you'd put a bloom filter of the eval n-gram set on
    the train scan; the join itself is the same).  No self-join, no
    driver state; division is the pinned double/double expression.
    """
    from .text import split_assign

    sh = shingle_set(docs, n)
    sp = split_assign(docs, salt).select("doc_id", "split")
    shs = sh.join(sp, "doc_id")
    tr = shs.where(F.col("split") == "train").select(
        F.col("doc_id").alias("train_doc"), "shingle"
    )
    ev = shs.where(F.col("split") != "train").select(
        F.col("doc_id").alias("eval_doc"), "shingle"
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    pairs = (
        tr.join(ev, "shingle")
        .groupBy("train_doc", "eval_doc")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    st = sizes.select(F.col("doc_id").alias("train_doc"), F.col("sz").alias("train_sz"))
    se = sizes.select(F.col("doc_id").alias("eval_doc"), F.col("sz").alias("eval_sz"))
    return (
        pairs.join(st, "train_doc")
        .join(se, "eval_doc")
        .select(
            "train_doc",
            "eval_doc",
            "shared",
            "train_sz",
            "eval_sz",
            (F.col("shared").cast("double") / F.col("eval_sz").cast("double")).alias(
                "overlap_frac"
            ),
        )
    )


def decontaminate_oracle_sql(n: int = 5, salt: str = "s2split") -> str:
    """DuckDB replay: same tokenizer/shingles as ngram_jaccard_oracle_sql,
    same split rule as split_assign_oracle_sql, pinned division."""
    from .text import SPLIT_PERMILLE

    grams = " || ' ' || ".join(f"w[i+{k}]" for k in range(n))
    h = md5_h32_sql(f"'{salt}:' || CAST(doc_id AS VARCHAR)")
    train_hi = dict(SPLIT_PERMILLE)["train"]
    return f"""
WITH sh AS MATERIALIZED (
  SELECT DISTINCT doc_id, {grams} AS shingle
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       UNNEST(generate_series(1, greatest(len(w) - {n - 1}, 0))) AS t(i)
),
sp AS (SELECT doc_id, ({h}) % 1000 < {train_hi} AS is_train FROM documents),
szs AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
pairs AS (
  SELECT tr.doc_id AS train_doc, ev.doc_id AS eval_doc, count(*) AS shared
  FROM sh tr JOIN sp spt ON tr.doc_id = spt.doc_id AND spt.is_train
  JOIN sh ev USING (shingle)
  JOIN sp spe ON ev.doc_id = spe.doc_id AND NOT spe.is_train
  GROUP BY 1, 2
)
SELECT train_doc, eval_doc, shared, st.sz AS train_sz, se.sz AS eval_sz,
       CAST(shared AS DOUBLE) / CAST(se.sz AS DOUBLE) AS overlap_frac
FROM pairs
JOIN szs st ON st.doc_id = train_doc
JOIN szs se ON se.doc_id = eval_doc
"""


# ---------- incremental (batch-vs-corpus) dedup ----------


def incremental_dedup(
    docs: DataFrame,
    is_batch: Column,
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
    tau: float = 0.5,
) -> DataFrame:
    """Ingestion-time dedup: which NEW documents duplicate the existing
    corpus?  ``is_batch`` marks the incoming batch; everything else is
    the corpus.  For every batch document: its best corpus match
    (max exact Jaccard, ties to the smallest corpus doc_id) if that
    match clears ``tau``, else (dup_of = -1, jaccard = 0.0) — the
    admit-as-novel verdict.

    Same banded-minhash shape as minhash_lsh_pairs but the band join is
    batch × corpus instead of a self-join, so per ingest the cost is
    O(|batch| x bands) probes into the corpus band index — at scale the
    corpus side is a precomputed band table (append-only, partitioned
    by bucket hash) and only the batch side is built per run.  The
    best-match pick is a struct-max hash aggregate (map-side
    combinable; no per-doc sort — the dedup_canonical recipe), so a
    batch document with thousands of corpus matches stays skew-safe.
    """
    from pyspark import StorageLevel

    rows_per_band = num_hashes // bands
    flagged = docs.select("doc_id", "text", is_batch.alias("is_b"))
    sh = shingle_set(flagged, n).join(
        flagged.select("doc_id", "is_b"), "doc_id"
    ).persist(StorageLevel.MEMORY_AND_DISK)
    sig = minhash_signatures(
        flagged, num_hashes, n, shingles=sh.select("doc_id", "shingle")
    ).join(flagged.select("doc_id", "is_b"), "doc_id").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    band_cols = [
        F.struct(
            F.lit(bi).alias("band"),
            F.concat_ws(
                ",",
                *[
                    F.col("sig")[bi * rows_per_band + r]
                    for r in range(rows_per_band)
                ],
            ).alias("bucket"),
        )
        for bi in range(bands)
    ]
    bands_df = sig.select(
        "doc_id", "is_b", F.explode(F.array(*band_cols)).alias("b")
    ).select("doc_id", "is_b", "b.band", "b.bucket")
    bb = bands_df.where(F.col("is_b")).select(
        F.col("doc_id").alias("doc_id"), "band", "bucket"
    )
    bc = bands_df.where(~F.col("is_b")).select(
        F.col("doc_id").alias("dup_of"), "band", "bucket"
    )
    cand = (
        bb.join(bc, ["band", "bucket"])
        .select("doc_id", "dup_of")
        .dropDuplicates(["doc_id", "dup_of"])
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    sa = sh.select(F.col("doc_id"), "shingle")
    sb = sh.select(F.col("doc_id").alias("dup_of"), "shingle")
    shared = (
        cand.join(sa, "doc_id")
        .join(sb, ["dup_of", "shingle"])
        .groupBy("doc_id", "dup_of")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    za = sizes.select("doc_id", F.col("sz").alias("sz_a"))
    zb = sizes.select(F.col("doc_id").alias("dup_of"), F.col("sz").alias("sz_b"))
    scored = (
        shared.join(za, "doc_id")
        .join(zb, "dup_of")
        .withColumn(
            "jaccard",
            F.col("shared").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("shared")).cast("double"),
        )
        .where(F.col("jaccard") >= tau)
    )
    best = scored.groupBy("doc_id").agg(
        F.max(
            F.struct(
                F.col("jaccard").alias("j"),
                (-F.col("dup_of")).alias("negid"),
            )
        ).alias("m")
    ).select(
        "doc_id",
        (-F.col("m.negid")).cast("long").alias("dup_of"),
        F.col("m.j").alias("jaccard"),
    )
    novel = (
        flagged.where(F.col("is_b"))
        .select("doc_id")
        .join(best.select("doc_id"), "doc_id", "left_anti")
        .select(
            "doc_id",
            F.lit(-1).cast("long").alias("dup_of"),
            F.lit(0.0).alias("jaccard"),
        )
    )
    return best.unionByName(novel)


def incremental_dedup_oracle_sql(
    batch_pred_sql: str,
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
    tau: float = 0.5,
) -> str:
    """DuckDB replay of incremental_dedup; ``batch_pred_sql`` is the
    is_batch predicate over the documents columns."""
    rows_per_band = num_hashes // bands
    grams = " || ' ' || ".join(f"w[i+{k}]" for k in range(n))
    coeffs = _minhash_coeffs(num_hashes)
    P = MINHASH_P
    base = f"((({md5_h64_sql('shingle')}) % {P} + {P}) % {P})"
    mins = ", ".join(
        f"min((b * {a} + {b_}) % {P}) AS h{i}"
        for i, (a, b_) in enumerate(coeffs)
    )
    band_sel = " UNION ALL ".join(
        "SELECT doc_id, is_b, {bi} AS band, {key} AS bucket FROM sig".format(
            bi=bi,
            key=" || ',' || ".join(
                f"CAST(h{bi * rows_per_band + r} AS VARCHAR)"
                for r in range(rows_per_band)
            ),
        )
        for bi in range(bands)
    )
    return f"""
WITH flagged AS (
  SELECT doc_id, text, ({batch_pred_sql}) AS is_b FROM documents
),
wrds AS (SELECT doc_id, is_b, string_split(text, ' ') AS w FROM flagged),
sh AS (
  SELECT DISTINCT doc_id, is_b, {grams} AS shingle
  FROM wrds, UNNEST(generate_series(1, greatest(len(w) - {n - 1}, 0))) AS t(i)
),
shb AS (SELECT doc_id, is_b, {base} AS b FROM sh),
sig AS (SELECT doc_id, is_b, {mins} FROM shb GROUP BY doc_id, is_b),
bands AS ({band_sel}),
cand AS (
  SELECT DISTINCT b.doc_id, c.doc_id AS dup_of
  FROM bands b JOIN bands c USING (band, bucket)
  WHERE b.is_b AND NOT c.is_b
),
szs AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
shared AS (
  SELECT c.doc_id, c.dup_of, count(*) AS shared
  FROM cand c
  JOIN sh a ON a.doc_id = c.doc_id
  JOIN sh b ON b.doc_id = c.dup_of AND b.shingle = a.shingle
  GROUP BY 1, 2
),
scored AS (
  SELECT s.doc_id, s.dup_of,
         CAST(shared AS DOUBLE) / CAST(sa.sz + sb.sz - shared AS DOUBLE)
           AS jaccard
  FROM shared s
  JOIN szs sa ON sa.doc_id = s.doc_id
  JOIN szs sb ON sb.doc_id = s.dup_of
  WHERE CAST(shared AS DOUBLE) / CAST(sa.sz + sb.sz - shared AS DOUBLE)
        >= {tau}
),
best AS (
  SELECT doc_id, dup_of, jaccard,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY jaccard DESC, dup_of ASC) AS rn
  FROM scored
)
SELECT doc_id, CAST(dup_of AS BIGINT) AS dup_of, jaccard
FROM best WHERE rn = 1
UNION ALL
SELECT f.doc_id, CAST(-1 AS BIGINT) AS dup_of, 0.0 AS jaccard
FROM flagged f
WHERE f.is_b AND f.doc_id NOT IN (SELECT doc_id FROM best WHERE rn = 1)
"""


# ---------- Bloom-filter decontamination (the 100 TB scale path) ----------

BLOOM_M = 1 << 18  # bits in the filter
BLOOM_K = 4  # hash functions (double hashing, Kirsch-Mitzenmacher)


def _bloom_positions(grams: DataFrame, m: int, k: int) -> DataFrame:
    """shingle -> k filter positions via double hashing:
    pos_i = (h1 + i*h2) mod m, h1/h2 from the two salted portable md5
    hashes.  Everything integer; pmod keeps positions in [0, m)."""
    h1 = F.pmod(md5_h64(F.concat(F.lit("bf1:"), F.col("shingle"))), F.lit(m))
    h2 = F.pmod(md5_h64(F.concat(F.lit("bf2:"), F.col("shingle"))), F.lit(m))
    cols = [
        F.pmod(h1 + F.lit(i) * h2, F.lit(m)).cast("long").alias(f"p{i}")
        for i in range(k)
    ]
    return grams.select("shingle", *cols)


def bloom_decontaminate(
    docs: DataFrame,
    n: int = 5,
    salt: str = "s2split",
    m: int = BLOOM_M,
    k: int = BLOOM_K,
) -> DataFrame:
    """The Bloom-prefilter leg of decontamination, with its accuracy
    audit — the scale path :func:`decontaminate`'s docstring promises:
    at 100 TB you do not join every train n-gram against the eval n-gram
    table; you build a Bloom filter of the eval set once, broadcast it,
    and let the train scan test membership map-side.  Only the (tiny)
    bloom-positive remainder ever reaches the exact join.

    This operator runs BOTH legs and reports, per train document:
    ``n_grams`` distinct n-grams, ``bloom_hits`` (grams the filter
    flags), ``exact_hits`` (grams actually present in the eval set),
    ``false_pos = bloom_hits - exact_hits`` (the filter's one-sided
    error; false NEGATIVES are structurally impossible, which is the
    property that makes the prefilter safe), and the two per-doc
    verdicts ``bloom_flag`` / ``exact_flag`` — disagreement rows are
    precisely the documents an undersized filter would over-scan.

    The filter is held in dataflow form: ``bits`` = the distinct set
    positions of the eval grams (<= m rows, a few MB at m = 2^18),
    broadcast into a position join.  On a cluster you would fold the
    positions into an m/64-word bitmap with bit_or and broadcast one
    array; the broadcast position join is the plan-equivalent shape and
    keeps every integer visible to the DuckDB oracle.  Hash work is done
    once per DISTINCT gram (not per (doc, gram)) and joined back.
    """
    from .text import split_assign

    sh = shingle_set(docs, n)
    sp = split_assign(docs, salt).select("doc_id", "split")
    shs = sh.join(sp, "doc_id")
    ev_grams = (
        shs.where(F.col("split") != "train").select("shingle").distinct()
    )
    tr = shs.where(F.col("split") == "train").select(
        F.col("doc_id").alias("train_doc"), "shingle"
    )
    tr_grams = tr.select("shingle").distinct()

    pos_cols = F.array(*[f"p{i}" for i in range(k)])
    bits = (
        _bloom_positions(ev_grams, m, k)
        .select(F.explode(pos_cols).alias("pos"))
        .distinct()
    )
    # membership: each of the k position slots must be set.  Exploding the
    # slots and counting join survivors equals "all k present" (duplicate
    # slots within a gram are the same value, so they survive together).
    tpl = _bloom_positions(tr_grams, m, k).select(
        "shingle", F.explode(pos_cols).alias("pos")
    )
    npresent = (
        tpl.join(F.broadcast(bits), "pos")
        .groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("npresent"))
    )
    flags = (
        tr_grams.join(npresent, "shingle", "left")
        .join(
            F.broadcast(ev_grams.withColumn("in_eval", F.lit(True))),
            "shingle",
            "left",
        )
        .select(
            "shingle",
            (F.coalesce(F.col("npresent"), F.lit(0)) == k).alias("bloom_hit"),
            F.coalesce(F.col("in_eval"), F.lit(False)).alias("exact_hit"),
        )
    )
    agg = tr.join(flags, "shingle").groupBy("train_doc").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum(F.col("bloom_hit").cast("long")).alias("bloom_hits"),
        F.sum(F.col("exact_hit").cast("long")).alias("exact_hits"),
    )
    return agg.select(
        "train_doc",
        "n_grams",
        "bloom_hits",
        "exact_hits",
        (F.col("bloom_hits") - F.col("exact_hits")).alias("false_pos"),
        (F.col("bloom_hits") > 0).alias("bloom_flag"),
        (F.col("exact_hits") > 0).alias("exact_flag"),
    )


def bloom_decontaminate_oracle_sql(
    n: int = 5,
    salt: str = "s2split",
    m: int = BLOOM_M,
    k: int = BLOOM_K,
) -> str:
    """DuckDB replay: same tokenizer/split/hash chain; membership as
    "every position IN the bits set" (equivalent to the count-of-k
    join)."""
    from .text import SPLIT_PERMILLE

    grams = " || ' ' || ".join(f"w[i+{j}]" for j in range(n))
    sp_h = md5_h32_sql(f"'{salt}:' || CAST(doc_id AS VARCHAR)")
    train_hi = dict(SPLIT_PERMILLE)["train"]
    h1 = md5_h64_sql("'bf1:' || shingle")
    h2 = md5_h64_sql("'bf2:' || shingle")
    pos = lambda i: f"((((h1 + {i} * h2) % {m}) + {m}) % {m})"  # noqa: E731
    pos_list = ", ".join(pos(i) for i in range(k))
    all_in = " AND ".join(
        f"{pos(i)} IN (SELECT pos FROM bits)" for i in range(k)
    )
    return f"""
WITH sh AS MATERIALIZED (
  SELECT DISTINCT doc_id, {grams} AS shingle
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       UNNEST(generate_series(1, greatest(len(w) - {n - 1}, 0))) AS t(i)
),
sp AS (SELECT doc_id, ({sp_h}) % 1000 < {train_hi} AS is_train FROM documents),
ev AS MATERIALIZED (
  SELECT DISTINCT shingle FROM sh JOIN sp USING (doc_id) WHERE NOT is_train
),
evh AS (SELECT shingle, ({h1}) AS h1, ({h2}) AS h2 FROM ev),
evhp AS (SELECT ((h1 % {m}) + {m}) % {m} AS h1, ((h2 % {m}) + {m}) % {m} AS h2
         FROM evh),
bits AS MATERIALIZED (
  SELECT DISTINCT unnest([{pos_list}]) AS pos FROM evhp
),
trg AS MATERIALIZED (
  SELECT DISTINCT shingle FROM sh JOIN sp USING (doc_id) WHERE is_train
),
trh AS (SELECT shingle, ({h1}) AS h1, ({h2}) AS h2 FROM trg),
trhp AS (SELECT shingle, ((h1 % {m}) + {m}) % {m} AS h1,
                ((h2 % {m}) + {m}) % {m} AS h2 FROM trh),
gflags AS MATERIALIZED (
  SELECT shingle, ({all_in}) AS bloom_hit,
         shingle IN (SELECT shingle FROM ev) AS exact_hit
  FROM trhp
),
agg AS (
  SELECT sh.doc_id AS train_doc, count(*) AS n_grams,
         sum(CASE WHEN g.bloom_hit THEN 1 ELSE 0 END) AS bloom_hits,
         sum(CASE WHEN g.exact_hit THEN 1 ELSE 0 END) AS exact_hits
  FROM sh JOIN sp USING (doc_id) JOIN gflags g USING (shingle)
  WHERE sp.is_train
  GROUP BY 1
)
SELECT train_doc, CAST(n_grams AS BIGINT) AS n_grams,
       CAST(bloom_hits AS BIGINT) AS bloom_hits,
       CAST(exact_hits AS BIGINT) AS exact_hits,
       CAST(bloom_hits - exact_hits AS BIGINT) AS false_pos,
       bloom_hits > 0 AS bloom_flag, exact_hits > 0 AS exact_flag
FROM agg
"""
