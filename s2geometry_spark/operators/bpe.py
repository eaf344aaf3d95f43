"""Distributed BPE tokenizer training (Sennrich et al., ACL 2016).

The byte-pair-encoding merge-learning loop every modern tokenizer ships
through, expressed Spark-first over the corpus:

* the corpus collapses once into the weighted VOCABULARY
  ``(word, cnt)`` — the only scan of the 100-TB text column; all merge
  rounds run over the vocabulary's exploded symbol table, exactly as
  Sennrich's reference implementation operates on the word-frequency
  dict rather than the corpus;
* each round: pair counts = one ``lead`` window + hash agg (weighted by
  word count), best pair = 1-row argmax with the pinned tie-break
  ``(total DESC, x ASC, y ASC)``, then the greedy LEFT-TO-RIGHT
  non-overlapping merge — the part that looks sequential — done with
  windows: occurrence rows chain into islands of consecutive positions
  (only possible when x == y), and the classic greedy scan keeps
  exactly the odd-ranked occurrence of each island;
* the best pair is COLLECTED (1 row — same budget as the k-means
  centroid loop) and re-applied as literals, so the per-round plan has
  no join at all, and the symbol table is localCheckpointed per round
  to keep lineage flat (the graph.py contraction discipline).

Words carry the classic ``</w>`` end-of-word marker so merges can learn
whole-word units.  Everything is integer counts + binary-collation
string compares, so the DuckDB oracle — the same pipeline unrolled into
a CTE chain per round — matches bit-for-bit.

Scale: vocabulary explode is |vocab| * avg_word_len rows (millions of
words -> low billions of symbol rows, partitioned by word); each round
is two word-partitioned windows + one hash agg.  No driver state beyond
the k collected merge rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

N_MERGES_DEFAULT = 6
END_OF_WORD = "</w>"


def _vocab(docs: DataFrame) -> DataFrame:
    """(word, cnt): corpus word frequencies — the single corpus scan."""
    return (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _initial_symbols(vocab: DataFrame) -> DataFrame:
    """(word, cnt, pos, sym): characters + trailing </w> marker."""
    chars = vocab.select(
        "word",
        "cnt",
        F.explode(F.sequence(F.lit(1), F.length("word"))).alias("pos"),
    ).select(
        "word",
        "cnt",
        F.col("pos").cast("long").alias("pos"),
        F.substring(F.col("word"), F.col("pos"), F.lit(1)).alias("sym"),
    )
    marker = vocab.select(
        "word",
        "cnt",
        (F.length("word") + 1).cast("long").alias("pos"),
        F.lit(END_OF_WORD).alias("sym"),
    )
    return chars.unionByName(marker)


def _one_merge(syms: DataFrame) -> tuple[DataFrame, tuple[str, str, int] | None]:
    """One BPE round: returns (merged symbol table, (x, y, total))."""
    w = Window.partitionBy("word").orderBy("pos")
    with_next = syms.withColumn("nxt", F.lead("sym").over(w))
    best_rows = (
        with_next.where(F.col("nxt").isNotNull())
        .groupBy(F.col("sym").alias("x"), F.col("nxt").alias("y"))
        .agg(F.sum("cnt").alias("total"))
        .orderBy(F.desc("total"), F.asc("x"), F.asc("y"))
        .limit(1)
        .collect()
    )
    if not best_rows:
        return syms, None
    bx, by, total = best_rows[0].x, best_rows[0].y, int(best_rows[0].total)
    occ = with_next.withColumn(
        "is_occ",
        ((F.col("sym") == bx) & (F.col("nxt") == by)).cast("int"),
    )
    w_occ = Window.partitionBy("word", "is_occ").orderBy("pos")
    flagged = (
        occ.withColumn("prev_occ", F.lag("pos").over(w_occ))
        .withColumn(
            "is_new",
            F.when(
                (F.col("is_occ") == 1)
                & (
                    F.col("prev_occ").isNull()
                    | (F.col("pos") > F.col("prev_occ") + 1)
                ),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "island",
            F.sum("is_new").over(
                w_occ.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("word", "is_occ", "island").orderBy("pos")
            ),
        )
        .withColumn(
            "keep",
            ((F.col("is_occ") == 1) & (F.col("rn") % 2 == 1)).cast("int"),
        )
    )
    applied = flagged.withColumn("prev_keep", F.lag("keep").over(w)).where(
        F.coalesce(F.col("prev_keep"), F.lit(0)) == 0
    )
    merged = applied.select(
        "word",
        "cnt",
        F.row_number().over(w).cast("long").alias("pos"),
        F.when(F.col("keep") == 1, F.lit(bx + by)).otherwise(F.col("sym")).alias(
            "sym"
        ),
    )
    return merged, (bx, by, total)


def bpe_train(
    docs: DataFrame, n_merges: int = N_MERGES_DEFAULT
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Learn ``n_merges`` BPE merges; returns (merge table rows
    [(round, x, y, pair_count)], final segmented vocabulary DataFrame
    (word, cnt, pos, sym))."""
    syms = _initial_symbols(_vocab(docs)).localCheckpoint()
    merges: list[tuple[int, str, str, int]] = []
    for r in range(1, n_merges + 1):
        syms, best = _one_merge(syms)
        if best is None:
            break
        syms = syms.localCheckpoint()
        merges.append((r, best[0], best[1], best[2]))
    return merges, syms


def bpe_merges_df(
    spark: SparkSession, docs: DataFrame, n_merges: int = N_MERGES_DEFAULT
) -> DataFrame:
    """(round, x, y, pair_count): the learned merge table as a DataFrame
    (values computed distributed; the driver only carries the k rows)."""
    merges, _ = bpe_train(docs, n_merges)
    return spark.createDataFrame(
        [(int(r), x, y, int(t)) for r, x, y, t in merges],
        "round bigint, x string, y string, pair_count bigint",
    )


def bpe_vocab_df(docs: DataFrame, n_merges: int = N_MERGES_DEFAULT) -> DataFrame:
    """(word, cnt, pos, sym): the vocabulary segmented by the learned
    merges — the tokenization the merge table induces."""
    _, syms = bpe_train(docs, n_merges)
    return syms


def bpe_encode_df(docs: DataFrame, n_merges: int = N_MERGES_DEFAULT) -> DataFrame:
    """Tokenize every document with the learned merges: (doc_id,
    n_words, n_tokens, stream_md5).

    BPE encoding applies the merges in rank order to each word — which
    is exactly what the training rounds already did to the vocabulary —
    so encode = a broadcast join of the corpus word stream against the
    final segmented vocabulary.  That IS the 100-TB serving shape:
    train on the (small) vocabulary, broadcast the per-word
    segmentations, tokenize the corpus with one map-side join + one
    per-doc agg.  ``stream_md5`` hashes the full ordered token stream,
    so the oracle match certifies every token of every document, not
    just the counts.  (OOV words cannot occur here since the vocabulary
    is trained on the same corpus; a serving pipeline would run the
    same merge loop per unseen word.)"""
    _, syms = bpe_train(docs, n_merges)
    word_tok = syms.groupBy("word").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "sym"))),
                lambda s: s.sym,
            ),
            " ",
        ).alias("toks"),
        F.count(F.lit(1)).alias("n_tok"),
    )
    words = docs.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), " ")).alias("wpos", "word"),
    )
    joined = words.join(F.broadcast(word_tok), "word")
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("n_tok").alias("n_tokens"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("wpos", "toks"))),
                    lambda s: s.toks,
                ),
                " ",
            )
        ).alias("stream_md5"),
    )


def bpe_encode_oracle_sql(n_merges: int = N_MERGES_DEFAULT) -> str:
    """DuckDB replay: train chain -> per-word token strings -> per-doc
    ordered stream md5."""
    return (
        _bpe_cte_chain(n_merges)
        + f""",
wt AS MATERIALIZED (
  SELECT word, string_agg(sym, ' ' ORDER BY pos) AS toks,
         count(*) AS n_tok
  FROM v{n_merges} GROUP BY word
),
dw AS (
  -- no WITH ORDINALITY in this DuckDB: index the split list explicitly
  SELECT doc_id, CAST(i AS BIGINT) AS wpos, parts[i] AS word
  FROM (SELECT doc_id, string_split(text, ' ') AS parts FROM documents),
       UNNEST(generate_series(1, len(parts))) AS t(i)
)
SELECT dw.doc_id,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(wt.n_tok) AS BIGINT) AS n_tokens,
       md5(string_agg(wt.toks, ' ' ORDER BY dw.wpos)) AS stream_md5
FROM dw JOIN wt USING (word)
GROUP BY dw.doc_id"""
    )


def _round_ctes(r: int) -> str:
    """CTE chain for BPE round r: v{r-1} -> v{r} (+ b{r} best pair)."""
    p = r - 1
    return f"""
w{r} AS (
  SELECT word, cnt, pos, sym,
         lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt
  FROM v{p}
),
b{r} AS (
  SELECT sym AS x, nxt AS y, sum(cnt) AS total
  FROM w{r} WHERE nxt IS NOT NULL
  GROUP BY 1, 2 ORDER BY total DESC, x ASC, y ASC LIMIT 1
),
occ{r} AS (
  SELECT w.word, w.cnt, w.pos, w.sym, b.x AS bx, b.y AS by_,
         CASE WHEN w.sym = b.x AND w.nxt = b.y THEN 1 ELSE 0 END AS is_occ
  FROM w{r} w CROSS JOIN b{r} b
),
fl{r} AS (
  SELECT *,
    CASE WHEN is_occ = 1 AND (lag(pos) OVER wo IS NULL
                              OR pos > lag(pos) OVER wo + 1)
         THEN 1 ELSE 0 END AS is_new
  FROM occ{r}
  WINDOW wo AS (PARTITION BY word, is_occ ORDER BY pos)
),
is{r} AS (
  SELECT *, sum(is_new) OVER (PARTITION BY word, is_occ ORDER BY pos
                              ROWS UNBOUNDED PRECEDING) AS island
  FROM fl{r}
),
kp{r} AS (
  SELECT *,
    CASE WHEN is_occ = 1 AND
      (row_number() OVER (PARTITION BY word, is_occ, island ORDER BY pos)) % 2 = 1
    THEN 1 ELSE 0 END AS keep
  FROM is{r}
),
ap{r} AS (
  SELECT *, lag(keep) OVER (PARTITION BY word ORDER BY pos) AS prev_keep
  FROM kp{r}
),
v{r} AS (
  SELECT word, cnt,
         row_number() OVER (PARTITION BY word ORDER BY pos) AS pos,
         CASE WHEN keep = 1 THEN bx || by_ ELSE sym END AS sym
  FROM ap{r}
  WHERE coalesce(prev_keep, 0) = 0
)"""


def _bpe_cte_chain(n_merges: int) -> str:
    head = f"""
WITH vocab AS MATERIALIZED (
  SELECT word, count(*) AS cnt
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  GROUP BY 1
),
v0 AS (
  SELECT word, cnt, CAST(i AS BIGINT) AS pos, substr(word, i, 1) AS sym
  FROM vocab, UNNEST(generate_series(1, length(word))) AS t(i)
  UNION ALL
  SELECT word, cnt, CAST(length(word) + 1 AS BIGINT), '{END_OF_WORD}'
  FROM vocab
)"""
    return head + "," + ",".join(_round_ctes(r) for r in range(1, n_merges + 1))


def bpe_merges_oracle_sql(n_merges: int = N_MERGES_DEFAULT) -> str:
    """DuckDB replay: the identical merge loop unrolled per round."""
    union = " UNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS round, x, y, "
        f"CAST(total AS BIGINT) AS pair_count FROM b{r}"
        for r in range(1, n_merges + 1)
    )
    return _bpe_cte_chain(n_merges) + "\n" + union


def bpe_vocab_oracle_sql(n_merges: int = N_MERGES_DEFAULT) -> str:
    return (
        _bpe_cte_chain(n_merges)
        + f"\nSELECT word, cnt, CAST(pos AS BIGINT) AS pos, sym FROM v{n_merges}"
    )
