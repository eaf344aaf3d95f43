"""Substring-level exact dedup: maximal duplicated token spans.

The span-level companion to document-level exact/MinHash dedup — the
operation of Lee et al., "Deduplicating Training Data Makes Language
Models Better" (ACL 2022): find every maximal run of >= n tokens that
occurs more than once in the corpus, so a curation pipeline can cut the
duplicated SPAN instead of dropping the whole document.  The paper uses
a suffix array on a single machine; the distributed shape here is the
standard rolling n-gram-window equivalent:

1. every doc emits its token n-gram windows (start index + portable
   md5-h32 of the joined tokens) — one explode, linear;
2. ONE hash aggregation counts global occurrences per window hash; a
   window is "duplicated" iff its hash occurs >= 2 times anywhere in
   the corpus (same doc or another doc);
3. duplicated windows join back to their (doc_id, start) positions and
   merge into maximal spans with a gaps-and-islands window: window i
   covers tokens [i, i+n-1]; two flagged windows belong to one span
   iff they OVERLAP (start <= running max end of earlier windows) —
   exactly the condition under which the union is itself a duplicated
   run of >= n tokens.

Output is one row per maximal span.  Everything is integer arithmetic
and window functions on both engines; the DuckDB oracle replays the
identical pipeline, so the match is bit-exact.

Scale: the only shuffles are the n-gram hash aggregation (map-side
partial combine applies), the join back (same key), and the per-doc
island window (partition = doc_id).  At 100 TB the window-hash count is
the classic heavy-hitter aggregation; no driver state, no suffix array,
no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import md5_h32, md5_h32_sql

SPAN_N_DEFAULT = 8


def _windows(docs: DataFrame, n: int) -> DataFrame:
    """(doc_id, i, h): every n-token window, 1-based start index, with
    its portable 32-bit hash.  Tokenizer = single-space split, the
    corpus contract shared by every text operator in this repo."""
    w = F.split(F.col("text"), " ")
    d = docs.select("doc_id", w.alias("w")).select(
        "doc_id",
        "w",
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.size("w") - (n - 1), F.lit(0)))
        ).alias("i"),
    )
    gram = F.concat_ws(" ", F.slice(F.col("w"), F.col("i"), n))
    return d.select("doc_id", F.col("i").cast("long").alias("i"), md5_h32(gram).alias("h"))


def dup_spans(docs: DataFrame, n: int = SPAN_N_DEFAULT) -> DataFrame:
    """(doc_id, span_seq, tok_start, tok_end, span_len, n_windows):
    maximal duplicated token spans of length >= n per document.

    span_seq is the 1-based island index within the doc (ordered by
    start); tok_start/tok_end are inclusive 1-based token indices.
    """
    win = _windows(docs, n)
    dup_h = (
        win.groupBy("h")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= 2)
        .select("h")
    )
    flagged = win.join(dup_h, "h").select(
        "doc_id", "i", (F.col("i") + (n - 1)).alias("endpos")
    )
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    isl = (
        flagged.withColumn("prev_max", F.max("endpos").over(w_prev))
        .withColumn(
            "is_new",
            (F.col("prev_max").isNull() | (F.col("i") > F.col("prev_max"))).cast(
                "long"
            ),
        )
        .withColumn("span_seq", F.sum("is_new").over(w_run))
    )
    return isl.groupBy("doc_id", "span_seq").agg(
        F.min("i").alias("tok_start"),
        F.max("endpos").alias("tok_end"),
        (F.max("endpos") - F.min("i") + 1).alias("span_len"),
        F.count(F.lit(1)).alias("n_windows"),
    )


def dup_spans_oracle_sql(n: int = SPAN_N_DEFAULT) -> str:
    """DuckDB replay of the identical window pipeline (all-integer)."""
    gram = " || ' ' || ".join(f"w[i+{k}]" for k in range(n))
    h = md5_h32_sql(f"({gram})")
    return f"""
WITH win AS MATERIALIZED (
  SELECT doc_id, CAST(i AS BIGINT) AS i, {h} AS h
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       UNNEST(generate_series(1, greatest(len(w) - {n - 1}, 0))) AS t(i)
),
dup_h AS (SELECT h FROM win GROUP BY h HAVING count(*) >= 2),
flagged AS (
  SELECT doc_id, i, i + {n - 1} AS endpos FROM win JOIN dup_h USING (h)
),
isl AS (
  SELECT doc_id, i, endpos,
    CASE WHEN max(endpos) OVER (PARTITION BY doc_id ORDER BY i
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
           OR i > max(endpos) OVER (PARTITION BY doc_id ORDER BY i
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         THEN 1 ELSE 0 END AS is_new
  FROM flagged
),
sp AS (
  SELECT doc_id, i, endpos,
         sum(is_new) OVER (PARTITION BY doc_id ORDER BY i
            ROWS UNBOUNDED PRECEDING) AS span_seq
  FROM isl
)
SELECT doc_id, CAST(span_seq AS BIGINT) AS span_seq,
       min(i) AS tok_start, max(endpos) AS tok_end,
       max(endpos) - min(i) + 1 AS span_len,
       count(*) AS n_windows
FROM sp GROUP BY 1, 2
"""
