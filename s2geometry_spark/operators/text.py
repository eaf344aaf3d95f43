"""Text-analysis operators for training-data pipelines, over the
`documents(doc_id, text, lang, source, n_chars)` table.

Everything here is pure Spark SQL (whole-stage codegen, no Python), and
every formula is written with PINNED operator order so the DuckDB oracle
evaluates the identical IEEE double sequence:

* token_stats   — token count / avg token length / stopword ratio.
* quality_score — composite quality heuristic (length + stopword mix).
* lang_id       — marker-token n-gram scoring with a deterministic
                  argmax (first-strictly-greater tie-break).
* fingerprint   — 64-bit rolling polynomial document fingerprint
                  (content-defined; a Rabin-Karp hash of the token
                  stream) for fast shift-tolerant identity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import words_col

STOPWORDS = ("the", "a", "of", "and")

# marker tokens per language (deterministic toy scorer — the operator
# shape is what matters: per-doc marker counts + argmax, all in SQL)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "scan", "fast"),
    "de": ("window", "order", "join"),
    "es": ("data", "line", "row"),
    "fr": ("table", "merge", "part"),
    "zh": ("hash", "group", "key"),
}


def _count_token(words: Column, token: str) -> Column:
    return F.size(F.filter(words, lambda x: x == token))


def token_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, avg_token_len, stopword_ratio) — one projection."""
    w = words_col()
    n_tokens = F.size(w)
    total_chars = F.length(F.col("text"))
    avg_len = (total_chars - (n_tokens - F.lit(1))).cast("double") / n_tokens.cast(
        "double"
    )
    stop = None
    for s in STOPWORDS:
        c = _count_token(w, s)
        stop = c if stop is None else stop + c
    ratio = stop.cast("double") / n_tokens.cast("double")
    return docs.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        avg_len.alias("avg_token_len"),
        ratio.alias("stopword_ratio"),
    )


def token_stats_oracle_sql() -> str:
    stop = " + ".join(
        f"len(list_filter(w, x -> x = '{s}'))" for s in STOPWORDS
    )
    return f"""
WITH wrds AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents)
SELECT doc_id,
       CAST(len(w) AS BIGINT) AS n_tokens,
       CAST(length(text) - (len(w) - 1) AS DOUBLE) / CAST(len(w) AS DOUBLE)
         AS avg_token_len,
       CAST({stop} AS DOUBLE) / CAST(len(w) AS DOUBLE) AS stopword_ratio
FROM wrds
"""


def quality_score(docs: DataFrame) -> DataFrame:
    """(doc_id, quality): 0.5*min(n_tokens/64, 1) + 0.5*(1 - stopword_ratio).

    The standard "is this document worth training on" heuristic shape;
    pinned arithmetic for the oracle.
    """
    stats = token_stats(docs)
    q = (
        F.lit(0.5) * F.least(F.col("n_tokens").cast("double") / F.lit(64.0), F.lit(1.0))
        + F.lit(0.5) * (F.lit(1.0) - F.col("stopword_ratio"))
    )
    return stats.select("doc_id", q.alias("quality"))


def quality_score_oracle_sql() -> str:
    stop = " + ".join(
        f"len(list_filter(w, x -> x = '{s}'))" for s in STOPWORDS
    )
    return f"""
WITH wrds AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
SELECT doc_id,
       0.5 * least(CAST(len(w) AS DOUBLE) / 64.0, 1.0)
         + 0.5 * (1.0 - CAST({stop} AS DOUBLE) / CAST(len(w) AS DOUBLE))
         AS quality
FROM wrds
"""


def lang_id(docs: DataFrame) -> DataFrame:
    """(doc_id, pred_lang, is_match): marker-count argmax language guess.

    Deterministic argmax: languages are compared in a fixed order and a
    later language wins only on a STRICTLY greater score.
    """
    w = words_col()
    scores = {}
    for lang, markers in LANG_MARKERS.items():
        s = None
        for m in markers:
            c = _count_token(w, m)
            s = c if s is None else s + c
        scores[lang] = s
    langs = list(LANG_MARKERS)
    best_lang = F.lit(langs[0])
    best_score = scores[langs[0]]
    for lang in langs[1:]:
        cond = scores[lang] > best_score
        best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(cond, scores[lang]).otherwise(best_score)
    return docs.select(
        "doc_id",
        best_lang.alias("pred_lang"),
        (best_lang == F.col("lang")).alias("is_match"),
    )


def lang_id_oracle_sql() -> str:
    def score(lang: str) -> str:
        return " + ".join(
            f"len(list_filter(w, x -> x = '{m}'))" for m in LANG_MARKERS[lang]
        )

    langs = list(LANG_MARKERS)
    # replicate the fold: later language replaces only on strictly greater
    expr_lang = f"'{langs[0]}'"
    expr_score = f"({score(langs[0])})"
    for lang in langs[1:]:
        s = f"({score(lang)})"
        expr_lang = f"(CASE WHEN {s} > {expr_score} THEN '{lang}' ELSE {expr_lang} END)"
        expr_score = f"(CASE WHEN {s} > {expr_score} THEN {s} ELSE {expr_score} END)"
    return f"""
WITH wrds AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents)
SELECT doc_id, {expr_lang} AS pred_lang, ({expr_lang} = lang) AS is_match
FROM wrds
"""


FP_MOD = (1 << 57) - 13


def fingerprint(docs: DataFrame) -> DataFrame:
    """(doc_id, fp): 64-bit rolling polynomial fingerprint of the token
    stream: fp = fold(tokens, 0, (acc, t) -> (acc*31 + h32(t)) mod M).
    Shift-tolerant doc identity; pure SQL fold (no Python).

    Arithmetic stays inside int64 (ANSI mode forbids wraparound): the
    accumulator is reduced mod M < 2^57 each step and the per-token hash
    is a 32-bit md5 prefix (portable — the DuckDB oracle recomputes the
    identical integer fold), so acc*31 + h < 2^62 never overflows."""
    from .dedup import md5_h32

    w = words_col()
    mod = F.lit(FP_MOD).cast("long")
    fp = F.aggregate(
        w,
        F.lit(0).cast("long"),
        lambda acc, t: F.pmod(acc * F.lit(31).cast("long") + md5_h32(t), mod),
    )
    return docs.select("doc_id", fp.alias("fp"))


def fingerprint_oracle_sql() -> str:
    """DuckDB oracle: the same left fold via list_reduce (first element is
    the seed, so 0 is prepended); integer arithmetic is exact on both
    sides."""
    from .dedup import md5_h32_sql

    h = md5_h32_sql("t")
    return f"""
WITH wrds AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
hs AS (
  SELECT doc_id, list_prepend(0::BIGINT, list_transform(w, t -> {h})) AS hl
  FROM wrds
)
SELECT doc_id, list_reduce(hl, (acc, h) -> (acc * 31 + h) % {FP_MOD}) AS fp
FROM hs
"""
