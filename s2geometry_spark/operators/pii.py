"""PII detection + redaction over the documents table.

The privacy-scrub pass every production training-data pipeline runs
before tokenization (emails / IPs / phone numbers -> placeholder
tokens).  Pure codegen projection — regexp_extract_all + regexp_replace
stay JVM-side in whole-stage codegen, no shuffle at all; at 100 TB this
is a map-only scan.

The synthetic corpus is a clean word soup, so the operator first plants
PII deterministically from ``doc_id`` (identical CASE/concat expression
on both engines) and then detects and redacts it with the real
machinery.  Patterns are restricted to the regex subset where Java
regex (Spark) and RE2 (DuckDB) agree exactly: explicit character
classes, bounded repetition, ``\\b`` word boundaries — no lookaround,
no shorthand classes whose unicode semantics differ.

Output per doc: match counts per category plus the md5 of the redacted
text, so the oracle match proves byte-identical redaction, not just
identical counts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PHONE_RE = r"\b[0-9]{3}-[0-9]{4}\b"

# applied in this order; IP before PHONE so the dotted quad is consumed
# before the phone pattern could bite a digit run, email first because
# its local part may contain dots/digits the other patterns would split
_REDACTIONS = ((EMAIL_RE, "<EMAIL>"), (IPV4_RE, "<IP>"), (PHONE_RE, "<PHONE>"))


def _planted(text: Column, doc_id: Column) -> Column:
    """text with deterministic doc_id-derived PII appended (or not)."""
    d = doc_id.cast("long")
    email = F.when(
        d % 3 == 0,
        F.concat(
            F.lit(" contact u"),
            d.cast("string"),
            F.lit("@ex"),
            (d % 7).cast("string"),
            F.lit(".com"),
        ),
    ).otherwise(F.lit(""))
    ip = F.when(
        d % 5 == 0,
        F.concat(
            F.lit(" ip 10."),
            (d % 256).cast("string"),
            F.lit(".0."),
            ((d * 7) % 256).cast("string"),
        ),
    ).otherwise(F.lit(""))
    phone = F.when(
        d % 11 == 0,
        F.concat(F.lit(" call 555-01"), F.lpad((d % 100).cast("string"), 2, "0")),
    ).otherwise(F.lit(""))
    return F.concat(text, email, ip, phone)


def _planted_sql(text: str, doc_id: str) -> str:
    return f"""({text}
  || CASE WHEN {doc_id} % 3 = 0
       THEN ' contact u' || CAST({doc_id} AS VARCHAR) || '@ex'
            || CAST({doc_id} % 7 AS VARCHAR) || '.com' ELSE '' END
  || CASE WHEN {doc_id} % 5 = 0
       THEN ' ip 10.' || CAST({doc_id} % 256 AS VARCHAR) || '.0.'
            || CAST(({doc_id} * 7) % 256 AS VARCHAR) ELSE '' END
  || CASE WHEN {doc_id} % 11 = 0
       THEN ' call 555-01' || lpad(CAST({doc_id} % 100 AS VARCHAR), 2, '0')
       ELSE '' END)"""


def pii_scrub(docs: DataFrame) -> DataFrame:
    """(doc_id, n_emails, n_ips, n_phones, redacted_md5, n_redacted_chars)."""
    aug = _planted(F.col("text"), F.col("doc_id"))
    red = aug
    for pat, rep in _REDACTIONS:
        red = F.regexp_replace(red, pat, rep)
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(aug, F.lit(EMAIL_RE), F.lit(0)))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(aug, F.lit(IPV4_RE), F.lit(0)))
        .cast("long")
        .alias("n_ips"),
        F.size(F.regexp_extract_all(aug, F.lit(PHONE_RE), F.lit(0)))
        .cast("long")
        .alias("n_phones"),
        F.md5(red).alias("redacted_md5"),
        F.length(red).cast("long").alias("n_redacted_chars"),
    )


def pii_scrub_oracle_sql() -> str:
    aug = _planted_sql("text", "doc_id")
    red = aug
    for pat, rep in _REDACTIONS:
        esc = pat.replace("'", "''")
        red = f"regexp_replace({red}, '{esc}', '{rep}', 'g')"
    counts = ",\n       ".join(
        f"CAST(len(regexp_extract_all({aug}, '{pat}')) AS BIGINT) AS {name}"
        for pat, name in (
            (EMAIL_RE, "n_emails"),
            (IPV4_RE, "n_ips"),
            (PHONE_RE, "n_phones"),
        )
    )
    return f"""
SELECT doc_id,
       {counts},
       md5({red}) AS redacted_md5,
       CAST(length({red}) AS BIGINT) AS n_redacted_chars
FROM documents
"""
