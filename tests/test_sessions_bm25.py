"""Sessionization + BM25 (operators.sessions / text.bm25)."""

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

from s2geometry_spark.operators.sessions import sessionize, sessionize_oracle_sql
from s2geometry_spark.operators.text import bm25, bm25_oracle_sql, ln_portable_sql


class TestPortableLn:
    def test_accuracy_and_cross_engine_equality(self):
        rng = np.random.default_rng(11)
        xs = np.concatenate(
            [
                rng.uniform(1e-4, 1e4, 5000),
                (np.arange(1, 500) + 0.5) / (np.arange(1, 500)[::-1] + 0.5),
                [1.0, 2.0, 0.5, 4.0, 1.0 / 1024, 1024.0],
            ]
        )
        con = duckdb.connect()
        con.register("t", pd.DataFrame({"x": xs}))
        got = con.execute(f"SELECT {ln_portable_sql('x')} AS l FROM t").fetchdf()[
            "l"
        ].to_numpy()
        rel = np.abs(got - np.log(xs)) / np.maximum(np.abs(np.log(xs)), 1e-3)
        assert rel.max() < 1e-12

    def test_spark_matches_duckdb_bitwise(self, spark):
        from pyspark.sql import functions as F

        rng = np.random.default_rng(12)
        xs = np.concatenate(
            [rng.uniform(1e-4, 1e4, 20000), [1.0, 2.0, 8.0, 0.25]]
        )
        pdf = pd.DataFrame({"x": xs})
        sp = (
            spark.createDataFrame(pdf)
            .select(F.expr(ln_portable_sql("x")).alias("l"))
            .toPandas()["l"]
            .to_numpy()
        )
        con = duckdb.connect()
        con.register("t", pdf)
        du = con.execute(f"SELECT {ln_portable_sql('x')} AS l FROM t").fetchdf()[
            "l"
        ].to_numpy()
        assert np.array_equal(sp, du)


class TestSessionize:
    def test_gap_splitting(self, spark):
        base = pd.Timestamp("2024-01-01")
        rows = []
        # user 1: 3 events close, 45-min gap, 2 events close
        for i, mins in enumerate([0, 5, 10, 55, 60]):
            rows.append((i, base + pd.Timedelta(minutes=mins), 1, "view", 1.25))
        # user 2: single event
        rows.append((10, base, 2, "click", 2.50))
        pdf = pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
        )
        df = spark.createDataFrame(pdf)
        got = {
            (r.user_id, r.session_seq): (r.n_events, r.sum_value_cents)
            for r in sessionize(df).collect()
        }
        assert got == {
            (1, 1): (3, 375),
            (1, 2): (2, 250),
            (2, 1): (1, 250),
        }

    def test_tie_break_by_event_id(self, spark):
        base = pd.Timestamp("2024-01-01")
        pdf = pd.DataFrame(
            [(2, base, 1, "a", 1.0), (1, base, 1, "b", 1.0)],
            columns=["event_id", "ts", "user_id", "event_type", "value"],
        )
        out = sessionize(spark.createDataFrame(pdf)).collect()
        assert len(out) == 1 and out[0].n_events == 2


class TestBM25:
    def test_matches_bruteforce(self, spark):
        docs = pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    "spark join join fast",
                    "vector scan scan scan table",
                    "join vector spark spark stream",
                    "table scan row",
                ],
            }
        )
        terms = ("join", "spark", "stream", "vector")
        got = {
            r.doc_id: (r.n_terms_matched, r.score)
            for r in bm25(spark.createDataFrame(docs), terms).collect()
        }
        # brute force
        k1, b = 1.2, 0.75
        toks = {d: t.split(" ") for d, t in zip(docs.doc_id, docs.text)}
        n_docs = len(toks)
        avgdl = sum(len(v) for v in toks.values()) / n_docs
        df_t = {
            q: sum(1 for v in toks.values() if q in v) for q in terms
        }
        for d, words in toks.items():
            matched = sorted(q for q in terms if q in words)
            if not matched:
                assert d not in got
                continue
            score = 0.0
            for q in matched:
                tf = words.count(q)
                idf = math.log((n_docs + 1.0) / (df_t[q] + 0.5))
                dl = len(words)
                score += idf * (tf * (k1 + 1)) / (
                    tf + k1 * ((1 - b) + b * (dl / avgdl))
                )
            nm, s = got[d]
            assert nm == len(matched)
            assert abs(s - score) < 1e-9


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])


class TestStreamingSessionize:
    def test_no_exact_gap_deltas_fixture_contract(self):
        """session_window splits at delta == gap where the batch rule
        keeps the session; the equivalence claimed by
        streaming_sessionize requires the fixture to have no exact-gap
        delta (checked at every SF the driver uses)."""
        gap_us = 30 * 60 * 1000000
        for sf in ("sf0.001", "sf0.01", "sf0.1"):
            n = duckdb.sql(
                f"""
                WITH e AS (SELECT user_id, epoch_us(ts) AS us
                           FROM read_parquet('/root/testdata/{sf}/events.parquet')),
                d AS (SELECT us - lag(us) OVER (PARTITION BY user_id ORDER BY us) AS delta FROM e)
                SELECT count(*) FROM d WHERE delta = {gap_us}
                """
            ).fetchone()[0]
            assert n == 0, f"{sf}: {n} exact-gap deltas break the equivalence"

    def test_stream_equals_batch(self, spark):
        from s2geometry_spark.streaming.sessions import streaming_sessionize
        from tests.conftest import SF_TEST

        events = spark.read.parquet(f"{SF_TEST}/events.parquet")
        b = sessionize(events).toPandas().sort_values(
            ["user_id", "session_seq"]
        ).reset_index(drop=True)
        s = streaming_sessionize(spark, SF_TEST).toPandas().sort_values(
            ["user_id", "session_seq"]
        ).reset_index(drop=True)
        cols = sorted(b.columns)
        assert b[cols].equals(s[cols])
