"""Brute-force verification of the temporal joins, substring-span dedup,
and PII scrub — independent of the DuckDB oracles (which the entry gate
already sweeps): each test recomputes the expected result with plain
Python over a small slice and compares exactly."""

import hashlib
import re

import pytest

from tests.conftest import SF_TEST


@pytest.fixture(scope="module")
def events_pd(spark):
    df = spark.read.parquet(f"{SF_TEST}/events.parquet")
    pd = df.toPandas()
    pd["ts_us"] = pd["ts"].astype("datetime64[us]").astype("int64")
    return pd


def test_asof_join_brute(spark, events_pd):
    from s2geometry_spark.operators.temporal import asof_join

    out = asof_join(spark.read.parquet(f"{SF_TEST}/events.parquet")).toPandas()
    clicks = events_pd[events_pd.event_type == "click"]
    views = events_pd[events_pd.event_type == "view"]
    assert len(out) == len(clicks)
    got = {r.event_id: (r.match_id, r.match_ts_us) for r in out.itertuples()}
    for c in clicks.itertuples():
        cand = views[(views.user_id == c.user_id) & (views.ts_us <= c.ts_us)]
        if len(cand) == 0:
            import pandas as _pd

            assert _pd.isna(got[c.event_id][0])
        else:
            # max ts, then max event_id — the documented tie-break
            best = cand.sort_values(["ts_us", "event_id"]).iloc[-1]
            assert got[c.event_id] == (best.event_id, best.ts_us)


def test_interval_join_brute(spark, events_pd):
    from s2geometry_spark.operators.temporal import interval_join

    w_us = 30 * 60 * 1_000_000
    out = interval_join(spark.read.parquet(f"{SF_TEST}/events.parquet")).toPandas()
    got = {(r.left_id, r.right_id) for r in out.itertuples()}
    errors = events_pd[events_pd.event_type == "error"]
    clicks = events_pd[events_pd.event_type == "click"]
    want = set()
    for e in errors.itertuples():
        cand = clicks[
            (clicks.user_id == e.user_id)
            & (clicks.ts_us < e.ts_us)
            & (clicks.ts_us >= e.ts_us - w_us)
        ]
        for c in cand.itertuples():
            want.add((e.event_id, c.event_id))
    assert got == want
    # exactly one row per qualifying pair (bucket explode must not dup)
    assert len(out) == len(got)


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_dup_spans_brute(spark):
    from s2geometry_spark.operators.spans import dup_spans

    n = 8
    docs = spark.read.parquet(f"{SF_TEST}/documents.parquet")
    out = dup_spans(docs).toPandas()
    pd = docs.select("doc_id", "text").toPandas()
    # global window-hash counts
    from collections import Counter, defaultdict

    cnt = Counter()
    wins = defaultdict(list)  # doc -> [start, ...] (1-based)
    for r in pd.itertuples():
        w = r.text.split(" ")
        for i in range(len(w) - n + 1):
            h = _h32(" ".join(w[i : i + n]))
            cnt[h] += 1
            wins[r.doc_id].append((i + 1, h))
    want = []
    for doc, lst in wins.items():
        flagged = sorted(i for i, h in lst if cnt[h] >= 2)
        spans = []
        for i in flagged:
            e = i + n - 1
            if spans and i <= spans[-1][1]:
                spans[-1] = (spans[-1][0], max(spans[-1][1], e), spans[-1][2] + 1)
            else:
                spans.append((i, e, 1))
        for seq, (s, e, nw) in enumerate(spans, 1):
            want.append((doc, seq, s, e, e - s + 1, nw))
    got = sorted(
        (r.doc_id, r.span_seq, r.tok_start, r.tok_end, r.span_len, r.n_windows)
        for r in out.itertuples()
    )
    assert got == sorted(want)
    assert len(got) > 0  # fixture actually exercises the operator


def test_pii_scrub_brute(spark):
    from s2geometry_spark.operators.pii import (
        EMAIL_RE,
        IPV4_RE,
        PHONE_RE,
        pii_scrub,
    )

    docs = spark.read.parquet(f"{SF_TEST}/documents.parquet")
    out = pii_scrub(docs).toPandas().set_index("doc_id")
    pd = docs.select("doc_id", "text").toPandas()
    n_checked = 0
    for r in pd.itertuples():
        d = r.doc_id
        aug = r.text
        if d % 3 == 0:
            aug += f" contact u{d}@ex{d % 7}.com"
        if d % 5 == 0:
            aug += f" ip 10.{d % 256}.0.{(d * 7) % 256}"
        if d % 11 == 0:
            aug += f" call 555-01{d % 100:02d}"
        row = out.loc[d]
        assert row.n_emails == len(re.findall(EMAIL_RE, aug))
        assert row.n_ips == len(re.findall(IPV4_RE, aug))
        assert row.n_phones == len(re.findall(PHONE_RE, aug))
        red = re.sub(EMAIL_RE, "<EMAIL>", aug)
        red = re.sub(IPV4_RE, "<IP>", red)
        red = re.sub(PHONE_RE, "<PHONE>", red)
        assert row.redacted_md5 == hashlib.md5(red.encode()).hexdigest()
        assert row.n_redacted_chars == len(red)
        n_checked += 1
    assert n_checked == len(out)
    # the planting actually produced every category
    assert out.n_emails.sum() > 0 and out.n_ips.sum() > 0 and out.n_phones.sum() > 0
