"""BPE merge learning vs a from-scratch sequential reference
implementation (the Sennrich algorithm as plain Python loops), on a
handcrafted corpus that exercises the x == y overlap-chain case the
synthetic word soup never produces."""

import pytest


def _ref_bpe(word_counts, n_merges):
    """Sequential reference: dict of symbol tuples -> greedy merges."""
    vocab = {w: tuple(w) + ("</w>",) for w in word_counts}
    merges = []
    for r in range(1, n_merges + 1):
        pairs = {}
        for w, cnt in word_counts.items():
            syms = vocab[w]
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + cnt
        if not pairs:
            break
        # (total DESC, x ASC, y ASC) — the engine's pinned tie-break
        (x, y), total = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((r, x, y, total))
        for w in vocab:
            syms = vocab[w]
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == x and syms[i + 1] == y:
                    out.append(x + y)
                    i += 2  # greedy left-to-right, non-overlapping
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = tuple(out)
    return merges, vocab


CORPUS = [
    # overlap chains: 'aaaa' -> pair (a,a) occurs at 1,2,3; greedy must
    # merge positions 1 and 3 only -> ('aa','aa','</w>')
    # 4x aaaa so pair (a,a)=21 strictly beats (a,</w>)=19 — without the
    # extra word they tie at 18 and the (x ASC, y ASC) tie-break picks
    # (a,'</w>') since '<' sorts before 'a'
    "aaaa aaaa aaaa aaaa banana banana bandana",
    "aaa aa aaaa banana bandana cabana",
    "na na na banana cabana aaaa",
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string")


def _word_counts():
    from collections import Counter

    c = Counter()
    for t in CORPUS:
        c.update(t.split(" "))
    return dict(c)


def test_bpe_matches_sequential_reference(spark, docs):
    from s2geometry_spark.operators.bpe import bpe_train

    n = 8
    merges, syms = bpe_train(docs, n)
    ref_merges, ref_vocab = _ref_bpe(_word_counts(), n)
    assert merges == ref_merges
    got = {}
    for r in syms.collect():
        got.setdefault(r.word, []).append((r.pos, r.sym))
    got = {w: tuple(s for _, s in sorted(v)) for w, v in got.items()}
    assert got == ref_vocab


def test_bpe_overlap_chain_parity(spark, docs):
    """'aaaa' after merging (a,a) must become ('aa','aa','</w>') — the
    island-parity window, not every occurrence."""
    from s2geometry_spark.operators.bpe import _initial_symbols, _one_merge, _vocab

    syms = _initial_symbols(_vocab(docs))
    merged, best = _one_merge(syms)
    assert best[0] == "a" and best[1] == "a"
    rows = sorted(
        (r.pos, r.sym) for r in merged.where(merged.word == "aaaa").collect()
    )
    assert [s for _, s in rows] == ["aa", "aa", "</w>"]
    rows3 = sorted(
        (r.pos, r.sym) for r in merged.where(merged.word == "aaa").collect()
    )
    assert [s for _, s in rows3] == ["aa", "a", "</w>"]


def test_bpe_oracle_on_handcrafted_corpus(spark, docs, tmp_path):
    """The unrolled-CTE oracle must replay the engine bit-for-bit on the
    chain-heavy corpus too (the entry gate only sees the word soup)."""
    import duckdb

    from s2geometry_spark.operators.bpe import (
        bpe_merges_df,
        bpe_merges_oracle_sql,
        bpe_vocab_df,
        bpe_vocab_oracle_sql,
    )

    pq = str(tmp_path / "docs.parquet")
    docs.toPandas().to_parquet(pq)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{pq}')")
    m = bpe_merges_df(spark, docs).toPandas().sort_values("round").reset_index(drop=True)
    om = con.sql(bpe_merges_oracle_sql()).df().sort_values("round").reset_index(drop=True)
    assert m.equals(om)
    v = (
        bpe_vocab_df(docs)
        .toPandas()
        .sort_values(["word", "pos"])
        .reset_index(drop=True)
    )
    ov = (
        con.sql(bpe_vocab_oracle_sql())
        .df()
        .sort_values(["word", "pos"])
        .reset_index(drop=True)
    )
    assert list(v.columns) == list(ov.columns) or set(v.columns) == set(ov.columns)
    v = v[sorted(v.columns)].reset_index(drop=True)
    ov = ov[sorted(ov.columns)].reset_index(drop=True)
    assert v.equals(ov)


def test_bpe_encode_sequential_reference(spark, docs):
    """Encoding via the segmented-vocab join must reproduce the
    sequential reference's per-word tokenization, token counts, and
    the exact ordered stream, word by word."""
    import hashlib

    from s2geometry_spark.operators.bpe import bpe_encode_df

    n = 8
    out = {r.doc_id: r for r in bpe_encode_df(docs, n).collect()}
    _, ref_vocab = _ref_bpe(_word_counts(), n)
    for i, t in enumerate(CORPUS):
        words = t.split(" ")
        toks = [" ".join(ref_vocab[w]) for w in words]
        stream = " ".join(toks)
        r = out[i]
        assert r.n_words == len(words)
        assert r.n_tokens == sum(len(ref_vocab[w]) for w in words)
        assert r.stream_md5 == hashlib.md5(stream.encode()).hexdigest()


def test_bpe_encode_oracle_on_handcrafted_corpus(spark, docs, tmp_path):
    import duckdb

    from s2geometry_spark.operators.bpe import bpe_encode_df, bpe_encode_oracle_sql

    pq = str(tmp_path / "docs_enc.parquet")
    docs.toPandas().to_parquet(pq)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{pq}')")
    e = bpe_encode_df(docs).toPandas().sort_values("doc_id").reset_index(drop=True)
    oe = con.sql(bpe_encode_oracle_sql()).df().sort_values("doc_id").reset_index(drop=True)
    e = e[sorted(e.columns)]
    oe = oe[sorted(oe.columns)]
    assert e.equals(oe)
