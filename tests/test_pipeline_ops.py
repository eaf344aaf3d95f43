"""Training-data pipeline ops vs DuckDB oracles at sf0.01 (documents /
embeddings), plus recall/consistency checks for the probabilistic scale
paths (MinHash-LSH, SimHash, LSH-ANN, IVF)."""

import pytest
from pyspark.sql import functions as F

from s2geometry_spark.operators import ann, dedup, text
from tests.conftest import SF_ORACLE, compare_frames

DIM = 64
TAU = 0.2


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").cache()
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet").cache()
    df.count()
    yield df
    df.unpersist()


def test_exact_dedup_oracle(docs, duck):
    got = dedup.exact_dedup(docs)
    want = duck.sql(
        "SELECT md5(text) AS text_hash, min(doc_id) AS keeper_doc_id,"
        " count(*) AS n_dups FROM documents GROUP BY 1"
    )
    compare_frames(got, want)


def test_ngram_jaccard_oracle(docs, duck):
    got = dedup.ngram_jaccard_join(docs, n=3, tau=TAU)
    want = duck.sql(dedup.ngram_jaccard_oracle_sql(n=3, tau=TAU))
    assert got.count() > 0, "tau too high: empty result is a vacuous test"
    compare_frames(got, want)


def test_minhash_lsh_subset_of_exact(docs):
    """LSH pairs must be a SUBSET of the exact pairs (precision 1.0) with
    decent recall at this tau."""
    exact = {
        (r.doc_a, r.doc_b) for r in dedup.ngram_jaccard_join(docs, 3, TAU).collect()
    }
    lsh = {
        (r.doc_a, r.doc_b)
        for r in dedup.minhash_lsh_pairs(docs, num_hashes=32, bands=16, tau=TAU).collect()
    }
    assert lsh <= exact
    if exact:
        assert len(lsh) / len(exact) >= 0.5, (len(lsh), len(exact))


def test_simhash_pairs_consistent(docs):
    """simhash is deterministic; banded candidates verify their Hamming
    bound; near-identical docs (if any) collide."""
    s1 = {r.doc_id: r.simhash for r in dedup.simhash64(docs.limit(100)).collect()}
    s2 = {r.doc_id: r.simhash for r in dedup.simhash64(docs.limit(100)).collect()}
    assert s1 == s2
    pairs = dedup.simhash_near_pairs(docs, max_hamming=16).collect()
    for r in pairs:
        assert 0 <= r.hamming <= 16


def test_token_stats_oracle(docs, duck):
    compare_frames(text.token_stats(docs), duck.sql(text.token_stats_oracle_sql()))


def test_quality_score_oracle(docs, duck):
    compare_frames(text.quality_score(docs), duck.sql(text.quality_score_oracle_sql()))


def test_lang_id_oracle(docs, duck):
    compare_frames(text.lang_id(docs), duck.sql(text.lang_id_oracle_sql()))


def test_fingerprint_deterministic_and_distinct(docs):
    fp = text.fingerprint(docs)
    rows = fp.collect()
    assert len({r.fp for r in rows}) == len(rows)  # all docs distinct here
    again = {r.doc_id: r.fp for r in text.fingerprint(docs).collect()}
    assert again == {r.doc_id: r.fp for r in rows}


def _queries(emb):
    return emb.where(F.col("vec_id") % 29 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("q_embedding")
    )


def test_cosine_topk_bruteforce_oracle(emb, duck):
    got = ann.cosine_topk_bruteforce(emb, _queries(emb), k=5)
    dot = ann.dot_sql("q.embedding", "v.embedding", DIM)
    nq = ann.norm_sql("q.embedding", DIM)
    nv = ann.norm_sql("v.embedding", DIM)
    want = duck.sql(f"""
WITH q AS (SELECT vec_id AS qid, embedding FROM embeddings WHERE vec_id % 29 = 0)
SELECT qid, rank, vec_id, cosine FROM (
  SELECT q.qid, v.vec_id,
         ({dot}) / (({nq}) * ({nv})) AS cosine,
         row_number() OVER (
           PARTITION BY q.qid
           ORDER BY ({dot}) / (({nq}) * ({nv})) DESC, v.vec_id ASC
         ) AS rank
  FROM q, embeddings v WHERE v.vec_id <> q.qid
) WHERE rank <= 5
""")
    assert got.count() > 0
    compare_frames(got, want)


def test_embedding_near_dup_oracle(emb, duck):
    tau = 0.5
    got = ann.embedding_near_dup(emb, tau=tau)
    dot = ann.dot_sql("a.embedding", "b.embedding", DIM)
    na = ann.norm_sql("a.embedding", DIM)
    nb = ann.norm_sql("b.embedding", DIM)
    want = duck.sql(f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       ({dot}) / (({na}) * ({nb})) AS cosine
FROM embeddings a, embeddings b
WHERE a.vec_id < b.vec_id
  AND ({dot}) / (({na}) * ({nb})) >= {tau}
""")
    compare_frames(got, want)


def test_lsh_topk_subset_and_recall(emb):
    q = _queries(emb)
    exact = {
        (r.qid, r.vec_id) for r in ann.cosine_topk_bruteforce(emb, q, k=5).collect()
    }
    approx = {
        (r.qid, r.vec_id)
        for r in ann.cosine_topk_lsh(emb, q, k=5, nbits=16, bands=8, dim=DIM).collect()
    }
    # every approx hit is a real vector pair scored exactly; recall is
    # probabilistic but should be substantial with 8 bands of 2 bits
    assert approx
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.4, recall


def test_ivf_topk_runs_and_ranks(emb):
    q = _queries(emb)
    out = ann.ivf_topk(emb, q, k=3, n_centroids=8, nprobe=4).collect()
    assert out
    by_q = {}
    for r in out:
        by_q.setdefault(r.qid, []).append((r.rank, r.cosine))
    for qid, rows in by_q.items():
        rows.sort()
        assert [r[0] for r in rows] == list(range(1, len(rows) + 1))
        cosines = [r[1] for r in rows]
        assert cosines == sorted(cosines, reverse=True)


def test_sq8_quantize_properties():
    import numpy as np

    rng = np.random.RandomState(5)
    A = rng.randn(100, DIM)
    Q = ann.sq8_quantize(A)
    assert Q.min() >= -127 and Q.max() <= 127
    assert np.array_equal(Q, np.trunc(Q))  # exact integers
    # per-row max magnitude quantizes to exactly +/-127
    hit = np.abs(Q)[np.arange(100), np.argmax(np.abs(A), axis=1)]
    assert np.all(hit == 127)
    # dequantized cosine stays close to exact cosine
    def cosines(M, N):
        num = (M * N).sum(axis=1)
        return num / (np.linalg.norm(M, axis=1) * np.linalg.norm(N, axis=1))

    c_exact = cosines(A[:50], A[50:])
    c_q = cosines(Q[:50], Q[50:])
    assert np.max(np.abs(c_exact - c_q)) < 0.02


def test_sq8_topk_recall_vs_exact(emb):
    q = _queries(emb)
    exact = {
        (r.qid, r.vec_id) for r in ann.cosine_topk_bruteforce(emb, q, k=5).collect()
    }
    rows = ann.sq8_topk(emb, q, k=5, rerank=4).collect()
    got = {(r.qid, r.vec_id) for r in rows}
    # exact rerank on a 4x candidate pool: high (not guaranteed) recall
    assert len(got & exact) / len(exact) >= 0.9
    # ranks contiguous, exact cosine ordering
    by_q = {}
    for r in rows:
        by_q.setdefault(r.qid, []).append((r.rank, r.cosine))
    for rows_q in by_q.values():
        rows_q.sort()
        assert [x[0] for x in rows_q] == list(range(1, len(rows_q) + 1))
        cc = [x[1] for x in rows_q]
        assert cc == sorted(cc, reverse=True)


def test_repetition_stats_hand_case(spark):
    from s2geometry_spark.operators import text as text_ops

    docs = spark.createDataFrame(
        [
            (1, "a b a b a b c"),       # 7 words, 3 distinct; "a b" x3 of 6 bigrams
            (2, "x y z w v u t s"),     # all distinct, no repeats
            (3, "q q q q"),             # total repetition
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in text_ops.repetition_stats(docs).collect()}
    r1 = rows[1]
    assert (r1.n_words, r1.n_distinct) == (7, 3)
    assert r1.dup_word_ratio == 1.0 - 3.0 / 7.0
    assert r1.top_bigram_count == 3 and r1.top_bigram_frac == 3.0 / 6.0
    # trigrams: aba x2, bab x2, bac? -> "a b a" x2, "b a b" x2, "a b c" x1
    assert r1.dup_trigram_occ == 4 and r1.dup_trigram_frac == 4.0 / 5.0
    r2 = rows[2]
    assert r2.dup_word_ratio == 0.0
    assert r2.top_bigram_count == 1 and r2.dup_trigram_occ == 0
    r3 = rows[3]
    assert (r3.n_words, r3.n_distinct) == (4, 1)
    assert r3.top_bigram_count == 3 and r3.top_bigram_frac == 1.0
    assert r3.dup_trigram_occ == 2 and r3.dup_trigram_frac == 1.0


def test_split_assign_stability(spark):
    """Assignment is a pure function of the key: subsets, re-sharding,
    and re-runs never move a document between splits."""
    from s2geometry_spark.operators import text as text_ops

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(1, 301)], "doc_id long, text string"
    )
    full = {r.doc_id: r.split for r in text_ops.split_assign(docs).collect()}
    subset = docs.where(F.col("doc_id") % 3 == 0).repartition(7)
    sub = {r.doc_id: r.split for r in text_ops.split_assign(subset).collect()}
    assert all(full[k] == v for k, v in sub.items())
    again = {r.doc_id: r.split for r in text_ops.split_assign(docs).collect()}
    assert again == full
    # all three splits materialize and roughly follow 90/5/5
    from collections import Counter

    c = Counter(full.values())
    assert set(c) == {"train", "val", "test"}
    assert c["train"] > 200


def test_lsh_recall_audit_accounting(docs):
    """The recall audit's counters satisfy their defining identities at
    any banding: fp == 0 (both sides share the exact-Jaccard refinement),
    n_exact == tp + fn, recall == tp / n_exact."""
    for bands in (16, 2):
        row = dedup.lsh_recall_audit(
            docs, num_hashes=32, bands=bands, n=3, tau=TAU
        ).collect()[0]
        assert row.fp == 0
        assert row.n_exact == row.tp + row.fn
        assert row.n_lsh == row.tp
        if row.n_exact:
            assert row.recall == row.tp / row.n_exact
        # generous banding on planted dups: full recall
        if bands == 16:
            assert row.recall == 1.0


def test_ivf_recall_audit_invariants_and_exact_config(emb):
    """Audit arithmetic is internally consistent at a lossy config, and a
    non-lossy config (nprobe == n_centroids makes IVF exact) audits to
    recall == 1.0 with zero fn/fp."""
    q = _queries(emb)
    row = ann.ivf_recall_audit(emb, q, k=5, n_centroids=8, nprobe=2).collect()[0]
    assert row.n_queries == q.count() > 0
    assert row.tp + row.fn == row.n_exact
    assert row.tp + row.fp == row.n_ivf
    assert 0.0 <= row.worst_q_recall <= row.recall <= 1.0
    assert row.recall == row.tp / row.n_exact

    exact = ann.ivf_recall_audit(emb, q, k=5, n_centroids=8, nprobe=8).collect()[0]
    assert exact.recall == 1.0 and exact.worst_q_recall == 1.0
    assert exact.fn == 0 and exact.fp == 0
    assert exact.n_exact == exact.n_ivf == exact.tp


def test_pack_assign_stream_is_gap_free_and_partition_invariant(docs):
    """The packed token stream must be a contiguous permutation: sorted
    start offsets tile [0, total_tokens) exactly; result identical under
    a different partitioning (the distributed prefix sum is exact)."""
    rows = text.pack_assign(docs).collect()
    got = sorted((r.start_off, r.n_tokens, r.doc_id) for r in rows)
    pos = 0
    for start, n, _ in got:
        assert start == pos
        pos += n
    assert pos == sum(r.n_tokens for r in rows)
    for r in rows:
        assert r.bin_first == r.start_off // 512
        assert r.bin_last == (r.start_off + r.n_tokens - 1) // 512
    again = sorted(
        (r.start_off, r.n_tokens, r.doc_id)
        for r in text.pack_assign(docs.repartition(13)).collect()
    )
    assert got == again


def test_caption_alignment_invariants(emb):
    """aligned=1 iff true_rank=1 iff margin==0 exactly; every pair_id
    appears once; hard negatives never include the true caption and
    neg_rank 1's cosine bounds the rest of its image's negatives."""
    align = ann.caption_alignment(emb, batch_pairs=32).toPandas()
    n_pairs = emb.where(F.col("vec_id") % 2 == 0).count()
    assert len(align) == n_pairs
    assert align["pair_id"].is_unique
    on_target = align[align["aligned"] == 1]
    off_target = align[align["aligned"] == 0]
    assert (on_target["true_rank"] == 1).all()
    assert (on_target["margin"] == 0.0).all()  # top1 IS the true caption
    assert (off_target["true_rank"] > 1).all()
    assert (off_target["margin"] > 0.0).all()
    assert (align["true_rank"] <= 32).all()

    neg = ann.hard_negatives(emb, batch_pairs=32, k=3).toPandas()
    assert (neg["neg_pair"] != neg["pair_id"]).all()
    per_img = neg.groupby("pair_id")
    assert (per_img["neg_rank"].max() <= 3).all()
    # within each image, cosines are non-increasing in neg_rank
    srt = neg.sort_values(["pair_id", "neg_rank"])
    assert (
        srt.groupby("pair_id")["cos"].apply(lambda s: s.is_monotonic_decreasing)
    ).all()


def test_doc_chunks_brute_force(spark):
    """doc_chunks vs a literal Python replay: every token covered, chunk
    boundaries/stride/md5 exact, no chunk a subset of its predecessor."""
    import hashlib
    import math

    from s2geometry_spark.operators.text import (
        CHUNK_OVERLAP,
        CHUNK_STRIDE,
        CHUNK_TOKENS,
        doc_chunks,
    )

    texts = {
        1: "a",                               # 1 token -> 1 chunk
        2: " ".join(f"t{i}" for i in range(CHUNK_TOKENS)),        # exactly 1
        3: " ".join(f"t{i}" for i in range(CHUNK_TOKENS + 1)),    # -> 2
        4: " ".join(f"t{i}" for i in range(CHUNK_TOKENS + CHUNK_STRIDE)),  # full 2
        5: " ".join(f"t{i}" for i in range(3 * CHUNK_STRIDE + CHUNK_OVERLAP + 7)),
    }
    docs = spark.createDataFrame(
        [(k, v) for k, v in texts.items()], "doc_id long, text string"
    )
    got = {
        (r.doc_id, r.chunk_id): r for r in doc_chunks(docs).collect()
    }
    n_rows = 0
    for doc_id, t in texts.items():
        w = t.split(" ")
        n = len(w)
        nc = math.ceil(max(n - CHUNK_OVERLAP, 1) / CHUNK_STRIDE)
        covered = set()
        for k in range(nc):
            r = got[(doc_id, k)]
            piece = w[k * CHUNK_STRIDE : k * CHUNK_STRIDE + CHUNK_TOKENS]
            assert r.start == k * CHUNK_STRIDE
            assert r.chunk_len == len(piece)
            assert r.chunk_md5 == hashlib.md5(" ".join(piece).encode()).hexdigest()
            if k > 0:
                assert r.start + r.chunk_len > (k - 1) * CHUNK_STRIDE + CHUNK_TOKENS
            covered.update(range(r.start, r.start + r.chunk_len))
            n_rows += 1
        assert covered == set(range(n)), f"doc {doc_id} not fully covered"
    assert len(got) == n_rows


def test_incremental_dedup_verdicts(spark):
    """Hand case: batch doc duplicating two corpus docs picks the max
    jaccard (ties -> smallest corpus id); unmatched batch docs get the
    novel verdict (-1, 0.0); corpus docs never appear in the output."""
    rows = [
        # corpus 1 and 2: identical text (tie candidates), corpus 3 distinct
        (1, "a b c d e f g h"),
        (2, "a b c d e f g h"),
        (3, "z y x w v u t s"),
        # batch 17: exact dup of corpus 1/2 -> tie -> dup_of = 1
        (17, "a b c d e f g h"),
        # batch 27: novel
        (27, "m n o p q r s t u"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: (r.dup_of, round(r.jaccard, 6))
        for r in dedup.incremental_dedup(
            docs, F.col("doc_id") >= 10
        ).collect()
    }
    assert out == {17: (1, 1.0), 27: (-1, 0.0)}


def test_domain_cap_brute_force(docs):
    """Replay the coin/rank rule in pure Python (hashlib md5) and check
    every keep verdict plus the per-source cap invariant."""
    import hashlib

    cap = 7
    out = {r.doc_id: r for r in text.domain_cap(docs, cap=cap).collect()}
    rows = docs.select("doc_id", "source").collect()

    def coin(doc_id):
        hx = hashlib.md5(f"s2dcap:{doc_id}".encode()).hexdigest()
        hi, lo = int(hx[:8], 16), int(hx[8:16], 16)
        v = (hi << 32) + lo
        return v - (1 << 64) if v >= (1 << 63) else v

    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r.doc_id)
    for src, ids in by_src.items():
        ranked = sorted(ids, key=lambda d: (coin(d), d))
        for i, d in enumerate(ranked, start=1):
            got = out[d]
            assert got.rank_in_source == i
            assert got.n_source_docs == len(ids)
            assert got.keep == (i <= cap)
        assert sum(out[d].keep for d in ids) == min(cap, len(ids))


def test_domain_cap_partition_invariant(docs):
    a = sorted(map(tuple, text.domain_cap(docs).collect()))
    b = sorted(map(tuple, text.domain_cap(docs.repartition(13, "doc_id")).collect()))
    assert a == b


def test_bloom_decontaminate_one_sided_and_small_filter(docs):
    """With a deliberately undersized filter (m=1024) false positives
    must appear, false negatives must not, and both legs must agree
    with a pure-Python bloom replay."""
    import hashlib

    m, k, n = 1024, 3, 5
    out = dedup.bloom_decontaminate(docs, n=n, m=m, k=k).collect()
    assert len(out) > 0
    total_fp = 0
    for r in out:
        assert r.exact_hits <= r.bloom_hits  # one-sided error only
        assert r.false_pos == r.bloom_hits - r.exact_hits
        assert r.bloom_flag == (r.bloom_hits > 0)
        assert r.exact_flag == (r.exact_hits > 0)
        total_fp += r.false_pos
    assert total_fp > 0, "undersized filter should produce false positives"

    # python replay on one train doc with hits
    def h64(s):
        hx = hashlib.md5(s.encode()).hexdigest()
        hi, lo = int(hx[:8], 16), int(hx[8:16], 16)
        v = (hi << 32) + lo
        return v - (1 << 64) if v >= (1 << 63) else v

    def h32(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    def grams(txt):
        w = txt.split(" ")
        return {" ".join(w[i : i + n]) for i in range(max(len(w) - n + 1, 0))}

    rows = docs.select("doc_id", "text").collect()
    train, eval_g = {}, set()
    for r in rows:
        if h32(f"s2split:{r.doc_id}") % 1000 < 900:
            train[r.doc_id] = grams(r.text)
        else:
            eval_g |= grams(r.text)
    bits = set()
    for g in eval_g:
        h1, h2 = h64("bf1:" + g) % m, h64("bf2:" + g) % m
        bits |= {(h1 + i * h2) % m for i in range(k)}

    def bloom_hit(g):
        h1, h2 = h64("bf1:" + g) % m, h64("bf2:" + g) % m
        return all((h1 + i * h2) % m in bits for i in range(k))

    byid = {r.train_doc: r for r in out}
    assert set(byid) == set(d for d, gs in train.items() if gs)
    for d, gs in list(train.items())[:25]:
        if not gs:
            continue
        r = byid[d]
        assert r.n_grams == len(gs)
        assert r.exact_hits == sum(g in eval_g for g in gs)
        assert r.bloom_hits == sum(bloom_hit(g) for g in gs)


def test_domain_cap_enforce_equals_audit_keep_set(docs):
    """The two-phase map-side pre-cap must select exactly the audit
    variant's keep set (a batch-local cap cannot evict a true winner),
    at any input partitioning."""
    cap = 7
    audit = text.domain_cap(docs, cap=cap)
    want = {
        (r.doc_id, r.source, r.rank_in_source)
        for r in audit.where("keep").collect()
    }
    for df in (docs, docs.repartition(23, "doc_id"), docs.coalesce(1)):
        got = {
            (r.doc_id, r.source, r.rank_in_source)
            for r in text.domain_cap_enforce(df, cap=cap).collect()
        }
        assert got == want
