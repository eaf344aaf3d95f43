"""IdSetLexicon distributed query vs a literal sequential replay.

The reference (id_set_lexicon.cc:57-77) assigns multi-set ids via
SequenceLexicon's first-seen insertion order.  The operator claims that
processing rows in ascending row_id order through Add() is reproduced
exactly by the first-occurrence rank — this test proves it with a
literal sequential lexicon over the same rows.
"""

import pandas as pd
import pytest

from s2geometry_spark.operators.lexicon import (
    EMPTY_SET_ID,
    id_set_lexicon,
)


def _sequential_lexicon(rows):
    """Literal AddInternal replay: rows = [(row_id, labels)] processed
    in ascending row_id order (ties: canonical-key lexicographic, the
    operator's documented tie-break)."""
    seq_ids: dict[tuple, int] = {}
    out = {}
    keyed = sorted(
        rows,
        key=lambda rl: (
            rl[0],
            ",".join(str(v) for v in sorted(set(rl[1]))),
        ),
    )
    for row_id, labels in keyed:
        canon = tuple(sorted(set(labels)))
        if len(canon) == 0:
            sid = EMPTY_SET_ID
        elif len(canon) == 1:
            sid = canon[0]
        else:
            if canon not in seq_ids:
                seq_ids[canon] = len(seq_ids)
            sid = ~seq_ids[canon]
        out[row_id] = (len(canon), sid, ",".join(str(v) for v in canon))
    return out


CASES = [
    (10, []),                 # empty -> INT32_MIN
    (11, [7]),                # singleton
    (12, [5, 5, 5]),          # collapses to singleton after dedup
    (13, [3, 1, 2]),          # first multi-set -> ~0 == -1
    (14, [2, 3, 1, 1]),       # same canonical set -> same id
    (15, [9, 4]),             # second multi-set -> ~1 == -2
    (16, [1, 2, 3]),          # repeat of the first again
    (17, [0]),                # singleton 0 (id 0 is a valid set id)
    (18, [4, 9, 4]),          # dup of the second
    (19, [31, 30, 29]),       # third multi-set -> ~2 == -3
]


def test_matches_sequential_replay(spark):
    df = spark.createDataFrame(
        [(r, list(map(int, l))) for r, l in CASES],
        "row_id long, labels array<long>",
    )
    got = {
        r.row_id: (r.set_size, r.set_id, r.id_set)
        for r in id_set_lexicon(df).collect()
    }
    assert got == _sequential_lexicon(CASES)


def test_bucket_boundary_rank(spark):
    """Distinct multi-sets whose first refs straddle rank buckets still
    get globally-ordered ids (RANK_BUCKET_W is 2^20; place first refs in
    three different buckets, interleaved with repeats)."""
    w = 1 << 20
    rows = [
        (5, [1, 2]),          # bucket 0, first seen -> -1
        (w + 3, [3, 4]),      # bucket 1 -> -2
        (w + 9, [1, 2]),      # repeat -> -1
        (2 * w + 1, [5, 6]),  # bucket 2 -> -3
        (2 * w + 2, [3, 4]),  # repeat -> -2
    ]
    df = spark.createDataFrame(
        [(r, list(map(int, l))) for r, l in rows],
        "row_id long, labels array<long>",
    )
    got = {r.row_id: r.set_id for r in id_set_lexicon(df).collect()}
    assert got == {
        5: -1, w + 3: -2, w + 9: -1, 2 * w + 1: -3, 2 * w + 2: -2
    }


def test_duplicate_row_id_tiebreak(spark):
    """Two DISTINCT multi-sets first-seen at the same row_id take ids in
    canonical-key lexicographic order ('1,9' < '2,3' as strings)."""
    rows = [(7, [2, 3]), (7, [9, 1]), (8, [2, 3])]
    df = spark.createDataFrame(
        [(r, list(map(int, l))) for r, l in rows],
        "row_id long, labels array<long>",
    )
    got = {
        (r.row_id, r.id_set): r.set_id
        for r in id_set_lexicon(df).collect()
    }
    assert got == {(7, "1,9"): -1, (7, "2,3"): -2, (8, "2,3"): -2}


@pytest.mark.parametrize("seed", [0, 1])
def test_random_vs_replay(spark, seed):
    import numpy as np

    rng = np.random.default_rng(42 + seed)
    rows = []
    for i in range(400):
        n = int(rng.integers(0, 5))
        rows.append((1000 + i, [int(v) for v in rng.integers(0, 6, n)]))
    df = spark.createDataFrame(rows, "row_id long, labels array<long>")
    got = {
        r.row_id: (r.set_size, r.set_id, r.id_set)
        for r in id_set_lexicon(df).collect()
    }
    assert got == _sequential_lexicon(rows)
