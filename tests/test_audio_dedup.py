"""Audio landmark near-dup: brute-force parity + planted variants."""

import numpy as np
import pytest

from s2geometry_spark.kernels import audiofp, wavcodec
from s2geometry_spark.operators.audio_dedup import (
    MAX_DF,
    audio_near_dup_pairs,
)
from s2geometry_spark.sources.audio import (
    DEDUP_VARIANT_EVERY,
    audio_dedup_df,
    make_audio_dedup_rows,
)

N = 40


def _brute_pairs(n, threshold=0.8):
    """Literal replay: fingerprints, stop-hash filter, pair scoring."""
    fps = {}
    for i in range(n):
        for row in make_audio_dedup_rows(i):
            s, _ = wavcodec.decode_wav(row["bytes"])
            fps[row["audio_id"]] = set(
                audiofp.fingerprint(s).tolist()
            )
    df = {}
    for f in fps.values():
        for h in f:
            df[h] = df.get(h, 0) + 1
    kept = {h for h, c in df.items() if c <= MAX_DF}
    out = {}
    ids = sorted(fps)
    for i, a in enumerate(ids):
        fa = fps[a] & kept
        for b in ids[i + 1 :]:
            shared = len(fa & (fps[b] & kept))
            mn = min(len(fps[a]), len(fps[b]))
            if mn and shared * 1000 // mn >= int(threshold * 1000):
                out[(a, b)] = shared
    return fps, out


def test_matches_brute_force(spark):
    fps, expect = _brute_pairs(N)
    got = {
        (r.audio_a, r.audio_b): r.shared
        for r in audio_near_dup_pairs(audio_dedup_df(spark, N)).collect()
    }
    assert got == expect


def test_planted_variants_recovered(spark):
    rows = audio_near_dup_pairs(audio_dedup_df(spark, N)).collect()
    got = {(r.audio_a, r.audio_b) for r in rows}
    for i in range(0, N, DEDUP_VARIANT_EVERY):
        base = f"aud{i:012d}"
        assert (base, base + "_g2") in got, f"gain variant of {i} missed"
        assert (base, base + "_sh") in got, f"shift variant of {i} missed"
    # every reported pair shares a planted base (no cross-audio dups in
    # this fixture draw — verified against brute force above)
    for a, b in got:
        assert b.startswith(a[:15]) or a[:15] == b[:15]


def test_gain_and_shift_exact_invariance():
    s = wavcodec.gen_samples(3, 2000, 2)
    f = audiofp.fingerprint(s)
    g2 = audiofp.fingerprint((s.astype(np.int32) * 2).astype(np.int16))
    sh = audiofp.fingerprint(s[2 * audiofp.HOP :])
    assert np.array_equal(f, g2)
    assert set(sh.tolist()) <= set(f.tolist())


def test_fingerprint_partitioning_invariant(spark):
    """Same fingerprints whether computed on 2 or 8 partitions."""
    from s2geometry_spark.operators.audio_dedup import audio_fingerprints

    a = audio_fingerprints(audio_dedup_df(spark, 12, num_partitions=2))
    b = audio_fingerprints(audio_dedup_df(spark, 12, num_partitions=8))
    pa = sorted(map(tuple, a.collect()))
    pb = sorted(map(tuple, b.collect()))
    assert pa == pb


def test_wht_is_exact_orthogonal():
    """WHT^2 == n * identity on integer inputs (exactness witness)."""
    rng = np.random.default_rng(5)
    x = rng.integers(-(2**15), 2**15, (4, audiofp.FRAME)).astype(np.int64)
    back = audiofp.fwht(audiofp.fwht(x)) // audiofp.FRAME
    assert np.array_equal(back, x)
