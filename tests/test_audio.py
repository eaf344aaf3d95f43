"""WAV codec + audio pipeline (kernels/wavcodec, operators/audio_pipeline)."""

import struct

import numpy as np
import pytest

from s2geometry_spark.kernels import wavcodec
from s2geometry_spark.sources import audio as audiosrc


def test_roundtrip_exact():
    rng = np.random.RandomState(3)
    for ch in (1, 2):
        for n in (1, 7, 500):
            s = rng.randint(-32768, 32768, size=(n, ch)).astype(np.int16)
            dec, rate = wavcodec.decode_wav(wavcodec.encode_wav(s, 16000))
            assert rate == 16000
            assert np.array_equal(dec, s)


def test_decoder_walks_extra_chunks():
    """A standard WAV may carry LIST/INFO etc. chunks before data —
    the decoder must skip them (with odd-length padding)."""
    s = np.arange(-5, 6, dtype=np.int16)[:, None]
    b = wavcodec.encode_wav(s, 8000)
    # splice an odd-length junk chunk between fmt and data
    fmt_end = 12 + 8 + 16
    junk = b"JUNK" + struct.pack("<I", 3) + b"abc" + b"\x00"
    spliced = b[:fmt_end] + junk + b[fmt_end:]
    spliced = (
        spliced[:4]
        + struct.pack("<I", len(spliced) - 8)
        + spliced[8:]
    )
    dec, rate = wavcodec.decode_wav(spliced)
    assert rate == 8000 and np.array_equal(dec, s)


def test_decoder_rejects_garbage():
    with pytest.raises(ValueError):
        wavcodec.decode_wav(b"RIFFxxxxNOPE")
    with pytest.raises(ValueError):
        wavcodec.decode_wav(b"\x00" * 40)


def test_generated_rows_are_valid_and_deterministic():
    r1 = audiosrc.make_audio_row(17)
    r2 = audiosrc.make_audio_row(17)
    assert r1["bytes"] == r2["bytes"]
    dec, rate = wavcodec.decode_wav(r1["bytes"])
    assert rate == r1["rate"]
    assert dec.shape == (r1["n_samples"], r1["channels"])
    want = wavcodec.gen_samples(17, r1["n_samples"], r1["channels"])
    assert np.array_equal(dec, want)  # PCM lossless: exact


def test_audio_features_match_brute_force(spark):
    from s2geometry_spark.operators.audio_pipeline import audio_features
    from s2geometry_spark.sources.audio import audio_df

    n = 40
    got = audio_features(audio_df(spark, n)).toPandas().set_index("audio_id")
    assert len(got) == n
    assert got["invariant_ok"].all()
    for idx in (0, 7, 23):
        row = audiosrc.make_audio_row(idx)
        s, rate = wavcodec.decode_wav(row["bytes"])
        x = s.astype(np.int64)
        mono = x.sum(axis=1)
        sgn = np.sign(mono)
        nz = sgn[sgn != 0]
        g = got.loc[row["audio_id"]]
        assert g.peak == np.abs(x).max()
        assert g.sum_sq == (x * x).sum()
        assert g.zero_crossings == (nz[1:] != nz[:-1]).sum()
        assert g.duration_us == row["duration_us"]


def test_frame_energy_covers_stream(spark):
    from s2geometry_spark.operators.audio_pipeline import audio_frame_energy
    from s2geometry_spark.sources.audio import audio_df

    frames = audio_frame_energy(audio_df(spark, 10), frame_len=512).toPandas()
    for idx in range(10):
        row = audiosrc.make_audio_row(idx)
        sub = frames[frames.audio_id == row["audio_id"]]
        assert sub["n"].sum() == row["n_samples"]  # every sample covered
        s, _ = wavcodec.decode_wav(row["bytes"])
        mono = s.astype(np.int64).sum(axis=1)
        assert sub["sum_sq"].sum() == (mono * mono).sum()
