"""Audio feature extraction over binary WAV columns — the audio leg of
the multimodal pipeline (builder brief; no s2geometry counterpart).

One FUSED Arrow pass per operator (the BENCH.md rule: never chain
Python stages): decode + invariant verify + every feature in a single
mapInPandas crossing, binary column never cached or shuffled.

All emitted statistics are exact integers (int16 samples -> int64
sums), so results are identical under any partitioning / cluster size
— the same bit-reproducibility contract as the rest of the repo.  The
features are the standard cheap audio-curation screens: peak/clipping
(recording quality), RMS energy via sum of squares (silence filter),
zero-crossing count (crude spectral content / noisiness).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..kernels import wavcodec

_FEAT_SCHEMA = (
    "audio_id string, rate int, channels int, n_samples int, "
    "duration_us long, peak long, sum_sq long, zero_crossings long, "
    "clip_count long, invariant_ok boolean"
)


def audio_features(audio: DataFrame) -> DataFrame:
    """(audio_id, rate, channels, n_samples, duration_us, peak, sum_sq,
    zero_crossings, clip_count, invariant_ok): decode each WAV and
    extract integer features.  ``invariant_ok`` verifies the typed
    metadata AGAINST THE DECODED STREAM (rate/channels/n_samples/
    duration match) — the multimodal analog of the image PSNR/caption
    invariant, exact because PCM is lossless."""

    def batches(it):
        for pdf in it:
            if not len(pdf):
                yield pd.DataFrame(
                    {
                        "audio_id": pd.Series(dtype="object"),
                        "rate": pd.Series(dtype="int32"),
                        "channels": pd.Series(dtype="int32"),
                        "n_samples": pd.Series(dtype="int32"),
                        "duration_us": pd.Series(dtype="int64"),
                        "peak": pd.Series(dtype="int64"),
                        "sum_sq": pd.Series(dtype="int64"),
                        "zero_crossings": pd.Series(dtype="int64"),
                        "clip_count": pd.Series(dtype="int64"),
                        "invariant_ok": pd.Series(dtype="bool"),
                    }
                )
                continue
            rows = []
            for r in pdf.itertuples():
                s, rate = wavcodec.decode_wav(r.bytes)
                n, ch = s.shape
                x = s.astype(np.int64)
                mono = x.sum(axis=1)  # exact channel fold
                sgn = np.sign(mono)
                nz = sgn[sgn != 0]
                zc = int((nz[1:] != nz[:-1]).sum()) if len(nz) > 1 else 0
                ok = (
                    rate == r.rate
                    and ch == r.channels
                    and n == r.n_samples
                    and n * 1_000_000 // rate == r.duration_us
                )
                rows.append(
                    (
                        r.audio_id,
                        rate,
                        ch,
                        n,
                        n * 1_000_000 // rate,
                        int(np.abs(x).max()) if n else 0,
                        int((x * x).sum()),
                        zc,
                        int((np.abs(s.astype(np.int64)) >= 32767).sum()),
                        bool(ok),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "audio_id",
                    "rate",
                    "channels",
                    "n_samples",
                    "duration_us",
                    "peak",
                    "sum_sq",
                    "zero_crossings",
                    "clip_count",
                    "invariant_ok",
                ],
            )

    return audio.mapInPandas(batches, _FEAT_SCHEMA)


_FRAME_SCHEMA = (
    "audio_id string, frame int, start_sample int, n int, "
    "peak long, sum_sq long"
)


def audio_frame_energy(audio: DataFrame, frame_len: int = 512) -> DataFrame:
    """Fixed-window frame energies (the audio analog of video frame
    sampling): per ``frame_len``-sample window, exact integer peak and
    sum-of-squares over the channel-summed signal.  One fused decode
    pass; frames explode INSIDE the Arrow batch (map-only at scale)."""

    def batches(it):
        for pdf in it:
            out = {
                "audio_id": [],
                "frame": [],
                "start_sample": [],
                "n": [],
                "peak": [],
                "sum_sq": [],
            }
            for r in pdf.itertuples():
                s, _rate = wavcodec.decode_wav(r.bytes)
                mono = s.astype(np.int64).sum(axis=1)
                for f in range(0, len(mono), frame_len):
                    w = mono[f : f + frame_len]
                    out["audio_id"].append(r.audio_id)
                    out["frame"].append(f // frame_len)
                    out["start_sample"].append(f)
                    out["n"].append(len(w))
                    out["peak"].append(int(np.abs(w).max()))
                    out["sum_sq"].append(int((w * w).sum()))
            yield pd.DataFrame(out)

    return audio.mapInPandas(batches, _FRAME_SCHEMA)
