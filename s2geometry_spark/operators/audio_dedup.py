"""Audio near-duplicate detection over binary WAV columns.

The audio leg of the near-dup family (builder brief; cousin of
operators/image_dedup).  One FUSED Arrow pass decodes each WAV and
emits its integer landmark fingerprint (kernels/audiofp — exact int64
WHT hashing, no float anywhere), then a pure-Catalyst inverted-index
self-join on the 40-bit hashes finds candidate pairs and scores them by
shared-hash count:

    match_frac = shared / min(|fp_a|, |fp_b|)   (>= threshold -> dup)

Scale shape (the minhash/LSH recipe, operators/dedup.py): the binary
column never leaves the decode stage; hashes explode into (hash,
audio_id) postings; ONE shuffle on the uniform hash key builds the
index; postings with document frequency > MAX_DF are dropped before
pairing (stop-hash rule — a degenerate hash shared by k audios would
otherwise fan out k^2 candidate rows), and candidate dedup happens
AFTER the cheap count aggregation on 2 narrow columns.  Pair emission
is a per-hash pandas-free JVM join (a < b), so the whole operator is
decode + codegen.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernels import audiofp, wavcodec

#: drop hashes appearing in more than this many audios (stop-hashes);
#: at the fixture's similarity structure the planted variants share
#: nearly all hashes while unrelated audios share isolated ones, so a
#: generous cap only guards the quadratic blowup.
MAX_DF = 64

_FP_SCHEMA = "audio_id string, n_hashes long, h long"


def audio_fingerprints(audio: DataFrame) -> DataFrame:
    """(audio_id, n_hashes, h): one exploded posting row per landmark
    hash.  Decode + WHT + hashing in a single mapInPandas crossing."""

    def batches(it):
        for pdf in it:
            if not len(pdf):
                yield pd.DataFrame(
                    {
                        "audio_id": pd.Series(dtype="object"),
                        "n_hashes": pd.Series(dtype="int64"),
                        "h": pd.Series(dtype="int64"),
                    }
                )
                continue
            ids, counts, hs = [], [], []
            for r in pdf.itertuples():
                s, _rate = wavcodec.decode_wav(r.bytes)
                f = audiofp.fingerprint(s)
                ids.extend([r.audio_id] * len(f))
                counts.extend([len(f)] * len(f))
                hs.append(f)
            yield pd.DataFrame(
                {
                    "audio_id": pd.Series(ids, dtype="object"),
                    "n_hashes": pd.Series(counts, dtype="int64"),
                    "h": np.concatenate(hs)
                    if hs
                    else np.empty(0, np.int64),
                }
            )

    return audio.select("audio_id", "bytes").mapInPandas(
        batches, _FP_SCHEMA
    )


def audio_near_dup_pairs(
    audio: DataFrame, threshold: float = 0.8
) -> DataFrame:
    """(audio_a, audio_b, shared, n_a, n_b, match_permille) for every
    pair with match_frac >= threshold; match_permille is the exact
    integer 1000*shared*min(n)^-1 floor (no float compare)."""
    fp = audio_fingerprints(audio)
    df = fp.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    posts = fp.join(df.where(F.col("df") <= MAX_DF).select("h"), "h")
    a = posts.select(
        "h",
        F.col("audio_id").alias("audio_a"),
        F.col("n_hashes").alias("n_a"),
    )
    b = posts.select(
        "h",
        F.col("audio_id").alias("audio_b"),
        F.col("n_hashes").alias("n_b"),
    )
    pairs = (
        a.join(b, "h")
        .where(F.col("audio_a") < F.col("audio_b"))
        .groupBy("audio_a", "audio_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    mn = F.least(F.col("n_a"), F.col("n_b"))
    permille = F.floor(F.col("shared") * 1000 / mn).cast("long")
    return (
        pairs.withColumn("match_permille", permille)
        .where(F.col("match_permille") >= int(threshold * 1000))
        .select(
            "audio_a", "audio_b", "shared", "n_a", "n_b",
            "match_permille",
        )
    )
