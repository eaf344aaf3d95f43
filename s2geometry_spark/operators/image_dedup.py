"""Perceptual near-duplicate image detection: decode -> pHash -> banded
Hamming join.

The LLM-training-data counterpart of the text dedup family
(operators/dedup.py simhash_near_pairs) on the IMAGE axis: every image
is decoded once, reduced to the 64-bit block-mean perceptual hash
(kernels/imagecodec.phash64 — the same function that derives the
geotag metadata at generation time), and near-duplicate pairs are found
with the standard banded trick: split the 64-bit hash into ``n_bands``
equal bands; two hashes within Hamming distance ``max_dist`` agree on at
least one band whenever ``max_dist < n_bands`` (pigeonhole), so an
equi-join on (band index, band value) is a LOSSLESS candidate generator
for that radius.

Scale shape (the whole point):
  * decode + hash is ONE Arrow-batched ``mapInPandas`` pass per side —
    the only Python crossing; binary payloads never survive past it.
  * band explosion, the candidate equi-join, and the exact-distance
    refinement (``bit_count(pa ^ pb) <= max_dist``) are all JVM-side
    (whole-stage codegen) — the heavy join never touches Python.
  * candidates = true near pairs x band multiplicity (<= n_bands), so
    the join output is proportional to the ANSWER, not to |A| x |B|;
    the shuffle keys are 16-bit band values prefixed by the band index,
    giving 4 x 65536 well-spread buckets (hot-value skew would surface
    as one band-value bucket — mitigate by raising n_bands or salting
    the band join, same playbook as dedup.simhash_near_pairs).

The banded-join mechanism itself is oracle-proven bit-exact by the
``dedup_simhash`` entry query; what this operator adds is the binary
decode front-end, which SQL cannot express — the entry query is
therefore rows-only (like the other three image queries) and the
pairing guarantees are pytest-verified against a brute-force popcount
over all pairs.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernels import imagecodec

N_BANDS = 4
BAND_BITS = 64 // N_BANDS
_BAND_MASK = (1 << BAND_BITS) - 1


def phash_from_bytes(images: DataFrame, id_col: str = "image_id") -> DataFrame:
    """(id_col, phash): decode each binary payload and hash the DECODED
    pixels (not the phash metadata column, which hashes the pre-encoding
    source — the difference is exactly what lossy formats perturb)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                yield pd.DataFrame(
                    {
                        id_col: pd.Series(dtype="object"),
                        "phash": pd.Series(dtype="int64"),
                    }
                )
                continue
            hashes = np.empty(len(pdf), np.int64)
            for i, buf in enumerate(pdf["bytes"]):
                px, _ = imagecodec.decode(bytes(buf))
                hashes[i] = imagecodec.phash64(px)
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(), "phash": hashes})

    return images.select(id_col, "bytes").mapInPandas(
        batches, f"{id_col} string, phash long"
    )


def _banded(ph: DataFrame, id_col: str, suffix: str) -> DataFrame:
    """Explode (id, phash) into one row per 16-bit band — pure Catalyst.

    The arithmetic shiftright fills sign bits for the top band of a
    negative hash, but the band mask truncates to BAND_BITS, so the
    result equals the logical-shift band value.
    """
    bands = F.array(
        *[
            F.struct(
                F.lit(i).alias("bi"),
                (
                    F.shiftright(F.col("phash"), BAND_BITS * i)
                    .bitwiseAND(F.lit(_BAND_MASK))
                ).alias("bv"),
            )
            for i in range(N_BANDS)
        ]
    )
    return ph.select(
        F.col(id_col).alias(f"id_{suffix}"),
        F.col("phash").alias(f"ph_{suffix}"),
        F.explode(bands).alias("b"),
    ).select(f"id_{suffix}", f"ph_{suffix}", "b.bi", "b.bv")


def phash_with_reencoded(
    images: DataFrame,
    fmt: str = "qnt",
    id_col: str = "image_id",
    id_prefix: str = "dup-",
) -> DataFrame:
    """(id_col, phash) for the corpus AND its re-encoded variant in ONE
    decode pass: each image is decoded once, hashed, re-encoded through
    ``fmt``, and the variant decoded+hashed in the same Arrow batch —
    half the decode work and none of the variant binary ever shuffles,
    vs composing reencoded_variants with phash_from_bytes (which
    generates and decodes the corpus twice).  Feed the result to
    phash_near_dup_pairs(hashes_a=...) / phash_dedup_clusters(hashes=...).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                yield pd.DataFrame(
                    {
                        id_col: pd.Series(dtype="object"),
                        "phash": pd.Series(dtype="int64"),
                    }
                )
                continue
            ids = []
            hashes = []
            for rid, buf in zip(pdf[id_col], pdf["bytes"]):
                px, _ = imagecodec.decode(bytes(buf))
                ids.append(rid)
                hashes.append(imagecodec.phash64(px))
                vpx, _ = imagecodec.decode(imagecodec.encode(px, fmt))
                ids.append(id_prefix + rid)
                hashes.append(imagecodec.phash64(vpx))
            yield pd.DataFrame({id_col: ids, "phash": np.array(hashes, np.int64)})

    return images.select(id_col, "bytes").mapInPandas(
        batches, f"{id_col} string, phash long"
    )


def phash_near_dup_pairs(
    images_a: DataFrame | None = None,
    images_b: DataFrame | None = None,
    max_dist: int = 2,
    id_col: str = "image_id",
    hashes_a: DataFrame | None = None,
) -> DataFrame:
    """Distinct (id_a, id_b, hamming) pairs with perceptual-hash Hamming
    distance <= ``max_dist``.

    One-table form (images_b=None): unordered pairs within the corpus,
    id_a < id_b.  Two-table form: A x B pairs (e.g. a corpus against a
    re-encoded / resized copy).  Lossless for ``max_dist < N_BANDS`` (= 4).
    ``hashes_a``: a precomputed (id_col, phash) frame replacing the A-side
    decode (e.g. from phash_with_reencoded).
    """
    if max_dist >= N_BANDS:
        raise ValueError(
            f"phash_near_dup_pairs: max_dist {max_dist} >= {N_BANDS} bands "
            "breaks the pigeonhole guarantee; raise N_BANDS instead"
        )
    if (images_a is None) == (hashes_a is None):
        raise ValueError("pass exactly one of images_a / hashes_a")
    from pyspark.storagelevel import StorageLevel

    pa = hashes_a if hashes_a is not None else phash_from_bytes(images_a, id_col)
    if images_b is None:
        # the hash table feeds BOTH legs of the self-join (and is the
        # product of the only expensive step, the binary decode) —
        # persist the narrow (id, 8-byte hash) projection so the decode
        # runs once, not per leg (the dedup_minhash_lsh recompute
        # lesson, operators/dedup.py:262)
        pa = pa.persist(StorageLevel.MEMORY_AND_DISK)
    ta = _banded(pa, id_col, "a")
    if images_b is None:
        tb = ta.select(
            F.col("id_a").alias("id_b"),
            F.col("ph_a").alias("ph_b"),
            "bi",
            "bv",
        )
    else:
        tb = _banded(phash_from_bytes(images_b, id_col), id_col, "b")
    cand = ta.join(tb, ["bi", "bv"])
    if images_b is None:
        cand = cand.where(F.col("id_a") < F.col("id_b"))
    return (
        cand.withColumn(
            "hamming",
            F.bit_count(
                F.col("ph_a").bitwiseXOR(F.col("ph_b"))
            ).cast("int"),
        )
        .where(F.col("hamming") <= max_dist)
        .select("id_a", "id_b", "hamming")
        .dropDuplicates(["id_a", "id_b"])
    )


def reencoded_variants(
    images: DataFrame,
    fmt: str = "qnt",
    id_col: str = "image_id",
    id_prefix: str = "dup-",
) -> DataFrame:
    """A deterministic transformed copy of the corpus: decode -> re-encode
    through ``fmt`` (lossy ``qnt`` perturbs block means by <= 2 codes, so
    each variant lands within a small Hamming ball of its source hash) —
    the standard fixture for exercising near-dup detection end-to-end,
    and a realistic stand-in for "the same photo saved twice"."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                yield pd.DataFrame(
                    {
                        id_col: pd.Series(dtype="object"),
                        "bytes": pd.Series(dtype="object"),
                    }
                )
                continue
            out_ids = []
            out_bytes = []
            for rid, buf in zip(pdf[id_col], pdf["bytes"]):
                px, _ = imagecodec.decode(bytes(buf))
                out_ids.append(id_prefix + rid)
                out_bytes.append(imagecodec.encode(px, fmt))
            yield pd.DataFrame({id_col: out_ids, "bytes": out_bytes})

    return images.select(id_col, "bytes").mapInPandas(
        batches, f"{id_col} string, bytes binary"
    )


def phash_dedup_clusters(
    images: DataFrame | None = None,
    max_dist: int = 2,
    id_col: str = "image_id",
    hashes: DataFrame | None = None,
) -> DataFrame:
    """(image_id, canonical_id, cluster_size): perceptual near-duplicate
    CLUSTERS — the keep-one-per-group step a dedup pipeline actually
    executes, composing phash_near_dup_pairs with the distributed
    connected-components operator (operators/graph.py).

    The components loop needs integer node ids (its fixpoint witness is
    an exact label sum), so string image ids are bridged through the
    portable md5-h64 (collision odds ~2^-64 per pair — acceptable for a
    perceptual grouping whose hash distance is itself approximate).  The
    canonical id is the lexicographically smallest member, computed per
    component AFTER labeling so the output is hash-order independent.
    Only images that appear in at least one pair are emitted (singletons
    are their own keeper by definition).
    """
    from .dedup import md5_h64
    from .graph import connected_components

    # persist the pair list for the call's lifetime: it is consumed by
    # the edge list, the node table, and the final label join — without
    # this each consumer re-runs the decode -> pHash -> banded-join
    # pipeline (the round-2 minhash recompute lesson)
    pairs = phash_near_dup_pairs(
        images, max_dist=max_dist, id_col=id_col, hashes_a=hashes
    ).persist()
    e = pairs.select(
        md5_h64(F.col("id_a")).alias("doc_a"),
        md5_h64(F.col("id_b")).alias("doc_b"),
    )
    comp = connected_components(e)  # (doc_id, component_id) over hashes
    nodes = (
        pairs.select(F.col("id_a").alias(id_col))
        .unionByName(pairs.select(F.col("id_b").alias(id_col)))
        .distinct()
        .withColumn("_h", md5_h64(F.col(id_col)))
    )
    labeled = nodes.join(comp, nodes["_h"] == comp["doc_id"]).select(
        id_col, "component_id"
    )
    groups = labeled.groupBy("component_id").agg(
        F.min(id_col).alias("canonical_id"),
        F.count(F.lit(1)).alias("cluster_size"),
    )
    return labeled.join(groups, "component_id").select(
        id_col, "canonical_id", "cluster_size"
    )
