#!/usr/bin/env python
"""Production entry point: the full text-corpus curation DAG as a
stage-resumable spark-submit job — the pipeline a pretraining run feeds
from, built entirely out of this repo's oracled operators.

    raw documents
      -> exact dedup (md5 keeper per byte-identical text)
      -> near-dup clusters (MinHash-LSH pairs -> connected components,
         keep the canonical doc per cluster)
      -> quality gate (token stats + repetition filters)
      -> split assignment (leakage-safe hash permille)
      -> decontamination (drop train docs overlapping eval 5-grams)
      -> multilingual temperature resampling of the train split
         (lang_temperature_sample, p^(1/2) rebalance)
      -> data-mix report (corpus_mixture)
      -> sequence packing (pack_assign over the surviving train split)

Launch (cluster):
    zip -r s2geometry_spark.zip s2geometry_spark
    spark-submit --py-files s2geometry_spark.zip jobs/curation_pipeline_job.py \
        --sf-dir /data/corpus --out /data/runs/curated1

Launch (sandbox smoke):
    python jobs/curation_pipeline_job.py --sf-dir /root/testdata/sf0.01 \
        --out /tmp/curation_run

Resume: every stage writes its output parquet under <out>/<stage> and a
line to <out>/_stages.jsonl; re-running with the same --out skips stages
whose output already committed (parquet _SUCCESS marker) — the
stage-granular analog of image_tiling_job's per-bucket lineage, which is
the right granularity here because the dedup graph stages are global.

One JSON metrics line per stage on stdout; the final line summarizes
document survival through the funnel.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: drop a train doc when this fraction of an eval doc's 5-grams appear in it
CONTAMINATION_MAX_FRAC = 0.2
#: quality-gate thresholds (repetition_stats / token_stats columns)
MIN_TOKENS = 5
MAX_DUP_WORD_RATIO = 0.9
MAX_TOP_BIGRAM_FRAC = 0.5


def _done(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", required=True)
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from s2geometry_spark.operators import dedup, text
    from s2geometry_spark.operators.graph import connected_components
    from s2geometry_spark.sources.session import get_spark

    spark = get_spark("curation-pipeline-job", cpus=args.cpus)
    os.makedirs(args.out, exist_ok=True)
    stage_log = os.path.join(args.out, "_stages.jsonl")

    def stage(name: str, build):
        """Build-or-load one stage: skip if its parquet already committed."""
        path = os.path.join(args.out, name)
        t0 = time.time()
        if _done(path):
            df = spark.read.parquet(path)
            print(json.dumps({"stage": name, "skipped": True,
                              "rows": df.count()}))
            return df
        build().write.mode("overwrite").parquet(path)
        df = spark.read.parquet(path)
        rec = {"stage": name, "skipped": False, "rows": df.count(),
               "sec": round(time.time() - t0, 2)}
        print(json.dumps(rec))
        with open(stage_log, "a") as f:
            f.write(json.dumps(rec) + "\n")
        return df

    docs = spark.read.parquet(os.path.join(args.sf_dir, "documents.parquet"))
    n_raw = docs.count()

    # 1. exact dedup: keep the minimum doc_id per byte-identical text
    def build_exact():
        keep = dedup.exact_dedup(docs).select(
            F.col("keeper_doc_id").alias("doc_id")
        )
        return docs.join(keep, "doc_id")

    exact = stage("s1_exact_dedup", build_exact)

    # 2. near-dup clusters WITHIN each split: LSH pairs -> components ->
    # canonical keeper.  Dedup must not delete an eval document because a
    # train near-copy exists (that would HIDE the leak) — same-split
    # pairs only; cross-split near-copies are stage 4's job to catch.
    def build_neardup():
        sp = text.split_assign(exact).select("doc_id", "split")
        sa = sp.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("_sa"))
        sb = sp.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("_sb"))
        pairs = (
            dedup.minhash_lsh_pairs(exact, num_hashes=32, bands=16, tau=0.5)
            .join(sa, "doc_a")
            .join(sb, "doc_b")
            .where(F.col("_sa") == F.col("_sb"))
        )
        comp = connected_components(pairs)
        keepers = comp.groupBy("component_id").agg(
            F.min("doc_id").alias("doc_id")
        )
        dropped = comp.join(
            keepers.withColumnRenamed("doc_id", "_keep"), "component_id"
        ).where(F.col("doc_id") != F.col("_keep")).select("doc_id")
        return exact.join(dropped, "doc_id", "left_anti")

    neardup = stage("s2_near_dedup", build_neardup)

    # 3. quality gate: length + repetition thresholds
    def build_quality():
        ts = text.token_stats(neardup).select("doc_id", "n_tokens")
        rep = text.repetition_stats(neardup).select(
            "doc_id", "dup_word_ratio", "top_bigram_frac"
        )
        keep = (
            ts.join(rep, "doc_id")
            .where(
                (F.col("n_tokens") >= MIN_TOKENS)
                & (F.col("dup_word_ratio") <= MAX_DUP_WORD_RATIO)
                & (F.col("top_bigram_frac") <= MAX_TOP_BIGRAM_FRAC)
            )
            .select("doc_id")
        )
        return neardup.join(keep, "doc_id")

    quality = stage("s3_quality", build_quality)

    # 4. split + decontamination: drop train docs that contain too much
    # of any eval doc verbatim
    def build_decon():
        sp = text.split_assign(quality).select("doc_id", "split")
        contaminated = (
            dedup.decontaminate(quality, n=5)
            .where(F.col("overlap_frac") >= CONTAMINATION_MAX_FRAC)
            .select(F.col("train_doc").alias("doc_id"))
            .distinct()
        )
        return (
            quality.join(sp, "doc_id")
            .join(contaminated, "doc_id", "left_anti")
        )

    curated = stage("s4_decontaminated", build_decon)

    # 4b. multilingual temperature resampling of the TRAIN split toward
    # p^(1/2): downsample dominant languages by the deterministic md5
    # coin (text.lang_temperature_sample); val/test stay unsampled so
    # evaluation remains representative
    def build_resample():
        verdict = text.lang_temperature_sample(curated.drop("split"))
        dropped = verdict.where(~F.col("keep")).select("doc_id")
        return curated.join(
            dropped.join(
                curated.where(F.col("split") == "train").select("doc_id"),
                "doc_id",
            ),
            "doc_id",
            "left_anti",
        )

    resampled = stage("s4b_temperature", build_resample)

    # 5. data-mix report (tiny; recomputed each run, printed not stored)
    mix = text.corpus_mixture(resampled.drop("split")).collect()
    print(json.dumps({"stage": "s5_mixture",
                      "cells": [{k: r[k] for k in
                                 ("lang", "split", "n_docs", "n_tokens",
                                  "permille_tokens")} for r in mix]}))

    # 6. sequence packing of the surviving train split
    def build_pack():
        train = resampled.where(F.col("split") == "train")
        return text.pack_assign(train)

    packed = stage("s6_packed_train", build_pack)

    n_bins = packed.agg(F.max("bin_last")).collect()[0][0]
    print(json.dumps({
        "raw_docs": n_raw,
        "after_exact": exact.count(),
        "after_near_dup": neardup.count(),
        "after_quality": quality.count(),
        "after_decontamination": curated.count(),
        "after_temperature": resampled.count(),
        "packed_train_docs": packed.count(),
        "context_windows": (int(n_bins) + 1) if n_bins is not None else 0,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
