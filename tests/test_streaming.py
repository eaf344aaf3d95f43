"""Structured Streaming ingestion tests: file source + availableNow
trigger, outputs compared against the equivalent batch plans, and
checkpoint-based incremental processing across restarts."""

import shutil

import pytest
from pyspark.sql import functions as F

from s2geometry_spark.operators import image_pipeline as ip, tiling
from s2geometry_spark.sources import images as imgsrc
from s2geometry_spark.streaming import ingest
from tests.conftest import SF_TEST

N = 300


@pytest.fixture(scope="module")
def img_source(spark, tmp_path_factory):
    """A directory of image parquet files acting as the stream source."""
    d = tmp_path_factory.mktemp("imgsrc")
    df = imgsrc.images_df(spark, N, num_partitions=4)
    df.write.mode("overwrite").parquet(str(d / "batch0"))
    return d


def test_tiled_ingest_matches_batch(spark, img_source, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = ingest.start_tiled_ingest(
        spark,
        str(img_source / "batch0"),
        imgsrc.IMAGES_SCHEMA,
        out,
        ckpt,
        partition_level=5,
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == N
    # streamed tiling equals the batch pipeline on the same rows
    batch = ip.with_geotag(imgsrc.images_df(spark, N))
    want = {r[0]: r[1] for r in tiling.tile_counts(batch, 5).collect()}
    have = {
        r[0]: r[1]
        for r in got.groupBy("cell_l5").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    assert have == want
    # partition layout: batch-id dir (idempotent-replay key) containing one
    # directory per coarse tile (the Iceberg key)
    import os

    batch_dirs = [p for p in os.listdir(out) if p.startswith("ingest_batch=")]
    assert batch_dirs == ["ingest_batch=0"]
    parts = [
        p
        for p in os.listdir(os.path.join(out, "ingest_batch=0"))
        if p.startswith("cell_l5=")
    ]
    assert len(parts) == len(want)


def test_ingest_is_incremental_across_restarts(spark, img_source, tmp_path):
    out = str(tmp_path / "out2")
    ckpt = str(tmp_path / "ckpt2")
    src = tmp_path / "src2"
    src.mkdir()
    # the file source does not recurse: files land flat in the source dir
    for i, f in enumerate(sorted((img_source / "batch0").glob("part-*.parquet"))):
        shutil.copy(f, src / f"b0-{i}.parquet")
    q = ingest.start_tiled_ingest(
        spark, str(src), imgsrc.IMAGES_SCHEMA, out, ckpt, partition_level=5
    )
    q.awaitTermination(120)
    n1 = spark.read.parquet(out).count()
    assert n1 == N
    # new files arrive; restart with the SAME checkpoint: only the new
    # files are processed (no duplicates of batch0)
    staging = tmp_path / "staging"
    imgsrc.images_df(spark, 50, num_partitions=2).write.mode("overwrite").parquet(
        str(staging)
    )
    for i, f in enumerate(sorted(staging.glob("part-*.parquet"))):
        shutil.copy(f, src / f"b1-{i}.parquet")
    q2 = ingest.start_tiled_ingest(
        spark, str(src), imgsrc.IMAGES_SCHEMA, out, ckpt, partition_level=5
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == N + 50


def test_ingest_replay_after_crash_is_idempotent(spark, img_source, tmp_path):
    """Crash between data write and checkpoint commit replays the batch with
    the SAME batch_id on restart (Spark re-derives it from the checkpointed
    offsets); the batch-keyed dynamic-partition overwrite must not duplicate
    rows.  (Driven directly through the sink — an in-process restart after
    deleting commits/0 trips Spark's same-JVM concurrent-checkpoint guard,
    which a real cross-JVM restart doesn't.)"""
    out = str(tmp_path / "out3")
    tiled = ingest.tile_stream(
        spark.read.parquet(str(img_source / "batch0")), levels=(5,)
    )
    write_batch = ingest.idempotent_batch_writer(out, partition_level=5)
    write_batch(tiled, 0)
    assert spark.read.parquet(out).count() == N
    write_batch(tiled, 0)  # crash replay: same batch_id, same rows
    assert spark.read.parquet(out).count() == N  # overwritten, not appended
    write_batch(tiled.limit(50), 1)  # a genuinely new batch appends
    assert spark.read.parquet(out).count() == N + 50


def test_windowed_tile_counts_stream_vs_batch(spark, tmp_path):
    """Watermarked windowed agg over the events stream == batch windowed
    agg on the same files (availableNow processes everything)."""
    src = tmp_path / "events"
    src.mkdir()
    shutil.copy(f"{SF_TEST}/events.parquet", src / "events.parquet")
    batch_events = spark.read.parquet(str(src))
    stream_events = spark.readStream.schema(batch_events.schema).parquet(str(src))
    sdf = ingest.windowed_tile_counts(
        stream_events, "ts", "event_id", window_duration="6 hours", level=3
    )
    out = str(tmp_path / "winout")
    q = (
        sdf.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "winckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.win_start, r.cell_l3): r.cnt for r in spark.read.parquet(out).collect()
    }
    # batch equivalent
    from s2geometry_spark import functions as s2f

    pts = batch_events.select(F.col("ts").alias("_ts"), *tiling.triplet_exprs("event_id"))
    pts = tiling.with_cell_from_triplet(pts)
    import datetime

    batch_rows = (
        pts.withColumn("_ts", F.col("_ts").cast("timestamp"))
        .groupBy(
            F.window("_ts", "6 hours").alias("win"),
            s2f.parent_expr("cell", 3).alias("cell_l3"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("win.start").alias("win_start"), "cell_l3", "cnt")
        .collect()
    )
    # append mode only emits WATERMARK-CLOSED windows; the final window is
    # retained in state when the stream ends — exclude it from the truth
    max_ts = batch_events.agg(F.max("ts")).collect()[0][0]
    closing = max_ts - datetime.timedelta(hours=2)
    want = {
        (r.win_start, r.cell_l3): r.cnt
        for r in batch_rows
        if r.win_start + datetime.timedelta(hours=6) <= closing
    }
    assert got == want and got