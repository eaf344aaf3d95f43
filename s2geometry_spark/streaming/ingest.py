"""Structured Streaming ingestion with S2 tiling (SURVEY.md §2.9).

The reference is purely batch; its closest analogue to streaming is the
incrementally-updatable MutableS2ShapeIndex (mutable_s2shape_index.h:66-71).
The engine's streaming story is ingestion-shaped instead:

* ``tile_stream``       — stateless transform attaching geotag + tiling
                          columns to any stream with a phash column (the
                          same pandas UDFs as batch: streaming-safe).
* ``start_tiled_ingest``— readStream -> tile -> foreachBatch append to a
                          cell-prefix-partitioned parquet/Iceberg layout
                          with a checkpoint location (exactly-once per the
                          file-source + idempotent-append contract).
* ``windowed_tile_counts`` — event-time windowed per-tile counts with a
                          watermark for late data (the streaming version
                          of tiling.tile_counts).

All tested with file sources + ``trigger(availableNow=True)`` so results
are comparable to the batch plans on identical input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import functions as s2f
from ..operators.image_pipeline import geotag_cell_from_phash


def tile_stream(
    stream: DataFrame, phash_col: str = "phash", levels=(5, 12)
) -> DataFrame:
    """Attach (lat, lng, cell, cell_l{k}) to a (possibly streaming)
    DataFrame — stateless projection, safe in streaming plans."""
    g = geotag_cell_from_phash(F.col(phash_col))
    out = stream.withColumn("_g", g).select("*", "_g.lat", "_g.lng", "_g.cell").drop("_g")
    for lvl in levels:
        out = out.withColumn(f"cell_l{lvl}", s2f.parent_expr("cell", lvl))
    return out


def idempotent_batch_writer(out_dir: str, partition_level: int):
    """foreachBatch sink whose replays are exact overwrites, not appends.

    Each micro-batch lands under a deterministic ``ingest_batch=<batch_id>``
    partition via DYNAMIC partition overwrite: a replayed batch (stream
    restart after data write but before checkpoint commit) re-derives the
    same batch_id from the checkpointed source offsets and overwrites only
    its own partitions — the idempotent-append contract Iceberg's MERGE
    gives natively, built on plain parquet."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("ingest_batch", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch", f"cell_l{partition_level}")
            .parquet(out_dir)
        )

    return write_batch


def start_tiled_ingest(
    spark,
    source_dir: str,
    schema,
    out_dir: str,
    checkpoint_dir: str,
    partition_level: int = 5,
    available_now: bool = True,
    path_glob: str | None = None,
):
    """File-source streaming ingest: new files under ``source_dir`` are
    tiled and appended to ``out_dir`` partitioned by the coarse tiling
    column (the Iceberg partition key at design scale).

    Exactly-once: a blind parquet append would duplicate rows if the stream
    restarts after a batch wrote data but before the checkpoint commit.
    Each micro-batch instead lands under a deterministic
    ``ingest_batch=<batch_id>`` partition with DYNAMIC partition overwrite —
    a replayed batch re-derives the same batch_id from the checkpointed
    source offsets and overwrites only its own partitions, which is the
    idempotent-append contract Iceberg's MERGE gives natively."""
    reader = spark.readStream.schema(schema)
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob)
    stream = reader.parquet(source_dir)
    tiled = tile_stream(stream, levels=(partition_level,))
    write_batch = idempotent_batch_writer(out_dir, partition_level)

    writer = (
        tiled.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_tile_counts(
    stream: DataFrame,
    ts_col: str,
    key_expr,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    level: int = 5,
) -> DataFrame:
    """Event-time windowed per-tile counts with late-data watermark.

    ``key_expr`` is an integer column/expr geotagged via the exact-integer
    triplet (same derivation as the batch oracles).  Output one row per
    (window, tile).
    """
    from ..operators import tiling

    # watermarks require TIMESTAMP (with timezone); parquet NTZ is cast
    pts = stream.select(
        F.col(ts_col).cast("timestamp").alias("_ts"), *tiling.triplet_exprs(key_expr)
    )
    pts = tiling.with_cell_from_triplet(pts)
    return (
        pts.withWatermark("_ts", watermark)
        .groupBy(
            F.window("_ts", window_duration).alias("win"),
            s2f.parent_expr("cell", level).alias(f"cell_l{level}"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("win.start").alias("win_start"),
            f"cell_l{level}",
            "cnt",
        )
    )
