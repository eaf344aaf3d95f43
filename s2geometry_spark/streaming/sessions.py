"""Streaming sessionization (§2.9): native session windows.

The gap-based sessionizer as Structured Streaming's own
``session_window`` aggregation — Spark merges an event's [ts, ts+gap)
window into the session it overlaps, which equals the batch
``operators.sessions.sessionize`` gap rule whenever no inter-event gap
is EXACTLY the gap length (the one boundary where the two conventions
differ: the batch rule keeps delta == gap in-session, the window rule
splits; the events fixture has no exact-gap deltas at any SF, asserted
in tests/test_sessions_bm25.py).

Complete output mode into a memory sink: session state is emitted in
full every trigger, so an availableNow run of a finite file emits every
session without waiting for watermark finalization.  The 1-based
``session_seq`` is a presentation step — a batch row_number over the
finished sink, ordered by session start — so the output schema (and
the DuckDB oracle) is the batch sessionize's, verbatim: stream-vs-batch
equivalence is a driver-checked oracle row.

At scale: session-window state is per (user, open session) and merges
in the state store; complete mode is for the finite-run equivalence
check — a production deployment uses append/update with the watermark
bounding state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.sessions import GAP_MINUTES_DEFAULT


def streaming_sessionize(
    spark: SparkSession,
    sf_dir: str,
    gap_minutes: int = GAP_MINUTES_DEFAULT,
) -> DataFrame:
    """Run the events parquet as a file stream through a session_window
    aggregation; returns (user_id, session_seq, n_events, t_start_us,
    t_end_us, sum_value_cents) — the batch sessionize schema."""
    import uuid

    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    e = stream.select(
        "user_id",
        F.col("ts").cast("timestamp").alias("ts"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    agg = e.groupBy(
        "user_id",
        F.session_window("ts", f"{gap_minutes} minutes").alias("win"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_us").alias("t_start_us"),
        F.max("ts_us").alias("t_end_us"),
        F.sum("cents").alias("sum_value_cents"),
    )
    name = "ssz_" + uuid.uuid4().hex[:10]
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    sink = spark.table(name)
    w = Window.partitionBy("user_id").orderBy("t_start_us")
    return sink.select(
        "user_id",
        F.row_number().over(w).cast("long").alias("session_seq"),
        "n_events",
        "t_start_us",
        "t_end_us",
        "sum_value_cents",
    )
