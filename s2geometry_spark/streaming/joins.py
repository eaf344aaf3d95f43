"""Stream-stream joins (§2.9): the watermarked time-interval join.

The canonical Structured Streaming join — two unbounded sources joined
on an equality key plus an event-time range, with watermarks bounding
the join state Spark must retain (right-side rows older than the
watermark minus the interval are evicted; see the Spark SS programming
guide's stream-stream join section).  This is the streaming twin of
``operators.temporal.interval_join``: same semantics, same output, so
the batch oracle doubles as a stream-vs-batch equivalence check.

At scale: state size ~ (events per user per window) x active users,
bounded by the watermark delay — the knob a 100-TB deployment tunes;
inner-join rows emit eagerly (no watermark wait), so latency is one
microbatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.temporal import (
    INTERVAL_LEFT_TYPE,
    INTERVAL_MINUTES_DEFAULT,
    INTERVAL_RIGHT_TYPE,
)


def streaming_interval_join(
    spark: SparkSession,
    sf_dir: str,
    left_type: str = INTERVAL_LEFT_TYPE,
    right_type: str = INTERVAL_RIGHT_TYPE,
    window_minutes: int = INTERVAL_MINUTES_DEFAULT,
) -> DataFrame:
    """Run the events parquet as TWO file streams (errors and clicks),
    stream-stream inner join on user + trailing window, availableNow
    into a memory sink; returns the sink table
    (left_id, right_id, user_id, delta_us) — the exact schema of the
    batch ``interval_join``."""
    import uuid

    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema

    def source() -> DataFrame:
        return (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )

    left = (
        source()
        .where(F.col("event_type") == left_type)
        .select(
            F.col("event_id").alias("left_id"),
            F.col("user_id").alias("l_user"),
            F.col("ts").cast("timestamp").alias("l_ts"),
        )
        .withWatermark("l_ts", "1 hour")
    )
    right = (
        source()
        .where(F.col("event_type") == right_type)
        .select(
            F.col("event_id").alias("right_id"),
            F.col("user_id").alias("r_user"),
            F.col("ts").cast("timestamp").alias("r_ts"),
        )
        .withWatermark("r_ts", "1 hour")
    )
    joined = left.join(
        right,
        F.expr(
            "l_user = r_user AND r_ts < l_ts "
            f"AND r_ts >= l_ts - INTERVAL {window_minutes} MINUTES"
        ),
        "inner",
    ).select(
        "left_id",
        "right_id",
        F.col("l_user").alias("user_id"),
        (F.unix_micros("l_ts") - F.unix_micros("r_ts")).alias("delta_us"),
    )
    name = "sij_" + uuid.uuid4().hex[:10]
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
