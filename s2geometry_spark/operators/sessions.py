"""Gap-based sessionization of the events table.

The batch twin of the streaming module's stateful operators: split each
user's event stream into sessions wherever the inter-event gap exceeds
``gap`` (the classic 30-minute web-session rule), and aggregate per
session.  Pure window + hash aggregation — two shuffles total, both on
``user_id`` (the window partition doubles as the group key prefix, so
AQE coalesces them), no UDFs anywhere.

Determinism contract: events order by (ts, event_id) within a user
(event_id breaks timestamp ties); timestamps travel as epoch
MICROSECONDS (bigint) and the value sum as exact integer CENTS, so the
DuckDB oracle (sessionize_oracle_sql — the identical window pipeline)
matches bit-for-bit with no float-fold-order hazard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

GAP_MINUTES_DEFAULT = 30


def sessionize(events: DataFrame, gap_minutes: int = GAP_MINUTES_DEFAULT) -> DataFrame:
    """(user_id, session_seq, n_events, t_start_us, t_end_us,
    sum_value_cents): gap-based sessions per user.

    session_seq is the 1-based session index within the user (ordered
    by time), so ids are deterministic and compact.
    """
    # the parquet column is TIMESTAMP_NTZ; the cast interprets it in the
    # session timezone, which the session factory pins to UTC — matching
    # DuckDB's epoch_us() on the naive value (integer micros, no float)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gap_us = gap_minutes * 60 * 1000000
    e = (
        events.select(
            "user_id",
            "event_id",
            us.alias("ts_us"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .withColumn("prev_us", F.lag("ts_us").over(w))
        .withColumn(
            "new_session",
            (
                F.col("prev_us").isNull()
                | (F.col("ts_us") - F.col("prev_us") > F.lit(gap_us))
            ).cast("long"),
        )
        .withColumn("session_seq", F.sum("new_session").over(w))
    )
    return e.groupBy("user_id", "session_seq").agg(
        F.count("*").alias("n_events"),
        F.min("ts_us").alias("t_start_us"),
        F.max("ts_us").alias("t_end_us"),
        F.sum("cents").alias("sum_value_cents"),
    )


def sessionize_oracle_sql(gap_minutes: int = GAP_MINUTES_DEFAULT) -> str:
    """DuckDB replay of the identical window pipeline over ``events``."""
    gap_us = gap_minutes * 60 * 1000000
    return f"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
flagged AS (
  SELECT *,
    CASE WHEN lag(ts_us) OVER w IS NULL
           OR ts_us - lag(ts_us) OVER w > {gap_us}
         THEN 1 ELSE 0 END AS new_session
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
sess AS (
  SELECT *, sum(new_session)
           OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                 ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM flagged
)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       count(*) AS n_events,
       min(ts_us) AS t_start_us, max(ts_us) AS t_end_us,
       CAST(sum(cents) AS BIGINT) AS sum_value_cents
FROM sess GROUP BY 1, 2
"""
