"""Temporal joins over the events table: as-of join and interval join.

The builder brief names these as the canonical "operator Spark lacks"
custom ops (as-of join / range join).  Neither exists in the reference
(an in-memory geometry library); they are the time-axis twins of the
repo's spatial tolerant joins, built the same Spark-first way:

* **as-of join** — each LEFT event matched to the most recent RIGHT
  event of the same user at-or-before its timestamp.  NOT a join at
  all in the physical plan: union-tag the two sides, ONE shuffle on
  ``user_id``, and carry the right side's columns forward with
  ``last_value(ignoreNulls)`` over the interleaved time order.  This
  is the scale shape — a naive range join is O(n·m) per user and a
  broadcast is impossible at 100 TB, while the union-window is linear
  in the partition and skew-bounded by the busiest user.
* **interval join** — all (error, click) pairs of the same user with
  the click inside a trailing attribution window.  Time-bucket both
  sides by the window width, explode the error side into its two
  candidate buckets, equi-join on (user_id, bucket), filter the exact
  interval.  Bounded 2x duplication of the smaller side, no range-join
  fallback to BroadcastNestedLoop, fan-out capped by window width.

Determinism contract: timestamps travel as epoch MICROSECONDS
(bigint); within a user, ties on ``ts`` break by (side, event_id) —
the as-of match among equal-timestamp RIGHT rows is the max
``event_id``, which the DuckDB oracle replays by deduping the right
side per (user_id, ts_us) before its native ASOF JOIN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ASOF_LEFT_TYPE = "click"
ASOF_RIGHT_TYPE = "view"
INTERVAL_LEFT_TYPE = "error"
INTERVAL_RIGHT_TYPE = "click"
INTERVAL_MINUTES_DEFAULT = 30


def _events_us(events: DataFrame) -> DataFrame:
    # parquet ts is TIMESTAMP_NTZ; session tz is pinned UTC, so this is
    # the same integer DuckDB's epoch_us(ts) yields on the naive value
    return events.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "event_type",
    )


def asof_join(
    events: DataFrame,
    left_type: str = ASOF_LEFT_TYPE,
    right_type: str = ASOF_RIGHT_TYPE,
) -> DataFrame:
    """(event_id, user_id, ts_us, match_id, match_ts_us, lag_us): each
    ``left_type`` event with the latest ``right_type`` event of the same
    user at-or-before it (NULL match when none precedes it).

    Physical plan: union the two sides with a ``side`` tag (right=0,
    left=1), window over (user_id) ordered by (ts_us, side, event_id),
    ``last_value`` with ignoreNulls carries the most recent right row
    into every left row.  Equal-timestamp semantics: a right event AT
    the left timestamp matches (side 0 sorts first), and among several
    the largest event_id wins (last in event_id order).
    """
    e = _events_us(events)
    right = e.where(F.col("event_type") == right_type).select(
        "user_id",
        "ts_us",
        F.lit(0).alias("side"),
        "event_id",
        F.col("event_id").alias("r_id"),
        F.col("ts_us").alias("r_ts"),
    )
    left = e.where(F.col("event_type") == left_type).select(
        "user_id",
        "ts_us",
        F.lit(1).alias("side"),
        "event_id",
        F.lit(None).cast("long").alias("r_id"),
        F.lit(None).cast("long").alias("r_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = right.unionByName(left)
    return (
        u.withColumn("match_id", F.last("r_id", ignorenulls=True).over(w))
        .withColumn("match_ts_us", F.last("r_ts", ignorenulls=True).over(w))
        .where(F.col("side") == 1)
        .select(
            "event_id",
            "user_id",
            "ts_us",
            "match_id",
            "match_ts_us",
            (F.col("ts_us") - F.col("match_ts_us")).alias("lag_us"),
        )
    )


def asof_join_oracle_sql(
    left_type: str = ASOF_LEFT_TYPE, right_type: str = ASOF_RIGHT_TYPE
) -> str:
    """DuckDB's native ASOF LEFT JOIN — an independent implementation of
    the same semantics (not a window replay).  The right side is deduped
    to one row per (user_id, ts_us) keeping the max event_id, which is
    exactly the engine's (side, event_id) tie-break."""
    return f"""
WITH e AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type FROM events
),
r AS (
  SELECT user_id, ts_us, event_id,
         row_number() OVER (PARTITION BY user_id, ts_us
                            ORDER BY event_id DESC) AS rn
  FROM e WHERE event_type = '{right_type}'
),
r1 AS (SELECT user_id, ts_us, event_id FROM r WHERE rn = 1),
l AS (SELECT event_id, user_id, ts_us FROM e WHERE event_type = '{left_type}')
SELECT l.event_id, l.user_id, l.ts_us,
       r1.event_id AS match_id, r1.ts_us AS match_ts_us,
       l.ts_us - r1.ts_us AS lag_us
FROM l ASOF LEFT JOIN r1
  ON l.user_id = r1.user_id AND l.ts_us >= r1.ts_us
"""


def interval_join(
    events: DataFrame,
    left_type: str = INTERVAL_LEFT_TYPE,
    right_type: str = INTERVAL_RIGHT_TYPE,
    window_minutes: int = INTERVAL_MINUTES_DEFAULT,
) -> DataFrame:
    """(left_id, right_id, user_id, delta_us): every ``right_type``
    event strictly before a same-user ``left_type`` event and within a
    trailing ``window_minutes`` window of it (0 < delta_us <= W).

    Scale shape: bucket both sides by ``floor(ts_us / W)``; a right row
    inside the window of a left row in bucket b can only live in bucket
    b or b-1, so exploding the LEFT side into those two bucket keys
    turns the range predicate into an equi-join on (user_id, bucket)
    plus a cheap residual filter.  Never a cartesian/range join.
    """
    w_us = window_minutes * 60 * 1_000_000
    e = _events_us(events)
    left = (
        e.where(F.col("event_type") == left_type)
        .select(
            F.col("event_id").alias("left_id"),
            "user_id",
            F.col("ts_us").alias("l_ts"),
        )
        .withColumn(
            "bucket",
            F.explode(
                F.array(
                    (F.floor(F.col("l_ts") / w_us) - 1).cast("long"),
                    F.floor(F.col("l_ts") / w_us).cast("long"),
                )
            ),
        )
    )
    right = e.where(F.col("event_type") == right_type).select(
        F.col("event_id").alias("right_id"),
        "user_id",
        F.col("ts_us").alias("r_ts"),
        F.floor(F.col("ts_us") / w_us).cast("long").alias("bucket"),
    )
    return (
        left.join(right, ["user_id", "bucket"])
        .where(
            (F.col("r_ts") < F.col("l_ts"))
            & (F.col("r_ts") >= F.col("l_ts") - F.lit(w_us))
        )
        .select(
            "left_id",
            "right_id",
            "user_id",
            (F.col("l_ts") - F.col("r_ts")).alias("delta_us"),
        )
    )


def interval_join_oracle_sql(
    left_type: str = INTERVAL_LEFT_TYPE,
    right_type: str = INTERVAL_RIGHT_TYPE,
    window_minutes: int = INTERVAL_MINUTES_DEFAULT,
) -> str:
    """Plain BETWEEN range join — independent of the bucketed plan."""
    w_us = window_minutes * 60 * 1_000_000
    return f"""
WITH e AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type FROM events
)
SELECT l.event_id AS left_id, r.event_id AS right_id, l.user_id,
       l.ts_us - r.ts_us AS delta_us
FROM e l JOIN e r
  ON l.user_id = r.user_id
 AND l.event_type = '{left_type}' AND r.event_type = '{right_type}'
 AND r.ts_us < l.ts_us AND r.ts_us >= l.ts_us - {w_us}
"""
