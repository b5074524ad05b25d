"""Gap-based event sessionization (clickstream/session analytics).

The classic webtext-side companion to the event-time windows in
``streaming/ingest.py``: a session is a maximal run of one user's
events with no inter-event gap above the threshold. Implemented as
gaps-and-islands over integer microsecond epochs:

- gaps and durations use ``timestampdiff(MICROSECOND, ...)`` (Spark) /
  ``date_diff('microsecond', ...)`` (DuckDB): both operate natively on
  naive TIMESTAMP_NTZ values with no session-timezone conversion, so
  the differential oracle reproduces session boundaries exactly under
  ANY driver timezone (an epoch-based form would shift with the
  vanilla session's zone);
- ordering ties on (ts, event_id) so equal timestamps are deterministic
  across retries and engines;
- ONE shuffle total: the window partitions by user, and the follow-up
  per-(user, session) aggregate reuses that partitioning
  (HashPartitioning(user) satisfies ClusteredDistribution(user,
  session_idx)), which the plan test asserts.

Spark also offers ``F.session_window`` for the streaming/groupBy form;
this operator keeps the explicit formulation because the session INDEX
(first session = 1, monotone per user) is part of the output contract
and oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

GAP_SECONDS = 1800


def sessionize(events: DataFrame, key_col: str = "user_id",
               ts_col: str = "ts", order2_col: str = "event_id",
               gap_s: int = GAP_SECONDS) -> DataFrame:
    """Per-user sessions: (key, session_idx, session_start, session_end,
    n_events, duration_us, total_value_c) — the value sum is cents-exact
    integer (no float association drift across engines or partial-agg
    orders)."""
    w = Window.partitionBy(key_col).orderBy(ts_col, order2_col)
    run = Window.partitionBy(key_col).orderBy(ts_col, order2_col) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_us = gap_s * 1_000_000
    tagged = (
        events
        .withColumn("_prev", F.lag(ts_col).over(w))
        .withColumn(
            "_new",
            F.when(F.col("_prev").isNull(), 1)
            .when(F.expr(f"timestampdiff(MICROSECOND, _prev, {ts_col})")
                  > gap_us, 1)
            .otherwise(0))
        .withColumn("session_idx", F.sum("_new").over(run))
    )
    return (
        tagged.groupBy(key_col, "session_idx")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.expr(f"timestampdiff(MICROSECOND, min({ts_col}),"
                   f" max({ts_col}))").alias("duration_us"),
            F.sum(F.expr("cast(round(value * 100, 0) as bigint)"))
            .alias("total_value_c"),
        )
        .select(
            key_col,
            F.col("session_idx").cast("bigint").alias("session_idx"),
            "session_start", "session_end",
            F.col("n_events").cast("bigint").alias("n_events"),
            F.col("duration_us").cast("bigint").alias("duration_us"),
            F.col("total_value_c").cast("bigint").alias("total_value_c"),
        )
    )


def sql_sessionize(gap_s: int = GAP_SECONDS) -> str:
    """DuckDB mirror (identical boundary rule on epoch_us bigints)."""
    gap_us = gap_s * 1_000_000
    return f"""
WITH o AS (
  SELECT user_id, event_id, ts, value,
    CASE WHEN lag(ts) OVER w IS NULL THEN 1
         WHEN date_diff('microsecond', lag(ts) OVER w, ts) > {gap_us}
           THEN 1
         ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
  FROM o
)
SELECT user_id, cast(session_idx as bigint) AS session_idx,
  min(ts) AS session_start, max(ts) AS session_end,
  cast(count(*) as bigint) AS n_events,
  cast(date_diff('microsecond', min(ts), max(ts)) as bigint)
    AS duration_us,
  cast(sum(cast(round(value * 100, 0) as bigint)) as bigint)
    AS total_value_c
FROM s GROUP BY user_id, session_idx"""
