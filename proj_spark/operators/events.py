"""Event-table operators: event-time windowed aggregation and gap-based
sessionization (the date/time + window-function rows of SURVEY §2.2,
exercised on data rather than lineage metadata).

Both are pure JVM plans: ``F.window`` tumbling buckets (one hash
aggregate with map-side partial combine) and lag/cumsum analytic
windows (one shuffle on the session key).  At 10^12 events the
sessionize shuffle partitions by user_id — AQE skew-join/salting apply
if single users dominate (the partitioning module's knobs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["windowed_event_stats", "sessionize"]


def _us(ts):
    """Epoch microseconds of a (possibly NTZ) timestamp column.
    Parquet TIMESTAMP loads as TIMESTAMP_NTZ; the cast interprets it in
    the session timezone, which this engine pins to UTC in its sessions
    (matching DuckDB's epoch_us of naive timestamps)."""
    return F.unix_micros(ts.cast("timestamp"))


def windowed_event_stats(df: DataFrame, window: str = "1 day",
                         ts_col: str = "ts") -> DataFrame:
    """Tumbling event-time windows per event_type: counts, value sums,
    and the mean of the ``k`` property extracted from the JSON props
    column.  Output: (day, event_type, n, sum_value, avg_k)."""
    k = F.regexp_extract(F.col("props"), r'"k":\s*(\d+)', 1).cast("int")
    return (
        df.withColumn("__w", F.window(F.col(ts_col), window))
        .groupBy(F.to_date(F.col("__w.start")).alias("day"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("sum_value"),
            F.avg(k).alias("avg_k"),
        )
    )


def sessionize(df: DataFrame, gap_minutes: int = 30,
               ts_col: str = "ts", user_col: str = "user_id") -> DataFrame:
    """Gap-based sessions: a new session starts when a user's
    inter-event gap exceeds ``gap_minutes``.  The classic two-window
    plan — lag to flag session starts, running sum to number them —
    shuffles once on the user key.  Output: one row per session
    (user_id, session_id, session_start, session_end, n_events)."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc())
    gap_us = gap_minutes * 60 * 1_000_000
    new_sess = (
        F.when(F.lag(ts_col).over(w).isNull(), F.lit(1))
        .when(
            _us(F.col(ts_col)) - _us(F.lag(ts_col).over(w))
            > gap_us,
            F.lit(1),
        )
        .otherwise(F.lit(0))
    )
    with_id = df.withColumn("__new", new_sess).withColumn(
        "session_id", F.sum("__new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    )
    return (
        with_id.groupBy(user_col, "session_id")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
