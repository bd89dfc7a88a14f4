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

__all__ = ["windowed_event_stats", "sessionize", "asof_join"]


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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: tuple[str, ...] = (),
    tolerance_us: int | None = None,
) -> DataFrame:
    """Backward AS-OF join: for every left row, the LATEST right row
    with ``right_ts <= left_ts`` within the same ``by`` key (inclusive
    at equal timestamps) — the classic time-series enrichment join
    (trade->quote, event->last-checkpoint) the task brief names as a
    custom operator Spark lacks.

    Distributed shape: NOT a range join (no inequality-join explosion,
    no per-key collect).  Both sides union with a source marker, ONE
    window partitionBy(by) orderBy(ts, marker) carries the last
    non-null right payload forward (``last(..., ignorenulls=True)``),
    and left rows keep what they were carrying.  Cost = one shuffle on
    the by-key + a linear window pass — at 10^12 events the same AQE
    skew handling as sessionize applies.  Matched-right columns come
    back as ``<col>_right``; unmatched lefts keep them null.
    ``tolerance_us`` voids matches older than the tolerance (pandas
    merge_asof semantics).

    Ties inside the right side (same key, same ts) are resolved before
    the join by keeping the lexicographically-largest payload struct —
    deterministic and mirrored in the DuckDB oracle (q72).
    """
    payload_cols = [right_ts] + [c for c in right_cols if c != right_ts]
    # Right-side ties (same key, same ts) are resolved INSIDE the window
    # ordering: adding ``__p`` as the last sort key makes the running
    # ``last(__p, ignorenulls)`` pick the lexicographically-largest
    # payload struct of the latest timestamp — exactly what the old
    # pre-aggregation (groupBy(by, ts).max(struct)) selected, without
    # its extra Exchange + two Sorts (max of a struct is a sort
    # aggregate).  Left rows carry a NULL ``__p`` and are skipped by
    # ignorenulls, so their position within the tie group is irrelevant.
    r = right.select(
        F.col(by),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__m"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("__p"),
        *[F.lit(None).cast(f.dataType).alias(f"__l_{f.name}")
          for f in left.schema.fields],
    )
    l = left.select(
        F.col(by),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__m"),
        F.lit(None).cast(r.schema["__p"].dataType).alias("__p"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )
    w = (
        Window.partitionBy(by)
        .orderBy(F.col("__ts").asc(), F.col("__m").asc(), F.col("__p").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        l.unionByName(r.select(*l.columns))
        .withColumn("__match", F.last("__p", ignorenulls=True).over(w))
        .where(F.col("__m") == 1)
    )
    if tolerance_us is not None:
        too_old = (
            _us(F.col("__ts")) - _us(F.col(f"__match.{right_ts}"))
            > F.lit(int(tolerance_us))
        )
        carried = carried.withColumn(
            "__match", F.when(too_old, F.lit(None)).otherwise(F.col("__match")))
    out_cols = [F.col(f"__l_{c}").alias(c) for c in left.columns]
    out_cols += [
        F.col(f"__match.{c}").alias(f"{c}_right") for c in payload_cols
    ]
    return carried.select(*out_cols)


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
