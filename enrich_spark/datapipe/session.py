"""Sessionization — gap-based session assignment over an event stream.

The reference pipeline carries session identity from the tracker
(`domain_sessionidx` / client-set session cookies); server-side
sessionization of an event table is the batch-analytics counterpart a
training-data pipeline needs (ordering events into browse sessions for
sequence modeling, per-session quality stats, bot-run detection).

Spark shape: one window over (user, ts) — a single hash-partition
shuffle on the user key, then a running sum of session-boundary flags.
At 100 TB this is the canonical "sessionize" plan: the shuffle is
unavoidable (events for one user must meet), but it is ONE exchange,
partition-pruned by any pushed-down date filter, and AQE handles the
hot-user skew (a runaway crawler user becomes one oversized partition →
AQE splits are not possible for window functions, so extreme skew is
instead bounded upstream by the `max_events_per_user` cap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = ("event_id",),
    gap_seconds: int = 1800,
) -> DataFrame:
    """Assign per-user session indexes: a new session starts when the gap
    to the previous event exceeds ``gap_seconds``.

    Adds ``is_session_start`` (1/0) and ``session_index`` (1-based per
    user) columns. One shuffle on ``user_col``; everything else is a
    windowed projection.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, *order_cols)
    gap_us = F.unix_micros(F.col(ts_col)) - F.unix_micros(F.lag(ts_col).over(w))
    is_start = (gap_us.isNull() | (gap_us > gap_seconds * 1_000_000)).cast("long")
    out = df.withColumn("is_session_start", is_start)
    running = Window.partitionBy(user_col).orderBy(ts_col, *order_cols).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return out.withColumn("session_index", F.sum("is_session_start").over(running))


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = ("event_id",),
    gap_seconds: int = 1800,
) -> DataFrame:
    """Per-user session counts: (user, n_sessions, n_events). Reuses the
    sessionize window; the groupBy lands on the same partitioning as the
    window's exchange, so Spark does not re-shuffle."""
    s = sessionize(df, user_col, ts_col, order_cols, gap_seconds)
    return s.groupBy(user_col).agg(
        F.sum("is_session_start").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )
