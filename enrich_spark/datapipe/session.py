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
    max_events_per_user: int | None = None,
) -> DataFrame:
    """Assign per-user session indexes: a new session starts when the gap
    to the previous event exceeds ``gap_seconds``.

    Adds ``is_session_start`` (1/0) and ``session_index`` (1-based per
    user) columns. One shuffle on ``user_col``; everything else is a
    windowed projection.

    ``max_events_per_user`` bounds hot-key skew: a runaway crawler user
    is truncated to its first N events (by time order) before session
    assignment. The cap filter reuses the same window partitioning, so
    it adds no extra shuffle.
    """
    if max_events_per_user is not None:
        wcap = Window.partitionBy(user_col).orderBy(ts_col, *order_cols)
        df = (
            df.withColumn("_rn", F.row_number().over(wcap))
            .where(F.col("_rn") <= max_events_per_user)
            .drop("_rn")
        )
    w = Window.partitionBy(user_col).orderBy(ts_col, *order_cols)
    gap_us = F.unix_micros(F.col(ts_col)) - F.unix_micros(F.lag(ts_col).over(w))
    is_start = (gap_us.isNull() | (gap_us > gap_seconds * 1_000_000)).cast("long")
    out = df.withColumn("is_session_start", is_start)
    running = Window.partitionBy(user_col).orderBy(ts_col, *order_cols).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return out.withColumn("session_index", F.sum("is_session_start").over(running))


def streaming_sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Stateful STREAMING sessionization via ``applyInPandasWithState``.

    Emits one row per CLOSED session ``(user, session_index,
    session_start, session_end, n_events)``. A session closes when a
    later event for the same user arrives past ``gap_seconds``, or when
    the event-time watermark passes the idle timeout (user went quiet).

    Scale shape: state is per-user-key and O(1) (four scalars), sharded
    by the same hash partitioning as the batch sessionize shuffle;
    late data beyond ``watermark`` is dropped by the watermark operator
    (documented at-most-once for stragglers, exactly the Structured
    Streaming contract). In-batch disorder is sorted inside the group;
    cross-batch disorder is bounded by the watermark.
    """
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = gap_seconds * 1_000_000
    out_schema = T.StructType([
        T.StructField("user", T.StringType()),
        T.StructField("session_index", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ])
    state_schema = T.StructType([
        T.StructField("last_us", T.LongType()),
        T.StructField("idx", T.LongType()),
        T.StructField("start_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ])

    def fn(key, pdfs, state):
        user = str(key[0])
        last_us, idx, start_us, n = (
            state.get if state.exists else (None, 0, None, 0)
        )
        closed: list[tuple] = []

        def us(v) -> int:
            return int(pd.Timestamp(v).value // 1000)

        ts_values: list[int] = []
        for pdf in pdfs:
            # NULL ts arrives as pandas NaT, which is `is not None` but
            # converts to the LONG_MIN sentinel — filter with notna.
            ts_values.extend(us(v) for v in pdf[ts_col] if pd.notna(v))
        for t in sorted(ts_values):
            if last_us is None:
                idx, start_us, n = idx + 1, t, 0
            elif t - last_us > gap_us:
                closed.append((user, idx, start_us, last_us, n))
                idx, start_us, n = idx + 1, t, 0
            else:
                # late-but-within-watermark event joining the open
                # session may precede its current start — widen both ends
                start_us = min(start_us, t)
            n += 1
            last_us = t if last_us is None else max(last_us, t)
        if state.hasTimedOut:
            if last_us is not None:
                closed.append((user, idx, start_us, last_us, n))
            state.remove()
        elif last_us is None:
            # all-NULL-ts batch for a fresh key: storing (None,…) state
            # would never get a timeout timestamp and could never be
            # removed — a permanent state leak. Drop it instead.
            if state.exists:
                state.remove()
        else:
            state.update((last_us, idx, start_us, n))
            state.setTimeoutTimestamp(last_us // 1000 + gap_seconds * 1000)
        if closed:
            yield pd.DataFrame(
                [(u, i, pd.Timestamp(s, unit="us"), pd.Timestamp(e, unit="us"), c)
                 for u, i, s, e, c in closed],
                columns=["user", "session_index", "session_start",
                         "session_end", "n_events"],
            )

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.col(user_col))
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


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
