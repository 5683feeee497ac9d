"""Sessionization: gap-based session windows per user.

Two equivalent implementations:

- `batch_sessions`: gaps-and-islands over a static table — `lag(ts)`
  marks gap starts, a running sum numbers the islands, one groupBy
  collapses them. Fully SQL-expressible (the driver oracle runs the
  identical DuckDB query).

- `streaming_sessions`: the same semantics as a custom stateful
  streaming operator via `applyInPandasWithState` (the Spark-idiomatic
  escape hatch for operators Structured Streaming lacks). State = the
  open session per user; an event farther than `gap_ms` from the open
  session's end closes it (emits one row) and opens a new one. Idle
  sessions are FINALIZED by an event-time timeout: once the watermark
  passes `end + gap`, the session is emitted and evicted — state stays
  bounded and tail sessions are not held forever. Only sessions still
  open within `watermark + gap` of the stream's max event time remain
  in state at shutdown (no stream can prove those are over).

Scale: batch sessionization shuffles once on user_id (the window
partition) — at 100 TB this is the natural key-partitioned shuffle, with
AQE handling skewed users. Streaming state is one small row per active
user, bounded by the user cardinality, not the stream length.

No counterpart in the reference (its only stateful op is the running
aggregate, IngestStream.java:84-92); this extends the engine's streaming
surface per the task brief.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.timeutil import ensure_event_time

DEFAULT_GAP_MS = 30 * 60 * 1000

SESSION_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("session_start_ms", T.LongType()),
    T.StructField("session_end_ms", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("sum_value", T.DoubleType()),
])

_STATE_SCHEMA = T.StructType([
    T.StructField("start_ms", T.LongType()),
    T.StructField("end_ms", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("sum_value", T.DoubleType()),
])


def batch_sessions(events: DataFrame, gap_ms: int = DEFAULT_GAP_MS) -> DataFrame:
    """Sessions per user over a static events table (ts: timestamp,
    user_id, value). Output sorted by (user_id, session_start_ms)."""
    from pyspark.sql.window import Window

    events = ensure_event_time(events, "ts")
    w = Window.partitionBy("user_id").orderBy("ts")
    ms = F.unix_millis("ts")
    gap_start = (
        (ms - F.lag(ms).over(w) > gap_ms) | F.lag(ms).over(w).isNull()
    ).cast("long")
    return (
        events.withColumn("_new", gap_start)
        .withColumn("_sess", F.sum("_new").over(w))
        .groupBy("user_id", "_sess")
        .agg(
            F.min(ms).alias("session_start_ms"),
            F.max(ms).alias("session_end_ms"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .drop("_sess")
        .select("user_id", "session_start_ms", "session_end_ms",
                "n_events", "sum_value")
        .orderBy("user_id", "session_start_ms")
    )


def sessions_sql(table: str = "events", gap_ms: int = DEFAULT_GAP_MS) -> str:
    """DuckDB oracle mirroring batch_sessions exactly."""
    return f"""
        WITH e AS (
            SELECT user_id, epoch_ms(ts) AS ms, value,
                   CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > {gap_ms}
                             OR lag(epoch_ms(ts)) OVER w IS NULL
                        THEN 1 ELSE 0 END AS _new
            FROM {table}
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        s AS (
            SELECT *, sum(_new) OVER (
                PARTITION BY user_id ORDER BY ms
                ROWS UNBOUNDED PRECEDING
            ) AS _sess
            FROM e
        )
        SELECT user_id, min(ms) AS session_start_ms, max(ms) AS session_end_ms,
               count(*) AS n_events, round(sum(value), 6) AS sum_value
        FROM s GROUP BY user_id, _sess
        ORDER BY user_id, session_start_ms
    """


def streaming_sessions(
    events_stream: DataFrame,
    gap_ms: int = DEFAULT_GAP_MS,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Custom stateful operator: emits a session row whenever a later
    event closes it (event-time gap), and FINALIZES idle sessions via an
    event-time timeout — once the watermark passes `session_end + gap`,
    no in-watermark event can extend the session, so it is emitted and
    its state removed (bounded state; the tail session per user is not
    held forever). Requires per-user event-time order across
    micro-batches (true for replayed/ordered sources; an out-of-order
    production stream would buffer within the state).

    `watermark` is the allowed out-of-orderness; it delays finalization
    by the same horizon. Sessions still open within `watermark + gap` of
    the stream's max event time remain in state (no stream can prove
    they are over)."""

    _cols = ["user_id", "session_start_ms", "session_end_ms",
             "n_events", "sum_value"]

    def _fn(
        key: Any,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            # watermark passed end+gap: the session can no longer grow
            start, end, n, sv = state.get
            state.remove()
            yield pd.DataFrame(
                [(user_id, start, end, n, round(sv, 6))], columns=_cols
            )
            return
        if state.exists:
            start, end, n, sv = state.get
        else:
            start = end = None
            n, sv = 0, 0.0
        closed: list[tuple] = []
        for pdf in pdfs:
            pdf = pdf.sort_values("ts")
            for ts, value in zip(pdf["ts"], pdf["value"]):
                ms = int(pd.Timestamp(ts).value // 1_000_000)
                if start is None:
                    start, end, n, sv = ms, ms, 1, float(value)
                elif ms - end > gap_ms:
                    closed.append((user_id, start, end, n, round(sv, 6)))
                    start, end, n, sv = ms, ms, 1, float(value)
                else:
                    end = ms
                    n += 1
                    sv += float(value)
        state.update((start, end, n, sv))
        # finalize when the watermark proves no event can extend the
        # session (strictly-greater semantics → +1 so exactly end+gap
        # does not fire early)
        state.setTimeoutTimestamp(end + gap_ms + 1)
        if closed:
            yield pd.DataFrame(closed, columns=_cols)

    events_stream = ensure_event_time(events_stream, "ts")
    return events_stream.withWatermark("ts", watermark).groupBy(
        "user_id"
    ).applyInPandasWithState(
        _fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def session_stats(events: DataFrame, gap_ms: int = DEFAULT_GAP_MS) -> DataFrame:
    """One-row SESSION HEALTH report over `batch_sessions`: the
    engagement summary a product dashboard reads next to the funnels —
    session count, single-event (bounce) share, and exact duration /
    events-per-session quantiles. All quantiles are the same
    interpolated definition both engines share (the
    metric_day_percentiles discipline).

    Output: n_sessions, n_users, bounce_ppm (exact integer div),
    p50_duration_s, p95_duration_s, p50_events, avg_events (6 dp).

    100 TB: the sessionization shuffle is batch_sessions' own; the
    report is ONE global aggregate over the session-count-sized table
    (sessions ≪ events), partial-agg absorbed."""
    s = batch_sessions(events, gap_ms).select(
        "user_id", "n_events",
        ((F.col("session_end_ms") - F.col("session_start_ms")) / 1000.0)
        .alias("dur_s"),
    )
    return s.agg(
        F.count("*").alias("n_sessions"),
        F.countDistinct("user_id").alias("n_users"),
        F.expr("(1000000 * count_if(n_events = 1)) div count(*)")
        .alias("bounce_ppm"),
        F.round(F.expr("percentile(dur_s, 0.5)"), 6)
        .alias("p50_duration_s"),
        F.round(F.expr("percentile(dur_s, 0.95)"), 6)
        .alias("p95_duration_s"),
        F.round(F.expr("percentile(CAST(n_events AS DOUBLE), 0.5)"), 6)
        .alias("p50_events"),
        F.round(F.avg("n_events"), 6).alias("avg_events"),
    )


def session_stats_sql(table: str = "events",
                      gap_ms: int = DEFAULT_GAP_MS) -> str:
    """DuckDB mirror of `session_stats` (quantile_cont ≙ percentile)."""
    return f"""
        WITH sess AS ({sessions_sql(table, gap_ms)})
        SELECT count(*) AS n_sessions,
               count(DISTINCT user_id) AS n_users,
               (1000000 * count(*) FILTER (n_events = 1)) // count(*)
                   AS bounce_ppm,
               round(quantile_cont((session_end_ms - session_start_ms)
                                   / 1000.0, 0.5), 6) AS p50_duration_s,
               round(quantile_cont((session_end_ms - session_start_ms)
                                   / 1000.0, 0.95), 6) AS p95_duration_s,
               round(quantile_cont(CAST(n_events AS DOUBLE), 0.5), 6)
                   AS p50_events,
               round(avg(n_events), 6) AS avg_events
        FROM sess
    """
