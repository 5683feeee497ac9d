"""Stream-stream interval join: click → view attribution.

The reference engine has no cross-stream correlation (each Kafka topic
pipeline is independent; QueryingController.java serves single-stream
rollups). Real event analytics needs it constantly — "which impression
led to this click" — and it is the one major Structured Streaming
feature the engine had not yet exercised: a watermarked stream-stream
join with an event-time range condition.

Semantics (both flavors identical, pinned by test): every (click, view)
pair with the same ``user_id`` where the view happened within
``window_s`` seconds BEFORE the click (inclusive), one output row per
pair. Emitting all pairs (not "the latest view") is exactly what
Spark's append-mode stream-stream join produces incrementally — a
"latest view per click" pick is a one-window post-aggregation a batch
consumer adds on top (it is not append-expressible on an unbounded
stream).

100 TB design: the streaming join keys state by ``user_id`` hash across
executors; BOTH sides carry watermarks and the join condition bounds
the event-time range, so Spark evicts view-side state once the view is
older than (watermark + window) and click-side state at the watermark —
state is O(events inside the horizon), independent of stream length.
The batch twin shuffles once per side on ``user_id`` (an equi-join with
the range as residual predicate — never a cartesian).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.timeutil import ensure_event_time

#: attribution lookback: a view this many seconds before the click
#: (inclusive) can be credited
DEFAULT_WINDOW_S = 1800


def _sides(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    views = events.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user_id"),
        F.col("ts").alias("view_ts"),
    )
    return clicks, views


def _joined(clicks: DataFrame, views: DataFrame, window_s: int) -> DataFrame:
    cond = (
        (F.col("user_id") == F.col("v_user_id"))
        & (F.col("view_ts") <= F.col("click_ts"))
        & (
            F.col("view_ts")
            >= F.col("click_ts") - F.expr(f"INTERVAL {window_s} SECONDS")
        )
    )
    return clicks.join(views, cond).select(
        "click_id",
        "user_id",
        "click_ts",
        "view_id",
        "view_ts",
        # exact µs integers, then floor-divide: unix_timestamp would
        # floor each side separately and DuckDB's double epoch() rounds
        # on the BIGINT cast — both off by one on sub-second fractions
        (
            (F.unix_micros("click_ts") - F.unix_micros("view_ts"))
            / F.lit(1_000_000)
        ).cast("bigint").alias("lag_s"),
    )


def attribution_stream(
    events_stream: DataFrame,
    window_s: int = DEFAULT_WINDOW_S,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked stream-stream attribution join (append mode). Feed
    the raw event stream; the click/view split happens inside so both
    sides share one source."""
    events_stream = ensure_event_time(events_stream, "ts")
    clicks, views = _sides(events_stream)
    clicks = clicks.withWatermark("click_ts", watermark)
    views = views.withWatermark("view_ts", watermark)
    return _joined(clicks, views, window_s)


def attribution_batch(
    events: DataFrame, window_s: int = DEFAULT_WINDOW_S
) -> DataFrame:
    """Batch twin (backfill / oracle semantics) — same pairs, ordered."""
    clicks, views = _sides(ensure_event_time(events, "ts"))
    return _joined(clicks, views, window_s).orderBy(
        "click_id", "view_id"
    )


def attribution_sql(
    table: str = "events", window_s: int = DEFAULT_WINDOW_S
) -> str:
    """DuckDB mirror of :func:`attribution_batch`."""
    return f"""
        WITH clicks AS (
            SELECT event_id AS click_id, user_id, ts AS click_ts
            FROM {table} WHERE event_type = 'click'
        ),
        views AS (
            SELECT event_id AS view_id, user_id, ts AS view_ts
            FROM {table} WHERE event_type = 'view'
        )
        SELECT c.click_id, c.user_id, c.click_ts, v.view_id, v.view_ts,
               (epoch_us(c.click_ts) - epoch_us(v.view_ts)) // 1000000
                   AS lag_s
        FROM clicks c
        JOIN views v
          ON v.user_id = c.user_id
         AND v.view_ts <= c.click_ts
         AND v.view_ts >= c.click_ts - INTERVAL {window_s} SECONDS
        ORDER BY c.click_id, v.view_id
    """


def unattributed_batch(
    events: DataFrame, window_s: int = DEFAULT_WINDOW_S
) -> DataFrame:
    """Clicks with NO view by the same user inside the lookback — the
    "conversion without impression" data-quality audit (batch; the
    streaming left-outer flavor emits these after the watermark passes
    the click's window, same pair condition).

    Anti-join on the attribution condition: user_id equi-key, time
    range residual — one shuffle per side, never a cartesian.
    Output (ordered by click_id): click_id, user_id, click_ts.
    """
    clicks, views = _sides(ensure_event_time(events, "ts"))
    cond = (
        (F.col("user_id") == F.col("v_user_id"))
        & (F.col("view_ts") <= F.col("click_ts"))
        & (
            F.col("view_ts")
            >= F.col("click_ts") - F.expr(f"INTERVAL {window_s} SECONDS")
        )
    )
    return (
        clicks.join(views, cond, "left_anti")
        .select("click_id", "user_id", "click_ts")
        .orderBy("click_id")
    )


def unattributed_sql(
    table: str = "events", window_s: int = DEFAULT_WINDOW_S
) -> str:
    """DuckDB mirror of :func:`unattributed_batch`."""
    return f"""
        WITH clicks AS (
            SELECT event_id AS click_id, user_id, ts AS click_ts
            FROM {table} WHERE event_type = 'click'
        ),
        views AS (
            SELECT event_id AS view_id, user_id, ts AS view_ts
            FROM {table} WHERE event_type = 'view'
        )
        SELECT c.click_id, c.user_id, c.click_ts
        FROM clicks c
        WHERE NOT EXISTS (
            SELECT 1 FROM views v
            WHERE v.user_id = c.user_id
              AND v.view_ts <= c.click_ts
              AND v.view_ts >= c.click_ts - INTERVAL {window_s} SECONDS
        )
        ORDER BY c.click_id
    """
