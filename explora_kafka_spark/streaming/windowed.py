"""Watermarked windowed aggregation — the idiomatic Structured
Streaming flavor of the base view.

The engine's primary ingestion is the foreachBatch delta-MERGE
(pipeline.py), chosen because the reference admits unboundedly-late
updates (SURVEY §2.7). This module is the OTHER side of that trade:
in-query tumbling-window state with a watermark, which bounds state and
lets Spark emit finalized windows (append mode) — the right choice when
late data past a horizon may be dropped and downstream consumers want
closed windows exactly once.

State cost: one row per (metric, cell, open window) — bounded by the
watermark horizon, independent of stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.timeutil import ensure_event_time


def windowed_base_view(
    readings_stream: DataFrame,
    precision: int = 6,
    window: str = "1 hour",
    watermark: str = "1 day",
) -> DataFrame:
    """Tumbling-window count/sum per (metric, cell): append-mode-ready
    (windows finalize once the watermark passes their end; records later
    than `watermark` are dropped — documented divergence from the
    reference's unbounded-late upserts, which pipeline.py preserves)."""
    readings_stream = ensure_event_time(readings_stream, "ts")
    return (
        readings_stream.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", window).alias("w"),
            F.col("metric_id"),
            F.substring("geohash", 1, precision).alias("gh"),
        )
        .agg(F.count("*").alias("count"), F.sum("value").alias("sum"))
        .select(
            "metric_id", "gh",
            F.col("w.start").alias("ts"),
            "count", "sum",
        )
    )


def stream_progress_metrics(query) -> dict:
    """Operational counters from a drained StreamingQuery's progress
    history — the late-data observability a streaming SLA monitors:
    micro-batches executed, input rows, and rows DROPPED by the
    watermark (windowed_base_view's documented divergence from the
    reference's unbounded-late upserts is thereby measurable, not
    silent). Works on any streaming query with stateful operators."""
    batches = 0
    input_rows = 0
    dropped = 0
    for p in query.recentProgress:
        batches += 1
        input_rows += int(p.get("numInputRows") or 0)
        for so in p.get("stateOperators") or []:
            dropped += int(so.get("numRowsDroppedByWatermark") or 0)
    # recentProgress is a ring buffer (spark.sql.streaming.
    # numRecentProgressUpdates, default 100): a drain with more
    # micro-batches than that silently loses the head. Flag it so the
    # counters are never mistaken for totals; raise the conf (or
    # consume a StreamingQueryListener) for long drains.
    try:
        cap = int(query.sparkSession.conf.get(
            "spark.sql.streaming.numRecentProgressUpdates"))
    except Exception:  # noqa: BLE001 — conf unavailable on some stubs
        cap = 100
    return {
        "n_batches": batches,
        "input_rows": input_rows,
        "rows_dropped_by_watermark": dropped,
        "truncated": batches >= cap,
    }
