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
