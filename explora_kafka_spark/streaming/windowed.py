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


def item_window_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling-window counts per item (``props.k``) — the shared core
    of batch and streaming trending: identical code builds both plans
    (`F.window` works in either mode), the stream adds a watermark so
    append mode emits exactly the finalized windows. One (window, item)
    partial-agg shuffle; state one row per open (window, item)."""
    # defensive NTZ cast: parquet readers yield TIMESTAMP_NTZ, which
    # unix_millis/window reject (the ingestion-cast precedent)
    ev = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if watermark is not None:
        ev = ensure_event_time(ev, "ts").withWatermark("ts", watermark)
    return (
        ev.select(
            "ts",
            F.get_json_object("props", "$.k").cast("int").alias("item"),
        )
        .filter(F.col("item").isNotNull())
        .groupBy(F.window("ts", window).alias("w"), "item")
        .agg(F.count("*").alias("n"))
        .select(F.unix_millis(F.col("w.start")).alias("bucket_ms"),
                "item", "n")
    )


def rank_trending(counts: DataFrame, top: int = 5) -> DataFrame:
    """Read-time top-`top` per window over (finalized) item counts —
    ranking is applied at query time because a top-k can't be emitted
    incrementally in append mode (rows would need retraction when a
    later count displaces an earlier one). Deterministic ties:
    (n desc, item asc)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("bucket_ms").orderBy(
        F.col("n").desc(), F.col("item").asc())
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top)
        .orderBy("bucket_ms", "rank")
    )


def trending_items(
    events: DataFrame,
    window: str = "1 hour",
    top: int = 5,
) -> DataFrame:
    """Batch twin of the streaming trending dashboard: top-`top` items
    per tumbling window by event count. Output: (bucket_ms, item, n,
    rank). The streaming flavor is `item_window_counts(stream,
    watermark=...)` + `rank_trending` at read — stream ≡ batch pinned
    in tests/test_streaming.py. 100 TB: one (window, item) partial-agg
    shuffle + a per-window WindowGroupLimit top-k over the counts
    table (items × windows rows, never events)."""
    return rank_trending(item_window_counts(events, window), top)


def trending_items_sql(table: str = "events", top: int = 5) -> str:
    """DuckDB mirror of `trending_items` at window='1 hour'."""
    return f"""
        WITH c AS (
            SELECT epoch_ms(date_trunc('hour', ts)) AS bucket_ms,
                   CAST(json_extract_string(props, '$.k') AS INTEGER)
                       AS item,
                   count(*) AS n
            FROM {table}
            WHERE json_extract_string(props, '$.k') IS NOT NULL
            GROUP BY 1, 2
        )
        SELECT bucket_ms, item, n, rank FROM (
            SELECT *, row_number() OVER (
                PARTITION BY bucket_ms ORDER BY n DESC, item ASC
            ) AS rank FROM c
        ) WHERE rank <= {top}
        ORDER BY bucket_ms, rank
    """


def hopping_base_view(
    readings_stream: DataFrame,
    precision: int = 6,
    window: str = "2 hours",
    slide: str = "1 hour",
    watermark: str = "1 day",
) -> DataFrame:
    """HOPPING (sliding) window count/sum per (metric, cell): the
    overlapping-window twin of `windowed_base_view` — each event lands
    in window/slide windows (starts aligned to slide multiples), the
    shape behind smoothed dashboards and trailing-window SLOs that a
    tumbling grid can't express. Append-mode-ready under the same
    watermark-finalization semantics.

    State cost: window/slide × the tumbling state (one row per
    (metric, cell, OPEN window), windows overlap by construction) —
    still bounded by the watermark horizon, independent of stream
    length. The aggregation itself is the same partial-agg shuffle;
    Spark expands each event to its covering windows before the
    combine, so the shuffle volume is ×(window/slide)."""
    readings_stream = ensure_event_time(readings_stream, "ts")
    return (
        readings_stream.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", window, slide).alias("w"),
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


def session_view(
    events_stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 day",
) -> DataFrame:
    """NATIVE session windows per user (`F.session_window`): the third
    window shape next to tumbling (`windowed_base_view`) and hopping
    (`hopping_base_view`) — Spark merges per-user event-time windows
    that overlap within `gap` into one dynamic session and finalizes it
    once the watermark passes its end. Semantically the
    streaming/sessions.py gap sessionizer (same gap rule, same
    finalization), expressed with the built-in operator instead of
    applyInPandasWithState — zero Python in the state path, so this is
    the preferred form when per-event custom state logic isn't needed.

    Output per finalized session: user_id, session start/end, n_events,
    sum_value. State: one row per OPEN (user, session) window, merged
    by the engine, watermark-bounded — identical cost shape to the
    custom operator, minus the Python worker round-trip.

    Batch twin: the same code runs on a static DataFrame (session_window
    works in batch), which is what the oracle checks."""
    events_stream = ensure_event_time(events_stream, "ts")
    if events_stream.isStreaming:
        events_stream = events_stream.withWatermark("ts", watermark)
    return (
        events_stream
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"),
             F.sum("value").alias("sum_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events", "sum_value",
        )
    )


def enriched_segment_view(
    events_stream: DataFrame,
    customers: DataFrame,
    window: str = "1 hour",
    watermark: str = "1 day",
) -> DataFrame:
    """STREAM-STATIC enrichment join + windowed rollup: each micro-batch
    of the event stream broadcast-joins the STATIC customer dimension
    (Spark re-evaluates the static side per micro-batch — the standard
    slowly-refreshed-dimension serving pattern; a dim update is picked
    up at the next trigger with no restart), then aggregates value per
    (market segment, tumbling window) under the usual watermark
    finalization. The one streaming join shape the engine didn't yet
    showcase explicitly (stream-stream interval join: streaming/
    joins.py; stream-static semi-joins: the admission gates).

    State cost: the join itself is STATELESS (static side is a
    broadcast lookup); only the windowed aggregate holds state — one
    row per (segment, open window), watermark-bounded."""
    ev = ensure_event_time(events_stream, "ts")
    dim = customers.select(F.col("c_custkey"), F.col("c_mktsegment"))
    joined = ev.join(F.broadcast(dim),
                     ev.user_id == dim.c_custkey)
    if joined.isStreaming:
        joined = joined.withWatermark("ts", watermark)
    return (
        joined.groupBy(F.window("ts", window).alias("w"),
                       F.col("c_mktsegment"))
        .agg(F.count("*").alias("n_events"),
             F.sum("value").alias("sum_value"))
        .select(F.col("c_mktsegment").alias("segment"),
                F.col("w.start").alias("ts"),
                "n_events", "sum_value")
    )
