"""Streaming anomaly alerting over the readings stream — the push
counterpart of `operators/anomaly.py`'s pull query: instead of asking
"which hours were abnormal?" after the fact, every micro-batch updates
per-metric anomaly scores and a monitoring UI reads the alert store.

Incremental recompute, not full recompute: the trailing z-score of a
(metric, hour) bucket is a function of THAT metric's history alone, so
a micro-batch can only change scores for the metrics it touches. Each
batch therefore (1) appends its readings to the raw store, (2) rescores
ONLY the touched metrics over their own history, and (3) dynamic-
partition-overwrites just those metrics' partitions of the scored
store. Untouched metrics' partitions are never rewritten; per-batch
cost is proportional to the touched metrics' history, not the corpus.

The scored store keeps EVERY hourly bucket (with its is_anomaly flag),
not just the alerts: a touched metric always has ≥1 hourly row, so its
partition is always rewritten and a bucket whose new data UN-flags it
cannot leave a stale alert behind (an alerts-only store would — dynamic
overwrite deletes nothing for partitions absent from the write).
`read_alerts` filters the flag at read time.

Stream ≡ batch: after the stream drains, the scored store equals
`anomaly.metric_hour_anomaly` over the full raw data — pinned by
tests/test_alerts.py across multi-batch splits and un-flagging
sequences. Stateless foreachBatch (the corpus_gate.py pattern), and
replay-SAFE: the raw store is partitioned by batch id and each batch
OVERWRITES its own partition, so foreachBatch's at-least-once
redelivery after a mid-batch crash lands on the same path instead of
double-appending (which would corrupt every touched hour's average
unrecoverably — readings carry no key to dedup on read). Pinned by the
replay test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from explora_kafka_spark.operators.anomaly import (
    DEFAULT_MIN_PERIODS,
    DEFAULT_TRAIL,
    metric_hour_anomaly,
)


def alert_batch(
    readings: DataFrame,
    trail: int = DEFAULT_TRAIL,
    min_periods: int = DEFAULT_MIN_PERIODS,
    z_thresh: float = 3.0,
) -> DataFrame:
    """Batch twin: the anomaly rows (is_anomaly) of the scored series —
    what `read_alerts` returns after the stream drains."""
    return metric_hour_anomaly(
        readings, trail=trail, min_periods=min_periods, z_thresh=z_thresh
    ).filter(F.col("is_anomaly"))


def alert_stream(
    spark,
    reading_stream: DataFrame,
    store_path: str,
    scored_path: str,
    checkpoint: str,
    trail: int = DEFAULT_TRAIL,
    min_periods: int = DEFAULT_MIN_PERIODS,
    z_thresh: float = 3.0,
):
    """Start the alerting stream (availableNow; caller awaits). Input
    stream schema: (metric_id, ts, value) readings."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # IDEMPOTENT under foreachBatch's at-least-once replay: each
        # micro-batch lands in its own batch-id-deterministic partition
        # with mode=overwrite, so a crash between the raw write and the
        # checkpoint commit re-delivers the batch onto the SAME path
        # instead of appending duplicate readings (which would corrupt
        # every touched hour's average unrecoverably — readings carry
        # no key to dedup on read).
        batch_df.write.mode("overwrite").parquet(
            f"{store_path}/batch_id={batch_id}")
        touched = [
            r[0] for r in batch_df.select("metric_id").distinct().collect()
        ]
        hist = spark.read.parquet(store_path).filter(
            F.col("metric_id").isin(touched))
        scored = metric_hour_anomaly(
            hist, trail=trail, min_periods=min_periods, z_thresh=z_thresh)
        (
            scored.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("metric_id")
            .parquet(scored_path)
        )

    return (
        reading_stream.writeStream
        .foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_alerts(spark, scored_path: str) -> DataFrame:
    """Current alerts: the flagged buckets of the scored store."""
    return (
        spark.read.parquet(scored_path)
        .filter(F.col("is_anomaly"))
        .select("metric_id", "bucket_ms", "hourly_avg", "trail_n",
                "trail_mean", "trail_std", "z", "is_anomaly")
        .orderBy("metric_id", "bucket_ms")
    )
