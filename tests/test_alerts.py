"""Streaming anomaly alerting (streaming/alerts.py): stream ≡ batch,
incremental per-metric rescoring, stale-alert clearing."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from explora_kafka_spark.streaming import alerts as AL


def _hour(i):
    return dt.datetime(2024, 1, 1) + dt.timedelta(hours=i)


def _readings(spark, rows):
    return spark.createDataFrame(
        rows, "metric_id: string, ts: timestamp, value: double")


def _run_stream(spark, tmp_path, batches, **kw):
    for b in batches:
        _readings(spark, b).coalesce(1).write.mode("append").parquet(
            str(tmp_path / "in"))
    schema = spark.read.parquet(str(tmp_path / "in")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "in"))
    )
    q = AL.alert_stream(
        spark, stream, str(tmp_path / "store"), str(tmp_path / "scored"),
        str(tmp_path / "ckpt"), **kw)
    q.awaitTermination(300)


def _scored_rows(spark, tmp_path):
    cols = ["metric_id", "bucket_ms", "hourly_avg", "trail_n",
            "trail_mean", "trail_std", "z", "is_anomaly"]
    return sorted(
        tuple(r) for r in spark.read.parquet(str(tmp_path / "scored"))
        .select(*cols).collect())


def test_stream_equals_batch_across_micro_batches(spark, tmp_path):
    """Two metrics split across two micro-batches: the scored store
    after the drain equals the one-shot batch computation."""
    b1 = [("a", _hour(i), 10.0 + (i % 2)) for i in range(20)] + \
         [("b", _hour(i), 5.0) for i in range(10)]
    b2 = [("a", _hour(20 + i), 10.0 + (i % 2)) for i in range(10)] + \
         [("a", _hour(30), 99.0)]
    _run_stream(spark, tmp_path, [b1, b2],
                trail=24, min_periods=12, z_thresh=3.0)
    want = sorted(
        tuple(r) for r in AL.metric_hour_anomaly(
            _readings(spark, b1 + b2), trail=24, min_periods=12,
            z_thresh=3.0).collect())
    assert _scored_rows(spark, tmp_path) == want
    alerts = AL.read_alerts(spark, str(tmp_path / "scored")).collect()
    assert [r["hourly_avg"] for r in alerts] == [99.0]


def test_later_batch_unflags_stale_alert(spark, tmp_path):
    """Batch 1 flags hour 30 of metric a (single 99.0 reading); batch 2
    adds calm readings in the SAME hour, pulling the hourly average back
    to baseline — the rewrite of metric a's partition must clear the
    alert (the scored-store-not-alert-store design)."""
    calm = [("a", _hour(i), 10.0 + (i % 2)) for i in range(30)]
    b1 = calm + [("a", _hour(30), 99.0)]
    # 50 calm readings inside hour 30 pull its average to
    # (99 + 50*10)/51 ≈ 11.7, inside the ~10.5 ± 3σ band
    b2 = [("a", _hour(30).replace(minute=m), 10.0) for m in range(10, 60)]
    _run_stream(spark, tmp_path, [b1, b2],
                trail=24, min_periods=12, z_thresh=3.0)
    want = sorted(
        tuple(r) for r in AL.metric_hour_anomaly(
            _readings(spark, b1 + b2), trail=24, min_periods=12,
            z_thresh=3.0).collect())
    assert _scored_rows(spark, tmp_path) == want
    assert AL.read_alerts(spark, str(tmp_path / "scored")).collect() == []


def test_untouched_metric_partition_not_rewritten(spark, tmp_path):
    """Batch 2 touches only metric a; metric b's scored partition files
    keep their batch-1 mtimes (the incremental-cost claim)."""
    import glob
    import os

    b1 = [("a", _hour(i), 1.0) for i in range(5)] + \
         [("b", _hour(i), 2.0) for i in range(5)]
    b2 = [("a", _hour(5 + i), 1.0) for i in range(5)]
    for b in [b1]:
        _readings(spark, b).coalesce(1).write.mode("append").parquet(
            str(tmp_path / "in"))
    schema = spark.read.parquet(str(tmp_path / "in")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "in"))
    )
    q = AL.alert_stream(
        spark, stream, str(tmp_path / "store"), str(tmp_path / "scored"),
        str(tmp_path / "ckpt"))
    q.awaitTermination(300)
    b_files = {
        p: os.path.getmtime(p) for p in glob.glob(
            str(tmp_path / "scored" / "metric_id=b" / "*.parquet"))}
    assert b_files

    _readings(spark, b2).coalesce(1).write.mode("append").parquet(
        str(tmp_path / "in"))
    stream2 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "in"))
    )
    q2 = AL.alert_stream(
        spark, stream2, str(tmp_path / "store"), str(tmp_path / "scored"),
        str(tmp_path / "ckpt"))
    q2.awaitTermination(300)
    for p, mt in b_files.items():
        assert os.path.getmtime(p) == mt, "metric b partition rewritten"


def test_raw_store_batch_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-delivering a batch id must
    land on the same raw-store path (overwrite), never double-append —
    a replayed batch would otherwise corrupt every touched hour's
    average unrecoverably."""
    b = _readings(spark, [("a", _hour(0), 10.0), ("a", _hour(1), 12.0)])
    store = str(tmp_path / "store")
    # simulate the redelivery directly against the batch writer path
    b.write.mode("overwrite").parquet(f"{store}/batch_id=7")
    b.write.mode("overwrite").parquet(f"{store}/batch_id=7")  # replay
    back = spark.read.parquet(store)
    assert back.count() == 2
    # and a stream run produces per-batch partitions
    _run_stream(spark, tmp_path / "s2",
                [[("a", _hour(i), 1.0) for i in range(3)],
                 [("a", _hour(3), 1.0)]])
    import glob
    parts = glob.glob(str(tmp_path / "s2" / "store" / "batch_id=*"))
    assert len(parts) == 2
