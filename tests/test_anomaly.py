"""Trailing-window anomaly scoring semantics (operators/anomaly.py)."""

from __future__ import annotations

import datetime as dt

from explora_kafka_spark.operators import anomaly as A


def _readings(spark, rows):
    return spark.createDataFrame(
        rows, "metric_id: string, ts: timestamp, value: double"
    )


def _hour(i):
    return dt.datetime(2024, 1, 1) + dt.timedelta(hours=i)


def test_spike_is_flagged_and_baseline_excludes_current_hour(spark):
    # 30 calm hours alternating 10/12, then a spike hour
    rows = [("m", _hour(i), 10.0 + 2 * (i % 2)) for i in range(30)]
    rows.append(("m", _hour(30), 100.0))
    out = A.metric_hour_anomaly(
        _readings(spark, rows), trail=24, min_periods=12, z_thresh=3.0
    ).toPandas()
    spike = out[out["hourly_avg"] == 100.0].iloc[0]
    assert spike["is_anomaly"] and spike["z"] > 3
    # the frame ends at 1 PRECEDING: the spike does not pollute its own
    # baseline (trailing mean stays ~11)
    assert abs(spike["trail_mean"] - 11.0) < 1.1
    calm = out[(out["trail_n"] >= 12) & (out["hourly_avg"] < 50)]
    assert not calm["is_anomaly"].any()


def test_min_periods_gates_early_hours(spark):
    rows = [("m", _hour(i), float(i % 5)) for i in range(20)]
    out = A.metric_hour_anomaly(
        _readings(spark, rows), trail=24, min_periods=12
    ).toPandas()
    out = out.sort_values("bucket_ms").reset_index(drop=True)
    assert out.loc[: 11, "z"].isna().all()  # hours 0..11: < 12 trailing
    assert out.loc[12:, "z"].notna().all()


def test_rows_frame_skips_gaps_not_zero_fills(spark):
    # hours 0..14 then a 100-hour gap then hour 115: the trailing count
    # for the post-gap hour still sees the 15 pre-gap hours
    rows = [("m", _hour(i), 5.0) for i in range(15)]
    rows.append(("m", _hour(115), 5.0))
    out = A.metric_hour_anomaly(
        _readings(spark, rows), trail=24, min_periods=12
    ).toPandas().sort_values("bucket_ms")
    assert out.iloc[-1]["trail_n"] == 15


def test_constant_series_has_zero_std_and_null_z(spark):
    rows = [("m", _hour(i), 7.0) for i in range(30)]
    out = A.metric_hour_anomaly(_readings(spark, rows)).toPandas()
    assert (out["trail_std"].dropna() == 0).all()
    assert out["z"].isna().all()  # std=0 → undefined score, never flagged


def test_correlation_of_identical_and_inverted_series(spark):
    vals = [1.0, 5.0, 2.0, 8.0, 3.0]
    rows = []
    for i, v in enumerate(vals):
        rows += [("a", _hour(i), v), ("b", _hour(i), v),
                 ("c", _hour(i), 10.0 - v)]
    out = {(r["metric_a"], r["metric_b"]): r["corr"]
           for r in A.metric_correlation(_readings(spark, rows)).collect()}
    assert out[("a", "b")] == 1.0
    assert out[("a", "c")] == -1.0
    assert out[("b", "c")] == -1.0


def test_correlation_matches_numpy_on_pairwise_complete_hours(spark):
    import numpy as np

    xs = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0]
    ys = [2.0, 7.0, 1.0, 8.0, 2.0, 8.0, 1.0, 8.0]
    rows = [("x", _hour(i), v) for i, v in enumerate(xs)]
    rows += [("y", _hour(i), v) for i, v in enumerate(ys)]
    rows.append(("x", _hour(99), 42.0))  # unmatched hour must be dropped
    out = A.metric_correlation(_readings(spark, rows)).collect()
    assert len(out) == 1 and out[0]["n_hours"] == 8
    want = float(np.corrcoef(xs, ys)[0, 1])
    assert abs(out[0]["corr"] - want) < 1e-4


def test_correlation_constant_series_is_null(spark):
    rows = [("a", _hour(i), 5.0) for i in range(6)]
    rows += [("b", _hour(i), float(i)) for i in range(6)]
    out = A.metric_correlation(_readings(spark, rows)).collect()
    assert len(out) == 1 and out[0]["corr"] is None


def test_plan_is_native(spark):
    rows = [("m", _hour(i), 1.0) for i in range(5)]
    plan = (
        A.metric_hour_anomaly(_readings(spark, rows))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
