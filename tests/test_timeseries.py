"""Gap interpolation + histogram semantics (operators/timeseries.py)."""

from __future__ import annotations

import datetime as dt

from explora_kafka_spark.operators import timeseries as TS


def _readings(spark, rows):
    return spark.createDataFrame(
        rows,
        "metric_id: string, geohash: string, ts: timestamp, value: double",
    )


def _hour(i):
    return dt.datetime(2024, 1, 1) + dt.timedelta(hours=i)


def test_interpolate_fills_interior_gap_linearly(spark):
    """Observed 10 @h0 and 40 @h3 -> h1=20, h2=30, flagged."""
    rows = [("m", "g", _hour(0), 10.0), ("m", "g", _hour(3), 40.0)]
    out = TS.interpolate_hourly(_readings(spark, rows)).collect()
    got = [(r["bucket_ms"] // TS.HOUR_MS % 24, r["avg"],
            r["is_interpolated"]) for r in out]
    base = out[0]["bucket_ms"] // TS.HOUR_MS % 24
    assert got == [(base + 0, 10.0, False), (base + 1, 20.0, True),
                   (base + 2, 30.0, True), (base + 3, 40.0, False)]


def test_interpolate_no_extrapolation_and_observed_kept(spark):
    """Series bounded by first/last observed bucket; observed hourly
    averages pass through untouched (two readings in one hour -> mean)."""
    rows = [
        ("m", "g", _hour(5), 1.0),
        ("m", "g", _hour(5).replace(minute=30), 3.0),
        ("m", "g", _hour(6), 7.0),
    ]
    out = TS.interpolate_hourly(_readings(spark, rows)).collect()
    assert len(out) == 2  # h5, h6 only; nothing before/after
    assert [r["avg"] for r in out] == [2.0, 7.0]
    assert not any(r["is_interpolated"] for r in out)


def test_interpolate_series_are_independent(spark):
    """A gap in one metric doesn't borrow values from another."""
    rows = [
        ("a", "g", _hour(0), 0.0), ("a", "g", _hour(2), 2.0),
        ("b", "g", _hour(1), 100.0),
    ]
    out = TS.interpolate_hourly(_readings(spark, rows)).collect()
    a = [(r["avg"], r["is_interpolated"]) for r in out
         if r["metric_id"] == "a"]
    b = [(r["avg"], r["is_interpolated"]) for r in out
         if r["metric_id"] == "b"]
    assert a == [(0.0, False), (1.0, True), (2.0, False)]
    assert b == [(100.0, False)]


def test_interpolate_half_up_rounding_is_deterministic(spark):
    """A gap landing exactly on .5 microunits takes HALF_UP (floor+0.5)
    in both engines: 0 @h0, 0.000001 @h2 -> h1 = 0.000001 (0.5 rounds
    up), matching the DuckDB mirror."""
    import duckdb

    rows = [("m", "g", _hour(0), 0.0), ("m", "g", _hour(2), 0.000001)]
    out = TS.interpolate_hourly(_readings(spark, rows)).collect()
    assert out[1]["avg"] == 0.000001
    con = duckdb.connect()
    con.execute("""
        CREATE VIEW r AS SELECT * FROM (VALUES
            ('m', 'g', TIMESTAMP '2024-01-01 00:00:00', 0.0),
            ('m', 'g', TIMESTAMP '2024-01-01 02:00:00', 0.000001)
        ) AS t(metric_id, geohash, ts, value)
    """)
    want = con.execute(TS.interpolate_hourly_sql("r")).fetchall()
    assert [tuple(r) for r in out] == [tuple(w) for w in want]


def test_histogram_bins_negative_values_with_floor(spark):
    rows = [("m", "g", _hour(0), -0.5), ("m", "g", _hour(1), 0.5),
            ("m", "g", _hour(2), 4.999), ("m", "g", _hour(3), 5.0)]
    out = {(r["bin"]): (r["bin_lo"], r["bin_hi"], r["n"])
           for r in TS.metric_histogram(_readings(spark, rows)).collect()}
    assert out[-1] == (-5.0, 0.0, 1)   # -0.5 floors to bin -1
    assert out[0] == (0.0, 5.0, 2)
    assert out[1] == (5.0, 10.0, 1)    # boundary value starts next bin


def test_metric_day_percentiles_hand_values(spark):
    """1..100 in one (metric, day): exact interpolated quantiles at
    rank (n-1)p -> p50=50.5, p95=95.05, p99=99.01."""
    rows = [("m", "g", _hour(i % 20), float(i + 1)) for i in range(100)]
    out = TS.metric_day_percentiles(_readings(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n"], r["p50"], r["p95"], r["p99"]) == (100, 50.5, 95.05,
                                                      99.01)


def _day(i):
    return dt.datetime(2024, 1, 1) + dt.timedelta(days=i)


def test_metric_trend_hand_ols(spark):
    """Days 0/1/2 with sums 10/20/30 -> slope 10.00/day (1000 c/d),
    forecast day 3 = 40.00 (4000 c)."""
    rows = [("m", "g", _day(0), 10.0), ("m", "g", _day(1), 20.0),
            ("m", "g", _day(2), 30.0)]
    out = TS.metric_trend(_readings(spark, rows)).collect()
    assert [(r["metric_id"], r["n_days"], r["slope_cpd"], r["forecast_c"])
            for r in out] == [("m", 3, 1000, 4000)]


def test_metric_trend_gaps_keep_real_spacing(spark):
    """Days 0 and 2 (day 1 missing): x = 0, 2 — the fit sees the true
    2-day gap, so the same 10-per-day growth still reads 1000 c/d."""
    rows = [("m", "g", _day(0), 10.0), ("m", "g", _day(2), 30.0)]
    out = TS.metric_trend(_readings(spark, rows)).collect()[0]
    assert (out["slope_cpd"], out["forecast_c"]) == (1000, 4000)


def test_metric_trend_negative_slope_and_single_day(spark):
    """Falling series -> negative slope (toward-zero div parity);
    a single-day metric has D = 0 -> NULL slope/forecast."""
    rows = [("down", "g", _day(0), 30.0), ("down", "g", _day(1), 10.0),
            ("one", "g", _day(0), 5.0)]
    out = {r["metric_id"]: (r["slope_cpd"], r["forecast_c"])
           for r in TS.metric_trend(_readings(spark, rows)).collect()}
    assert out["down"] == (-2000, -1000)
    assert out["one"] == (None, None)


def test_metric_trend_matches_duckdb_oracle(spark, sf_dir):
    import duckdb

    from explora_kafka_spark.sources.tables import (READINGS_SQL,
                                                     load_readings)

    readings = load_readings(spark, sf_dir)
    got = [tuple(r) for r in TS.metric_trend(readings).collect()]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM"
                f" '{sf_dir}/events.parquet'")
    want = [tuple(row) for row in con.execute(
        TS.metric_trend_sql(f"({READINGS_SQL}) AS r")).fetchall()]
    def canon(rows):
        return [(m, int(n), None if s is None else int(s),
                 None if f is None else int(f)) for m, n, s, f in rows]

    assert canon(got) == canon(want)
    assert len(got) >= 2


def test_metric_movers_consecutive_days_only(spark):
    """m: days 0,1,3 with sums 10,25,99 -> only the 0->1 delta (+1500c)
    qualifies; the 1->3 jump is a gap, not a daily move."""
    rows = [("m", "g", _day(0), 10.0), ("m", "g", _day(1), 25.0),
            ("m", "g", _day(3), 99.0)]
    out = [(r["metric_id"], r["prev_c"], r["cur_c"], r["delta_c"])
           for r in TS.metric_movers(_readings(spark, rows)).collect()]
    assert out == [("m", 1000, 2500, 1500)]


def test_metric_movers_matches_duckdb_oracle(spark, sf_dir):
    import duckdb

    from explora_kafka_spark.sources.tables import (READINGS_SQL,
                                                    load_readings)

    got = [tuple(r) for r in
           TS.metric_movers(load_readings(spark, sf_dir), top=20)
           .collect()]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM"
                f" '{sf_dir}/events.parquet'")
    want = [tuple(row) for row in con.execute(
        TS.metric_movers_sql(f"({READINGS_SQL}) AS r", top=20))
        .fetchall()]
    assert [(m, int(d), int(p), int(c), int(x)) for m, d, p, c, x in got] \
        == [(m, int(d), int(p), int(c), int(x)) for m, d, p, c, x in want]
    assert len(got) == 20


def test_percentile_approx_audit_is_rank_correct(spark, sf_dir):
    """The sketch guarantee is on RANK, not value (on sparse groups a
    nearest-data-point answer can sit far from the interpolated exact
    quantile in VALUE — that gap is exactly what the audit's err
    column surfaces). Check the real contract: each approx quantile's
    empirical rank inside its group is within the sketch's rank
    tolerance, and the approx value is an actual group member."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    from explora_kafka_spark.sources.tables import load_readings

    readings = load_readings(spark, sf_dir)
    rows = TS.percentile_approx_audit(readings).collect()
    assert rows
    groups = defaultdict(list)
    for r in readings.select(
            "metric_id",
            F.unix_millis(F.date_trunc("day", "ts")).alias("b"),
            "value").collect():
        groups[(r["metric_id"], r["b"])].append(round(r["value"], 6))
    for r in rows:
        vals = sorted(groups[(r["metric_id"], r["bucket_ms"])])
        n = len(vals)
        assert r["n"] == n
        for p, tag in ((0.5, "p50"), (0.95, "p95"), (0.99, "p99")):
            approx = r[f"{tag}_approx"]
            assert approx in vals  # a sketch answer IS a data point
            below = sum(1 for v in vals if v < approx)
            at_or_below = sum(1 for v in vals if v <= approx)
            lo = p - 0.001 - 1.0 / n  # sketch rank tol + discreteness
            hi = p + 0.001 + 1.0 / n
            assert below / n <= hi and at_or_below / n >= lo


def test_percentile_rank_audit_matches_exact_and_flags_true(spark, sf_dir):
    """The r11 exact-audit twin: p50/p95/p99 equal the exact
    metric_day_percentiles values and every rank-bound flag is TRUE
    (the GK guarantee, deterministic under any merge order)."""
    from explora_kafka_spark.sources.tables import load_readings

    readings = load_readings(spark, sf_dir)
    audit = {(r["metric_id"], r["bucket_ms"]): r
             for r in TS.percentile_rank_audit(readings).collect()}
    exact = {(r["metric_id"], r["bucket_ms"]): r
             for r in TS.metric_day_percentiles(readings).collect()}
    assert audit and set(audit) == set(exact)
    for k, a in audit.items():
        e = exact[k]
        assert a["n"] == e["n"]
        for tag in ("p50", "p95", "p99"):
            assert a[tag] == e[tag]
        for tag in ("ok50", "ok95", "ok99"):
            assert a[tag] is True


def test_percentile_rank_audit_flag_catches_violations(spark):
    """Sanity that the flag CAN go false: with a 1-row group the rank
    interval always intersects (trivially TRUE), so instead check the
    arithmetic on a synthetic frame where we force an absurd 'approx'
    by shrinking accuracy tolerance — i.e. verify the overlap predicate
    directly in Python against hand-built counts."""
    # lo/hi ranks of a value far from the target percentile must fail
    # the overlap test for large n where err = n/acc + 2 is small
    n, acc = 10_000, 1_000
    err = n / acc + 2.0          # 12.0
    t = 0.99 * n                 # 9900
    lo, hi = 5000, 5001          # a median-ish value claimed as p99
    assert not ((lo + 1) - err <= t <= hi + err)
    lo, hi = 9890, 9905          # genuinely near the target rank
    assert (lo + 1) - err <= t <= hi + err


def test_percentile_rank_audit_ignores_null_readings(spark):
    """Round-11 self-review: n and the rank target must live on the
    NON-NULL scale (percentile/approx_percentile skip NULLs). A group
    with 20% NULL readings must report n = non-null count, exact
    quantiles over non-null values, and TRUE flags."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [("m1", base, float(v)) for v in range(1, 81)]
    rows += [("m1", base, None)] * 20
    readings = spark.createDataFrame(
        rows, "metric_id string, ts timestamp, value double")
    out = TS.percentile_rank_audit(readings).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n"] == 80
    assert r["p50"] == 40.5  # interpolated median of 1..80
    assert r["ok50"] and r["ok95"] and r["ok99"]
