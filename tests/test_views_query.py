"""View lattice + query algebra tests: lattice-vs-direct equivalence (the A2
merge algebra), incremental update, and history/snapshot vs DuckDB oracles."""

import duckdb
import pytest
from pyspark.sql import functions as F

from explora_kafka_spark.functions.timeutil import (
    interval_to_range,
    truncate_ts_ms,
    format_ts_ms,
    parse_key_ts,
)
from explora_kafka_spark.plans import query as Q
from explora_kafka_spark.plans import views as V


@pytest.fixture(scope="module")
def lattice(readings):
    return V.view_lattice(readings, precisions=(6, 7)).cache()


def _duck(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    con.execute(
        "CREATE VIEW readings AS SELECT event_id, event_type AS metric_id, "
        "substr(md5(CAST(user_id AS VARCHAR)), 1, 12) AS geohash, ts, value FROM events"
    )
    return con


def test_lattice_equals_direct_groupby(readings, lattice):
    """Every (precision, res) slice of the cascaded lattice must equal the
    direct groupBy from raw readings — validates the rollup algebra (A2/A6)."""
    for p in (6, 7):
        for res in ("min", "hour", "day", "month"):
            direct = (
                readings.select(
                    "metric_id",
                    F.substring("geohash", 1, p).alias("gh"),
                    F.date_trunc(
                        {"min": "minute", "hour": "hour", "day": "day", "month": "month"}[res],
                        "ts",
                    ).alias("ts"),
                    "value",
                )
                .groupBy("metric_id", "gh", "ts")
                .agg(F.count("*").alias("count"), F.sum("value").alias("sum"))
            )
            slice_ = lattice.filter((F.col("precision") == p) & (F.col("res") == res)).select(
                "metric_id", "gh", "ts", "count", "sum"
            )
            d = {tuple(r[:3]): (r[3], round(r[4], 6)) for r in direct.collect()}
            s = {tuple(r[:3]): (r[3], round(r[4], 6)) for r in slice_.collect()}
            assert d == s, f"lattice mismatch at precision={p} res={res}"


def test_avg_is_sum_over_count(lattice):
    bad = lattice.filter(F.abs(F.col("avg") - F.col("sum") / F.col("count")) > 1e-9).count()
    assert bad == 0


def test_incremental_update_equals_full_build(readings):
    """Splitting the stream in two and merging batch views == one-shot build
    (parity with the per-record incremental aggregator IngestStream.java:84-92)."""
    first = readings.filter(F.col("event_id") % 2 == 0)
    second = readings.filter(F.col("event_id") % 2 == 1)
    merged = V.incremental_update(
        V.view_lattice(first, precisions=(6,)), V.view_lattice(second, precisions=(6,))
    )
    full = V.view_lattice(readings, precisions=(6,))
    m = {tuple(r[:5]): (r[5], round(r[6], 6)) for r in
         merged.select("metric_id", "precision", "res", "gh", "ts", "count", "sum").collect()}
    f = {tuple(r[:5]): (r[5], round(r[6], 6)) for r in
         full.select("metric_id", "precision", "res", "gh", "ts", "count", "sum").collect()}
    assert m == f


def test_history_matches_oracle(lattice, sf_dir):
    con = _duck(sf_dir)
    got = {
        r.timestamp: round(r.avg, 6)
        for r in Q.history(
            lattice, "view", "avg", 6, "hour",
            from_ms=1704412800000,  # 2024-01-05
            to_ms=1705708800000,    # 2024-01-20
        ).collect()
    }
    want = {
        r[0]: round(r[1], 6)
        for r in con.execute(
            """
            SELECT epoch_ms(date_trunc('hour', ts)) AS t, sum(value)/count(*) AS a
            FROM readings WHERE metric_id = 'view'
              AND epoch_ms(date_trunc('hour', ts)) BETWEEN 1704412800000 AND 1705708800000
            GROUP BY 1
            """
        ).fetchall()
    }
    assert got == want and len(got) > 0


def test_history_cell_filter(lattice, readings):
    cells = [r.gh for r in
             lattice.filter((F.col("precision") == 6) & (F.col("res") == "day"))
             .select("gh").distinct().limit(3).collect()]
    out = Q.history(lattice, "click", "count", 6, "day", cells=cells).collect()
    direct = (
        readings.filter((F.col("metric_id") == "click")
                        & F.substring("geohash", 1, 6).isin(cells))
        .groupBy(F.date_trunc("day", "ts").alias("ts"))
        .count()
    )
    want = {int(r.ts.timestamp() * 1000): r["count"] for r in direct.collect()}
    got = {r.timestamp: r["count"] for r in out}
    assert got == want and len(got) > 0


def test_snapshot_matches_oracle(lattice, sf_dir):
    con = _duck(sf_dir)
    ts = 1704844800000  # 2024-01-10 00:00 UTC, day grain
    got = {r.gh: round(r.sum, 6) for r in
           Q.snapshot(lattice, "purchase", "sum", 6, "day", ts).collect()}
    want = {r[0]: round(r[1], 6) for r in con.execute(
        """
        SELECT substr(geohash, 1, 6) AS gh, sum(value) AS s
        FROM readings WHERE metric_id = 'purchase'
          AND date_trunc('day', ts) = TIMESTAMP '2024-01-10'
        GROUP BY 1
        """
    ).fetchall()}
    assert got == want and len(got) > 0


def test_snapshot_truncates_instant(lattice):
    """L4: a mid-bucket instant must hit the containing bucket."""
    exact = Q.snapshot(lattice, "purchase", "count", 6, "day", 1704844800000).collect()
    mid = Q.snapshot(lattice, "purchase", "count", 6, "day", 1704844800000 + 7 * 3600 * 1000 + 123).collect()
    assert {(r.gh, r["count"]) for r in exact} == {(r.gh, r["count"]) for r in mid}
    assert len(exact) > 0


def test_snapshot_prefix_equals_children_isin(lattice):
    """startswith(prefix) ≡ the reference's base-32 children enumeration (Q3)."""
    pfx = "c"
    by_prefix = Q.snapshot(lattice, "view", "avg", 6, "day", 1704844800000, cell_prefix=pfx)
    cells = [r.gh for r in
             lattice.filter((F.col("precision") == 6) & F.col("gh").startswith(pfx))
             .select("gh").distinct().collect()]
    by_isin = Q.snapshot(lattice, "view", "avg", 6, "day", 1704844800000, cells=cells)
    a = {(r.gh, round(r.avg, 9)) for r in by_prefix.collect()}
    b = {(r.gh, round(r.avg, 9)) for r in by_isin.collect()}
    assert a == b and len(a) > 0


def test_interval_arithmetic():
    # 2024-01-29T12:34:56.789Z
    now = 1706531696789
    assert interval_to_range(now, "5min") == (now - 5 * 60_000, now)
    assert interval_to_range(now, "1hour") == (now - 3_600_000, now)
    assert interval_to_range(now, "1day") == (now - 86_400_000, now)
    assert interval_to_range(now, "1week") == (now - 7 * 86_400_000, now)
    # 1 month back from Jan 29 = Dec 29 (calendar month, Calendar.add parity)
    f, t = interval_to_range(now, "1month")
    assert t == now and f == now - 31 * 86_400_000
    # unknown interval falls back to 5min (QueryingController.java:306-307)
    assert interval_to_range(now, "bogus") == (now - 300_000, now)


def test_ts_truncation_scalar():
    ts = 1706531696789  # 2024-01-29T12:34:56.789Z
    assert truncate_ts_ms(ts, "min") == 1706531640000
    assert truncate_ts_ms(ts, "hour") == 1706529600000
    assert truncate_ts_ms(ts, "day") == 1706486400000
    assert truncate_ts_ms(ts, "month") == 1704067200000
    assert truncate_ts_ms(ts, "year") == 1704067200000
    assert truncate_ts_ms(ts, "raw") == ts


def test_composite_key_roundtrip():
    ts = 1706531696789
    s = format_ts_ms(ts)
    assert s == "20240129:123456:789"
    assert parse_key_ts(s) == ts


def test_snapshot_regions_matches_per_polygon_sums(spark):
    """The multi-region rollup's r1 row equals the single-polygon
    snapshot (same geofence) summed over its cells — one broadcast
    pass ≡ N per-region queries."""
    import __spark_entry__ as E

    sf = "/root/testdata/sf0.01"  # sf0.001's snapshot day misses r1
    regions = {r["region_id"]: r["count"]
               for r in E.queries()["snapshot_regions_quad"](
                   spark, sf).collect()}
    single = sum(r["count"] for r in
                 E.queries()["snapshot_polygon_quad"](spark, sf)
                 .collect())
    assert regions.get("r1", 0) == single
    assert set(regions) <= {"r1", "r2", "r3"}
    assert regions["r1"] > 0


def test_snapshot_nearest_is_the_exhaustive_ranking(spark):
    """The 5 returned cells are exactly the 5 nearest NON-EMPTY cells
    (by the same exact per-cell distance) among all cells with data on
    the snapshot day — checked against a raw exhaustive rebuild."""
    import __spark_entry__ as E
    from explora_kafka_spark.functions import geo

    sf = "/root/testdata/sf0.01"
    got = [(r["gh"], r["dist_m"], r["count"]) for r in
           E.queries()["snapshot_nearest_quad"](spark, sf).collect()]
    assert [d for _, d, _ in got] == sorted(d for _, d, _ in got)
    raw = (E._geo_readings(spark, sf, "quad", 6)
           .filter((F.col("metric_id") == "view")
                   & (F.date_trunc("day", F.col("ts").cast("timestamp"))
                      == "2024-01-10"))
           .groupBy("geohash").count().collect())
    ranked = sorted(
        ((round(geo.bbox_min_dist_m(
            geo.quadkey_decode_bbox(r["geohash"]), -10.0, -20.0), 6),
          r["geohash"], r["count"]) for r in raw
         if geo.bbox_min_dist_m(
             geo.quadkey_decode_bbox(r["geohash"]), -10.0, -20.0)
         <= 4_000_000.0))
    assert got == [(g, d, c) for d, g, c in ranked[:5]]
