"""Funnel + cohort retention (operators/funnel.py): earliest-chain
semantics, ordering constraints, cohort math."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from explora_kafka_spark.operators.funnel import funnel, retention


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_type string")


def _t(day, hour=0):
    return datetime(2024, 1, day, hour)


def test_funnel_requires_strict_order(spark):
    # user 1 completes in order; user 2 clicked BEFORE viewing (no
    # qualifying later click); user 3 never clicks
    ev = _events(spark, [
        (1, _t(1, 1), "view"), (1, _t(1, 2), "click"), (1, _t(1, 3), "purchase"),
        (2, _t(1, 2), "click"), (2, _t(1, 3), "view"),
        (3, _t(1, 1), "view"),
    ])
    out = {r["step"]: r for r in funnel(ev).collect()}
    assert out["view"]["n_users"] == 3
    assert out["click"]["n_users"] == 1
    assert out["purchase"]["n_users"] == 1
    assert out["click"]["conversion"] == round(1 / 3, 6)


def test_funnel_uses_earliest_chain(spark):
    # click at t2 follows the EARLIEST view (t1), even though a later
    # view (t3) also exists; purchase must follow the earliest
    # qualifying click (t2) — t4 does
    ev = _events(spark, [
        (1, _t(1, 1), "view"), (1, _t(1, 2), "click"),
        (1, _t(1, 3), "view"), (1, _t(1, 4), "purchase"),
    ])
    out = {r["step"]: r["n_users"] for r in funnel(ev).collect()}
    assert out == {"view": 1, "click": 1, "purchase": 1}


def test_funnel_same_timestamp_does_not_count(spark):
    # strict ordering: click at exactly the view's ts does not qualify
    ev = _events(spark, [
        (1, _t(1, 1), "view"), (1, _t(1, 1), "click"),
    ])
    out = {r["step"]: r["n_users"] for r in funnel(ev).collect()}
    assert out["click"] == 0


def test_retention_cohort_math(spark):
    # user 1 first active week of Jan 1 (Mon), returns week +2;
    # user 2 first active week of Jan 8, never returns
    ev = _events(spark, [
        (1, _t(2), "view"), (1, _t(16), "click"),
        (2, _t(9), "view"),
    ])
    rows = {(str(r["cohort_week"]), r["week_offset"]): r
            for r in retention(ev).collect()}
    assert rows[("2024-01-01", 0)]["n_active"] == 1
    assert rows[("2024-01-01", 0)]["n_cohort"] == 1
    assert rows[("2024-01-01", 2)]["retention"] == 1.0
    assert rows[("2024-01-08", 0)]["n_active"] == 1
    assert ("2024-01-08", 1) not in rows


def test_retention_offsets_are_week_integers(spark, sf_dir):
    from explora_kafka_spark.sources.tables import load_table
    ev = load_table(spark, sf_dir, "events")
    for r in retention(ev).collect():
        assert r["week_offset"] >= 0
        assert 0.0 <= r["retention"] <= 1.0
        assert r["n_active"] <= r["n_cohort"]


def test_funnel_within_horizon(spark):
    # user 1 converts within 1 hour of the first view; user 2's click
    # lands 3 hours after their view -> outside the window
    ev = _events(spark, [
        (1, _t(1, 1), "view"), (1, _t(1, 1).replace(minute=30), "click"),
        (2, _t(1, 1), "view"), (2, _t(1, 4), "click"),
    ])
    out = {r["step"]: r["n_users"]
           for r in funnel(ev, within="1 hour").collect()}
    assert out["view"] == 2
    assert out["click"] == 1


def test_funnel_within_matches_duckdb(spark):
    """Cross-engine: the horizon variant agrees with its SQL mirror on
    the fixture events."""
    import duckdb
    from explora_kafka_spark.operators.funnel import funnel_sql
    from explora_kafka_spark.sources.tables import load_table
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    got = [(r["step_idx"], r["step"], r["n_users"], r["conversion"])
           for r in funnel(ev, within="2 hours").collect()]
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    con.execute("CREATE VIEW events AS SELECT * FROM "
                "'/root/testdata/sf0.001/events.parquet'")
    exp = [tuple(r) for r in
           con.execute(funnel_sql(within="2 hours")).fetchall()]
    assert got == exp


def test_retention_cross_engine_year_boundary(spark, tmp_path):
    """Monday-week truncation must agree between Spark and DuckDB across
    a year boundary (Dec 31 2023 is a Sunday -> week of Mon Dec 25;
    Jan 1 2024 is a Monday -> its own week). Pins the date_trunc('week')
    semantics the oracle relies on."""
    import duckdb
    rows = [
        (1, datetime(2023, 12, 30), "view"),   # week of Mon 2023-12-25
        (1, datetime(2024, 1, 2), "view"),     # week of Mon 2024-01-01 -> +1
        (2, datetime(2024, 1, 1), "view"),     # Monday itself
        (2, datetime(2024, 1, 8), "view"),     # next Monday -> +1
    ]
    ev = _events(spark, rows)
    path = str(tmp_path / "ev.parquet")
    ev.coalesce(1).write.mode("overwrite").parquet(path)

    from explora_kafka_spark.operators.funnel import retention_sql
    got = [(str(r["cohort_week"]), r["week_offset"], r["n_active"],
            r["n_cohort"], r["retention"]) for r in retention(ev).collect()]
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{path}/*.parquet')")
    exp = [(str(r[0]), r[1], r[2], r[3], r[4])
           for r in con.execute(retention_sql()).fetchall()]
    assert got == exp
    # and the cohorts are the ones the calendar says
    assert ("2023-12-25", 0) in {(c, o) for c, o, *_ in got}
    assert ("2024-01-01", 0) in {(c, o) for c, o, *_ in got}


def test_event_paths_sliding_windows(spark):
    import datetime as dt

    from explora_kafka_spark.operators.funnel import event_paths

    rows = [(i, 1, dt.datetime(2024, 1, 1, i), s)
            for i, s in enumerate(["view", "click", "buy", "view"])]
    rows += [(10, 2, dt.datetime(2024, 1, 1, 0), "view"),
             (11, 2, dt.datetime(2024, 1, 1, 1), "click"),
             (12, 2, dt.datetime(2024, 1, 1, 2), "buy")]
    ev = spark.createDataFrame(
        rows, "event_id: long, user_id: long, ts: timestamp,"
              " event_type: string")
    out = [(r["path"], r["n"]) for r in event_paths(ev, depth=3).collect()]
    # u1 windows: view>click>buy, click>buy>view; u2: view>click>buy
    assert out == [("view>click>buy", 2), ("click>buy>view", 1)]


def test_event_paths_matches_duckdb_oracle(spark, sf_dir):
    import duckdb

    from explora_kafka_spark.operators.funnel import (event_paths,
                                                      event_paths_sql)

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = [(r["path"], r["n"])
           for r in event_paths(ev, depth=3, top=20).collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    want = [(p, int(n)) for p, n in con.execute(
        event_paths_sql(depth=3, top=20)).fetchall()]
    assert got == want
    assert len(got) == 20
