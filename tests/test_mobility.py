"""OD flow semantics (operators/mobility.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from explora_kafka_spark.operators.mobility import (
    cell_dwell, cell_dwell_sql, od_flows, od_flows_sql)


def _events(spark, rows):
    return spark.createDataFrame(
        [(e, u, dt.datetime(2024, 1, 1, h), c) for e, u, h, c in rows],
        "event_id: long, user_id: long, ts: timestamp, cell: string",
    )


def test_od_flows_hand_trajectories(spark):
    # u1: A A B A -> A->B, B->A; u2: A B -> A->B. Totals: A->B 2, B->A 1
    rows = [(1, 1, 0, "A"), (2, 1, 1, "A"), (3, 1, 2, "B"), (4, 1, 3, "A"),
            (5, 2, 0, "A"), (6, 2, 1, "B")]
    out = [(r["from_cell"], r["to_cell"], r["n_trips"])
           for r in od_flows(_events(spark, rows), F.col("cell")).collect()]
    assert out == [("A", "B", 2), ("B", "A", 1)]


def test_od_flows_same_ts_orders_by_event_id(spark):
    # two events in the same hour: event_id breaks the tie so the
    # trajectory (and the flow) is deterministic
    rows = [(10, 1, 0, "B"), (2, 1, 0, "A")]  # event 2 precedes event 10
    out = [(r["from_cell"], r["to_cell"])
           for r in od_flows(_events(spark, rows), F.col("cell")).collect()]
    assert out == [("A", "B")]


def test_od_flows_matches_duckdb_oracle(spark, sf_dir):
    import duckdb

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    cell = F.upper(F.conv((F.col("user_id") * 7 + F.col("event_id")) % 16,
                          10, 16))
    got = [tuple(r) for r in od_flows(ev, cell, top=20).collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    cell_sql = "upper(to_hex((user_id * 7 + event_id) % 16))"
    want = [(a, b, int(n)) for a, b, n in con.execute(
        od_flows_sql(cell_sql, top=20)).fetchall()]
    assert got == want
    assert len(got) == 20


def test_cell_dwell_attributes_delta_to_from_cell(spark):
    # u1: A@0h A@1h B@3h -> A gets 1h + 2h dwell (2 stays), B none
    rows = [(1, 1, 0, "A"), (2, 1, 1, "A"), (3, 1, 3, "B")]
    out = [(r["cell"], r["n_stays"], r["total_dwell_s"], r["avg_dwell_s"])
           for r in cell_dwell(_events(spark, rows), F.col("cell"))
           .collect()]
    assert out == [("A", 2, 10800.0, 5400.0)]


def test_cell_dwell_matches_duckdb_oracle(spark, sf_dir):
    import duckdb

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    cell = F.upper(F.conv(F.col("user_id") % 16, 10, 16))
    got = [tuple(r) for r in cell_dwell(ev, cell, top=16).collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    want = [(a, int(n), float(t), float(v)) for a, n, t, v in con.execute(
        cell_dwell_sql("upper(to_hex(user_id % 16))", top=16)).fetchall()]
    assert got == want
