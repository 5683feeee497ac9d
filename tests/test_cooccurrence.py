"""Market-basket lift semantics (operators/cooccurrence.py)."""

from __future__ import annotations

import datetime as dt

from explora_kafka_spark.operators import cooccurrence as CO


def _events(spark, rows):
    return spark.createDataFrame(
        [(u, dt.datetime(2024, 1, d, h), '{"k": %d}' % k)
         for u, d, h, k in rows],
        "user_id: long, ts: timestamp, props: string",
    )


def test_item_lift_hand_counts(spark):
    # baskets (user, day): u1d1={1,2,3}, u2d1={1,2}, u3d1={1}; N=3
    # lift(2,3) = 1e6*1*3/(2*1) = 1.5M ranks above the two 1.0M pairs
    rows = [(1, 1, 0, 1), (1, 1, 1, 2), (1, 1, 2, 3),
            (2, 1, 0, 1), (2, 1, 5, 2),
            (3, 1, 0, 1),
            (1, 1, 3, 1)]  # duplicate item in the same basket: ignored
    got = [(r["item_a"], r["item_b"], r["n_ab"], r["n_a"], r["n_b"],
            r["lift_ppm"])
           for r in CO.item_lift(_events(spark, rows)).collect()]
    assert got == [
        (2, 3, 1, 2, 1, 1_500_000),
        (1, 2, 2, 3, 2, 1_000_000),
        (1, 3, 1, 3, 1, 1_000_000),
    ]


def test_item_lift_baskets_are_user_days(spark):
    # same user, different days -> different baskets -> no pair
    rows = [(1, 1, 0, 1), (1, 2, 0, 2)]
    assert CO.item_lift(_events(spark, rows)).count() == 0


def test_item_lift_matches_duckdb_oracle(spark, sf_dir):
    import duckdb

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = [tuple(r) for r in CO.item_lift(ev, top=50).collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    want = [tuple(int(x) for x in row)
            for row in con.execute(CO.item_lift_sql(top=50)).fetchall()]
    assert [tuple(int(x) for x in r) for r in got] == want
    assert len(got) > 0
