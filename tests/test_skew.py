"""Skew-aggregation tests: salted exact distinct must equal the plain
distinct on any grouping; HLL must land within its error bound."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from explora_kafka_spark.operators import skew as SK
from explora_kafka_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return load_table(spark, SF_DIR, "events")


def test_salted_equals_plain_distinct(events):
    plain = {
        r.event_type: r.n
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for n_salts in (1, 4, 16, 64):
        salted = {
            r.event_type: r.n_distinct
            for r in SK.count_distinct_salted(
                events, ["event_type"], "user_id", num_salts=n_salts
            ).collect()
        }
        assert salted == plain, f"num_salts={n_salts}"


def test_approx_within_rsd(events):
    plain = {
        r.event_type: r.n
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    approx = {
        r.event_type: r.n_distinct_approx
        for r in SK.approx_distinct(events, ["event_type"], "user_id").collect()
    }
    for k, exact in plain.items():
        assert abs(approx[k] - exact) <= max(3, 0.1 * exact)


def test_cms_never_undercounts_and_is_exact_when_wide(spark):
    """est >= true for every item; with width >> n_items collisions
    vanish and the estimate is exact; deterministic under repartition."""
    from explora_kafka_spark.operators import skew as SKW

    rows = [(f"item{i % 7}",) for i in range(70)] + [("rare",)]
    df = spark.createDataFrame(rows, "k string")
    out = SKW.cms_heavy_hitters(df, "k", depth=4, width=1024, top=10)
    got = {r["item"]: (r["est_count"], r["true_count"])
           for r in out.collect()}
    assert got["rare"] == (1, 1)
    assert all(est == true for est, true in got.values())
    assert sum(t for _, t in got.values()) == 71
    # narrow sketch: collisions may only INFLATE estimates
    tight = SKW.cms_heavy_hitters(df, "k", depth=2, width=4, top=10)
    assert all(r["est_count"] >= r["true_count"] for r in tight.collect())
    again = SKW.cms_heavy_hitters(
        df.repartition(5), "k", depth=4, width=1024, top=10).collect()
    assert {r["item"]: (r["est_count"], r["true_count"])
            for r in again} == got


def test_approx_distinct_audit_exact_and_flag(events):
    """The r11 exact-audit twin: n_distinct equals the exact count and
    hll_ok is TRUE at the fixture (HLL merges are commutative, so the
    flag is a pure function of the data)."""
    plain = {
        r.event_type: r.n
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    rows = SK.approx_distinct_audit(
        events, ["event_type"], "user_id").collect()
    assert {r.event_type: r.n_distinct for r in rows} == plain
    assert all(r.hll_ok for r in rows)


def test_approx_distinct_audit_small_groups_use_abs_slack(spark):
    """Tiny cardinalities (exact sparse-mode HLL) pass via the absolute
    slack max(4, ...) — and the flag survives repartitioning."""
    rows = [(i % 3, f"u{i}") for i in range(12)]
    df = spark.createDataFrame(rows, "g int, u string")
    out = SK.approx_distinct_audit(df.repartition(7), ["g"], "u")
    got = out.collect()
    assert sorted((r.g, r.n_distinct) for r in got) == \
        [(0, 4), (1, 4), (2, 4)]
    assert all(r.hll_ok for r in got)
