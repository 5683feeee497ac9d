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
