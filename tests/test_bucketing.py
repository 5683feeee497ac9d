"""Bucketed-join plan test: same-bucketed tables join with zero
Exchange (the co-location strategy for fact-fact joins at scale)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from explora_kafka_spark.sources import bucketing as B
from explora_kafka_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    warehouse = tmp_path_factory.mktemp("warehouse")
    li = load_table(spark, SF_DIR, "lineitem")
    o = load_table(spark, SF_DIR, "orders")
    B.write_bucketed(li, "li_bucketed", ["l_orderkey"], num_buckets=4,
                     path=str(warehouse / "li"))
    B.write_bucketed(o, "o_bucketed", ["o_orderkey"], num_buckets=4,
                     path=str(warehouse / "o"))
    yield spark
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")


def test_bucketed_join_no_shuffle(bucketed):
    spark = bucketed
    # disable broadcast so the planner must pick SortMergeJoin
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = B.read_table(spark, "li_bucketed")
        o = B.read_table(spark, "o_bucketed")
        joined = li.join(o, li.l_orderkey == o.o_orderkey).select(
            "l_orderkey", "o_totalprice", "l_extendedprice"
        )
        assert B.cocated_join_has_no_shuffle(joined)
        # and the join is still correct
        plain_li = load_table(spark, SF_DIR, "lineitem")
        plain_o = load_table(spark, SF_DIR, "orders")
        expect = plain_li.join(
            plain_o, plain_li.l_orderkey == plain_o.o_orderkey
        ).count()
        assert joined.count() == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_unbucketed_join_does_shuffle(bucketed):
    spark = bucketed
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = load_table(spark, SF_DIR, "lineitem")
        o = load_table(spark, SF_DIR, "orders")
        joined = li.join(o, li.l_orderkey == o.o_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan  # the baseline the bucketing removes
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
