"""Range-join tests: containment correctness vs a plain inequality
join, boundary inclusivity, and plan shape (equi-join, not nested loop)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from explora_kafka_spark.operators.rangejoin import range_join


def _ts(s):
    return datetime.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    points = spark.createDataFrame(
        [
            (1, "a", _ts("2024-01-01 10:00:00")),
            (2, "a", _ts("2024-01-01 11:00:00")),   # exactly at interval start
            (3, "a", _ts("2024-01-01 12:00:00")),   # exactly at interval end
            (4, "a", _ts("2024-01-01 12:00:01")),   # just outside
            (5, "b", _ts("2024-01-01 11:30:00")),   # right key, other interval
        ],
        "id long, k string, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            ("a", 1704106800000, 1704110400000, "ivA"),  # 11:00..12:00 UTC
            ("b", 1704063600000, 1704153600000, "ivB"),  # wide
        ],
        "k string, s long, e long, name string",
    )
    return points, intervals


def test_containment_and_boundaries(frames):
    points, intervals = frames
    out = {
        r.id: r.name
        for r in range_join(points, intervals, "k", "ts", "s", "e").collect()
    }
    assert out == {2: "ivA", 3: "ivA", 5: "ivB"}


def test_matches_plain_inequality_join(spark, frames):
    points, intervals = frames
    bucketed = range_join(points, intervals, "k", "ts", "s", "e",
                          bucket_ms=600_000)
    plain = points.join(
        intervals,
        (points.k == intervals.k)
        & (F.unix_millis(points.ts) >= intervals.s)
        & (F.unix_millis(points.ts) <= intervals.e),
    )
    assert bucketed.count() == plain.count()


def test_plan_is_equi_join(frames):
    points, intervals = frames
    plan = range_join(points, intervals, "k", "ts", "s", "e")._jdf \
        .queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_no_key_mode(spark, frames):
    points, intervals = frames
    out = range_join(points, intervals, None, "ts", "s", "e").collect()
    # without the key equality: ivB spans the whole day (all 5 points),
    # ivA additionally matches points 2, 3, 5
    assert len(out) == 8
    # cross-check against the plain inequality join
    plain = points.join(
        intervals,
        (F.unix_millis(points.ts) >= intervals.s)
        & (F.unix_millis(points.ts) <= intervals.e),
    )
    assert len(out) == plain.count()
