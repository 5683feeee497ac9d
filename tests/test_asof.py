"""As-of join edge cases: no-preceding-row nulls, equal-ts visibility,
multi-key isolation, and window-plan shape (single shuffle, no range
nested loop)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from explora_kafka_spark.operators.asof import asof_join


def _ts(s):
    return datetime.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, "a", _ts("2024-01-01 10:00:00")),   # before any right → null
            (2, "a", _ts("2024-01-01 11:00:00")),   # exactly at right ts → visible
            (3, "a", _ts("2024-01-01 11:30:00")),   # between rights → 11:00 row
            (4, "a", _ts("2024-01-01 12:05:00")),   # after last → 12:00 row
            (5, "b", _ts("2024-01-01 11:30:00")),   # other key → b's row only
        ],
        "id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01 11:00:00"), 1.0),
            ("a", _ts("2024-01-01 12:00:00"), 2.0),
            ("b", _ts("2024-01-01 09:00:00"), 9.0),
        ],
        "k string, rts timestamp, payload double",
    )
    return left, right


def test_asof_semantics(frames):
    left, right = frames
    out = {
        r.id: r.payload
        for r in asof_join(left, right, "k", "ts", "rts", ["payload"]).collect()
    }
    assert out == {1: None, 2: 1.0, 3: 1.0, 4: 2.0, 5: 9.0}


def test_asof_preserves_left_rowcount(frames):
    left, right = frames
    assert asof_join(left, right, "k", "ts", "rts", ["payload"]).count() == left.count()


def test_asof_plan_single_shuffle_no_nested_loop(frames):
    left, right = frames
    plan = asof_join(left, right, "k", "ts", "rts", ["payload"])._jdf \
        .queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the merge is a window, not a join
    assert "Window" in plan
