"""LSH hot-bucket skew: prove the SCALE.md claim that AQE's skew-join
split fires on corpus-wide near-identical content (VERDICT r6 item 5 —
a plan/metrics assertion, not prose).

A corpus where half the documents share one MinHash signature puts every
copy of that signature into the SAME band buckets, so the banded
candidate equi-join receives one pathologically hot join key per band.
At cluster scale the partition holding a hot bucket would straggle; AQE
skew handling splits it into advisory-sized chunks and replicates the
matching side. The thresholds here are shrunk so the same mechanism is
observable at test size.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from explora_kafka_spark.operators import dedup as D

_SKEW_CONFS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # shrink detection thresholds so a unit-test-sized hot bucket is
    # "skewed" by the same rule a 100 TB hot bucket would be
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    # the candidate join feeds the dedup aggregation's shuffle, and by
    # default AQE skips skew handling when the split would invalidate the
    # join's output partitioning for a downstream exchange; at real scale
    # (and in the plain candidate-pairs pipeline) force it — trading one
    # extra (cheap) shuffle for unsticking the straggler partition
    "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4KB",
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
    # the test corpus is tiny; broadcasting would bypass the shuffle
    # join whose skew handling we are proving
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.shuffle.partitions": "8",
}


@pytest.fixture()
def skew_confs(spark):
    old = {}
    for k, v in _SKEW_CONFS.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:  # noqa: BLE001 — unset key
            old[k] = None
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _sigs(spark, n_hot: int, n_cold: int):
    """Hot docs collide in band 0 only (shared first slice) and carry
    RANDOM second slices: AQE's skew detector works on COMPRESSED map
    output sizes, and fully identical signatures compress to almost
    nothing — the partition would be row-skewed but not byte-skewed. One
    shared band is all LSH needs to make every hot pair a candidate."""
    rng = random.Random(3)
    hot_head = [7] * 8
    rows = [(i, hot_head + [rng.randrange(1 << 40) for _ in range(8)])
            for i in range(n_hot)] + [
        (10_000 + i, [rng.randrange(1 << 40) for _ in range(16)])
        for i in range(n_cold)
    ]
    return spark.createDataFrame(rows, "doc_id: long, sig: array<long>")


def test_lsh_hot_bucket_triggers_aqe_skew_split(spark, skew_confs):
    sigs = _sigs(spark, n_hot=400, n_cold=100)
    pairs = D.lsh_candidate_pairs(sigs)
    # execute THIS DataFrame's query (count() would plan a separate query
    # whose adaptive plan never finalizes here), then read the final plan
    n = len(pairs.collect())
    # every hot pair is a candidate (est_jaccard 1.0), so the hot bucket
    # really was the dominant join key
    assert n >= 400 * 399 // 2
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "skew" in plan.lower(), (
        "AQE skew-join split did not fire on the hot band bucket:\n" + plan
    )


def test_lsh_skew_split_result_identical(spark, skew_confs):
    """The skew split is a physical rewrite only — candidate pairs are
    identical with AQE skew handling on and off."""
    sigs = _sigs(spark, n_hot=60, n_cold=60)
    with_skew = sorted(
        tuple(r) for r in D.lsh_candidate_pairs(sigs).collect()
    )
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    without = sorted(
        tuple(r) for r in D.lsh_candidate_pairs(sigs).collect()
    )
    assert with_skew == without
    hot = [t for t in with_skew if t[2] >= 0.5]  # 8 shared of 16
    assert len(hot) >= 60 * 59 // 2


def test_band_width_knob_bounds_bucket_selectivity(spark):
    """The r knob (rows_per_band): wider bands -> stricter buckets ->
    fewer candidates. With 2 rows/band only docs agreeing on BOTH slice
    components collide; with 1 row/band any shared component collides.
    This is the designed-in bound on bucket size when content is merely
    similar (not identical)."""
    rng = random.Random(9)
    base = [rng.randrange(1 << 40) for _ in range(16)]
    rows = []
    for i in range(40):
        sig = list(base)
        # perturb a deterministic half of the components per doc
        for j in range(i % 16, 16, 2):
            sig[j] = rng.randrange(1 << 40)
        rows.append((i, sig))
    sigs = spark.createDataFrame(rows, "doc_id: long, sig: array<long>")
    wide = D.lsh_candidate_pairs(sigs, num_bands=8, rows_per_band=2).count()
    narrow = D.lsh_candidate_pairs(sigs, num_bands=16, rows_per_band=1).count()
    assert wide < narrow, (wide, narrow)
