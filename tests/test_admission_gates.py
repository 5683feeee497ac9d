"""Hand-pins for the round-11 admission-gate compositions
(expect_embeddings projection, near_dup_cluster_profile)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from explora_kafka_spark.operators import expectations as EXP
from explora_kafka_spark.operators.dedup import near_dup_cluster_profile


def test_embedding_gate_flags_bad_vectors(spark):
    import __spark_entry__ as E

    rows = [
        (1, [1.0 / math.sqrt(2)] * 2 + [0.0] * 62),   # unit, dim 64
        (2, [0.0] * 64),                              # zero vector
        (3, [0.5] * 32),                              # wrong dim
        (4, [float("nan")] + [0.0] * 63),             # NaN
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    stats = emb.select(
        F.size("embedding").alias("dim"),
        F.expr(E._EMB_STATS_SPARK).alias("norm2_mu"),
        F.expr("exists(embedding, v -> isnan(CAST(v AS DOUBLE)))")
        .alias("has_nan"))
    got = {r["name"]: r for r in
           EXP.expect(stats, E._EMB_EXPECTATIONS).collect()}
    assert got["dim_is_64"]["n_pass"] == 3
    assert got["no_nan"]["n_pass"] == 3
    # NaN µunits fold via floor(NaN)=NULL-ish path: the nonzero check
    # counts vectors whose exact integer norm is positive
    assert got["nonzero_vector"]["n_pass"] <= 3
    assert not got["dim_is_64"]["ok"]
    # the unit vector sits inside the ±2% band
    assert got["unit_norm_band"]["n_pass"] >= 1


def test_near_dup_cluster_profile_hand_example(spark):
    docs = spark.createDataFrame(
        [(1, "the same exact text here", "s"),
         (2, "the same exact text here", "s"),
         (3, "something entirely different", "s")],
        "doc_id long, text string, source string")
    rows = [tuple(r) for r in near_dup_cluster_profile(docs).collect()]
    # one pair group (removes 1), one singleton (removes 0)
    assert rows == [(1, 1, 1, 0), (2, 1, 2, 1)]


def test_blocklist_filter_hand_example(spark):
    from explora_kafka_spark.operators.quality_rules import blocklist_filter

    docs = spark.createDataFrame(
        [(1, "this is slow and broken text", "s1"),   # 2 distinct hits
         (2, "perfectly fine text", "s1"),            # 0 hits
         (3, "slow slow slow", "s2")],                # 1 DISTINCT hit
        "doc_id long, text string, source string")
    rows = {r["source"]: r for r in blocklist_filter(docs).collect()}
    assert rows["s1"]["n_docs"] == 2
    assert rows["s1"]["flagged_docs"] == 1
    assert rows["s1"]["total_hits"] == 2        # distinct per doc
    assert rows["s1"]["flagged_ppm"] == 500_000
    assert rows["s2"]["flagged_docs"] == 1
    assert rows["s2"]["total_hits"] == 1        # dedup'd within doc
    assert rows["s2"]["flagged_ppm"] == 1_000_000
