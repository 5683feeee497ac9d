"""Segment-level corpus dedup (operators/segments.py): first-occurrence
semantics, reassembly order, empty-survivor handling, determinism."""

import pytest
from pyspark.sql import functions as F

from explora_kafka_spark.operators.segments import segment_dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_duplicate_span_kept_once_in_first_doc(spark):
    span = "a b c d e f g h i j"          # exactly one 10-token segment
    docs = _docs(spark, [
        (1, span + " unique one two three four five six seven eight nine"),
        (2, span + " other uno dos tres cuatro cinco seis siete ocho nueve"),
    ])
    out = {r["doc_id"]: r for r in segment_dedup(docs).collect()}
    # doc 1 keeps both its segments; doc 2 loses the shared span
    assert out[1]["n_segments"] == 2 and out[1]["n_kept"] == 2
    assert out[2]["n_segments"] == 2 and out[2]["n_kept"] == 1
    assert out[2]["text_dedup"].startswith("other")
    assert span in out[1]["text_dedup"] and span not in out[2]["text_dedup"]


def test_fully_duplicated_doc_survives_empty(spark):
    span = "a b c d e f g h i j"
    docs = _docs(spark, [(1, span), (2, span)])
    out = {r["doc_id"]: r for r in segment_dedup(docs).collect()}
    assert out[1]["n_kept"] == 1 and out[1]["text_dedup"] == span
    assert out[2]["n_kept"] == 0 and out[2]["text_dedup"] == ""


def test_within_doc_repeat_also_dedups(spark):
    span = "a b c d e f g h i j"
    docs = _docs(spark, [(7, span + " " + span)])
    out = segment_dedup(docs).collect()[0]
    assert out["n_segments"] == 2 and out["n_kept"] == 1
    assert out["text_dedup"] == span


def test_reassembly_preserves_document_order(spark):
    words = [f"w{i}" for i in range(30)]   # 3 distinct segments, in order
    docs = _docs(spark, [(1, " ".join(words))])
    out = segment_dedup(docs).collect()[0]
    assert out["text_dedup"] == " ".join(words)


def test_normalization_feeds_segmenting(spark):
    # case/whitespace-insensitive: the normalized spans collide
    docs = _docs(spark, [
        (1, "A  B c D e F g H i J"),
        (2, "a b C d E f G h I j"),
    ])
    out = {r["doc_id"]: r for r in segment_dedup(docs).collect()}
    assert out[1]["n_kept"] == 1 and out[2]["n_kept"] == 0


def test_deterministic_under_repartition(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = segment_dedup(docs).collect()
    b = segment_dedup(docs.repartition(13)).collect()
    assert a == b


def test_first_occurrence_is_windowgrouplimit_pruned(spark, sf_dir):
    """The first-occurrence window must plan a PARTIAL WindowGroupLimit
    below the hash exchange: each map task forwards at most ONE
    candidate row per segment hash, so a corpus-wide boilerplate span (a
    maximally hot key) ships O(tasks) rows, not O(occurrences) — the
    hot-key mitigation SCALE.md claims, asserted on the plan."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (segment_dedup(docs)
            ._jdf.queryExecution().executedPlan().toString())
    # both the map-side (Partial) and reduce-side (Final) rank-1 prunes
    assert plan.count("WindowGroupLimit") >= 2, plan
