"""Hand-computed pins for the round-11 lexical/mixture audits
(ttr_profile, zipf_slope, ngram_novelty, length_bucket_drift,
temperature_mix, vocab_coverage, source_pair_jaccard)."""

from __future__ import annotations

import math

from explora_kafka_spark.operators.corpus import length_bucket_drift
from explora_kafka_spark.operators.text import (
    ngram_novelty,
    ttr_profile,
    zipf_slope,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_ttr_profile_hand_example(spark):
    # src tokens: a a b | b c  -> total 5, distinct {a,b,c} = 3;
    # the blank doc's '' phantom token is filtered (ADVICE r11) and
    # a blank-only source reports zero totals with NULL ttr
    df = _docs(spark, [(1, "a a b", "s1"), (2, "b c", "s1"),
                       (3, "x", "s2"), (4, "", "s2"),
                       (5, "", "s3")])
    rows = {r["source"]: r for r in ttr_profile(df).collect()}
    assert rows["s1"]["n_docs"] == 2
    assert rows["s1"]["total_tokens"] == 5
    assert rows["s1"]["distinct_tokens"] == 3
    assert rows["s1"]["ttr_ppm"] == 3 * 1_000_000 // 5
    assert rows["s2"]["total_tokens"] == 1      # '' not counted
    assert rows["s2"]["ttr_ppm"] == 1_000_000
    assert rows["s3"]["n_docs"] == 1
    assert rows["s3"]["total_tokens"] == 0
    assert rows["s3"]["ttr_ppm"] is None


def test_zipf_slope_matches_integer_regression_model(spark):
    # freqs: a=8, b=4, c=2, d=1 -> ranks 1..4
    text = " ".join(["a"] * 8 + ["b"] * 4 + ["c"] * 2 + ["d"])
    df = _docs(spark, [(1, text, "s")])
    row = zipf_slope(df).collect()[0]
    freqs = [8, 4, 2, 1]
    xs = [math.floor(math.log(r) * 1000 + 0.5) for r in (1, 2, 3, 4)]
    ys = [math.floor(math.log(f) * 1000 + 0.5) for f in freqs]
    n = 4
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    num, den = n * sxy - sx * sy, n * sxx - sx * sx
    assert row["n_ranks"] == 4
    assert row["slope_num"] == num
    assert row["slope_den"] == den
    assert row["zipf_slope"] == float(num) / float(den)
    # a power law over ranks should slope steeply negative
    assert row["zipf_slope"] < -0.9


def test_zipf_slope_single_rank_yields_null_slope(spark):
    df = _docs(spark, [(1, "a a a", "s")])
    row = zipf_slope(df).collect()[0]
    assert row["n_ranks"] == 1
    assert row["slope_den"] == 0
    assert row["zipf_slope"] is None


def test_ngram_novelty_hand_example(spark):
    # 3-token docs -> ONE whole-doc 5-gram shingle each; docs 1+2 share
    df = _docs(spark, [(1, "x y z", "s1"), (2, "x y z", "s1"),
                       (3, "q r s", "s1"), (4, "u v w", "s2")])
    rows = {r["source"]: r for r in ngram_novelty(df).collect()}
    assert rows["s1"]["n_docs"] == 3
    assert rows["s1"]["total_shingles"] == 3
    assert rows["s1"]["shared_shingles"] == 2
    assert rows["s1"]["boilerplate_ppm"] == 2 * 1_000_000 // 3
    assert rows["s2"]["shared_shingles"] == 0


def test_length_bucket_drift_hand_example(spark):
    # s1: two 1-token docs (bucket 1); s2: two 2- and 3-token docs
    # (bucket 2). Corpus split 50/50 over the two buckets, so each
    # source's L1 = |1e6 - 5e5| + |0 - 5e5| = 1e6.
    df = _docs(spark, [(1, "a", "s1"), (2, "b", "s1"),
                       (3, "a b", "s2"), (4, "a b c", "s2")])
    rows = {r["source"]: r for r in length_bucket_drift(df).collect()}
    assert rows["s1"]["n_docs"] == 2
    assert rows["s1"]["l1_drift_ppm"] == 1_000_000
    assert rows["s2"]["l1_drift_ppm"] == 1_000_000


def test_length_bucket_drift_identical_distribution_is_zero(spark):
    df = _docs(spark, [(1, "a b", "s1"), (2, "a b c", "s2")])
    # both sources 100% bucket-2 -> zero drift everywhere
    rows = {r["source"]: r for r in length_bucket_drift(df).collect()}
    assert rows["s1"]["l1_drift_ppm"] == 0
    assert rows["s2"]["l1_drift_ppm"] == 0


def test_temperature_mix_hand_example(spark):
    # tokens: s1 = 9, s2 = 1 -> shares 0.9 / 0.1; alpha = 0.7
    df = _docs(spark, [(1, "a b c d e f g h i", "s1"), (2, "z", "s2")])
    from explora_kafka_spark.operators.corpus import temperature_mix
    rows = {r["source"]: r for r in temperature_mix(df).collect()}
    # the operator computes share^alpha as exp(alpha*ln(share)) so
    # both engines share correctly-rounded primitives; model likewise
    w1 = math.floor(math.exp(0.7 * math.log(0.9)) * 1e6 + 0.5)
    w2 = math.floor(math.exp(0.7 * math.log(0.1)) * 1e6 + 0.5)
    assert rows["s1"]["share_ppm"] == 900_000
    assert rows["s2"]["share_ppm"] == 100_000
    assert rows["s1"]["temp_share_ppm"] == w1 * 1_000_000 // (w1 + w2)
    assert rows["s2"]["temp_share_ppm"] == w2 * 1_000_000 // (w1 + w2)
    # alpha < 1 boosts the low-resource source, damps the big one
    assert rows["s2"]["boost_ppm"] > 1_000_000 > rows["s1"]["boost_ppm"]


def test_vocab_coverage_hand_example(spark):
    # freqs: a=3, b=2, c=1 -> total 6, vocab 3
    from explora_kafka_spark.operators.text import vocab_coverage
    df = _docs(spark, [(1, "a a a b b c", "s")])
    rows = {r["threshold_ppm"]: r for r in vocab_coverage(df).collect()}
    assert rows[500_000]["target_tokens"] == 3
    assert rows[500_000]["min_vocab"] == 1          # "a" alone covers 3/6
    assert rows[900_000]["target_tokens"] == 6      # ceil(5.4) = 6
    assert rows[900_000]["min_vocab"] == 3          # needs the full vocab
    assert rows[990_000]["min_vocab"] == 3
    assert rows[500_000]["total_vocab"] == 3
    assert rows[500_000]["total_tokens"] == 6


def test_vocab_coverage_mid_class_boundary(spark):
    # freqs: a=4, b=4, c=4, d=4 (one class of four) -> 75% needs 3 of 4
    from explora_kafka_spark.operators.text import vocab_coverage
    df = _docs(spark, [(1, " ".join(["a", "b", "c", "d"] * 4), "s")])
    rows = {r["threshold_ppm"]: r
            for r in vocab_coverage(df, thresholds_ppm=(750_000,))
            .collect()}
    assert rows[750_000]["target_tokens"] == 12
    assert rows[750_000]["min_vocab"] == 3


def test_source_pair_jaccard_hand_example(spark):
    from explora_kafka_spark.operators.corpus import source_pair_jaccard

    df = _docs(spark, [(1, "a b c", "s1"), (2, "b c d", "s2"),
                       (3, "x", "s3"), (4, "c b", "s2")])
    rows = [tuple(r) for r in source_pair_jaccard(df).collect()]
    # s1={a,b,c}, s2={b,c,d}, s3={x}: |s1 ∩ s2|=2, union 4 -> 500000;
    # pairs with an EMPTY intersection are absent entirely (inner
    # join on the token — the documented contract), so s3 never
    # appears
    assert rows == [("s1", "s2", 3, 3, 2, 500_000)]


def test_source_pair_jaccard_ignores_blank_documents(spark):
    from explora_kafka_spark.operators.corpus import source_pair_jaccard

    # two sources sharing ONLY blank docs must NOT read as mirrors
    df = _docs(spark, [(1, "", "e1"), (2, "   ", "e2"),
                       (3, "a b", "e1"), (4, "c d", "e2")])
    rows = [tuple(r) for r in source_pair_jaccard(df).collect()]
    assert rows == []  # no real shared vocab -> no pair row at all
