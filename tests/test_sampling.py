"""Sampling / splitting / redaction operator tests: determinism under
re-partitioning, fraction accuracy, subset/partition invariants, and
plan shape (all three must stay shuffle-free — map-side only)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from explora_kafka_spark.operators import sampling as SMP

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# train/val/test split
# ---------------------------------------------------------------------------


def test_split_partitions_corpus_completely(docs):
    out = SMP.split_assign(docs)
    n = docs.count()
    by = {r["split"]: r["count"]
          for r in out.groupBy("split").count().collect()}
    assert sum(by.values()) == n
    assert set(by) <= {"train", "val", "test"}
    # 90/5/5 within sampling tolerance on a small corpus
    assert by["train"] / n == pytest.approx(0.9, abs=0.06)


def test_split_deterministic_under_repartition(docs):
    a = {(r["doc_id"], r["split"])
         for r in SMP.split_assign(docs).select("doc_id", "split").collect()}
    b = {(r["doc_id"], r["split"])
         for r in SMP.split_assign(docs.repartition(13))
         .select("doc_id", "split").collect()}
    assert a == b


def test_split_respects_custom_weights(docs):
    out = SMP.split_assign(docs, weights=(("a", 0.5), ("b", 0.5)))
    splits = {r["split"] for r in out.select("split").distinct().collect()}
    assert splits == {"a", "b"}


# ---------------------------------------------------------------------------
# stratified sampling
# ---------------------------------------------------------------------------


def test_oracle_sql_escapes_quotes(spark, tmp_path):
    """A stratum / split name / salt containing a single quote must not
    break (or worse, alter) the DuckDB oracle SQL (VERDICT r5 #7)."""
    import duckdb

    pdf = __import__("pandas").DataFrame(
        {"doc_id": list(range(20)),
         "lang": ["o'brien" if i % 2 else "en" for i in range(20)]}
    )
    con = duckdb.connect()
    con.register("docs", pdf)
    frac = {"o'brien": 0.5}
    sql = SMP.stratified_sample_sql(
        "docs", frac, strata_col="lang", salt="sa'lt")
    oracle = {r[0] for r in con.execute(sql).fetchall()}
    sdf = spark.createDataFrame(pdf)
    got = {r["doc_id"]
           for r in SMP.stratified_sample(sdf, frac, salt="sa'lt")
           .select("doc_id").collect()}
    assert got == oracle

    split_sql = SMP.split_assign_sql(
        "docs", weights=(("tr'ain", 0.5), ("te'st", 0.5)), salt="sa'lt")
    oracle_split = dict(
        con.execute(f"SELECT doc_id, split FROM ({split_sql})").fetchall())
    got_split = {
        r["doc_id"]: r["split"]
        for r in SMP.split_assign(
            sdf, weights=(("tr'ain", 0.5), ("te'st", 0.5)), salt="sa'lt"
        ).select("doc_id", "split").collect()}
    assert got_split == oracle_split


def test_stratified_sample_is_subset_and_respects_caps(docs):
    frac = {"en": 0.3}
    sampled = SMP.stratified_sample(docs, frac)
    n_en = docs.filter(F.col("lang") == "en").count()
    k_en = sampled.filter(F.col("lang") == "en").count()
    assert k_en / n_en == pytest.approx(0.3, abs=0.1)
    # non-capped strata survive whole
    other_in = docs.filter(F.col("lang") != "en").count()
    other_out = sampled.filter(F.col("lang") != "en").count()
    assert other_in == other_out
    # subset property: every sampled id exists in the input
    assert sampled.join(docs, "doc_id", "left_anti").count() == 0


def test_stratified_sample_deterministic(docs):
    frac = {"en": 0.5, "fr": 0.25}
    a = {r["doc_id"] for r in
         SMP.stratified_sample(docs, frac).select("doc_id").collect()}
    b = {r["doc_id"] for r in
         SMP.stratified_sample(docs.repartition(7), frac)
         .select("doc_id").collect()}
    assert a == b


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------


def test_redact_pii_scrubs_and_counts(spark):
    rows = [
        (1, "mail me at alice@example.com or call 555 0100 4242 now"),
        (2, "server at 192.168.1.77 went down"),
        (3, "clean text with no pii at all"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in SMP.redact_pii(df).collect()}
    assert "<EMAIL>" in out[1]["redacted"]
    assert "<PHONE>" in out[1]["redacted"]
    assert "alice@example.com" not in out[1]["redacted"]
    assert out[1]["n_redactions"] == 2
    assert out[2]["redacted"] == "server at <IP> went down"
    assert out[2]["n_redactions"] == 1
    assert out[3]["redacted"] == rows[2][1]
    assert out[3]["n_redactions"] == 0


# ---------------------------------------------------------------------------
# plan shape: all three operators are map-side only (no shuffle)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("build", [
    lambda d: SMP.split_assign(d),
    lambda d: SMP.stratified_sample(d, {"en": 0.5}),
    lambda d: SMP.redact_pii(d),
])
def test_operators_are_shuffle_free(docs, build):
    plan = _physical_plan(build(docs))
    assert "Exchange" not in plan, plan


# ---------------------------------------------------------------------------
# property-based cross-engine parity: the md5 bucket math must agree
# between pure Python (hashlib), the Spark Column, and the SQL fragment
# on arbitrary keys/salts — same correctness-triangle pattern as
# tests/test_geo_properties.py
# ---------------------------------------------------------------------------

import hashlib

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

key_s = st.text(
    alphabet=st.characters(min_codepoint=48, max_codepoint=122),
    min_size=1, max_size=24,
)
salt_s = st.sampled_from(["split", "sample", "s2"])


def _py_bucket(key: str, salt: str) -> int:
    h = int(hashlib.md5((salt + key).encode()).hexdigest()[:15], 16)
    return h % SMP.N_BUCKETS


@settings(max_examples=25, deadline=None)
@given(key=key_s, salt=salt_s)
def test_bucket_sql_matches_python(key, salt):
    sql = SMP._bucket_sql(f"'{key}'", salt)
    got = duckdb.sql(f"SELECT {sql}").fetchone()[0]
    assert got == _py_bucket(key, salt)


def test_bucket_spark_matches_python(spark):
    keys = ["0", "42", "doc-x", "ZZ99", "a b", "7e4"]
    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    from pyspark.sql import functions as F2
    got = {r["k"]: r["b"] for r in df.select(
        "k", SMP._bucket_col(F2.col("k"), "split").alias("b")).collect()}
    assert got == {k: _py_bucket(k, "split") for k in keys}


def test_group_aware_split_keeps_groups_together(spark, docs):
    """No near-dup group straddles a split boundary — the leakage guard;
    exact duplicates demonstrably co-assign."""
    dup = docs.limit(3).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text", "lang",
        "source", "n_chars")
    corpus = docs.unionByName(dup)
    out = SMP.group_aware_split(corpus)
    straddling = (
        out.groupBy("group_id")
        .agg(F.countDistinct("split").alias("ns"))
        .filter(F.col("ns") > 1).count())
    assert straddling == 0
    assert out.count() == corpus.count()
    # each injected exact dup shares its original's group and split
    rows = {r["doc_id"]: r for r in out.collect()}
    for orig in [r["doc_id"] for r in docs.limit(3).collect()]:
        assert rows[orig]["group_id"] == rows[orig + 1_000_000]["group_id"]
        assert rows[orig]["split"] == rows[orig + 1_000_000]["split"]


def test_quality_weighted_sample_invariant_and_deterministic(spark, docs):
    out = SMP.quality_weighted_sample(docs).collect()
    assert out, "synthetic corpus should keep some docs"
    assert all(r["u"] < r["quality_score"] for r in out)
    again = SMP.quality_weighted_sample(docs.repartition(7)).collect()
    assert [tuple(r) for r in out] == [tuple(r) for r in again]
    # a different salt draws a different-but-valid sample
    other = SMP.quality_weighted_sample(docs, salt="other").collect()
    assert all(r["u"] < r["quality_score"] for r in other)


def test_epoch_upsample_copy_counts(spark, docs):
    out = SMP.epoch_upsample(
        docs, {"src0": 2.5, "src7": 0.25}, default=1.0)
    per_doc = out.groupBy("doc_id", "source").count().collect()
    for r in per_doc:
        if r["source"] == "src0":
            assert r["count"] in (2, 3)
        elif r["source"] == "src7":
            assert r["count"] == 1  # only docs that drew the copy appear
        else:
            assert r["count"] == 1
    # exact-integer factors are deterministic multiplication
    n_src3 = docs.filter(F.col("source") == "src3").count()
    got3 = out.filter(F.col("source") == "src3").count()
    assert got3 == n_src3
    # thinning really thins on this corpus
    n7 = docs.filter(F.col("source") == "src7").count()
    got7 = out.filter(F.col("source") == "src7").count()
    assert 0 < got7 < n7
    # copy_idx is 1..n per doc and stable under repartition
    again = SMP.epoch_upsample(
        docs.repartition(9), {"src0": 2.5, "src7": 0.25}, default=1.0)
    assert sorted(map(tuple, out.collect())) == \
        sorted(map(tuple, again.collect()))


def test_curriculum_select_per_source_quota_and_order(spark, sf_dir):
    from explora_kafka_spark.operators.sampling import curriculum_select

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    frac = 0.3
    out = curriculum_select(docs, frac=frac).toPandas()
    src_n = docs.groupBy("source").count().toPandas().set_index("source")
    import math
    for src, grp in out.groupby("source"):
        quota = math.ceil(src_n.loc[src, "count"] * frac)
        assert len(grp) == quota
        # ranks contiguous from 1 and quality non-increasing along rank
        assert sorted(grp["rank"]) == list(range(1, quota + 1))
        g = grp.sort_values("rank")
        assert (g["quality_score"].diff().dropna() <= 1e-12).all()


def test_curriculum_select_is_deterministic_and_subset(spark, sf_dir):
    from explora_kafka_spark.operators.sampling import curriculum_select

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = curriculum_select(docs, frac=0.4).collect()
    b = curriculum_select(docs.repartition(9), frac=0.4).collect()
    assert a == b
    # a tighter cut is a prefix of a looser cut per source
    tight = {(r["source"], r["doc_id"])
             for r in curriculum_select(docs, frac=0.2).collect()}
    loose = {(r["source"], r["doc_id"]) for r in a}
    assert tight <= loose


def test_weighted_sample_topk_exact_size_and_invariants(spark):
    from explora_kafka_spark.operators.sampling import weighted_sample_topk

    docs = spark.createDataFrame(
        [(i, (i % 7) + 1) for i in range(60)] + [(100, 0), (101, -5)],
        "doc_id bigint, n_chars bigint")
    out = weighted_sample_topk(docs, "n_chars", k=25).collect()
    # exactly k rows, ranked 1..k, non-positive weights never sampled
    assert len(out) == 25
    assert [r["rank"] for r in out] == list(range(1, 26))
    assert all(r["doc_id"] not in (100, 101) for r in out)
    pris = [r["priority_mu"] for r in out]
    assert pris == sorted(pris, reverse=True)
    # deterministic under repartition
    again = weighted_sample_topk(docs.repartition(7), "n_chars",
                                 k=25).collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in out]
    # scaling every weight by a constant preserves the selected SET
    doubled = spark.createDataFrame(
        [(i, 2 * ((i % 7) + 1)) for i in range(60)],
        "doc_id bigint, n_chars bigint")
    sel_a = {r["doc_id"] for r in out}
    sel_b = {r["doc_id"]
             for r in weighted_sample_topk(doubled, "n_chars",
                                           k=25).collect()}
    assert sel_a == sel_b


# ---------------------------------------------------------------------------
# doremi_weights
# ---------------------------------------------------------------------------


def _doremi_expected(src_tokens, steps=10, eta_ppm=100_000,
                     smooth_ppm=10_000, excess_cap_mu=12_000_000):
    """Pure-Python mirror of the exact-integer DoReMi recurrence.
    src_tokens: {source: [token, ...]} — whitespace tokens as the
    operator sees them."""
    import math
    from collections import Counter

    vocab = Counter(t for toks in src_tokens.values() for t in toks)
    T, V = sum(vocab.values()), len(vocab)
    mu = {t: math.floor(-math.log2((c + 1) / (T + V)) * 1e6 + 0.5)
          for t, c in vocab.items()}
    per = {s: (len(toks), sum(mu[t] for t in toks))
           for s, toks in src_tokens.items()}
    tmu = sum(smu for _, smu in per.values())
    tn = sum(n for n, _ in per.values())
    S = len(per)
    base = tmu // tn
    loss = {s: smu // n for s, (n, smu) in per.items()}
    excess = {s: min(max(loss[s] - base, 0), excess_cap_mu) for s in per}
    sw = {s: 0 for s in per}
    for t in range(1, steps + 1):
        e = {s: math.floor(
            math.exp((eta_ppm * t * excess[s]) / 1e12) * 1e6 + 0.5)
            for s in per}
        se = sum(e.values())
        for s in per:
            sw[s] += e[s] * 1_000_000 // se
    return {
        s: (per[s][0], loss[s], excess[s],
            ((1_000_000 - smooth_ppm) * (sw[s] // steps)
             + smooth_ppm * (1_000_000 // S)) // 1_000_000)
        for s in per
    }


def test_doremi_weights_hand_mirror(spark):
    rows = [
        (1, "the cat sat on the mat", "web"),
        (2, "the dog sat", "web"),
        (3, "quantum chromodynamics lattice gauge", "papers"),
        (4, "le chat est sur le tapis", "books"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id bigint, text string, source string")
    got = {r["source"]: (r["n_tokens"], r["loss_mu"], r["excess_mu"],
                         r["weight_ppm"])
           for r in SMP.doremi_weights(docs).collect()}
    want = _doremi_expected({
        "web": "the cat sat on the mat the dog sat".split(),
        "papers": "quantum chromodynamics lattice gauge".split(),
        "books": "le chat est sur le tapis".split(),
    })
    assert got == want
    # rare-vocabulary sources carry positive excess and beat uniform
    assert got["papers"][2] > 0
    assert got["papers"][3] > got["web"][3]


def test_doremi_weights_sum_and_monotonicity(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = SMP.doremi_weights(docs).collect()
    s = len(out)
    total = sum(r["weight_ppm"] for r in out)
    # ppm floor losses only: within S ppm below 1e6, never above
    assert 1_000_000 - 3 * s <= total <= 1_000_000
    # weight is monotone in excess (equal excess -> equal weight)
    by_excess = sorted(out, key=lambda r: r["excess_mu"])
    for a, b in zip(by_excess, by_excess[1:]):
        assert a["weight_ppm"] <= b["weight_ppm"]


def test_doremi_weights_caps_extreme_excess(spark):
    """A hapax-only source inside a huge repetitive corpus drives raw
    excess past the 12e6 µbit cap — the clamp must engage (keeping the
    µ-rounded exp score far from BIGINT overflow, where Spark's
    non-ANSI wrap would silently diverge from DuckDB's error) and the
    output must still match the Python mirror exactly."""
    big = "x " * 60_000
    rows = [(1, big, "bulk"), (2, "qz wq zq", "rare")]
    docs = spark.createDataFrame(
        rows, "doc_id bigint, text string, source string")
    out = {r["source"]: r for r in SMP.doremi_weights(docs).collect()}
    assert out["rare"]["excess_mu"] == 12_000_000  # clamped
    want = _doremi_expected({"bulk": big.split(), "rare": "qz wq zq".split()})
    got = {s: (r["n_tokens"], r["loss_mu"], r["excess_mu"],
               r["weight_ppm"]) for s, r in out.items()}
    assert got == want
    assert 0 < out["rare"]["weight_ppm"] <= 1_000_000


def test_doremi_weights_uniform_when_no_excess(spark):
    # identical sources -> zero excess everywhere -> exactly uniform
    rows = [(i, "same text here", f"s{i % 4}") for i in range(8)]
    docs = spark.createDataFrame(
        rows, "doc_id bigint, text string, source string")
    out = SMP.doremi_weights(docs).collect()
    assert len(out) == 4
    assert len({r["weight_ppm"] for r in out}) == 1
