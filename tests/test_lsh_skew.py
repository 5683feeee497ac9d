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


def test_anchor_cap_invisible_until_it_engages(spark):
    """max_bucket at or above the largest bucket is a no-op: identical
    pair set, identical estimates (the cap's contract — buckets at or
    under the cap emit their full C(b,2) expansion)."""
    sigs = _sigs(spark, n_hot=40, n_cold=40)
    uncapped = sorted(tuple(r) for r in
                      D.lsh_candidate_pairs(sigs).collect())
    lazy_cap = sorted(tuple(r) for r in
                      D.lsh_candidate_pairs(sigs, max_bucket=10_000)
                      .collect())
    assert uncapped == lazy_cap


def test_anchor_cap_bounds_hot_bucket_linear(spark):
    """A 50-member bucket of IDENTICAL signatures (collides in all 8
    bands) emits C(50,2)=1225 pairs uncapped; with max_bucket=5 each
    band's bucket emits only anchor×member pairs — c·(b−c)+C(c,2)=235
    per band, and the cross-band union stays far under the quadratic
    count while every member keeps at least one anchor edge (the
    connectivity the downstream grouping needs)."""
    rows = [(i, [7] * 16) for i in range(50)]
    sigs = spark.createDataFrame(rows, "doc_id: long, sig: array<long>")
    assert D.lsh_candidate_pairs(sigs).count() == 50 * 49 // 2
    capped = D.lsh_candidate_pairs(sigs, max_bucket=5).collect()
    # >= one band's anchor star, <= the union of 8 per-band stars
    assert 5 * 45 + 10 <= len(capped) <= 8 * (5 * 45 + 10)
    assert len(capped) < 50 * 49 // 2
    touched = {r["doc_a"] for r in capped} | {r["doc_b"] for r in capped}
    assert touched == set(range(50))
    assert all(r["est_jaccard"] == 1.0 for r in capped)


def test_anchor_cap_keeps_clique_grouped(spark):
    """dedup_groups with the cap engaged still collapses an identical-
    text clique into ONE group: anchors keep every member connected at
    the candidate level, and identical docs survive the exact-Jaccard
    rerank on every anchor edge."""
    text = ("the selfsame boilerplate paragraph repeated verbatim "
            "across every single mirrored page of the template site")
    docs = spark.createDataFrame(
        [(i, text) for i in range(30)] + [(100, "something quite else "
                                          "entirely different here")],
        "doc_id: long, text: string")
    groups = D.dedup_groups(docs, threshold=0.6, shingle_n=2,
                            num_bands=8, max_bucket=3).collect()
    by_id = {r["doc_id"]: r["group_id"] for r in groups}
    assert {by_id[i] for i in range(30)} == {0}
    assert by_id[100] == 100


def test_anchor_cap_preserves_dedup_check_verdicts(spark, tmp_path):
    """Serve-time cap on dedup_check: the SET of flagged batch docs is
    unchanged (every probe still meets its bucket's anchors); only the
    per-probe match enumeration shrinks."""
    text = ("the selfsame boilerplate paragraph repeated verbatim "
            "across every single mirrored page of the template site")
    corpus = spark.createDataFrame(
        [(i, text) for i in range(40)], "doc_id: long, text: string")
    D.build_dedup_index(corpus, str(tmp_path / "lsh"), shingle_n=2,
                        num_bands=8)
    batch = spark.createDataFrame(
        [(900, text), (901, "fresh unrelated content nothing shared "
                            "with the boilerplate clique at all")],
        "doc_id: long, text: string")
    full = D.dedup_check(spark, batch, str(tmp_path / "lsh"),
                         shingle_n=2, num_bands=8).collect()
    capped = D.dedup_check(spark, batch, str(tmp_path / "lsh"),
                           shingle_n=2, num_bands=8,
                           max_bucket=4).collect()
    assert {r["doc_id"] for r in full} == {900}
    assert {r["doc_id"] for r in capped} == {900}
    assert len(capped) < len(full) == 40
    # at most num_bands × max_bucket anchors enumerated per probe
    assert len(capped) <= 8 * 4


def test_cap_audit_prices_the_drop(spark):
    """lsh_cap_audit's integer pair arithmetic: on a corpus with one
    50-member identical-text bucket per band, pairs_full = C(50,2) and
    pairs_capped = c·(b−c)+C(c,2) for every band; dropped = the
    difference. The audit never materializes a pair."""
    text = ("the selfsame boilerplate paragraph repeated verbatim "
            "across every single mirrored page of the template site")
    docs = spark.createDataFrame(
        [(i, text) for i in range(50)], "doc_id: long, text: string")
    audit = D.lsh_cap_audit(docs, max_bucket=5, shingle_n=2,
                            num_bands=8).collect()
    assert len(audit) == 8
    for r in audit:
        assert r["n_buckets"] == 1 and r["n_hot"] == 1
        assert r["max_bucket_size"] == 50
        assert r["pairs_full"] == 50 * 49 // 2
        assert r["pairs_capped"] == 5 * 45 + 10
        assert r["pairs_dropped"] == r["pairs_full"] - r["pairs_capped"]


# ---------------------------------------------------------------------------
# the anchor cap on the hamming-banded families (round 14 follow-through:
# fp_banded_pairs shared by simhash_near_dup and phash_near_dup)
# ---------------------------------------------------------------------------


def test_simhash_cap_invisible_until_it_engages(spark):
    """max_bucket at or above the largest band bucket is a no-op on the
    hamming-banded family too: identical (doc_a, doc_b, hamming) set."""
    docs = spark.createDataFrame(
        [(i, f"wholly distinct document number {i} with its own words "
             f"{i * 7} and {i * 13}") for i in range(30)],
        "doc_id: long, text: string")
    full = sorted(tuple(r) for r in D.simhash_near_dup(docs).collect())
    lazy = sorted(tuple(r) for r in
                  D.simhash_near_dup(docs, max_bucket=10_000).collect())
    assert full == lazy


def test_simhash_cap_bounds_identical_fingerprint_clique(spark):
    """Byte-identical boilerplate shares ONE simhash, so one bucket per
    band holds every copy — the family's worst hot-bucket case. With
    max_bucket=c the clique emits anchor×member pairs only (bounded by
    num_bands per-band stars), every member keeps an anchor edge, and
    every surviving pair has hamming 0 (identical fingerprints pass
    the exact filter on every anchor edge)."""
    text = ("the selfsame boilerplate paragraph repeated verbatim "
            "across every single mirrored page of the template site")
    docs = spark.createDataFrame(
        [(i, text) for i in range(40)], "doc_id: long, text: string")
    assert D.simhash_near_dup(docs).count() == 40 * 39 // 2
    capped = D.simhash_near_dup(docs, max_bucket=5).collect()
    assert 5 * 35 + 10 <= len(capped) <= 4 * (5 * 35 + 10)
    assert len(capped) < 40 * 39 // 2
    touched = {r["doc_a"] for r in capped} | {r["doc_b"] for r in capped}
    assert touched == set(range(40))
    assert all(r["hamming"] == 0 for r in capped)


def test_simhash_capped_pairs_subset_and_deterministic(spark):
    """Capped pairs ⊆ uncapped pairs (the cap only removes candidates,
    never invents them), and the anchor election is deterministic
    under repartitioning (md5 rank + id tie-break, not row order)."""
    docs = spark.createDataFrame(
        [(i, ("shared template header boilerplate " * 3
              if i % 3 == 0 else f"unique content {i} " * 4) + str(i))
         for i in range(60)],
        "doc_id: long, text: string")
    full = {(r["doc_a"], r["doc_b"]) for r in
            D.simhash_near_dup(docs).collect()}
    capped = sorted(tuple(r) for r in
                    D.simhash_near_dup(docs, max_bucket=3).collect())
    assert {(a, b) for a, b, _ in capped} <= full
    again = sorted(tuple(r) for r in
                   D.simhash_near_dup(docs.repartition(13), max_bucket=3)
                   .collect())
    assert capped == again


def test_phash_cap_bounds_identical_payload_clique(spark):
    """The media tier: identical payloads share one phash; the cap
    bounds the bucket's expansion while keeping every member anchored
    (hamming 0 on every anchor edge)."""
    from explora_kafka_spark.operators import multimodal as MM
    payload = ("the very same encoded thumbnail payload bytes repeated "
               "across every mirrored page of the template site")
    docs = spark.createDataFrame(
        [(i, payload) for i in range(30)], "doc_id: long, text: string")
    media = MM.media_from_documents(docs)
    assert MM.phash_near_dup(media).count() == 30 * 29 // 2
    capped = MM.phash_near_dup(media, max_bucket=4).collect()
    assert 4 * 26 + 6 <= len(capped) <= 8 * (4 * 26 + 6)
    assert len(capped) < 30 * 29 // 2
    touched = {r["media_a"] for r in capped} | {r["media_b"] for r in capped}
    assert touched == set(range(30))
    assert all(r["hamming"] == 0 for r in capped)


def test_phash_check_cap_preserves_identical_clique_verdicts(spark, tmp_path):
    """Serve-time cap on phash_check: a probe identical to a stored
    40-copy template still flags (hamming 0 against every anchor) and
    match_id becomes the smallest ANCHOR id — present in the uncapped
    match set; a novel probe stays novel."""
    from explora_kafka_spark.operators import multimodal as MM
    payload = ("the very same encoded thumbnail payload bytes repeated "
               "across every mirrored page of the template site")
    corpus = spark.createDataFrame(
        [(i, payload) for i in range(40)], "doc_id: long, text: string")
    MM.build_phash_index(MM.media_from_documents(corpus),
                         str(tmp_path / "ph"))
    batch = spark.createDataFrame(
        [(900, payload), (901, "completely different bytes with nothing "
                               "shared at all in any block of the hash")],
        "doc_id: long, text: string")
    full = {r["media_id"]: (r["is_dup"], r["match_id"]) for r in
            MM.phash_check(spark, MM.media_from_documents(batch),
                           str(tmp_path / "ph")).collect()}
    capped = {r["media_id"]: (r["is_dup"], r["match_id"]) for r in
              MM.phash_check(spark, MM.media_from_documents(batch),
                             str(tmp_path / "ph"), max_bucket=4).collect()}
    assert full[900][0] is True and capped[900][0] is True
    assert capped[900][1] in set(range(40))
    assert full[901] == (False, None) and capped[901] == (False, None)
    # determinism of the election under index re-read
    again = {r["media_id"]: (r["is_dup"], r["match_id"]) for r in
             MM.phash_check(spark, MM.media_from_documents(batch),
                            str(tmp_path / "ph"), max_bucket=4).collect()}
    assert capped == again


def test_simhash_cap_audit_prices_the_identical_clique(spark):
    """fp_cap_audit on the hamming banding: a 50-copy identical-text
    clique is one hot bucket in EVERY band — pairs_full = C(50,2) per
    band, pairs_capped = c·(b−c)+C(c,2), dropped = the difference; no
    pair materialized."""
    text = ("the selfsame boilerplate paragraph repeated verbatim "
            "across every single mirrored page of the template site")
    docs = spark.createDataFrame(
        [(i, text) for i in range(50)], "doc_id: long, text: string")
    audit = D.simhash_cap_audit(docs, max_bucket=5).collect()
    assert len(audit) == 4
    for r in audit:
        assert r["n_buckets"] == 1 and r["n_hot"] == 1
        assert r["max_bucket_size"] == 50
        assert r["pairs_full"] == 50 * 49 // 2
        assert r["pairs_capped"] == 5 * 45 + 10
        assert r["pairs_dropped"] == r["pairs_full"] - r["pairs_capped"]
    # and a cap above every bucket drops nothing
    lazy = D.simhash_cap_audit(docs, max_bucket=100).collect()
    assert all(r["pairs_dropped"] == 0 and r["n_hot"] == 0 for r in lazy)
