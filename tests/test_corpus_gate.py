"""Streaming corpus-admission gate (streaming/corpus_gate.py): batch
semantics, index composition, and stream ≡ batch equivalence."""

import pytest
from pyspark.sql import functions as F

from explora_kafka_spark.operators.contamination import build_shingle_index
from explora_kafka_spark.operators.dedup import build_dedup_index
from explora_kafka_spark.streaming.corpus_gate import gate_batch, gate_stream

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def indexes(spark, docs, tmp_path_factory):
    d = tmp_path_factory.mktemp("gate")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    build_shingle_index(corpus, str(d / "sh"))
    build_dedup_index(corpus, str(d / "lsh"), shingle_n=2, num_bands=8)
    return str(d / "sh"), str(d / "lsh")


def _gate(spark, batch, indexes, **kw):
    sh, lsh = indexes
    kw.setdefault("lsh_shingle_n", 2)
    kw.setdefault("num_bands", 8)
    return gate_batch(spark, batch, sh, lsh, **kw)


def test_gate_verdict_per_batch_doc(spark, docs, indexes):
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    out = _gate(spark, batch, indexes, min_est=0.9).collect()
    assert len(out) == batch.count()
    for r in out:
        assert 0.0 <= r["contamination"] <= 1.0
        assert r["n_near_dups"] >= 0
        assert r["accepted"] == (
            r["contamination"] <= 0.5 and r["n_near_dups"] == 0)


def test_gate_rejects_exact_copy_of_corpus_doc(spark, docs, indexes):
    """A batch doc that exactly duplicates an indexed corpus doc fails
    BOTH checks: contamination 1.0 and >= 1 near-dup candidate."""
    leak = (
        docs.filter(F.col("doc_id") == 1)   # 1 % 5 != 0 -> indexed
        .withColumn("doc_id", F.lit(100000))
    )
    out = _gate(spark, leak, indexes, min_est=0.9).collect()[0]
    assert out["contamination"] == 1.0
    assert out["n_near_dups"] >= 1
    assert not out["accepted"]


def test_gate_accepts_fresh_content(spark, indexes):
    fresh = spark.createDataFrame(
        [(100001,
          "zzz yyy xxx www vvv uuu ttt sss rrr qqq ppp ooo nnn mmm lll")],
        "doc_id bigint, text string")
    out = _gate(spark, fresh, indexes, min_est=0.9).collect()[0]
    assert out["contamination"] == 0.0
    assert out["n_near_dups"] == 0
    assert out["accepted"]


def test_gate_bloom_mode_matches_exact(spark, docs, indexes):
    """contamination_mode='bloom' scores the contamination tier against
    the broadcast Bloom bitmap instead of the exact index join; at the
    2^21-bit default the fixture has no false positives, so the two
    modes are bit-identical row-for-row (the sized-FP divergence is
    priced by contamination_bloom_sweep, not here)."""
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    exact = _gate(spark, batch, indexes, min_est=0.9).collect()
    bloom = _gate(spark, batch, indexes, min_est=0.9,
                  contamination_mode="bloom").collect()
    assert [r.asDict() for r in exact] == [r.asDict() for r in bloom]


def test_gate_bloom_accepts_prebuilt_bitmap(spark, docs, indexes):
    """A bitmap built once (the static-index amortization) gives the
    same verdicts as the per-call fold — the micro-batch reuse path."""
    from explora_kafka_spark.operators.contamination import (
        build_bloom_bitmap)

    sh, _ = indexes
    bitmap = build_bloom_bitmap(spark, sh)
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    fresh = _gate(spark, batch, indexes, min_est=0.9,
                  contamination_mode="bloom").collect()
    reused = _gate(spark, batch, indexes, min_est=0.9,
                   contamination_mode="bloom",
                   bloom_bitmap=bitmap).collect()
    assert [r.asDict() for r in fresh] == [r.asDict() for r in reused]


def test_gate_rejects_unknown_contamination_mode(spark, docs, indexes):
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    with pytest.raises(ValueError, match="contamination_mode"):
        _gate(spark, batch, indexes, contamination_mode="hll")


def test_gate_short_doc_gets_verdict(spark, indexes):
    """< 5 tokens -> no shingles -> contamination 0, still a row."""
    short = spark.createDataFrame(
        [(100002, "just three words")], "doc_id bigint, text string")
    out = _gate(spark, short, indexes, min_est=0.9).collect()
    assert len(out) == 1
    assert out[0]["contamination"] == 0.0


def test_stream_equals_batch(spark, docs, indexes, tmp_path):
    """The foreachBatch streaming gate over a 2-file stream lands every
    batch doc in exactly one of accepted/rejected with the same scores
    as the one-shot batch twin."""
    sh, lsh = indexes
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    half_a = batch.filter(F.col("doc_id") % 10 == 0)
    half_b = batch.filter(F.col("doc_id") % 10 != 0)
    half_a.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "in"))
    half_b.coalesce(1).write.mode("append").parquet(str(tmp_path / "in"))
    schema = spark.read.parquet(str(tmp_path / "in")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "in"))
    )
    q = gate_stream(
        spark, stream, sh, lsh,
        str(tmp_path / "acc"), str(tmp_path / "rej"), str(tmp_path / "ckpt"),
        lsh_shingle_n=2, num_bands=8, min_est=0.9,
    )
    q.awaitTermination(300)

    acc = spark.read.parquet(str(tmp_path / "acc"))
    try:
        rej = spark.read.parquet(str(tmp_path / "rej"))
    except Exception:
        rej = acc.limit(0)
    streamed = {r["doc_id"]: (r["contamination"], r["n_near_dups"], True)
                for r in acc.collect()}
    streamed.update({r["doc_id"]: (r["contamination"], r["n_near_dups"], False)
                     for r in rej.collect()})
    expect = {r["doc_id"]: (r["contamination"], r["n_near_dups"], r["accepted"])
              for r in _gate(spark, batch, indexes, min_est=0.9).collect()}
    assert streamed == expect


@pytest.fixture(scope="module")
def full_indexes(spark, docs, tmp_path_factory):
    """Three-tier split-half indexes: text (shingle+LSH) and semantic
    (centroids+reps) over doc_id/vec_id < 250."""
    from explora_kafka_spark.operators.semdedup import build_semantic_index

    d = tmp_path_factory.mktemp("gate_full")
    corpus = docs.filter(F.col("doc_id") < 250)
    build_shingle_index(corpus, str(d / "sh"))
    build_dedup_index(corpus, str(d / "lsh"), shingle_n=2, num_bands=8)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    build_semantic_index(emb.filter(F.col("vec_id") < 250),
                         str(d / "sem"), k=8, iters=2, threshold_pct=30)
    return str(d / "sh"), str(d / "lsh"), str(d / "sem")


def test_gate_full_composes_all_three_tiers(spark, docs, full_indexes):
    from explora_kafka_spark.operators.semdedup import semdedup_check
    from explora_kafka_spark.streaming.corpus_gate import gate_batch_full

    sh, lsh, sem = full_indexes
    batch = docs.filter(F.col("doc_id") >= 250)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    batch_emb = emb.filter(F.col("vec_id") >= 250)
    out = gate_batch_full(
        spark, batch, batch_emb, sh, lsh, sem,
        taint_max=0.5, semantic_threshold_pct=30,
        lsh_shingle_n=2, num_bands=8, min_est=0.9,
    ).collect()
    assert len(out) == batch.count()
    # tier agreement: the semantic column equals a standalone check
    sem_only = {r["vec_id"]: r["is_dup"]
                for r in semdedup_check(spark, batch_emb, sem,
                                        threshold_pct=30).collect()}
    base = {r["doc_id"]: r for r in gate_batch(
        spark, batch, sh, lsh, taint_max=0.5,
        lsh_shingle_n=2, num_bands=8, min_est=0.9).collect()}
    for r in out:
        assert r["is_semantic_dup"] == sem_only[r["doc_id"]]
        assert r["contamination"] == base[r["doc_id"]]["contamination"]
        assert r["accepted"] == (base[r["doc_id"]]["accepted"]
                                 and not r["is_semantic_dup"])
    # the semantic tier must actually reject something the text tiers
    # passed (otherwise this composition tests nothing)
    assert any(r["is_semantic_dup"] and base[r["doc_id"]]["accepted"]
               for r in out)


def test_gate_full_stream_equals_batch(spark, docs, full_indexes,
                                       tmp_path):
    from explora_kafka_spark.streaming.corpus_gate import (
        gate_batch_full, gate_stream_full)

    sh, lsh, sem = full_indexes
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    batch = docs.filter(F.col("doc_id") >= 250)
    enriched = batch.join(
        emb.select(F.col("vec_id").alias("doc_id"), "embedding"),
        "doc_id")
    enriched.filter(F.col("doc_id") < 375).coalesce(1) \
        .write.mode("overwrite").parquet(str(tmp_path / "in"))
    enriched.filter(F.col("doc_id") >= 375).coalesce(1) \
        .write.mode("append").parquet(str(tmp_path / "in"))
    schema = spark.read.parquet(str(tmp_path / "in")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "in"))
    )
    q = gate_stream_full(
        spark, stream, sh, lsh, sem,
        str(tmp_path / "acc"), str(tmp_path / "rej"),
        str(tmp_path / "ckpt"),
        semantic_threshold_pct=30,
        lsh_shingle_n=2, num_bands=8, min_est=0.9,
    )
    q.awaitTermination(300)
    acc = spark.read.parquet(str(tmp_path / "acc"))
    try:
        rej = spark.read.parquet(str(tmp_path / "rej"))
    except Exception:
        rej = acc.limit(0)
    streamed = {r["doc_id"]: (r["contamination"], r["n_near_dups"],
                              r["is_semantic_dup"], True)
                for r in acc.collect()}
    streamed.update({r["doc_id"]: (r["contamination"], r["n_near_dups"],
                                   r["is_semantic_dup"], False)
                     for r in rej.collect()})
    expect = {r["doc_id"]: (r["contamination"], r["n_near_dups"],
                            r["is_semantic_dup"], r["accepted"])
              for r in gate_batch_full(
                  spark, batch,
                  emb.filter(F.col("vec_id") >= 250), sh, lsh, sem,
                  taint_max=0.5, semantic_threshold_pct=30,
                  lsh_shingle_n=2, num_bands=8, min_est=0.9).collect()}
    assert streamed == expect


def test_gate_learns_after_index_updates(spark, docs, tmp_path):
    """The full admission lifecycle: a fresh batch passes the gate,
    its content is appended into BOTH text indexes, and a re-sent copy
    of it is then rejected by both tiers — the corpus gate learns."""
    from explora_kafka_spark.operators.contamination import (
        update_shingle_index)
    from explora_kafka_spark.operators.dedup import update_dedup_index

    corpus = docs.filter(F.col("doc_id") < 100)
    build_shingle_index(corpus, str(tmp_path / "sh"))
    build_dedup_index(corpus, str(tmp_path / "lsh"), shingle_n=2,
                      num_bands=8)
    fresh = spark.createDataFrame(
        [(5000, "the torrential zebra quadrille mortgages a "
                "proximal undertow beneath seventeen lacquered "
                "observatories while nobody watches the meridian")],
        "doc_id bigint, text string")
    kw = dict(lsh_shingle_n=2, num_bands=8, min_est=0.9)
    first = gate_batch(spark, fresh, str(tmp_path / "sh"),
                       str(tmp_path / "lsh"), **kw).collect()[0]
    assert first["accepted"]
    # admit: append into both indexes
    update_shingle_index(spark, fresh, str(tmp_path / "sh"))
    update_dedup_index(fresh, str(tmp_path / "lsh"), shingle_n=2,
                       num_bands=8)
    resent = fresh.withColumn("doc_id", F.lit(5001))
    second = gate_batch(spark, resent, str(tmp_path / "sh"),
                        str(tmp_path / "lsh"), **kw).collect()[0]
    assert second["contamination"] == 1.0
    assert second["n_near_dups"] >= 1
    assert not second["accepted"]
    # idempotent-set invariant: re-updating with the SAME doc must not
    # duplicate index hashes (contamination would over-count matches)
    sh_before = spark.read.parquet(str(tmp_path / "sh/train_shingles"))
    n_before = sh_before.count()
    update_shingle_index(spark, fresh, str(tmp_path / "sh"))
    sh_after = spark.read.parquet(str(tmp_path / "sh/train_shingles"))
    assert sh_after.count() == n_before
    # same invariant for the LSH band store (r12: replay-safe by
    # value — a foreachBatch replay of the admitted batch must not
    # duplicate band rows / dedup_check candidates)
    lsh = str(tmp_path / "lsh/bands")
    bands_before = spark.read.parquet(lsh).count()
    update_dedup_index(fresh, str(tmp_path / "lsh"), shingle_n=2,
                       num_bands=8)
    assert spark.read.parquet(lsh).count() == bands_before
    third = gate_batch(spark, resent, str(tmp_path / "sh"),
                       str(tmp_path / "lsh"), **kw).collect()[0]
    assert third["contamination"] == 1.0
    assert third["n_near_dups"] >= 1 and not third["accepted"]


def test_learning_gate_rejects_cross_batch_copy(spark, docs, tmp_path):
    """Self-learning stream: the same fresh content arrives in TWO
    micro-batches under different ids — the first is admitted (and
    appended into the indexes inside the loop), the second is rejected
    by the gate it just taught. No Spark state store involved."""
    from explora_kafka_spark.streaming.corpus_gate import (
        gate_stream_learning)

    corpus = docs.filter(F.col("doc_id") < 100)
    build_shingle_index(corpus, str(tmp_path / "sh"))
    build_dedup_index(corpus, str(tmp_path / "lsh"), shingle_n=2,
                      num_bands=8)
    text = ("an improbable ultramarine casserole deputizes the "
            "quietest of seventeen harmonicas while glaciers "
            "annotate the velvet monsoon ledger")
    f1 = spark.createDataFrame([(7000, text)],
                               "doc_id bigint, text string")
    f2 = spark.createDataFrame([(7001, text)],
                               "doc_id bigint, text string")
    f1.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "in"))
    f2.coalesce(1).write.mode("append").parquet(str(tmp_path / "in"))
    schema = spark.read.parquet(str(tmp_path / "in")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "in"))
    )
    q = gate_stream_learning(
        spark, stream, str(tmp_path / "sh"), str(tmp_path / "lsh"),
        str(tmp_path / "acc"), str(tmp_path / "rej"),
        str(tmp_path / "ckpt"),
        lsh_shingle_n=2, num_bands=8, min_est=0.9,
    )
    q.awaitTermination(300)
    acc_ids = {r["doc_id"] for r in
               spark.read.parquet(str(tmp_path / "acc")).collect()}
    rej = spark.read.parquet(str(tmp_path / "rej")).collect()
    rej_ids = {r["doc_id"] for r in rej}
    # exactly one of the two copies was admitted; the other was
    # rejected BY THE LEARNED indexes (contamination 1.0 + near-dup)
    assert len(acc_ids & {7000, 7001}) == 1
    assert len(rej_ids & {7000, 7001}) == 1
    learned = next(r for r in rej if r["doc_id"] in (7000, 7001))
    assert learned["contamination"] == 1.0
    assert learned["n_near_dups"] >= 1


def test_read_gate_verdicts_stable_under_replay(spark, docs, tmp_path):
    """Replay the ENTIRE learning stream (checkpoint wiped, same sinks,
    same indexes — the worst replay a crash recovery can produce).
    Since round 14 each epoch's verdicts are recovered from the durable
    verdict log instead of re-scored, so the replayed sink rows carry
    IDENTICAL verdicts (duplicated, never contradictory) and
    `read_gate_verdicts` returns bit-identical verdicts before and
    after. The ledger side is also pinned: the replayed epochs must
    not re-append to the indexes, and the verdict log itself must
    no-op."""
    import shutil

    from explora_kafka_spark.operators.index_ledger import read_manifest
    from explora_kafka_spark.streaming.corpus_gate import (
        gate_stream_learning, read_gate_verdicts)

    corpus = docs.filter(F.col("doc_id") < 100)
    build_shingle_index(corpus, str(tmp_path / "sh"))
    build_dedup_index(corpus, str(tmp_path / "lsh"), shingle_n=2,
                      num_bands=8)
    fresh_a = ("an improbable ultramarine casserole deputizes the "
               "quietest of seventeen harmonicas while glaciers "
               "annotate the velvet monsoon ledger")
    fresh_b = ("quixotic marmalade turbines serenade the ninth "
               "adjacent lighthouse while cartographers misplace "
               "an entire trombone of compliments")
    leak = docs.filter(F.col("doc_id") == 1).collect()[0]["text"]
    f1 = spark.createDataFrame([(7000, fresh_a), (7002, leak)],
                               "doc_id bigint, text string")
    f2 = spark.createDataFrame([(7001, fresh_a), (7003, fresh_b)],
                               "doc_id bigint, text string")
    f1.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "in"))
    f2.coalesce(1).write.mode("append").parquet(str(tmp_path / "in"))
    schema = spark.read.parquet(str(tmp_path / "in")).schema

    def _run():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(tmp_path / "in"))
        )
        q = gate_stream_learning(
            spark, stream, str(tmp_path / "sh"), str(tmp_path / "lsh"),
            str(tmp_path / "acc"), str(tmp_path / "rej"),
            str(tmp_path / "ckpt"),
            lsh_shingle_n=2, num_bands=8, min_est=0.9,
        )
        q.awaitTermination(300)

    _run()
    first = {r["doc_id"]: (r["contamination"], r["n_near_dups"],
                           r["_gate_epoch"], r["accepted"])
             for r in read_gate_verdicts(
                 spark, str(tmp_path / "acc"),
                 str(tmp_path / "rej")).collect()}
    assert set(first) == {7000, 7001, 7002, 7003}
    assert first[7000][3] and first[7003][3]          # fresh: admitted
    assert not first[7001][3] and not first[7002][3]  # copy/leak: no
    sh_dirs = read_manifest(str(tmp_path / "sh"), "train_shingles")
    lsh_dirs = read_manifest(str(tmp_path / "lsh"), "bands")

    # wipe ONLY the checkpoint: same sinks, same (already-learned)
    # indexes — every epoch replays against state that contains it
    shutil.rmtree(str(tmp_path / "ckpt"))
    _run()
    replayed = {r["doc_id"]: (r["contamination"], r["n_near_dups"],
                              r["_gate_epoch"], r["accepted"])
                for r in read_gate_verdicts(
                    spark, str(tmp_path / "acc"),
                    str(tmp_path / "rej")).collect()}
    assert replayed == first
    # the verdict log held the line at the SINK level too: the
    # replayed rows are duplicates with the ORIGINAL verdicts, so the
    # admitted docs never appear in the rejected sink (pre-r14 the
    # replay re-scored against the learned indexes and flipped them)
    rej_ids = {r["doc_id"] for r in
               spark.read.parquet(str(tmp_path / "rej")).collect()}
    assert 7000 not in rej_ids and 7003 not in rej_ids
    acc = spark.read.parquet(str(tmp_path / "acc")).collect()
    assert sorted(r["doc_id"] for r in acc) == [7000, 7000, 7003, 7003]
    # and every ledger no-opped: same committed dirs, same epochs
    assert read_manifest(str(tmp_path / "sh"),
                         "train_shingles") == sh_dirs
    assert read_manifest(str(tmp_path / "lsh"), "bands") == lsh_dirs
    from explora_kafka_spark.streaming.corpus_gate import (
        gate_verdict_log_path, read_gate_verdict_log)
    log = gate_verdict_log_path(str(tmp_path / "ckpt"))
    assert read_manifest(log, "gate_verdicts")["streams"] \
        == {str(tmp_path / "ckpt"): 1}
    # the log holds exactly one verdict row per (doc, epoch)
    logged = read_gate_verdict_log(spark, log).collect()
    assert sorted(r["doc_id"] for r in logged) == [7000, 7001, 7002,
                                                   7003]
    assert {r["doc_id"]: r["accepted"] for r in logged} \
        == {d: first[d][3] for d in first}


def test_scored_gate_adds_only_the_classifier_tier(spark, sf_dir):
    """gate_batch_scored ≡ gate_batch_full on the three index tiers;
    accepted = full-accepted AND quality_ok, and at least one doc is
    rejected by the classifier alone (the tier does real work)."""
    import __spark_entry__ as E

    full = {r["doc_id"]: r for r in
            E.queries()["corpus_gate_full"](spark, sf_dir).collect()}
    scored = {r["doc_id"]: r for r in
              E.queries()["corpus_gate_scored"](spark, sf_dir).collect()}
    assert set(full) == set(scored)
    clf_only = 0
    for d, s in scored.items():
        f = full[d]
        assert (s["contamination"], s["n_near_dups"],
                s["is_semantic_dup"]) == \
               (f["contamination"], f["n_near_dups"],
                f["is_semantic_dup"])
        assert s["accepted"] == (f["accepted"] and s["quality_ok"])
        if f["accepted"] and not s["quality_ok"]:
            clf_only += 1
    assert clf_only > 0


def test_verdict_log_heals_half_committed_index_pair(spark, docs,
                                                     tmp_path):
    """The r13-advice cross-index crash window, now closed: a driver
    that died AFTER the shingle commit but BEFORE the dedup commit
    left epoch 0 half-applied (shingle index contains the batch,
    dedup index does not, verdict log committed). Pre-r14 the replay
    re-scored against the self-containing shingle index, accepted
    collapsed to empty, and the dedup index lost the epoch's bands
    forever. Now the replay reads the ORIGINAL verdicts from the log
    and re-attempts both updates — the shingle one no-ops, the dedup
    one commits: the indexes advance in lock-step."""
    from explora_kafka_spark.operators.contamination import (
        update_shingle_index)
    from explora_kafka_spark.operators.dedup import dedup_check
    from explora_kafka_spark.operators.index_ledger import read_manifest
    from explora_kafka_spark.streaming.corpus_gate import (
        _init_verdict_log, gate_batch, gate_stream_learning,
        gate_verdict_log_path)
    from explora_kafka_spark.operators import index_ledger as ledger

    corpus = docs.filter(F.col("doc_id") < 100)
    build_shingle_index(corpus, str(tmp_path / "sh"))
    build_dedup_index(corpus, str(tmp_path / "lsh"), shingle_n=2,
                      num_bands=8)
    text = ("a clandestine rhubarb sonata recalibrates the eleventh "
            "iridescent pergola while archivists bottle the last "
            "unlabeled thunderstorm of the fiscal equinox")
    batch = spark.createDataFrame([(8000, text)],
                                  "doc_id bigint, text string")
    ckpt = str(tmp_path / "ckpt")
    log = gate_verdict_log_path(ckpt)
    kw = dict(lsh_shingle_n=2, num_bands=8, min_est=0.9)

    # ---- manufacture the half-committed crash state for epoch 0 ----
    scored = gate_batch(spark, batch, str(tmp_path / "sh"),
                        str(tmp_path / "lsh"), **kw)
    assert scored.collect()[0]["accepted"]
    enriched = (batch.join(scored, "doc_id")
                .withColumn("_gate_epoch", F.lit(0))
                .localCheckpoint(eager=True))
    _init_verdict_log(log)

    def _w(delta_path):
        enriched.write.mode("overwrite").parquet(delta_path)
        return True

    assert ledger.ledger_append(log, "gate_verdicts",
                                "gate_verdicts_delta", _w,
                                0, stream_id=ckpt)
    update_shingle_index(spark, batch, str(tmp_path / "sh"), n=5,
                         batch_id=0, stream_id=ckpt)
    # (crash here: dedup update never ran; checkpoint dir never
    # written — Spark will replay epoch 0 from scratch)
    assert read_manifest(str(tmp_path / "lsh"), "bands")["streams"] \
        == {}

    # ---- recovery: run the learning stream over the same batch ----
    batch.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "in"))
    stream = (spark.readStream.schema(batch.schema)
              .parquet(str(tmp_path / "in")))
    q = gate_stream_learning(
        spark, stream, str(tmp_path / "sh"), str(tmp_path / "lsh"),
        str(tmp_path / "acc"), str(tmp_path / "rej"), ckpt, **kw)
    q.awaitTermination(300)

    # the doc was accepted (from the log — a re-score would have
    # rejected it against its own shingles) and the dedup index got
    # its bands
    acc = spark.read.parquet(str(tmp_path / "acc")).collect()
    assert [r["doc_id"] for r in acc] == [8000]
    assert read_manifest(str(tmp_path / "lsh"), "bands")["streams"] \
        == {ckpt: 0}
    resent = batch.withColumn("doc_id", F.lit(8001))
    chk = dedup_check(spark, resent, str(tmp_path / "lsh"),
                      shingle_n=2, num_bands=8)
    assert {r["match_id"] for r in chk.collect()} == {8000}


def test_gate_dedup_cap_preserves_boilerplate_verdicts(spark, tmp_path):
    """dedup_max_bucket through the gate: with a 40-copy boilerplate
    clique in the stored index, a re-sent copy is still rejected (it
    matches the bucket's anchors) and fresh content still passes —
    only the per-probe candidate enumeration shrinks."""
    text = ("the selfsame boilerplate paragraph repeated verbatim "
            "across every single mirrored page of the template site")
    corpus = spark.createDataFrame(
        [(i, text) for i in range(40)], "doc_id: long, text: string")
    build_shingle_index(corpus, str(tmp_path / "sh"))
    build_dedup_index(corpus, str(tmp_path / "lsh"), shingle_n=2,
                      num_bands=8)
    batch = spark.createDataFrame(
        [(900, text), (901, "fresh unrelated content nothing shared "
                            "with the boilerplate clique at all")],
        "doc_id: long, text: string")
    kw = dict(lsh_shingle_n=2, num_bands=8, min_est=0.9)
    full = {r["doc_id"]: r for r in gate_batch(
        spark, batch, str(tmp_path / "sh"), str(tmp_path / "lsh"),
        **kw).collect()}
    capped = {r["doc_id"]: r for r in gate_batch(
        spark, batch, str(tmp_path / "sh"), str(tmp_path / "lsh"),
        dedup_max_bucket=4, **kw).collect()}
    assert not full[900]["accepted"] and not capped[900]["accepted"]
    assert full[901]["accepted"] and capped[901]["accepted"]
    # the enumeration really shrank: <= num_bands x cap anchors
    assert 1 <= capped[900]["n_near_dups"] <= 8 * 4
    assert capped[900]["n_near_dups"] < full[900]["n_near_dups"] == 40
