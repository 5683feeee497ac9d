"""Exactly-once IVF index maintenance (round 12): the committed batch
ledger in the index manifest, the streaming foreachBatch face, and the
delta-compaction job — the discipline `ParquetViewStore.merge` gives
views, pinned on the ANN axis."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from explora_kafka_spark.operators import similarity as S

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _counts(spark, idx):
    return {r["cid"]: r["n_vectors"]
            for r in S.ivf_list_stats(spark, idx).collect()}


def _mk_batch(spark, emb, start_id, n=5):
    base = emb.limit(n).collect()
    return spark.createDataFrame(
        [(start_id + i, [float(x) for x in r["embedding"]])
         for i, r in enumerate(base)],
        "vec_id bigint, embedding array<float>")


def test_update_replay_is_noop(spark, emb, tmp_path):
    idx = str(tmp_path / "ivf")
    S.build_ivf_index(emb, idx)
    n0 = sum(_counts(spark, idx).values())
    batch = _mk_batch(spark, emb, 5_000_000)
    assert S.update_ivf_index(spark, batch, idx, batch_id=7) is True
    after_first = _counts(spark, idx)
    assert sum(after_first.values()) == n0 + 5
    # the at-least-once replay: same epoch id, possibly same rows
    assert S.update_ivf_index(spark, batch, idx, batch_id=7) is False
    assert _counts(spark, idx) == after_first
    # a NEW epoch still applies
    assert S.update_ivf_index(
        spark, _mk_batch(spark, emb, 6_000_000), idx, batch_id=8) is True
    assert sum(_counts(spark, idx).values()) == n0 + 10


def test_stream_scope_is_monotonic_watermark(spark, emb, tmp_path):
    """Stream-scoped ledger (the Delta txnAppId idea): per stream, one
    monotonic watermark — only `epoch <= last` no-ops; a DIFFERENT
    stream's epoch 0 is not a replay of this stream's (epoch ids are
    unique per checkpoint only, r12 review)."""
    idx = str(tmp_path / "ivf")
    S.build_ivf_index(emb, idx)
    n0 = sum(_counts(spark, idx).values())
    mk = lambda s: _mk_batch(spark, emb, s)  # noqa: E731
    assert S.update_ivf_index(spark, mk(5_000_000), idx,
                              batch_id=5, stream_id="a") is True
    assert S.update_ivf_index(spark, mk(5_000_000), idx,
                              batch_id=5, stream_id="a") is False
    assert S.update_ivf_index(spark, mk(5_100_000), idx,
                              batch_id=4, stream_id="a") is False
    assert S.update_ivf_index(spark, mk(5_200_000), idx,
                              batch_id=6, stream_id="a") is True
    # a second stream starting at epoch 0 APPLIES (not a replay)
    assert S.update_ivf_index(spark, mk(6_000_000), idx,
                              batch_id=0, stream_id="b") is True
    assert sum(_counts(spark, idx).values()) == n0 + 15
    m = json.load(open(os.path.join(idx, "_manifest.json")))
    assert m["streams"] == {"a": 6, "b": 0}


def test_crashed_epoch_orphan_is_overwritten(spark, emb, tmp_path):
    """Crash between the delta write and the manifest swap: the delta
    dir exists but is uncommitted — readers must not see it, and the
    replay must overwrite it and commit exactly the batch's rows."""
    idx = str(tmp_path / "ivf")
    S.build_ivf_index(emb, idx)
    n0 = sum(_counts(spark, idx).values())
    batch = _mk_batch(spark, emb, 5_000_000)
    # simulate the pre-crash partial write: delta dir on disk with
    # DOUBLE the rows (a torn write), no manifest entry
    cent = spark.read.parquet(f"{idx}/centroids")
    rows = S._rank_against_centroids(
        batch.unionByName(batch), cent, 1, "vec_id", "embedding"
    ).select(F.col("vec_id").alias("neighbor_id"),
             F.col("embedding").alias("n_emb"), "cid")
    rows.write.mode("overwrite").partitionBy("cid").parquet(
        os.path.join(idx, "lists_delta_7"))
    assert sum(_counts(spark, idx).values()) == n0  # orphan invisible
    assert S.update_ivf_index(spark, batch, idx, batch_id=7) is True
    assert sum(_counts(spark, idx).values()) == n0 + 5  # not +10


def test_compact_folds_deltas_and_keeps_ledger(spark, emb, tmp_path):
    idx = str(tmp_path / "ivf")
    S.build_ivf_index(emb, idx)
    S.update_ivf_index(spark, _mk_batch(spark, emb, 5_000_000), idx,
                       batch_id=1)
    S.update_ivf_index(spark, _mk_batch(spark, emb, 6_000_000), idx,
                       batch_id=2)
    before = _counts(spark, idx)
    served_before = [tuple(r) for r in
                     S.ann_topk_ivf_indexed(spark, idx).collect()]
    S.compact_ivf_index(spark, idx)
    m = json.load(open(os.path.join(idx, "_manifest.json")))
    assert len(m["dirs"]) == 1 and m["batches"] == ["1", "2"]
    assert _counts(spark, idx) == before
    assert [tuple(r) for r in
            S.ann_topk_ivf_indexed(spark, idx).collect()] == served_before
    # GC: the folded dirs are deleted (r12 review: no leaked copies)
    on_disk = {d for d in os.listdir(idx) if d.startswith("lists")}
    assert on_disk == set(m["dirs"])
    # a second compaction of a single-dir index is a NO-OP (no
    # corpus rewrite: the dir is unchanged)
    S.compact_ivf_index(spark, idx)
    assert json.load(open(os.path.join(idx, "_manifest.json")))[
        "dirs"] == m["dirs"]
    # replay protection survives compaction
    assert S.update_ivf_index(
        spark, _mk_batch(spark, emb, 5_000_000), idx, batch_id=1) is False
    assert _counts(spark, idx) == before


def test_streaming_append_exactly_once(spark, emb, tmp_path):
    """File-source vector stream → foreachBatch append: every input
    vector lands exactly once; RERUNNING the drained stream on the
    same checkpoint appends nothing; serving sees the union."""
    from explora_kafka_spark.streaming.index_update import (
        ivf_index_update_stream,
    )

    idx = str(tmp_path / "ivf")
    base = emb.filter(F.col("vec_id") % 10 != 0)
    delta = emb.filter(F.col("vec_id") % 10 == 0)
    S.build_ivf_index(base, idx)
    n0 = sum(_counts(spark, idx).values())
    n_delta = delta.count()
    src = str(tmp_path / "stream_in")
    delta.repartition(3).write.parquet(src)
    ckpt = str(tmp_path / "ckpt")
    stream = spark.readStream.schema(
        "vec_id bigint, embedding array<float>, label int"
    ).parquet(src).select("vec_id", "embedding")
    q = ivf_index_update_stream(spark, stream, idx, ckpt)
    assert q.awaitTermination(300), "availableNow drain timed out"
    assert sum(_counts(spark, idx).values()) == n0 + n_delta
    # drained re-run: checkpoint already holds the committed offsets
    q2 = ivf_index_update_stream(
        spark,
        spark.readStream.schema(
            "vec_id bigint, embedding array<float>, label int"
        ).parquet(src).select("vec_id", "embedding"),
        idx, ckpt)
    assert q2.awaitTermination(300), "rerun drain timed out"
    assert sum(_counts(spark, idx).values()) == n0 + n_delta
    # every delta member is servable from its assigned list
    ids = {r["neighbor_id"] for r in
           S.read_index_lists(spark, idx).select("neighbor_id").collect()}
    assert set(r["vec_id"] for r in delta.collect()) <= ids


def test_stream_scope_requires_batch_id(spark, emb, tmp_path):
    """stream_id without batch_id fails AT ENTRY (r13 review): the old
    code passed the pre-check, wrote the delta dir, then raised at the
    locked commit's int() cast — an orphan dir and no committed batch."""
    idx = str(tmp_path / "ivf")
    S.build_ivf_index(emb, idx)
    batch = _mk_batch(spark, emb, 5_000_000)
    with pytest.raises(ValueError, match="batch_id"):
        S.update_ivf_index(spark, batch, idx, stream_id="a")
    # no orphan delta dir was written
    assert not [d for d in os.listdir(idx) if d.startswith("lists_delta")]


def test_bare_batch_id_path_chars_sanitized(spark, emb, tmp_path):
    """A bare batch_id containing path characters must not create
    nested/invalid delta dirs (r13 review): the dir name is hashed, the
    RAW id stays in the ledger, and replay protection still keys on it."""
    idx = str(tmp_path / "ivf")
    S.build_ivf_index(emb, idx)
    n0 = sum(_counts(spark, idx).values())
    batch = _mk_batch(spark, emb, 5_000_000)
    assert S.update_ivf_index(spark, batch, idx,
                              batch_id="job/2026-08-16/..x") is True
    m = json.load(open(os.path.join(idx, "_manifest.json")))
    assert m["batches"] == ["job/2026-08-16/..x"]  # raw id in ledger
    delta_dirs = [d for d in m["dirs"] if d != "lists"]
    assert len(delta_dirs) == 1
    assert "/" not in delta_dirs[0] and ".." not in delta_dirs[0]
    assert sum(_counts(spark, idx).values()) == n0 + 5
    # readers resolve the manifest dir consistently + replay no-ops
    assert S.update_ivf_index(spark, batch, idx,
                              batch_id="job/2026-08-16/..x") is False
    assert sum(_counts(spark, idx).values()) == n0 + 5


def test_compact_concurrent_append_carried_not_folded(
        spark, emb, tmp_path, monkeypatch):
    """A delta committed while compaction is in flight is carried over
    exactly once (r13 review): the rewrite unions the SNAPSHOT's dirs —
    the old read_index_lists re-read could fold the late delta into the
    compacted dir AND carry it, duplicating its rows."""
    idx = str(tmp_path / "ivf")
    S.build_ivf_index(emb, idx)
    S.update_ivf_index(spark, _mk_batch(spark, emb, 5_000_000), idx,
                       batch_id=1)
    n_snapshot = sum(_counts(spark, idx).values())
    real_mutate = S._mutate_ivf_manifest
    state = {"injected": False}

    def inject_then_commit(path, mutate):
        # fires at the compaction's commit: a concurrent append lands
        # between the snapshot read and the manifest swap
        if not state["injected"]:
            state["injected"] = True
            monkeypatch.setattr(S, "_mutate_ivf_manifest", real_mutate)
            S.update_ivf_index(spark, _mk_batch(spark, emb, 6_000_000),
                               idx, batch_id=2)
        return real_mutate(path, mutate)

    monkeypatch.setattr(S, "_mutate_ivf_manifest", inject_then_commit)
    S.compact_ivf_index(spark, idx)
    m = json.load(open(os.path.join(idx, "_manifest.json")))
    # late delta carried over as its own dir, not folded
    assert len(m["dirs"]) == 2
    compact_dir = [d for d in m["dirs"] if d.startswith("lists_compact")]
    assert len(compact_dir) == 1
    n_compacted = spark.read.parquet(
        os.path.join(idx, compact_dir[0])).count()
    assert n_compacted == n_snapshot  # snapshot rows only
    assert sum(_counts(spark, idx).values()) == n_snapshot + 5  # no dup
    assert sorted(m["batches"]) == ["1", "2"]


def test_load_ppm_quotient_remainder_no_overflow():
    """load_ppm via quotient+remainder (r13 review): the straight
    n*l*1e6 form overflows int64 near a 4e8-row fully-skewed list with
    l≈√n; the reordered form is exact and stays in range — checked on
    both engines' dialects at the overflow boundary."""
    import duckdb

    n, l, t = 500_000_000, 22_360, 500_000_000
    want = n * l * 1_000_000 // t  # python bigint truth
    got = duckdb.sql(
        f"SELECT (n * 1000000 // t) * l + (n * 1000000 % t) * l // t "
        f"FROM (SELECT CAST({n} AS BIGINT) n, CAST({l} AS BIGINT) l, "
        f"CAST({t} AS BIGINT) t)").fetchone()[0]
    assert got == want
    # skewed remainder path: n < t so the remainder term is non-zero
    n2, t2 = 123_456_789, 500_000_000
    want2 = n2 * l * 1_000_000 // t2
    got2 = duckdb.sql(
        f"SELECT (n * 1000000 // t) * l + (n * 1000000 % t) * l // t "
        f"FROM (SELECT CAST({n2} AS BIGINT) n, CAST({l} AS BIGINT) l, "
        f"CAST({t2} AS BIGINT) t)").fetchone()[0]
    assert got2 == want2


# ---------------------------------------------------------------------------
# round 13: the ledger ported to the dedup / contamination axes
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _band_rows(spark, idx):
    from explora_kafka_spark.operators.dedup import read_dedup_bands
    return read_dedup_bands(spark, idx).count()


def test_dedup_update_ledger_replay_and_scope(spark, docs, tmp_path):
    """Ledgered dedup appends: replay no-ops at O(1), stream scopes are
    independent watermarks, and the raw id is never a dir name."""
    from explora_kafka_spark.operators import dedup as D

    idx = str(tmp_path / "lsh")
    base = docs.filter(F.col("doc_id") % 5 != 0)
    delta = docs.filter(F.col("doc_id") % 5 == 0)
    D.build_dedup_index(base, idx, shingle_n=2, num_bands=8)
    n0 = _band_rows(spark, idx)
    assert D.update_dedup_index(delta, idx, num_bands=8, shingle_n=2,
                                batch_id=3, stream_id="s/ckpt") is True
    n1 = _band_rows(spark, idx)
    assert n1 == n0 + delta.count() * 8  # 8 band rows per doc
    # replay of the same epoch: no-op without recomputing signatures
    assert D.update_dedup_index(delta, idx, num_bands=8, shingle_n=2,
                                batch_id=3, stream_id="s/ckpt") is False
    assert _band_rows(spark, idx) == n1
    # a different stream's epoch 0 is NOT a replay
    assert D.update_dedup_index(
        docs.filter(F.col("doc_id") % 5 == 0).limit(0), idx,
        num_bands=8, shingle_n=2, batch_id=0, stream_id="t") is True
    m = json.load(open(os.path.join(idx, "_manifest.json")))
    assert m["streams"] == {"s/ckpt": 3, "t": 0}
    for d in m["dirs"]:
        assert "/" not in d


def test_dedup_check_serves_committed_union(spark, docs, tmp_path):
    """dedup_check against a base+ledgered-delta index must equal the
    check against a from-scratch index over the SAME full corpus."""
    from explora_kafka_spark.operators import dedup as D

    idx = str(tmp_path / "lsh")
    full = str(tmp_path / "full")
    base = docs.filter(F.col("doc_id") % 5 != 0)
    delta = docs.filter(F.col("doc_id") % 5 == 0)
    D.build_dedup_index(base, idx, shingle_n=2, num_bands=8)
    D.update_dedup_index(delta, idx, num_bands=8, shingle_n=2,
                         batch_id=1)
    D.build_dedup_index(docs, full, shingle_n=2, num_bands=8)
    probe = docs.filter(F.col("doc_id") % 7 == 0)
    got = [tuple(r) for r in D.dedup_check(
        spark, probe, idx, shingle_n=2, num_bands=8).collect()]
    want = [tuple(r) for r in D.dedup_check(
        spark, probe, full, shingle_n=2, num_bands=8).collect()]
    assert got == want and len(got) > 0


def test_dedup_compact_folds_and_keeps_ledger(spark, docs, tmp_path):
    from explora_kafka_spark.operators import dedup as D

    idx = str(tmp_path / "lsh")
    D.build_dedup_index(docs.filter(F.col("doc_id") % 5 != 0), idx,
                        shingle_n=2, num_bands=8)
    D.update_dedup_index(docs.filter(F.col("doc_id") % 10 == 0), idx,
                         num_bands=8, shingle_n=2, batch_id=1)
    D.update_dedup_index(docs.filter(F.col("doc_id") % 10 == 5), idx,
                         num_bands=8, shingle_n=2, batch_id=2)
    before = _band_rows(spark, idx)
    D.compact_dedup_index(spark, idx)
    m = json.load(open(os.path.join(idx, "_manifest.json")))
    assert len(m["dirs"]) == 1 and m["batches"] == ["1", "2"]
    assert _band_rows(spark, idx) == before
    on_disk = {d for d in os.listdir(idx) if d.startswith("bands")}
    assert on_disk == set(m["dirs"])
    # replay protection survives compaction
    assert D.update_dedup_index(
        docs.filter(F.col("doc_id") % 10 == 0), idx,
        num_bands=8, shingle_n=2, batch_id=1) is False


def test_dedup_legacy_no_id_append_unchanged(spark, docs, tmp_path):
    """Without ids the r12 contract holds bit-for-bit: value-converged
    append into the base `bands` dir, no manifest minted."""
    from explora_kafka_spark.operators import dedup as D

    idx = str(tmp_path / "lsh")
    D.build_dedup_index(docs.filter(F.col("doc_id") % 5 != 0), idx,
                        shingle_n=2, num_bands=8)
    delta = docs.filter(F.col("doc_id") % 5 == 0)
    assert D.update_dedup_index(delta, idx, num_bands=8,
                                shingle_n=2) is True
    assert not os.path.exists(os.path.join(idx, "_manifest.json"))
    assert {d for d in os.listdir(idx) if d.startswith("bands")} \
        == {"bands"}
    # value convergence: the replayed no-id batch appends nothing
    n1 = _band_rows(spark, idx)
    D.update_dedup_index(delta, idx, num_bands=8, shingle_n=2)
    assert _band_rows(spark, idx) == n1


def test_dedup_streaming_append_exactly_once(spark, docs, tmp_path):
    """File-source doc stream → foreachBatch dedup append: rerunning
    the drained stream on the same checkpoint appends nothing."""
    from explora_kafka_spark.operators import dedup as D
    from explora_kafka_spark.streaming.index_update import (
        dedup_index_update_stream,
    )

    idx = str(tmp_path / "lsh")
    D.build_dedup_index(docs.filter(F.col("doc_id") % 5 != 0), idx,
                        shingle_n=2, num_bands=8)
    n0 = _band_rows(spark, idx)
    delta = docs.filter(F.col("doc_id") % 5 == 0)
    src = str(tmp_path / "in")
    delta.select("doc_id", "text").repartition(2).write.parquet(src)
    ckpt = str(tmp_path / "ckpt")

    def _stream():
        return (spark.readStream.schema("doc_id bigint, text string")
                .parquet(src))

    q = dedup_index_update_stream(spark, _stream(), idx, ckpt,
                                  num_bands=8, shingle_n=2)
    assert q.awaitTermination(300)
    n1 = _band_rows(spark, idx)
    assert n1 == n0 + delta.count() * 8
    q2 = dedup_index_update_stream(spark, _stream(), idx, ckpt,
                                   num_bands=8, shingle_n=2)
    assert q2.awaitTermination(300)
    assert _band_rows(spark, idx) == n1


def test_shingle_update_ledger_replay(spark, docs, tmp_path):
    """Contamination-axis ledger: a replayed epoch no-ops; the check
    against base+delta equals the check against a from-scratch index."""
    from explora_kafka_spark.operators import contamination as C

    idx = str(tmp_path / "sh")
    full = str(tmp_path / "full")
    base = docs.filter(F.col("doc_id") % 5 != 0)
    delta = docs.filter(F.col("doc_id") % 5 == 0)
    C.build_shingle_index(base, idx)
    C.build_shingle_index(docs, full)
    assert C.update_shingle_index(spark, delta, idx,
                                  batch_id=4, stream_id="s") is True
    n1 = C.read_shingle_index(spark, idx).count()
    assert n1 == C.read_shingle_index(spark, full).count()
    assert C.update_shingle_index(spark, delta, idx,
                                  batch_id=4, stream_id="s") is False
    assert C.read_shingle_index(spark, idx).count() == n1
    probe = docs.filter(F.col("doc_id") % 7 == 0)
    got = [tuple(r) for r in C.contamination_check(
        spark, probe, idx).collect()]
    want = [tuple(r) for r in C.contamination_check(
        spark, probe, full).collect()]
    assert got == want
    # compaction folds, set size invariant, check unchanged
    C.compact_shingle_index(spark, idx)
    m = json.load(open(os.path.join(idx, "_manifest.json")))
    assert len(m["dirs"]) == 1
    assert C.read_shingle_index(spark, idx).count() == n1
    assert [tuple(r) for r in C.contamination_check(
        spark, probe, idx).collect()] == got


def test_semdedup_replay_safe_by_construction(spark, tmp_path):
    """The semantic axis needs NO ledger (pinning the r12/r13 design
    claim): a replayed admitted batch matches ITSELF in the reps store,
    so nothing is re-admitted and the reps count is unchanged."""
    from explora_kafka_spark.operators import semdedup as SD

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    idx = str(tmp_path / "sem")
    # dense-prefix split: the kmeans stride init needs contiguous ids
    base = emb.filter(F.col("vec_id") < 250)
    batch = emb.filter(F.col("vec_id") >= 250)
    SD.build_semantic_index(base, idx, threshold_pct=30)
    v1 = SD.update_semantic_index(spark, batch, idx, threshold_pct=30)
    admitted = v1.filter(~F.col("is_dup")).count()
    assert admitted > 0
    n1 = spark.read.parquet(f"{idx}/reps").count()
    v2 = SD.update_semantic_index(spark, batch, idx, threshold_pct=30)
    assert v2.filter(~F.col("is_dup")).count() == 0  # all flagged now
    assert spark.read.parquet(f"{idx}/reps").count() == n1


def test_phash_update_ledger_replay_and_serving(spark, docs, tmp_path):
    """Media-tier ledger (completing four-family parity): replayed
    epochs no-op, serving the base+delta union equals a from-scratch
    full-corpus index, compaction preserves both."""
    from explora_kafka_spark.operators import multimodal as MM

    idx = str(tmp_path / "ph")
    full = str(tmp_path / "full")
    base = MM.media_from_documents(docs.filter(F.col("doc_id") % 5 != 0))
    delta = MM.media_from_documents(docs.filter(F.col("doc_id") % 5 == 0))
    MM.build_phash_index(base, idx)
    MM.build_phash_index(MM.media_from_documents(docs), full)
    n0 = MM.read_phash_index(spark, idx).count()
    assert MM.update_phash_index(delta, idx, batch_id=2,
                                 stream_id="s") is True
    n1 = MM.read_phash_index(spark, idx).count()
    assert n1 == MM.read_phash_index(spark, full).count()
    assert n1 > n0
    assert MM.update_phash_index(delta, idx, batch_id=2,
                                 stream_id="s") is False
    assert MM.read_phash_index(spark, idx).count() == n1
    probe = MM.media_from_documents(
        docs.filter(F.col("doc_id") % 50 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.expr("concat('zzz', substr(text, 4))").alias("text")))
    got = [tuple(r) for r in MM.phash_check(spark, probe, idx).collect()]
    want = [tuple(r) for r in MM.phash_check(spark, probe,
                                             full).collect()]
    assert got == want and len(got) > 0
    MM.compact_phash_index(spark, idx)
    m = json.load(open(os.path.join(idx, "_manifest.json")))
    assert len(m["dirs"]) == 1
    assert [tuple(r) for r in
            MM.phash_check(spark, probe, idx).collect()] == got


def test_stream_auto_compaction_bounds_open_deltas(spark, emb, tmp_path):
    """compact_after: a multi-epoch stream compacts inline once the
    committed open-delta count crosses the threshold — the index never
    accumulates one serve-time delta scan per epoch, and serving stays
    identical."""
    from explora_kafka_spark.operators import index_ledger as L
    from explora_kafka_spark.streaming.index_update import (
        ivf_index_update_stream,
    )

    idx = str(tmp_path / "ivf")
    base = emb.filter(F.col("vec_id") % 10 != 0)
    delta = emb.filter(F.col("vec_id") % 10 == 0)
    S.build_ivf_index(base, idx)
    n0 = sum(_counts(spark, idx).values())
    src = str(tmp_path / "in")
    # several input files + 1-file triggers => several epochs
    delta.repartition(6).write.parquet(src)
    stream = (spark.readStream.schema(
        "vec_id bigint, embedding array<float>, label int")
        .option("maxFilesPerTrigger", 1).parquet(src)
        .select("vec_id", "embedding"))
    q = ivf_index_update_stream(spark, stream, idx,
                                str(tmp_path / "ckpt"),
                                compact_after=2)
    assert q.awaitTermination(600)
    assert sum(_counts(spark, idx).values()) == n0 + delta.count()
    assert L.open_delta_count(idx, "lists") <= 2
    # the stream ledger survived every inline compaction
    m = json.load(open(os.path.join(idx, "_manifest.json")))
    assert list(m["streams"].values()) == [5]  # 6 files -> epochs 0..5


def test_dedup_duplicate_band_rows_cannot_change_check_output(
        spark, docs, tmp_path):
    """The enforce_unique=False contract: even when the SAME docs are
    committed in two different epochs (duplicated band rows in the
    index), dedup_check's pair-dedup makes the served output identical
    to the clean index — the set invariant trades storage, not
    correctness."""
    from explora_kafka_spark.operators import dedup as D

    clean = str(tmp_path / "clean")
    dirty = str(tmp_path / "dirty")
    base = docs.filter(F.col("doc_id") % 5 != 0)
    delta = docs.filter(F.col("doc_id") % 5 == 0)
    for idx in (clean, dirty):
        D.build_dedup_index(base, idx, shingle_n=2, num_bands=8)
        assert D.update_dedup_index(delta, idx, num_bands=8,
                                    shingle_n=2, batch_id=1,
                                    enforce_unique=False) is True
    # the dirty index gets the SAME delta docs again under a NEW epoch
    # with the anti-join off -> duplicated band rows
    assert D.update_dedup_index(delta, dirty, num_bands=8, shingle_n=2,
                                batch_id=2, enforce_unique=False) is True
    n_clean = _band_rows(spark, clean)
    n_dirty = _band_rows(spark, dirty)
    assert n_dirty == n_clean + delta.count() * 8  # rows duplicated...
    probe = docs.filter(F.col("doc_id") % 7 == 0)
    got = [tuple(r) for r in D.dedup_check(
        spark, probe, dirty, shingle_n=2, num_bands=8).collect()]
    want = [tuple(r) for r in D.dedup_check(
        spark, probe, clean, shingle_n=2, num_bands=8).collect()]
    assert got == want and len(got) > 0  # ...output identical


def test_rebuild_resets_stale_manifest(spark, docs, tmp_path):
    """Rebuilding an index in place over a previously stream-appended
    path must serve ONLY the fresh build (r13 review: the surviving
    manifest kept the old delta dirs AND a stale stream watermark)."""
    from explora_kafka_spark.operators import dedup as D

    idx = str(tmp_path / "lsh")
    base = docs.filter(F.col("doc_id") % 5 != 0)
    delta = docs.filter(F.col("doc_id") % 5 == 0)
    D.build_dedup_index(base, idx, shingle_n=2, num_bands=8)
    D.update_dedup_index(delta, idx, num_bands=8, shingle_n=2,
                         batch_id=5, stream_id="s")
    # rebuild over the appended index (new corpus snapshot)
    D.build_dedup_index(docs, idx, shingle_n=2, num_bands=8)
    assert _band_rows(spark, idx) == docs.count() * 8  # no stale dirs
    m = json.load(open(os.path.join(idx, "_manifest.json")))
    assert m["dirs"] == ["bands"] and m["streams"] == {}
    # a fresh stream on the same scope starts at epoch 0 again
    assert D.update_dedup_index(delta.limit(0), idx, num_bands=8,
                                shingle_n=2, batch_id=0,
                                stream_id="s") is True


def test_legacy_append_visible_after_compaction(spark, docs, tmp_path):
    """A no-id legacy append on a MANIFESTED index must stay visible
    even after a compaction folded the base dir away (r13 review: the
    raw base-dir append became permanently invisible)."""
    from explora_kafka_spark.operators import dedup as D

    idx = str(tmp_path / "lsh")
    D.build_dedup_index(docs.filter(F.col("doc_id") % 5 != 0), idx,
                        shingle_n=2, num_bands=8)
    D.update_dedup_index(docs.filter(F.col("doc_id") % 10 == 0), idx,
                         num_bands=8, shingle_n=2, batch_id=1)
    D.compact_dedup_index(spark, idx)  # base 'bands' dir folded away
    n0 = _band_rows(spark, idx)
    fresh = docs.filter(F.col("doc_id") % 10 == 5)
    assert D.update_dedup_index(fresh, idx, num_bands=8,
                                shingle_n=2) is True  # legacy no-id
    assert _band_rows(spark, idx) == n0 + fresh.count() * 8
    # and the value anti-join still converges the legacy replay
    D.update_dedup_index(fresh, idx, num_bands=8, shingle_n=2)
    assert _band_rows(spark, idx) == n0 + fresh.count() * 8


def test_compact_gc_false_defers_to_vacuum(spark, docs, tmp_path):
    """The serving-safe OPTIMIZE/VACUUM split: gc=False leaves folded
    dirs on disk for in-flight readers; vacuum reclaims them (incl.
    the ex-base dir) after the grace lease, with serving unchanged."""
    from explora_kafka_spark.operators import dedup as D

    idx = str(tmp_path / "lsh")
    D.build_dedup_index(docs.filter(F.col("doc_id") % 5 != 0), idx,
                        shingle_n=2, num_bands=8)
    D.update_dedup_index(docs.filter(F.col("doc_id") % 5 == 0), idx,
                         num_bands=8, shingle_n=2, batch_id=1)
    before = _band_rows(spark, idx)
    m0 = json.load(open(os.path.join(idx, "_manifest.json")))
    D.compact_dedup_index(spark, idx, gc=False)
    m1 = json.load(open(os.path.join(idx, "_manifest.json")))
    assert len(m1["dirs"]) == 1
    for d in m0["dirs"]:  # folded dirs still on disk for readers
        assert os.path.isdir(os.path.join(idx, d))
    assert _band_rows(spark, idx) == before
    # inside the lease nothing is reclaimed; past it, everything is
    assert D.vacuum_dedup_index(idx, grace_secs=3600) == []
    deleted = D.vacuum_dedup_index(idx, grace_secs=0)
    assert sorted(deleted) == sorted(m0["dirs"])
    assert _band_rows(spark, idx) == before
    on_disk = {d for d in os.listdir(idx) if d.startswith("bands")}
    assert on_disk == set(m1["dirs"])
