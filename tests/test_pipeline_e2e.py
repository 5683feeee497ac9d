"""End-to-end LLM-corpus pipeline: admission filter → near-dup
canonicalization → whole-doc packing → shard delivery, with the
cross-stage invariants a production curation run depends on. Each
stage is oracle-verified on its own (see its operator tests); this
suite pins that the stages COMPOSE — ids survive, rejected content
never leaks downstream, and the delivered shards reconcile with the
plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from explora_kafka_spark.operators.corpus import assemble_corpus
from explora_kafka_spark.operators.packing import pack_docs, write_shards
from explora_kafka_spark.operators.quality_rules import (
    filter_pipeline_full)
from explora_kafka_spark.operators.text import bpe_tokens_col


def test_corpus_pipeline_end_to_end(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # 1. admission: the five-tier filter stack
    verdict = filter_pipeline_full(docs)
    kept_ids = {r["doc_id"] for r in
                verdict.filter(F.col("keep")).collect()}
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert kept_ids and kept_ids < all_ids  # a real cut, not a no-op

    admitted = docs.join(
        verdict.filter(F.col("keep")).select("doc_id"), "doc_id")

    # 2. near-dup canonicalization over the ADMITTED set only
    canon = assemble_corpus(admitted, threshold=0.5)
    canon_rows = canon.collect()
    canon_ids = {r["doc_id"] for r in canon_rows}
    assert canon_ids <= kept_ids  # nothing rejected re-enters
    # one canonical doc per group, groups partition the admitted set
    assert len({r["group_id"] for r in canon_rows}) == len(canon_rows)
    assert sum(r["group_size"] for r in canon_rows) == len(kept_ids)

    # 3. whole-doc packing of the canonical corpus
    corpus = admitted.join(canon.select("doc_id"), "doc_id")
    packed = pack_docs(corpus, budget=256, shards=4)
    packed_rows = packed.collect()
    packed_ids = {r["doc_id"] for r in packed_rows}
    n_tokens = {
        r["doc_id"]: r["n"] for r in corpus.select(
            "doc_id", F.size(bpe_tokens_col("text")).alias("n"))
        .collect()
    }
    # every canonical doc with tokens is packed exactly once, intact
    assert packed_ids == {d for d in canon_ids if n_tokens[d] > 0}
    assert len(packed_rows) == len(packed_ids)
    for r in packed_rows:
        assert r["n_tokens"] == n_tokens[r["doc_id"]]
    # bins respect the budget except single-doc overflows
    from collections import defaultdict

    bins = defaultdict(list)
    for r in packed_rows:
        bins[(r["shard"], r["bin_id"])].append(r["n_tokens"])
    for members in bins.values():
        assert sum(members) <= 256 or len(members) == 1

    # 4. shard delivery reconciles with the packing plan
    pack_plan = packed.select(
        "shard", F.col("bin_id").alias("pack_id"),
        F.col("doc_id").alias("piece"), F.lit(0).alias("pack_offset"),
        F.col("n_tokens").alias("n_slice_tokens"))
    write_shards(pack_plan, str(tmp_path / "shards"))
    manifest = {r["shard"]: (r["n_packs"], r["n_rows"], r["n_tokens"])
                for r in spark.read.parquet(
                    str(tmp_path / "shards/manifest")).collect()}
    for shard in {r["shard"] for r in packed_rows}:
        rows = [r for r in packed_rows if r["shard"] == shard]
        assert manifest[shard] == (
            len({r["bin_id"] for r in rows}),
            len(rows),
            sum(r["n_tokens"] for r in rows),
        )
