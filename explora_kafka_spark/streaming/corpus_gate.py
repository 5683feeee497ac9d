"""Streaming corpus-admission gate: score every incoming document batch
against the MATERIALIZED corpus indexes and split accept/reject.

A continuously-growing training corpus admits new documents through two
hygiene checks before they may join the corpus:

1. **contamination** — does the document leak held-out/benchmark content?
   (shingle overlap against the materialized shingle index,
   `operators/contamination.py`)
2. **near-duplication** — is it a near-copy of something already held?
   (banded MinHash check against the materialized LSH index,
   `operators/dedup.py` `build_dedup_index`/`dedup_check`)

This module composes the two per micro-batch. The corpus is NEVER
re-scanned: both indexes are the compact 8-byte-key artifacts built once
per corpus snapshot; each batch pays only its own shingles/signatures
plus two equi-joins. This is the streaming face of the round-7 index
family — the same shape `ingest_dedup` gives row-level event dedup.

- `gate_batch`: the batch twin (one micro-batch scored) — the semantics
  the DuckDB oracle checks, and what `foreachBatch` invokes.
- `gate_stream`: Structured Streaming wrapper — file/Kafka doc stream →
  `foreachBatch(gate_batch → split → append accepted/rejected parquet)`.
  Stream ≡ batch is pinned by tests/test_corpus_gate.py.

100 TB design: per batch, work is O(batch shingles + band collisions).
The accept/reject split writes are append-only parquet. Delivery: the
checkpointed availableNow file source processes each input file once;
a crash BETWEEN the two appends inside one foreachBatch can replay the
batch and duplicate rows in the store that already committed — readers
wanting exactly-once either dropDuplicates(doc_id) on read or swap the
appends for the view store's batch-id ledger MERGE
(streaming/pipeline.py) — documented trade-off, not silent. State lives
entirely in the indexes, refreshed by the owner on corpus snapshots, so
the streaming query itself is stateless — no watermark, no state store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.contamination import contamination_check
from ..operators.dedup import NUM_BANDS, NUM_HASHES, dedup_check


def gate_batch(
    spark,
    batch: DataFrame,
    shingle_index: str,
    dedup_index: str,
    taint_max: float = 0.5,
    shingle_n: int = 5,
    num_hashes: int = NUM_HASHES,
    num_bands: int = NUM_BANDS,
    lsh_shingle_n: int = 1,
    min_est: float = 0.0,
) -> DataFrame:
    """Score one document batch: (doc_id, contamination, n_near_dups,
    accepted), doc_id-ascending, one row per batch document. Accepted =
    contamination <= taint_max AND no near-dup candidate above min_est.
    Documents too short to shingle score contamination 0 (nothing to
    leak at the n-gram grain — the same convention as the contamination
    operator, which drops them; the gate must still emit a verdict).
    The key column is fixed to `doc_id`: `dedup_check`'s output schema
    is doc_id/match_id by contract, so a configurable key here would
    only pretend to work — rename upstream instead."""
    key = "doc_id"
    cont = contamination_check(
        spark, batch, shingle_index, n=shingle_n, key=key
    ).select(key, "contamination")
    near = (
        dedup_check(spark, batch, dedup_index,
                    num_hashes=num_hashes, num_bands=num_bands,
                    shingle_n=lsh_shingle_n, min_est=min_est)
        .groupBy(key)
        .agg(F.count("*").alias("n_near_dups"))
    )
    return (
        batch.select(key)
        .join(cont, key, "left")
        .join(near, key, "left")
        .select(
            key,
            F.coalesce("contamination", F.lit(0.0)).alias("contamination"),
            F.coalesce("n_near_dups", F.lit(0).cast("long"))
             .alias("n_near_dups"),
        )
        .withColumn(
            "accepted",
            (F.col("contamination") <= F.lit(taint_max))
            & (F.col("n_near_dups") == 0),
        )
        .orderBy(key)
    )


def gate_stream(
    spark,
    doc_stream: DataFrame,
    shingle_index: str,
    dedup_index: str,
    accepted_path: str,
    rejected_path: str,
    checkpoint: str,
    taint_max: float = 0.5,
    **gate_kwargs,
):
    """Structured Streaming admission gate: for each micro-batch, score
    with `gate_batch` and append the original documents (plus their
    scores) to the accepted/rejected parquet stores. Returns the started
    StreamingQuery (caller awaits/stops). Stateless — restart replays
    only unprocessed source files."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        scored = gate_batch(
            spark, batch_df, shingle_index, dedup_index,
            taint_max=taint_max, **gate_kwargs,
        )
        # persist before the two writes: without it each write action
        # re-executes the whole gate (both index joins, batch shingles,
        # signatures) — 2x every micro-batch
        enriched = batch_df.join(scored, "doc_id").persist()
        try:
            enriched.filter(F.col("accepted")).drop("accepted") \
                .write.mode("append").parquet(accepted_path)
            enriched.filter(~F.col("accepted")).drop("accepted") \
                .write.mode("append").parquet(rejected_path)
        finally:
            enriched.unpersist()

    return (
        doc_stream.writeStream
        .foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def gate_stream_learning(
    spark,
    doc_stream: DataFrame,
    shingle_index: str,
    dedup_index: str,
    accepted_path: str,
    rejected_path: str,
    checkpoint: str,
    taint_max: float = 0.5,
    shingle_n: int = 5,
    lsh_shingle_n: int = 1,
    num_bands: int = NUM_BANDS,
    **gate_kwargs,
):
    """The SELF-LEARNING admission gate: after each micro-batch's
    accepted documents are persisted, they are appended into BOTH text
    indexes (`update_shingle_index` / `update_dedup_index`) — so a
    near-copy arriving in a LATER micro-batch is rejected. Cross-batch
    dedup without any Spark state store: the indexes ARE the state,
    durable, shared, and inspectable.

    Delivery: same availableNow/replay contract as `gate_stream`, and
    since round 13 the index appends are EXACTLY-ONCE — each update
    commits through the index manifest ledger scoped to this stream's
    checkpoint (`operators/index_ledger`; epoch ids are only unique
    per checkpoint), so a replayed micro-batch no-ops in O(1) metadata
    instead of re-running the signature anti-joins (which were already
    value-converged — the r12 contract — but paid an index scan per
    replay). The accepted/rejected parquet sinks stay plain appends
    and are the WEAK link under replay (r13 review): a replayed epoch
    not only duplicates sink rows, it RE-SCORES the batch against
    indexes that now contain the batch's own shingles/bands, so
    previously-accepted docs self-match and land in rejected_path
    with the OPPOSITE verdict — the same doc can sit in both sinks.
    Consumers must treat the sinks as at-least-once with
    first-write-wins semantics (dropDuplicates over doc_id preferring
    the accepted row, or a ParquetViewStore pointed at the sinks for
    the full exactly-once guarantee); the indexes — the part that
    feeds back into verdicts — cannot drift. Within a single
    micro-batch, mutual
    near-dups are both admitted (the update_semantic_index contract)
    — shrink the trigger or pre-dedup the batch when that matters."""
    from ..operators.contamination import update_shingle_index
    from ..operators.dedup import update_dedup_index

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        scored = gate_batch(
            spark, batch_df, shingle_index, dedup_index,
            taint_max=taint_max, shingle_n=shingle_n,
            lsh_shingle_n=lsh_shingle_n, num_bands=num_bands,
            **gate_kwargs,
        )
        # eager checkpoint, NOT persist: the index appends below call
        # refreshByPath on the very stores this verdict's plan scans,
        # which would invalidate a cache and re-evaluate the verdict
        # against the batch's own just-appended content (accepted
        # would collapse to empty and nothing would ever be indexed)
        enriched = (batch_df.join(scored, "doc_id")
                    .localCheckpoint(eager=True))
        accepted = enriched.filter(F.col("accepted")).drop("accepted")
        accepted.write.mode("append").parquet(accepted_path)
        enriched.filter(~F.col("accepted")).drop("accepted") \
            .write.mode("append").parquet(rejected_path)
        if not accepted.isEmpty():
            update_shingle_index(spark, accepted, shingle_index,
                                 n=shingle_n,
                                 batch_id=batch_id, stream_id=checkpoint)
            update_dedup_index(accepted, dedup_index,
                               num_bands=num_bands,
                               shingle_n=lsh_shingle_n,
                               batch_id=batch_id, stream_id=checkpoint)

    return (
        doc_stream.writeStream
        .foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def gate_batch_full(
    spark,
    batch: DataFrame,
    batch_emb: DataFrame,
    shingle_index: str,
    dedup_index: str,
    semantic_index: str,
    taint_max: float = 0.5,
    semantic_threshold_pct: int = 95,
    **gate_kwargs,
) -> DataFrame:
    """The THREE-tier admission verdict: contamination + MinHash
    near-dup (gate_batch) + SEMANTIC near-dup (the embedding tier —
    operators/semdedup.py `semdedup_check` against the materialized
    centroids+reps index). `batch_emb` carries the batch documents'
    embeddings keyed by the same ids (vec_id == doc_id — the upstream
    embedding stage's contract).

    Output (doc_id-ascending): doc_id, contamination, n_near_dups,
    is_semantic_dup, accepted — accepted now also requires NOT
    semantically duplicated. Documents with no embedding row pass the
    semantic tier vacuously (scored by the text tiers only).

    100 TB: the text tiers are per-batch equi-joins against compact
    indexes; the semantic tier is one k×d broadcast + probed-partition
    equi-joins — all three corpus-size-independent."""
    from ..operators.semdedup import semdedup_check

    base = gate_batch(spark, batch, shingle_index, dedup_index,
                      taint_max=taint_max, **gate_kwargs)
    sem = (
        semdedup_check(spark, batch_emb, semantic_index,
                       threshold_pct=semantic_threshold_pct)
        .select(F.col("vec_id").alias("doc_id"),
                F.col("is_dup").alias("is_semantic_dup"))
    )
    return (
        base.drop("accepted")
        .join(sem, "doc_id", "left")
        .select(
            "doc_id", "contamination", "n_near_dups",
            F.coalesce("is_semantic_dup", F.lit(False))
             .alias("is_semantic_dup"),
        )
        .withColumn(
            "accepted",
            (F.col("contamination") <= F.lit(taint_max))
            & (F.col("n_near_dups") == 0)
            & (~F.col("is_semantic_dup")),
        )
        .orderBy("doc_id")
    )


def gate_stream_full(
    spark,
    doc_stream: DataFrame,
    shingle_index: str,
    dedup_index: str,
    semantic_index: str,
    accepted_path: str,
    rejected_path: str,
    checkpoint: str,
    taint_max: float = 0.5,
    semantic_threshold_pct: int = 95,
    **gate_kwargs,
):
    """Streaming three-tier gate: `doc_stream` carries BOTH the text
    and an `embedding` column (the realistic shape — an upstream model
    stage enriches documents before admission); each micro-batch is
    scored by `gate_batch_full` and split into accepted/rejected
    stores. Stateless, availableNow, same delivery contract as
    `gate_stream`."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        emb = batch_df.select(F.col("doc_id").alias("vec_id"),
                              "embedding")
        scored = gate_batch_full(
            spark, batch_df.drop("embedding"), emb,
            shingle_index, dedup_index, semantic_index,
            taint_max=taint_max,
            semantic_threshold_pct=semantic_threshold_pct,
            **gate_kwargs,
        )
        enriched = batch_df.join(scored, "doc_id").persist()
        try:
            enriched.filter(F.col("accepted")).drop("accepted") \
                .write.mode("append").parquet(accepted_path)
            enriched.filter(~F.col("accepted")).drop("accepted") \
                .write.mode("append").parquet(rejected_path)
        finally:
            enriched.unpersist()

    return (
        doc_stream.writeStream
        .foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def gate_batch_full_sql(
    table: str = "documents",
    emb_table: str = "embeddings",
    split_id: int = 250,
    taint_max: float = 0.5,
    semantic_threshold_pct: int = 95,
    k: int = 8,
    iters: int = 2,
    shingle_n: int = 5,
    num_hashes: int = NUM_HASHES,
    num_bands: int = NUM_BANDS,
    lsh_shingle_n: int = 1,
    min_est: float = 0.0,
) -> str:
    """DuckDB mirror of the split-half `gate_batch_full` driver entry:
    text indexes over `doc_id < split_id`, semantic index over
    `vec_id < split_id` (dense ids — the kmeans stride contract), batch
    = the upper half of both tables. Composes `gate_batch_sql` and
    `semdedup_check_sql` as derived tables."""
    from ..operators.semdedup import semdedup_check_sql

    g = gate_batch_sql(
        table,
        batch_pred=f"doc_id >= {split_id}",
        corpus_pred=f"doc_id < {split_id}",
        taint_max=taint_max, shingle_n=shingle_n,
        num_hashes=num_hashes, num_bands=num_bands,
        lsh_shingle_n=lsh_shingle_n, min_est=min_est,
    )
    s = semdedup_check_sql(emb_table, split_id=split_id, k=k,
                           iters=iters,
                           threshold_pct=semantic_threshold_pct)
    return f"""
        SELECT g.doc_id, g.contamination, g.n_near_dups,
               coalesce(s.is_dup, FALSE) AS is_semantic_dup,
               (g.contamination <= {taint_max}
                AND g.n_near_dups = 0
                AND NOT coalesce(s.is_dup, FALSE)) AS accepted
        FROM ({g}) g
        LEFT JOIN ({s}) s ON g.doc_id = s.vec_id
        ORDER BY g.doc_id
    """


def gate_batch_sql(
    table: str = "documents",
    batch_pred: str = "doc_id % 5 = 0",
    corpus_pred: str = "doc_id % 5 <> 0",
    taint_max: float = 0.5,
    shingle_n: int = 5,
    num_hashes: int = NUM_HASHES,
    num_bands: int = NUM_BANDS,
    lsh_shingle_n: int = 1,
    min_est: float = 0.0,
    key: str = "doc_id",
) -> str:
    """DuckDB mirror of `gate_batch` where the indexes were built over
    the `corpus_pred` rows of `table` and the batch is its `batch_pred`
    rows — the oracle recomputes both indexes from scratch (exactly what
    `build_shingle_index` / `build_dedup_index` materialize)."""
    from ..operators.contamination import (
        _shingle_hash_sql, _shingles_list_sql)
    from ..operators.dedup import dedup_check_sql
    from ..operators.text import tokens_sql

    toks = tokens_sql("text")
    shingles = _shingles_list_sql("t", shingle_n)
    h = _shingle_hash_sql("shingle")
    pairs = dedup_check_sql(table, batch_pred, corpus_pred,
                            num_hashes, num_bands, lsh_shingle_n, min_est)
    return f"""
        WITH batch AS (SELECT * FROM {table} WHERE {batch_pred}),
        corpus AS (SELECT * FROM {table} WHERE {corpus_pred}),
        btok AS (SELECT {key}, {toks} AS t FROM batch),
        bsh AS (SELECT {key}, unnest({shingles}) AS shingle FROM btok),
        bdist AS (SELECT {key}, {h} AS _h FROM
                  (SELECT DISTINCT {key}, shingle FROM bsh)),
        ctok AS (SELECT {toks} AS t FROM corpus),
        csh AS (SELECT DISTINCT {h} AS _h FROM
                (SELECT unnest({shingles}) AS shingle FROM ctok)),
        cont AS (
            SELECT bdist.{key},
                   round(count(csh._h) * 1.0 / count(*), 6) AS contamination
            FROM bdist LEFT JOIN csh ON bdist._h = csh._h
            GROUP BY 1
        ),
        nd AS (
            SELECT {key}, count(*) AS n_near_dups
            FROM ({pairs}) GROUP BY 1
        )
        SELECT b.{key},
               coalesce(cont.contamination, 0.0) AS contamination,
               coalesce(nd.n_near_dups, 0) AS n_near_dups,
               (coalesce(cont.contamination, 0.0) <= {taint_max}
                AND coalesce(nd.n_near_dups, 0) = 0) AS accepted
        FROM batch b
        LEFT JOIN cont ON b.{key} = cont.{key}
        LEFT JOIN nd ON b.{key} = nd.{key}
        ORDER BY b.{key}
    """


def gate_batch_scored(
    spark,
    batch: DataFrame,
    batch_emb: DataFrame,
    shingle_index: str,
    dedup_index: str,
    semantic_index: str,
    taint_max: float = 0.5,
    semantic_threshold_pct: int = 95,
    **gate_kwargs,
) -> DataFrame:
    """The FOUR-tier admission verdict: the model-based quality
    classifier (`operators/quality_rules.quality_logit` — stateless,
    the tier a production gate runs FIRST since it needs no index)
    stacked onto the three index tiers of `gate_batch_full`.

    Output (doc_id-ascending): doc_id, contamination, n_near_dups,
    is_semantic_dup, quality_ok, accepted — accepted requires all four
    tiers. 100 TB: the classifier tier is a shuffle-free codegen
    projection over the batch; everything else is gate_batch_full's
    corpus-size-independent cost."""
    from ..operators.quality_rules import quality_logit

    full = gate_batch_full(
        spark, batch, batch_emb, shingle_index, dedup_index,
        semantic_index, taint_max=taint_max,
        semantic_threshold_pct=semantic_threshold_pct, **gate_kwargs,
    )
    q = quality_logit(batch).select(
        "doc_id", F.col("keep").alias("quality_ok"))
    return (
        full.drop("accepted")
        .join(q, "doc_id")
        .withColumn(
            "accepted",
            (F.col("contamination") <= F.lit(taint_max))
            & (F.col("n_near_dups") == 0)
            & (~F.col("is_semantic_dup"))
            & F.col("quality_ok"),
        )
        .orderBy("doc_id")
    )


def gate_batch_scored_sql(
    table: str = "documents",
    emb_table: str = "embeddings",
    split_id: int = 250,
    taint_max: float = 0.5,
    **kwargs,
) -> str:
    """DuckDB mirror of the split-half `gate_batch_scored` entry
    (gate_batch_full_sql × quality_logit_sql on the batch half)."""
    from ..operators.quality_rules import quality_logit_sql

    g = gate_batch_full_sql(table, emb_table, split_id=split_id,
                            taint_max=taint_max, **kwargs)
    q = quality_logit_sql(table)
    return f"""
        SELECT g.doc_id, g.contamination, g.n_near_dups,
               g.is_semantic_dup, q.keep AS quality_ok,
               (g.contamination <= {taint_max}
                AND g.n_near_dups = 0
                AND NOT g.is_semantic_dup
                AND q.keep) AS accepted
        FROM ({g}) g
        JOIN ({q}) q ON q.doc_id = g.doc_id
        ORDER BY g.doc_id
    """
