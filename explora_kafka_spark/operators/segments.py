"""Segment-level corpus deduplication (C4/CCNet-style span dedup).

Exact-duplicate text spans repeated ACROSS documents (boilerplate,
licence blocks, navigation chrome, quoted passages) survive document-
level dedup because the containing documents differ. The standard cure —
C4's "discard duplicated three-sentence spans", CCNet's paragraph-hash
dedup — is segment-granular: split every document into fixed spans, keep
only the corpus-wide FIRST occurrence of each span, and reassemble the
surviving spans into the cleaned document.

This corpus has no sentence/paragraph markers (single-line word streams),
so the segment unit is a fixed run of `seg_tokens` whitespace tokens —
the same structure, token-addressed. First occurrence = smallest
(doc_id, seg_idx), a total order, so the result is deterministic under
any partitioning.

The reference has no text pipeline; this is engine-extension surface
(task brief) alongside operators/dedup.py's document-level family.

100 TB design: two shuffles, both linear in corpus token count —
(1) first-occurrence selection shuffles segment records keyed by a
60-bit md5-prefix hash (8-byte keys, the operators/contamination.py
trick, so the wire carries hashes not span text; both engines compute
the identical hash, so the DuckDB oracle stays exact); a hot span
(corpus-wide boilerplate) is one skewed hash key — AQE skew-join/
partition-split handles it, and the per-key state is a single min,
(2) reassembly shuffles surviving segments back onto doc_id.
No driver-side state, no collect; the segment explode is a ×1 blow-up
in tokens (each token appears in exactly one segment, unlike the ×n
shingle explode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .contamination import _shingle_hash_col, _shingle_hash_sql
from .text import tokens_col, tokens_sql


def _segments(docs: DataFrame, seg_tokens: int, key: str) -> DataFrame:
    """(key, seg_idx, seg): non-overlapping `seg_tokens`-token spans in
    document order. Every doc yields >= 1 segment (split never returns an
    empty array, so ceil(size/seg) >= 1 and the sequence() range is never
    descending). Pure projection — no shuffle."""
    segs = F.expr(
        f"transform(sequence(0, cast(ceil(size(_toks) / {seg_tokens}.0) as"
        f" int) - 1), i -> array_join(slice(_toks, i * {seg_tokens} + 1,"
        f" {seg_tokens}), ' '))"
    )
    return (
        docs.select(F.col(key), tokens_col("text").alias("_toks"))
        .select(key, F.posexplode(segs).alias("seg_idx", "seg"))
    )


def segment_dedup(
    docs: DataFrame, seg_tokens: int = 10, key: str = "doc_id"
) -> DataFrame:
    """Corpus-wide segment dedup: one row per document —
    (key, n_segments, n_kept, text_dedup) where `text_dedup` is the
    document rebuilt from only those segments whose corpus-wide first
    occurrence lies in this document (first = smallest (key, seg_idx)).
    A document made entirely of previously-seen spans survives as an
    empty string with n_kept = 0 — dropping it is the caller's policy
    decision (compose with a filter), not this operator's.
    """
    segs = _segments(docs, seg_tokens, key)
    # window keyed by (hash, seg): the hash is the cheap 8-byte shuffle/
    # compare prefix, and the segment STRING — which this shuffle must
    # carry anyway for reassembly — breaks 60-bit collisions, so two
    # distinct spans that collide in the hash can never dedup each other
    # (at ~1e12 segments a hash-only key would silently delete ~1e5
    # legitimate spans; exactness here is free)
    w = Window.partitionBy("_h", "seg").orderBy(key, "seg_idx")
    kept = (
        segs.withColumn("_h", _shingle_hash_col(F.col("seg")))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
    )
    totals = segs.groupBy(key).agg(F.count("*").alias("n_segments"))
    # collect_list order is nondeterministic — array_sort on the
    # (seg_idx, seg) struct restores document order deterministically
    rebuilt = kept.groupBy(key).agg(
        F.count("*").alias("n_kept"),
        F.array_join(
            F.expr("transform(array_sort(collect_list(struct(seg_idx, seg)))"
                   ", s -> s.seg)"),
            " ",
        ).alias("text_dedup"),
    )
    return (
        totals.join(rebuilt, key, "left")
        .select(
            key,
            "n_segments",
            F.coalesce("n_kept", F.lit(0).cast("long")).alias("n_kept"),
            F.coalesce("text_dedup", F.lit("")).alias("text_dedup"),
        )
        .orderBy(key)
    )


def segment_dedup_sql(
    table: str = "documents", seg_tokens: int = 10, key: str = "doc_id"
) -> str:
    """DuckDB mirror of `segment_dedup` (same normalization, hash,
    first-occurrence order, reassembly)."""
    toks = tokens_sql("text")
    s = seg_tokens
    return f"""
        WITH t AS (SELECT {key}, {toks} AS _toks FROM {table}),
        segs AS (
            SELECT {key}, CAST(u.i AS INT) AS seg_idx,
                   array_to_string(
                       _toks[(u.i * {s} + 1):(u.i * {s} + {s})], ' ') AS seg
            FROM t, unnest(range(0,
                CAST(ceil(len(_toks) / {s}.0) AS BIGINT))) AS u(i)
        ),
        hashed AS (
            SELECT *, {_shingle_hash_sql('seg')} AS _h FROM segs
        ),
        kept AS (
            SELECT * FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY _h, seg ORDER BY {key}, seg_idx) AS _rn
                FROM hashed
            ) WHERE _rn = 1
        ),
        totals AS (
            SELECT {key}, count(*) AS n_segments FROM segs GROUP BY 1
        ),
        rebuilt AS (
            SELECT {key}, count(*) AS n_kept,
                   string_agg(seg, ' ' ORDER BY seg_idx) AS text_dedup
            FROM kept GROUP BY 1
        )
        SELECT t.{key}, t.n_segments,
               coalesce(r.n_kept, 0) AS n_kept,
               coalesce(r.text_dedup, '') AS text_dedup
        FROM totals t LEFT JOIN rebuilt r USING ({key})
        ORDER BY t.{key}
    """
