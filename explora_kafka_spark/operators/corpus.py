"""End-to-end training-corpus assembly: near-dup groups → one canonical
document per group, picked by quality.

The composition a real pretraining pipeline runs after the individual
operators: `dedup.dedup_groups` (MinHash-LSH candidates → exact-Jaccard
edges → connected components) supplies the duplicate clusters;
`text.with_text_stats` supplies the quality signal; the canonical pick is
the highest-quality member (ties broken by min doc_id, so the choice is
deterministic under any execution order).

100 TB design: everything here is the already-scale-audited pieces plus
one window over (group_id) — groups are tiny (near-dup clusters), so the
window's hash partition by group_id is skew-free by construction. Nothing
new shuffles the corpus text: labels and stats are (doc_id, …) narrow
tables joined on doc_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import NUM_BANDS, NUM_HASHES, dedup_groups, dedup_groups_sql
from .text import text_stats_sql, with_text_stats


def assemble_corpus(
    docs: DataFrame,
    threshold: float = 0.6,
    shingle_n: int = 1,
    num_hashes: int = NUM_HASHES,
    num_bands: int = NUM_BANDS,
) -> DataFrame:
    """One row per near-dup group: the kept (canonical) document.

    Output: (doc_id, group_id, group_size, quality_score), group_id-
    ascending. doc_id is the canonical member — highest quality_score,
    then lowest doc_id.
    """
    from pyspark.sql.window import Window

    labels = dedup_groups(docs, threshold=threshold, shingle_n=shingle_n,
                          num_hashes=num_hashes, num_bands=num_bands)
    stats = with_text_stats(docs).select("doc_id", "quality_score")
    joined = labels.join(stats, "doc_id")
    w = Window.partitionBy("group_id")
    wpick = w.orderBy(F.col("quality_score").desc(), "doc_id")
    return (
        joined.withColumn("group_size", F.count("*").over(w))
        .withColumn("_pick", F.row_number().over(wpick))
        .filter(F.col("_pick") == 1)
        .select("doc_id", "group_id", "group_size", "quality_score")
        .orderBy("group_id")
    )


def assemble_corpus_sql(
    table: str = "documents",
    threshold: float = 0.6,
    shingle_n: int = 1,
    num_hashes: int = NUM_HASHES,
    num_bands: int = NUM_BANDS,
) -> str:
    """DuckDB mirror: recursive-CTE groups × stats, same pick order."""
    labels = dedup_groups_sql(table, threshold=threshold,
                              shingle_n=shingle_n, num_hashes=num_hashes,
                              num_bands=num_bands)
    stats = text_stats_sql(table)
    return f"""
        WITH labels AS ({labels}),
        stats AS ({stats}),
        j AS (
            SELECT labels.doc_id, labels.group_id, stats.quality_score
            FROM labels JOIN stats ON labels.doc_id = stats.doc_id
        ),
        ranked AS (
            SELECT *,
                   COUNT(*) OVER (PARTITION BY group_id) AS group_size,
                   row_number() OVER (
                       PARTITION BY group_id
                       ORDER BY quality_score DESC, doc_id
                   ) AS _pick
            FROM j
        )
        SELECT doc_id, group_id, group_size, quality_score
        FROM ranked WHERE _pick = 1 ORDER BY group_id
    """
