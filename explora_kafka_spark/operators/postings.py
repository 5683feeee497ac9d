"""Inverted index (term postings) over `documents(doc_id, text)`.

The retrieval-side artifact a corpus pipeline materializes next to the
training shards: per (term, document) term frequency plus per-term
document frequency and corpus frequency — the inputs to BM25/TF-IDF
serving, keyword-based corpus slicing ("every doc mentioning X"), and
vocabulary pruning. `text.tfidf` ranks terms *within* a document; this
is the transposed, term-keyed view. The reference has no text pipeline
— engine-extension surface per the task brief.

Output is FLAT (one row per term-doc pair with the term stats repeated)
rather than array-valued postings lists: flat rows keep the oracle
comparison exact, write/scan as plain columnar parquet, and a consumer
rebuilds list form with one collect_list over the term key if it wants
the classic layout.

100 TB design: one token explode feeding a (term, doc) partial-agg
shuffle (map-side combine collapses within-doc repeats before the
wire), then per-term df/cf via a window on the term key. Stop-word
terms are the hot keys — the window's per-key state is two running
counters, and AQE's skew split handles the partition imbalance (same
story as the contamination stop-word shingles). Postings are emitted
term-then-doc ordered, which is exactly the layout a downstream
bucketed write on `term` wants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .text import tokens_col, tokens_sql


def term_postings(
    docs: DataFrame, min_df: int = 1, key: str = "doc_id"
) -> DataFrame:
    """(term, doc_id, tf, df, cf): term frequency per document, document
    frequency and corpus frequency per term; (term, doc_id)-ascending.
    `min_df` prunes hapax/rare terms (vocabulary floor)."""
    tf = (
        docs.select(key, F.explode(tokens_col("text")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term", key)
        .agg(F.count("*").alias("tf"))
    )
    w = Window.partitionBy("term")
    out = (
        tf.withColumn("df", F.count("*").over(w))
        .withColumn("cf", F.sum("tf").over(w))
    )
    if min_df > 1:
        out = out.filter(F.col("df") >= min_df)
    return out.select("term", key, "tf", "df", "cf").orderBy("term", key)


def term_postings_sql(
    table: str = "documents", min_df: int = 1, key: str = "doc_id"
) -> str:
    """DuckDB mirror of `term_postings`."""
    toks = tokens_sql("text")
    return f"""
        WITH tok AS (
            SELECT {key}, unnest({toks}) AS term FROM {table}
        ),
        tf AS (
            SELECT term, {key}, count(*) AS tf
            FROM tok WHERE term <> ''
            GROUP BY 1, 2
        ),
        stats AS (
            SELECT term, {key}, tf,
                   count(*) OVER (PARTITION BY term) AS df,
                   CAST(sum(tf) OVER (PARTITION BY term) AS BIGINT) AS cf
            FROM tf
        )
        SELECT term, {key}, tf, df, cf
        FROM stats
        WHERE df >= {min_df}
        ORDER BY term, {key}
    """
