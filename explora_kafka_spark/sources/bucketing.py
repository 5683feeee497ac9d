"""Bucketed (co-located) join support.

At 100 TB the dominant cost of a fact-fact join is the shuffle. Writing
both tables bucketed by the join key (same bucket count) lets Spark plan
a SortMergeJoin with NO Exchange on either side — each task joins bucket
i against bucket i in place. This module wraps the write/read pattern
and is proven by a plan assertion in tests/test_bucketing.py.

The reference has no joins at all (SURVEY §2.7); this is engine
infrastructure for the extension workloads (dedup/session/TPC-H-style
queries) at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 8,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Persist `df` as a bucketed table (parquet; external when `path` is
    given — bucketing metadata lives in the catalog, so `saveAsTable` is
    required either way). Tables bucketed on the same keys with the same
    bucket count join without a shuffle."""
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
    )
    writer = writer.sortBy(*(sort_cols or bucket_cols))
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def cocated_join_has_no_shuffle(joined: DataFrame) -> bool:
    """True when the executed plan contains a SortMergeJoin with no
    Exchange feeding it (the co-location guarantee)."""
    plan = joined._jdf.queryExecution().executedPlan().toString()
    return "SortMergeJoin" in plan and "Exchange" not in plan
