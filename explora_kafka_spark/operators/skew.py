"""Skew-handling aggregation patterns.

Plain count/sum/min/max never need salting — Spark's partial (map-side)
aggregation already combines before the shuffle, so a hot group costs one
row per task. The operators that DO collapse onto single reducers are the
ones whose state can't partially combine per group: exact COUNT(DISTINCT)
sends every distinct value of a hot group to one task.

`count_distinct_salted` fixes that with the standard two-phase trick:
salt by a hash of the VALUE (not random — deterministic and
value-disjoint), count distinct within each (group, salt) shard, then sum
the shard counts. Values are partitioned disjointly across salts, so the
sum of per-shard distinct counts is EXACT, while the heaviest reducer
handles 1/n of the hot group's values.

`approx_count_distinct` (HLL) is the cheaper scale path when ±2% error is
acceptable — one pass, mergeable sketches, no second shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def count_distinct_salted(
    df: DataFrame,
    group_cols: list[str | Column],
    value_col: str,
    num_salts: int = 16,
    alias: str = "n_distinct",
) -> DataFrame:
    """Exact distinct count per group via value-hash salting (two shuffles
    of bounded size instead of one skew-collapsed shuffle)."""
    salt = F.pmod(F.hash(F.col(value_col)), F.lit(num_salts)).alias("_salt")
    phase1 = (
        df.groupBy(*group_cols, salt)
        .agg(F.countDistinct(value_col).alias("_partial"))
    )
    return (
        phase1.groupBy(*group_cols)
        .agg(F.sum("_partial").alias(alias))
    )


def approx_distinct(
    df: DataFrame,
    group_cols: list[str | Column],
    value_col: str,
    rsd: float = 0.02,
    alias: str = "n_distinct_approx",
) -> DataFrame:
    """HLL-sketch distinct count (mergeable, single-pass — the 100 TB
    default when exactness isn't required)."""
    return df.groupBy(*group_cols).agg(
        F.approx_count_distinct(value_col, rsd).alias(alias)
    )
