"""As-of join — the canonical "operator Spark lacks" (task brief): join
each left row to the most recent right row with `right_ts <= left_ts`
per key.

Implementation is the union-marker windowed merge, which Spark executes
as ONE shuffle on (key) + a per-partition sort — the same cost as a
sort-merge join, with no range-condition nested loop:

    union(left ∪ right) → window(partition key, order ts, right-first)
        → last(right payload, ignorenulls) → keep left rows

Rows tie-break right-before-left at equal ts (an exactly-concurrent
right row IS visible to the left row — matches DuckDB/kdb asof
semantics, and the oracle is DuckDB's native ASOF JOIN).

At scale this is shuffle-optimal: both sides partition by key once; no
broadcast needed; skewed keys fall to AQE. For a time-bucketed storage
layout the window sort is within-partition only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
) -> DataFrame:
    """Backward as-of join: all columns of `left` plus `payload_cols`
    from the most recent `right` row at or before the left timestamp
    (null when no right row precedes)."""
    reserved = set(left.columns) | {on, "_ts", "_is_right"}
    clash = [c for c in payload_cols if c in reserved]
    if clash:
        raise ValueError(
            f"asof_join payload_cols {clash} collide with left columns or "
            f"the helper names _ts/_is_right; rename them on the right side "
            f"before joining"
        )
    l2 = left.withColumn("_ts", F.col(left_ts)).withColumn(
        "_is_right", F.lit(0)
    )
    for c in payload_cols:
        l2 = l2.withColumn(c, F.lit(None).cast(dict(right.dtypes)[c]))
    r2 = right.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(1).alias("_is_right"),
        *[F.col(c) for c in payload_cols],
    )
    for c in left.columns:
        if c not in (on,):
            r2 = r2.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    merged = l2.select(r2.columns).unionByName(r2.select(r2.columns))
    # right rows sort BEFORE left rows at equal ts → visible to them
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_ts").asc(), F.col("_is_right").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = merged.select(
        "*",
        *[
            F.last(F.when(F.col("_is_right") == 1, F.col(c)), ignorenulls=True)
            .over(w)
            .alias(f"_asof_{c}")
            for c in payload_cols
        ],
    )
    out_cols = [c for c in left.columns] + [
        F.col(f"_asof_{c}").alias(c) for c in payload_cols
    ]
    return filled.filter(F.col("_is_right") == 0).select(*out_cols)
