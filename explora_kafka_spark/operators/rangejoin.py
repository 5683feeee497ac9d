"""Range (interval) join — point-in-interval matching without a
nested-loop join.

Naive `l.ts BETWEEN r.start AND r.end` forces Spark into
BroadcastNestedLoopJoin (O(|L|·|R|) comparisons). This operator buckets
time into fixed-width chunks: each interval explodes into the buckets it
overlaps, points map to one bucket, and the match becomes an EQUI-join
on (key, bucket) followed by the exact containment filter. Cost is
O(|L| + |R|·avg_buckets_per_interval + matches) with one hash shuffle —
the standard interval-bucketing scheme used by Sedona/interval-index
engines, re-expressed in pure DataFrame ops.

Bucket width tunes the explode factor: ~the median interval length is a
good default (each interval lands in ~2 buckets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str | None,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket_ms: int = 3_600_000,
) -> DataFrame:
    """Inner-join `points` to every interval containing them
    (`start <= ts <= end`), optionally also matching an equality key
    `on`. Timestamps are epoch-ms long columns or timestamps (cast
    internally). Returns all columns of both inputs."""
    p_ms = F.unix_millis(points[point_ts]) if dict(points.dtypes)[point_ts] == "timestamp" \
        else points[point_ts].cast("long")
    s_ms = F.unix_millis(intervals[start_ts]) if dict(intervals.dtypes)[start_ts] == "timestamp" \
        else intervals[start_ts].cast("long")
    e_ms = F.unix_millis(intervals[end_ts]) if dict(intervals.dtypes)[end_ts] == "timestamp" \
        else intervals[end_ts].cast("long")

    p = points.withColumn("_p_ms", p_ms).withColumn(
        "_bucket", F.floor(F.col("_p_ms") / bucket_ms)
    )
    i = (
        intervals.withColumn("_s_ms", s_ms)
        .withColumn("_e_ms", e_ms)
        .withColumn(
            "_bucket",
            F.explode(
                F.sequence(
                    F.floor(F.col("_s_ms") / bucket_ms),
                    F.floor(F.col("_e_ms") / bucket_ms),
                )
            ),
        )
    )
    keys = ["_bucket"] + ([on] if on else [])
    joined = p.join(i, on=keys, how="inner").filter(
        (F.col("_p_ms") >= F.col("_s_ms")) & (F.col("_p_ms") <= F.col("_e_ms"))
    )
    return joined.drop("_p_ms", "_s_ms", "_e_ms", "_bucket")
