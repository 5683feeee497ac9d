"""Trailing-window anomaly scoring over metric time series.

The reference's query surface stops at rollups (history/snapshot); a
monitoring deployment of the same data asks the next question — "which
hours were abnormal?". `metric_hour_anomaly` scores each (metric, hour)
bucket against the trailing `trail` OBSERVED hours of the same metric:

    z = (hour_avg - trailing_mean) / trailing_stddev

computed entirely with bounded ROWS window frames — the frame holds at
most `trail` rows per evaluation regardless of data volume, so the plan
is one aggregation shuffle (the hourly rollup, which the view lattice
already produces) plus one window shuffle on `metric_id`. No unbounded
state, no Python; at 100 TB the hourly rollup input comes straight from
the materialized `hour` view instead of raw readings (same schema — the
operator takes any (metric_id, h_ts, hourly_avg) relation).

Float parity with the DuckDB oracle: the hourly average is rounded to
6 dp BEFORE the trailing stats, and the trailing mean/std are computed
over exact integer MICRO-UNITS (bigint sums are associative, so window
summation order — which differs between engines and even between runs
of the same engine — cannot move the result; a first cut that windowed
`avg`/`stddev_samp` over doubles flipped 22/3385 rows at the 6-dp
rounding boundary, because averages of 6-dp-rounded values land exactly
on half-µunit boundaries). The derived mean/std use identically-written
IEEE double expressions on identical integer inputs, so they are equal
bit-for-bit by construction. Outputs are rounded to 6 dp (the repo-wide
convention, e.g. operators/normalize.py). A ROWS frame (not RANGE)
means gaps in the hour sequence are skipped, not zero-filled — the
trailing baseline is "the last N hours with data".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: trailing window length (observed hours) for the driver-checked row
DEFAULT_TRAIL = 24

#: minimum trailing observations for a defined baseline; below this the
#: score is NULL (first hours of a metric's history)
DEFAULT_MIN_PERIODS = 12


def metric_hour_anomaly(
    readings: DataFrame,
    trail: int = DEFAULT_TRAIL,
    min_periods: int = DEFAULT_MIN_PERIODS,
    z_thresh: float = 3.0,
) -> DataFrame:
    """Score every (metric, hour) bucket against its trailing baseline.

    Input: (metric_id, ts, value) readings. Output (ordered):
    metric_id, bucket_ms, hourly_avg, trail_n, trail_mean, trail_std,
    z (NULL when the baseline is undefined), is_anomaly.
    """
    hourly = (
        readings.groupBy(
            "metric_id", F.date_trunc("hour", F.col("ts")).alias("h_ts")
        )
        .agg(F.round(F.avg("value"), 6).alias("hourly_avg"))
        # exact integer micro-units: hourly_avg is 6-dp, so *1e6 is
        # within 0.5 of an integer; round() pins the representation
        .withColumn(
            "mu", F.round(F.col("hourly_avg") * 1e6).cast("bigint")
        )
    )
    w = (
        Window.partitionBy("metric_id")
        .orderBy("h_ts")
        .rowsBetween(-trail, -1)
    )
    n = F.count("mu").over(w)
    s1 = F.sum("mu").over(w).cast("double")
    s2 = F.sum(F.col("mu") * F.col("mu")).over(w).cast("double")
    nd = n.cast("double")
    # sample variance in µunits²: (n·Σx² − (Σx)²) / (n·(n−1)) — written
    # in this exact association on both sides
    var_mu = (nd * s2 - s1 * s1) / (nd * (nd - F.lit(1.0)))
    # explicit HALF_UP in µunit space: s1/n lands EXACTLY on .5 µunits
    # whenever n divides 2·s1, and Spark's round() and DuckDB's round()
    # break that tie differently — floor(x + 0.5) is engine-independent
    trail_mean = F.floor(s1 / nd + F.lit(0.5)).cast("double") / F.lit(1e6)
    trail_std = F.when(
        n > 1, F.round(F.sqrt(F.greatest(var_mu, F.lit(0.0))) / 1e6, 6)
    )
    scored = hourly.select(
        "metric_id",
        F.unix_millis("h_ts").alias("bucket_ms"),
        "hourly_avg",
        n.alias("trail_n"),
        trail_mean.alias("trail_mean"),
        trail_std.alias("trail_std"),
    ).withColumn(
        "z",
        F.when(
            (F.col("trail_n") >= min_periods) & (F.col("trail_std") > 0),
            F.round(
                (F.col("hourly_avg") - F.col("trail_mean"))
                / F.col("trail_std"),
                6,
            ),
        ),
    ).withColumn(
        "is_anomaly",
        F.when(F.col("z").isNotNull(), F.abs(F.col("z")) > z_thresh),
    )
    return scored.orderBy("metric_id", "bucket_ms")


def metric_correlation(
    readings: DataFrame,
    round_to: int = 6,
) -> DataFrame:
    """Pearson correlation between every metric pair's hourly-average
    series — "which metrics move together" (sensor cross-talk, redundant
    signals, leading indicators).

    Hours are matched by inner join (pairwise-complete: an hour counts
    only when BOTH metrics observed it). Hourly averages are quantized
    to exact integer MILLI-units (coarser than the anomaly operator's
    µunits so the bigint moment sums Σx·y stay far from overflow for any
    realistic value scale; correlation is scale-invariant, so the
    quantization only defines the statistic as "corr of 3-dp hourly
    averages" — identically in both engines). All five moments are exact
    bigint sums; the textbook formula is evaluated on doubles cast from
    those exact integers with one mirrored expression, so the result is
    engine- and partitioning-independent.

    Scale: the hourly table is |metrics|·|hours| rows (the `hour` view at
    production scale); the pair join is per-hour with metric_a < metric_b
    — M²/2 pairs per hour, fine for dashboard-scale metric counts; for
    thousands of metrics, pre-filter to the metric subset of interest.

    Output (ordered): metric_a, metric_b, n_hours, corr.
    """
    hourly = (
        readings.groupBy(
            "metric_id", F.date_trunc("hour", F.col("ts")).alias("h_ts")
        )
        .agg(F.round(F.avg("value"), 6).alias("hourly_avg"))
        .select(
            "metric_id",
            "h_ts",
            F.floor(F.col("hourly_avg") * 1e3 + F.lit(0.5))
            .cast("bigint")
            .alias("mv"),
        )
    )
    a = hourly.select(
        F.col("metric_id").alias("metric_a"), "h_ts", F.col("mv").alias("x")
    )
    b = hourly.select(
        F.col("metric_id").alias("metric_b"), "h_ts", F.col("mv").alias("y")
    )
    moments = (
        a.join(b, "h_ts")
        .filter(F.col("metric_a") < F.col("metric_b"))
        .groupBy("metric_a", "metric_b")
        .agg(
            F.count("*").alias("n_hours"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("y") * F.col("y")).alias("syy"),
        )
    )
    n = F.col("n_hours").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    den = F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    return (
        moments.select(
            "metric_a",
            "metric_b",
            "n_hours",
            F.when(den > 0, F.round((n * sxy - sx * sy) / den, round_to))
            .alias("corr"),
        )
        .orderBy("metric_a", "metric_b")
    )


def metric_correlation_sql(table: str = "events", round_to: int = 6) -> str:
    """DuckDB mirror of `metric_correlation` (identical quantization,
    moment sums, and final expression)."""
    return f"""
        WITH hourly AS (
            SELECT metric_id, date_trunc('hour', ts) AS h_ts,
                   CAST(floor(round(avg(value), 6) * 1e3 + 0.5) AS BIGINT)
                       AS mv
            FROM {table}
            GROUP BY 1, 2
        ),
        moments AS (
            SELECT a.metric_id AS metric_a, b.metric_id AS metric_b,
                   count(*) AS n_hours,
                   CAST(sum(a.mv) AS BIGINT) AS sx,
                   CAST(sum(b.mv) AS BIGINT) AS sy,
                   CAST(sum(a.mv * b.mv) AS BIGINT) AS sxy,
                   CAST(sum(a.mv * a.mv) AS BIGINT) AS sxx,
                   CAST(sum(b.mv * b.mv) AS BIGINT) AS syy
            FROM hourly a
            JOIN hourly b
              ON a.h_ts = b.h_ts AND a.metric_id < b.metric_id
            GROUP BY 1, 2
        )
        SELECT metric_a, metric_b, n_hours,
               CASE WHEN sqrt(CAST(n_hours AS DOUBLE) * CAST(sxx AS DOUBLE)
                              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                         * sqrt(CAST(n_hours AS DOUBLE) * CAST(syy AS DOUBLE)
                                - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
                    THEN round(
                        (CAST(n_hours AS DOUBLE) * CAST(sxy AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                        / (sqrt(CAST(n_hours AS DOUBLE) * CAST(sxx AS DOUBLE)
                                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                           * sqrt(CAST(n_hours AS DOUBLE)
                                  * CAST(syy AS DOUBLE)
                                  - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
                        {round_to})
               END AS corr
        FROM moments
        ORDER BY 1, 2
    """


def metric_hour_anomaly_sql(
    table: str = "events",
    trail: int = DEFAULT_TRAIL,
    min_periods: int = DEFAULT_MIN_PERIODS,
    z_thresh: float = 3.0,
) -> str:
    """DuckDB mirror (identical rounding points and ROWS frame).

    `table` must expose (metric_id, ts, value) — pass a readings
    derivation for the raw events table.
    """
    return f"""
        WITH hourly AS (
            SELECT metric_id, date_trunc('hour', ts) AS h_ts,
                   round(avg(value), 6) AS hourly_avg,
                   CAST(round(round(avg(value), 6) * 1e6) AS BIGINT) AS mu
            FROM {table}
            GROUP BY 1, 2
        ),
        sums AS (
            SELECT metric_id, epoch_ms(h_ts) AS bucket_ms, hourly_avg,
                   count(mu) OVER w AS trail_n,
                   CAST(CAST(sum(mu) OVER w AS BIGINT) AS DOUBLE) AS s1,
                   CAST(CAST(sum(mu * mu) OVER w AS BIGINT) AS DOUBLE) AS s2
            FROM hourly
            WINDOW w AS (
                PARTITION BY metric_id ORDER BY h_ts
                ROWS BETWEEN {trail} PRECEDING AND 1 PRECEDING
            )
        ),
        trailed AS (
            SELECT metric_id, bucket_ms, hourly_avg, trail_n,
                   CAST(floor(s1 / CAST(trail_n AS DOUBLE) + 0.5) AS DOUBLE)
                       / 1e6 AS trail_mean,
                   CASE WHEN trail_n > 1 THEN round(sqrt(greatest(
                       (CAST(trail_n AS DOUBLE) * s2 - s1 * s1)
                       / (CAST(trail_n AS DOUBLE)
                          * (CAST(trail_n AS DOUBLE) - 1.0)), 0.0
                   )) / 1e6, 6) END AS trail_std
            FROM sums
        )
        SELECT metric_id, bucket_ms, hourly_avg, trail_n, trail_mean,
               trail_std,
               CASE WHEN trail_n >= {min_periods} AND trail_std > 0
                    THEN round((hourly_avg - trail_mean) / trail_std, 6)
               END AS z,
               CASE WHEN trail_n >= {min_periods} AND trail_std > 0
                    THEN abs(round((hourly_avg - trail_mean) / trail_std, 6))
                         > {z_thresh}
               END AS is_anomaly
        FROM trailed
        ORDER BY metric_id, bucket_ms
    """
