"""Time-series completion + distribution profiling over the readings
stream — the two monitoring questions next to `operators/anomaly.py`'s
"which hours were abnormal?": "what happened in the hours with no
data?" (gap interpolation) and "what does this metric's value
distribution look like?" (fixed-bin histograms).

The reference serves rollups of OBSERVED buckets only
(`QueryingController.java` history paths); dashboards drawing those
series need the gaps filled. `interpolate_hourly` densifies each
(metric, cell) hourly series between its first and last observed
buckets and linearly interpolates the missing ones.

Float parity (the anomaly.py discipline): observed hourly averages are
rounded to 6 dp, then converted to integer µunits; the interpolation
weight is an exact ratio of small bigints, the products stay < 2^53
(exactly representable doubles), and the HALF_UP is floor(x + 0.5) —
engine-independent. Division by 1e6 at the end is the same IEEE
operation in both engines.

100 TB design: the hourly rollup is the materialized `hour` view at
scale (same schema here from raw readings so the oracle is
self-contained); the grid explode emits one row per (series, hour) —
output-sized, not data-sized; gap filling is two ignore-nulls running
windows over the series partition (one shuffle on the series key, ROWS
frames, no Python). Histograms are a pure projection + one partial-agg
shuffle on (metric, bin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

HOUR_MS = 3_600_000

#: fixed histogram bin width (value units) — a production deployment
#: derives it per metric from min/max; fixed keeps the row oracle-able
DEFAULT_BIN_WIDTH = 5.0


def interpolate_hourly(
    readings: DataFrame,
    precision: int | None = None,
) -> DataFrame:
    """Densify each hourly series between its first and last observed
    buckets; linear interpolation for interior gaps. Series key =
    metric_id (the anomaly.py semantic — dense, dashboard-shaped), or
    (metric_id, gh@precision) when `precision` is given; beware that
    fine cells make the grid mostly-gap (series × span rows). Output
    (ordered): metric_id, gh, bucket_ms, avg, is_interpolated ('*' gh
    for metric-level series). Boundary buckets are observed by
    construction, so every gap has both neighbors and no NULLs
    survive."""
    gh = (
        F.lit("*") if precision is None
        else F.substring("geohash", 1, precision)
    )
    hourly = (
        readings.groupBy(
            "metric_id",
            gh.alias("gh"),
            F.date_trunc("hour", F.col("ts")).alias("h_ts"),
        )
        .agg(F.round(F.avg("value"), 6).alias("avg"))
        .withColumn("mu", F.round(F.col("avg") * 1e6).cast("bigint"))
        .withColumn(
            "idx", (F.unix_millis("h_ts") / HOUR_MS).cast("bigint")
        )
        .select("metric_id", "gh", "idx", "avg", "mu")
    )
    grid = (
        hourly.groupBy("metric_id", "gh")
        .agg(F.min("idx").alias("lo"), F.max("idx").alias("hi"))
        .select(
            "metric_id", "gh",
            F.explode(F.sequence("lo", "hi")).alias("idx"),
        )
    )
    joined = grid.join(hourly, ["metric_id", "gh", "idx"], "left")
    wp = (
        Window.partitionBy("metric_id", "gh").orderBy("idx")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = (
        Window.partitionBy("metric_id", "gh").orderBy("idx")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs_idx = F.when(F.col("mu").isNotNull(), F.col("idx"))
    prev_mu = F.last("mu", ignorenulls=True).over(wp)
    prev_idx = F.last(obs_idx, ignorenulls=True).over(wp)
    next_mu = F.first("mu", ignorenulls=True).over(wn)
    next_idx = F.first(obs_idx, ignorenulls=True).over(wn)
    # exact: (Δmu · Δt) < 2^53, den ≥ 1; floor(x + 0.5) is HALF_UP on
    # an exactly-representable double ratio in both engines
    interp_mu = prev_mu + F.floor(
        ((next_mu - prev_mu) * (F.col("idx") - prev_idx)).cast("double")
        / (next_idx - prev_idx).cast("double")
        + F.lit(0.5)
    ).cast("bigint")
    filled = joined.select(
        "metric_id",
        "gh",
        (F.col("idx") * HOUR_MS).alias("bucket_ms"),
        F.when(F.col("mu").isNotNull(), F.col("avg"))
        .otherwise(interp_mu.cast("double") / F.lit(1e6))
        .alias("avg"),
        F.col("mu").isNull().alias("is_interpolated"),
    )
    return filled.orderBy("metric_id", "gh", "bucket_ms")


def interpolate_hourly_sql(table: str, precision: int | None = None) -> str:
    """DuckDB mirror of `interpolate_hourly`; `table` must expose
    (metric_id, geohash, ts, value)."""
    gh = "'*'" if precision is None else f"substr(geohash, 1, {precision})"
    return f"""
        WITH hourly AS (
            SELECT metric_id, {gh} AS gh,
                   round(avg(value), 6) AS avg,
                   CAST(round(round(avg(value), 6) * 1e6) AS BIGINT) AS mu,
                   epoch_ms(date_trunc('hour', ts)) // {HOUR_MS} AS idx
            FROM {table}
            GROUP BY metric_id, {gh}, date_trunc('hour', ts)
        ),
        grid AS (
            SELECT metric_id, gh, unnest(range(lo, hi + 1)) AS idx
            FROM (
                SELECT metric_id, gh, min(idx) AS lo, max(idx) AS hi
                FROM hourly GROUP BY 1, 2
            )
        ),
        joined AS (
            SELECT g.metric_id, g.gh, g.idx, h.avg, h.mu
            FROM grid g LEFT JOIN hourly h USING (metric_id, gh, idx)
        ),
        walled AS (
            SELECT *,
                   last_value(mu IGNORE NULLS) OVER wp AS prev_mu,
                   last_value(CASE WHEN mu IS NOT NULL THEN idx END
                              IGNORE NULLS) OVER wp AS prev_idx,
                   first_value(mu IGNORE NULLS) OVER wn AS next_mu,
                   first_value(CASE WHEN mu IS NOT NULL THEN idx END
                               IGNORE NULLS) OVER wn AS next_idx
            FROM joined
            WINDOW wp AS (
                PARTITION BY metric_id, gh ORDER BY idx
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ), wn AS (
                PARTITION BY metric_id, gh ORDER BY idx
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
            )
        )
        SELECT metric_id, gh, idx * {HOUR_MS} AS bucket_ms,
               CASE WHEN mu IS NOT NULL THEN avg
                    ELSE CAST(prev_mu + CAST(floor(
                        CAST((next_mu - prev_mu) * (idx - prev_idx)
                             AS DOUBLE)
                        / CAST(next_idx - prev_idx AS DOUBLE) + 0.5
                    ) AS BIGINT) AS DOUBLE) / 1e6
               END AS avg,
               mu IS NULL AS is_interpolated
        FROM walled
        ORDER BY metric_id, gh, bucket_ms
    """


def metric_day_percentiles(
    readings: DataFrame,
    probs: tuple = (0.5, 0.95, 0.99),
) -> DataFrame:
    """Exact interpolated percentiles per (metric, day) — the latency-
    style SLO readout next to the avg/min/max the rollups carry.
    Output: metric_id, bucket_ms, n, p50, p95, p99 (6 dp).

    Determinism: Spark's `percentile` and DuckDB's `quantile_cont` both
    define the exact linear-interpolated quantile at rank (n−1)·p over
    the sorted values — same two order statistics, same IEEE lerp, so
    round(6) parity holds without µunit machinery. Exact percentiles
    sort per group; at 100 TB use this per (metric, day) partition
    (bounded groups) or swap in approx_percentile with a documented
    error when groups outgrow memory."""
    aggs = [F.count("*").alias("n")]
    for p in probs:
        aggs.append(
            F.round(F.expr(f"percentile(value, {p!r})"), 6)
            .alias(f"p{int(p * 100)}"))
    return (
        readings.groupBy(
            "metric_id", F.date_trunc("day", F.col("ts")).alias("_d"))
        .agg(*aggs)
        .select("metric_id", F.unix_millis("_d").alias("bucket_ms"),
                "n", *[f"p{int(p * 100)}" for p in probs])
        .orderBy("metric_id", "bucket_ms")
    )


def metric_day_percentiles_sql(
    table: str, probs: tuple = (0.5, 0.95, 0.99)
) -> str:
    """DuckDB mirror of `metric_day_percentiles`."""
    cols = ", ".join(
        f"round(quantile_cont(value, {p!r}), 6) AS p{int(p * 100)}"
        for p in probs)
    return f"""
        SELECT metric_id,
               epoch_ms(date_trunc('day', ts)) AS bucket_ms,
               count(*) AS n, {cols}
        FROM {table}
        GROUP BY 1, 2
        ORDER BY metric_id, bucket_ms
    """


def metric_histogram(
    readings: DataFrame,
    bin_width: float = DEFAULT_BIN_WIDTH,
) -> DataFrame:
    """Fixed-width value histogram per metric: (metric_id, bin, bin_lo,
    bin_hi, n) — the distribution profile a monitoring UI draws next to
    the rollups. floor(value / width) keeps negative values in the
    right bin (floor, not truncate-toward-zero)."""
    b = F.floor(F.col("value") / F.lit(bin_width)).cast("bigint")
    return (
        readings.groupBy("metric_id", b.alias("bin"))
        .agg(F.count("*").alias("n"))
        .select(
            "metric_id",
            "bin",
            F.round(F.col("bin") * bin_width, 6).alias("bin_lo"),
            F.round((F.col("bin") + 1) * bin_width, 6).alias("bin_hi"),
            "n",
        )
        .orderBy("metric_id", "bin")
    )


def metric_histogram_sql(
    table: str, bin_width: float = DEFAULT_BIN_WIDTH
) -> str:
    """DuckDB mirror of `metric_histogram`."""
    return f"""
        SELECT metric_id,
               CAST(floor(value / {bin_width}) AS BIGINT) AS bin,
               round(CAST(floor(value / {bin_width}) AS BIGINT)
                     * {bin_width}, 6) AS bin_lo,
               round((CAST(floor(value / {bin_width}) AS BIGINT) + 1)
                     * {bin_width}, 6) AS bin_hi,
               count(*) AS n
        FROM {table}
        GROUP BY 1, 2
        ORDER BY metric_id, bin
    """


def metric_trend(readings: DataFrame) -> DataFrame:
    """Per-metric LINEAR TREND over the daily series + a next-day
    forecast — exact-integer ordinary least squares (the capacity-
    planning readout next to the rollups: "is this metric growing, and
    where will it be tomorrow?").

    Per metric: daily sums are rounded to 2 dp and scaled to exact
    integer centi-units (the interpolate_hourly round-then-scale
    discipline); x = whole days since the metric's first observed day
    (real gaps keep their spacing). The OLS closed form is evaluated
    entirely in BIGINT — n, Σx, Σy, Σx², Σxy, D = n·Σx² − (Σx)² — and
    reported as truncating integer divisions (`div` ≡ DuckDB `//`,
    both toward zero, verified incl. negatives):

      slope_cpd  = (n·Σxy − Σx·Σy) div D     (centi-units per day)
      forecast_c = (Σy·Σx² − Σx·Σxy + (n·Σxy − Σx·Σy)·x_next) div D

    Single-day metrics (D = 0) report NULLs. No float op after the
    2 dp rounding, so the DuckDB mirror is bit-exact.

    Output: metric_id, n_days, slope_cpd, forecast_c (metric-asc).

    100 TB: one (metric, day) partial-agg shuffle (the rollup cost),
    then a |metrics|-row aggregate — statistic-sized. The BIGINT
    products hold to ~1e18 (Σy·Σx² is the binding term: ~90-day
    windows × 1e12 daily centi-sums); beyond that swap the five sums
    to DECIMAL(38,0) (the embedding_covariance pattern) — same plan."""
    daily = (
        readings.groupBy(
            "metric_id",
            (F.unix_millis(F.date_trunc("day", F.col("ts")))
             / F.lit(86_400_000)).cast("bigint").alias("d"))
        .agg(F.floor(F.round(F.sum("value"), 2) * 100 + F.lit(0.5))
             .cast("bigint").alias("y"))
        .withColumn(
            "x", (F.col("d")
                  - F.min("d").over(Window.partitionBy("metric_id"))))
    )
    s = daily.groupBy("metric_id").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.max("x").alias("xmax"),
    )
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return (
        s.select(
            "metric_id",
            F.col("n").alias("n_days"),
            F.when(den != 0, F.expr(
                "(n * sxy - sx * sy) div (n * sxx - sx * sx)"))
            .alias("slope_cpd"),
            F.when(den != 0, F.expr(
                "(sy * sxx - sx * sxy + (n * sxy - sx * sy) * (xmax + 1))"
                " div (n * sxx - sx * sx)")).alias("forecast_c"),
        )
        .orderBy("metric_id")
    )


def metric_trend_sql(table: str) -> str:
    """DuckDB mirror of `metric_trend` (same BIGINT OLS closed form;
    `//` and `%` match Spark's `div`/`%` toward-zero semantics)."""
    return f"""
        WITH daily AS (
            SELECT metric_id,
                   epoch_ms(date_trunc('day', ts)) // 86400000 AS d,
                   CAST(floor(round(sum(value), 2) * 100 + 0.5)
                        AS BIGINT) AS y
            FROM {table}
            GROUP BY 1, 2
        ),
        xd AS (
            SELECT metric_id, y,
                   d - min(d) OVER (PARTITION BY metric_id) AS x
            FROM daily
        ),
        s AS (
            SELECT metric_id, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
                   sum(x * x) AS sxx, sum(x * y) AS sxy, max(x) AS xmax
            FROM xd GROUP BY 1
        )
        SELECT metric_id, n AS n_days,
               CASE WHEN n * sxx - sx * sx <> 0 THEN
                   CAST((n * sxy - sx * sy) // (n * sxx - sx * sx)
                        AS BIGINT) END AS slope_cpd,
               CASE WHEN n * sxx - sx * sx <> 0 THEN
                   CAST((sy * sxx - sx * sxy
                         + (n * sxy - sx * sy) * (xmax + 1))
                        // (n * sxx - sx * sx) AS BIGINT) END AS forecast_c
        FROM s ORDER BY metric_id
    """


def metric_movers(readings: DataFrame, top: int = 20) -> DataFrame:
    """Top day-over-day MOVERS: the dashboard's "what changed the most
    since yesterday?" — per metric, consecutive-day deltas of the
    daily sum (2-dp centi-units, the metric_trend discipline), ranked
    by absolute change. Gaps break the chain (a delta needs the
    PREVIOUS calendar day, not the previous observed day — a metric
    dark for a week shouldn't report a week-sized "daily" move).

    Output: (metric_id, day_ms, prev_c, cur_c, delta_c), |delta| desc
    then (metric, day) asc, top `top`. One (metric, day) rollup
    shuffle + a per-metric lag window + TakeOrdered — all integer."""
    daily = (
        readings.groupBy(
            "metric_id",
            (F.unix_millis(F.date_trunc("day", F.col("ts")))
             / F.lit(86_400_000)).cast("bigint").alias("d"))
        .agg(F.floor(F.round(F.sum("value"), 2) * 100 + F.lit(0.5))
             .cast("bigint").alias("y"))
    )
    w = Window.partitionBy("metric_id").orderBy("d")
    return (
        daily.withColumn("prev_d", F.lag("d").over(w))
        .withColumn("prev_c", F.lag("y").over(w))
        .filter(F.col("prev_d") == F.col("d") - 1)
        .select(
            "metric_id",
            (F.col("d") * 86_400_000).alias("day_ms"),
            "prev_c",
            F.col("y").alias("cur_c"),
            (F.col("y") - F.col("prev_c")).alias("delta_c"),
        )
        .orderBy(F.abs(F.col("delta_c")).desc(), "metric_id", "day_ms")
        .limit(top)
    )


def metric_movers_sql(table: str, top: int = 20) -> str:
    """DuckDB mirror of `metric_movers`."""
    return f"""
        WITH daily AS (
            SELECT metric_id,
                   epoch_ms(date_trunc('day', ts)) // 86400000 AS d,
                   CAST(floor(round(sum(value), 2) * 100 + 0.5)
                        AS BIGINT) AS y
            FROM {table}
            GROUP BY 1, 2
        ),
        lagged AS (
            SELECT metric_id, d, y,
                   lag(d) OVER (PARTITION BY metric_id ORDER BY d)
                       AS prev_d,
                   lag(y) OVER (PARTITION BY metric_id ORDER BY d)
                       AS prev_c
            FROM daily
        )
        SELECT metric_id, d * 86400000 AS day_ms, prev_c,
               y AS cur_c, y - prev_c AS delta_c
        FROM lagged
        WHERE prev_d = d - 1
        ORDER BY abs(y - prev_c) DESC, metric_id, day_ms
        LIMIT {top}
    """


def percentile_approx_audit(
    readings: DataFrame,
    probs: tuple = (0.5, 0.95, 0.99),
    accuracy: int = 1000,
) -> DataFrame:
    """AUDIT of the approximate-percentile scale path: per (metric,
    day), the exact interpolated quantile (`metric_day_percentiles`)
    next to Spark's `approx_percentile` (KLL-style sketch at
    `accuracy`) and their absolute error — the priced trade the exact
    path's docstring points to for groups that outgrow memory at
    100 TB (sketches merge map-side; no per-group sort ever).

    Spark-only sketch ⇒ no DuckDB mirror (the HLL rows-only
    precedent); the pytest bounds the error instead. Output:
    metric_id, bucket_ms, n, then (p{P}, p{P}_approx, p{P}_err) per
    prob, 6 dp."""
    aggs = [F.count("*").alias("n")]
    cols = []
    for p in probs:
        tag = f"p{int(p * 100)}"
        aggs.append(F.round(F.expr(f"percentile(value, {p!r})"), 6)
                    .alias(tag))
        aggs.append(F.round(F.expr(
            f"approx_percentile(value, {p!r}, {accuracy})"), 6)
            .alias(f"{tag}_approx"))
        cols += [tag, f"{tag}_approx"]
    out = (
        readings.groupBy(
            "metric_id", F.date_trunc("day", F.col("ts")).alias("_d"))
        .agg(*aggs)
    )
    err_cols = []
    for p in probs:
        tag = f"p{int(p * 100)}"
        err_cols.append(
            F.round(F.abs(F.col(tag) - F.col(f"{tag}_approx")), 6)
            .alias(f"{tag}_err"))
    return (
        out.select("metric_id", F.unix_millis("_d").alias("bucket_ms"),
                   "n", *cols, *err_cols)
        .orderBy("metric_id", "bucket_ms")
    )


def percentile_rank_audit(
    readings: DataFrame,
    probs: tuple = (0.5, 0.95, 0.99),
    accuracy: int = 1000,
) -> DataFrame:
    """Oracle-checkable AUDIT of the approximate-percentile scale path
    (the `cms_heavy_hitters` exact-audit pattern; VERDICT r10 #2 — the
    registry twin that replaces the rows-only `percentile_approx_audit`
    driver entry): per (metric, day), the EXACT interpolated quantiles
    (`metric_day_percentiles` semantics — oracle-matched values) plus
    one boolean per prob asserting Spark's `approx_percentile`
    (KLL/GK-style sketch at `accuracy`) landed within its published
    rank-error bound.

    The booleans are deterministic even though the sketch's merge order
    is not: GK guarantees the returned value's RANK is within
    n/accuracy of the target for EVERY merge order, so the flag is
    provably TRUE whenever the implementation honors its contract — the
    oracle simply pins TRUE, and the row goes red only if Spark's
    sketch ever violates its bound. Rank check: the approx value v's
    rank interval in the group is [count(<v)+1, count(<=v)]; it must
    intersect [p·n − err, p·n + err] with err = n/accuracy + 2 (the +2
    absorbs the p·n vs p·(n−1)+1 definitional slack).

    Output: metric_id, bucket_ms, n, p50, p95, p99 (exact, 6 dp),
    ok50, ok95, ok99.

    100 TB design: one rollup aggregate (exact percentile per bounded
    (metric, day) group + mergeable sketch), then ONE re-join of the
    statistic-sized group table back to readings (broadcast) for the
    rank counts — no per-group sort beyond the bounded groups the exact
    path already documents."""
    keys = ["metric_id", F.date_trunc("day", F.col("ts")).alias("_d")]
    # count(value), not count(*): percentile/approx_percentile and the
    # rank-count sums all ignore NULL readings, so the rank target
    # t = p·n must live on the same non-null scale (round-11
    # self-review — a NULL-bearing group previously tested an inflated
    # target against deflated rank counts)
    aggs = [F.count("value").alias("n")]
    for p in probs:
        tag = f"p{int(p * 100)}"
        aggs.append(F.round(F.expr(f"percentile(value, {p!r})"), 6)
                    .alias(tag))
        aggs.append(F.expr(
            f"approx_percentile(value, {p!r}, {accuracy})").alias(f"_a{tag}"))
    g = readings.groupBy(*keys).agg(*aggs)
    r = readings.select(
        "metric_id", F.date_trunc("day", F.col("ts")).alias("_d"), "value")
    j = r.join(F.broadcast(g), ["metric_id", "_d"])
    aggs2 = [F.max("n").alias("n")]
    for p in probs:
        tag = f"p{int(p * 100)}"
        aggs2.append(F.max(tag).alias(tag))
        aggs2.append(F.sum((F.col("value") < F.col(f"_a{tag}"))
                           .cast("long")).alias(f"_lo{tag}"))
        aggs2.append(F.sum((F.col("value") <= F.col(f"_a{tag}"))
                           .cast("long")).alias(f"_hi{tag}"))
    out = j.groupBy("metric_id", "_d").agg(*aggs2)
    oks = []
    for p in probs:
        tag = f"p{int(p * 100)}"
        err = F.col("n").cast("double") / accuracy + 2.0
        t = F.col("n").cast("double") * p
        oks.append(
            (((F.col(f"_lo{tag}") + 1).cast("double") - err <= t)
             & (t <= F.col(f"_hi{tag}").cast("double") + err))
            .alias(f"ok{int(p * 100)}"))
    return (
        out.select("metric_id", F.unix_millis("_d").alias("bucket_ms"),
                   "n", *[f"p{int(p * 100)}" for p in probs], *oks)
        .orderBy("metric_id", "bucket_ms")
    )


def percentile_rank_audit_sql(
    table: str, probs: tuple = (0.5, 0.95, 0.99)
) -> str:
    """DuckDB mirror of `percentile_rank_audit`: exact quantiles are
    computed (quantile_cont ≡ Spark `percentile`, the
    metric_day_percentiles parity note); the bound flags are pinned
    TRUE — the sketch's published guarantee, which the Spark side
    re-derives from actual rank counts."""
    cols = ", ".join(
        f"round(quantile_cont(value, {p!r}), 6) AS p{int(p * 100)}"
        for p in probs)
    flags = ", ".join(f"TRUE AS ok{int(p * 100)}" for p in probs)
    return f"""
        SELECT metric_id,
               epoch_ms(date_trunc('day', ts)) AS bucket_ms,
               count(value) AS n, {cols}, {flags}
        FROM {table}
        GROUP BY 1, 2
        ORDER BY metric_id, bucket_ms
    """
