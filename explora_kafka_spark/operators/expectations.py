"""Declarative data-quality expectations — the admission gate for a
TABLE the way quality_rules gates individual documents.

A pipeline stage declares row-level predicates with a minimum pass
fraction ("≥ 99.9% of rows have a non-null ts", "100% of lat in
[-90, 90]"), and the validator reports, per expectation: rows checked,
rows passing, the exact pass fraction, and the verdict. Failing
expectations are how a 100 TB ingest run fails FAST and loudly instead
of poisoning downstream views — the Great-Expectations/dbt-test shape,
engine-native.

Reference parity: the reference engine has no data-quality gate (its
only input validation is the metric whitelist, IngestStream.java:296) —
this is engine-extension surface per the task brief.

Design: ALL expectations evaluate in ONE corpus scan — each predicate
becomes a conditional count inside a single aggregate (no per-check
scans, no shuffles beyond the one partial-agg reduce). Pass fractions
are exact integer µunits (n_pass·1e6 DIV n_rows — no floats), so the
verdict is engine- and partitioning-independent. Thresholds are µunit
integers for the same reason.

100 TB: one scan, one 1-row reduce per call, regardless of how many
expectations are declared; predicate columns prune to exactly the
columns referenced (column-pruned parquet scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: (name, sql_bool_expr, min_pass_frac_µ): the expectation triple.
Expectation = tuple[str, str, int]


def expect(
    df: DataFrame,
    expectations: list[Expectation],
) -> DataFrame:
    """Evaluate `expectations` (name, SQL boolean predicate over df's
    columns, min pass fraction in µunits 0..1_000_000) in one scan.

    Output (one row per expectation, declaration order): name, n_rows,
    n_pass, pass_frac_mu, min_frac_mu, ok. NULL predicate results count
    as failures (the conservative read — an expectation about a NULL
    field fails it). An empty table passes every expectation trivially
    (0 DIV guard: pass_frac_mu = 1e6 when n_rows = 0)."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, (_, pred, _) in enumerate(expectations):
        aggs.append(F.sum(
            F.when(F.expr(pred), 1).otherwise(0)).alias(f"_p{i}"))
    row = df.agg(*aggs)
    # ONE aggregate row fans out to one row per expectation via a
    # struct-array explode — a union of per-expectation selects would
    # re-run the corpus aggregate once per expectation
    entries = [
        F.struct(
            F.lit(i).alias("_ord"),
            F.lit(name).alias("name"),
            F.col("_n").alias("n_rows"),
            F.coalesce(F.col(f"_p{i}"), F.lit(0)).alias("n_pass"),
            F.expr(f"CASE WHEN _n = 0 THEN 1000000 "
                   f"ELSE coalesce(_p{i}, 0) * 1000000 DIV _n END")
            .alias("pass_frac_mu"),
            F.lit(min_mu).alias("min_frac_mu"),
        )
        for i, (name, _, min_mu) in enumerate(expectations)
    ]
    return (
        row.select(F.explode(F.array(*entries)).alias("e"))
        .select("e.*")
        .withColumn("ok", F.col("pass_frac_mu") >= F.col("min_frac_mu"))
        .orderBy("_ord")
        .drop("_ord")
    )


def expect_sql(
    table: str,
    expectations: list[Expectation],
) -> str:
    """DuckDB mirror of :func:`expect` (one aggregate scan, identical
    integer µunit fractions)."""
    counts = ", ".join(
        f"sum(CASE WHEN ({pred}) THEN 1 ELSE 0 END) AS p{i}"
        for i, (_, pred, _) in enumerate(expectations))
    rows = " UNION ALL ".join(
        f"""SELECT {i} AS ord, '{name}' AS name, n AS n_rows,
                   CAST(coalesce(p{i}, 0) AS BIGINT) AS n_pass,
                   CAST(CASE WHEN n = 0 THEN 1000000
                        ELSE coalesce(p{i}, 0) * 1000000 // n END
                        AS BIGINT) AS pass_frac_mu,
                   {min_mu} AS min_frac_mu
            FROM agg"""
        for i, (name, _, min_mu) in enumerate(expectations))
    return f"""
        WITH agg AS (SELECT count(*) AS n, {counts} FROM {table}),
        r AS ({rows})
        SELECT name, n_rows, n_pass, pass_frac_mu, min_frac_mu,
               pass_frac_mu >= min_frac_mu AS ok
        FROM r ORDER BY ord
    """


def expect_by(
    df: DataFrame,
    group_col: str,
    expectations: list[Expectation],
) -> DataFrame:
    """Per-GROUP expectations — the per-source quality SLA ("every
    source must keep ≥95% parseable props", "source X must stay in its
    ts range"): same single-scan design as :func:`expect`, with the
    aggregate keyed on `group_col` instead of global. Output: one row
    per (group, expectation), group- then declaration-ordered —
    (group, name, n_rows, n_pass, pass_frac_mu, min_frac_mu, ok).
    Empty groups cannot occur (a group exists only via its rows).

    100 TB: one scan + ONE partial-agg shuffle on the group key; the
    fan-out to per-expectation rows happens on the |groups|-row
    aggregate, never the corpus."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, (_, pred, _) in enumerate(expectations):
        aggs.append(F.sum(
            F.when(F.expr(pred), 1).otherwise(0)).alias(f"_p{i}"))
    row = df.groupBy(F.col(group_col).alias("grp")).agg(*aggs)
    entries = [
        F.struct(
            F.lit(i).alias("_ord"),
            F.lit(name).alias("name"),
            F.col("_n").alias("n_rows"),
            F.coalesce(F.col(f"_p{i}"), F.lit(0)).alias("n_pass"),
            F.expr(f"coalesce(_p{i}, 0) * 1000000 DIV _n")
            .alias("pass_frac_mu"),
            F.lit(min_mu).alias("min_frac_mu"),
        )
        for i, (name, _, min_mu) in enumerate(expectations)
    ]
    return (
        row.select("grp", F.explode(F.array(*entries)).alias("e"))
        .select(F.col("grp").alias(group_col), "e.*")
        .withColumn("ok", F.col("pass_frac_mu") >= F.col("min_frac_mu"))
        .orderBy(group_col, "_ord")
        .drop("_ord")
    )


def expect_by_sql(
    table: str,
    group_col: str,
    expectations: list[Expectation],
) -> str:
    """DuckDB mirror of :func:`expect_by`."""
    counts = ", ".join(
        f"sum(CASE WHEN ({pred}) THEN 1 ELSE 0 END) AS p{i}"
        for i, (_, pred, _) in enumerate(expectations))
    rows = " UNION ALL ".join(
        f"""SELECT grp, {i} AS ord, '{name}' AS name, n AS n_rows,
                   CAST(coalesce(p{i}, 0) AS BIGINT) AS n_pass,
                   CAST(coalesce(p{i}, 0) * 1000000 // n AS BIGINT)
                       AS pass_frac_mu,
                   {min_mu} AS min_frac_mu
            FROM agg"""
        for i, (name, _, min_mu) in enumerate(expectations))
    return f"""
        WITH agg AS (
            SELECT {group_col} AS grp, count(*) AS n, {counts}
            FROM {table} GROUP BY 1
        ),
        r AS ({rows})
        SELECT grp AS {group_col}, name, n_rows, n_pass, pass_frac_mu,
               min_frac_mu, pass_frac_mu >= min_frac_mu AS ok
        FROM r ORDER BY {group_col}, ord
    """
