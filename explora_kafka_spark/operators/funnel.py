"""Event-sequence analytics over `events(user_id, ts, event_type, ...)`:
ordered funnels and cohort retention.

The reference's query surface is spatio-temporal aggregation; a user of
this engine ingesting product/event streams immediately asks the two
classic event-analytics questions the reference cannot answer:

- **funnel**: of the users who did step 1, how many went on to do step 2
  AFTER it, then step 3 after that (earliest-chain semantics)?
- **retention**: of the users whose first activity fell in week W, how
  many were active again in week W+k?

Both are deterministic compositions of min-aggregations and equi-joins —
no sessionization state, no Python.

100 TB design:
- funnel: one `groupBy(user)` min per step plus one equi-join per step
  against the per-user frontier (k steps = k bounded rounds; the
  frontier table is one row per qualifying user, shrinking every step).
  No collect_list of a user's full history — a hot user costs nothing
  beyond their event rows in the scan.
- retention: one min-aggregation for cohorts, one distinct on
  (cohort, offset, user) — both partial-agg shuffles on user-keyed
  rows; the final matrix is cohorts × offsets, tiny.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    steps: Sequence[str] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within: str | None = None,
) -> DataFrame:
    """Earliest-chain funnel: step i counts users with an event of type
    steps[i] STRICTLY AFTER their earliest qualifying steps[i-1] event —
    and, when `within` is given (an INTERVAL string like '1 hour'), no
    later than that horizon after the user's STEP-1 time (the classic
    conversion-window funnel).
    Output: (step_idx, step, n_users, conversion) — conversion is the
    fraction of step-1 users surviving to this step, rounded to 6 dp."""
    from pyspark.sql.window import Window

    frontier = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("_t"))
    )
    if within is not None:
        frontier = frontier.withColumn(
            "_deadline", F.expr(f"_t + INTERVAL {within}"))
    pieces = []

    def _piece(idx: int, step: str, fr: DataFrame) -> DataFrame:
        return fr.agg(F.count("*").alias("n_users")).select(
            F.lit(idx).cast("int").alias("step_idx"),
            F.lit(step).alias("step"),
            "n_users",
        )

    pieces.append(_piece(1, steps[0], frontier))
    for i, step in enumerate(steps[1:], start=2):
        nxt = (
            events.filter(F.col(type_col) == step)
            .join(frontier, user_col)
            .filter(F.col(ts_col) > F.col("_t"))
        )
        if within is not None:
            nxt = nxt.filter(F.col(ts_col) <= F.col("_deadline"))
            frontier = nxt.groupBy(user_col).agg(
                F.min(ts_col).alias("_t"),
                F.min("_deadline").alias("_deadline"),
            )
        else:
            frontier = nxt.groupBy(user_col).agg(
                F.min(ts_col).alias("_t"))
        pieces.append(_piece(i, step, frontier))
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    # the k-row result needs step 1's count on every row: a k-row global
    # window, not a driver collect (lazy end to end)
    w = Window.partitionBy(F.lit(1))
    base = F.max(F.when(F.col("step_idx") == 1, F.col("n_users"))).over(w)
    return (
        out.withColumn(
            "conversion",
            F.round(F.col("n_users") / F.greatest(base, F.lit(1)), 6),
        )
        .orderBy("step_idx")
    )


def funnel_sql(
    table: str = "events",
    steps: Sequence[str] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within: str | None = None,
) -> str:
    """DuckDB mirror of `funnel` (same earliest-chain + horizon
    semantics)."""
    dl = f", min({ts_col}) + INTERVAL {within} AS _deadline" if within else ""
    ctes = [
        f"""f1 AS (
            SELECT {user_col}, min({ts_col}) AS _t{dl} FROM {table}
            WHERE {type_col} = '{steps[0]}' GROUP BY 1
        )"""
    ]
    for i, step in enumerate(steps[1:], start=2):
        horizon = " AND e.{0} <= p._deadline".format(ts_col) if within else ""
        carry = ", min(p._deadline) AS _deadline" if within else ""
        ctes.append(f"""f{i} AS (
            SELECT e.{user_col}, min(e.{ts_col}) AS _t{carry}
            FROM {table} e JOIN f{i - 1} p ON e.{user_col} = p.{user_col}
            WHERE e.{type_col} = '{step}' AND e.{ts_col} > p._t{horizon}
            GROUP BY 1
        )""")
    selects = []
    for i, step in enumerate(steps, start=1):
        selects.append(
            f"SELECT {i} AS step_idx, '{step}' AS step,"
            f" (SELECT count(*) FROM f{i}) AS n_users,"
            f" round((SELECT count(*) FROM f{i}) * 1.0"
            f" / greatest((SELECT count(*) FROM f1), 1), 6) AS conversion"
        )
    return ("WITH " + ",\n".join(ctes) + "\n"
            + "\nUNION ALL\n".join(selects) + "\nORDER BY step_idx")


def retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention: users are cohorted by the Monday-week of
    their FIRST event; each later active week contributes to that
    cohort's offset row. Output: (cohort_week 'yyyy-MM-dd', week_offset int,
    n_active, n_cohort, retention), cohort/offset-ascending. offset 0
    is the cohort week itself (retention 1.0 by construction)."""
    firsts = (
        events.groupBy(user_col)
        .agg(F.date_trunc("week", F.min(ts_col)).alias("_cw"))
    )
    active = (
        events.select(user_col, F.date_trunc("week", ts_col).alias("_aw"))
        .join(firsts, user_col)
        .select(
            user_col,
            F.col("_cw"),
            (F.datediff(F.col("_aw"), F.col("_cw")) / 7)
            .cast("int").alias("week_offset"),
        )
        .distinct()
    )
    sizes = firsts.groupBy("_cw").agg(
        F.count("*").alias("n_cohort"))
    return (
        active.groupBy("_cw", "week_offset")
        .agg(F.count("*").alias("n_active"))
        .join(sizes, "_cw")
        .select(
            # ISO string, not DATE: Spark DATE reaches pandas as
            # object(datetime.date) while DuckDB DATE arrives as
            # datetime64 — value-equal but dtype-different under the
            # driver's hash. Strings are dtype-stable on both engines.
            F.date_format("_cw", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
            "n_active",
            "n_cohort",
            F.round(F.col("n_active") / F.col("n_cohort"), 6)
             .alias("retention"),
        )
        .orderBy("cohort_week", "week_offset")
    )


def retention_sql(
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> str:
    """DuckDB mirror of `retention` (same Monday-week truncation)."""
    return f"""
        WITH firsts AS (
            SELECT {user_col}, date_trunc('week', min({ts_col})) AS _cw
            FROM {table} GROUP BY 1
        ),
        active AS (
            SELECT DISTINCT e.{user_col}, f._cw,
                   CAST(date_diff('day', f._cw,
                        date_trunc('week', e.{ts_col})) / 7 AS INT)
                       AS week_offset
            FROM {table} e JOIN firsts f ON e.{user_col} = f.{user_col}
        ),
        sizes AS (
            SELECT _cw, count(*) AS n_cohort FROM firsts GROUP BY 1
        )
        SELECT strftime(a._cw, '%Y-%m-%d') AS cohort_week, a.week_offset,
               count(*) AS n_active, s.n_cohort,
               round(count(*) * 1.0 / s.n_cohort, 6) AS retention
        FROM active a JOIN sizes s ON a._cw = s._cw
        GROUP BY 1, 2, s.n_cohort
        ORDER BY 1, 2
    """


def event_paths(
    events: DataFrame,
    depth: int = 3,
    top: int = 20,
    user_col: str = "user_id",
    ts_col: str = "ts",
    step_col: str = "event_type",
) -> DataFrame:
    """Frequent k-step behavior PATHS — the discovery complement of
    the fixed-chain funnels: instead of asking "how many users did
    A→B→C?", surface WHICH `depth`-step sequences actually happen
    most. Every length-`depth` window of a user's (ts, event_id)-
    ordered event stream is one path occurrence (sliding, overlapping
    — the standard path-mining count). Output: (path, n), n desc then
    path asc, top `top`.

    100 TB: one shuffle on the user key feeding `depth-1` lead()
    columns in a single window pass, then a path-vocabulary-sized
    partial-agg shuffle + TakeOrdered. No joins, no explode."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, "event_id")
    d = events.select(user_col, ts_col, "event_id",
                      F.col(step_col).alias("_s0"))
    for i in range(1, depth):
        d = d.withColumn(f"_s{i}", F.lead("_s0", i).over(w))
    steps = [F.col(f"_s{i}") for i in range(depth)]
    return (
        d.filter(F.col(f"_s{depth - 1}").isNotNull())
        .select(F.concat_ws(">", *steps).alias("path"))
        .groupBy("path")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(top)
    )


def event_paths_sql(
    table: str = "events",
    depth: int = 3,
    top: int = 20,
    user_col: str = "user_id",
    ts_col: str = "ts",
    step_col: str = "event_type",
) -> str:
    """DuckDB mirror of `event_paths`."""
    leads = ", ".join(
        f"lead({step_col}, {i}) OVER (PARTITION BY {user_col}"
        f" ORDER BY {ts_col}, event_id) AS _s{i}"
        for i in range(1, depth))
    parts = " || '>' || ".join(f"_s{i}" if i else step_col
                               for i in range(depth))
    return f"""
        WITH seq AS (
            SELECT {step_col}, {leads} FROM {table}
        )
        SELECT {parts} AS path, count(*) AS n
        FROM seq
        WHERE _s{depth - 1} IS NOT NULL
        GROUP BY 1
        ORDER BY n DESC, path
        LIMIT {top}
    """
