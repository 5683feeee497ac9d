"""Origin–destination (OD) flow analytics over event trajectories.

The classic mobility-OLAP readout on top of the engine's cell grid
(the reference serves per-cell aggregates — `QueryingController.java`
snapshot/history; OD flows are the *pairwise* spatio-temporal summary
a mobility deployment asks next: "how many trips went from cell A to
cell B?"). Feeds flow maps, commute matrices, and demand forecasting.

Semantics: per user, events ordered by (ts, event_id); each
consecutive pair of DIFFERENT cells is one flow edge. Output: the top
flows by count with deterministic ties.

100 TB design: one shuffle on user_id feeding the per-user lag window
(trajectories are naturally user-bounded; a hot user is an AQE-skew
window case), then one (from, to) partial-agg shuffle whose output is
flow-matrix-sized, and a TakeOrdered for the top slice. No joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def od_flows(
    events: DataFrame,
    cell: Column,
    top: int = 50,
) -> DataFrame:
    """Top-`top` (from_cell, to_cell) flows. `cell` is the per-event
    cell id expression (quadkey/geohash at the caller's precision).
    Self-loops (consecutive events in the same cell) are not flows."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    hops = (
        events.select("user_id", "ts", "event_id", cell.alias("cell"))
        .withColumn("from_cell", F.lag("cell").over(w))
        .filter(F.col("from_cell").isNotNull()
                & (F.col("from_cell") != F.col("cell")))
    )
    return (
        hops.groupBy("from_cell", F.col("cell").alias("to_cell"))
        .agg(F.count("*").alias("n_trips"))
        .orderBy(F.col("n_trips").desc(), "from_cell", "to_cell")
        .limit(top)
    )


def od_flows_sql(cell_sql: str, table: str = "events",
                 top: int = 50) -> str:
    """DuckDB mirror of `od_flows` (same (ts, event_id) trajectory
    order and self-loop rule)."""
    return f"""
        WITH hops AS (
            SELECT user_id,
                   lag({cell_sql}) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS from_cell,
                   {cell_sql} AS to_cell
            FROM {table}
        )
        SELECT from_cell, to_cell, count(*) AS n_trips
        FROM hops
        WHERE from_cell IS NOT NULL AND from_cell <> to_cell
        GROUP BY 1, 2
        ORDER BY n_trips DESC, from_cell, to_cell
        LIMIT {top}
    """


def cell_dwell(
    events: DataFrame,
    cell: Column,
    top: int = 50,
) -> DataFrame:
    """Per-cell DWELL aggregate — the other half of the OD readout:
    how long do users stay in a cell before hopping? Each consecutive
    event pair in a user's (ts, event_id)-ordered trajectory
    attributes its time delta to the FROM cell (self-loops included —
    staying put is dwell). Output: top `top` cells by total dwell:
    (cell, n_stays, total_dwell_s, avg_dwell_s 6dp), deterministic
    ties. Same plan family as od_flows: one user-shuffle lag window +
    one cell-sized agg + TakeOrdered; no joins."""
    # ms is monotone in ts, so (ms, event_id) is the same trajectory
    # order as od_flows' (ts, event_id)
    w = Window.partitionBy("user_id").orderBy("ms", "event_id")
    stays = (
        events.select(
            "user_id", "event_id", cell.alias("cell"),
            F.unix_millis(F.col("ts").cast("timestamp")).alias("ms"))
        .withColumn("next_ms", F.lead("ms").over(w))
        .filter(F.col("next_ms").isNotNull())
        .withColumn("dwell_s", (F.col("next_ms") - F.col("ms")) / 1000.0)
    )
    return (
        stays.groupBy("cell")
        .agg(F.count("*").alias("n_stays"),
             F.round(F.sum("dwell_s"), 6).alias("total_dwell_s"),
             F.round(F.sum("dwell_s") / F.count("*"), 6)
             .alias("avg_dwell_s"))
        .orderBy(F.col("total_dwell_s").desc(), "cell")
        .limit(top)
    )


def cell_dwell_sql(cell_sql: str, table: str = "events",
                   top: int = 50) -> str:
    """DuckDB mirror of `cell_dwell`."""
    return f"""
        WITH stays AS (
            SELECT {cell_sql} AS cell,
                   (lead(epoch_ms(ts)) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id
                    ) - epoch_ms(ts)) / 1000.0 AS dwell_s
            FROM {table}
        )
        SELECT cell, count(*) AS n_stays,
               round(sum(dwell_s), 6) AS total_dwell_s,
               round(sum(dwell_s) / count(*), 6) AS avg_dwell_s
        FROM stays
        WHERE dwell_s IS NOT NULL
        GROUP BY 1
        ORDER BY total_dwell_s DESC, cell
        LIMIT {top}
    """
