"""Market-basket co-occurrence with exact-integer lift.

The association-mining primitive (Agrawal & Srikant 1994's support /
lift statistics, minus the rule recursion): which item pairs appear in
the same basket far more often than independence predicts? Feeds
recommendations, "related items", and co-occurrence-based embedding
pretraining data. The reference engine has no behavioral-join
operators — engine-extension surface, like the funnel family it sits
next to (`operators/funnel.py`).

Basket = (user_id, day); item = the event's ``props.k`` id. Lift is
reported as an EXACT integer ratio in ppm —
``lift_ppm = (1e6 · n_ab · N) div (n_a · n_b)`` — the monotone
transform of PMI (log of the same ratio), so ranking and thresholds
are bit-exact across engines with no float op anywhere (the
`unigram_bits` discipline without even its one log).

100 TB design: the basket build is one distinct-style partial-agg
shuffle; the pair stage is a self-join ON THE BASKET KEY — output
bounded by Σ items_per_basket², the LSH-bucket argument (a
pathologically fat basket is an AQE skew-split case); per-item totals
are an items-sized table broadcast onto the pair counts. Never a
corpus-level cartesian. BIGINT bound: ``1e6 · n_ab · N`` holds to
~1e18 — beyond ~1e6-basket corpora swap the lift numerator to
DECIMAL(38,0) (the metric_trend precedent), same plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def item_lift(events: DataFrame, top: int = 50) -> DataFrame:
    """Top-`top` item pairs by exact-integer lift.

    Output: item_a, item_b (a < b), n_ab (baskets with both), n_a, n_b
    (baskets with each), lift_ppm — ordered lift desc, then the pair
    asc (deterministic ties), limited to `top`."""
    baskets = (
        events.select(
            "user_id",
            F.date_trunc("day", "ts").alias("d"),
            F.get_json_object("props", "$.k").cast("int").alias("item"),
        )
        .filter(F.col("item").isNotNull())
        .distinct()
        # materialize ONCE (round 14, guide §2.4): four consumers
        # (basket total, item counts, both self-join sides) would each
        # re-run the scan + per-row JSON extraction + distinct shuffle
        # — 10 parquet scans in the before-plan for a 3-int-column
        # table
        .localCheckpoint(eager=True)
    )
    n_baskets = (
        baskets.select("user_id", "d").distinct()
        .agg(F.count("*").alias("n_total"))
    )
    item_counts = baskets.groupBy("item").agg(F.count("*").alias("n_item"))
    a = baskets.select("user_id", "d", F.col("item").alias("item_a"))
    b = baskets.select("user_id", "d", F.col("item").alias("item_b"))
    pair_counts = (
        a.join(b, ["user_id", "d"])
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").alias("n_ab"))
    )
    enriched = (
        pair_counts
        .join(F.broadcast(item_counts.withColumnRenamed("item", "item_a")
                          .withColumnRenamed("n_item", "n_a")), "item_a")
        .join(F.broadcast(item_counts.withColumnRenamed("item", "item_b")
                          .withColumnRenamed("n_item", "n_b")), "item_b")
        .join(F.broadcast(n_baskets))
        .withColumn("lift_ppm", F.expr(
            "(1000000 * n_ab * n_total) div (n_a * n_b)"))
    )
    return (
        enriched.select("item_a", "item_b", "n_ab", "n_a", "n_b",
                        "lift_ppm")
        .orderBy(F.col("lift_ppm").desc(), "item_a", "item_b")
        .limit(top)
    )


def item_lift_sql(table: str = "events", top: int = 50) -> str:
    """DuckDB mirror of `item_lift` (json_extract ≙ get_json_object;
    `//` ≙ `div`)."""
    return f"""
        WITH baskets AS (
            SELECT DISTINCT user_id, date_trunc('day', ts) AS d,
                   CAST(json_extract_string(props, '$.k') AS INTEGER)
                       AS item
            FROM {table}
            WHERE json_extract_string(props, '$.k') IS NOT NULL
        ),
        nb AS (
            SELECT count(*) AS n_total
            FROM (SELECT DISTINCT user_id, d FROM baskets)
        ),
        ic AS (SELECT item, count(*) AS n_item FROM baskets GROUP BY 1),
        pc AS (
            SELECT a.item AS item_a, b.item AS item_b, count(*) AS n_ab
            FROM baskets a
            JOIN baskets b ON a.user_id = b.user_id AND a.d = b.d
                          AND a.item < b.item
            GROUP BY 1, 2
        )
        SELECT item_a, item_b, n_ab, ia.n_item AS n_a, ib.n_item AS n_b,
               (1000000 * n_ab * n_total) // (ia.n_item * ib.n_item)
                   AS lift_ppm
        FROM pc
        JOIN ic ia ON ia.item = item_a
        JOIN ic ib ON ib.item = item_b
        CROSS JOIN nb
        ORDER BY lift_ppm DESC, item_a, item_b
        LIMIT {top}
    """
