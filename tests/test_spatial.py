"""proximity_pairs: grid-bucketed spatial self-join."""

import pytest

from explora_kafka_spark.operators import spatial as SP
from pyspark.sql import functions as F

from conftest import SF_DIR  # noqa: F401


def _pts(spark, rows):
    return spark.createDataFrame(
        rows, "hour_ms bigint, user_id bigint, lat double, lon double")


def test_pairs_within_radius_exact_d2(spark):
    # ~1112 m apart on the equator (0.01 deg of latitude)
    pts = _pts(spark, [(0, 1, 0.00, 10.0), (0, 2, 0.01, 10.0),
                       (0, 3, 5.00, 10.0)])
    out = SP.proximity_pairs(pts, radius_m=2000).collect()
    assert [(r.user_id_a, r.user_id_b) for r in out] == [(1, 2)]
    dy = round(0.01 * SP.M_PER_DEG + 0.5) - round(0.0 * SP.M_PER_DEG + 0.5)
    assert out[0].d2_m2 == dy * dy


def test_neighbor_cells_are_joined(spark):
    # two points straddling a grid boundary: x = 1999 m and 2001 m with
    # cell size 2000 land in different cells but must still pair
    lat_a = 1999 / SP.M_PER_DEG
    lat_b = 2001 / SP.M_PER_DEG
    pts = _pts(spark, [(0, 1, lat_a, 0.0), (0, 2, lat_b, 0.0)])
    out = SP.proximity_pairs(pts, radius_m=2000).collect()
    assert [(r.user_id_a, r.user_id_b) for r in out] == [(1, 2)]


def test_groups_isolate_pairs(spark):
    pts = _pts(spark, [(0, 1, 0.0, 0.0), (3600000, 2, 0.0, 0.0)])
    assert SP.proximity_pairs(pts, radius_m=2000).count() == 0


def test_matches_bruteforce_and_repartition_stable(spark):
    rows = [
        (h, u, ((u * 7 + h // 3600000) % 20) / 1000.0,
         ((u * 13) % 30) / 1000.0)
        for h in (0, 3600000) for u in range(1, 40)
    ]
    pts = _pts(spark, rows)
    r = 1600
    fast = SP.proximity_pairs(pts, radius_m=r)
    x, y, _, _ = SP._xy_exprs(0.0)
    p2 = pts.select("hour_ms", "user_id",
                    F.expr(x).alias("x"), F.expr(y).alias("y"))
    a = p2.select("hour_ms", F.col("user_id").alias("ua"),
                  F.col("x").alias("xa"), F.col("y").alias("ya"))
    b = p2.select("hour_ms", F.col("user_id").alias("ub"),
                  F.col("x").alias("xb"), F.col("y").alias("yb"))
    brute = (
        a.join(b, "hour_ms").filter(F.col("ua") < F.col("ub"))
        .withColumn("d2", F.expr(
            "(xa-xb)*(xa-xb) + (ya-yb)*(ya-yb)"))
        .filter(F.col("d2") <= r * r)
    )
    got = sorted((r_.hour_ms, r_.user_id_a, r_.user_id_b, r_.d2_m2)
                 for r_ in fast.collect())
    want = sorted((r_.hour_ms, r_.ua, r_.ub, r_.d2)
                  for r_ in brute.collect())
    assert got == want and len(got) > 0
    again = sorted(
        (r_.hour_ms, r_.user_id_a, r_.user_id_b, r_.d2_m2)
        for r_ in SP.proximity_pairs(pts.repartition(7),
                                     radius_m=r).collect())
    assert again == got


def test_nearest_poi_argmin_and_ties(spark):
    pois = [(1, 0.0, 0.0), (2, 0.0, 1.0)]
    pts = spark.createDataFrame(
        [(10, 0.0, 0.1),   # nearest POI 1
         (11, 0.0, 0.9),   # nearest POI 2
         (12, 0.0, 0.5)],  # equidistant -> tie to smaller id
        "event_id bigint, lat double, lon double")
    out = {r.event_id: (r.poi_id, r.d2_m2)
           for r in SP.nearest_poi(pts, pois).collect()}
    assert out[10][0] == 1 and out[11][0] == 2
    assert out[12][0] == 1
    import math
    assert out[10][1] == (math.floor(0.1 * SP.M_PER_DEG + 0.5)
                          - math.floor(0.0 * SP.M_PER_DEG + 0.5)) ** 2
