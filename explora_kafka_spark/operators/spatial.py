"""Distributed spatial self-join: pairs of points within a radius.

The grid-bucketed proximity join (the GeoSpark/Sedona distance-join
shape, re-expressed with exact integer geometry): project each point to
planar integer METERS (equirectangular, with the projection constants
computed ONCE in the planner and inlined as literals, so both engines
run identical double math and everything after is exact BIGINT), bucket
into radius-sized grid cells, equi-join each point's cell against the
3×3 neighborhood of the other side, and rerank candidates with the
exact integer circle test (dx² + dy² ≤ r²).

This is the co-location primitive behind contact graphs, POI
clustering, and sensor cross-validation ("which stations observed the
same hour within d meters"). The reference engine answers only
cell-aggregate queries; pairwise proximity is engine-extension surface
per the task brief.

Exactness: coordinates floor to integer meters (the µunit discipline);
dx, dy ≤ ~4e7 m so dx²+dy² ≤ ~3e15 — inside BIGINT. The candidate
equi-join finds every qualifying pair EXACTLY once: the left side
emits one cell per point, the right side the 3×3 neighborhood, and any
pair within r differs by < 1 cell per axis, so the right emission
covers the left cell exactly once — no DISTINCT needed, 100% recall
within the projection's accuracy.

Contract: the equirectangular projection uses one fixed latitude scale
(`lat_center_deg`), so distances are faithful near that band and the
operator is for radii ≪ earth scale; the grid does not wrap the
antimeridian (split the query at ±180 if the region crosses it — the
circle-cover precedent in functions/geo.py).

100 TB design: ONE shuffle per side on (group, cell); the 3×3
replication is ×9 on one side only (vs an all-pairs cross join);
candidate volume is O(Σ per-cell n_left·n_right) — density-bounded,
never corpus²; a pathologically hot cell is the LSH hot-bucket AQE
skew case (plain equi-join, so AQE CAN split it).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: meters per degree of latitude (spherical earth, R = 6371.0088 km —
#: the mean-radius convention; matches functions/geo.py's distance math)
M_PER_DEG = 111194.92664455873

#: grid shift making projected coordinates non-negative (|lat| ≤ 90,
#: |lon| ≤ 180 → |x|,|y| ≤ 180·111195 ≈ 2.1e7), so integer DIV is floor
#: division in BOTH engines (Spark DIV truncates toward zero, DuckDB //
#: floors — they agree only for non-negative operands)
_SHIFT_M = 25_000_000


def _xy_exprs(lat_center_deg: float) -> tuple[str, str, float, float]:
    k_lat = M_PER_DEG
    k_lon = M_PER_DEG * math.cos(math.radians(lat_center_deg))
    x = f"CAST(floor(lat * {k_lat!r} + 0.5) AS BIGINT)"
    y = f"CAST(floor(lon * {k_lon!r} + 0.5) AS BIGINT)"
    return x, y, k_lat, k_lon


def proximity_pairs(
    points: DataFrame,
    radius_m: int,
    lat_center_deg: float = 0.0,
    key: str = "user_id",
    group_cols: tuple[str, ...] = ("hour_ms",),
) -> DataFrame:
    """All pairs (key_a < key_b) of `points` rows sharing `group_cols`
    whose planar distance is ≤ `radius_m` meters. `points` columns:
    (*group_cols, key, lat, lon) — one row per (group, key) (pre-dedup
    upstream if the source has several fixes per entity per group).

    Output: (*group_cols, <key>_a, <key>_b, d2_m2), ordered — d2_m2 is
    the exact integer squared distance in m² (no sqrt: consumers
    compare against thresholds, and sqrt would be the only float)."""
    x, y, _, _ = _xy_exprs(lat_center_deg)
    cell = int(radius_m)
    g = list(group_cols)
    px = points.select(
        *g, F.col(key), F.expr(x).alias("x"), F.expr(y).alias("y"),
    ).select(
        *g, key, "x", "y",
        F.expr(f"(x + {_SHIFT_M}) DIV {cell}").alias("cx"),
        F.expr(f"(y + {_SHIFT_M}) DIV {cell}").alias("cy"),
    )
    a = px.select(
        *g, "cx", "cy",
        F.col(key).alias("_ka"), F.col("x").alias("xa"),
        F.col("y").alias("ya"),
    )
    nbr = F.explode(F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
    ]))
    b = (
        px.select(*g, "cx", "cy", F.col(key).alias("_kb"),
                  F.col("x").alias("xb"), F.col("y").alias("yb"),
                  nbr.alias("_n"))
        .select(*g,
                (F.col("cx") + F.col("_n.dx")).alias("cx"),
                (F.col("cy") + F.col("_n.dy")).alias("cy"),
                "_kb", "xb", "yb")
    )
    r2 = int(radius_m) * int(radius_m)
    return (
        a.join(b, g + ["cx", "cy"])
        .filter(F.col("_ka") < F.col("_kb"))
        .withColumn("d2_m2", F.expr(
            "(xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)"))
        .filter(F.col("d2_m2") <= r2)
        .select(*g, F.col("_ka").alias(f"{key}_a"),
                F.col("_kb").alias(f"{key}_b"), "d2_m2")
        .orderBy(*g, f"{key}_a", f"{key}_b")
    )


def proximity_pairs_sql(
    points_sql: str,
    radius_m: int,
    lat_center_deg: float = 0.0,
    key: str = "user_id",
    group_cols: tuple[str, ...] = ("hour_ms",),
) -> str:
    """DuckDB mirror of :func:`proximity_pairs`. `points_sql` is a
    query producing (*group_cols, key, lat, lon)."""
    x, y, _, _ = _xy_exprs(lat_center_deg)
    cell = int(radius_m)
    r2 = int(radius_m) * int(radius_m)
    g = list(group_cols)
    gsel = ", ".join(g)
    on_g = " AND ".join(f"a.{c} = n.{c}" for c in g)
    return f"""
        WITH pts AS ({points_sql}),
        px AS (
            SELECT {gsel}, {key}, x, y,
                   (x + {_SHIFT_M}) // {cell} AS cx,
                   (y + {_SHIFT_M}) // {cell} AS cy
            FROM (SELECT {gsel}, {key}, {x} AS x, {y} AS y FROM pts)
        ),
        nbr AS (
            SELECT px.*, px.cx + d.dx AS ncx, px.cy + d.dy AS ncy
            FROM px, (SELECT u1.x AS dx, u2.x AS dy
                      FROM unnest([-1, 0, 1]) u1(x),
                           unnest([-1, 0, 1]) u2(x)) d
        )
        SELECT {", ".join(f"a.{c} AS {c}" for c in g)},
               a.{key} AS {key}_a, n.{key} AS {key}_b,
               (a.x - n.x) * (a.x - n.x)
               + (a.y - n.y) * (a.y - n.y) AS d2_m2
        FROM px a JOIN nbr n
          ON {on_g} AND a.cx = n.ncx AND a.cy = n.ncy
         AND a.{key} < n.{key}
        WHERE (a.x - n.x) * (a.x - n.x)
              + (a.y - n.y) * (a.y - n.y) <= {r2}
        ORDER BY {gsel}, {key}_a, {key}_b
    """


def nearest_poi(
    points: DataFrame,
    pois: list[tuple[int, float, float]],
    lat_center_deg: float = 0.0,
    key: str = "event_id",
) -> DataFrame:
    """Geo-enrichment join: tag every point with its nearest POI
    (point of interest) and the exact integer squared distance — the
    store-attribution / catchment-area primitive. `pois` is the small
    dimension side (id, lat, lon), inlined as literals so BOTH the
    Spark plan and the oracle see identical constants (the cover-
    literal convention).

    Exactness: the spatial.py projection (planner-inlined constants →
    integer meters), argmin as min(struct(d2, poi_id)) — lexicographic,
    so ties break to the smaller POI id, partitioning-independent.

    Output: (key, poi_id, d2_m2), key-ascending.

    100 TB: POIs broadcast (K rows); the join explodes each point to K
    candidates but the min(struct) aggregate combines MAP-SIDE back to
    one row per point before any shuffle — one corpus pass, shuffle
    volume = |points| single rows. For K beyond broadcast size, grid-
    bucket the POIs (proximity_pairs) instead."""
    x, y, k_lat, k_lon = _xy_exprs(lat_center_deg)
    rows = [(int(pid),
             int(math.floor(plat * k_lat + 0.5)),
             int(math.floor(plon * k_lon + 0.5)))
            for pid, plat, plon in pois]
    spark = points.sparkSession
    poi_df = spark.createDataFrame(
        rows, "poi_id bigint, px bigint, py bigint")
    pt = points.select(F.col(key), F.expr(x).alias("x"),
                       F.expr(y).alias("y"))
    return (
        pt.join(F.broadcast(poi_df))
        .select(key, F.struct(
            F.expr("(x - px) * (x - px) + (y - py) * (y - py)")
            .alias("d2_m2"),
            F.col("poi_id"),
        ).alias("c"))
        .groupBy(key)
        .agg(F.min("c").alias("c"))
        .select(key, F.col("c.poi_id").alias("poi_id"),
                F.col("c.d2_m2").alias("d2_m2"))
        .orderBy(key)
    )


def nearest_poi_sql(
    points_sql: str,
    pois: list[tuple[int, float, float]],
    lat_center_deg: float = 0.0,
    key: str = "event_id",
) -> str:
    """DuckDB mirror of :func:`nearest_poi`. `points_sql` produces
    (key, lat, lon)."""
    x, y, k_lat, k_lon = _xy_exprs(lat_center_deg)
    vals = ", ".join(
        f"({int(pid)}, {int(math.floor(plat * k_lat + 0.5))},"
        f" {int(math.floor(plon * k_lon + 0.5))})"
        for pid, plat, plon in pois)
    return f"""
        WITH pts AS ({points_sql}),
        px AS (SELECT {key}, {x} AS x, {y} AS y FROM pts),
        poi(poi_id, px_, py_) AS (VALUES {vals}),
        scored AS (
            SELECT p.{key}, poi.poi_id,
                   (p.x - poi.px_) * (p.x - poi.px_)
                   + (p.y - poi.py_) * (p.y - poi.py_) AS d2_m2,
                   row_number() OVER (
                       PARTITION BY p.{key}
                       ORDER BY (p.x - poi.px_) * (p.x - poi.px_)
                                + (p.y - poi.py_) * (p.y - poi.py_) ASC,
                                poi.poi_id ASC) AS rk
            FROM px p CROSS JOIN poi
        )
        SELECT {key}, poi_id, d2_m2 FROM scored WHERE rk = 1
        ORDER BY {key}
    """
