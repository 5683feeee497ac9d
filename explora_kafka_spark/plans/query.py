"""History / snapshot query builders over the view lattice.

These are the engine's two query shapes (QueryingService.java:38-143):

- **history**: time series of one aggregate over a set of cells and a time
  range — replaces per-cell RocksDB range scans + scatter-gather merge
  (QueryingController.java:49-98, 123-230) with a single declarative filter +
  re-aggregation; Catalyst pushes the (metric, precision, res) filters to
  partition pruning and (gh, ts) to parquet row-group skipping.

- **snapshot**: one aggregate per cell over a bbox at one instant — replaces
  tile-cover point lookups / geohash children enumeration
  (QueryingController.java:100-121, 232-282). Covers are computed driver-side
  (pure functions, functions/geo.py) and pushed down as `isin`; a geohash
  prefix becomes a `startswith` predicate (strictly dominates the reference's
  32^k enumeration — SURVEY.md §4).

All avg values are derived sum/count AFTER the merge (util/Aggregator.java:19-32).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import geo
from ..functions.timeutil import (
    INTERVAL_TO_RES,
    interval_to_range,
    truncate_ts_ms,
    ts_ms_col,
)

def _merge_cols():
    return [F.sum("count").alias("count"), F.sum("sum").alias("sum")]


def _select_view(lattice: DataFrame, metric: str, precision: int, res: str) -> DataFrame:
    """View selection (L1, QueryingController.java:51-52): pick one lattice
    slice by its partition columns."""
    return lattice.filter(
        (F.col("metric_id") == metric)
        & (F.col("precision") == precision)
        & (F.col("res") == res)
    )


def _agg_projection(df: DataFrame, aggregate: str, key_col: str) -> DataFrame:
    """Project only the requested aggregate (L6, QueryingService.java:131-134,
    232-254 — reflection on the field name ≙ column selection)."""
    value = {
        "count": F.col("count").cast("long"),
        "sum": F.col("sum"),
        "avg": F.col("sum") / F.col("count"),
    }[aggregate]
    return df.select(F.col(key_col), value.alias(aggregate))


def history(
    lattice: DataFrame,
    metric: str,
    aggregate: str,
    precision: int,
    res: str,
    cells: Sequence[str] | None = None,
    cell_prefix: str | None = None,
    from_ms: int | None = None,
    to_ms: int | None = None,
) -> DataFrame:
    """Time series [timestamp(ms), {aggregate}] over a cell set, ts-ascending.

    Q1 (range scan) + Q6 (multi-cell union) + A3 (rollup across cells) + Q7
    (sorted). `cells=None, cell_prefix=None` scans all cells. Open-ended ranges
    mirror the reference (from=None → epoch, to=None → unbounded/now —
    QueryingController.java:213-218).
    """
    view = _select_view(lattice, metric, precision, res)
    if cells is not None:
        view = view.filter(F.col("gh").isin(list(cells)))
    elif cell_prefix is not None:
        view = view.filter(F.col("gh").startswith(cell_prefix))
    if from_ms is not None:
        view = view.filter(ts_ms_col("ts") >= from_ms)
    if to_ms is not None:
        view = view.filter(ts_ms_col("ts") <= to_ms)
    merged = view.groupBy(ts_ms_col("ts").alias("timestamp")).agg(*_merge_cols())
    return _agg_projection(merged, aggregate, "timestamp").orderBy("timestamp")


def history_interval(
    lattice: DataFrame,
    metric: str,
    aggregate: str,
    precision: int,
    interval: str,
    now_ms: int,
    cells: Sequence[str] | None = None,
    cell_prefix: str | None = None,
) -> DataFrame:
    """History over a predefined interval (L2+L3): interval picks the storage
    grain (AppConfig.java:16-23) and the [to-interval, to] range
    (QueryingController.java:79-80, 284-308) with to = injected `now_ms`."""
    res = INTERVAL_TO_RES.get(interval, "min")
    from_ms, to_ms = interval_to_range(now_ms, interval)
    return history(
        lattice, metric, aggregate, precision, res,
        cells=cells, cell_prefix=cell_prefix, from_ms=from_ms, to_ms=to_ms,
    )


def snapshot(
    lattice: DataFrame,
    metric: str,
    aggregate: str,
    precision: int,
    res: str,
    ts_ms: int,
    cells: Sequence[str] | None = None,
    cell_prefix: str | None = None,
) -> DataFrame:
    """Choropleth [gh, {aggregate}] at one instant, cell-ascending (A4 + Q2 +
    Q7). `ts_ms` is truncated to the view grain first (L4 — the engine always
    truncates; distributed-path semantics, QueryingController.java:102)."""
    t = truncate_ts_ms(ts_ms, res)
    view = _select_view(lattice, metric, precision, res).filter(ts_ms_col("ts") == t)
    if cells is not None:
        view = view.filter(F.col("gh").isin(list(cells)))
    elif cell_prefix is not None:
        view = view.filter(F.col("gh").startswith(cell_prefix))
    merged = view.groupBy("gh").agg(*_merge_cols())
    return _agg_projection(merged, aggregate, "gh").orderBy("gh")


def snapshot_bbox_quadtiling(
    lattice: DataFrame,
    metric: str,
    aggregate: str,
    zoom: int,
    res: str,
    ts_ms: int,
    north: float,
    west: float,
    south: float,
    east: float,
) -> DataFrame:
    """Snapshot over a bbox in quad-tiling mode: driver-side tile cover (Q4,
    util/QuadHash.java:32-50) → isin pushdown (replaces per-quadkey point gets,
    QueryingController.java:248-262)."""
    cover = geo.quadkey_cover_bbox(north, west, south, east, zoom)
    return snapshot(lattice, metric, aggregate, zoom, res, ts_ms, cells=cover)


def snapshot_bbox_geohashing(
    lattice: DataFrame,
    metric: str,
    aggregate: str,
    precision: int,
    res: str,
    ts_ms: int,
    north: float,
    west: float,
    south: float,
    east: float,
) -> DataFrame:
    """Snapshot over a bbox in geohashing mode: geohash cover (Q5) → isin
    (replaces cover + base-32 children enumeration,
    QueryingController.java:240-282)."""
    cover = geo.geohash_cover_bbox(north, west, south, east, precision)
    return snapshot(lattice, metric, aggregate, precision, res, ts_ms, cells=cover)
