"""Grouped-map normalization via `applyInPandas` — the per-group pandas
transform shape (each group materializes as one pandas DataFrame).

Z-score could be done with window functions; implementing it as a
grouped map exercises the API a real feature-engineering pipeline uses
for per-group model transforms (fit-scaler-per-group, per-group
detrending, …). Groups shuffle once on the key; each group must fit in
executor memory — the documented constraint of the grouped-map shape
(use window functions when groups can be huge and the transform is
expressible)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

ZSCORE_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("metric_id", T.StringType()),
    T.StructField("zscore", T.DoubleType()),
])


def zscore_per_metric(events: DataFrame) -> DataFrame:
    """(event_id, metric_id, zscore) — value standardized within its
    metric group (sample std, ddof=1, matching SQL stddev_samp)."""

    def _z(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["value"].mean()
        sd = pdf["value"].std(ddof=1)
        return pd.DataFrame({
            "event_id": pdf["event_id"],
            "metric_id": pdf["event_type"],
            "zscore": ((pdf["value"] - mu) / sd).round(6),
        })

    return (
        events.select("event_id", "event_type", "value")
        .groupBy("event_type")
        .applyInPandas(_z, ZSCORE_SCHEMA)
    )


def zscore_sql(table: str = "events") -> str:
    """Window-function oracle for the grouped-map implementation."""
    return f"""
        SELECT event_id, event_type AS metric_id,
               round((value - avg(value) OVER w) / stddev_samp(value) OVER w,
                     6) AS zscore
        FROM {table}
        WINDOW w AS (PARTITION BY event_type)
    """
