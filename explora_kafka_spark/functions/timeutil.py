"""Time truncation, composite-key formatting, interval mapping.

Semantics pinned to the reference, with one deliberate cleanup (SURVEY.md §1.3):
the reference truncates in the JVM's system timezone and re-parses key strings
with the *current* UTC offset (IngestStream.java:87,310; a DST bug); this engine
does all truncation in UTC (`spark.sql.session.timeZone=UTC`).

- resolutions min/hour/day/month(/year on the query side):
  IngestStream.java:310-362, QueryingController.java:310-332
- composite key format "yyyyMMdd:HHmmss:SSS": IngestStream.java:74
- interval → storage resolution: util/AppConfig.java:16-23
- interval → [from, to] range arithmetic: QueryingController.java:284-308
"""

from __future__ import annotations

import datetime as dt
from typing import Tuple

from pyspark.sql import Column
from pyspark.sql import functions as F

# Reference resolution name → Spark/DuckDB date_trunc unit.
RES_TO_UNIT = {
    "min": "minute",
    "hour": "hour",
    "day": "day",
    "month": "month",
    "year": "year",
}

#: storage grains actually materialized per view (IngestStream.java:304-394)
VIEW_RESOLUTIONS = ("min", "hour", "day", "month")

#: predefined query interval → coarsest adequate storage grain (AppConfig.java:16-23)
INTERVAL_TO_RES = {
    "5min": "min",
    "1hour": "min",
    "1day": "hour",
    "1week": "hour",
    "1month": "day",
    "all": "day",
}

SUPPORTED_INTERVALS = tuple(INTERVAL_TO_RES)
SUPPORTED_AGGREGATES = ("avg", "sum", "count")  # AppConfig.java:10

#: wire format of the composite key's timestamp part (IngestStream.java:74)
KEY_TS_FORMAT_SPARK = "yyyyMMdd:HHmmss:SSS"


def ensure_event_time(df, col: str = "ts"):
    """Coerce an event-time column to TIMESTAMP (with local-tz semantics).

    Parquet written as plain timestamp[us] loads as TIMESTAMP_NTZ, which
    `unix_millis` and `withWatermark` reject. The engine pins the session TZ
    to UTC (session.py), so the cast is value-preserving. No-op when the
    column is already TIMESTAMP or absent.
    """
    if dict(df.dtypes).get(col) == "timestamp_ntz":
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def truncate_ts_col(ts_col: Column | str, res: str) -> Column:
    """date_trunc to a reference resolution (UTC)."""
    col = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    return F.date_trunc(RES_TO_UNIT[res], col)


def ts_ms_col(ts_col: Column | str) -> Column:
    """Timestamp column → epoch milliseconds (the reference's wire type)."""
    col = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    return F.unix_millis(col)


def composite_key_col(cell_col: Column | str, ts_col: Column | str) -> Column:
    """`{cell}#{yyyyMMdd:HHmmss:SSS}` — wire-parity only; the engine keys on
    (cell, ts) columns (IngestStream.java:314-316)."""
    cell = F.col(cell_col) if isinstance(cell_col, str) else cell_col
    ts = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    return F.concat_ws("#", cell, F.date_format(ts, KEY_TS_FORMAT_SPARK))


def format_ts_ms(ts_ms: int) -> str:
    """Epoch ms → `yyyyMMdd:HHmmss:SSS` in UTC (QueryingController.java:334-336)."""
    d = dt.datetime.fromtimestamp(ts_ms / 1000.0, tz=dt.timezone.utc)
    return d.strftime("%Y%m%d:%H%M%S:") + f"{d.microsecond // 1000:03d}"


def parse_key_ts(text: str) -> int:
    """`yyyyMMdd:HHmmss:SSS` (UTC) → epoch ms."""
    d = dt.datetime.strptime(text, "%Y%m%d:%H%M%S:%f").replace(tzinfo=dt.timezone.utc)
    return int(d.timestamp() * 1000)


def _add_months(d: dt.datetime, months: int) -> dt.datetime:
    m = d.month - 1 + months
    year = d.year + m // 12
    month = m % 12 + 1
    # clamp day like java.util.Calendar does
    last = [31, 29 if year % 4 == 0 and (year % 100 != 0 or year % 400 == 0) else 28,
            31, 30, 31, 30, 31, 31, 30, 31, 30, 31][month - 1]
    return d.replace(year=year, month=month, day=min(d.day, last))


def interval_to_range(to_ms: int, interval: str) -> Tuple[int, int]:
    """[from, to] for a predefined interval, calendar arithmetic in UTC —
    QueryingController.java:284-308 (default/unknown interval = 5 minutes,
    'all' = 30 years)."""
    to_dt = dt.datetime.fromtimestamp(to_ms / 1000.0, tz=dt.timezone.utc)
    if interval == "1hour":
        from_dt = to_dt - dt.timedelta(hours=1)
    elif interval == "1day":
        from_dt = to_dt - dt.timedelta(days=1)
    elif interval == "1week":
        from_dt = to_dt - dt.timedelta(days=7)
    elif interval == "1month":
        from_dt = _add_months(to_dt, -1)
    elif interval == "all":
        from_dt = _add_months(to_dt, -360)
    else:  # "5min" and any unrecognized value
        from_dt = to_dt - dt.timedelta(minutes=5)
    return int(from_dt.timestamp() * 1000), to_ms


def truncate_ts_ms(ts_ms: int, res: str) -> int:
    """Driver-side truncation of an epoch-ms instant (UTC) — the scalar twin of
    `truncate_ts_col`, used for snapshot-instant truncation (L4,
    QueryingController.java:310-332)."""
    d = dt.datetime.fromtimestamp(ts_ms / 1000.0, tz=dt.timezone.utc)
    if res == "min":
        d = d.replace(second=0, microsecond=0)
    elif res == "hour":
        d = d.replace(minute=0, second=0, microsecond=0)
    elif res == "day":
        d = d.replace(hour=0, minute=0, second=0, microsecond=0)
    elif res == "month":
        d = d.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
    elif res == "year":
        d = d.replace(month=1, day=1, hour=0, minute=0, second=0, microsecond=0)
    else:
        return ts_ms
    return int(d.timestamp() * 1000)
