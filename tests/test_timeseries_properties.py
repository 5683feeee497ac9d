"""Property-based check of the gap-interpolation SQL mirror
(hypothesis + DuckDB) against an independent Python simulation — the
funnel/BPE-properties triangle: the driver gate pins Spark ≡ DuckDB on
the fixture readings; this pins DuckDB ≡ reference-model on ARBITRARY
series (random gaps, duplicate in-hour readings, multiple metrics,
single-bucket series, and µunit interpolation ties from the integer
ratio). Values are integers so the 6-dp hourly mean never lands on a
decimal rounding tie (engine round() tie-break is out of scope here —
the HALF_UP that matters, floor(x+0.5) on the interpolated µunits, IS
exercised: gap ratios like 1/3 hit .5 µunits regularly)."""

from __future__ import annotations

import math
from datetime import datetime, timedelta

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from explora_kafka_spark.operators.timeseries import (
    HOUR_MS,
    interpolate_hourly_sql,
)

BASE = datetime(2024, 1, 1)
EPOCH0_MS = 1_704_067_200_000  # 2024-01-01T00:00:00Z


def _simulate(rows):
    """Reference model: 6-dp hourly means -> µunits -> linear fill with
    floor(x+0.5) HALF_UP, one series per metric."""
    per: dict = {}
    for m, hour, value in rows:
        per.setdefault(m, {}).setdefault(hour, []).append(value)
    out = []
    for m in sorted(per):
        means = {h: round(sum(vs) / len(vs), 6)
                 for h, vs in per[m].items()}
        mus = {h: int(math.floor(v * 1e6 + 0.5))
               for h, v in means.items()}
        obs = sorted(means)
        for h in range(obs[0], obs[-1] + 1):
            if h in mus:
                out.append((m, h, means[h], False))
                continue
            p = max(o for o in obs if o < h)
            n = min(o for o in obs if o > h)
            mu = mus[p] + math.floor(
                (mus[n] - mus[p]) * (h - p) / (n - p) + 0.5)
            out.append((m, h, mu / 1e6, True))
    return out


metric_s = st.sampled_from(["a", "b"])
hour_s = st.integers(min_value=0, max_value=30)
value_s = st.integers(min_value=-40, max_value=40).map(float)
row_s = st.tuples(metric_s, hour_s, value_s)
rows_s = st.lists(row_s, min_size=1, max_size=25)


@settings(max_examples=60, deadline=None)
@given(rows=rows_s)
def test_interpolation_sql_matches_reference(rows):
    want = [
        (m, "*", EPOCH0_MS + h * HOUR_MS, v, flag)
        for m, h, v, flag in _simulate(rows)
    ]
    vals = ", ".join(
        "('{m}', 'g', TIMESTAMP '{ts}', {v!r})".format(
            m=m, ts=(BASE + timedelta(hours=h)).isoformat(sep=" "), v=v)
        for m, h, v in rows
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW r AS SELECT * FROM (VALUES " + vals +
        ") AS t(metric_id, geohash, ts, value)")
    got = con.execute(interpolate_hourly_sql("r")).fetchall()
    assert [tuple(x) for x in got] == want
