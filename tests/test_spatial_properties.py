"""Property-based check of the proximity-join SQL mirror (hypothesis +
DuckDB) against a Python brute-force model — grid bucketing plus the
3×3 neighbor replication must find EXACTLY the pairs the O(n²) planar
check finds, for arbitrary point sets straddling cell boundaries."""

from __future__ import annotations

import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from explora_kafka_spark.operators.spatial import (
    M_PER_DEG, proximity_pairs_sql)

RADIUS = 1500


def _xy(lat, lon):
    return (math.floor(lat * M_PER_DEG + 0.5),
            math.floor(lon * M_PER_DEG + 0.5))


def _simulate(rows):
    pts = [(g, u, *_xy(la, lo)) for g, u, la, lo in rows]
    out = []
    for i, (g1, u1, x1, y1) in enumerate(pts):
        for g2, u2, x2, y2 in pts[i + 1:]:
            if g1 != g2:
                continue
            a, b = sorted((u1, u2))
            if a == b:
                continue
            d2 = (x1 - x2) ** 2 + (y1 - y2) ** 2
            if d2 <= RADIUS * RADIUS:
                out.append((g1, a, b, d2))
    return sorted(set(out))


# coords within a few cell widths of the origin so pairs straddle
# cell boundaries in every alignment; two groups
_pt = st.tuples(
    st.sampled_from([0, 3600000]),
    st.integers(min_value=1, max_value=12),
    st.floats(min_value=-0.05, max_value=0.05,
              allow_nan=False, allow_infinity=False),
    st.floats(min_value=-0.05, max_value=0.05,
              allow_nan=False, allow_infinity=False),
)
_pts = st.lists(_pt, min_size=1, max_size=14,
                unique_by=lambda t: (t[0], t[1]))


@settings(max_examples=120, deadline=None)
@given(_pts)
def test_proximity_sql_matches_bruteforce(rows):
    con = duckdb.connect()
    con.register("pts_pd", pd.DataFrame(
        rows, columns=["hour_ms", "user_id", "lat", "lon"]))
    got = [tuple(r) for r in con.execute(proximity_pairs_sql(
        "SELECT hour_ms, user_id, lat, lon FROM pts_pd",
        radius_m=RADIUS)).fetchall()]
    assert sorted(got) == _simulate(rows)
