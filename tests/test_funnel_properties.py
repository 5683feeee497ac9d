"""Property-based check of the funnel SQL mirror (hypothesis + DuckDB)
against an independent Python simulation — the same triangle as
test_packing_properties.py / test_segments_properties.py: the driver
gate pins Spark ≡ DuckDB on the fixture events; this pins DuckDB ≡
reference-model on ARBITRARY event streams (repeat events, equal
timestamps, out-of-order steps, users missing steps, horizon cutoffs).
DuckDB-only so each example costs milliseconds."""

from __future__ import annotations

from datetime import datetime, timedelta

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from explora_kafka_spark.operators.funnel import funnel_sql

STEPS = ("view", "click", "purchase")
BASE = datetime(2024, 1, 1)


def _simulate(rows, within_hours=None):
    """Reference model: earliest-chain with optional step-1 deadline."""
    per_user = {}
    for uid, ts, typ in rows:
        per_user.setdefault(uid, []).append((ts, typ))
    counts = []
    frontier = {}
    for uid, evs in per_user.items():
        firsts = [ts for ts, typ in evs if typ == STEPS[0]]
        if firsts:
            t1 = min(firsts)
            frontier[uid] = (t1, t1 + timedelta(hours=within_hours)
                             if within_hours else None)
    counts.append(len(frontier))
    for step in STEPS[1:]:
        nxt = {}
        for uid, (t, deadline) in frontier.items():
            cand = [ts for ts, typ in per_user[uid]
                    if typ == step and ts > t
                    and (deadline is None or ts <= deadline)]
            if cand:
                nxt[uid] = (min(cand), deadline)
        frontier = nxt
        counts.append(len(frontier))
    base = max(counts[0], 1)
    return [(i + 1, STEPS[i], counts[i], round(counts[i] / base, 6))
            for i in range(len(STEPS))]


_event = st.tuples(
    st.integers(min_value=0, max_value=4),            # user
    st.integers(min_value=0, max_value=30),           # hour offset
    st.sampled_from(STEPS),
)
_stream = st.lists(_event, min_size=0, max_size=25)


@given(_stream, st.sampled_from([None, 2, 6]))
@settings(max_examples=60, deadline=None)
def test_sql_mirror_matches_simulation(events, within_hours):
    rows = [(uid, BASE + timedelta(hours=h), typ) for uid, h, typ in events]
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    # pandas datetime64[ns] registers as TIMESTAMP_NS, which lacks the
    # +INTERVAL overload; the real tables are microsecond TIMESTAMPs
    con.register("events_raw", pd.DataFrame(
        rows, columns=["user_id", "ts", "event_type"]))
    con.execute("CREATE VIEW events AS SELECT user_id,"
                " CAST(ts AS TIMESTAMP) AS ts, event_type FROM events_raw")
    within = f"{within_hours} hours" if within_hours else None
    got = [tuple(r) for r in con.execute(funnel_sql(within=within)).fetchall()]
    assert got == _simulate(rows, within_hours)
