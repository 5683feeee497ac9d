"""Property-based check of the count-min-sketch SQL mirror (hypothesis
+ DuckDB) against a Python CMS with the identical md5-affine hash
family — the property-suite triangle: the driver gate pins Spark ≡
DuckDB on the fixture; this pins DuckDB ≡ reference-model on arbitrary
item streams (heavy skew, singletons, collision-rich narrow widths)."""

from __future__ import annotations

import hashlib
from collections import Counter

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from explora_kafka_spark.operators.skew import (
    _CMS_P, _cms_params, cms_heavy_hitters_sql)

DEPTH, WIDTH, TOP = 3, 8, 10  # narrow so collisions actually happen


def _cell(i, item):
    a, b = _cms_params(i)
    base = int(hashlib.md5(item.encode()).hexdigest()[:15], 16) & _CMS_P
    return ((a * base + b) % _CMS_P) % WIDTH


def _simulate(items):
    true = Counter(items)
    sketch = Counter()
    for it in items:
        for d in range(DEPTH):
            sketch[(d, _cell(d, it))] += 1
    est = {it: min(sketch[(d, _cell(d, it))] for d in range(DEPTH))
           for it in true}
    rows = sorted(((it, est[it], true[it]) for it in true),
                  key=lambda r: (-r[1], r[0]))[:TOP]
    return rows


_items = st.lists(st.sampled_from([f"i{j}" for j in range(12)]),
                  min_size=1, max_size=60)


@settings(max_examples=100, deadline=None)
@given(_items)
def test_cms_sql_matches_reference_model(items):
    con = duckdb.connect()
    con.register("events_pd", pd.DataFrame({"item": items}))
    got = [tuple(r) for r in con.execute(cms_heavy_hitters_sql(
        "events_pd", "item", depth=DEPTH, width=WIDTH,
        top=TOP)).fetchall()]
    want = _simulate(items)
    assert got == want
    # the CMS invariant: never undercounts
    true = Counter(items)
    assert all(est >= true[it] for it, est, _ in got)
