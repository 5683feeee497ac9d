"""Property-based check of the exact-integer revenue discipline
(hypothesis + DuckDB) against an independent Python decimal model —
the property-suite triangle for the round-11 TPC-H waves: the driver
gate pins Spark ≡ DuckDB on the fixture, this pins DuckDB ≡
reference-model on ARBITRARY 2-decimal price/discount grids (values
near .5 cent boundaries, zero prices, max discounts, large groups).
DuckDB-only so each example costs milliseconds.

The contract under test (`__spark_entry__._rev_e4` and every *_e4
oracle): floor(price·100 + 0.5) recovers exact cents from any
2-decimal double, floor(discount·100 + 0.5) recovers exact hundredths,
and revenue_e4 = cents · (100 − hundredths) sums exactly in BIGINT —
no accumulation-order sensitivity at any group size."""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

#: 2-decimal prices up to 1e7 cents and discounts 0.00-0.10, the
#: TPC-H domain (plus 0 and boundary .x5 values the strategy hits)
_price_cents = st.integers(min_value=0, max_value=10_000_000)
_disc_h = st.integers(min_value=0, max_value=10)
_rows = st.lists(st.tuples(_price_cents, _disc_h), min_size=1,
                 max_size=40)


def _model(rows):
    return sum(c * (100 - d) for c, d in rows)


@settings(max_examples=150, deadline=None)
@given(_rows)
def test_rev_e4_sum_matches_decimal_model(rows):
    df = pd.DataFrame({
        "l_extendedprice": [c / 100.0 for c, _ in rows],
        "l_discount": [d / 100.0 for _, d in rows],
    })
    con = duckdb.connect()
    con.register("li", df)
    got = con.execute("""
        SELECT CAST(sum(
            CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
            * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
            AS BIGINT)
        FROM li
    """).fetchone()[0]
    assert got == _model(rows)


@settings(max_examples=150, deadline=None)
@given(_price_cents, _disc_h)
def test_cent_recovery_is_exact_per_row(cents, d):
    # the per-row recovery itself: a 2-decimal double (which is NOT
    # exactly representable in binary) still floors back to the exact
    # integer cents under floor(x*100 + 0.5)
    con = duckdb.connect()
    got = con.execute(
        "SELECT CAST(floor(? * 100 + 0.5) AS BIGINT),"
        " CAST(floor(? * 100 + 0.5) AS BIGINT)",
        [cents / 100.0, d / 100.0]).fetchone()
    assert got == (cents, d)
