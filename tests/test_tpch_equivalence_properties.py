"""Property-based equivalence pins for the round-11 TPC-H
reformulations (hypothesis + DuckDB, milliseconds per example).

Two registry entries replace a canonical formulation with a cheaper
equivalent; these suites prove the equivalence on ARBITRARY inputs,
not just the fixture:

- `waiting_supplier` collapses Q21's EXISTS / NOT-EXISTS pair over
  lineitem self-joins into ONE aggregation over distinct late
  (order, supplier) pairs ("a 1-supplier late group IS the sole-late
  case"). The suite runs both formulations on random order/supplier/
  late-flag tables and compares exactly.
- `small_qty_revenue` compares the Q17 threshold in exact integers
  (5·q·cnt < Σq) instead of the float q < 0.2·avg(q). For integer
  quantities the forms are the same rational inequality; the suite
  pins the integer form against an exact Fraction model (the float
  form is what it REPLACES, so the pin is against exact rationals).
"""

from __future__ import annotations

from fractions import Fraction

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

# (order, supplier, is_late) tables: few keys so collisions are dense
_line = st.tuples(st.integers(0, 5), st.integers(0, 3), st.booleans())
_lines = st.lists(_line, min_size=1, max_size=30)


@settings(max_examples=120, deadline=None)
@given(_lines)
def test_sole_late_collapse_equals_exists_formulation(lines):
    df = pd.DataFrame(lines, columns=["okey", "skey", "late"])
    con = duckdb.connect()
    con.register("li", df)
    # canonical Q21 shape: late line in a multi-supplier order where
    # NO OTHER supplier of that order is late
    canonical = con.execute("""
        WITH late AS (SELECT DISTINCT okey, skey FROM li WHERE late),
        multi AS (SELECT okey FROM li GROUP BY 1
                  HAVING count(DISTINCT skey) >= 2)
        SELECT la.skey, count(*) AS numwait
        FROM late la
        JOIN multi m ON m.okey = la.okey
        WHERE NOT EXISTS (SELECT 1 FROM late lb
                          WHERE lb.okey = la.okey
                            AND lb.skey <> la.skey)
        GROUP BY 1 ORDER BY 1
    """).fetchall()
    # registry formulation: group the distinct late pairs; a group of
    # exactly one supplier is the sole-late case
    collapsed = con.execute("""
        WITH late AS (SELECT DISTINCT okey, skey FROM li WHERE late),
        sole AS (SELECT okey, max(skey) AS skey FROM late
                 GROUP BY 1 HAVING count(*) = 1),
        multi AS (SELECT okey FROM li GROUP BY 1
                  HAVING count(DISTINCT skey) >= 2)
        SELECT s.skey, count(*) AS numwait
        FROM sole s JOIN multi m ON m.okey = s.okey
        GROUP BY 1 ORDER BY 1
    """).fetchall()
    assert canonical == collapsed


_qty = st.integers(1, 50)
_group = st.lists(_qty, min_size=1, max_size=20)


@settings(max_examples=200, deadline=None)
@given(_group)
def test_integer_threshold_equals_rational_fifth_of_avg(qtys):
    total, cnt = sum(qtys), len(qtys)
    for q in qtys:
        integer_form = 5 * q * cnt < total
        rational_form = Fraction(q) < Fraction(1, 5) * Fraction(total, cnt)
        assert integer_form == rational_form

# --- third-wave pins (Q11 / Q20 / Q2 shapes) ---

_vals = st.lists(st.integers(0, 10**9), min_size=1, max_size=25)


@settings(max_examples=200, deadline=None)
@given(_vals)
def test_q11_integer_threshold_equals_twice_average(vals):
    """important_parts keeps v iff v > 2·avg(v); the registry compares
    v·n > 2·Σv in exact integers. Same rational inequality."""
    total, n = sum(vals), len(vals)
    for v in vals:
        integer_form = v * n > 2 * total
        rational_form = Fraction(v) > 2 * Fraction(total, n)
        assert integer_form == rational_form


_pairs = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 3), st.integers(1, 50)),
    min_size=1, max_size=30)


@settings(max_examples=150, deadline=None)
@given(_pairs)
def test_q20_integer_share_equals_rational_tenth(pairs):
    """concentrated_part_suppliers keeps a (part, supp) pair iff its
    qty share exceeds 10%; the registry compares 10·pair > total."""
    import collections
    pair_qty = collections.Counter()
    for part, supp, q in pairs:
        pair_qty[(part, supp)] += q
    part_qty = collections.Counter()
    for (part, _), q in pair_qty.items():
        part_qty[part] += q
    for (part, _), q in pair_qty.items():
        integer_form = 10 * q > part_qty[part]
        rational_form = Fraction(q, part_qty[part]) > Fraction(1, 10)
        assert integer_form == rational_form


_offers = st.lists(
    st.tuples(st.integers(0, 4), st.integers(0, 3),
              st.integers(1, 10**7), st.integers(1, 50)),
    min_size=1, max_size=40)


@settings(max_examples=120, deadline=None)
@given(_offers)
def test_q2_window_min_returns_all_achievers(offers):
    """min_cost_supplier's window-min-equality form must equal the
    correlated-subquery min AND the unit price must be the SAME IEEE
    division on both engines (exact bigint→double cast, one exactly
    rounded op) — pinned by comparing DuckDB's division bitwise to
    Python's."""
    import struct

    df = pd.DataFrame(offers,
                      columns=["part", "supp", "cents", "qty"])
    con = duckdb.connect()
    con.register("li", df)
    rows = con.execute("""
        WITH offers AS (
            SELECT part, supp,
                   min(CAST(cents AS DOUBLE) / CAST(qty AS DOUBLE))
                       AS unit
            FROM li GROUP BY 1, 2)
        SELECT part, supp, unit FROM offers
        QUALIFY unit = min(unit) OVER (PARTITION BY part)
        ORDER BY 1, 2
    """).fetchall()
    # python model: exact same float ops
    best_per_pair = {}
    for part, supp, cents, qty in offers:
        u = float(cents) / float(qty)
        k = (part, supp)
        if k not in best_per_pair or u < best_per_pair[k]:
            best_per_pair[k] = u
    best_per_part = {}
    for (part, _), u in best_per_pair.items():
        if part not in best_per_part or u < best_per_part[part]:
            best_per_part[part] = u
    expect = sorted(
        (part, supp, u) for (part, supp), u in best_per_pair.items()
        if u == best_per_part[part])
    assert len(rows) == len(expect)
    for (gp, gs, gu), (ep, es, eu) in zip(rows, expect):
        assert (gp, gs) == (ep, es)
        assert struct.pack("<d", gu) == struct.pack("<d", eu)
