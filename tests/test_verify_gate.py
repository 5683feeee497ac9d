"""The local correctness gate's canonicalization layer
(tools/verify_local.py) — regression-pinned against the two harness
classes that shipped red driver rows before it was made strict:

* round 9: DuckDB HUGEINT sums reach pandas as float64 while Spark
  emits int64 (value-equal, dtype-different) — the dtype-CLASS check;
* round 9: a rounded -0.0 vs 0.0 (value-equal, bitwise-different) —
  the bitwise float check;
* round 7: ndarray cells; plus the proven-benign classes that must
  KEEP passing (int32-vs-int64, ns-vs-us, None-vs-NaN).
"""

from __future__ import annotations

import importlib.util
import sys

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def gate():
    from pathlib import Path
    path = Path(__file__).resolve().parent.parent / "tools/verify_local.py"
    spec = importlib.util.spec_from_file_location("verify_local", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["verify_local"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_dtype_class_flags_int_vs_float(gate):
    si = pd.Series([10000, 2], dtype="int64")
    sf = pd.Series([10000.0, 2.0], dtype="float64")
    assert gate._dtype_class(si.dtype, si) == "int"
    assert gate._dtype_class(sf.dtype, sf) == "float"


def test_dtype_class_tolerates_int_width_and_datetime_unit(gate):
    a = pd.Series([1, 2], dtype="int32")
    b = pd.Series([1, 2], dtype="int64")
    assert gate._dtype_class(a.dtype, a) == gate._dtype_class(b.dtype, b)
    c = pd.Series(pd.to_datetime(["2024-01-01"])).astype("datetime64[ns]")
    d = pd.Series(pd.to_datetime(["2024-01-01"])).astype("datetime64[us]")
    assert gate._dtype_class(c.dtype, c) == gate._dtype_class(d.dtype, d)


def test_width_mismatches_reports_tolerated_divergence(gate):
    """The tolerated-width WARN (VERDICT r11 #5): class-equal but
    width-different columns are listed; class MISMATCHES and exact
    matches are not (those fail or pass silently elsewhere)."""
    sp = pd.DataFrame({
        "a": pd.Series([1, 2], dtype="int32"),
        "b": pd.Series(pd.to_datetime(["2024-01-01", "2024-01-02"]))
        .astype("datetime64[ns]"),
        "c": pd.Series([1, 2], dtype="int64"),
        "d": pd.Series([1.0, 2.0], dtype="float64"),
    })
    du = pd.DataFrame({
        "a": pd.Series([1, 2], dtype="int64"),
        "b": sp["b"].astype("datetime64[us]"),
        "c": pd.Series([1, 2], dtype="int64"),
        "d": pd.Series([1, 2], dtype="int64"),   # class mismatch: not a WARN
    })
    got = gate.width_mismatches(["a", "b", "c", "d"], sp, du)
    assert got == [("a", "int32", "int64"),
                   ("b", "datetime64[ns]", "datetime64[us]")]


def test_dtype_class_flags_object_date_vs_datetime64(gate):
    import datetime
    obj = pd.Series([datetime.date(2024, 1, 1)], dtype=object)
    dt = pd.Series(pd.to_datetime(["2024-01-01"]))
    assert gate._dtype_class(obj.dtype, obj) == "date-object"
    assert gate._dtype_class(dt.dtype, dt) == "datetime"


def test_bits_distinguishes_signed_zero(gate):
    assert gate._bits(0.0) != gate._bits(-0.0)
    assert gate._bits(1.5) == gate._bits(1.5)
    assert gate._canon(0.0) == gate._canon(-0.0)  # value layer: equal


def test_canon_unifies_missing_and_widths(gate):
    assert gate._canon(float("nan")) is None
    assert gate._canon(None) is None
    assert gate._canon(np.int32(7)) == gate._canon(np.int64(7)) == 7
    ns = pd.Timestamp("2024-01-01 00:00:00")
    us = pd.Timestamp("2024-01-01 00:00:00").as_unit("us")
    assert gate._canon(ns) == gate._canon(us)
    assert gate._canon(np.array([1.0, 2.0])) == (1.0, 2.0)


def test_frame_rows_order_insensitive_and_column_sorted(gate):
    a = pd.DataFrame({"b": [2, 1], "a": ["y", "x"]})
    b = pd.DataFrame({"a": ["x", "y"], "b": [1, 2]})
    ra, ca = gate._frame_rows(a)
    rb, cb = gate._frame_rows(b)
    assert ca == cb == ["a", "b"]
    assert ra == rb


def test_signed_zero_multiset_pairs_deterministically(gate):
    # bitwise-identical multisets in different input orders must pass
    # the bit layer: the sort key includes the float bit pattern, so
    # (-0.0, 0.0) ties cannot cross-pair between engines
    a = pd.DataFrame({"k": [1, 1], "v": [-0.0, 0.0]})
    b = pd.DataFrame({"k": [1, 1], "v": [0.0, -0.0]})
    ra, _ = gate._frame_rows(a)
    rb, _ = gate._frame_rows(b)
    assert [tuple(gate._bits(v) for v in r) for r in ra] == \
           [tuple(gate._bits(v) for v in r) for r in rb]


def test_dtype_class_flags_mixed_object_columns(gate):
    # ADVICE r10: classification must scan the whole column, not just
    # the first non-null — a str/int mix is its own (failing) class
    mixed = pd.Series(["a", 1], dtype=object)
    assert gate._dtype_class(mixed.dtype, mixed) == "mixed(int,str)"
    late = pd.Series(["a", "b", 3.5], dtype=object)
    assert "mixed" in gate._dtype_class(late.dtype, late)
    pure = pd.Series(["a", None, "b"], dtype=object)
    assert gate._dtype_class(pure.dtype, pure) == "str"


def test_nan_fold_restricted_to_object_columns(gate):
    # ADVICE r10: NaN→None folding is the documented object-column
    # DuckDB NULL-rendering case only; float64 NaN keeps its own marker
    assert gate._canon(float("nan"), fold_nan=False) == "__nan__"
    obj = pd.DataFrame({"v": pd.Series([float("nan"), "x"], dtype=object)})
    flt = pd.DataFrame({"v": pd.Series([float("nan"), 1.0], dtype="float64")})
    robj, _ = gate._frame_rows(obj)
    rflt, _ = gate._frame_rows(flt)
    assert (None,) in robj           # object column: folded to missing
    assert ("__nan__",) in rflt      # float column: distinct NaN marker
    # and NaN==NaN stays workable for the multiset compare
    rflt2, _ = gate._frame_rows(
        pd.DataFrame({"v": pd.Series([1.0, float("nan")], dtype="float64")}))
    assert rflt == rflt2


def test_int_vs_float_values_differ_at_bit_layer(gate):
    # the r9 escape end-to-end: same value, different representation
    a = pd.DataFrame({"n": pd.Series([10000], dtype="int64")})
    b = pd.DataFrame({"n": pd.Series([10000.0], dtype="float64")})
    ra, _ = gate._frame_rows(a)
    rb, _ = gate._frame_rows(b)
    assert [tuple(gate._bits(v) for v in r) for r in ra] != \
           [tuple(gate._bits(v) for v in r) for r in rb]
    # and the dtype-class layer catches it even before values
    assert gate._dtype_class(a["n"].dtype, a["n"]) != \
        gate._dtype_class(b["n"].dtype, b["n"])
