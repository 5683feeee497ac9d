"""Local stand-in for the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark at sf0.01 and the
matching ``oracle_sql()`` on DuckDB over the same parquet files, then compares
row count, column names, and (order-insensitively) values.

Usage: python tools/verify_local.py [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as E  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # exact — the driver hash-compares raw values; the old round(v, 4)
        # masked a real 1e-9 divergence in embedding_quantization for two
        # rounds (VERDICT r5 #2)
        return v
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    return v


def _rows(cols, data):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = [tuple(_canon(r[i]) for i in order) for r in data]
    # None-safe total order (rollup subtotal rows carry NULL keys)
    return sorted(
        rows, key=lambda t: tuple((v is None, str(type(v)), v) for v in t)
    ), [cols[i] for i in order]


def main():
    from explora_kafka_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs = E.queries()
    oracles = E.oracle_sql()
    # registry parity gate (VERDICT r3 #2): every oracle must target a
    # registered query; every query without an oracle must be a known
    # rows-only entry. The driver records at most the FIRST 50 entries, so
    # list what falls past the cap to make the trade-off explicit.
    ROWS_ONLY = {"distinct_users_daily_approx", "percentile_approx_audit"}
    stray = set(oracles) - set(qs)
    assert not stray, f"oracles without a query: {sorted(stray)}"
    no_oracle = set(qs) - set(oracles) - ROWS_ONLY
    assert not no_oracle, f"queries missing an oracle: {sorted(no_oracle)}"
    names = list(qs)
    print(f"registry: {len(names)} entries "
          f"({len(oracles)} oracle-checked, {len(ROWS_ONLY)} rows-only)")
    if len(names) > 50:
        print(f"past the driver's 50-row cap: {names[50:]}")
    only = set(sys.argv[1:])
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            sdata = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {exc}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows={len(sdata)} (no oracle, rows-only) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            odata = res.fetchall()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: oracle error: {exc}")
            failures.append(name)
            continue
        srows, sc = _rows(scols, sdata)
        orows, oc = _rows(ocols, odata)
        if sc != oc:
            print(f"FAIL {name}: columns spark={sc} oracle={oc}")
            failures.append(name)
        elif len(srows) != len(orows):
            print(f"FAIL {name}: rowcount spark={len(srows)} oracle={len(orows)}")
            failures.append(name)
        elif srows != orows:
            diff = [
                (a, b) for a, b in zip(srows, orows) if a != b
            ][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {diff}")
            failures.append(name)
        else:
            print(f"PASS {name}: rows={len(srows)} [{time.time()-t0:.1f}s]")
    print()
    if failures:
        print(f"{len(failures)} FAILED: {failures}")
        sys.exit(1)
    print("all green")


if __name__ == "__main__":
    main()
