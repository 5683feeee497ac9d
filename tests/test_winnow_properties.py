"""Property-based check of the winnowing SQL mirror (hypothesis +
DuckDB) against an independent Python implementation of the MOSS
algorithm — the segment-dedup property-suite triangle: the driver gate
pins Spark ≡ DuckDB on the fixture corpus; this pins DuckDB ≡
reference-model on ARBITRARY corpora (repeats, short docs, whitespace
runs, boundary-length docs). DuckDB-only so each example costs
milliseconds."""

from __future__ import annotations

import hashlib

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from explora_kafka_spark.operators.text import winnow_fingerprints_sql

K, W = 4, 3  # small so tiny generated docs exercise multiple windows
_HASH_MASK = (1 << 39) - 1
_POS_MAX = (1 << 24) - 1


def _simulate(rows):
    out = []
    for doc_id, text in rows:
        norm = " ".join(text.lower().split())
        n = max(len(norm) - K + 1, 0)
        if n == 0:
            continue
        comps = []
        for pos in range(1, n + 1):
            g = norm[pos - 1:pos - 1 + K]
            h = int(hashlib.md5(g.encode()).hexdigest()[:15], 16) \
                & _HASH_MASK
            comps.append(h * (1 << 24) + (_POS_MAX - pos))
        sel = set()
        for p in range(min(W, n), n + 1):
            m = min(comps[max(0, p - W):p])
            sel.add((_POS_MAX - (m % (1 << 24)), m >> 24))
        out.extend((doc_id, pos, fp) for pos, fp in sorted(sel))
    return out


_doc = st.text(alphabet="ab x", min_size=0, max_size=14)
_corpus = st.lists(_doc, min_size=1, max_size=8)


@settings(max_examples=120, deadline=None)
@given(_corpus)
def test_winnow_sql_matches_reference_model(docs):
    rows = [(i, t) for i, t in enumerate(docs)]
    con = duckdb.connect()
    con.register("documents_pd", pd.DataFrame(
        rows, columns=["doc_id", "text"]))
    con.execute("CREATE VIEW documents AS SELECT * FROM documents_pd")
    got = [tuple(r) for r in con.execute(
        winnow_fingerprints_sql(k=K, w=W)).fetchall()]
    want = sorted(_simulate(rows))
    assert got == sorted(got) == want
