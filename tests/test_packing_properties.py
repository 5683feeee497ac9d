"""Property-based check of the packing SQL mirror (hypothesis + DuckDB).

The driver's correctness gate pins Spark ≡ DuckDB on the fixture corpus;
this file pins the DuckDB mirror ≡ an independent Python simulation on
ARBITRARY token distributions (giant docs spanning many packs, empty
docs, single-token docs) — closing the triangle the geo codecs use in
test_geo_properties.py. DuckDB-only so each example costs milliseconds,
not a Spark job.
"""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from explora_kafka_spark.operators.packing import (
    pack_sequences_sql,
    _shard_sql,
)


def _simulate(doc_tokens, budget, shards, shard_of):
    """Reference model: concatenate each shard's docs in doc_id order,
    cut every `budget` tokens, emit (shard, pack, doc, doc_off,
    pack_off, n) slices."""
    out = []
    cursor = {}
    for doc_id, n in sorted(doc_tokens):
        if n <= 0:
            continue
        sh = shard_of[doc_id]
        pos = cursor.get(sh, 0)
        done = 0
        while done < n:
            pack, pack_off = divmod(pos, budget)
            take = min(n - done, budget - pack_off)
            out.append((sh, pack, doc_id, done, pack_off, take))
            done += take
            pos += take
        cursor[sh] = pos
    return sorted(out)


@settings(max_examples=25, deadline=None)
@given(
    tokens=st.lists(
        st.integers(min_value=0, max_value=700), min_size=1, max_size=40
    ),
    budget=st.integers(min_value=1, max_value=64),
    shards=st.integers(min_value=1, max_value=4),
)
def test_pack_sql_matches_simulation(tokens, budget, shards):
    con = duckdb.connect()
    docs = pd.DataFrame({
        "doc_id": range(len(tokens)),
        # "w " * n pretokenizes to exactly n BPE tokens (" w" each)
        "text": ["w " * n for n in tokens],
    })
    con.register("documents", docs)
    got = sorted(
        tuple(int(v) for v in row)
        for row in con.execute(
            pack_sequences_sql("documents", budget=budget, shards=shards)
        ).fetchall()
    )
    shard_of = {
        int(d): int(s)
        for d, s in con.execute(
            f"SELECT doc_id, {_shard_sql('doc_id', shards)} FROM documents"
        ).fetchall()
    }
    want = _simulate(list(enumerate(tokens)), budget, shards, shard_of)
    assert got == want
