"""Property-based check of the segment-dedup SQL mirror (hypothesis +
DuckDB) against an independent Python simulation — same triangle as
test_packing_properties.py: the driver gate pins Spark ≡ DuckDB on the
fixture corpus; this pins DuckDB ≡ reference-model on ARBITRARY corpora
(heavy duplication, empty docs, docs shorter than one segment, within-
doc repeats). DuckDB-only so each example costs milliseconds."""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from explora_kafka_spark.operators.segments import segment_dedup_sql

SEG = 3  # small segment size so tiny generated docs exercise multi-segment


def _normalize(text: str) -> list[str]:
    return " ".join(text.lower().split()).split(" ")


def _simulate(rows, seg):
    """Reference model: split each doc's token stream into consecutive
    `seg`-token spans; keep a span only at its corpus-wide first
    occurrence (doc_id, seg_idx order); rebuild doc text from kept spans
    in order."""
    seen = {}
    per_doc = {}
    for doc_id, text in sorted(rows):
        toks = _normalize(text)
        segs = [" ".join(toks[i:i + seg]) for i in range(0, len(toks), seg)]
        per_doc[doc_id] = segs
        for idx, s in enumerate(segs):
            seen.setdefault(s, (doc_id, idx))
    out = []
    for doc_id, segs in sorted(per_doc.items()):
        kept = [s for idx, s in enumerate(segs)
                if seen[s] == (doc_id, idx)]
        out.append((doc_id, len(segs), len(kept), " ".join(kept)))
    return out


# small vocab forces collisions; docs of 0..10 tokens cross the seg=3
# boundary in every alignment
_doc = st.lists(st.sampled_from("a b c dd e".split()), min_size=0, max_size=10)
_corpus = st.lists(_doc, min_size=1, max_size=12)


@given(_corpus)
@settings(max_examples=60, deadline=None)
def test_sql_mirror_matches_simulation(token_lists):
    rows = [(i, " ".join(toks)) for i, toks in enumerate(token_lists)]
    con = duckdb.connect()
    con.register("documents",
                 pd.DataFrame(rows, columns=["doc_id", "text"]))
    got = [tuple(r) for r in
           con.execute(segment_dedup_sql(seg_tokens=SEG)).fetchall()]
    assert got == _simulate(rows, SEG)
