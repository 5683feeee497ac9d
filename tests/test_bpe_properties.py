"""Property-based check of the BPE SQL mirrors (hypothesis + DuckDB)
against an independent Python reference implementation of classic BPE
training — the test_funnel_properties.py triangle: the driver gate pins
Spark ≡ DuckDB on the fixture corpus; this pins DuckDB ≡ reference-model
on ARBITRARY corpora (same-char runs, ties, single-char words, repeated
words, early vocabulary exhaustion). DuckDB-only so each example costs
milliseconds."""

from __future__ import annotations

from collections import Counter

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from explora_kafka_spark.operators.text import bpe_encode_sql, bpe_merges_sql


def _ref_bpe(word_freq: dict[str, int], n_merges: int):
    """Classic BPE training: most frequent adjacent pair, ties to the
    lexicographically smallest (left, right); greedy left-to-right
    scan-and-skip application."""
    syms = {w: list(w) for w in word_freq}
    merges = []
    for k in range(n_merges):
        counts: Counter = Counter()
        for w, f in word_freq.items():
            s = syms[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] += f
        if not counts:
            break
        (left, right), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((k, left, right, cnt))
        for w, s in syms.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges, syms


# words over a tiny alphabet so merges collide and tie-break paths fire
word_s = st.text(alphabet="ab", min_size=1, max_size=5)
doc_s = st.lists(word_s, min_size=1, max_size=6).map(" ".join)
corpus_s = st.lists(doc_s, min_size=1, max_size=3)
nm_s = st.integers(min_value=1, max_value=5)


def _view(con, corpus):
    vals = ", ".join(
        f"({i}, '{text}')" for i, text in enumerate(corpus))
    con.execute(
        "CREATE OR REPLACE VIEW documents AS "
        f"SELECT * FROM (VALUES {vals}) AS t(doc_id, text)")


@settings(max_examples=60, deadline=None)
@given(corpus=corpus_s, n=nm_s)
def test_merge_table_matches_reference(corpus, n):
    wf = Counter(w for text in corpus for w in text.split())
    want, _ = _ref_bpe(dict(wf), n)
    con = duckdb.connect()
    _view(con, corpus)
    got = con.execute(bpe_merges_sql("documents", n)).fetchall()
    assert [tuple(r) for r in got] == want


@settings(max_examples=60, deadline=None)
@given(corpus=corpus_s, n=nm_s)
def test_encode_matches_reference(corpus, n):
    wf = Counter(w for text in corpus for w in text.split())
    _, syms = _ref_bpe(dict(wf), n)
    want = []
    for i, text in enumerate(corpus):
        toks = text.split()
        pieces = sum(len(syms[w]) for w in toks)
        want.append((i, pieces, len(toks),
                     round(pieces / len(toks), 6)))
    con = duckdb.connect()
    _view(con, corpus)
    got = con.execute(bpe_encode_sql("documents", n)).fetchall()
    assert [tuple(r) for r in got] == want
