"""Property-based check of the doremi_weights SQL mirror (hypothesis +
DuckDB) against an independent Python reference — the
test_funnel_properties.py triangle: the driver gate pins Spark ≡ DuckDB
on the fixture corpus; this pins DuckDB ≡ reference on ARBITRARY small
corpora (single-source corpora, tokenless documents, whitespace-only
text, case/whitespace normalization, all-equal losses). DuckDB-only —
each example costs milliseconds."""

from __future__ import annotations

import math
from collections import Counter

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from explora_kafka_spark.operators.sampling import doremi_weights_sql

word_s = st.text(alphabet="abAB", min_size=1, max_size=4)
doc_s = st.lists(word_s, min_size=0, max_size=5).map("  ".join)
src_s = st.sampled_from(["s1", "s2", "s3"])
corpus_s = st.lists(st.tuples(doc_s, src_s), min_size=1, max_size=8)


def _ref_doremi(rows, steps=10, eta_ppm=100_000, smooth_ppm=10_000,
                excess_cap_mu=12_000_000):
    """Pure-Python mirror: norm = lower + whitespace collapse; add-one
    unigram µbit vocabulary; per-source integer loss; clipped excess;
    µ-rounded exp multiplicative weights averaged + uniform-smoothed."""
    toks = {}
    for i, (text, src) in enumerate(rows):
        toks[i] = (src, [t for t in text.lower().split() if t])
    vocab = Counter(t for _, ts in toks.values() for t in ts)
    if not vocab:
        return []
    T, V = sum(vocab.values()), len(vocab)
    mu = {t: math.floor(-math.log2((c + 1) / (T + V)) * 1e6 + 0.5)
          for t, c in vocab.items()}
    per = {}
    for src, ts in toks.values():
        if not ts:
            continue
        n, smu = per.get(src, (0, 0))
        per[src] = (n + len(ts), smu + sum(mu[t] for t in ts))
    tmu = sum(s for _, s in per.values())
    tn = sum(n for n, _ in per.values())
    S = len(per)
    base = tmu // tn
    out = []
    excess = {s: min(max(smu // n - base, 0), excess_cap_mu)
              for s, (n, smu) in per.items()}
    sw = {s: 0 for s in per}
    for t in range(1, steps + 1):
        e = {s: math.floor(
            math.exp((eta_ppm * t * excess[s]) / 1e12) * 1e6 + 0.5)
            for s in per}
        se = sum(e.values())
        for s in per:
            sw[s] += e[s] * 1_000_000 // se
    for s in sorted(per):
        n, smu = per[s]
        out.append((s, n, smu // n, excess[s],
                    ((1_000_000 - smooth_ppm) * (sw[s] // steps)
                     + smooth_ppm * (1_000_000 // S)) // 1_000_000))
    return out


def _oracle(rows):
    con = duckdb.connect()
    vals = ", ".join(
        f"({i}, '{text}', '{src}')" for i, (text, src) in enumerate(rows))
    con.execute("CREATE VIEW documents AS SELECT * FROM (VALUES "
                f"{vals}) t(doc_id, text, source)")
    return [(a, int(b), int(c), int(d), int(e)) for a, b, c, d, e in
            con.execute(doremi_weights_sql()).fetchall()]


@settings(max_examples=40, deadline=None)
@given(rows=corpus_s)
def test_doremi_sql_matches_reference(rows):
    assert _oracle(rows) == _ref_doremi(rows)
