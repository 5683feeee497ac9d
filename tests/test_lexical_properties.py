"""Property pins for the lexical-diversity audit MIRRORS (hypothesis +
DuckDB, milliseconds per example).

The strict gate pins Spark ≡ DuckDB on the fixture at two SFs; these
suites pin the DuckDB mirrors against independent pure-Python models on
ARBITRARY corpora, so a shared representation bug (same wrong SQL on
both engines) cannot hide. Texts are generated pre-normalized (single
spaces, lowercase), so the model never re-implements the normalizer.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from explora_kafka_spark.operators.corpus import length_bucket_drift_sql
from explora_kafka_spark.operators.text import (
    ngram_novelty_sql,
    ttr_profile_sql,
    zipf_slope_sql,
)

_word = st.sampled_from(["a", "b", "c", "dd", "ee"])
# min_size=0 admits blank docs ("") — the '' phantom-token path
# (ADVICE r11): vocab-shaped models filter it, count-shaped keep it
_text = st.lists(_word, min_size=0, max_size=8).map(" ".join)
_doc = st.tuples(_text, st.sampled_from(["s1", "s2", "s3"]))
_corpus = st.lists(_doc, min_size=1, max_size=12)


def _frame(docs):
    return pd.DataFrame(
        [(i, t, s) for i, (t, s) in enumerate(docs)],
        columns=["doc_id", "text", "source"])


def _run(sql, docs):
    con = duckdb.connect()
    con.register("documents", _frame(docs))
    return con.execute(sql).fetchall()


@settings(max_examples=100, deadline=None)
@given(_corpus)
def test_ttr_profile_mirror_matches_model(docs):
    got = _run(ttr_profile_sql(), docs)
    per: dict[str, list[str]] = {}
    for t, s in docs:
        per.setdefault(s, []).extend(t.split(" "))
    expect = []
    for s in sorted(per):
        # the '' phantom from blank/whitespace-only docs is filtered
        # (ADVICE r11); a blank-only source reports zero totals
        toks = [t for t in per[s] if t != ""]
        n_docs = sum(1 for _, src in docs if src == s)
        ttr = (len(set(toks)) * 1_000_000 // len(toks)
               if toks else None)
        expect.append((s, n_docs, len(toks), len(set(toks)), ttr))
    assert got == expect


@settings(max_examples=100, deadline=None)
@given(_corpus)
def test_zipf_slope_mirror_matches_model(docs):
    got = _run(zipf_slope_sql(top_n=256), docs)
    freq: dict[str, int] = {}
    for t, _ in docs:
        for w in t.split(" "):
            if w != "":
                freq[w] = freq.get(w, 0) + 1
    top = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:256]
    xs = [math.floor(math.log(r) * 1000 + 0.5)
          for r in range(1, len(top) + 1)]
    ys = [math.floor(math.log(f) * 1000 + 0.5) for _, f in top]
    n = len(top)
    if n == 0:   # blank-only corpus: NULL sums on the engine side
        assert got == [(0, None, None, None)]
        return
    sx, sy = sum(xs), sum(ys)
    num = n * sum(x * y for x, y in zip(xs, ys)) - sx * sy
    den = n * sum(x * x for x in xs) - sx * sx
    slope = float(num) / float(den) if den else None
    assert got == [(n, num, den, slope)]


def _shingles(tokens, n=5):
    if len(tokens) <= n - 1:
        return {" ".join(tokens)}
    return {" ".join(tokens[i:i + n])
            for i in range(len(tokens) - n + 1)}


@settings(max_examples=100, deadline=None)
@given(_corpus)
def test_ngram_novelty_mirror_matches_model(docs):
    got = _run(ngram_novelty_sql(), docs)
    sh = {i: _shingles(t.split(" ")) for i, (t, _) in enumerate(docs)}
    ndocs: dict[str, int] = {}
    for grams in sh.values():
        for g in grams:
            ndocs[g] = ndocs.get(g, 0) + 1
    agg: dict[str, list[int]] = {}
    for i, (t, s) in enumerate(docs):
        a = agg.setdefault(s, [0, 0, 0])
        a[0] += 1
        a[1] += len(sh[i])
        a[2] += sum(1 for g in sh[i] if ndocs[g] >= 2)
    expect = [(s, a[0], a[1], a[2], a[2] * 1_000_000 // a[1])
              for s, a in sorted(agg.items())]
    assert got == expect


@settings(max_examples=100, deadline=None)
@given(_corpus)
def test_length_bucket_drift_mirror_matches_model(docs):
    got = _run(length_bucket_drift_sql(), docs)
    buckets = [(s, len(bin(len(t.split(" "))))- 2) for t, s in docs]
    cell: dict[tuple[str, int], int] = {}
    for s, b in buckets:
        cell[(s, b)] = cell.get((s, b), 0) + 1
    stot: dict[str, int] = {}
    btot: dict[int, int] = {}
    for (s, b), c in cell.items():
        stot[s] = stot.get(s, 0) + c
        btot[b] = btot.get(b, 0) + c
    g = sum(btot.values())
    c_ppm = {b: v * 1_000_000 // g for b, v in btot.items()}
    expect = []
    for s in sorted(stot):
        l1 = sum(abs(cell.get((s, b), 0) * 1_000_000 // stot[s]
                     - c_ppm[b]) for b in btot)
        expect.append((s, stot[s], l1))
    assert got == expect


@settings(max_examples=100, deadline=None)
@given(_corpus)
def test_temperature_mix_mirror_matches_model(docs):
    from explora_kafka_spark.operators.corpus import temperature_mix_sql

    got = _run(temperature_mix_sql(), docs)
    per: dict[str, list[int]] = {}
    for t, s in docs:
        a = per.setdefault(s, [0, 0])
        a[0] += 1
        a[1] += len(t.split(" "))
    tt = sum(a[1] for a in per.values())
    w = {s: math.floor(math.exp(0.7 * math.log(a[1] / tt)) * 1e6 + 0.5)
         for s, a in per.items()}
    sw = sum(w.values())
    expect = []
    for s in sorted(per):
        n_docs, toks = per[s]
        share = toks * 1_000_000 // tt
        temp = w[s] * 1_000_000 // sw
        boost = temp * 1_000_000 // share if share else None
        expect.append((s, n_docs, toks, share, temp, boost))
    assert got == expect


@settings(max_examples=100, deadline=None)
@given(_corpus)
def test_vocab_coverage_mirror_matches_model(docs):
    from explora_kafka_spark.operators.text import vocab_coverage_sql

    got = _run(vocab_coverage_sql(), docs)
    freq: dict[str, int] = {}
    for t, _ in docs:
        for w in t.split(" "):
            if w != "":
                freq[w] = freq.get(w, 0) + 1
    if not freq:            # blank-only corpus: empty result
        assert got == []
        return
    ordered = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))
    tt = sum(freq.values())
    tv = len(freq)
    expect = []
    for t in (500_000, 900_000, 950_000, 990_000):
        target = (t * tt + 999_999) // 1_000_000
        cum = 0
        vocab = 0
        for _, f in ordered:
            if cum >= target:
                break
            cum += f
            vocab += 1
        expect.append((t, target, vocab, tv, tt))
    assert got == expect
