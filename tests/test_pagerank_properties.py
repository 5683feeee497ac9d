"""Property-based check of the knn_pagerank SQL mirror (hypothesis +
DuckDB) against an independent Python reference — the
test_funnel_properties.py triangle: the driver gate pins Spark ≡ DuckDB
on the fixture corpus; this pins DuckDB ≡ reference on ARBITRARY small
vector sets (duplicate vectors, tie-breaks, singleton/dangling graphs,
k larger than the neighborhood). Single-cluster (k_clusters=1) so the
kNN edge set is brute-force-checkable; vectors are small integers so
the µunit quantization is exact. DuckDB-only — each example costs
milliseconds."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from explora_kafka_spark.operators.semdedup import knn_pagerank_sql

DIM = 2

vec_s = st.lists(st.integers(min_value=0, max_value=6),
                 min_size=DIM, max_size=DIM)
vecs_s = st.lists(vec_s, min_size=1, max_size=8)
k_s = st.integers(min_value=1, max_value=3)
rounds_s = st.integers(min_value=1, max_value=3)


def _ref_pagerank(vecs, k, rounds):
    """Brute-force kNN edges (d2 asc, neighbor-id asc, rank<=k over a
    single cluster) + the exact-integer PageRank recurrence."""
    n = len(vecs)
    m = [[math.floor(float(x) * 1e6 + 0.5) for x in v] for v in vecs]
    edges = []
    for a in range(n):
        cands = sorted(
            (sum((m[a][i] - m[b][i]) ** 2 for i in range(DIM)), b)
            for b in range(n) if b != a)
        edges.extend((a, b) for _, b in cands[:k])
    od = Counter(s for s, _ in edges)
    pr = {v: 10**9 // n for v in range(n)}
    hold = (15 * (10**9 // n)) // 100
    for _ in range(rounds):
        insum = defaultdict(int)
        for s, t in edges:
            insum[t] += pr[s] // od[s]
        dm = sum(pr[v] for v in range(n) if od[v] == 0)
        pr = {v: hold + (85 * (insum[v] + dm // n)) // 100
              for v in range(n)}
    return [(v, od.get(v, 0), pr[v]) for v in range(n)]


def _oracle(vecs, k, rounds):
    con = duckdb.connect()
    vals = ", ".join(
        f"({i}, [{', '.join(str(float(x)) for x in v)}])"
        for i, v in enumerate(vecs))
    con.execute("CREATE VIEW embeddings AS SELECT * FROM (VALUES "
                f"{vals}) t(vec_id, embedding)")
    sql = knn_pagerank_sql(k_clusters=1, iters=1, k=k, rounds=rounds,
                           n_rows=len(vecs))
    return [(int(a), int(b), int(c))
            for a, b, c in con.execute(sql).fetchall()]


@settings(max_examples=40, deadline=None)
@given(vecs=vecs_s, k=k_s, rounds=rounds_s)
def test_pagerank_sql_matches_reference(vecs, k, rounds):
    assert _oracle(vecs, k, rounds) == _ref_pagerank(vecs, k, rounds)


def test_pagerank_singleton_is_pure_dangling():
    # one vector: no edges, all mass dangles back to itself each round
    got = _oracle([[1, 1]], k=3, rounds=4)
    n = 1
    pr = 10**9 // n
    hold = (15 * pr) // 100
    for _ in range(4):
        pr = hold + (85 * (0 + (n * pr) // n)) // 100
    assert got == [(0, 0, pr)]
