"""Operator tests: dedup / similarity / text over the driver's
documents+embeddings tables (sf0.001). Focus: semantic invariants and
plan-shape guarantees (no cartesian products in the LSH paths)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from explora_kafka_spark.operators import dedup as D
from explora_kafka_spark.operators import similarity as S
from explora_kafka_spark.operators import text as T

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------


def test_dedup_exact_finds_injected_duplicates(spark, docs):
    # duplicate every doc under a shifted id; whitespace/case noise must
    # normalize away
    noisy = docs.withColumn("doc_id", F.col("doc_id") + 1_000_000).withColumn(
        "text", F.upper(F.concat(F.lit("  "), F.col("text"), F.lit("   ")))
    )
    groups = D.dedup_exact(docs.unionByName(noisy))
    assert groups.filter(F.col("n_dups") != 2).count() == 0
    # keeper is always the original (smaller) id
    assert groups.filter(F.col("keep_doc_id") >= 1_000_000).count() == 0


def test_minhash_identical_docs_identical_sigs(spark, docs):
    sigs = D.minhash_signatures(docs, shingle_n=2)
    dup = docs.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    both = D.minhash_signatures(docs.unionByName(dup), shingle_n=2)
    a = {r.doc_id: r.sig for r in both.collect()}
    for i in range(20):
        assert a[i] == a[i + 1_000_000]
    assert sigs.select(F.size("sig")).distinct().collect()[0][0] == D.NUM_HASHES


def test_lsh_no_cartesian_product(docs):
    plan = _physical_plan(D.dedup_near(docs, shingle_n=2, num_bands=8))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_exact_duplicate_pair_has_est_one(spark, docs):
    one = docs.filter(F.col("doc_id") == 3)
    pair_input = one.unionByName(
        one.withColumn("doc_id", F.lit(1_000_003))
    )
    pairs = D.dedup_near(pair_input, shingle_n=2).collect()
    assert len(pairs) == 1
    assert pairs[0].est_jaccard == 1.0


def test_ngram_jaccard_bounds(docs):
    rows = D.ngram_jaccard_pairs(docs, shingle_n=2, num_bands=8).collect()
    assert rows, "LSH candidates expected on this corpus"
    for r in rows:
        assert 0.0 <= r.jaccard <= 1.0
        assert 0.0 <= r.est_jaccard <= 1.0


def test_simhash_stable_and_bounded(docs):
    rows = D.simhash(docs).collect()
    assert all(0 <= r.simhash < (1 << 32) for r in rows)
    # identical text → identical simhash
    again = {r.doc_id: r.simhash for r in D.simhash(docs).collect()}
    assert {r.doc_id: r.simhash for r in rows} == again


# ---------------------------------------------------------------------------
# similarity
# ---------------------------------------------------------------------------


def test_brute_topk_shape_and_self_exclusion(emb):
    rows = S.ann_topk_brute(emb, query_mod=100, k=3).collect()
    by_q = {}
    for r in rows:
        assert r.query_id != r.neighbor_id
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        sims = [r.sim for r in rs]
        assert sims == sorted(sims, reverse=True)


def test_lsh_topk_is_subset_quality(emb):
    brute = S.ann_topk_brute(emb, query_mod=100, k=3).collect()
    lsh = S.ann_topk_lsh(emb, query_mod=100, k=3).collect()
    # every LSH result's sim is <= the brute-force best for that query
    best = {}
    for r in brute:
        best.setdefault(r.query_id, r.sim)
    for r in lsh:
        assert r.sim <= best[r.query_id] + 1e-9


def test_lsh_join_is_bucketed_not_cartesian(emb):
    plan = _physical_plan(S.ann_topk_lsh(emb))
    assert "CartesianProduct" not in plan
    plan2 = _physical_plan(S.embedding_near_dup(emb, tau=0.3))
    assert "CartesianProduct" not in plan2
    assert "BroadcastNestedLoopJoin" not in plan2


def test_bucket_determinism(emb):
    planes = S.hyperplanes()
    b1 = emb.withColumn("b", F.expr(S.bucket_expr_spark(planes))).collect()
    assert all(0 <= r.b < (1 << S.NUM_PLANES) for r in b1)


def test_adaptive_planes_scales_with_corpus():
    # at the oracle scale (sf0.01 = 500 vectors) the floor holds, so the
    # pinned SQL oracles stay valid
    assert S.adaptive_planes(500) == S.NUM_PLANES
    # each 2× corpus growth adds ~1 plane → expected bucket occupancy
    # (and so in-bucket candidate pairs per row) stays ~constant
    assert S.adaptive_planes(5_000) == 9
    assert S.adaptive_planes(10_000) == 10
    assert S.adaptive_planes(5_000_000) == 19
    ns = [10**3, 10**4, 10**5, 10**6, 10**9]
    vals = [S.adaptive_planes(n) for n in ns]
    assert vals == sorted(vals)
    assert S.adaptive_planes(10**12) == S.MAX_PLANES
    # occupancy bound: n / 2^planes ≤ 2·target for every n above the floor
    for n in ns:
        p = S.adaptive_planes(n)
        if p < S.MAX_PLANES:
            assert n / (1 << p) <= 2 * S.TARGET_BUCKET_SIZE


def test_ann_recall_bounds_and_coverage(emb):
    rows = S.ann_recall_lsh(emb, query_mod=100, k=3).collect()
    n_queries = emb.filter(F.col("vec_id") % 100 == 0).count()
    assert len(rows) == n_queries
    assert all(0.0 <= r.recall_at_k <= 1.0 for r in rows)


def test_ann_recall_ivf_bounds_and_exhaustive_limit(emb):
    rows = S.ann_recall_ivf(emb, query_mod=100, k=3).collect()
    n_queries = emb.filter(F.col("vec_id") % 100 == 0).count()
    assert len(rows) == n_queries
    assert all(0.0 <= r.recall_at_k <= 1.0 for r in rows)
    # probing every list is exhaustive rerank → recall exactly 1.0
    full = S.ann_recall_ivf(emb, query_mod=100, k=3, nprobe=emb.count())
    assert all(r.recall_at_k == 1.0 for r in full.collect())


def test_ann_recall_truncated_bounds_and_full_width_identity(emb):
    # truncating at the full width IS the brute path -> recall 1.0;
    # a 32-of-64 prefix stays a valid bounded audit
    full = S.ann_recall_truncated(emb, query_mod=100, k=3, keep_dims=64)
    assert all(r.recall_at_k == 1.0 for r in full.collect())
    rows = S.ann_recall_truncated(emb, query_mod=100, k=3,
                                  keep_dims=32).collect()
    n_queries = emb.filter(F.col("vec_id") % 100 == 0).count()
    assert len(rows) == n_queries
    assert all(0.0 <= r.recall_at_k <= 1.0 for r in rows)


# ---------------------------------------------------------------------------
# text
# ---------------------------------------------------------------------------


def test_text_stats_ranges(docs):
    for r in T.with_text_stats(docs).collect():
        assert r.n_tokens > 0
        assert 0.0 <= r.punct_ratio <= 1.0
        assert 0.0 <= r.stopword_ratio <= 1.0
        assert 0.0 <= r.quality_score <= 1.0


def test_simhash_near_dup_matches_bruteforce(docs):
    """The hamming-banded join is pigeonhole-EXACT: results must equal a
    brute-force all-pairs hamming scan of the same fingerprints."""
    sh = {r.doc_id: r.simhash for r in D.simhash(docs).collect()}
    want = set()
    ids = sorted(sh)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h = bin(sh[a] ^ sh[b]).count("1")
            if h <= 3:
                want.add((a, b, h))
    got = {(r.doc_a, r.doc_b, r.hamming)
           for r in D.simhash_near_dup(docs, hamming_max=3).collect()}
    assert got == want


def test_source_quality_profile_aggregates(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat with a dog and the bird", "a"),
            (2, "@@ ## !!", "a"),          # punctuation-heavy → low quality
            # long, stopword-rich, punctuation-free → above threshold
            (3, "the cat is on the mat and the dog is in the house " * 12,
             "b"),
        ],
        "doc_id: long, text: string, source: string",
    )
    out = {r["source"]: r.asDict()
           for r in T.source_quality_profile(df, 0.5).collect()}
    assert out["a"]["n_docs"] == 2 and out["b"]["n_docs"] == 1
    assert out["a"]["low_quality_share"] == 0.5
    assert out["b"]["low_quality_share"] == 0.0
    stats = {r["doc_id"]: r["quality_score"]
             for r in T.with_text_stats(df).collect()}
    want_mean_a = (stats[1] + stats[2]) / 2
    assert abs(out["a"]["mean_quality"] - want_mean_a) < 1e-6
    assert out["a"]["total_tokens"] == sum(
        r["n_tokens"] for r in T.with_text_stats(df).collect()
        if r["doc_id"] in (1, 2)
    )


def test_lang_id_known_phrases(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and it is a test of the system"),
            (2, "le chat est sur la table et il est un animal"),
            (3, "el gato es un animal y la mesa es de madera"),
            (4, "der hund ist ein tier und die katze ist zu hause"),
            (5, "xyzzy plugh qwerty"),
        ],
        "doc_id long, text string",
    ).withColumn("lang", F.lit("?"))
    got = {r.doc_id: r.pred_lang for r in T.with_lang_id(df).collect()}
    assert got == {1: "en", 2: "fr", 3: "es", 4: "de", 5: "und"}


def test_fingerprint_invariant_to_case_and_spacing(spark, docs):
    noisy = docs.withColumn(
        "text", F.upper(F.concat(F.lit(" "), F.col("text"), F.lit("  ")))
    )
    fp1 = {r.doc_id: (r.digest, r.shingle_fp) for r in T.with_fingerprint(docs).collect()}
    fp2 = {r.doc_id: (r.digest, r.shingle_fp) for r in T.with_fingerprint(noisy).collect()}
    assert fp1 == fp2


# ---------------------------------------------------------------------------
# UDTF chunking
# ---------------------------------------------------------------------------


def test_chunker_reassembles_to_normalized_text(spark, docs):
    from explora_kafka_spark.operators import udtfs as U

    chunks = U.chunk_documents(spark, docs).collect()
    by_doc: dict[int, list] = {}
    for r in chunks:
        assert 1 <= r.n_tokens <= U.CHUNK_TOKENS
        by_doc.setdefault(r.doc_id, []).append(r)
    # chunks reassemble to the whitespace-normalized document
    import pyspark.sql.functions as F

    norm = {
        r.doc_id: " ".join(r.text.strip().lower().split())
        for r in docs.collect()
    }
    for doc_id, rs in by_doc.items():
        rs.sort(key=lambda r: r.chunk_idx)
        assert [r.chunk_idx for r in rs] == list(range(len(rs)))
        assert " ".join(r.chunk for r in rs) == norm[doc_id]
    assert set(by_doc) == set(norm)


def test_quantization_error_bound(emb):
    rows = S.quantization_error(emb).collect()
    assert len(rows) == emb.count()
    for r in rows:
        assert r.max_abs_err <= r.scale / 2 + 1e-9


def test_quantized_values_fit_int8(emb):
    q = S.quantize_int8(emb).collect()
    for r in q:
        assert all(-127 <= v <= 127 for v in r.q)


def test_bpe_pretokenizer_cross_engine_agreement(spark):
    """BPE_PRETOKEN_RE must tokenize identically under Java regex (Spark)
    and RE2 (DuckDB) — the lookahead-free pattern guarantee the oracle
    relies on. Probed on contraction/punctuation/number edge cases."""
    import duckdb

    texts = [
        "it's a well-known fact, isn't it? 42 times over...",
        "  multiple   spaces\tand\nnewlines  ",
        "we'll re-try: pre-2024 costs $3.50!",
        "",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [r.toks for r in df.select(T.bpe_tokens_col("text").alias("toks")).collect()]
    con = duckdb.connect()
    pat = T.BPE_PRETOKEN_RE.replace("'", "''")
    want = [
        con.execute(
            "SELECT regexp_extract_all("
            f"trim(regexp_replace(lower(?), '\\s+', ' ', 'g')), '{pat}')",
            [t],
        ).fetchone()[0]
        for t in texts
    ]
    assert got == want


def test_ann_ivf_shape_and_recall(emb):
    """IVF: ≤k ranked neighbors per query, sims in [-1,1], and the
    nprobe=all limit degenerates to the exact brute-force answer (with
    every list probed, rerank covers the whole corpus)."""
    rows = S.ann_topk_ivf(emb, query_mod=100, k=3).collect()
    assert rows
    per_q = {}
    for r in rows:
        assert -1.0 <= r.sim <= 1.0
        per_q.setdefault(r.query_id, []).append(r.rank)
    assert all(ranks == list(range(1, len(ranks) + 1))
               for ranks in per_q.values())
    n = emb.count()
    exhaustive = S.ann_topk_ivf(emb, query_mod=100, k=3, nprobe=n)
    brute = S.ann_topk_brute(emb, query_mod=100, k=3)
    got = {(r.query_id, r.neighbor_id, r.rank) for r in exhaustive.collect()}
    want = {(r.query_id, r.neighbor_id, r.rank) for r in brute.collect()}
    assert got == want


def test_ann_ivf_filtered_respects_predicate(emb):
    """Filtered IVF: every returned neighbor passes the label predicate;
    an all-labels filter degenerates to the unfiltered answer (same
    quantizer, same probes, so list geometry is identical)."""
    labels = [0, 1, 2]
    rows = S.ann_topk_ivf(emb, query_mod=100, k=3,
                          neighbor_labels=labels).collect()
    assert rows
    allowed = {
        r.vec_id for r in
        emb.filter(emb.label.isin(labels)).select("vec_id").collect()
    }
    assert all(r.neighbor_id in allowed for r in rows)
    every = sorted({r.label for r in emb.select("label").collect()})
    full = S.ann_topk_ivf(emb, query_mod=100, k=3, neighbor_labels=every)
    plain = S.ann_topk_ivf(emb, query_mod=100, k=3)
    got = {(r.query_id, r.neighbor_id, r.rank) for r in full.collect()}
    want = {(r.query_id, r.neighbor_id, r.rank) for r in plain.collect()}
    assert got == want


# ---------------------------------------------------------------------------
# dedup groups (connected components)
# ---------------------------------------------------------------------------


def test_connected_components_transitive_chain(spark):
    # chain 1-2-3 plus isolated 4: labels must propagate transitively
    nodes = spark.createDataFrame([(1,), (2,), (3,), (4,)], ["doc_id"])
    edges = spark.createDataFrame([(1, 2), (2, 3)], ["doc_a", "doc_b"])
    got = {r["doc_id"]: r["group_id"]
           for r in D.connected_components(nodes, edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 4}


def test_connected_components_two_components(spark):
    nodes = spark.createDataFrame([(i,) for i in range(1, 8)], ["doc_id"])
    # component {1,2,3}, component {5,6,7} (edge order reversed on one)
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (6, 5), (7, 6)], ["doc_a", "doc_b"])
    got = {r["doc_id"]: r["group_id"]
           for r in D.connected_components(nodes, edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 5, 7: 5}


def test_dedup_groups_labels_every_doc_with_component_min(docs):
    out = D.dedup_groups(docs, threshold=0.6, shingle_n=2, num_bands=8)
    rows = out.collect()
    assert len(rows) == docs.count()
    # group_id is always ≤ doc_id (min-label) and refers to a real doc
    ids = {r["doc_id"] for r in rows}
    for r in rows:
        assert r["group_id"] <= r["doc_id"]
        assert r["group_id"] in ids


def test_dedup_groups_est_prefilter_loses_no_edges(docs):
    # the threshold-0.35 margin must not drop any true >=0.6 edge on the
    # test corpus: compare the exact edge set with and without prefilter
    full = {(r["doc_a"], r["doc_b"]) for r in
            D.ngram_jaccard_pairs(docs, shingle_n=2, num_bands=8)
            .filter(F.col("jaccard") >= 0.6).select("doc_a", "doc_b").collect()}
    pre = {(r["doc_a"], r["doc_b"]) for r in
           D.ngram_jaccard_pairs(docs, shingle_n=2, num_bands=8, min_est=0.25)
           .filter(F.col("jaccard") >= 0.6).select("doc_a", "doc_b").collect()}
    assert pre == full


def test_connected_components_raises_on_non_convergence(spark):
    # a 4-node path needs 3 propagation rounds; cap at 1 must raise
    # rather than return half-propagated labels
    nodes = spark.createDataFrame([(i,) for i in range(1, 5)], ["doc_id"])
    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], ["doc_a", "doc_b"])
    with pytest.raises(RuntimeError, match="did not converge"):
        # driver_threshold=0 forces the distributed path — the adaptive
        # union-find fallback handles any graph without iterating
        D.connected_components(nodes, edges, max_iterations=1,
                               driver_threshold=0)


def test_connected_components_matches_union_find_on_random_graph(spark):
    # 2000 nodes, 1500 deterministic pseudo-random edges: the distributed
    # min-label propagation must agree with a trivial union-find
    import hashlib

    n = 2000
    edges_py = []
    for i in range(1500):
        h = hashlib.md5(f"edge{i}".encode()).hexdigest()
        a, b = int(h[:8], 16) % n, int(h[8:16], 16) % n
        if a != b:
            edges_py.append((a, b))

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges_py:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {}
    for x in range(n):
        r = find(x)
        # canonical label = min node of the component
        expected.setdefault(r, []).append(x)
    want = {x: min(members) for r, members in expected.items() for x in members}

    nodes = spark.createDataFrame([(i,) for i in range(n)], ["doc_id"])
    edges = spark.createDataFrame(edges_py, ["doc_a", "doc_b"])
    got = {r["doc_id"]: r["group_id"]
           for r in D.connected_components(nodes, edges,
                                           driver_threshold=0).collect()}
    assert got == want


def test_ann_ivf_indexed_equals_direct(spark, tmp_path):
    """Serving from the materialized IVF index must reproduce the direct
    computation row-for-row (same centroids, assignment, tie-breaks)."""
    from explora_kafka_spark.operators import similarity as S
    from explora_kafka_spark.sources.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    S.build_ivf_index(emb, str(tmp_path / "ivf"))
    direct = S.ann_topk_ivf(emb).collect()
    indexed = S.ann_topk_ivf_indexed(spark, str(tmp_path / "ivf")).collect()
    assert [tuple(r) for r in direct] == [tuple(r) for r in indexed]


def test_ann_ivf_quantized_equals_float_path(spark, tmp_path):
    """int8 candidate ranking + full-precision rerank reproduces the
    float serving path row-for-row (rerank depth 4k absorbs any
    quantized-rank reshuffling on this corpus)."""
    from explora_kafka_spark.operators import similarity as S
    from explora_kafka_spark.sources.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    S.build_ivf_index(emb, str(tmp_path / "ivf"))
    S.build_ivf_index_quantized(emb, str(tmp_path / "ivfq"))
    flt = S.ann_topk_ivf_indexed(spark, str(tmp_path / "ivf")).collect()
    qnt = S.ann_topk_ivf_quantized(spark, str(tmp_path / "ivfq")).collect()
    assert [tuple(r) for r in flt] == [tuple(r) for r in qnt]


def test_ivf_quantized_index_layout(spark, tmp_path):
    """qlists carry int8-range vectors + 9dp scale + the full vector,
    hive-partitioned by cid; dequantization error bounded by scale/2."""
    from pyspark.sql import functions as F
    from explora_kafka_spark.operators import similarity as S
    from explora_kafka_spark.sources.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    S.build_ivf_index_quantized(emb, str(tmp_path / "ivfq"))
    ql = spark.read.parquet(str(tmp_path / "ivfq" / "qlists"))
    assert {"neighbor_id", "q", "scale", "n_emb", "cid"} <= set(ql.columns)
    assert ql.count() == emb.count()
    out_of_range = ql.filter(F.expr(
        "exists(q, v -> v < -127 OR v > 127)")).count()
    assert out_of_range == 0
    # |x - q*scale| <= scale/2 + rounding slack on the stored 9dp scale
    bad = ql.filter(F.expr(
        "aggregate(zip_with(CAST(n_emb AS ARRAY<DOUBLE>), q,"
        " (x, qv) -> abs(x - qv * scale)), CAST(0 AS DOUBLE),"
        " (acc, v) -> greatest(acc, v)) > scale / 2 + 1e-6")).count()
    assert bad == 0


def test_ann_pq_full_rerank_equals_exact_bruteforce(spark):
    """With rerank >= n-1 every candidate reaches the exact stage, so PQ
    must reproduce exact integer-µunit L2 top-k regardless of code
    quality — isolates the rerank/tie-break machinery from the
    quantizer."""
    from explora_kafka_spark.operators import similarity as S
    from explora_kafka_spark.sources.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    rows = emb.collect()
    mu = {r["vec_id"]: [int(__import__("math").floor(float(x) * 1e6 + 0.5))
                        for x in r["embedding"]] for r in rows}
    want = []
    for qid in sorted(v for v in mu if v % 50 == 0):
        d2s = sorted(
            (sum((a - b) * (a - b) for a, b in zip(mu[qid], mu[nid])), nid)
            for nid in mu if nid != qid)
        want += [(qid, nid, d2, i + 1) for i, (d2, nid) in
                 enumerate(d2s[:5])]
    got = [tuple(r) for r in
           S.ann_topk_pq(emb, rerank=len(rows)).collect()]
    assert got == want


def test_ann_pq_deterministic_under_repartition(spark):
    from explora_kafka_spark.operators import similarity as S
    from explora_kafka_spark.sources.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    a = [tuple(r) for r in S.ann_topk_pq(emb).collect()]
    b = [tuple(r) for r in S.ann_topk_pq(emb.repartition(13)).collect()]
    assert a == b


def test_tune_nprobe_monotone_and_chooses_smallest(spark):
    """Recall is monotone non-decreasing in nprobe (with exact reranking,
    per-query hits = |brute_topk ∩ probed lists|), the last rung (probe
    everything) is exact, and `chosen` marks exactly the smallest rung
    meeting the target."""
    from explora_kafka_spark.operators import similarity as S
    from explora_kafka_spark.sources.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    rows = S.tune_nprobe(emb, target_recall=0.9).collect()
    assert rows == sorted(rows, key=lambda r: r["nprobe"])
    recalls = [r["mean_recall"] for r in rows]
    assert recalls == sorted(recalls), "recall must be monotone in nprobe"
    assert recalls[-1] == 1.0, "nprobe = n_lists probes everything → exact"
    chosen = [r for r in rows if r["chosen"]]
    assert len(chosen) == 1
    feasible = [r["nprobe"] for r in rows if r["mean_recall"] >= 0.9]
    assert chosen[0]["nprobe"] == min(feasible)
    for r in rows:
        assert r["meets_target"] == (r["mean_recall"] >= 0.9)


def test_tune_nprobe_rungs_match_direct_audit(spark):
    """Each rung's mean recall equals the standalone ann_recall_ivf run at
    that nprobe (the shared-scan rewrite must stay result-identical)."""
    from explora_kafka_spark.operators import similarity as S
    from explora_kafka_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, SF_DIR, "embeddings")
    rows = {r["nprobe"]: r["mean_recall"]
            for r in S.tune_nprobe(emb, candidates=[1, 4]).collect()}
    for p in (1, 4):
        direct = (
            S.ann_recall_ivf(emb, nprobe=p)
            .agg(F.round(F.avg("recall_at_k"), 6).alias("m"))
            .collect()[0]["m"]
        )
        assert rows[p] == direct, (p, rows[p], direct)


# ---------------------------------------------------------------------------
# incremental near-dup index (build_dedup_index + dedup_check)
# ---------------------------------------------------------------------------


def test_dedup_check_self_parity_with_oneshot(spark, docs, tmp_path):
    """Checking the corpus against its own index must yield exactly the
    one-shot lsh_candidate_pairs, once per orientation, with identical
    est_jaccard."""
    D.build_dedup_index(docs, str(tmp_path))
    check = D.dedup_check(spark, docs, str(tmp_path)).collect()
    oneshot = D.dedup_near(docs).collect()
    exp = {}
    for r in oneshot:
        exp[(r["doc_a"], r["doc_b"])] = r["est_jaccard"]
        exp[(r["doc_b"], r["doc_a"])] = r["est_jaccard"]
    got = {(r["doc_id"], r["match_id"]): r["est_jaccard"] for r in check}
    assert got == exp


def test_dedup_check_excludes_unindexed_and_self(spark, docs, tmp_path):
    """A batch overlapping the indexed corpus never matches itself, and
    never matches docs outside the index."""
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    D.build_dedup_index(corpus, str(tmp_path))
    batch = docs  # includes the indexed half
    out = D.dedup_check(spark, batch, str(tmp_path)).collect()
    for r in out:
        assert r["match_id"] % 2 == 0       # only indexed docs match
        assert r["doc_id"] != r["match_id"]  # never self


def test_dedup_check_no_cartesian_plan(spark, docs, tmp_path):
    D.build_dedup_index(docs, str(tmp_path))
    plan = _physical_plan(D.dedup_check(spark, docs, str(tmp_path)))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------------------------
# char entropy (perplexity proxy)
# ---------------------------------------------------------------------------


def test_char_entropy_extremes(spark):
    """Single repeated char -> 0 bits; uniform 4-char alphabet -> 2 bits;
    empty text -> 0 with zero counts."""
    rows = [(1, "aaaaaaaa"), (2, "abcdabcdabcdabcd"), (3, "")]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in T.char_entropy(docs).collect()}
    assert out[1]["char_entropy"] == 0.0
    assert out[1]["n_distinct_chars"] == 1
    assert out[2]["char_entropy"] == 2.0
    assert out[3]["n_chars_used"] == 0
    assert out[3]["n_distinct_chars"] == 0
    assert out[3]["char_entropy"] == 0.0


def test_char_entropy_prefix_cap(spark):
    """Only the first max_chars count: junk beyond the cap is invisible."""
    docs = spark.createDataFrame(
        [(1, "aaaa" + "z" * 100)], "doc_id bigint, text string")
    out = T.char_entropy(docs, max_chars=4).collect()[0]
    assert out["n_chars_used"] == 4
    assert out["n_distinct_chars"] == 1
    assert out["char_entropy"] == 0.0


def test_char_entropy_shuffle_free_plan(spark, docs):
    # the signal is a pure projection: the only exchange in the plan is
    # the final orderBy's range partitioning (driver-gate row stability)
    plan = _physical_plan(T.char_entropy(docs))
    assert "Exchange hashpartitioning" not in plan


# ---------------------------------------------------------------------------
# inverted index (term postings)
# ---------------------------------------------------------------------------


def test_term_postings_counts(spark):
    from explora_kafka_spark.operators.postings import term_postings
    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "a c"), (3, "c c c")],
        "doc_id bigint, text string")
    rows = {(r["term"], r["doc_id"]): r
            for r in term_postings(docs).collect()}
    assert rows[("a", 1)]["tf"] == 2 and rows[("a", 2)]["tf"] == 1
    assert rows[("a", 1)]["df"] == 2 and rows[("a", 1)]["cf"] == 3
    assert rows[("b", 1)]["df"] == 1
    assert rows[("c", 3)]["tf"] == 3 and rows[("c", 3)]["cf"] == 4
    # min_df prunes hapax terms
    pruned = {r["term"] for r in term_postings(docs, min_df=2).collect()}
    assert pruned == {"a", "c"}


def test_term_postings_consistency_with_token_frequency(spark, docs):
    """cf summed over the vocabulary == total corpus token count from
    the token_frequencies operator (same normalization)."""
    from explora_kafka_spark.operators.postings import term_postings
    post = term_postings(docs)
    cf_total = (post.select("term", "cf").distinct()
                .agg(F.sum("cf")).collect()[0][0])
    tf_total = (T.token_frequencies(docs)
                .agg(F.sum("freq")).collect()[0][0])
    assert cf_total == tf_total


# ---------------------------------------------------------------------------
# dedup LSH quality audit
# ---------------------------------------------------------------------------


def test_dedup_recall_audit_bounds_and_consistency(spark, docs):
    r = D.dedup_recall_audit(docs, jaccard_min=0.3, sample_mod=5,
                             shingle_n=2, num_bands=8).collect()
    assert len(r) == 1
    row = r[0]
    assert row["n_hits"] <= row["n_true_pairs"]
    assert row["n_hits"] <= row["n_candidates"]
    if row["n_true_pairs"] > 0:
        assert 0.0 <= row["recall"] <= 1.0
    if row["n_candidates"] > 0:
        assert 0.0 <= row["precision"] <= 1.0


def test_dedup_recall_is_one_when_bands_are_rows(spark):
    """num_bands = num_hashes -> every band is a single hash row, so an
    exact-duplicate pair ALWAYS collides in every band: recall over
    exact-duplicate ground truth (jaccard_min=1.0) must be 1.0."""
    rows = [(i * 5, f"alpha bravo charlie delta echo doc{i % 3}")
            for i in range(12)]  # ids multiples of 5 -> all sampled; 3 groups of exact dups
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = D.dedup_recall_audit(
        docs, jaccard_min=1.0, sample_mod=5,
        num_hashes=16, num_bands=16).collect()[0]
    assert out["n_true_pairs"] > 0
    assert out["recall"] == 1.0


# ---------------------------------------------------------------------------
# corpus-LM perplexity (unigram cross-entropy)
# ---------------------------------------------------------------------------


def test_unigram_bits_uniform_corpus(spark):
    """Four docs, four equally-frequent tokens: every token costs
    -log2((c+1)/(T+V)) with c=2, T=8, V=4 -> log2(4) = 2 bits."""
    rows = [(1, "aa bb"), (2, "cc dd"), (3, "aa cc"), (4, "bb dd")]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = T.unigram_bits(docs).collect()
    assert all(r["bits_per_token"] == 2.0 for r in out)


def test_unigram_bits_rare_words_score_higher(spark):
    """A doc of corpus-rare words costs more bits/token than a doc of
    corpus-common words."""
    rows = [(i, "common words appear here") for i in range(9)]
    rows.append((9, "xylophone quux zorble"))
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"]: r["bits_per_token"]
           for r in T.unigram_bits(docs).collect()}
    assert out[9] > out[0]


def test_unigram_bits_empty_doc_null(spark):
    docs = spark.createDataFrame(
        [(1, "some words"), (2, "")], "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in T.unigram_bits(docs).collect()}
    assert out[2]["n_tokens"] == 0
    assert out[2]["bits_per_token"] is None


def test_unigram_bits_deterministic_under_repartition(spark, docs):
    a = T.unigram_bits(docs).collect()
    b = T.unigram_bits(docs.repartition(13)).collect()
    assert a == b


def test_bpe_pair_counts_hand_example(spark):
    """'ab ab b' -> vocab {ab:2, b:1}; only pair (a,b) with weight 2."""
    docs = spark.createDataFrame(
        [(1, "ab ab b")], "doc_id bigint, text string")
    rows = T.bpe_pair_counts(docs).collect()
    assert [(r["left"], r["right"], r["pair_count"]) for r in rows] == \
        [("a", "b", 2)]


def test_bpe_pair_counts_weighted_by_word_freq(spark):
    """pair weight = word freq x in-word occurrences, summed over vocab."""
    docs = spark.createDataFrame(
        [(1, "aaa aa aaa")], "doc_id bigint, text string")
    rows = {(r["left"], r["right"]): r["pair_count"]
            for r in T.bpe_pair_counts(docs).collect()}
    # 'aaa' (freq 2) has two 'aa' pairs, 'aa' (freq 1) has one -> 5
    assert rows[("a", "a")] == 5


def _bpe_merge_rows(df):
    return [(r["merge_idx"], r["left"], r["right"], r["pair_count"])
            for r in df.orderBy("merge_idx").collect()]


def test_bpe_merges_hand_example(spark):
    """'aaab aaab b' -> vocab {aaab:2, b:1}. Hand trace:
    it0: pairs (a,a)x2 per word -> 4, (a,b) -> 2; merge (a,a,4); greedy
         left-to-right turns [a,a,a,b] into [aa,a,b] (overlap resolved
         leftmost-first).
    it1: (aa,a) -> 2 ties (a,b) -> 2; tie-break (left,right) asc picks
         (a,b,2); [aa,a,b] -> [aa,ab].
    it2: (aa,ab,2) -> [aaab].
    it3: no pairs left -> early stop (3 rows even with n_merges=5)."""
    docs = spark.createDataFrame(
        [(1, "aaab aaab b")], "doc_id bigint, text string")
    got = _bpe_merge_rows(T.bpe_merges(docs, n_merges=5))
    assert got == [(0, "a", "a", 4), (1, "a", "b", 2), (2, "aa", "ab", 2)]


def test_bpe_merges_same_char_run_greedy(spark):
    """'aaaa' under merge (a,a): greedy gives [aa,aa] (not [aa,a,a] or
    a re-merged [aaa,...]) -> second merge is (aa,aa)."""
    docs = spark.createDataFrame(
        [(1, "aaaa aaaa")], "doc_id bigint, text string")
    got = _bpe_merge_rows(T.bpe_merges(docs, n_merges=2))
    assert got[0] == (0, "a", "a", 6)  # 3 overlapping pairs x freq 2
    assert got[1] == (1, "aa", "aa", 2)


def test_bpe_encode_hand_example(spark):
    """n=1 on 'aaab aaab b': merge (a,a) -> aaab=[aa,a,b] (3 pieces),
    b=[b]; doc = 3+3+1 = 7 pieces over 3 words."""
    docs = spark.createDataFrame(
        [(1, "aaab aaab b")], "doc_id bigint, text string")
    rows = T.bpe_encode(docs, n_merges=1).collect()
    assert [(r["doc_id"], r["n_pieces"], r["n_words"],
             r["pieces_per_word"]) for r in rows] == [(1, 7, 3, 2.333333)]


def test_bpe_encode_fully_merged_is_one_piece_per_word(spark):
    """Enough merges collapse every vocab word to a single piece, and
    the early-exhaustion path agrees between both engines."""
    import duckdb

    docs = spark.createDataFrame(
        [(1, "aaab aaab b"), (2, "b aaab")], "doc_id bigint, text string")
    got = [(r["doc_id"], r["n_pieces"], r["n_words"], r["pieces_per_word"])
           for r in T.bpe_encode(docs, n_merges=10).collect()]
    assert got == [(1, 3, 3, 1.0), (2, 2, 2, 1.0)]
    con = duckdb.connect()
    con.execute("""
        CREATE VIEW documents AS
        SELECT * FROM (VALUES (1, 'aaab aaab b'), (2, 'b aaab'))
            AS t(doc_id, text)
    """)
    want = con.execute(T.bpe_encode_sql("documents", 10)).fetchall()
    assert got == [tuple(r) for r in want]


def test_bpe_merges_sql_parity_tiny_corpus(spark):
    """The unrolled-CTE DuckDB oracle reproduces the Spark loop exactly,
    including the early-exhaustion path (both emit 3 rows for n=5)."""
    import duckdb

    con = duckdb.connect()
    con.execute("""
        CREATE VIEW documents AS
        SELECT * FROM (VALUES (1, 'aaab aaab b'), (2, 'low lower low'))
            AS t(doc_id, text)
    """)
    want = con.execute(T.bpe_merges_sql("documents", 5)).fetchall()
    docs = spark.createDataFrame(
        [(1, "aaab aaab b"), (2, "low lower low")],
        "doc_id bigint, text string")
    got = _bpe_merge_rows(T.bpe_merges(docs, n_merges=5))
    assert got == [tuple(r) for r in want]
    assert len(got) == 5  # the second doc keeps merges available


def test_bm25_ranking_properties(spark):
    """Coverage beats partial matches, rare terms outweigh common ones,
    longer docs are length-penalized, and ranking is repartition-stable."""
    from explora_kafka_spark.operators import postings as PST

    docs = spark.createDataFrame(
        [
            (1, "cat dog fish"),          # all three terms
            (2, "cat dog bird bird"),     # two terms, longer
            (3, "cat bird bird bird"),    # one common term
            (4, "fish stone stone"),      # one RARE term
            (5, "stone stone stone"),     # no query term
        ],
        "doc_id bigint, text string",
    )
    out = PST.bm25_search(docs, ["cat", "dog", "fish"], top_k=5).collect()
    ranked = [r["doc_id"] for r in out]
    assert 5 not in ranked, "docs without query terms never score"
    assert ranked[0] == 1, "full coverage ranks first"
    hits = {r["doc_id"]: r["n_terms_hit"] for r in out}
    assert hits[1] == 3 and hits[2] == 2 and hits[3] == 1 and hits[4] == 1
    scores = {r["doc_id"]: r["score"] for r in out}
    # 'fish' (df=2) is rarer than 'cat' (df=3): one fish hit in an
    # equal-length doc beats one cat hit in a longer doc on both counts
    assert scores[4] > scores[3]
    again = PST.bm25_search(
        docs.repartition(7), ["cat", "dog", "fish"], top_k=5).collect()
    assert [tuple(r) for r in out] == [tuple(r) for r in again]


def test_ann_ivfpq_exhaustive_settings_equal_exact_bruteforce(spark, tmp_path):
    """nprobe = every list and rerank = n: IVF-PQ degenerates to exact
    integer-L2 brute force — isolates probe/ADC/rerank mechanics from
    quantizer quality (the ann_topk_pq full-rerank precedent)."""
    import math

    from explora_kafka_spark.operators import similarity as S
    from explora_kafka_spark.sources.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    n = emb.count()
    S.build_ivfpq_index(emb, str(tmp_path / "ivfpq"))
    rows = emb.collect()
    mu = {r["vec_id"]: [int(math.floor(float(x) * 1e6 + 0.5))
                        for x in r["embedding"]] for r in rows}
    want = []
    for qid in sorted(v for v in mu if v % 50 == 0):
        d2s = sorted(
            (sum((a - b) * (a - b) for a, b in zip(mu[qid], mu[nid])), nid)
            for nid in mu if nid != qid)
        want += [(qid, nid, d2, i + 1) for i, (d2, nid) in
                 enumerate(d2s[:5])]
    got = [tuple(r) for r in S.ann_topk_ivfpq(
        spark, str(tmp_path / "ivfpq"), nprobe=n, rerank=n).collect()]
    assert got == want


def test_bigram_bits_order_sensitivity_and_edges(spark):
    """Natural repeated order scores lower than the same words shuffled
    (the fluency gap unigram_bits cannot see); docs with < 2 tokens get
    NULL; uniform repeated bigram costs its exact smoothed bits."""
    docs = spark.createDataFrame(
        [
            (1, "a b a b a b a b"),   # one dominant transition pattern
            (2, "a a b b b a a b"),   # same words, broken order
            (3, "only"),
            (4, ""),
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in T.bigram_bits(docs).collect()}
    assert out[3]["n_bigrams"] == 0 and out[3]["bits_per_bigram"] is None
    assert out[4]["n_bigrams"] == 0 and out[4]["bits_per_bigram"] is None
    assert out[1]["n_bigrams"] == 7 and out[2]["n_bigrams"] == 7
    assert out[1]["bits_per_bigram"] < out[2]["bits_per_bigram"]


def test_bigram_bits_deterministic_under_repartition(spark, docs):
    a = T.bigram_bits(docs).collect()
    b = T.bigram_bits(docs.repartition(11)).collect()
    assert a == b


def test_ann_ivfpq_external_queries_serve_without_self_exclusion_loss(
        spark, tmp_path):
    """External queries (ids disjoint from the index) retrieve their
    source vector as the exact nearest neighbor when unperturbed — the
    guard that the query_id != neighbor_id filter never eats a true
    neighbor for external ids."""
    from pyspark.sql import functions as F
    from explora_kafka_spark.operators import similarity as S
    from explora_kafka_spark.sources.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    S.build_ivfpq_index(emb, str(tmp_path / "ivfpq"))
    ext = emb.filter(F.col("vec_id") % 50 == 0).select(
        (F.col("vec_id") + S.EXTERNAL_QUERY_ID_SHIFT).alias("query_id"),
        F.expr("transform(embedding, v -> CAST(v AS DOUBLE))")
        .alias("q_emb"))
    n = emb.count()
    out = S.ann_topk_ivfpq(spark, str(tmp_path / "ivfpq"), queries=ext,
                           nprobe=n, rerank=n).collect()
    top1 = {r["query_id"]: (r["neighbor_id"], r["d2"])
            for r in out if r["rank"] == 1}
    for qid, (nid, d2) in top1.items():
        assert nid == qid - S.EXTERNAL_QUERY_ID_SHIFT
        assert d2 == 0


def test_tokenizer_fertility_is_corpus_ratio_per_lang(spark, docs):
    import duckdb

    out = {r["lang"]: r for r in T.tokenizer_fertility(docs).collect()}
    # every language present, counts consistent, ratio = sums ratio
    per_doc = docs.select(
        "lang",
        F.size(T.tokens_col("text")).alias("ws"),
        F.size(T.bpe_tokens_col("text")).alias("bp"),
    ).groupBy("lang").agg(F.sum("ws").alias("ws"),
                          F.sum("bp").alias("bp")).collect()
    for r in per_doc:
        row = out[r["lang"]]
        assert row["n_ws_tokens"] == r["ws"]
        assert row["n_bpe_tokens"] == r["bp"]
        assert row["fertility"] == round(r["bp"] / max(r["ws"], 1), 6)
    # zh strings fragment as opaque runs -> fewer pieces per ws token
    # than en word-splitting would produce; both must be positive
    assert out["en"]["fertility"] > 0
    # oracle parity
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM"
                f" '{SF_DIR}/documents.parquet'")
    want = [(a, int(b), int(c), int(d), float(e)) for a, b, c, d, e in
            con.execute(T.tokenizer_fertility_sql()).fetchall()]
    got = [(r["lang"], r["n_docs"], r["n_ws_tokens"], r["n_bpe_tokens"],
            r["fertility"])
           for r in T.tokenizer_fertility(docs).collect()]
    assert got == want


def test_recall_drift_stale_vs_appended_index(spark, emb, tmp_path):
    """The staleness audit prices exactly what the append repairs: on
    an index missing the delta slice, n_truth_unindexed counts true
    top-k neighbors the index has never seen; after update_ivf_index
    appends the delta, the same audit reports every truth row indexed
    and recall can only improve per query."""
    idx = str(tmp_path / "ivf")
    base = emb.filter(F.col("vec_id") % 10 != 0)
    delta = emb.filter(F.col("vec_id") % 10 == 0)
    S.build_ivf_index(base, idx)
    stale = {r["query_id"]: r
             for r in S.ann_recall_drift(spark, emb, idx).collect()}
    # the fixture's replica structure makes some true neighbors delta
    # members -> the stale index must show unrecoverable loss somewhere
    assert sum(r["n_truth_unindexed"] for r in stale.values()) > 0
    S.update_ivf_index(spark, delta, idx)
    fresh = {r["query_id"]: r
             for r in S.ann_recall_drift(spark, emb, idx).collect()}
    assert set(fresh) == set(stale)
    assert all(r["n_truth_unindexed"] == 0 for r in fresh.values())
    # monotone: an appended vector can only displace a stale hit if it
    # outranks it under the shared (sim desc, id) order — in which
    # case it is itself a truth member
    assert all(fresh[q]["recall_at_k"] >= stale[q]["recall_at_k"]
               for q in stale)


def test_serve_ivf_indexed_matches_internal_queries(spark, emb, tmp_path):
    """serve_ivf_indexed with the index's own % 50 rows as the external
    query batch must reproduce ann_topk_ivf_indexed exactly (the
    refactor contract: one serving path, two query sources)."""
    idx = str(tmp_path / "ivf")
    S.build_ivf_index(emb, idx)
    queries = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"))
    a = [tuple(r) for r in S.ann_topk_ivf_indexed(spark, idx).collect()]
    b = [tuple(r) for r in
         S.serve_ivf_indexed(spark, idx, queries).collect()]
    assert a == b and len(a) > 0


def test_ivf_list_stats_tracks_append_skew(spark, emb, tmp_path):
    """The load audit prices what appends accumulate: a batch of
    vectors parallel to ONE existing row all land in that row's list,
    raising exactly its count; totals re-normalize; invariants hold
    (sum of counts = indexed rows, mean load = 1e6 by construction)."""
    idx = str(tmp_path / "ivf")
    S.build_ivf_index(emb, idx)
    before = {r["cid"]: r["n_vectors"]
              for r in S.ivf_list_stats(spark, idx).collect()}
    n0 = emb.count()
    assert sum(before.values()) == n0
    q0 = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    hot = spark.createDataFrame(
        [(10_000_000 + i, [float(x) for x in q0]) for i in range(8)],
        "vec_id bigint, embedding array<float>")
    S.update_ivf_index(spark, hot, idx)
    after = {r["cid"]: r for r in S.ivf_list_stats(spark, idx).collect()}
    assert sum(r["n_vectors"] for r in after.values()) == n0 + 8
    grown = {c for c in after
             if after[c]["n_vectors"] != before.get(c, 0)}
    assert len(grown) == 1  # identical vectors share one nearest list
    hot_cid = grown.pop()
    assert after[hot_cid]["n_vectors"] == before[hot_cid] + 8
    # load_ppm: n·L·1e6 DIV total, exactly
    L = len(after)
    for c, r in after.items():
        assert r["load_ppm"] == r["n_vectors"] * L * 1_000_000 // (n0 + 8)


def test_update_ivf_index_serves_new_vectors(spark, emb, tmp_path):
    """The IVF lifecycle: append a new vector via the STORED centroids
    and the indexed serving path finds it — near-identical direction
    to query 0 must surface in query 0's top-k after the update."""
    idx = str(tmp_path / "ivf")
    S.build_ivf_index(emb, idx)
    q0 = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    new = spark.createDataFrame(
        [(999999, [float(x) * 0.5 for x in q0])],
        "vec_id bigint, embedding array<float>")
    before = {r["neighbor_id"] for r in S.ann_topk_ivf_indexed(
        spark, idx).filter(F.col("query_id") == 0).collect()}
    assert 999999 not in before
    S.update_ivf_index(spark, new, idx)
    after = S.ann_topk_ivf_indexed(spark, idx) \
        .filter(F.col("query_id") == 0).collect()
    ids = [r["neighbor_id"] for r in after]
    assert 999999 in ids
    # a parallel vector has cosine 1.0 -> it ranks at the very top
    # alongside the query itself
    assert ids[0] in (0, 999999) and 999999 in ids[:2]


def test_dedup_sweep_monotone_and_rung_equivalent(spark, docs):
    sw = {r["min_est_pct"]: (r["n_flagged"], r["n_kept"])
          for r in D.dedup_sweep(docs, shingle_n=2,
                                 num_bands=8).collect()}
    flags = [sw[r][0] for r in sorted(sw)]
    assert all(a >= b for a, b in zip(flags, flags[1:]))  # monotone
    n_docs = docs.count()
    assert all(f + k == n_docs for f, k in sw.values())
    # each rung equals an INDEPENDENT thresholded dedup_near run
    for rung in (30, 50):
        flagged = (D.dedup_near(docs, shingle_n=2, num_bands=8,
                                min_est=rung / 100)
                   .select("doc_b").distinct().count())
        assert sw[rung][0] == flagged


def test_hybrid_search_fuses_both_towers(spark):
    """RRF fusion: a doc ranked by BOTH towers outranks a doc that one
    tower ranks higher but the other misses; fusion is exact-integer
    µunits; ranking is repartition-stable."""
    from explora_kafka_spark.operators import postings as PST

    # text tower: docs 1-3 score on the query terms; doc 4 doesn't
    docs = spark.createDataFrame(
        [
            (1, "cat dog cat dog"),
            (2, "cat dog"),
            (3, "cat stone stone stone"),
            (4, "stone stone"),
        ],
        "doc_id bigint, text string",
    )
    # vector tower (aligned ids): query = vec 0; vec 3 is closest,
    # then 4, then 1; 2 is near-orthogonal
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.6, 0.8]),
            (2, [0.05, 1.0]),
            (3, [0.99, 0.1]),
            (4, [0.9, 0.43]),
        ],
        "vec_id bigint, embedding array<float>",
    )
    out = PST.hybrid_search(docs, emb, ["cat", "dog"], query_id=0,
                            top_k=4, pool=3).collect()
    by_id = {r["doc_id"]: r for r in out}
    # doc 3: in both towers (bm25 rank 3, vec rank 1).
    # doc 4: vector-only (rank 2). doc 3 must outrank doc 4.
    assert by_id[3]["in_bm25"] and by_id[3]["in_vec"]
    assert by_id[4]["in_vec"] and not by_id[4]["in_bm25"]
    assert by_id[3]["rank"] < by_id[4]["rank"]
    # exact integer RRF: doc 3 = 1e6//63 + 1e6//61, doc 4 = 1e6//62
    assert by_id[3]["rrf_mu"] == 1000000 // 63 + 1000000 // 61
    assert by_id[4]["rrf_mu"] == 1000000 // 62
    again = PST.hybrid_search(docs.repartition(5), emb.repartition(3),
                              ["cat", "dog"], query_id=0, top_k=4,
                              pool=3).collect()
    assert [tuple(r) for r in out] == [tuple(r) for r in again]


def test_connected_components_driver_path_equals_distributed(spark):
    """The adaptive small-graph union-find and the distributed
    pointer-jumping loop produce identical min-label components."""
    from explora_kafka_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (30, 10), (50, 50)],
        "doc_a long, doc_b long")
    nodes = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 10, 11, 30, 50, 99]], "doc_id long")
    small = {(r.doc_id, r.group_id) for r in
             connected_components(nodes, edges).collect()}
    big = {(r.doc_id, r.group_id) for r in
           connected_components(nodes, edges,
                                driver_threshold=0).collect()}
    want = {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (30, 10),
            (50, 50), (99, 99)}
    assert small == want and big == want


def test_winnow_fingerprints_hand_example_and_guarantee(spark):
    """Winnowing: shared substrings of length >= w+k-1 share a selected
    fingerprint; rightmost-min tie-break; short docs select their
    global min; deterministic under repartition."""
    from explora_kafka_spark.operators.text import winnow_fingerprints

    base = "the winnowing algorithm selects robust fingerprints"
    docs = spark.createDataFrame(
        [(1, base),
         (2, "PREFIX " + base + " SUFFIX"),   # shares a long substring
         (3, "zz")],                          # shorter than k
        "doc_id bigint, text string")
    out = winnow_fingerprints(docs, k=8, w=4)
    rows = out.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    # guarantee: docs 1 and 2 share at least one fingerprint
    assert by_doc[1] & by_doc[2]
    # doc 3 has no k-gram at all -> no rows
    assert 3 not in by_doc
    # storage is sparse: far fewer fingerprints than k-grams
    assert len(by_doc[1]) < len(base) - 7
    again = winnow_fingerprints(docs.repartition(5), k=8, w=4).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, rows))
    # a doc with >=1 k-gram but fewer than w hashes still selects its
    # global minimum (exactly one fingerprint)
    short = spark.createDataFrame([(9, "abcdefghi")],
                                  "doc_id bigint, text string")
    srows = winnow_fingerprints(short, k=8, w=4).collect()
    assert len(srows) == 1


def test_ann_topk_mmr_diversifies(spark):
    """MMR: a clump of near-duplicates near the query yields ONE
    representative before farther-but-diverse points; plain top-k
    would return the whole clump first."""
    from explora_kafka_spark.operators import similarity as S

    # query at origin-ish; ids 1-3 a tight clump very near the query;
    # ids 10, 11 farther but in different directions
    emb = spark.createDataFrame(
        [(0, [0.0, 0.0]),
         (1, [0.10, 0.0]), (2, [0.11, 0.0]), (3, [0.12, 0.0]),
         (10, [0.0, 0.5]), (11, [-0.5, 0.0])],
        "vec_id bigint, embedding array<float>")
    out = S.ann_topk_mmr(emb, query_id=0, pool=5, k=3).collect()
    ranked = [r.vec_id for r in out]
    # rank 1 = nearest (1); rank 2-3 prefer the diverse far points over
    # the clump-mates 2 and 3
    assert ranked[0] == 1
    assert set(ranked[1:]) == {10, 11}
    # exact integers: rank-1 minred sentinel, others = true d2 to the
    # nearest earlier pick
    assert out[0].minred_mu == -1
    assert all(r.minred_mu > 0 for r in out[1:])


def test_ivf_empty_embeddings_degrades_to_empty(spark):
    """Round-11 self-review guard: an empty embeddings table must yield
    an empty result (the pre-kernel broadcast-join behavior), not a
    driver-side np.stack crash."""
    from explora_kafka_spark.operators import similarity as S

    empty = spark.createDataFrame(
        [], "vec_id bigint, embedding array<float>, label int")
    assert S.ann_topk_ivf(empty, n_rows=0).collect() == []


def test_ivf_zero_vector_centroid_keys_to_zero(spark, tmp_path):
    """Round-11 self-review guard: a centroid whose µunit vector is all
    zeros (|x| < 5e-7) must rank by key 0 (cosine of the zero vector),
    not raise ZeroDivisionError — and the pipeline must still produce
    the right neighbors from the non-degenerate lists."""
    from explora_kafka_spark.operators import similarity as S

    # n=8, n_lists=max(IVF_MIN_LISTS, isqrt(8)); stride puts vec_id 0
    # (the zero vector) on a centroid boundary
    rows = [(0, [0.0, 0.0]), (1, [1.0, 0.1]), (2, [1.0, 0.2]),
            (3, [1.0, 0.3]), (4, [0.9, 0.1]), (5, [0.8, 0.2]),
            (6, [1.0, 0.25]), (7, [0.95, 0.15])]
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id bigint, embedding array<float>")
    out = S.ann_topk_ivf(emb, query_mod=4, k=2, n_rows=8).collect()
    assert len(out) > 0  # ran to completion past the zero centroid
    # index build/serve paths share the guard
    S.build_ivf_index(emb, str(tmp_path / "ivf0"), n_rows=8)
    served = S.ann_topk_ivf_indexed(spark, str(tmp_path / "ivf0"),
                                    query_mod=4, k=2).collect()
    assert len(served) > 0
