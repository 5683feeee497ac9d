"""SemDeDup (operators/semdedup.py): keep-farthest-from-centroid sweep,
exact rational cosine threshold, negative-dot guard, determinism, and
DuckDB oracle parity."""

import duckdb

from explora_kafka_spark.operators.semdedup import (
    build_semantic_index, cluster_top_terms, cluster_top_terms_sql,
    knn_graph, knn_graph_sql, knn_hubness, knn_hubness_sql,
    label_propagation, label_propagation_sql,
    semantic_dedup, semantic_dedup_sql,
    semantic_groups, semantic_groups_sql, semdedup_check,
    semdedup_sweep, semdedup_sweep_sql, update_semantic_index)


def _emb(spark, vecs):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def _verdict(spark, vecs, **kw):
    out = semantic_dedup(_emb(spark, vecs), **kw).collect()
    return {r["vec_id"]: r["keep"] for r in out}


def test_keeps_farthest_representative(spark):
    # two parallel (cos = 1) pairs, one per init centroid (stride 2 ->
    # seeds ids 0 and 2): within each cluster the vector FARTHER from
    # the centroid ranks first and survives; its near-dup is dropped.
    vecs = [[1.0, 0.0], [0.9, 0.0], [0.0, 1.0], [0.0, 0.95]]
    keep = _verdict(spark, vecs, k=2, iters=1, threshold_pct=95)
    assert keep == {0: False, 1: True, 2: False, 3: True}


def test_threshold_is_exact_rational_cosine(spark):
    # cos([1,0],[1,1]) = 1/sqrt(2) = 0.70710..: dropped at t=70%,
    # kept at t=71% — the integer compare flips exactly between them.
    vecs = [[1.0, 0.0], [1.0, 1.0]]
    assert _verdict(spark, vecs, k=1, iters=1, threshold_pct=70) == {
        0: False, 1: True}
    assert _verdict(spark, vecs, k=1, iters=1, threshold_pct=71) == {
        0: True, 1: True}


def test_negative_dot_never_drops(spark):
    # anti-parallel vectors: dot < 0, so |dot|^2 being huge must not
    # fire the squared comparison
    vecs = [[1.0, 0.0], [-1.0, 0.0]]
    assert _verdict(spark, vecs, k=1, iters=1, threshold_pct=50) == {
        0: True, 1: True}


def test_cross_cluster_pairs_never_compared(spark):
    # identical vectors forced into different init clusters (k=2,
    # stride 1 -> seeds ids 0 and 1) are NOT deduped: SemDeDup is
    # cluster-local by construction
    vecs = [[1.0, 0.0], [0.0, 1.0]]
    keep = _verdict(spark, vecs, k=2, iters=1, threshold_pct=95)
    assert keep == {0: True, 1: True}


def test_deterministic_under_repartition(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = semantic_dedup(emb, k=8, iters=2, threshold_pct=30).collect()
    b = semantic_dedup(emb.repartition(13), k=8, iters=2,
                       threshold_pct=30).collect()
    assert a == b


def test_pair_stage_is_cluster_local_kernel(spark, sf_dir):
    # the published recipe's whole point: pairs are generated ONLY
    # within a cluster, never corpus-wide — the pair stage is a
    # per-cid Arrow kernel (FlatMapGroupsInPandas grouped on cid),
    # never a cartesian; the only nested-loop joins in the plan are
    # the kmeans-family keyless centroid broadcasts
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    plan = (semantic_dedup(emb, k=8, iters=2, threshold_pct=30)
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert any("FlatMapGroupsInPandas [cid#" in ln
               for ln in plan.splitlines()), plan


def test_semdedup_check_flags_copies_and_passes_novel(spark, tmp_path):
    # corpus: two orthogonal families; dedup drops the near-copies so
    # the index stores one rep per direction
    corpus = [[1.0, 0.0], [0.9, 0.0], [0.0, 1.0], [0.0, 0.95]]
    build_semantic_index(_emb(spark, corpus), str(tmp_path / "idx"),
                         k=2, iters=1, threshold_pct=95)
    reps = spark.read.parquet(str(tmp_path / "idx/reps"))
    assert sorted(r["vid"] for r in reps.collect()) == [1, 3]
    # batch: a scaled copy of rep 1's direction (dup), a diagonal
    # vector (cos 0.707 < 0.95 to both reps -> novel)
    batch = spark.createDataFrame(
        [(100, [0.5, 0.0]), (101, [1.0, 1.0])],
        "vec_id bigint, embedding array<float>")
    out = {r["vec_id"]: (r["is_dup"], r["match_id"])
           for r in semdedup_check(spark, batch, str(tmp_path / "idx"),
                                   threshold_pct=95).collect()}
    assert out[100] == (True, 1)
    assert out[101] == (False, None)


def test_semdedup_check_deterministic_under_repartition(spark, sf_dir,
                                                        tmp_path):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    build_semantic_index(emb.filter("vec_id < 250"),
                         str(tmp_path / "idx"), k=8, iters=2,
                         threshold_pct=30)
    batch = emb.filter("vec_id >= 250")
    a = semdedup_check(spark, batch, str(tmp_path / "idx"),
                       threshold_pct=30).collect()
    b = semdedup_check(spark, batch.repartition(11),
                       str(tmp_path / "idx"), threshold_pct=30).collect()
    assert a == b
    assert any(r["is_dup"] for r in a)      # real collisions at 30%
    assert any(not r["is_dup"] for r in a)  # and real admissions


def test_cluster_top_terms_labels_clusters(spark):
    # cluster 0 (ids 0,1 near origin-dir) speaks "alpha", cluster 1
    # speaks "bravo"; k=2 stride seeds ids 0 and 2
    emb = _emb(spark, [[1.0, 0.0], [0.9, 0.0], [0.0, 1.0], [0.0, 0.9]])
    docs = spark.createDataFrame(
        [(0, "alpha alpha beta"), (1, "alpha gamma"),
         (2, "bravo bravo delta"), (3, "bravo echo")],
        "doc_id bigint, text string")
    out = cluster_top_terms(docs, emb, k=2, iters=1, top=1).collect()
    got = {r["cluster"]: (r["token"], r["n"]) for r in out}
    assert got == {0: ("alpha", 3), 1: ("bravo", 3)}


def test_cluster_top_terms_matches_duckdb_oracle(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    got = [(r["cluster"], r["rank"], r["token"], r["n"])
           for r in cluster_top_terms(docs, emb, k=8, iters=2).collect()]
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM"
                f" '{sf_dir}/documents.parquet'")
    con.execute("CREATE VIEW embeddings AS SELECT * FROM"
                f" '{sf_dir}/embeddings.parquet'")
    want = [(int(a), int(b), c, int(d)) for a, b, c, d in con.execute(
        cluster_top_terms_sql(k=8, iters=2, n_rows=500)).fetchall()]
    assert got == want


def test_check_audit_identities_and_parity(spark, sf_dir, tmp_path):
    import duckdb

    from explora_kafka_spark.operators.semdedup import (
        semdedup_check_audit, semdedup_check_audit_sql)

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    idx = str(tmp_path / "idx")
    build_semantic_index(emb.filter("vec_id < 250"), idx, k=8, iters=2,
                         threshold_pct=30)
    row = semdedup_check_audit(spark, emb, idx, split_id=250, k=8,
                               iters=2, threshold_pct=30).collect()[0]
    assert row["n_batch"] == 250
    assert row["inc_flagged"] == row["both"] + row["only_incremental"]
    assert row["oneshot_dropped"] == row["both"] + row["only_oneshot"]
    assert row["both"] > 0  # the paths agree on the blatant dups
    con = duckdb.connect()
    con.execute("CREATE VIEW embeddings AS SELECT * FROM"
                f" '{sf_dir}/embeddings.parquet'")
    want = con.execute(semdedup_check_audit_sql(
        split_id=250, k=8, iters=2, threshold_pct=30)).fetchone()
    assert tuple(row) == tuple(int(x) for x in want)


def test_update_semantic_index_admits_novel_then_blocks_rechecks(
        spark, tmp_path):
    corpus = [[1.0, 0.0], [0.0, 1.0]]
    idx = str(tmp_path / "idx")
    build_semantic_index(_emb(spark, corpus), idx, k=2, iters=1,
                         threshold_pct=95)
    # batch: one novel diagonal direction, one dup of rep 0
    batch = spark.createDataFrame(
        [(100, [1.0, 1.0]), (101, [0.8, 0.0])],
        "vec_id bigint, embedding array<float>")
    v1 = {r["vec_id"]: (r["is_dup"], r["match_id"])
          for r in update_semantic_index(spark, batch, idx,
                                         threshold_pct=95).collect()}
    assert v1[100] == (False, None)   # admitted
    assert v1[101] == (True, 0)       # rejected, not appended
    reps = sorted(r["vid"] for r in
                  spark.read.parquet(f"{idx}/reps").collect())
    assert 100 in reps and 101 not in reps
    # a re-check of the same batch now collides with the new rep too
    v2 = {r["vec_id"]: (r["is_dup"], r["match_id"])
          for r in semdedup_check(spark, batch, idx,
                                  threshold_pct=95).collect()}
    assert v2[100] == (True, 100)     # matches itself in the index
    assert v2[101] == (True, 0)


def test_sweep_prices_every_rung_like_semantic_dedup(spark, sf_dir):
    # every sweep row must equal an independent semantic_dedup run at
    # that rung — the shared-scan shortcut may not change semantics
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    sweep = {r["threshold_pct"]: r["n_dropped"]
             for r in semdedup_sweep(emb, k=8, iters=2,
                                     rungs=(20, 30, 40)).collect()}
    for t in (20, 30, 40):
        direct = sum(
            1 for r in semantic_dedup(emb, k=8, iters=2,
                                      threshold_pct=t).collect()
            if not r["keep"])
        assert sweep[t] == direct
    # monotone: higher threshold never drops more
    assert sweep[20] >= sweep[30] >= sweep[40]


def test_sweep_matches_duckdb_oracle(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    got = [(r["threshold_pct"], r["n_dropped"], r["n_kept"])
           for r in semdedup_sweep(emb, k=8, iters=2).collect()]
    con = duckdb.connect()
    con.execute("CREATE VIEW embeddings AS SELECT * FROM"
                f" '{sf_dir}/embeddings.parquet'")
    want = [tuple(int(x) for x in row) for row in con.execute(
        semdedup_sweep_sql(k=8, iters=2, n_rows=500)).fetchall()]
    assert got == want


def test_groups_are_transitively_closed(spark):
    # angles 0deg, 40deg, 80deg in one cluster; t=70%: cos(40deg)=0.766
    # links 0-1 and 1-2, cos(80deg)=0.174 does NOT link 0-2 — the
    # component still merges all three (min-id label 0)
    import math
    vecs = [[math.cos(math.radians(a)), math.sin(math.radians(a))]
            for a in (0, 40, 80)]
    out = {r["vec_id"]: r["group_id"]
           for r in semantic_groups(_emb(spark, vecs), k=1, iters=1,
                                    threshold_pct=70).collect()}
    assert out == {0: 0, 1: 0, 2: 0}


def test_groups_singletons_label_themselves(spark):
    vecs = [[1.0, 0.0], [0.0, 1.0]]  # one cluster, orthogonal
    out = {r["vec_id"]: r["group_id"]
           for r in semantic_groups(_emb(spark, vecs), k=1, iters=1,
                                    threshold_pct=50).collect()}
    assert out == {0: 0, 1: 1}


def test_groups_match_duckdb_oracle(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    got = [(r["vec_id"], r["group_id"])
           for r in semantic_groups(emb, k=8, iters=2,
                                    threshold_pct=30).collect()]
    con = duckdb.connect()
    con.execute("CREATE VIEW embeddings AS SELECT * FROM"
                f" '{sf_dir}/embeddings.parquet'")
    want = [(int(a), int(b)) for a, b in con.execute(
        semantic_groups_sql(k=8, iters=2, threshold_pct=30,
                            n_rows=500)).fetchall()]
    assert got == want
    assert any(v != g for v, g in got)  # real merges at 30%


def test_knn_graph_ranks_cluster_mates_by_distance(spark):
    # one cluster (k_clusters=1): neighbors of id 0 at distances
    # 1, 4, 9 (µunit² ×1e12) -> ranks 1..3; no self-edges
    vecs = [[0.0], [0.1], [0.2], [0.3]]
    out = knn_graph(_emb(spark, vecs), k_clusters=1, iters=1,
                    k=2).collect()
    got = {(r["vec_id"], r["rank"]): (r["neighbor_id"], r["d2_mu"])
           for r in out}
    # each vector keeps its 2 nearest; 0.1-steps are 1e10 µunit²
    assert got[(0, 1)] == (1, 10_000_000_000)
    assert got[(0, 2)] == (2, 40_000_000_000)
    assert got[(1, 1)][1] == 10_000_000_000  # tie 0 vs 2 -> smaller id
    assert got[(1, 1)][0] == 0
    assert all(r["vec_id"] != r["neighbor_id"] for r in out)


def test_knn_graph_is_cluster_local(spark):
    # two singleton clusters (k_clusters=2, stride 1): no cross-cluster
    # edges means NO rows at all
    vecs = [[0.0], [1.0]]
    assert knn_graph(_emb(spark, vecs), k_clusters=2, iters=1,
                     k=3).count() == 0


def test_knn_graph_matches_duckdb_oracle(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    got = [(r["vec_id"], r["neighbor_id"], r["rank"], r["d2_mu"])
           for r in knn_graph(emb, k_clusters=8, iters=2, k=5).collect()]
    con = duckdb.connect()
    con.execute("CREATE VIEW embeddings AS SELECT * FROM"
                f" '{sf_dir}/embeddings.parquet'")
    want = [tuple(int(x) for x in row) for row in con.execute(
        knn_graph_sql(k_clusters=8, iters=2, k=5, n_rows=500)).fetchall()]
    assert got == want
    assert len(got) == 500 * 5  # every vector has >=5 cluster-mates here


def test_matches_duckdb_oracle(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    got = [(r["vec_id"], r["cluster"], r["keep"])
           for r in semantic_dedup(emb, k=8, iters=2,
                                   threshold_pct=30).collect()]
    con = duckdb.connect()
    con.execute("CREATE VIEW embeddings AS SELECT * FROM"
                f" '{sf_dir}/embeddings.parquet'")
    want = [(int(v), int(c), bool(k)) for v, c, k in con.execute(
        semantic_dedup_sql(k=8, iters=2, threshold_pct=30,
                           n_rows=500)).fetchall()]
    assert got == want
    # the diffuse synthetic embeddings still produce real drops at 30%
    assert any(not k for _, _, k in got)


def _embl(spark, vecs, labels):
    rows = [(i, [float(x) for x in v], int(lab))
            for i, (v, lab) in enumerate(zip(vecs, labels))]
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int")


def _prop(spark, vecs, labels, **kw):
    out = label_propagation(_embl(spark, vecs, labels), **kw).collect()
    return {r["vec_id"]: r["prop_label"] for r in out}


def test_label_propagation_spreads_seed_labels(spark):
    # seeds (id % 3 == 0) are 0 (lab 7) and 3 (lab 9); k=1 nearest
    # neighbor pairs (0,1) and (2,3), so one round labels 1<-7, 2<-9;
    # the non-seed labels 1/1 never vote (they start unlabeled)
    got = _prop(spark, [[1.0], [1.1], [5.0], [5.1]], [7, 1, 1, 9],
                k_clusters=1, iters=1, k=1, rounds=1, seed_mod=3)
    assert got == {0: 7, 1: 7, 2: 9, 3: 9}


def test_label_propagation_tie_break_and_seed_immutability(spark):
    # seeds 0 (lab 7) and 2 (lab 9); the middle vector sees one vote
    # for each -> tie -> the SMALLER label wins; both seeds keep their
    # own labels despite each other's votes across rounds
    got = _prop(spark, [[1.0], [1.01], [1.02]], [7, 9, 9],
                k_clusters=1, iters=1, k=2, rounds=3, seed_mod=2)
    assert got == {0: 7, 1: 7, 2: 9}


def test_label_propagation_unreached_is_minus_one(spark):
    # two clusters (stride 2 -> init centroids 0 and 2); the only seed
    # (seed_mod=100 -> id 0) lives in cluster {0,1}, so cluster {2,3}
    # can never be reached -> -1
    got = _prop(spark, [[0.0], [0.01], [5.0], [5.01]], [7, 7, 7, 7],
                k_clusters=2, iters=1, k=1, rounds=3, seed_mod=100)
    assert got == {0: 7, 1: 7, 2: -1, 3: -1}


def test_label_propagation_matches_duckdb_oracle(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    got = [(r["vec_id"], r["prop_label"])
           for r in label_propagation(emb, k_clusters=8, iters=2, k=5,
                                      rounds=3, seed_mod=5).collect()]
    con = duckdb.connect()
    con.execute("CREATE VIEW embeddings AS SELECT * FROM"
                f" '{sf_dir}/embeddings.parquet'")
    want = [tuple(int(x) for x in row) for row in con.execute(
        label_propagation_sql(k_clusters=8, iters=2, k=5, rounds=3,
                              seed_mod=5, n_rows=500)).fetchall()]
    assert got == want
    labs = dict(got)
    non_seed = {v: l for v, l in labs.items() if v % 5 != 0}
    assert any(l >= 0 for l in non_seed.values())  # real propagation
    assert len(labs) == 500  # whole corpus, seeds included


def test_knn_hubness_counts_in_degree(spark):
    # one cluster, k=1: nn(0)=1, nn(1)=0 (tie 0 vs 2 -> smaller id),
    # nn(2)=1 -> in-degrees 1:2, 0:1; vector 2 never appears
    out = [(r["vec_id"], r["in_degree"], r["hub_rank"])
           for r in knn_hubness(_emb(spark, [[0.0], [1.0], [2.0]]),
                                k_clusters=1, iters=1, k=1,
                                top=5).collect()]
    assert out == [(1, 2, 1), (0, 1, 2)]


def test_knn_hubness_matches_duckdb_oracle(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    got = [(r["vec_id"], r["in_degree"], r["hub_rank"])
           for r in knn_hubness(emb, k_clusters=8, iters=2, k=5,
                                top=20).collect()]
    con = duckdb.connect()
    con.execute("CREATE VIEW embeddings AS SELECT * FROM"
                f" '{sf_dir}/embeddings.parquet'")
    want = [tuple(int(x) for x in row) for row in con.execute(
        knn_hubness_sql(k_clusters=8, iters=2, k=5, top=20,
                        n_rows=500)).fetchall()]
    assert got == want
    assert len(got) == 20
    assert got[0][1] >= got[-1][1]


def test_knn_triangles_hand_graph(spark):
    """A 3-clique + a pendant (k=3 kNN in one cluster of 4 close
    vectors): clique corners close their triangle; coefficient is the
    exact µunit ratio."""
    from explora_kafka_spark.operators.semdedup import knn_triangles

    # 4 vectors in one tight cluster (k_clusters=1): ids 0-3.
    # With k=3 the kNN graph on 4 nodes is complete -> every node has
    # degree 3, sits in 3 triangles, coefficient = 2*3/(3*2) = 1.
    emb = spark.createDataFrame(
        [(i, [1.0 + 0.001 * i, 0.0]) for i in range(4)],
        "vec_id bigint, embedding array<float>")
    out = knn_triangles(emb, k_clusters=1, iters=1, k=3).collect()
    assert [(r.vec_id, r.degree, r.n_triangles, r.clustering_mu)
            for r in out] == [(i, 3, 3, 1000000) for i in range(4)]
    # k=1: each node links only its nearest -> path-ish graph, no
    # triangle, coefficient 0
    out1 = knn_triangles(emb, k_clusters=1, iters=1, k=1).collect()
    assert all(r.n_triangles == 0 and r.clustering_mu == 0 for r in out1)


# ---------------------------------------------------------------------------
# knn_pagerank
# ---------------------------------------------------------------------------


def _pr_expected(n, od, rounds=5, dangling_uniform=False):
    """Pure-Python mirror of the exact-integer PageRank recurrence for a
    REGULAR graph (every node identical): returns the common pr_ppb."""
    pr = 10**9 // n
    hold = (15 * (10**9 // n)) // 100
    for _ in range(rounds):
        if od == 0:
            insum, dm = 0, n * pr
        else:
            insum, dm = od * (pr // od), 0
        pr = hold + (85 * (insum + dm // n)) // 100
    return pr


def test_knn_pagerank_uniform_on_regular_graph(spark):
    from explora_kafka_spark.operators.semdedup import knn_pagerank

    # one cluster of 3 -> complete directed graph, out-degree 2,
    # symmetric: PageRank stays uniform; values follow the integer
    # recurrence exactly (floor leakage included)
    out = knn_pagerank(_emb(spark, [[0.0], [0.1], [0.2]]), k_clusters=1,
                       iters=1, k=2, rounds=5).collect()
    want = _pr_expected(n=3, od=2, rounds=5)
    assert [r["vec_id"] for r in out] == [0, 1, 2]
    assert all(r["out_degree"] == 2 for r in out)
    assert all(r["pr_ppb"] == want for r in out)


def test_knn_pagerank_dangling_uniform_redistribution(spark):
    from explora_kafka_spark.operators.semdedup import knn_pagerank

    # two singleton clusters -> NO edges; both nodes dangling. Their
    # pooled mass redistributes uniformly: pr is stationary at
    # hold + 85% of the uniform dangling share.
    out = knn_pagerank(_emb(spark, [[0.0], [1.0]]), k_clusters=2,
                       iters=1, k=3, rounds=5).collect()
    want = _pr_expected(n=2, od=0, rounds=5)
    assert all(r["out_degree"] == 0 for r in out)
    assert all(r["pr_ppb"] == want for r in out)
    assert want == 500_000_000  # exactly stationary for n=2


def test_knn_pagerank_empty_input_degrades(spark):
    # ADVICE r10: n == 0 must not reach the 10**9 DIV n expressions —
    # empty in, empty (key, out_degree, pr_ppb) out, like the siblings
    from explora_kafka_spark.operators.semdedup import knn_pagerank

    out = knn_pagerank(_emb(spark, []), k_clusters=2, iters=1, k=3,
                       rounds=5)
    assert out.columns == ["vec_id", "out_degree", "pr_ppb"]
    assert out.count() == 0


def test_knn_pagerank_repartition_deterministic(spark):
    from explora_kafka_spark.operators.semdedup import knn_pagerank

    vecs = [[0.0], [0.1], [0.2], [0.35], [0.4], [0.9]]
    a = knn_pagerank(_emb(spark, vecs), k_clusters=1, iters=1, k=3,
                     rounds=3).collect()
    b = knn_pagerank(_emb(spark, vecs).repartition(7), k_clusters=1,
                     iters=1, k=3, rounds=3).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_knn_pagerank_matches_duckdb_oracle(spark, sf_dir):
    from explora_kafka_spark.operators.semdedup import (
        knn_pagerank, knn_pagerank_sql)

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    got = [(r["vec_id"], r["out_degree"], r["pr_ppb"])
           for r in knn_pagerank(emb, k_clusters=8, iters=2, k=5,
                                 rounds=5).collect()]
    con = duckdb.connect()
    con.execute("CREATE VIEW embeddings AS SELECT * FROM"
                f" '{sf_dir}/embeddings.parquet'")
    want = [tuple(int(x) for x in row) for row in con.execute(
        knn_pagerank_sql(k_clusters=8, iters=2, k=5, rounds=5,
                         n_rows=500)).fetchall()]
    assert got == want
    # teleport floor: nobody scores below the hold term
    hold = (15 * (10**9 // 500)) // 100
    assert all(pr >= hold for _, _, pr in got)
    # total mass stays within floor-leakage of 1e9
    assert 0.98 * 10**9 <= sum(pr for _, _, pr in got) <= 10**9
