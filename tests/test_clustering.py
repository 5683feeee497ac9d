"""Deterministic k-means (operators/clustering.py): Lloyd semantics,
stride init, tie-breaks, bit-determinism under repartitioning."""

import pytest
from pyspark.sql import functions as F

from explora_kafka_spark.operators.clustering import (
    kcenter_select, kcenter_select_sql, kmeans, kmeans_outliers,
    kmeans_sizes, kmeans_stride)


def _emb(spark, vecs):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def test_two_obvious_clusters(spark):
    # ids 0..3 near the origin corner, 4..7 near the opposite corner;
    # stride init (n=8, k=2 -> stride 4) seeds one centroid in each
    vecs = [[0.0, 0.01 * i] for i in range(4)] + \
           [[1.0, 1.0 - 0.01 * i] for i in range(4)]
    out = kmeans(_emb(spark, vecs), k=2, iters=2).collect()
    clusters = {r["vec_id"]: r["cluster"] for r in out}
    assert {clusters[i] for i in range(4)} == {0}
    assert {clusters[i] for i in range(4, 8)} == {1}


def test_iters_one_is_nearest_init_assignment(spark):
    # with iters=1 every vector joins its nearest INIT centroid
    # (ids 0 and 2 for n=4, k=2): vector 3 sits exactly on centroid 2
    vecs = [[0.0, 0.0], [0.1, 0.0], [1.0, 0.0], [1.0, 0.0]]
    out = {r["vec_id"]: r["cluster"]
           for r in kmeans(_emb(spark, vecs), k=2, iters=1).collect()}
    assert out == {0: 0, 1: 0, 2: 1, 3: 1}


def test_equidistant_tie_breaks_to_smaller_cid(spark):
    # centroids at 0.0 and 1.0 (ids 0, 2); vector 3 at exactly 0.5
    vecs = [[0.0], [0.0], [1.0], [0.5]]
    out = {r["vec_id"]: r["cluster"]
           for r in kmeans(_emb(spark, vecs), k=2, iters=1).collect()}
    assert out[3] == 0


def test_lloyd_update_moves_boundary(spark):
    # one tight mass near 0 plus an outlier at 10: after one update the
    # right centroid chases the outlier mass mean and the boundary moves
    vecs = [[0.0], [1.0], [2.0], [3.0], [4.0], [10.0]]
    one = {r["vec_id"]: r["cluster"]
           for r in kmeans(_emb(spark, vecs), k=2, iters=1).collect()}
    two = {r["vec_id"]: r["cluster"]
           for r in kmeans(_emb(spark, vecs), k=2, iters=2).collect()}
    # init centroids: ids 0 (0.0) and 3 (3.0) -> vec 2.0 starts right
    assert one[2] == 1
    # after the update the left centroid is mean(0,1)=0.5-ish and the
    # right mean(2,3,4,10)=4.75 -> 2.0 flips left
    assert two[2] == 0


def test_sizes_histogram_sums_to_n(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    sizes = kmeans_sizes(emb, k=4, iters=2).collect()
    assert sum(r["n_vectors"] for r in sizes) == emb.count()
    assert len(sizes) <= 4


def test_bit_deterministic_under_repartition(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    a = kmeans(emb, k=4, iters=3, n_rows=n).collect()
    b = kmeans(emb.repartition(17), k=4, iters=3, n_rows=n).collect()
    assert a == b


def test_stride_floor(spark):
    assert kmeans_stride(500, 8) == 62
    assert kmeans_stride(5, 8) == 1


def test_outliers_ranks_farthest_first(spark):
    # tight mass near origin + one extreme point: the extreme point must
    # top the outlier queue with the largest d2
    # init centroids (n=6, k=2, stride=3) are ids 0 and 3 — the extreme
    # point id 4 is NOT a centroid, so its d2 dominates the queue
    vecs = [[0.0], [0.1], [0.2], [0.3], [9.9], [0.15]]
    out = kmeans_outliers(_emb(spark, vecs), k=2, iters=1, top=3).collect()
    assert out[0]["vec_id"] == 4
    d2s = [r["d2_mu"] for r in out]
    assert d2s == sorted(d2s, reverse=True)


def test_outliers_consistent_with_assignment(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    assign = {r["vec_id"]: r["cluster"]
              for r in kmeans(emb, k=4, iters=2).collect()}
    for r in kmeans_outliers(emb, k=4, iters=2, top=10).collect():
        assert assign[r["vec_id"]] == r["cluster"]
        assert r["d2_mu"] >= 0


def test_kcenter_farthest_first_traversal(spark):
    # seed = smallest id (0 at 0.0); farthest is 11.0 (id 3,
    # d2 = (11e6)^2); then ids 1 and 2 tie at (1e6)^2 -> smaller id
    vecs = [[0.0], [1.0], [10.0], [11.0]]
    out = [(r["rank"], r["vec_id"], r["d2_mu"])
           for r in kcenter_select(_emb(spark, vecs), k=3).collect()]
    assert out == [(0, 0, -1),
                   (1, 3, 121_000_000_000_000),
                   (2, 1, 1_000_000_000_000)]


def test_kcenter_stops_when_covered(spark):
    # all-duplicate corpus: after the seed the max-min distance is 0,
    # so selection stops at 1 row no matter how large k is
    vecs = [[1.0], [1.0], [1.0]]
    out = kcenter_select(_emb(spark, vecs), k=3).collect()
    assert [(r["rank"], r["vec_id"]) for r in out] == [(0, 0)]


def test_kcenter_radius_is_non_increasing(spark, sf_dir):
    # each pick closes the current max-min distance, so the coverage
    # radius sequence over ranks 1..k-1 can never increase
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    radii = [r["d2_mu"] for r in
             kcenter_select(emb, k=8).collect()][1:]
    assert len(radii) == 7
    assert all(a >= b for a, b in zip(radii, radii[1:]))


def test_kcenter_matches_duckdb_oracle(spark, sf_dir):
    import duckdb

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    got = [(r["rank"], r["vec_id"], r["d2_mu"])
           for r in kcenter_select(emb, k=8).collect()]
    con = duckdb.connect()
    con.execute("CREATE VIEW embeddings AS SELECT * FROM"
                f" '{sf_dir}/embeddings.parquet'")
    want = [tuple(int(x) for x in row)
            for row in con.execute(kcenter_select_sql(k=8)).fetchall()]
    assert got == want


def test_assign_kernel_rejects_overflow_magnitudes(spark):
    # ADVICE r10: the Arrow argmin kernel's int64 envelope is enforced,
    # not assumed — |value| ~5000 in 1-dim µunits (5e9) already puts
    # (mx+mc)^2 past 2^62, so the kernel must raise instead of wrapping
    from py4j.protocol import Py4JJavaError

    with pytest.raises((OverflowError, Py4JJavaError, Exception)) as ei:
        kmeans(_emb(spark, [[5000.0], [5001.0]]), k=1, iters=1).collect()
    assert "envelope" in str(ei.value) or "OverflowError" in str(ei.value)


def test_assign_kernel_accepts_unit_scale(spark):
    # unit-scale embeddings (the documented caller contract) stay fine
    out = kmeans(_emb(spark, [[1.0], [-1.0]]), k=1, iters=1).collect()
    assert len(out) == 2


def _docs4(spark, sources):
    rows = [(i, s) for i, s in enumerate(sources)]
    return spark.createDataFrame(rows, "doc_id bigint, source string")


def test_cluster_source_mi_perfect_dependence(spark):
    # 1-d vectors split clusters {0,1} vs {2,3} (stride init seeds ids
    # 0 and 2); sources align exactly with clusters -> MI = ln 2.
    # Per-cluster contribution: 2 cells x p=1/2 each cluster holding
    # one cell: 0.5*ln((0.5/0.5)*(4/2)) = 0.5*ln 2 ->
    # floor(346573.59 + 0.5) = 346574 mu-nats.
    from explora_kafka_spark.operators.clustering import cluster_source_mi

    emb = _emb(spark, [[0.0], [0.0], [1.0], [1.0]])
    docs = _docs4(spark, ["A", "A", "B", "B"])
    out = cluster_source_mi(docs, emb, k=2, iters=2).collect()
    assert [r["cluster"] for r in out] == [0, 1]
    for r, src in zip(out, ["A", "B"]):
        assert r["n_docs"] == 2
        assert r["n_sources"] == 1
        assert r["top_source"] == src
        assert r["top_share_ppm"] == 1_000_000
        assert r["mi_mu_nats"] == 346_574


def test_cluster_source_mi_independence_is_zero(spark):
    # each cluster holds one A and one B -> every cell has
    # p(c,s) = p(c)p(s), ln 1 = 0: MI contribution exactly 0.
    from explora_kafka_spark.operators.clustering import cluster_source_mi

    emb = _emb(spark, [[0.0], [0.0], [1.0], [1.0]])
    docs = _docs4(spark, ["A", "B", "A", "B"])
    out = cluster_source_mi(docs, emb, k=2, iters=2).collect()
    assert all(r["mi_mu_nats"] == 0 for r in out)
    assert all(r["n_sources"] == 2 for r in out)
    assert all(r["top_share_ppm"] == 500_000 for r in out)


def test_cluster_balance_sample_caps_each_cluster(spark):
    from explora_kafka_spark.operators.clustering import (
        cluster_balance_sample)

    emb = _emb(spark, [[0.0], [0.0], [1.0], [1.0]])
    docs = _docs4(spark, ["A", "A", "B", "B"])
    out = cluster_balance_sample(docs, emb, cap=1, k=2, iters=2).collect()
    assert len(out) == 2
    assert {r["cluster"] for r in out} == {0, 1}
    assert all(r["rk"] == 1 for r in out)
    # deterministic: a second run picks the identical docs
    again = cluster_balance_sample(docs, emb, cap=1, k=2, iters=2).collect()
    assert sorted(r["doc_id"] for r in out) == \
        sorted(r["doc_id"] for r in again)


def test_kmeans_inertia_sweep_hand_values(spark):
    # 1-d: [0,0,1,1]. k=1 with iters=2: after the update the single
    # centroid is the mean 0.5 (5e5 µunits), so inertia =
    # 4 * (5e5)^2 = 1e12. k=2 (seeds ids 0, 2): both clusters exact,
    # inertia 0, drop_pct = 100.0. First rung's drop is NULL.
    from explora_kafka_spark.operators.clustering import (
        kmeans_inertia_sweep)

    emb = _emb(spark, [[0.0], [0.0], [1.0], [1.0]])
    out = kmeans_inertia_sweep(emb, ks=(1, 2), iters=2).collect()
    assert [(r["k"], r["inertia_mu2"]) for r in out] == \
        [(1, 10**12), (2, 0)]
    assert out[0]["drop_pct"] is None
    assert out[1]["drop_pct"] == 100.0


def test_partial_update_matches_explode_update(spark):
    # The fused assign+partial-sum kernel (optimization round 14) must
    # produce bit-identical centroids to the explicit
    # _assign -> _update(explode) formulation it replaced.
    from pyspark.sql import functions as F

    from explora_kafka_spark.operators import clustering as CL

    vecs = [[0.1, -0.2], [0.4, 0.9], [-0.3, 0.5], [0.8, 0.8],
            [0.0, 0.0], [1.0, -1.0], [0.2, 0.2], [0.6, -0.4]]
    emb = _emb(spark, vecs).repartition(3)
    mu = emb.select(
        F.col("vec_id").alias("vid"),
        F.expr(CL._MU_COL.format(vec="embedding")).alias("m"),
    )
    stride = CL.kmeans_stride(len(vecs), 3)
    cent = mu.filter(
        (F.col("vid") % stride == 0) & (F.col("vid") < 3 * stride)
    ).select((F.col("vid") / stride).cast("int").alias("cid"),
             F.col("m").alias("cm"))
    rows = sorted(cent.collect(), key=lambda r: r["cid"])

    old = {r["cid"]: list(r["cm"])
           for r in CL._update(CL._assign(mu, cent, rows)).collect()}
    new = {r["cid"]: list(r["cm"])
           for r in CL._partial_update(mu, rows).collect()}
    assert old == new and len(old) > 0
