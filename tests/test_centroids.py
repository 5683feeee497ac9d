"""Label-centroid operators (operators/centroids.py)."""

from __future__ import annotations

import math

from explora_kafka_spark.operators import centroids as C


def _emb_df(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id: long, embedding: array<float>, label: int"
    )


def test_centroid_is_componentwise_mean(spark):
    df = _emb_df(spark, [
        (1, [1.0, 0.0], 0),
        (2, [3.0, 2.0], 0),
        (3, [0.0, 4.0], 1),
    ])
    out = {(r["label"], r["dim"]): r["centroid"]
           for r in C.label_centroids(df).collect()}
    assert out[(0, 0)] == 2.0 and out[(0, 1)] == 1.0
    assert out[(1, 0)] == 0.0 and out[(1, 1)] == 4.0


def test_cosine_of_orthogonal_and_parallel_centroids(spark):
    df = _emb_df(spark, [
        (1, [1.0, 0.0], 0),
        (2, [0.0, 1.0], 1),
        (3, [2.0, 0.0], 2),   # parallel to label 0
    ])
    out = {(r["label_a"], r["label_b"]): r["cosine"]
           for r in C.label_centroid_cosine(df).collect()}
    assert out[(0, 1)] == 0.0
    assert out[(0, 2)] == 1.0
    assert set(out) == {(0, 1), (0, 2), (1, 2)}  # unordered pairs once


def test_cosine_matches_direct_computation(spark):
    a, b = [0.25, -0.5, 0.125], [0.75, 0.1, -0.3]
    df = _emb_df(spark, [(1, a, 0), (2, b, 1)])
    out = C.label_centroid_cosine(df).collect()[0]["cosine"]
    dot = sum(x * y for x, y in zip(a, b))
    want = dot / (math.sqrt(sum(x * x for x in a))
                  * math.sqrt(sum(y * y for y in b)))
    assert abs(out - want) < 1e-5


def test_determinism_under_repartitioning(spark):
    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(16)], i % 3)
        for i in range(60)
    ]
    df = _emb_df(spark, rows)
    a = C.label_centroid_cosine(df).toPandas()
    b = C.label_centroid_cosine(df.repartition(13)).toPandas()
    assert a.equals(b)  # bit-identical, not just close


def test_plan_is_native(spark):
    df = _emb_df(spark, [(1, [1.0, 2.0], 0), (2, [2.0, 1.0], 1)])
    plan = (
        C.label_centroid_cosine(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_embedding_covariance_hand_example(spark):
    """Two 2-d vectors (0,0) and (2,4): population cov = [[1,2],[2,4]]."""
    from explora_kafka_spark.operators.centroids import embedding_covariance

    emb = spark.createDataFrame(
        [(1, [0.0, 0.0], 0), (2, [2.0, 4.0], 0)],
        "vec_id: long, embedding: array<float>, label: int",
    )
    out = {(r["j"], r["k"]): r["cov"]
           for r in embedding_covariance(emb).collect()}
    assert out[(0, 0)] == 1.0 and out[(0, 1)] == 2.0 and out[(1, 1)] == 4.0
    assert all(r == 2 for r in [len(set(j for j, _ in out)), ])


def test_embedding_covariance_matches_numpy_and_is_deterministic(spark, sf_dir):
    import numpy as np

    from explora_kafka_spark.operators.centroids import embedding_covariance

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = embedding_covariance(emb).collect()
    b = embedding_covariance(emb.repartition(7)).collect()
    assert a == b  # bit-exact integer sums under any partitioning
    X = np.stack([np.asarray(r["embedding"]) for r in emb.collect()])
    Q = np.floor(X.astype(np.float64) * 1e6 + 0.5)
    C = np.cov(Q, rowvar=False, bias=True) / 1e12
    for r in a:
        assert abs(r["cov"] - C[r["j"], r["k"]]) < 1e-5
    # diagonal is a variance
    assert all(r["cov"] >= 0 for r in a if r["j"] == r["k"])


def test_pca_top_component_recovers_dominant_axis(spark):
    """Strongly anisotropic data: variance concentrated on a known axis
    -> 10 power iterations recover it almost exactly."""
    import numpy as np

    from explora_kafka_spark.operators.centroids import pca_top_component

    rng = [((i * 37) % 19 - 9) / 9.0 for i in range(40)]  # deterministic
    axis = np.array([3.0, 1.0, -2.0, 0.5])
    axis /= np.linalg.norm(axis)
    rows = []
    for i, t in enumerate(rng):
        noise = np.array([((i * 13 + d * 7) % 11 - 5) / 500.0
                          for d in range(4)])
        rows.append((i, (t * axis + noise).tolist(), 0))
    emb = spark.createDataFrame(
        rows, "vec_id: long, embedding: array<float>, label: int")
    v = np.array([r["v_mu"] for r in pca_top_component(emb).collect()],
                 dtype=np.float64)
    cos = abs(v @ axis) / np.linalg.norm(v)
    assert cos > 0.999
    # sign canonicalization: lowest nonzero loading is positive
    lead = next(x for x in v if x != 0)
    assert lead > 0


def test_pca_top_component_rayleigh_and_determinism(spark, sf_dir):
    """On near-isotropic data the direction is under-determined, but the
    captured variance (Rayleigh quotient) must be near-maximal — and the
    integer iteration is bit-deterministic under repartitioning."""
    import numpy as np

    from explora_kafka_spark.operators.centroids import pca_top_component

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = pca_top_component(emb).collect()
    b = pca_top_component(emb.repartition(5)).collect()
    assert a == b
    v = np.array([r["v_mu"] for r in a], dtype=np.float64)
    X = np.stack([np.asarray(r["embedding"]) for r in emb.collect()])
    Q = np.floor(X.astype(np.float64) * 1e6 + 0.5)
    C = np.cov(Q, rowvar=False, bias=True)
    lam1 = np.linalg.eigvalsh(C)[-1]
    R = (v @ C @ v) / (v @ v)
    assert R / lam1 > 0.9


def test_pca_project_scores_center_and_rank(spark):
    """Points spread along one dominant axis: centered scores sum to
    ~0 and rank in coordinate order; dot_mu is exact integer."""
    from explora_kafka_spark.operators.centroids import pca_project

    rows = [(i, [float(i - 2), 0.001 * i]) for i in range(5)]
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>")
    out = pca_project(emb).collect()
    scores = [r["score"] for r in out]
    assert abs(sum(scores)) < 1e-4          # centered
    assert scores == sorted(scores) or scores == sorted(scores,
                                                        reverse=True)
    # the dominant coordinate spans [-2, 2]: extreme scores ~ +-2
    assert max(abs(s) for s in scores) > 1.5


def test_pca_project_deterministic_and_matches_duckdb(spark, sf_dir):
    import duckdb

    from explora_kafka_spark.operators.centroids import (
        pca_project, pca_project_sql)

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = [(r["vec_id"], r["dot_mu"], r["score"])
         for r in pca_project(emb).collect()]
    b = [(r["vec_id"], r["dot_mu"], r["score"])
         for r in pca_project(emb.repartition(7)).collect()]
    assert a == b
    con = duckdb.connect()
    con.execute("CREATE VIEW embeddings AS SELECT * FROM"
                f" '{sf_dir}/embeddings.parquet'")
    want = [(int(v), int(d), float(s)) for v, d, s in con.execute(
        pca_project_sql()).fetchall()]
    assert a == want


def test_embedding_standardize_zero_mean_unit_std_and_parity(
        spark, sf_dir):
    import statistics

    import duckdb

    from explora_kafka_spark.operators.centroids import (
        embedding_standardize, embedding_standardize_sql)

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    got = [(r["vec_id"], r["dim"], r["z"])
           for r in embedding_standardize(emb).collect()]
    # population-standardized: every dim has mean ~0 and std ~1
    by_dim = {}
    for _, d, z in got:
        by_dim.setdefault(d, []).append(z)
    for zs in by_dim.values():
        assert abs(sum(zs) / len(zs)) < 1e-4
        assert abs(statistics.pstdev(zs) - 1.0) < 1e-3
    con = duckdb.connect()
    con.execute("CREATE VIEW embeddings AS SELECT * FROM"
                f" '{sf_dir}/embeddings.parquet'")
    want = [(int(a), int(b), float(c)) for a, b, c in con.execute(
        embedding_standardize_sql()).fetchall()]
    assert got == want


def test_embedding_standardize_constant_dim_emits_zero(spark):
    from explora_kafka_spark.operators.centroids import (
        embedding_standardize)

    rows = [(i, [float(i), 3.5]) for i in range(4)]  # dim 1 constant
    emb = spark.createDataFrame(rows,
                                "vec_id bigint, embedding array<float>")
    out = {(r["vec_id"], r["dim"]): r["z"]
           for r in embedding_standardize(emb).collect()}
    assert all(out[(i, 1)] == 0.0 for i in range(4))
    assert any(out[(i, 0)] != 0.0 for i in range(4))


def test_embedding_drift_exact_centroid_shift(spark):
    from explora_kafka_spark.operators.centroids import embedding_drift

    # label 7: first half centered at 1.0, second at 1.5 -> shift
    # 0.5 -> d2 = (5e5)^2; label 9 only in the first half -> omitted
    rows = [(0, [1.0], 7), (1, [1.0], 7), (2, [2.0], 9),
            (10, [1.5], 7), (11, [1.5], 7)]
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int")
    out = [(r["label"], r["n_first"], r["n_second"], r["d2_mu"])
           for r in embedding_drift(emb, split_id=10).collect()]
    assert out == [(7, 2, 2, 250_000_000_000)]


def test_embedding_drift_matches_duckdb_oracle(spark, sf_dir):
    import duckdb

    from explora_kafka_spark.operators.centroids import (
        embedding_drift, embedding_drift_sql)

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    got = [tuple(r) for r in embedding_drift(emb, split_id=250).collect()]
    con = duckdb.connect()
    con.execute("CREATE VIEW embeddings AS SELECT * FROM"
                f" '{sf_dir}/embeddings.parquet'")
    want = [tuple(int(x) for x in row) for row in con.execute(
        embedding_drift_sql(split_id=250)).fetchall()]
    assert [tuple(int(x) for x in r) for r in got] == want
    assert len(got) > 0
