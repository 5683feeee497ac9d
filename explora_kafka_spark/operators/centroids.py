"""Per-label embedding centroids + centroid-space similarity.

Corpus-curation diagnostics over a labeled embedding table
(`embeddings(vec_id, embedding: array<float>, label)`): the centroid of
each label's vectors, and the cosine similarity between label centroids
— "which classes/sources occupy the same region of embedding space"
(mixture overlap, label-noise screening, cluster sanity checks).

Numerical determinism (same discipline as operators/anomaly.py): float32
components are converted EXACTLY to doubles, scaled to integer
micro-units with an explicit half-up (`floor(x·1e6 + 0.5)`), and every
aggregate — component sums, dot products, squared norms — is a BIGINT
sum of exact integers, which no summation order can change. Doubles
reappear only in the final division/sqrt, written identically in both
engines over identical integer inputs. Magnitudes: unit-scale components
→ |µ| ≲ 1e6+, pairwise products ≲ 1e13·d — far inside bigint AND
double-exact (2^53) range for any realistic embedding width.

Scale shape: `label_centroids` is one explode (×d) + one partially-
aggregated shuffle on (label, dim) — the only pass over the corpus.
`label_centroid_cosine` runs entirely in centroid space (k·d rows for k
labels): the self-join is k²·d work on a table that fits in one task by
construction; broadcast it if k grows.

The reference has no embedding operators — this extends the engine for
LLM data pipelines (task brief) alongside operators/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: micro-unit scale shared with the SQL mirrors
_MU = 1e6

#: µunit quantization as a SQL expression (the clustering.py _MU_COL
#: twin, here for literal-axis folds)
_MU_EXPR = ("transform({vec}, x -> CAST(floor(CAST(x AS DOUBLE) * 1e6"
            " + 0.5) AS BIGINT))")


def _centroid_mu(emb: DataFrame, label_col: str, vec_col: str) -> DataFrame:
    """(label, dim, cmu): per-label per-dimension centroid in exact
    integer micro-units."""
    ex = emb.select(
        F.col(label_col).alias("label"),
        F.posexplode(vec_col).alias("dim", "val"),
    ).select(
        "label",
        "dim",
        F.floor(F.col("val").cast("double") * _MU + F.lit(0.5))
        .cast("bigint")
        .alias("mu"),
    )
    return ex.groupBy("label", "dim").agg(
        F.floor(
            F.sum("mu").cast("double") / F.count("*").cast("double")
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("cmu")
    )


def label_centroids(
    emb: DataFrame, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Centroid of each label's vectors, one row per (label, dim)."""
    c = _centroid_mu(emb, label_col, vec_col)
    return c.select(
        "label", "dim", (F.col("cmu").cast("double") / _MU).alias("centroid")
    ).orderBy("label", "dim")


def label_centroid_cosine(
    emb: DataFrame, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Cosine similarity between label centroids, one row per unordered
    label pair (label_a < label_b)."""
    c = _centroid_mu(emb, label_col, vec_col)
    a = c.select(
        F.col("label").alias("label_a"), "dim", F.col("cmu").alias("mu_a")
    )
    b = c.select(
        F.col("label").alias("label_b"), "dim", F.col("cmu").alias("mu_b")
    )
    prods = (
        a.join(b, "dim")
        .filter(F.col("label_a") < F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(
            F.sum(F.col("mu_a") * F.col("mu_b")).alias("dot"),
            F.sum(F.col("mu_a") * F.col("mu_a")).alias("na"),
            F.sum(F.col("mu_b") * F.col("mu_b")).alias("nb"),
        )
    )
    return prods.select(
        "label_a",
        "label_b",
        F.round(
            F.col("dot").cast("double")
            / (
                F.sqrt(F.col("na").cast("double"))
                * F.sqrt(F.col("nb").cast("double"))
            ),
            6,
        ).alias("cosine"),
    ).orderBy("label_a", "label_b")


def _centroid_mu_sql(table: str, label_col: str, vec_col: str) -> str:
    return f"""
        SELECT label, dim,
               CAST(floor(CAST(sum(mu) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                          + 0.5) AS BIGINT) AS cmu
        FROM (
            SELECT {label_col} AS label,
                   unnest(range(len({vec_col}))) AS dim,
                   CAST(floor(CAST(unnest({vec_col}) AS DOUBLE) * 1e6 + 0.5)
                        AS BIGINT) AS mu
            FROM {table}
        )
        GROUP BY 1, 2
    """


def label_centroids_sql(
    table: str = "embeddings",
    label_col: str = "label",
    vec_col: str = "embedding",
) -> str:
    """DuckDB mirror of `label_centroids` (zipped unnest ≙ posexplode)."""
    return f"""
        WITH c AS ({_centroid_mu_sql(table, label_col, vec_col)})
        SELECT label, dim, CAST(cmu AS DOUBLE) / 1e6 AS centroid
        FROM c ORDER BY 1, 2
    """


def label_centroid_cosine_sql(
    table: str = "embeddings",
    label_col: str = "label",
    vec_col: str = "embedding",
) -> str:
    """DuckDB mirror of `label_centroid_cosine`."""
    return f"""
        WITH c AS ({_centroid_mu_sql(table, label_col, vec_col)}),
        prods AS (
            SELECT a.label AS label_a, b.label AS label_b,
                   CAST(sum(a.cmu * b.cmu) AS BIGINT) AS dot,
                   CAST(sum(a.cmu * a.cmu) AS BIGINT) AS na,
                   CAST(sum(b.cmu * b.cmu) AS BIGINT) AS nb
            FROM c a JOIN c b ON a.dim = b.dim AND a.label < b.label
            GROUP BY 1, 2
        )
        SELECT label_a, label_b,
               round(CAST(dot AS DOUBLE)
                     / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))),
                     6) AS cosine
        FROM prods ORDER BY 1, 2
    """


# ---------------------------------------------------------------------------
# embedding covariance (PCA / whitening prep)
# ---------------------------------------------------------------------------


def _cov_sums(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Exact integer sufficient statistics for the covariance matrix:
    (j, k, n_d, s_d, mj_d, mk_d) for j ≤ k, all decimal(38,0) —
    S = Σ q_j·q_k, M_j = Σ q_j over µunit-quantized components. One
    corpus pass (per-Arrow-batch int64 Gram via mapInPandas), shuffle
    carries d(d+1)/2 rows per partition. Shared by
    `embedding_covariance` and `pca_top_component`."""
    import pandas as pd
    from pyspark.sql import types as T

    q = emb.select(
        F.transform(
            F.col(vec_col),
            lambda x: F.floor(x.cast("double") * _MU + F.lit(0.5)).cast(
                "bigint"
            ),
        ).alias("q")
    )

    schema = T.StructType([
        T.StructField("j", T.IntegerType()),
        T.StructField("k", T.IntegerType()),
        T.StructField("cnt", T.LongType()),
        T.StructField("s", T.LongType()),
        T.StructField("mj", T.LongType()),
        T.StructField("mk", T.LongType()),
    ])

    def _gram(batches):
        import numpy as np

        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(
                [np.asarray(v, dtype=np.int64) for v in pdf["q"]]
            )
            G = X.T @ X
            cs = X.sum(axis=0)
            ju, ku = np.triu_indices(X.shape[1])
            yield pd.DataFrame({
                "j": ju.astype("int32"),
                "k": ku.astype("int32"),
                "cnt": np.full(len(ju), len(pdf), dtype=np.int64),
                "s": G[ju, ku],
                "mj": cs[ju],
                "mk": cs[ku],
            })

    dec = "decimal(38,0)"
    return (
        q.mapInPandas(_gram, schema)
        .groupBy("j", "k")
        .agg(
            F.sum(F.col("cnt").cast(dec)).alias("n_d"),
            F.sum(F.col("s").cast(dec)).alias("s_d"),
            F.sum(F.col("mj").cast(dec)).alias("mj_d"),
            F.sum(F.col("mk").cast(dec)).alias("mk_d"),
        )
    )


def embedding_covariance(
    emb: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """Upper-triangle covariance matrix of the embedding columns —
    the sufficient statistic for PCA / whitening / Mahalanobis outlier
    scoring over a corpus's embedding space.

    Exactness discipline as above: components → integer µunits row-side
    (JVM expression), then each Arrow batch accumulates an int64 Gram
    matrix + column sums in ONE numpy pass (mapInPandas — with d = 64
    the d(d+1)/2 = 2080 pair aggregates would otherwise be 2080 codegen
    expressions or a 2080× explode), and partitions' partial matrices
    are summed by a d²-sized groupBy. Every sum is integer — bit-exact
    under any partitioning; doubles appear only in the final division.
    cov(j,k) = (S_jk/n − (M_j/n)(M_k/n)) / 1e12 (population covariance,
    µunit² → unit scale), rounded to 6 dp.

    100 TB shape: one corpus pass; the shuffle carries d(d+1)/2 rows
    PER PARTITION (a few thousand ints), never per-vector data. Global
    sums ride decimal(38,0) so n × µ² products cannot overflow.

    Output (ordered by j, k): j, k, n, cov.
    """
    agg = _cov_sums(emb, vec_col)
    n = F.col("n_d").cast("double")
    cov = (
        F.col("s_d").cast("double") / n
        - (F.col("mj_d").cast("double") / n)
        * (F.col("mk_d").cast("double") / n)
    ) / F.lit(1e12)
    return (
        agg.select(
            "j",
            "k",
            F.col("n_d").cast("bigint").alias("n"),
            # `+ 0.0` normalizes IEEE signed zero (-0.0 + 0.0 == 0.0):
            # the driver's value hash is bitwise, and a rounded -0.0 on
            # one engine vs 0.0 on the other is value-equal but
            # hash-different. Mirrored in embedding_covariance_sql.
            (F.round(cov, 6) + F.lit(0.0)).alias("cov"),
        )
        .orderBy("j", "k")
    )


def embedding_covariance_sql(
    table: str = "embeddings", vec_col: str = "embedding"
) -> str:
    """DuckDB mirror of `embedding_covariance` (pairwise unnest of the
    same µunit integers; bigint sums are exact — DuckDB widens to
    int128 internally)."""
    return f"""
        WITH q AS (
            SELECT list_transform(
                       {vec_col},
                       x -> CAST(floor(CAST(x AS DOUBLE) * 1e6 + 0.5)
                                 AS BIGINT)
                   ) AS qs
            FROM {table}
        ),
        pairs AS (
            SELECT jj.j AS j, kk.k AS k,
                   count(*) AS n,
                   sum(qs[jj.j + 1] * qs[kk.k + 1]) AS s,
                   sum(qs[jj.j + 1]) AS mj,
                   sum(qs[kk.k + 1]) AS mk
            FROM q,
                 unnest(generate_series(0, len(qs) - 1)) AS jj(j),
                 unnest(generate_series(0, len(qs) - 1)) AS kk(k)
            WHERE kk.k >= jj.j
            GROUP BY jj.j, kk.k
        )
        SELECT j, k, n,
               round((CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                      - (CAST(mj AS DOUBLE) / CAST(n AS DOUBLE))
                        * (CAST(mk AS DOUBLE) / CAST(n AS DOUBLE)))
                     / 1e12, 6) + 0.0 AS cov
        FROM pairs
        ORDER BY j, k
    """


# ---------------------------------------------------------------------------
# PCA top component (integer power iteration)
# ---------------------------------------------------------------------------

#: power-iteration steps for pca_top_component (fixed — the oracle
#: unrolls exactly this many CTE stages)
PCA_ITERS = 10


def _imu_div(w: int, m: int) -> int:
    """sign(w) · halfup(|w|·1e6 / m) in exact integer arithmetic — the
    normalization step both engines reproduce verbatim (DuckDB `//` on
    non-negative hugeints ≡ Python `//`)."""
    if w < 0:
        return -((-w * 1_000_000 + m // 2) // m)
    return (w * 1_000_000 + m // 2) // m


def pca_top_component(
    emb: DataFrame, vec_col: str = "embedding", n_iters: int = PCA_ITERS
) -> DataFrame:
    """Dominant covariance eigenvector (the first PCA axis) by power
    iteration — the direction of maximum variance of the corpus
    embedding space, the whitening/dimensionality-reduction primitive.

    Exactly one distributed pass: the `_cov_sums` sufficient statistic
    (d² integers). The iteration then runs on that d×d table —
    DRIVER-side over arbitrary-precision Python ints (the
    bpe_merges/kmeans pattern: corpus-scale work distributed, the
    vocab/statistic-sized loop local). Power iteration is
    scale-invariant, so the matrix is the EXACT integer
    A = n·S − M·Mᵀ (no division), the vector stays in integer µunits
    (start: all-ones), and each step renormalizes by max-|w| with
    half-up integer division — every quantity exact, so the unrolled
    DuckDB oracle reproduces all `n_iters` steps bit-for-bit. Sign is
    canonicalized (the lowest nonzero dimension made positive).

    Output (ordered by j): j, v_mu (loading in µunits of the max-abs-
    normalized eigenvector; divide by 1e6 for unit scale).
    """
    rows = _cov_sums(emb, vec_col).collect()
    if not rows:
        return emb.sparkSession.createDataFrame([], "j int, v_mu bigint")
    d, _n, _M, v = _power_axis(rows, n_iters)
    return emb.sparkSession.createDataFrame(
        [(j, v[j]) for j in range(d)], "j int, v_mu bigint"
    )


def _power_axis(rows, n_iters: int) -> tuple[int, int, list[int], list[int]]:
    """The exact-integer power iteration over collected `_cov_sums`
    rows (shared by pca_top_component / pca_project). Returns
    (d, n, M, v): dimension, corpus count, µunit column sums, and the
    sign-canonicalized µunit axis."""
    d = max(r["k"] for r in rows) + 1
    n = int(rows[0]["n_d"])
    M = [0] * d
    A = [[0] * d for _ in range(d)]
    for r in rows:
        s = int(r["s_d"])
        a = n * s - int(r["mj_d"]) * int(r["mk_d"])
        A[r["j"]][r["k"]] = a
        A[r["k"]][r["j"]] = a
        M[r["j"]] = int(r["mj_d"])
        M[r["k"]] = int(r["mk_d"])
    v = [1_000_000] * d
    for _ in range(n_iters):
        w = [sum(A[j][k] * v[k] for k in range(d)) for j in range(d)]
        m = max(abs(x) for x in w)
        if m == 0:
            break
        v = [_imu_div(x, m) for x in w]
    lead = next((x for x in v if x != 0), 0)
    if lead < 0:
        v = [-x for x in v]
    return d, n, M, v


def pca_project(
    emb: DataFrame,
    vec_col: str = "embedding",
    n_iters: int = PCA_ITERS,
    key: str = "vec_id",
) -> DataFrame:
    """Project every corpus vector onto the dominant PCA axis — the
    APPLICATION step that closes the statistic → axis → scores loop
    (dimensionality reduction to the leading coordinate; the 1-d
    embedding curation dial: sort/bucket/stratify by principal score).

    Output (key-ascending): key, dot_mu (exact BIGINT Σ q_j·v_mu_j —
    the uncentered µ²-scale projection, partitioning-independent), and
    score = round(((x − x̄)·v̂), 6) — the CENTERED unit-scale
    projection, computed as (n·dot − M·v)/(n·1e12) with the numerator
    in EXACT integer arithmetic (decimal(38,0) / HUGEINT) and exactly
    ONE double division at the end (the round(6) family's single-float
    discipline).

    100 TB: the axis fit is `pca_top_component`'s one distributed pass
    (the d²-integer statistic); the axis then rides into a LITERAL
    d-array inside whole-stage codegen — projection is a shuffle-free
    map over the corpus (the statistic-sized-loop pattern: corpus work
    distributed, d-sized math driver-side)."""
    rows = _cov_sums(emb, vec_col).collect()
    if not rows:
        return emb.sparkSession.createDataFrame(
            [], f"{key} bigint, dot_mu bigint, score double")
    d, n, M, v = _power_axis(rows, n_iters)
    mv = sum(M[j] * v[j] for j in range(d))
    axis = "array(" + ",".join(f"{x}L" for x in v) + ")"
    dot = (f"aggregate(zip_with({_MU_EXPR.format(vec=vec_col)}, {axis},"
           " (a, b) -> a * b), 0L, (acc, x) -> acc + x)")
    return (
        emb.select(
            F.col(key),
            F.expr(dot).alias("dot_mu"),
        )
        .select(
            key,
            "dot_mu",
            F.round(
                (F.lit(n).cast("decimal(38,0)")
                 * F.col("dot_mu").cast("decimal(38,0)")
                 - F.lit(str(mv)).cast("decimal(38,0)")).cast("double")
                / F.lit(float(n) * 1e12),
                6,
            ).alias("score"),
        )
        .orderBy(key)
    )


def embedding_standardize(
    emb: DataFrame,
    vec_col: str = "embedding",
    key: str = "vec_id",
) -> DataFrame:
    """Per-dimension corpus standardization (diagonal whitening):
    z_j = (x_j − mean_j) / std_j — the preprocessing step before
    distance-based curation when dimensions have wildly different
    scales (population std, zero-variance dimensions emit z = 0).

    Output: (key, dim, z) EXPLODED rows, (key, dim)-ascending — flat
    scalar columns by the house registry rule (the driver's
    canonicalizer cannot hash array cells; multimodal_features
    precedent).

    Determinism: means/stds are computed ONCE from the exact integer
    `_cov_sums` diagonal (driver-side, the pca_project pattern) and
    enter the plan as LITERAL doubles; per-row work is then
    (q/1e6 − mean)/std with IEEE-only ops (division, subtraction,
    sqrt — all correctly rounded, no libm) + round(6), so both
    engines agree bit-for-bit.

    100 TB: one statistic pass (shared shape with
    embedding_covariance), then a shuffle-free projection+explode."""
    rows = _cov_sums(emb, vec_col).collect()
    if not rows:
        return emb.sparkSession.createDataFrame(
            [], f"{key} bigint, dim int, z double")
    diag = {r["j"]: r for r in rows if r["j"] == r["k"]}
    d = max(diag) + 1
    n = int(rows[0]["n_d"])
    means, stds = [], []
    for j in range(d):
        s, m = int(diag[j]["s_d"]), int(diag[j]["mj_d"])
        mean = m / n
        var = s / n - mean * mean
        means.append(mean / 1e6)
        stds.append((var ** 0.5) / 1e6 if var > 0 else 0.0)
    mean_arr = "array(" + ",".join(repr(x) + "D" for x in means) + ")"
    std_arr = "array(" + ",".join(repr(x) + "D" for x in stds) + ")"
    z = (f"transform({_MU_EXPR.format(vec=vec_col)}, (q, j) ->"
         f" CASE WHEN element_at({std_arr}, j + 1) = 0.0D THEN 0.0D"
         f" ELSE round((CAST(q AS DOUBLE) / 1e6"
         f"             - element_at({mean_arr}, j + 1))"
         f"            / element_at({std_arr}, j + 1), 6) END)")
    return (
        emb.select(F.col(key), F.posexplode(F.expr(z)).alias("dim", "z"))
        .orderBy(key, "dim")
    )


def embedding_standardize_sql(
    table: str = "embeddings",
    vec_col: str = "embedding",
    key: str = "vec_id",
) -> str:
    """DuckDB mirror of `embedding_standardize` (same integer diagonal
    statistic, same IEEE-only float pipeline)."""
    return f"""
        WITH q AS (
            SELECT {key},
                   [CAST(floor(CAST(x AS DOUBLE) * 1e6 + 0.5) AS BIGINT)
                    FOR x IN {vec_col}] AS qs
            FROM {table}
        ),
        diag AS (
            SELECT u.j AS j,
                   sum(qs[u.j + 1] * qs[u.j + 1]) AS s,
                   sum(qs[u.j + 1]) AS m,
                   count(*) AS n
            FROM q, unnest(generate_series(0, len(qs) - 1)) AS u(j)
            GROUP BY u.j
        ),
        stats AS (
            SELECT j,
                   (CAST(m AS DOUBLE) / n) / 1e6 AS mean,
                   CASE WHEN CAST(s AS DOUBLE) / n
                             - (CAST(m AS DOUBLE) / n)
                               * (CAST(m AS DOUBLE) / n) > 0
                        THEN sqrt(CAST(s AS DOUBLE) / n
                                  - (CAST(m AS DOUBLE) / n)
                                    * (CAST(m AS DOUBLE) / n)) / 1e6
                        ELSE 0.0 END AS std
            FROM diag
        )
        SELECT q.{key}, st.j AS dim,
               CASE WHEN st.std = 0 THEN 0.0
                    ELSE round((CAST(q.qs[st.j + 1] AS DOUBLE) / 1e6
                                - st.mean) / st.std, 6) END AS z
        FROM q JOIN stats st ON st.j < len(q.qs)
        ORDER BY 1, 2
    """


def _pca_axis_ctes(
    table: str, vec_col: str, n_iters: int
) -> tuple[str, str]:
    """The shared unrolled power-iteration CTE chain (q/pairs/a/v0..vN
    + flip). Returns (cte_body, final_v_name); consumers append their
    own CTEs/SELECT. Used by pca_top_component_sql and
    pca_project_sql."""
    steps = []
    prev = "v0"
    for i in range(1, n_iters + 1):
        steps.append(f"""
        w{i} AS MATERIALIZED (
            SELECT a.j AS jj, sum(a.a * {prev}.v) AS w
            FROM a JOIN {prev} ON {prev}.jj = a.k
            GROUP BY a.j
        ),
        m{i} AS MATERIALIZED (SELECT max(abs(w)) AS m FROM w{i}),
        v{i} AS MATERIALIZED (
            SELECT jj,
                   CASE WHEN (SELECT m FROM m{i}) = 0 THEN p.v
                        WHEN w < 0 THEN
                            -((-w * 1000000 + (SELECT m FROM m{i}) // 2)
                              // (SELECT m FROM m{i}))
                        ELSE (w * 1000000 + (SELECT m FROM m{i}) // 2)
                              // (SELECT m FROM m{i})
                   END AS v
            FROM w{i} JOIN {prev} p USING (jj)
        )""")
        prev = f"v{i}"
    steps_sql = ",".join(steps)
    body = f"""q AS MATERIALIZED (
            SELECT list_transform(
                       {vec_col},
                       x -> CAST(floor(CAST(x AS DOUBLE) * 1e6 + 0.5)
                                 AS BIGINT)
                   ) AS qs
            FROM {table}
        ),
        pairs AS MATERIALIZED (
            SELECT jj.j AS j, kk.k AS k,
                   CAST(count(*) AS HUGEINT) AS n,
                   CAST(sum(qs[jj.j + 1] * qs[kk.k + 1]) AS HUGEINT) AS s,
                   CAST(sum(qs[jj.j + 1]) AS HUGEINT) AS mj,
                   CAST(sum(qs[kk.k + 1]) AS HUGEINT) AS mk
            FROM q,
                 unnest(generate_series(0, len(qs) - 1)) AS jj(j),
                 unnest(generate_series(0, len(qs) - 1)) AS kk(k)
            WHERE kk.k >= jj.j
            GROUP BY jj.j, kk.k
        ),
        a AS MATERIALIZED (
            SELECT j, k, n * s - mj * mk AS a FROM pairs
            UNION ALL
            SELECT k, j, n * s - mj * mk FROM pairs WHERE k > j
        ),
        v0 AS (
            SELECT DISTINCT j AS jj, CAST(1000000 AS HUGEINT) AS v FROM a
        ),{steps_sql},
        flip AS (
            SELECT CASE WHEN (
                SELECT v FROM {prev}
                WHERE jj = (SELECT min(jj) FROM {prev} WHERE v <> 0)
            ) < 0 THEN -1 ELSE 1 END AS s
        )"""
    return body, prev


def pca_top_component_sql(
    table: str = "embeddings",
    vec_col: str = "embedding",
    n_iters: int = PCA_ITERS,
) -> str:
    """DuckDB mirror of `pca_top_component`: the same covariance pairs
    CTE, then `n_iters` unrolled matvec + max-abs half-up renormalize
    stages over exact HUGEINT arithmetic (the kmeans/bpe unrolled-CTE
    precedent). Magnitudes: |A| ≲ n²·µ²·d, |A·v| ≲ that ×1e6·d — far
    inside int128."""
    body, prev = _pca_axis_ctes(table, vec_col, n_iters)
    return f"""
        WITH {body}
        SELECT jj AS j, CAST(v * flip.s AS BIGINT) AS v_mu
        FROM {prev}, flip
        ORDER BY j
    """


def pca_project_sql(
    table: str = "embeddings",
    vec_col: str = "embedding",
    n_iters: int = PCA_ITERS,
    key: str = "vec_id",
) -> str:
    """DuckDB mirror of `pca_project`: the shared axis CTE chain, then
    M·v and per-row dots in exact HUGEINT, one double division +
    round(6) — identical float exposure to the Spark side."""
    body, prev = _pca_axis_ctes(table, vec_col, n_iters)
    return f"""
        WITH {body},
        axis AS (
            SELECT jj AS j, v * flip.s AS v_mu FROM {prev}, flip
        ),
        axis_list AS (
            SELECT list(v_mu ORDER BY j) AS av FROM axis
        ),
        mvec AS (
            SELECT j, max(mj) AS mj FROM pairs GROUP BY j
        ),
        consts AS (
            SELECT (SELECT max(n) FROM pairs) AS n,
                   (SELECT sum(m.mj * ax.v_mu)
                    FROM mvec m JOIN axis ax ON m.j = ax.j) AS mv
        ),
        scored AS (
            SELECT e.{key},
                   list_sum([ CAST(floor(CAST({vec_col}[i] AS DOUBLE)
                                         * 1e6 + 0.5) AS HUGEINT)
                              * av[i]
                              FOR i IN range(1, len({vec_col}) + 1) ])
                       AS dot
            FROM {table} e, axis_list
        )
        SELECT {key},
               CAST(dot AS BIGINT) AS dot_mu,
               round(CAST(consts.n * dot - consts.mv AS DOUBLE)
                     / (CAST(consts.n AS DOUBLE) * 1e12), 6) AS score
        FROM scored, consts
        ORDER BY 1
    """


def embedding_drift(
    emb: DataFrame,
    split_id: int,
    key: str = "vec_id",
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-label EMBEDDING DRIFT between two corpus slices (ids below /
    at-or-above `split_id` — the id split is the house time proxy, the
    semdedup_check convention): how far has each label's centroid
    moved? The drift monitor an embedding pipeline runs between corpus
    snapshots — a large shift flags upstream model/data change before
    it poisons dedup thresholds or ANN recall.

    Output per label present in BOTH halves: (label, n_first,
    n_second, d2_mu) — d2_mu is the EXACT integer squared L2 between
    the two centroid µ-vectors (the clustering.py distance
    discipline), label-ascending. Labels present in only one half are
    omitted (no pair to compare).

    100 TB: two label-keyed partial-agg passes (the label_centroids
    cost, one per half) + a (label, dim)-keyed equi-join of two
    labels×d tables — statistic-sized end to end."""
    halves = []
    for name, pred in (("a", F.col(key) < split_id),
                       ("b", F.col(key) >= split_id)):
        c = _centroid_mu(emb.filter(pred), label_col, vec_col)
        n = (emb.filter(pred).groupBy(F.col(label_col).alias("label"))
             .agg(F.count("*").alias(f"n_{name}")))
        halves.append((c.withColumnRenamed("cmu", f"cmu_{name}"), n))
    (ca, na), (cb, nb) = halves
    d2 = (
        ca.join(cb, ["label", "dim"])
        .groupBy("label")
        .agg(F.sum((F.col("cmu_a") - F.col("cmu_b"))
                   * (F.col("cmu_a") - F.col("cmu_b"))).alias("d2_mu"))
    )
    return (
        d2.join(na, "label").join(nb, "label")
        .select("label", F.col("n_a").alias("n_first"),
                F.col("n_b").alias("n_second"), "d2_mu")
        .orderBy("label")
    )


def embedding_drift_sql(
    table: str = "embeddings",
    split_id: int = 250,
    key: str = "vec_id",
    label_col: str = "label",
    vec_col: str = "embedding",
) -> str:
    """DuckDB mirror of `embedding_drift`."""
    a = _centroid_mu_sql(f"(SELECT * FROM {table} WHERE {key} < "
                         f"{split_id})", label_col, vec_col)
    b = _centroid_mu_sql(f"(SELECT * FROM {table} WHERE {key} >= "
                         f"{split_id})", label_col, vec_col)
    return f"""
        WITH ca AS ({a}), cb AS ({b}),
        na AS (SELECT {label_col} AS label, count(*) AS n_first
               FROM {table} WHERE {key} < {split_id} GROUP BY 1),
        nb AS (SELECT {label_col} AS label, count(*) AS n_second
               FROM {table} WHERE {key} >= {split_id} GROUP BY 1),
        d2 AS (
            SELECT ca.label,
                   sum((ca.cmu - cb.cmu) * (ca.cmu - cb.cmu)) AS d2_mu
            FROM ca JOIN cb ON ca.label = cb.label AND ca.dim = cb.dim
            GROUP BY 1
        )
        SELECT d2.label, na.n_first, nb.n_second,
               CAST(d2.d2_mu AS BIGINT) AS d2_mu
        FROM d2 JOIN na ON na.label = d2.label
        JOIN nb ON nb.label = d2.label
        ORDER BY d2.label
    """
