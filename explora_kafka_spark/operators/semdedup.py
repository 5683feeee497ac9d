"""SemDeDup — semantic (embedding-space) deduplication via cluster-local
pairwise cosine (Abbas et al. 2023, "SemDeDup: Data-efficient learning
at web-scale through semantic deduplication").

The published recipe, re-expressed Spark-first: k-means the corpus
embeddings (operators/clustering.py — the same deterministic Lloyd loop
that backs the IVF quantizer), then compare pairs ONLY within a cluster
— the clustering is what makes pairwise feasible at web scale (k ~ √n
clusters ⇒ expected O(n^1.5/k)≈O(n) within-cluster pairs instead of
O(n²) global pairs). Within each cluster, points are ranked farthest-
from-centroid first (the paper keeps the LOW-centroid-similarity
representative of each duplicate set) and a point is DROPPED iff some
earlier-ranked cluster-mate has cosine ≥ threshold — the official
implementation's sort-then-keep-first sweep, made deterministic here by
the (distance DESC, id ASC) tie-break.

Exact-integer cosine (the house µunit discipline,
operators/clustering.py): with µunit vectors, `cos(a,b) ≥ t/100` for
t > 0 is evaluated as `dot > 0 AND 10000·dot² ≥ t²·‖a‖²·‖b‖²` — dot
and the squared norms are BIGINT folds, the comparison is
DECIMAL(38,0) (≲ 6.6e32 for 64-dim µunit vectors, far inside 38
digits; DuckDB mirrors with HUGEINT). No float op anywhere, so the
DuckDB oracle matches bit-for-bit and the verdict is partitioning-
independent.

Reference parity: the reference engine has no embedding operators —
this is engine-extension surface per the task brief (the dedup family's
semantic tier, alongside exact/MinHash/SimHash in operators/dedup.py).

100 TB design: the Lloyd passes are the kmeans cost (one corpus pass
per iteration, broadcast centroids). The pair stage groups the
assignment by cid and runs an exact-integer numpy block kernel per
cluster (one Arrow batch per cluster — corpus-sized transfer, never
pair-sized; see the kernel block below for the exactness argument and
the measured 5-8× win over the SQL self-join form). Within-cluster
pairs only — never a cartesian. A pathologically hot cluster is one
task (a grouped kernel cannot be AQE-split the way the old cid
equi-join could): the k ~ √n sizing rule keeping expected cluster
size √n and the kmeans_sizes balance report are the guard. The drop
set is candidate-sized; the final verdict is one left-anti-style join
back to the assignment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import clustering as CL

_N2 = "aggregate(zip_with(m, m, (a, b) -> a * b), 0L, (acc, x) -> acc + x)"
_DOT = ("aggregate(zip_with(ma, mb, (a, b) -> a * b), 0L,"
        " (acc, x) -> acc + x)")

# ---------------------------------------------------------------------------
# Arrow pair-stage kernels.
#
# The within-cluster pair stage is dense integer matrix math (s×d block
# per cluster → s×s dot/d2 matrix). Expressing it per-pair in SQL — a
# cid self-join producing |pairs| rows, each evaluating a d-term
# dot/d2 — pays the pair-sized data volume AND per-element expression
# evaluation (interpreted for zip_with/aggregate; a flat d-term
# expression measured WORSE inside a filter where CollapseProject
# inlines it per reference). The memory-bank lesson from
# embedding_covariance applies: >~hundreds of array terms per row ⇒
# vectorize in an Arrow kernel. applyInPandas over cid groups ships
# CORPUS-sized Arrow batches (one s×d block per cluster, ~1 MB at
# sf0.1) instead of pair-sized join output, and numpy does the s×s
# block products in C. Measured at sf0.1 (n=2000, k=8): threshold
# pairs 3.3 s → 0.4 s, kNN graph 2.8 s → 0.5 s warm.
#
# Exactness (the house µunit discipline is NOT relaxed): d2 and dot
# are int64 numpy ops on µunit vectors (dot ≤ 6.6e13, d2 ≤ 2.6e14 for
# 64 dims — inside int64, no rounding anywhere). The cosine-threshold
# comparison 10000·dot² ≥ t²·n2a·n2b overflows int64, so candidates
# are prefiltered in float64 with a conservative 1e-9 relative margin
# (float64 is ~1e-16-accurate here, so no true pair can be lost) and
# every candidate is re-checked in exact arbitrary-precision Python
# ints before it is emitted. Results are therefore bit-identical to
# the SQL form and partitioning-independent (each cid group computes
# alone; row order is canonicalized by sorting on vid inside the
# kernel).
#
# 100 TB: one task per cluster; with the family's k ~ √n sizing a
# cluster block is √n×d (n=1e9, d=64 → 16 MB) and row-chunking (CH)
# bounds the transient s×CH product matrices. Trade-off vs the SQL
# join: AQE cannot split a single pathological mega-cluster across
# tasks (the join could) — the k ~ √n contract and the balance report
# (kmeans_sizes) are the guard; compute within the cluster is
# inherently pairwise either way.
# ---------------------------------------------------------------------------

_KNN_SCHEMA = "va long, vb long, rank int, d2_mu long"

#: Target rows per partition for the statistic-sized tables the
#: iterative graph loops (knn_pagerank, label_propagation) checkpoint
#: every round: 3-4 bigint columns ≈ 24-48 B/row, so 2M rows lands
#: partitions in the ~50-100 MB band (guide §2.2). The checkpointed
#: node/edge tables otherwise inherit the SESSION parallelism from the
#: embedding scan spread, so at bench scale every one of the ~7 stages
#: a round schedules ran 32 near-empty tasks over 2000 rows — pure
#: task-launch overhead (measured 5.5→3.9 s on knn_pagerank at sf0.1).
#: Scale-adaptive by construction: at corpus scale rows/2M partitions
#: keep real parallelism, and `_sized` only ever narrows (coalesce —
#: zero shuffle), never widens.
_ITER_ROWS_PER_PART = 2_000_000


def _sized(df: DataFrame, rows: int) -> DataFrame:
    """Coalesce an iteration table to ceil(rows / _ITER_ROWS_PER_PART)
    partitions when its current layout overshoots that."""
    p = max(1, -(-rows // _ITER_ROWS_PER_PART))
    return df.coalesce(p) if df.rdd.getNumPartitions() > p else df


def _cluster_block(pdf):
    """(vids sorted asc, int64 matrix M aligned to vids)."""
    import numpy as np

    vids = pdf["vid"].to_numpy()
    order = np.argsort(vids)
    vids = vids[order]
    M = np.stack(pdf["m"].to_numpy()[order]).astype(np.int64)
    return vids, M


def _knn_kernel(k: int, chunk: int = 1024):
    """Per-cluster exact kNN: for every vector its k nearest
    cluster-mates by integer squared L2, ties to the smaller neighbor
    id (lexsort on (d2, vid) — identical to the SQL window order)."""

    def kernel(pdf):
        import numpy as np
        import pandas as pd

        vids, M = _cluster_block(pdf)
        s = len(vids)
        kk = min(k, s - 1)
        if kk <= 0:
            return pd.DataFrame({
                "va": np.array([], dtype=np.int64),
                "vb": np.array([], dtype=np.int64),
                "rank": np.array([], dtype=np.int32),
                "d2_mu": np.array([], dtype=np.int64),
            })
        n2 = (M * M).sum(axis=1)
        va_o, vb_o, rk_o, d2_o = [], [], [], []
        big = np.iinfo(np.int64).max
        for lo in range(0, s, chunk):
            hi = min(lo + chunk, s)
            D = n2[lo:hi, None] + n2[None, :] - 2 * (M[lo:hi] @ M.T)
            for x in range(hi - lo):
                d = D[x].copy()
                d[lo + x] = big  # exclude self by position
                if s - 1 > kk:
                    # tie-safe top-k: argpartition, then widen to every
                    # element equal to the cut distance before ordering
                    part = np.argpartition(d, kk - 1)[:kk]
                    cut = d[part].max()
                    cand = np.nonzero(d <= cut)[0]
                else:
                    cand = np.nonzero(d < big)[0]
                sel = cand[np.lexsort((vids[cand], d[cand]))][:kk]
                va_o.extend([vids[lo + x]] * len(sel))
                vb_o.extend(vids[sel])
                rk_o.extend(range(1, len(sel) + 1))
                d2_o.extend(d[sel])
        return pd.DataFrame({
            "va": np.asarray(va_o, dtype=np.int64),
            "vb": np.asarray(vb_o, dtype=np.int64),
            "rank": np.asarray(rk_o, dtype=np.int32),
            "d2_mu": np.asarray(d2_o, dtype=np.int64),
        })

    return kernel


def _threshold_hits(vids, M, t2, chunk=1024):
    """(ia, ib) index pairs (positions into vids/M, ia != ib, one
    direction only: ia < ib by POSITION — callers map positions to
    their own order) whose exact integer cosine² clears t2/10000.
    Float64 prefilter with margin + exact Python-int recheck."""
    import numpy as np

    n2 = (M * M).sum(axis=1)
    n2f = n2.astype(np.float64)
    out = []
    s = len(vids)
    for lo in range(0, s, chunk):
        hi = min(lo + chunk, s)
        D = M[lo:hi] @ M.T
        Df = D.astype(np.float64)
        lhs = 10000.0 * Df * Df
        rhs = float(t2) * n2f[lo:hi, None] * n2f[None, :]
        cand = (D > 0) & (lhs >= rhs * (1.0 - 1e-9))
        # one direction only: global position ia < ib
        cand &= np.arange(s)[None, :] > (lo + np.arange(hi - lo))[:, None]
        ia, ib = np.nonzero(cand)
        for x, y in zip(ia, ib):
            gx = lo + int(x)
            gy = int(y)
            d = int(D[x, y])
            if d > 0 and 10000 * d * d >= t2 * int(n2[gx]) * int(n2[gy]):
                out.append((gx, gy))
    return out


def _pairs_kernel(t2: int):
    """Per-cluster id-ordered threshold pairs: (va, vb) with va < vb
    and exact integer cos² ≥ t2/10000 (the _threshold_pairs edge set)."""

    def kernel(pdf):
        import numpy as np
        import pandas as pd

        vids, M = _cluster_block(pdf)
        hits = _threshold_hits(vids, M, t2) if len(vids) > 1 else []
        # vids sorted asc ⇒ position order IS id order
        return pd.DataFrame({
            "va": np.asarray([vids[i] for i, _ in hits], dtype=np.int64),
            "vb": np.asarray([vids[j] for _, j in hits], dtype=np.int64),
        })

    return kernel


def _dropped_kernel(t2: int):
    """Per-cluster SemDeDup drop set: vid is dropped iff some
    EARLIER-RANKED cluster-mate (farthest-from-centroid first,
    (_d2 DESC, vid ASC) — the paper's sweep order) is within the
    threshold. Emits distinct dropped vids."""

    def kernel(pdf):
        import numpy as np
        import pandas as pd

        vids, M = _cluster_block(pdf)
        if len(vids) < 2:
            return pd.DataFrame({"vid": np.array([], dtype=np.int64)})
        # rank: _d2 DESC, vid ASC — vids already ASC, so a stable sort
        # on -_d2 preserves the vid tie-break
        d2c = pdf.sort_values("vid")["_d2"].to_numpy()
        rank_of = np.empty(len(vids), dtype=np.int64)
        order = np.argsort(-d2c, kind="stable")
        rank_of[order] = np.arange(len(vids))
        dropped = set()
        for i, j in _threshold_hits(vids, M, t2):
            # the LATER-ranked side of the pair is the duplicate
            dropped.add(vids[j] if rank_of[j] > rank_of[i] else vids[i])
        return pd.DataFrame({
            "vid": np.asarray(sorted(dropped), dtype=np.int64)})

    return kernel


def semantic_dedup(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    threshold_pct: int = 95,
    key: str = "vec_id",
    vec_col: str = "embedding",
    n_rows: int | None = None,
) -> DataFrame:
    """Per-vector SemDeDup verdict: (key, cluster, keep), key-ascending.

    `threshold_pct` is the cosine threshold as an integer percent
    (95 ⇒ cos ≥ 0.95) — kept rational so the comparison stays exact
    integer arithmetic. Inherits the kmeans dense-id stride-init
    contract (clustering.py): on a sparse/shifted id subset, re-key
    with row_number first or the seeding degenerates (and ONE cluster
    would make the pair stage all-pairs — tools/bench_scale.py shows
    the re-keyed pattern). keep=false means an earlier-ranked (farther-
    from-centroid, id-tie-broken) cluster-mate is within the threshold
    and this vector is the semantic duplicate to discard."""
    assigned, _ = CL._final_assignment(emb, k, iters, key, vec_col,
                                       n_rows)
    t2 = threshold_pct * threshold_pct
    dropped = (
        assigned.select("cid", "vid", "m", "_d2")
        .groupBy("cid")
        .applyInPandas(_dropped_kernel(t2), "vid long")
        .withColumn("_dup", F.lit(True))
    )
    return (
        assigned.join(dropped, "vid", "left")
        .select(
            F.col("vid").alias(key),
            F.col("cid").alias("cluster"),
            F.coalesce(~F.col("_dup"), F.lit(True)).alias("keep"),
        )
        .orderBy(key)
    )


def _threshold_pairs(
    emb: DataFrame,
    k: int,
    iters: int,
    threshold_pct: int,
    key: str,
    vec_col: str,
    n_rows: int | None,
) -> DataFrame:
    """(va, vb) with va < vb: every within-cluster pair at or above the
    cosine threshold — the undirected semantic edge set shared by
    semantic_groups (and the id-ordered twin of semantic_dedup's
    rank-ordered sweep)."""
    assigned, _ = CL._final_assignment(emb, k, iters, key, vec_col,
                                       n_rows)
    t2 = threshold_pct * threshold_pct
    return (
        assigned.select("cid", "vid", "m")
        .groupBy("cid")
        .applyInPandas(_pairs_kernel(t2), "va long, vb long")
    )


def build_semantic_index(
    emb: DataFrame,
    path: str,
    k: int = 8,
    iters: int = 2,
    threshold_pct: int = 95,
    key: str = "vec_id",
    vec_col: str = "embedding",
    n_rows: int | None = None,
) -> None:
    """Materialize the corpus's SemDeDup state once per corpus
    snapshot — the incremental twin of `semantic_dedup`, for the "is
    this incoming batch a semantic duplicate of anything we already
    hold?" question a continuously-growing corpus asks on every ingest
    (the dedup.build_dedup_index / contamination index precedent, now
    for the embedding tier).

    Layout: `{path}/centroids` (cid, cm — the FINAL Lloyd centroids,
    k×d, so new vectors assign exactly as the corpus did) and
    `{path}/reps` hive-partitioned by cid (vid, m, n2 — only the KEPT
    representatives; duplicates-of-duplicates add no checking power
    and are not stored). Without the index every batch pays a full
    corpus re-cluster; with it a batch pays one broadcast assignment +
    an equi-join against its probed partitions only."""
    assigned, cent = CL._final_assignment(emb, k, iters, key, vec_col,
                                          n_rows)
    t2 = threshold_pct * threshold_pct
    dropped = (
        assigned.select("cid", "vid", "m", "_d2")
        .groupBy("cid")
        .applyInPandas(_dropped_kernel(t2), "vid long")
    )
    cent.write.mode("overwrite").parquet(f"{path}/centroids")
    (assigned.select("vid", "cid", "m", F.expr(_N2).alias("n2"))
     .join(dropped, "vid", "left_anti")
     .repartition("cid")
     .write.mode("overwrite").partitionBy("cid")
     .parquet(f"{path}/reps"))


def semdedup_check(
    spark,
    batch: DataFrame,
    index_path: str,
    threshold_pct: int = 95,
    key: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Check an incoming batch against a materialized semantic index
    WITHOUT rescanning the corpus: assign each batch vector to its
    nearest stored centroid (the exact `clustering._assign` argmin, so
    assignment is identical to what the corpus build did), then
    equi-join the probed cluster's stored representatives and apply
    the exact integer cosine threshold.

    Output (key-ascending): key, cluster, is_dup, match_id — match_id
    is the SMALLEST matching representative id (NULL when none). A
    batch admission gate keeps `NOT is_dup` rows (the
    streaming/corpus_gate composition point).

    100 TB: the centroid table is k×d (broadcast); the reps join is an
    equi-join on cid — a batch touches only the partitions its vectors
    assign to, cost independent of corpus size (the
    ann_topk_ivf_indexed serving shape)."""
    cent = spark.read.parquet(f"{index_path}/centroids")
    mu = batch.select(
        F.col(key).alias("vid"),
        F.expr(CL._MU_COL.format(vec=vec_col)).alias("m"),
    )
    assigned = CL._assign(mu, cent).select(
        "vid", "cid", "m", F.expr(_N2).alias("n2"))
    reps = spark.read.parquet(f"{index_path}/reps").select(
        F.col("cid").cast("int").alias("cid"),
        F.col("vid").alias("rep_id"),
        F.col("m").alias("mr"), F.col("n2").alias("n2r"))
    t2 = threshold_pct * threshold_pct
    hits = (
        assigned.select(F.col("vid"), F.col("cid"),
                        F.col("m").alias("ma"),
                        F.col("n2").alias("n2a"))
        .join(reps, "cid")
        .withColumn("_dot", F.expr(
            "aggregate(zip_with(ma, mr, (a, b) -> a * b), 0L,"
            " (acc, x) -> acc + x)"))
        .filter(
            (F.col("_dot") > 0)
            & (F.expr("CAST(_dot AS DECIMAL(38,0)) * CAST(_dot AS"
                      " DECIMAL(38,0)) * 10000")
               >= F.expr(f"CAST({t2} AS DECIMAL(38,0))"
                         " * CAST(n2a AS DECIMAL(38,0))"
                         " * CAST(n2r AS DECIMAL(38,0))"))
        )
        .groupBy("vid")
        .agg(F.min("rep_id").alias("match_id"))
    )
    return (
        assigned.join(hits, "vid", "left")
        .select(
            F.col("vid").alias(key),
            F.col("cid").alias("cluster"),
            F.col("match_id").isNotNull().alias("is_dup"),
            "match_id",
        )
        .orderBy(key)
    )


def cluster_top_terms(
    docs: DataFrame,
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    top: int = 5,
    min_len: int = 3,
    key: str = "doc_id",
    vec_key: str = "vec_id",
    n_rows: int | None = None,
) -> DataFrame:
    """Label each embedding cluster with its dominant document terms —
    the interpretability report a curator reads after clustering ("what
    IS cluster 3?"): per cluster, the `top` most frequent tokens of at
    least `min_len` chars (the cheap stopword guard) across the
    cluster's documents, joined on the vec_id == doc_id contract
    (the dedup_ensemble cross-modal convention).

    Output (cluster, rank, token, n), (cluster, rank)-ascending; ties
    break token-ascending. Clusters whose documents are all
    short-token emit fewer than `top` rows.

    100 TB: the kmeans cost + one token explode feeding a
    (cluster, token) partial agg (map-side combined — exactly the
    token_frequency shuffle with a cluster prefix), then a per-cluster
    TopK window over vocab-sized rows (WindowGroupLimit pushdown)."""
    from .text import tokens_col

    clusters = CL.kmeans(emb, k, iters, vec_key, "embedding", n_rows) \
        .select(F.col(vec_key).alias(key), "cluster")
    toks = (
        docs.select(key, F.explode(tokens_col("text")).alias("token"))
        .filter(F.length("token") >= min_len)
    )
    counts = (
        toks.join(clusters, key)
        .groupBy("cluster", "token")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("cluster").orderBy(F.col("n").desc(),
                                              F.col("token").asc())
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top)
        .select("cluster", "rank", "token", "n")
        .orderBy("cluster", "rank")
    )


def cluster_top_terms_sql(
    doc_table: str = "documents",
    emb_table: str = "embeddings",
    k: int = 8,
    iters: int = 2,
    top: int = 5,
    min_len: int = 3,
    key: str = "doc_id",
    vec_key: str = "vec_id",
    n_rows: int = 500,
) -> str:
    """DuckDB mirror of `cluster_top_terms` (shared Lloyd CTEs + the
    same tokenize/filter/count/rank)."""
    from .text import tokens_sql

    ctes, last = CL.kmeans_ctes(emb_table, k, iters, vec_key,
                                "embedding", n_rows)
    toks = tokens_sql("text")
    ctes.append(f"""ctoks AS (
        SELECT a.cid AS cluster, u.token
        FROM {doc_table} d
        JOIN {last} a ON d.{key} = a.vid,
        unnest({toks}) AS u(token)
        WHERE len(u.token) >= {min_len}
    )""")
    ctes.append("""ccounts AS (
        SELECT cluster, token, count(*) AS n
        FROM ctoks GROUP BY cluster, token
    )""")
    return ("WITH " + ",\n".join(ctes) + f"""
        SELECT cluster, rank, token, n FROM (
            SELECT cluster, token, n,
                   row_number() OVER (PARTITION BY cluster
                                      ORDER BY n DESC, token ASC)
                       AS rank
            FROM ccounts
        ) WHERE rank <= {top}
        ORDER BY 1, 2""")


def update_semantic_index(
    spark,
    batch: DataFrame,
    index_path: str,
    threshold_pct: int = 95,
    key: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Admit a checked batch INTO the index: vectors that pass
    `semdedup_check` (no stored rep within the threshold) are appended
    to the reps store as new representatives, so later batches dedup
    against them too — the index lifecycle step that makes the
    semantic tier truly incremental (build once → check/update per
    ingest; the corpus is still never re-scanned).

    Returns the check verdict it acted on (key, cluster, is_dup,
    match_id); rows with is_dup=false are now in the index. Within a
    single batch, mutual near-dups BOTH pass against the stored reps
    and are BOTH admitted — intra-batch dedup is semantic_dedup's job
    upstream (run the batch through it first when batches are large);
    re-checking the same batch after the update flags every row.

    Centroids are NOT re-fit (the stored quantizer keeps assignment
    stable — the IVF-index convention); re-fit = rebuild on the next
    corpus snapshot. Append is partition-wise parquet (only the
    partitions the batch touches gain files)."""
    # eager checkpoint BEFORE the append: the verdict must be frozen
    # against the pre-update reps — a lazy plan re-evaluated after the
    # write would see the batch's own rows in the index
    verdict = semdedup_check(spark, batch, index_path, threshold_pct,
                             key, vec_col).localCheckpoint(eager=True)
    mu = batch.select(
        F.col(key).alias("vid"),
        F.expr(CL._MU_COL.format(vec=vec_col)).alias("m"),
    ).withColumn("n2", F.expr(_N2))
    admitted = (
        verdict.filter(~F.col("is_dup"))
        .select(F.col(key).alias("vid"),
                F.col("cluster").alias("cid"))
        .join(mu, "vid")
        .select("vid", "m", "n2", "cid")
    )
    (admitted.repartition("cid")
     .write.mode("append").partitionBy("cid")
     .parquet(f"{index_path}/reps"))
    return verdict


def semdedup_check_sql(
    table: str = "embeddings",
    split_id: int = 250,
    k: int = 8,
    iters: int = 2,
    threshold_pct: int = 95,
    key: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB mirror of the build-on-first-half / check-second-half
    driver entry: the shared Lloyd CTEs run on `{key} < split_id`
    (dense ids, so the stride contract holds), kept reps via the
    semantic_dedup sweep, then the batch (`{key} >= split_id`)
    assigns against the FINAL centroid CTE (c{iters-1}) and joins the
    reps — all exact HUGEINT."""
    half = f"(SELECT * FROM {table} WHERE {key} < {split_id})"
    ctes, last = CL.kmeans_ctes(half, k, iters, key, vec_col,
                                n_rows=split_id)
    t2 = threshold_pct * threshold_pct
    dot_ab = ("list_sum([ CAST(a.m[i] AS HUGEINT) * b.m[i]"
              " FOR i IN range(1, len(a.m) + 1) ])")
    cent = f"c{iters - 1}" if iters > 1 else "c0"
    ctes.append(f"""ranked AS (
        SELECT vid, cid, m,
               list_sum([ CAST(m[i] AS HUGEINT) * m[i]
                          FOR i IN range(1, len(m) + 1) ]) AS n2,
               row_number() OVER (PARTITION BY cid
                                  ORDER BY _d2 DESC, vid ASC) AS r
        FROM {last}
    )""")
    ctes.append(f"""dropped AS (
        SELECT DISTINCT b.vid
        FROM ranked a JOIN ranked b ON a.cid = b.cid AND a.r < b.r
        WHERE {dot_ab} > 0
          AND 10000 * ({dot_ab}) * ({dot_ab}) >= {t2} * a.n2 * b.n2
    )""")
    ctes.append("""reps AS (
        SELECT r.vid AS rep_id, r.cid, r.m AS mr, r.n2 AS n2r
        FROM ranked r LEFT JOIN dropped d ON r.vid = d.vid
        WHERE d.vid IS NULL
    )""")
    ctes.append(f"""batch AS (
        SELECT {key} AS vid,
               [CAST(floor(CAST(x AS DOUBLE) * 1e6 + 0.5) AS BIGINT)
                FOR x IN {vec_col}] AS m
        FROM {table} WHERE {key} >= {split_id}
    )""")
    d2 = ("list_sum([ (e.m[i] - c.cm[i]) * (e.m[i] - c.cm[i])"
          " FOR i IN range(1, len(e.m) + 1) ])")
    ctes.append(f"""bassign AS (
        SELECT vid, m, cid,
               list_sum([ CAST(m[i] AS HUGEINT) * m[i]
                          FOR i IN range(1, len(m) + 1) ]) AS n2
        FROM (
            SELECT e.vid, e.m, c.cid,
                   row_number() OVER (PARTITION BY e.vid
                       ORDER BY {d2} ASC, c.cid ASC) AS rn
            FROM batch e, {cent} c
        ) WHERE rn = 1
    )""")
    dot_ar = ("list_sum([ CAST(a.m[i] AS HUGEINT) * r.mr[i]"
              " FOR i IN range(1, len(a.m) + 1) ])")
    ctes.append(f"""hits AS (
        SELECT a.vid, min(r.rep_id) AS match_id
        FROM bassign a JOIN reps r ON a.cid = r.cid
        WHERE {dot_ar} > 0
          AND 10000 * ({dot_ar}) * ({dot_ar}) >= {t2} * a.n2 * r.n2r
        GROUP BY a.vid
    )""")
    return ("WITH " + ",\n".join(ctes) + f"""
        SELECT b.vid AS {key}, b.cid AS cluster,
               (h.match_id IS NOT NULL) AS is_dup, h.match_id
        FROM bassign b LEFT JOIN hits h ON b.vid = h.vid
        ORDER BY 1""")


def semdedup_check_audit(
    spark,
    emb: DataFrame,
    index_path: str,
    split_id: int,
    k: int = 8,
    iters: int = 2,
    threshold_pct: int = 95,
    key: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Price the incremental trade: how does checking a batch against
    the FROZEN first-half index (`semdedup_check`) compare to the
    oracle-expensive alternative — re-running `semantic_dedup` over
    the WHOLE union corpus? The two differ legitimately (the union
    re-fit moves centroids and the batch's vectors can dedup against
    EACH OTHER in the one-shot), and this audit quantifies that gap —
    the dedup_recall / ann_recall precedent for the semantic tier.

    Output: ONE row (n_batch, inc_flagged, oneshot_dropped, both,
    only_incremental, only_oneshot) over the `key >= split_id` batch.

    100 TB: audit-only — it contains the full-union semantic_dedup by
    construction (you run it on a sample/snapshot to price the drift,
    not per ingest)."""
    inc = semdedup_check(
        spark, emb.filter(F.col(key) >= split_id), index_path,
        threshold_pct, key, vec_col,
    ).select(F.col(key).alias("vid"), F.col("is_dup").alias("inc"))
    one = semantic_dedup(emb, k, iters, threshold_pct, key, vec_col) \
        .filter(F.col(key) >= split_id) \
        .select(F.col(key).alias("vid"), (~F.col("keep")).alias("os"))
    return (
        inc.join(one, "vid")
        .agg(
            F.count("*").alias("n_batch"),
            F.sum(F.col("inc").cast("long")).alias("inc_flagged"),
            F.sum(F.col("os").cast("long")).alias("oneshot_dropped"),
            F.sum((F.col("inc") & F.col("os")).cast("long"))
             .alias("both"),
            F.sum((F.col("inc") & ~F.col("os")).cast("long"))
             .alias("only_incremental"),
            F.sum((~F.col("inc") & F.col("os")).cast("long"))
             .alias("only_oneshot"),
        )
    )


def semdedup_check_audit_sql(
    table: str = "embeddings",
    split_id: int = 250,
    k: int = 8,
    iters: int = 2,
    threshold_pct: int = 95,
    key: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB mirror: the composed check + full-union dedup mirrors as
    derived tables, aggregated to the same one-row report."""
    chk = semdedup_check_sql(table, split_id, k, iters, threshold_pct,
                             key, vec_col)
    one = semantic_dedup_sql(table, k, iters, threshold_pct, key,
                             vec_col, n_rows=2 * split_id)
    return f"""
        SELECT count(*) AS n_batch,
               CAST(sum(CASE WHEN c.is_dup THEN 1 ELSE 0 END)
                    AS BIGINT) AS inc_flagged,
               CAST(sum(CASE WHEN NOT o.keep THEN 1 ELSE 0 END)
                    AS BIGINT) AS oneshot_dropped,
               CAST(sum(CASE WHEN c.is_dup AND NOT o.keep
                             THEN 1 ELSE 0 END) AS BIGINT) AS both,
               CAST(sum(CASE WHEN c.is_dup AND o.keep THEN 1 ELSE 0 END)
                    AS BIGINT) AS only_incremental,
               CAST(sum(CASE WHEN NOT c.is_dup AND NOT o.keep
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS only_oneshot
        FROM ({chk}) c
        JOIN ({one}) o ON c.{key} = o.{key}
        WHERE o.{key} >= {split_id}
    """


def semdedup_sweep(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    rungs: tuple[int, ...] = (10, 20, 30, 40, 50, 60, 70, 80, 90),
    key: str = "vec_id",
    vec_col: str = "embedding",
    n_rows: int | None = None,
) -> DataFrame:
    """Price the SemDeDup threshold dial: keep/drop counts at every
    rung from ONE pair scan (the tune_nprobe shared-scan shape —
    operators/similarity.py). Output (threshold_pct, n_dropped,
    n_kept), rung-ascending; each row is exactly what
    `semantic_dedup(threshold_pct=rung)` would produce, because the
    farthest-first rank order is threshold-independent: a vector is
    dropped at rung t iff its best earlier-ranked cluster-mate cosine
    reaches t, so one per-vector MAX-TIER aggregate prices every rung.

    Exact integers throughout: each pair's tier is the largest rung
    whose squared comparison holds (a monotone WHEN-chain of the
    semantic_dedup predicate — no sqrt, no floats); rung fan-out is a
    literal-array filter+explode, no join against the pair set.

    100 TB: the pair stage is the one semantic_dedup cid equi-join;
    everything after is per-vector aggregates and a ≤|rungs|-row
    result. The corpus count is the same single scalar kmeans already
    takes for its stride."""
    if n_rows is None:
        n_rows = emb.count()
    assigned, _ = CL._final_assignment(emb, k, iters, key, vec_col,
                                       n_rows)
    w = Window.partitionBy("cid").orderBy(F.col("_d2").desc(),
                                          F.col("vid").asc())
    ranked = assigned.select(
        "vid", "cid", "m",
        F.expr(_N2).alias("n2"),
        F.row_number().over(w).alias("r"),
    )
    a = ranked.select(F.col("cid"), F.col("r").alias("ra"),
                      F.col("m").alias("ma"), F.col("n2").alias("n2a"))
    b = ranked.select(F.col("cid"),
                      F.col("vid").alias("vb"), F.col("r").alias("rb"),
                      F.col("m").alias("mb"), F.col("n2").alias("n2b"))
    tier = None
    for t in sorted(rungs):
        t2 = t * t
        pred = (F.expr("CAST(_dot AS DECIMAL(38,0)) * CAST(_dot AS"
                       " DECIMAL(38,0)) * 10000")
                >= F.expr(f"CAST({t2} AS DECIMAL(38,0))"
                          " * CAST(n2a AS DECIMAL(38,0))"
                          " * CAST(n2b AS DECIMAL(38,0))"))
        tier = F.when(pred, F.lit(t)) if tier is None \
            else F.when(pred, F.lit(t)).otherwise(tier)
    max_tier = (
        a.join(b, "cid")
        .filter(F.col("ra") < F.col("rb"))
        .withColumn("_dot", F.expr(_DOT))
        .filter(F.col("_dot") > 0)
        .withColumn("_tier", tier)
        .filter(F.col("_tier") > 0)
        .groupBy("vb")
        .agg(F.max("_tier").alias("mx"))
    )
    rung_lit = "array(" + ",".join(str(t) for t in sorted(rungs)) + ")"
    drops = (
        max_tier.select(F.explode(F.expr(
            f"filter({rung_lit}, t -> t <= mx)")).alias("threshold_pct"))
        .groupBy("threshold_pct")
        .agg(F.count("*").alias("n_dropped"))
    )
    spine = emb.sparkSession.createDataFrame(
        [(t,) for t in sorted(rungs)], "threshold_pct int")
    return (
        spine.join(F.broadcast(drops), "threshold_pct", "left")
        .select(
            "threshold_pct",
            F.coalesce("n_dropped", F.lit(0)).alias("n_dropped"),
            (F.lit(n_rows) - F.coalesce("n_dropped", F.lit(0)))
            .alias("n_kept"),
        )
        .orderBy("threshold_pct")
    )


def semdedup_sweep_sql(
    table: str = "embeddings",
    k: int = 8,
    iters: int = 2,
    rungs: tuple[int, ...] = (10, 20, 30, 40, 50, 60, 70, 80, 90),
    key: str = "vec_id",
    vec_col: str = "embedding",
    n_rows: int = 500,
) -> str:
    """DuckDB mirror: shared Lloyd CTEs + the same rank / pair tier /
    rung fan-out (HUGEINT predicates)."""
    ctes, last = CL.kmeans_ctes(table, k, iters, key, vec_col, n_rows)
    dot = ("list_sum([ CAST(a.m[i] AS HUGEINT) * b.m[i]"
           " FOR i IN range(1, len(a.m) + 1) ])")
    tiers = " ".join(
        f"WHEN 10000 * _dot * _dot >= {t * t} * n2a * n2b THEN {t}"
        for t in sorted(rungs, reverse=True))
    rung_list = "[" + ",".join(str(t) for t in sorted(rungs)) + "]"
    ctes.append(f"""ranked AS (
        SELECT vid, cid, m,
               list_sum([ CAST(m[i] AS HUGEINT) * m[i]
                          FOR i IN range(1, len(m) + 1) ]) AS n2,
               row_number() OVER (PARTITION BY cid
                                  ORDER BY _d2 DESC, vid ASC) AS r
        FROM {last}
    )""")
    ctes.append(f"""pair_tier AS (
        SELECT vb, CASE {tiers} ELSE 0 END AS tier
        FROM (SELECT b.vid AS vb, {dot} AS _dot,
                     a.n2 AS n2a, b.n2 AS n2b
              FROM ranked a JOIN ranked b
                ON a.cid = b.cid AND a.r < b.r)
        WHERE _dot > 0
    )""")
    ctes.append("""mxv AS (
        SELECT vb, max(tier) AS mxt FROM pair_tier
        WHERE tier > 0 GROUP BY vb
    )""")
    ctes.append(f"""drops AS (
        SELECT u.t AS threshold_pct, count(*) AS n_dropped
        FROM (SELECT list_filter({rung_list}, t -> t <= mxt) AS ts
              FROM mxv), unnest(ts) AS u(t)
        GROUP BY u.t
    )""")
    return ("WITH " + ",\n".join(ctes) + f"""
        SELECT s.t AS threshold_pct,
               coalesce(d.n_dropped, 0) AS n_dropped,
               {n_rows} - coalesce(d.n_dropped, 0) AS n_kept
        FROM unnest({rung_list}) AS s(t)
        LEFT JOIN drops d ON s.t = d.threshold_pct
        ORDER BY 1""")


def semantic_groups(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    threshold_pct: int = 95,
    key: str = "vec_id",
    vec_col: str = "embedding",
    n_rows: int | None = None,
) -> DataFrame:
    """Semantic duplicate GROUPS: connected components over the
    within-cluster cosine-threshold edge set — the embedding-space twin
    of dedup_groups (MinHash/Jaccard edges → CC), sharing its
    pointer-jumping min-label propagation (operators/dedup.py
    connected_components). Output (key, group_id) for EVERY vector;
    `group_id == key` rows are the canonical representatives.

    Where semantic_dedup answers "which rows do I drop" with the
    paper's keep-farthest sweep, this exposes the full group structure
    (for corpus assembly, group-aware splits, and audit), transitively
    closed — A~B, B~C groups {A,B,C} even when cos(A,C) < t.

    100 TB: the edge set is the semantic_dedup pair stage (per-cluster
    exact-integer numpy kernel, candidate-sized output); CC is O(log n)
    pointer-jumping rounds
    over edge endpoints only. Inherits the kmeans dense-id contract."""
    from .dedup import connected_components

    edges = _threshold_pairs(emb, k, iters, threshold_pct, key, vec_col,
                             n_rows).select(
        F.col("va").alias("doc_a"), F.col("vb").alias("doc_b"))
    nodes = emb.select(F.col(key).alias("doc_id"))
    return (
        connected_components(nodes, edges)
        .select(F.col("doc_id").alias(key),
                F.col("group_id").alias("group_id"))
        .orderBy(key)
    )


def semantic_groups_sql(
    table: str = "embeddings",
    k: int = 8,
    iters: int = 2,
    threshold_pct: int = 95,
    key: str = "vec_id",
    vec_col: str = "embedding",
    n_rows: int = 500,
) -> str:
    """DuckDB mirror: shared Lloyd CTEs + the identical integer-cosine
    edge set + a recursive-CTE transitive closure (min reachable id —
    the dedup_groups_sql pattern)."""
    ctes, last = CL.kmeans_ctes(table, k, iters, key, vec_col, n_rows)
    t2 = threshold_pct * threshold_pct
    dot = ("list_sum([ CAST(a.m[i] AS HUGEINT) * b.m[i]"
           " FOR i IN range(1, len(a.m) + 1) ])")
    ctes.append(f"""n2t AS (
        SELECT vid, cid, m,
               list_sum([ CAST(m[i] AS HUGEINT) * m[i]
                          FOR i IN range(1, len(m) + 1) ]) AS n2
        FROM {last}
    )""")
    ctes.append(f"""sem_pairs AS (
        SELECT a.vid AS va, b.vid AS vb
        FROM n2t a JOIN n2t b ON a.cid = b.cid AND a.vid < b.vid
        WHERE {dot} > 0
          AND 10000 * ({dot}) * ({dot}) >= {t2} * a.n2 * b.n2
    )""")
    ctes.append("""e AS (
        SELECT va AS a, vb AS b FROM sem_pairs
        UNION ALL
        SELECT vb, va FROM sem_pairs
    )""")
    ctes.append(f"""reach(a, b) AS (
        SELECT {key}, {key} FROM {table}
        UNION
        SELECT e.a, r.b FROM e JOIN reach r ON r.a = e.b
    )""")
    return ("WITH RECURSIVE " + ",\n".join(ctes) + f"""
        SELECT a AS {key}, min(b) AS group_id FROM reach GROUP BY a
        ORDER BY 1""")


def knn_graph(
    emb: DataFrame,
    k_clusters: int = 8,
    iters: int = 2,
    k: int = 5,
    key: str = "vec_id",
    vec_col: str = "embedding",
    n_rows: int | None = None,
) -> DataFrame:
    """Cluster-local k-nearest-neighbor graph over the embedding corpus:
    for every vector, its `k` nearest CLUSTER-MATES by exact integer
    squared L2 (µunit² BIGINT — sortable without a single float op,
    ties to the smaller neighbor id). Output: (key, neighbor_id, rank,
    d2_mu), (key, rank)-ascending.

    This is the curation graph primitive: SemDeDup-style neighborhood
    analysis, graph-connectivity diversity metrics, label propagation,
    and duplicate-cluster visualization all consume it. Cluster-local =
    the IVF nprobe=1 approximation of the global kNN graph — the same
    accuracy/cost dial as the ANN family (operators/similarity.py),
    with recall priced there. Vectors in singleton clusters emit no
    rows (no cluster-mates).

    100 TB design: identical to semantic_dedup — Lloyd passes plus one
    per-cluster exact-integer numpy block kernel (within-cluster pairs
    only, O(n·E[cluster_size]) products with k_clusters ~ √n, Arrow
    transfer corpus-sized; tie-safe top-k via argpartition + widened
    lexsort, identical to the SQL (d2 ASC, vb ASC) window order).
    Inherits the kmeans dense-id contract (re-key sparse ids first)."""
    assigned, _ = CL._final_assignment(emb, k_clusters, iters, key,
                                       vec_col, n_rows)
    return (
        assigned.select("cid", "vid", "m")
        .groupBy("cid")
        .applyInPandas(_knn_kernel(k), _KNN_SCHEMA)
        .select(F.col("va").alias(key), F.col("vb").alias("neighbor_id"),
                "rank", "d2_mu")
        .orderBy(key, "rank")
    )


#: exact integer squared-L2 between two µunit vectors a.m / b.m — the
#: single source of truth for every kNN-family SQL mirror below
_D2_SQL = ("list_sum([ (a.m[i] - b.m[i]) * (a.m[i] - b.m[i])"
           " FOR i IN range(1, len(a.m) + 1) ])")


def _knn_pairs_subquery(last: str) -> str:
    """The ranked within-cluster pair subquery every kNN-family mirror
    shares: columns (va, vb, d2_mu, rk) with the (d2 ASC, vb ASC)
    tie-break — identical to the Arrow kernel's lexsort order."""
    return f"""SELECT a.vid AS va, b.vid AS vb,
                   CAST({_D2_SQL} AS BIGINT) AS d2_mu,
                   row_number() OVER (PARTITION BY a.vid
                                      ORDER BY {_D2_SQL} ASC, b.vid ASC)
                       AS rk
            FROM {last} a JOIN {last} b
              ON a.cid = b.cid AND a.vid != b.vid"""



def knn_graph_sql(
    table: str = "embeddings",
    k_clusters: int = 8,
    iters: int = 2,
    k: int = 5,
    key: str = "vec_id",
    vec_col: str = "embedding",
    n_rows: int = 500,
) -> str:
    """DuckDB mirror of `knn_graph` (shared Lloyd CTEs + the identical
    pair distance / window rank)."""
    ctes, last = CL.kmeans_ctes(table, k_clusters, iters, key, vec_col,
                                n_rows)
    ctes.append(f"""pairs AS (
        SELECT va, vb, d2_mu, rk AS rank FROM ({_knn_pairs_subquery(last)})
    )""")
    return ("WITH " + ",\n".join(ctes) + f"""
        SELECT va AS {key}, vb AS neighbor_id, rank, d2_mu
        FROM pairs WHERE rank <= {k}
        ORDER BY 1, 3""")


def semantic_dedup_sql(
    table: str = "embeddings",
    k: int = 8,
    iters: int = 2,
    threshold_pct: int = 95,
    key: str = "vec_id",
    vec_col: str = "embedding",
    n_rows: int = 500,
) -> str:
    """DuckDB mirror (unrolled-Lloyd CTEs from clustering.kmeans_ctes +
    the identical rank / integer-cosine pair sweep, HUGEINT compare)."""
    ctes, last = CL.kmeans_ctes(table, k, iters, key, vec_col, n_rows)
    t2 = threshold_pct * threshold_pct
    dot = ("list_sum([ CAST(a.m[i] AS HUGEINT) * b.m[i]"
           " FOR i IN range(1, len(a.m) + 1) ])")
    ctes.append(f"""ranked AS (
        SELECT vid, cid, m,
               list_sum([ CAST(m[i] AS HUGEINT) * m[i]
                          FOR i IN range(1, len(m) + 1) ]) AS n2,
               row_number() OVER (PARTITION BY cid
                                  ORDER BY _d2 DESC, vid ASC) AS r
        FROM {last}
    )""")
    ctes.append(f"""dropped AS (
        SELECT DISTINCT b.vid
        FROM ranked a JOIN ranked b
          ON a.cid = b.cid AND a.r < b.r
        WHERE {dot} > 0
          AND 10000 * ({dot}) * ({dot}) >= {t2} * a.n2 * b.n2
    )""")
    return ("WITH " + ",\n".join(ctes) + f"""
        SELECT r.vid AS {key}, r.cid AS cluster,
               (d.vid IS NULL) AS keep
        FROM ranked r LEFT JOIN dropped d ON r.vid = d.vid
        ORDER BY 1""")


def label_propagation(
    emb: DataFrame,
    k_clusters: int = 8,
    iters: int = 2,
    k: int = 5,
    rounds: int = 3,
    seed_mod: int = 5,
    key: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    n_rows: int | None = None,
) -> DataFrame:
    """Semi-supervised LABEL PROPAGATION over the cluster-local kNN
    graph (Zhu & Ghahramani 2002 / Raghavan et al. 2007, made
    deterministic): vectors whose id ≡ 0 (mod `seed_mod`) are SEEDS and
    keep their true `label_col` forever; every other vector starts
    unlabeled and, each round, takes the MAJORITY label among its k
    nearest cluster-mates' current labels (unlabeled neighbors don't
    vote; ties → the smaller label; zero labeled neighbors → keep the
    previous round's label). Output: (key, prop_label) for the whole
    corpus, key-ascending; never-reached vectors get -1.

    This is the curation step the kNN graph exists for: spread a small
    set of human/classifier labels (topic, quality tier, license class)
    across the full corpus at graph cost instead of inference cost.

    100 TB design: the graph is built ONCE (knn_graph — Lloyd passes +
    one cid equi-join + a per-vector window) and eagerly
    localCheckpoint'ed, so the `rounds` iterations never re-run the
    clustering. Each round touches only the k·n edge table and the
    2-column label table: one vid-keyed equi-join + one (vid, lab)
    partial-agg shuffle + a per-vid window, all integer ops — the
    connected-components/kmeans statistic-sized-loop pattern, with
    localCheckpoint capping lineage per round. Majority votes are exact
    integer counts with a total-order tie-break, so the result is
    partitioning-independent and the DuckDB mirror is bit-exact.
    """
    edges = (
        knn_graph(emb, k_clusters, iters, k, key, vec_col, n_rows)
        .select(F.col(key).alias("vid"), F.col("neighbor_id").alias("nb"))
        .localCheckpoint(eager=True)
    )
    seed_lab = F.when(F.col(key) % seed_mod == 0, F.col(label_col))
    labels = emb.select(
        F.col(key).alias("vid"),
        seed_lab.alias("slab"),
        seed_lab.alias("lab"),
    ).localCheckpoint(eager=True)
    # size the loop tables by their rows, not the session parallelism
    # (see _ITER_ROWS_PER_PART) — one cheap count over the checkpoint
    # buys 1-task-per-partition-of-data rounds instead of one
    # near-empty task per embedding-scan partition per stage
    n = n_rows if n_rows is not None else labels.count()
    n_parts = max(1, -(-n // _ITER_ROWS_PER_PART))
    labels = _sized(labels, n)
    edges = _sized(edges, n * k)
    for _ in range(rounds):
        votes = (
            edges.join(labels.select(F.col("vid").alias("nb"), "lab"), "nb")
            .filter(F.col("lab").isNotNull())
            .groupBy("vid", "lab")
            .agg(F.count("*").alias("c"))
        )
        # argmax by (c DESC, lab ASC) as a max(struct) aggregate, not a
        # window (optimization round 14, guide §2.3): struct comparison
        # is field-ordered, so max((c, -lab)) IS "most votes, ties to
        # the smaller label" — partial-aggregated map-side (the second
        # exchange ships ≤ one row per vid instead of every (vid, lab)
        # vote row) and no per-partition sort. Same pick, bit-exact.
        pick = (
            votes.groupBy("vid")
            .agg(F.max(F.struct(
                F.col("c"), (-F.col("lab")).alias("nl"), F.col("lab"),
            )).alias("m"))
            .select("vid", F.col("m.lab").alias("plab"))
        )
        labels = (
            labels.join(pick, "vid", "left")
            .select("vid", "slab",
                    F.coalesce("slab", "plab", "lab").alias("lab"))
            .coalesce(n_parts)
            .localCheckpoint(eager=True)
        )
    return (
        labels.select(
            F.col("vid").alias(key),
            F.coalesce(F.col("lab"), F.lit(-1)).cast("int")
            .alias("prop_label"),
        )
        .orderBy(key)
    )


def label_propagation_sql(
    table: str = "embeddings",
    k_clusters: int = 8,
    iters: int = 2,
    k: int = 5,
    rounds: int = 3,
    seed_mod: int = 5,
    key: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    n_rows: int = 500,
) -> str:
    """DuckDB mirror of `label_propagation`: the shared Lloyd CTEs +
    the knn_graph edge set + one (votes, pick, labels) CTE triple per
    round — exact integer majority with the identical
    (count DESC, label ASC) tie-break."""
    ctes, last = CL.kmeans_ctes(table, k_clusters, iters, key, vec_col,
                                n_rows)
    ctes.append(f"""edges AS (
        SELECT va AS vid, vb AS nb FROM ({_knn_pairs_subquery(last)})
        WHERE rk <= {k}
    )""")
    ctes.append(f"""lab0 AS (
        SELECT {key} AS vid,
               CASE WHEN {key} % {seed_mod} = 0 THEN {label_col} END AS slab,
               CASE WHEN {key} % {seed_mod} = 0 THEN {label_col} END AS lab
        FROM {table}
    )""")
    for r in range(1, rounds + 1):
        ctes.append(f"""v{r} AS (
            SELECT e.vid, l.lab, count(*) AS c
            FROM edges e JOIN lab{r - 1} l ON l.vid = e.nb
            WHERE l.lab IS NOT NULL
            GROUP BY 1, 2
        )""")
        ctes.append(f"""p{r} AS (
            SELECT vid, lab FROM (
                SELECT vid, lab,
                       row_number() OVER (PARTITION BY vid
                                          ORDER BY c DESC, lab ASC) AS rk
                FROM v{r}
            ) WHERE rk = 1
        )""")
        ctes.append(f"""lab{r} AS (
            SELECT l.vid, l.slab, COALESCE(l.slab, p.lab, l.lab) AS lab
            FROM lab{r - 1} l LEFT JOIN p{r} p ON p.vid = l.vid
        )""")
    return ("WITH " + ",\n".join(ctes) + f"""
        SELECT vid AS {key},
               CAST(COALESCE(lab, -1) AS INT) AS prop_label
        FROM lab{rounds}
        ORDER BY 1""")


def knn_hubness(
    emb: DataFrame,
    k_clusters: int = 8,
    iters: int = 2,
    k: int = 5,
    top: int = 20,
    key: str = "vec_id",
    vec_col: str = "embedding",
    n_rows: int | None = None,
) -> DataFrame:
    """HUBNESS triage over the kNN graph: the `top` vectors by
    IN-degree — how many other vectors list this one among their k
    nearest (Radovanović et al. 2010: in high dimensions a few "hub"
    points crowd into everyone's neighbor lists and poison
    neighbor-based dedup/labeling/retrieval). The curation queue next
    to `kmeans_outliers`: outliers are too far from everything, hubs
    are too close to everything.

    Output: (key, in_degree, hub_rank), in-degree desc then id asc —
    deterministic. 100 TB: one (neighbor_id) partial-agg shuffle over
    the k·n edge table + a `top`-sized TakeOrdered (the single-
    partition rank window runs AFTER the limit, over `top` rows, never
    over the corpus-sized degree table); the graph cost is
    knn_graph's own."""
    g = knn_graph(emb, k_clusters, iters, k, key, vec_col, n_rows)
    deg = (
        g.groupBy(F.col("neighbor_id").alias(key))
        .agg(F.count("*").alias("in_degree"))
        .orderBy(F.col("in_degree").desc(), F.col(key).asc())
        .limit(top)
    )
    w = Window.orderBy(F.col("in_degree").desc(), F.col(key).asc())
    return (
        deg.withColumn("hub_rank", F.row_number().over(w))
        .orderBy("hub_rank")
    )


def knn_hubness_sql(
    table: str = "embeddings",
    k_clusters: int = 8,
    iters: int = 2,
    k: int = 5,
    top: int = 20,
    key: str = "vec_id",
    vec_col: str = "embedding",
    n_rows: int = 500,
) -> str:
    """DuckDB mirror of `knn_hubness` (the knn_graph CTEs + one
    in-degree aggregation + the identical rank/limit)."""
    inner = knn_graph_sql(table, k_clusters, iters, k, key, vec_col,
                          n_rows)
    return f"""
        WITH g AS ({inner}),
        deg AS (
            SELECT neighbor_id AS {key}, count(*) AS in_degree
            FROM g GROUP BY 1
        )
        SELECT {key}, in_degree,
               row_number() OVER (ORDER BY in_degree DESC, {key} ASC)
                   AS hub_rank
        FROM deg
        ORDER BY in_degree DESC, {key} ASC
        LIMIT {top}
    """


def knn_pagerank(
    emb: DataFrame,
    k_clusters: int = 8,
    iters: int = 2,
    k: int = 5,
    rounds: int = 5,
    damping_pct: int = 85,
    key: str = "vec_id",
    vec_col: str = "embedding",
    n_rows: int | None = None,
) -> DataFrame:
    """PageRank centrality over the cluster-local kNN graph (Page et
    al. 1999; the directed "who points at whom" refinement of
    `knn_hubness`'s raw in-degree): a vector is central when CENTRAL
    vectors list it among their k nearest — the canonical pick-order
    signal for coreset selection and the inspection queue for
    retrieval-poisoning hubs.

    Deterministic exact-integer power iteration in ppb (parts per
    billion): pr0 = 1e9 DIV N for every vector; each round every edge
    ships `pr(src) DIV out_deg(src)`, dangling vectors (singleton
    clusters emit no edges) pool their mass and redistribute it
    uniformly, and pr' = (damping_pct·(in_sum + dangling DIV N)) DIV
    100 + ((100−damping_pct)·(1e9 DIV N)) DIV 100. Every operation is
    BIGINT floor division — bit-exact under any partitioning, mirrored
    verbatim by the DuckDB oracle (floor-division mass leakage is part
    of the definition, identically on both engines).

    Output: (key, out_degree, pr_ppb), key-ascending.

    100 TB design: the graph is built ONCE (knn_graph's Lloyd passes +
    per-cluster Arrow kernels) and localCheckpoint'ed; each of the
    `rounds` iterations touches only the k·n edge table (one src-keyed
    equi-join + one dst-keyed partial-agg shuffle) and a 3-column
    node table — the label_propagation statistic-loop pattern, with
    eager checkpoints capping lineage. The only driver-side value is
    N (one count), the kmeans/bpe statistic-sized-loop precedent.

    Reference parity: centrality/ranking analytics are an extension
    surface (the reference's QueryingController exposes only
    aggregation rollups); semantics follow the public PageRank
    formulation made floor-division-exact.
    """
    edges = (
        knn_graph(emb, k_clusters, iters, k, key, vec_col, n_rows)
        .select(F.col(key).alias("src"), F.col("neighbor_id").alias("dst"))
        .localCheckpoint(eager=True)
    )
    outd = edges.groupBy("src").agg(F.count("*").alias("od"))
    nodes = (
        emb.select(F.col(key).alias("vid"))
        .join(outd.withColumnRenamed("src", "vid"), "vid", "left")
        .select("vid", F.coalesce("od", F.lit(0)).cast("long").alias("od"))
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:  # degrade like the sibling operators: empty in, empty out
        return nodes.select(
            F.col("vid").alias(key),
            F.col("od").alias("out_degree"),
            F.lit(None).cast("long").alias("pr_ppb"),
        )
    # size the loop tables by their rows, not the session parallelism
    # (see _ITER_ROWS_PER_PART): every round's stages otherwise run one
    # near-empty task per embedding-scan partition
    nodes = _sized(nodes, n)
    edges = _sized(edges, n * k)
    hold = ((100 - damping_pct) * (10**9 // n)) // 100
    pr = nodes.select("vid", "od",
                      F.lit(10**9 // n).cast("long").alias("pr"))
    for _ in range(rounds):
        contrib = (
            edges.join(pr.select(F.col("vid").alias("src"), "pr", "od"),
                       "src")
            .select("dst", F.expr("pr DIV od").alias("c"))
        )
        insum = contrib.groupBy(F.col("dst").alias("vid")).agg(
            F.sum("c").alias("s"))
        dang = pr.agg(
            F.coalesce(F.sum(F.when(F.col("od") == 0, F.col("pr"))),
                       F.lit(0)).alias("dm"))
        pr = (
            nodes.join(insum, "vid", "left")
            .join(F.broadcast(dang))
            .select(
                "vid", "od",
                (F.lit(hold)
                 + F.expr(f"{damping_pct} * (coalesce(s, 0)"
                          f" + dm DIV {n}) DIV 100")).alias("pr"),
            )
            .coalesce(max(1, -(-n // _ITER_ROWS_PER_PART)))
            .localCheckpoint(eager=True)
        )
    return (
        pr.select(F.col("vid").alias(key),
                  F.col("od").alias("out_degree"),
                  F.col("pr").alias("pr_ppb"))
        .orderBy(key)
    )


def knn_pagerank_sql(
    table: str = "embeddings",
    k_clusters: int = 8,
    iters: int = 2,
    k: int = 5,
    rounds: int = 5,
    damping_pct: int = 85,
    key: str = "vec_id",
    vec_col: str = "embedding",
    n_rows: int = 500,
) -> str:
    """DuckDB mirror of `knn_pagerank`: the shared Lloyd + knn_graph
    edge CTEs, then one (contrib, dangling, pr) CTE triple per round —
    identical BIGINT floor divisions throughout."""
    ctes, last = CL.kmeans_ctes(table, k_clusters, iters, key, vec_col,
                                n_rows)
    ctes.append(f"""edges AS MATERIALIZED (
        SELECT va AS src, vb AS dst FROM ({_knn_pairs_subquery(last)})
        WHERE rk <= {k}
    )""")
    ctes.append(f"""nodes AS MATERIALIZED (
        SELECT t.{key} AS vid,
               CAST(coalesce(o.od, 0) AS BIGINT) AS od
        FROM {table} t
        LEFT JOIN (SELECT src, count(*) AS od FROM edges GROUP BY 1) o
               ON o.src = t.{key}
    )""")
    ctes.append("cnt AS (SELECT count(*) AS n FROM nodes)")
    ctes.append("""pr0 AS MATERIALIZED (
        SELECT vid, od, CAST(1000000000 // n AS BIGINT) AS pr
        FROM nodes, cnt
    )""")
    for r in range(1, rounds + 1):
        ctes.append(f"""pgc{r} AS MATERIALIZED (
            SELECT e.dst AS vid, CAST(sum(p.pr // p.od) AS BIGINT) AS s
            FROM edges e JOIN pr{r - 1} p ON p.vid = e.src
            GROUP BY 1
        )""")
        ctes.append(f"""pgd{r} AS MATERIALIZED (
            SELECT CAST(coalesce(
                sum(CASE WHEN od = 0 THEN pr END), 0) AS BIGINT) AS dm
            FROM pr{r - 1}
        )""")
        ctes.append(f"""pr{r} AS MATERIALIZED (
            SELECT p.vid, p.od,
                   CAST(({100 - damping_pct}) * (1000000000 // n) // 100
                        + {damping_pct} * (coalesce(c.s, 0) + d.dm // n)
                          // 100 AS BIGINT) AS pr
            FROM pr{r - 1} p
            LEFT JOIN pgc{r} c ON c.vid = p.vid, pgd{r} d, cnt
        )""")
    return ("WITH " + ",\n".join(ctes) + f"""
        SELECT vid AS {key}, od AS out_degree, pr AS pr_ppb
        FROM pr{rounds}
        ORDER BY 1""")


def knn_triangles(
    emb: DataFrame,
    k_clusters: int = 8,
    iters: int = 2,
    k: int = 5,
    key: str = "vec_id",
    vec_col: str = "embedding",
    n_rows: int | None = None,
) -> DataFrame:
    """Triangle count + local clustering coefficient per vector over
    the UNDIRECTED kNN graph — the neighborhood-density signal next to
    hubness: a high coefficient marks a tight near-duplicate clique
    (members' neighbors know each other), a low one marks a bridge
    point between topics. Classic MapReduce triangle enumeration:
    orient each undirected edge low-id → high-id, join wedges
    (a<b<c with a-b, b-c), probe the third edge (a-c), then credit
    each corner.

    Output: (key, degree, n_triangles, clustering_mu) for every vector
    WITH at least one undirected edge, key-ascending; clustering_mu =
    2e6·triangles DIV (deg·(deg-1)) in exact µunits (0 when deg < 2).

    100 TB: the kNN graph bounds out-degree by k, so undirected degree
    is k + in-degree — wedge volume Σ deg² stays near-linear unless a
    hub dominates (knn_hubness is the triage for exactly that; for
    general graphs orient low-degree → high-degree to bound wedges by
    O(E^1.5)). Three edge-table equi-joins + one (node) partial-agg
    shuffle; the graph builds once (per-cluster Arrow kernel)."""
    g = knn_graph(emb, k_clusters, iters, k, key, vec_col, n_rows)
    und = (
        g.select(F.least(F.col(key), F.col("neighbor_id")).alias("a"),
                 F.greatest(F.col(key), F.col("neighbor_id")).alias("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        und.select(F.col("a").alias("v")).unionAll(
            und.select(F.col("b").alias("v")))
        .groupBy("v").agg(F.count("*").alias("degree"))
    )
    e1 = und.select(F.col("a"), F.col("b"))
    e2 = und.select(F.col("a").alias("b"), F.col("b").alias("c"))
    e3 = und.select(F.col("a").alias("ta"), F.col("b").alias("tc"))
    tris = (
        e1.join(e2, "b")
        .join(e3, (F.col("a") == F.col("ta")) & (F.col("c") == F.col("tc")))
        .select("a", "b", "c")
    )
    corners = (
        tris.select(F.col("a").alias("v"))
        .unionAll(tris.select(F.col("b").alias("v")))
        .unionAll(tris.select(F.col("c").alias("v")))
        .groupBy("v").agg(F.count("*").alias("n_triangles"))
    )
    return (
        deg.join(corners, "v", "left")
        .select(
            F.col("v").alias(key),
            "degree",
            F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"),
            F.expr("CASE WHEN degree < 2 THEN 0 ELSE"
                   " 2000000 * coalesce(n_triangles, 0)"
                   " DIV (degree * (degree - 1)) END")
            .alias("clustering_mu"),
        )
        .orderBy(key)
    )


def knn_triangles_sql(
    table: str = "embeddings",
    k_clusters: int = 8,
    iters: int = 2,
    k: int = 5,
    key: str = "vec_id",
    vec_col: str = "embedding",
    n_rows: int = 500,
) -> str:
    """DuckDB mirror of :func:`knn_triangles` (the knn_graph CTEs +
    identical orientation, wedge joins, and µunit coefficient)."""
    inner = knn_graph_sql(table, k_clusters, iters, k, key, vec_col,
                          n_rows)
    return f"""
        WITH g AS ({inner}),
        und AS (
            SELECT DISTINCT least({key}, neighbor_id) AS a,
                   greatest({key}, neighbor_id) AS b
            FROM g
        ),
        deg AS (
            SELECT v, count(*) AS degree FROM (
                SELECT a AS v FROM und UNION ALL SELECT b FROM und
            ) GROUP BY 1
        ),
        tris AS (
            SELECT e1.a, e1.b, e2.b AS c
            FROM und e1
            JOIN und e2 ON e2.a = e1.b
            JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
        ),
        corners AS (
            SELECT v, count(*) AS n_triangles FROM (
                SELECT a AS v FROM tris
                UNION ALL SELECT b FROM tris
                UNION ALL SELECT c FROM tris
            ) GROUP BY 1
        )
        SELECT d.v AS {key}, d.degree,
               coalesce(c.n_triangles, 0) AS n_triangles,
               CASE WHEN d.degree < 2 THEN 0
                    ELSE 2000000 * coalesce(c.n_triangles, 0)
                         // (d.degree * (d.degree - 1)) END
                   AS clustering_mu
        FROM deg d LEFT JOIN corners c ON c.v = d.v
        ORDER BY 1
    """
