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
per iteration, broadcast centroids). The pair stage self-joins the
assignment on cid — a plain hash-partitioned equi-join whose output is
within-cluster pairs only (never a cartesian; the plan gate asserts
SortMergeJoin/shuffled-hash on cid). A pathologically hot cluster is
the LSH hot-bucket case: AQE skew-join splits it, and the k ~ √n
sizing rule keeps expected cluster size √n. The drop set is
candidate-sized; the final verdict is one left-anti-style join back to
the assignment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import clustering as CL

_N2 = "aggregate(zip_with(m, m, (a, b) -> a * b), 0L, (acc, x) -> acc + x)"
_DOT = ("aggregate(zip_with(ma, mb, (a, b) -> a * b), 0L,"
        " (acc, x) -> acc + x)")


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
    integer arithmetic. keep=false means an earlier-ranked (farther-
    from-centroid, id-tie-broken) cluster-mate is within the threshold
    and this vector is the semantic duplicate to discard."""
    assigned = CL._final_assignment(emb, k, iters, key, vec_col, n_rows)
    w = Window.partitionBy("cid").orderBy(F.col("_d2").desc(),
                                          F.col("vid").asc())
    ranked = assigned.select(
        "vid", "cid", "m",
        F.expr(_N2).alias("n2"),
        F.row_number().over(w).alias("r"),
    )
    a = ranked.select(F.col("cid"),
                      F.col("vid").alias("va"), F.col("r").alias("ra"),
                      F.col("m").alias("ma"), F.col("n2").alias("n2a"))
    b = ranked.select(F.col("cid"),
                      F.col("vid").alias("vb"), F.col("r").alias("rb"),
                      F.col("m").alias("mb"), F.col("n2").alias("n2b"))
    t2 = threshold_pct * threshold_pct
    dropped = (
        a.join(b, "cid")
        .filter(F.col("ra") < F.col("rb"))
        .withColumn("_dot", F.expr(_DOT))
        .filter(
            (F.col("_dot") > 0)
            & (F.expr("CAST(_dot AS DECIMAL(38,0)) * CAST(_dot AS"
                      " DECIMAL(38,0)) * 10000")
               >= F.expr(f"CAST({t2} AS DECIMAL(38,0))"
                         " * CAST(n2a AS DECIMAL(38,0))"
                         " * CAST(n2b AS DECIMAL(38,0))"))
        )
        .select(F.col("vb").alias("vid"))
        .distinct()
        .withColumn("_dup", F.lit(True))
    )
    return (
        ranked.join(dropped, "vid", "left")
        .select(
            F.col("vid").alias(key),
            F.col("cid").alias("cluster"),
            F.coalesce(~F.col("_dup"), F.lit(True)).alias("keep"),
        )
        .orderBy(key)
    )


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
