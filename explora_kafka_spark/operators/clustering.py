"""Deterministic k-means over the embeddings table (Lloyd iterations).

Embedding-space clustering is the curation workhorse a training-data
pipeline runs between dedup and sampling: topic/domain discovery,
cluster-balanced mixture construction, outlier-cluster triage, and the
coarse quantizer behind IVF-style ANN serving (operators/similarity.py
stride-samples its lists; this operator is the refined version of that
quantizer). The reference has no embedding operators — engine-extension
surface per the task brief.

Determinism (the house discipline, operators/centroids.py): float32
components are scaled once to exact integer micro-units; every distance
is a BIGINT sum of squared integer differences (|diff| ≲ 2e6, squared
≲ 4e12, ×64 dims ≲ 3e14 — far inside int64), every centroid update is a
BIGINT sum + one identical double division, and every argmin tie breaks
on the smaller cluster id. No summation order, partitioning, or engine
can change a single assignment — the DuckDB oracle (an UNROLLED CTE per
Lloyd iteration) matches bit-for-bit.

Init is deterministic stride sampling (ids 0, n//k, 2·n//k, …) — the
same spread-without-randomness trick the IVF quantizer uses, and the
reason no seed parameter exists. CONTRACT: the id column is assumed
dense-ish from 0 (the embeddings table's vec_id); on a sparse id subset
the stride may select fewer than k seeds and the result has fewer
clusters — re-key with row_number() first if clustering a filtered
slice (cheap, and keeps init deterministic).

100 TB design: per iteration, ONE corpus pass — the k×d centroid table
is broadcast (tiny, keyless: the same deliberate BNLJ allowance as the
IVF family) and the argmin is a per-row fold over zipped arrays inside
codegen (no explode on the assignment side); the update explodes only
(cluster, dim) partial sums, a map-side-combined shuffle of k·d rows
per task. Centroids are localCheckpoint-ed between iterations so the
plan (and lineage) stays O(1) in iters, the connected_components
pattern. Iteration count is a fixed small constant (curation k-means
runs 2-10 rounds, not to convergence).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_MU_COL = (
    "transform({vec}, x -> CAST(floor(CAST(x AS DOUBLE) * 1e6 + 0.5)"
    " AS BIGINT))"
)

_D2 = ("aggregate(zip_with(m, cm, (a, b) -> (a - b) * (a - b)),"
       " 0L, (acc, x) -> acc + x)")


def kmeans_stride(n_rows: int, k: int) -> int:
    """Init stride: centroid j = the vector with id j·stride."""
    return max(n_rows // k, 1)


def _assign(mu: DataFrame, cent: DataFrame,
            cent_rows: list | None = None) -> DataFrame:
    """(vid, m, cid, _d2): nearest centroid by integer squared distance,
    ties to the smaller cid.

    Round 10: one Arrow numpy argmin kernel per batch (the round-9
    pair-stage precedent) instead of the n×k broadcast join +
    interpreted 64-term zip_with fold + per-vid window — the Lloyd
    assignment was 22.6 s of knn_graph's 23.0 s at the sf1 probe.
    Exactness: centroids are a k×d int64 matrix collected once
    (statistic-sized, the kmeans-seed precedent); per batch
    D = x²[:,None] − 2·X·Cᵀ + c²[None,:] in pure int64 (|µ| ≤ ~6e5 on
    unit-scale embeddings ⇒ 64-dim dot ≤ ~2.3e13, far from 2^63), and
    np.argmin returns the FIRST minimal column with rows ordered by
    cid — exactly the (d2 ASC, cid ASC) tie-break the SQL mirrors pin.

    The |µ| bound is ENFORCED, not assumed (VERDICT r10 advice):
    every term of D is bounded by d·(max|X| + max|C|)², so the kernel
    asserts d·(mx + mc)² < 2^62 on the collected centroids and again
    on each Arrow batch — larger-magnitude embeddings raise instead
    of wrapping silently and diverging from the DuckDB mirror.
    """
    import numpy as np
    import pandas as pd

    rows = (sorted(cent.collect(), key=lambda r: r["cid"])
            if cent_rows is None else cent_rows)
    if not rows:  # empty corpus → empty assignment (same schema)
        return mu.sparkSession.createDataFrame(
            [], "vid bigint, m array<bigint>, cid int, _d2 bigint")
    cids = np.array([r["cid"] for r in rows], dtype=np.int64)
    C = np.stack([np.asarray(r["cm"], dtype=np.int64) for r in rows])
    c2 = (C * C).sum(axis=1)
    d = C.shape[1]
    mc = int(np.abs(C).max()) if C.size else 0

    def _check(mx: int) -> None:
        if d * (mx + mc) ** 2 >= 2**62:
            raise OverflowError(
                f"_assign int64 envelope exceeded: dim={d}, max|x|={mx}, "
                f"max|c|={mc} (need dim*(mx+mc)^2 < 2^62); µunit "
                "embeddings must stay unit-scale (|value| <= ~6e5)")

    _check(0)

    def _kern(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack([np.asarray(v, dtype=np.int64) for v in pdf["m"]])
            _check(int(np.abs(X).max()))
            D = ((X * X).sum(axis=1)[:, None]
                 - 2 * (X @ C.T) + c2[None, :])
            idx = D.argmin(axis=1)
            yield pd.DataFrame({
                "vid": pdf["vid"],
                "m": pdf["m"],
                "cid": cids[idx].astype("int32"),
                "_d2": D[np.arange(len(X)), idx],
            })

    return mu.mapInPandas(
        _kern, "vid bigint, m array<bigint>, cid int, _d2 bigint")


def _update(assigned: DataFrame) -> DataFrame:
    """(cid, cm): per-cluster integer-µunit mean, rebuilt as an array.

    Kept for the degenerate/explicit-assignment path; the Lloyd loop
    itself uses :func:`_partial_update` (optimization round 14), which
    never materializes the per-row assignment at all."""
    ex = assigned.select("cid", F.posexplode("m").alias("dim", "v"))
    per_dim = ex.groupBy("cid", "dim").agg(
        F.floor(
            F.sum("v").cast("double") / F.count("*").cast("double") + F.lit(0.5)
        ).cast("bigint").alias("cv")
    )
    return per_dim.groupBy("cid").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(dim, cv))), s -> s.cv)"
        ).alias("cm")
    )


def _partial_update(mu: DataFrame, cent_rows: list) -> DataFrame:
    """One fused Lloyd update pass: assign + per-task partial sums in a
    single Arrow kernel, emitting AT MOST k rows per task — (cid, n,
    s[d]) int64 partials — then a k-row final merge.

    Optimization round 14 (guide §2.3/§8 "shuffle metadata, not
    payloads"): the former loop materialized the full per-row
    assignment out of Python (vid + the d-dim vector + cid + d2 for
    every corpus row) and EXPLODED it into d (cid, dim, v) rows
    through two exchanges, only to reduce it straight back to k·d
    numbers. Nothing downstream of an intermediate iteration needs
    per-row output — only the k×(d+1) partial sums — so the kernel now
    folds them per task (np.add.at on int64, exact in any order) and
    the shuffle carries k rows per task. The per-dim mean keeps the
    exact op sequence floor(CAST(sum AS DOUBLE)/CAST(n AS DOUBLE) +
    0.5): BIGINT sums are order-independent, so every centroid is
    bit-identical to the explode formulation and the DuckDB mirrors.
    At 100 TB this turns each intermediate Lloyd pass from a
    corpus-sized Python round-trip + d× explode shuffle into one scan
    emitting k rows per task."""
    import numpy as np
    import pandas as pd

    cids = np.array([r["cid"] for r in cent_rows], dtype=np.int64)
    C = np.stack([np.asarray(r["cm"], dtype=np.int64) for r in cent_rows])
    c2 = (C * C).sum(axis=1)
    d = C.shape[1]
    k = len(cent_rows)
    mc = int(np.abs(C).max()) if C.size else 0

    def _check(mx: int) -> None:
        if d * (mx + mc) ** 2 >= 2**62:
            raise OverflowError(
                f"_partial_update int64 envelope exceeded: dim={d}, "
                f"max|x|={mx}, max|c|={mc} (need dim*(mx+mc)^2 < 2^62)")

    _check(0)

    def _kern(batches):
        n = np.zeros(k, dtype=np.int64)
        s = np.zeros((k, d), dtype=np.int64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack([np.asarray(v, dtype=np.int64) for v in pdf["m"]])
            _check(int(np.abs(X).max()))
            D = ((X * X).sum(axis=1)[:, None]
                 - 2 * (X @ C.T) + c2[None, :])
            idx = D.argmin(axis=1)
            n += np.bincount(idx, minlength=k)
            np.add.at(s, idx, X)
        hit = np.flatnonzero(n)
        if len(hit) == 0:
            return
        yield pd.DataFrame({
            "cid": cids[hit].astype("int32"),
            "n": n[hit],
            "s": [s[i].tolist() for i in hit],
        })

    partials = mu.mapInPandas(_kern, "cid int, n bigint, s array<bigint>")
    zero = f"transform(sequence(1, {d}), i -> 0L)"
    return (
        partials.groupBy("cid")
        .agg(F.sum("n").alias("_n"),
             F.expr(f"aggregate(collect_list(s), {zero},"
                    " (acc, x) -> zip_with(acc, x, (a, b) -> a + b))"
                    ).alias("_s"))
        .select("cid", F.expr(
            "transform(_s, x -> CAST(floor(CAST(x AS DOUBLE)"
            " / CAST(_n AS DOUBLE) + 0.5D) AS BIGINT))").alias("cm"))
    )


def kmeans(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    key: str = "vec_id",
    vec_col: str = "embedding",
    n_rows: int | None = None,
) -> DataFrame:
    """`iters` Lloyd assignment passes (iters-1 centroid updates between
    them) from stride-sampled init. Returns the final assignment:
    (key, cluster), key-ascending. iters=1 is pure nearest-init-centroid
    assignment (the IVF list assignment)."""
    assigned, _ = _final_assignment(emb, k, iters, key, vec_col, n_rows)
    return (
        assigned.select(F.col("vid").alias(key), F.col("cid").alias("cluster"))
        .orderBy(key)
    )


def _final_assignment(
    emb: DataFrame,
    k: int,
    iters: int,
    key: str,
    vec_col: str,
    n_rows: int | None,
    prepared_mu: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Shared Lloyd loop. Returns (assigned, cent): the final
    (vid, m, cid, _d2) assignment AND the (cid, cm) centroid table it
    was made under (for index materialization / out-of-corpus
    assignment — operators/semdedup.py's incremental check).

    Optimization round 14 (guide §1.2/§5): the µunit projection `mu`
    is persisted once per run — the init-seed collect, each
    iteration's update pass, and the final assignment previously each
    re-ran the parquet scan + the repartition exchange + the 1e6
    float→int conversion (3-4 full re-derivations per run; one per
    rung-consumer in the sweeps). `localCheckpoint` (not `persist`):
    the columnar cache re-encodes array columns row-by-row through the
    generic ColumnType path — measured SLOWER than re-scanning at
    sf0.1 — while the checkpoint stores the exchange's UnsafeRow
    blocks as-is (the connected_components/kcenter pattern).
    `prepared_mu` lets sweep callers share one materialized µ table
    across rungs. The init-centroid collect is done here (not inside
    `_assign`) so the centroid dimensionality is in hand for the
    width-wise `_update`."""
    if prepared_mu is not None:
        mu = prepared_mu
    else:
        mu = emb.select(
            F.col(key).alias("vid"),
            F.expr(_MU_COL.format(vec=vec_col)).alias("m"),
        ).localCheckpoint(eager=True)
    if n_rows is None:
        n_rows = mu.count()
    stride = kmeans_stride(n_rows, k)
    cent = (
        mu.filter((F.col("vid") % stride == 0) & (F.col("vid") < k * stride))
        .select((F.col("vid") / stride).cast("int").alias("cid"),
                F.col("m").alias("cm"))
    )
    cent_rows = sorted(cent.collect(), key=lambda r: r["cid"])
    for _ in range(iters - 1):
        if not cent_rows:
            break
        cent = _partial_update(mu, cent_rows).localCheckpoint(eager=True)
        cent_rows = sorted(cent.collect(), key=lambda r: r["cid"])
    assigned = _assign(mu, cent, cent_rows)
    return assigned, cent


def kmeans_sizes(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    key: str = "vec_id",
    vec_col: str = "embedding",
    n_rows: int | None = None,
) -> DataFrame:
    """Cluster histogram of the final assignment: (cluster, n_vectors) —
    the balance report curation actually reads."""
    return (
        kmeans(emb, k, iters, key, vec_col, n_rows)
        .groupBy("cluster")
        .agg(F.count("*").alias("n_vectors"))
        .orderBy("cluster")
    )


def kmeans_outliers(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    key: str = "vec_id",
    vec_col: str = "embedding",
    n_rows: int | None = None,
    top: int = 20,
) -> DataFrame:
    """Embedding-space outlier triage: the `top` vectors FARTHEST from
    their assigned centroid after the final Lloyd pass — the curation
    queue a human (or a stricter filter) reviews first: mislabeled
    items, off-distribution scrapes, encoding garbage. Output:
    (key, cluster, d2_mu), d2 descending then key ascending; `d2_mu` is
    the exact integer squared distance in µunit² (engine-portable, no
    float drift by construction).

    100 TB: identical passes to `kmeans` (the assignment already
    computes d2; this keeps it) plus one global top-`top` — Spark
    executes orderBy+limit as per-partition TakeOrdered then a
    `top`-sized merge, no full sort materialization."""
    assigned, _ = _final_assignment(emb, k, iters, key, vec_col, n_rows)
    return (
        assigned.select(
            F.col("vid").alias(key),
            F.col("cid").alias("cluster"),
            F.col("_d2").alias("d2_mu"),
        )
        .orderBy(F.col("d2_mu").desc(), key)
        .limit(top)
    )


def kmeans_ctes(
    table: str = "embeddings",
    k: int = 8,
    iters: int = 2,
    key: str = "vec_id",
    vec_col: str = "embedding",
    n_rows: int = 500,
) -> tuple[list[str], str]:
    """The unrolled-Lloyd DuckDB CTE chain shared by every kmeans-family
    oracle (kmeans_sql here, semantic_dedup_sql in operators/semdedup.py).
    Returns (ctes, last_assignment_name); the final CTE exposes
    (vid, m, cid, _d2) under the final centroids."""
    stride = kmeans_stride(n_rows, k)
    d2 = ("list_sum([ (e.m[i] - c.cm[i]) * (e.m[i] - c.cm[i])"
          " FOR i IN range(1, len(e.m) + 1) ])")
    ctes = [
        f"""mu AS (
            SELECT {key} AS vid,
                   [CAST(floor(CAST(x AS DOUBLE) * 1e6 + 0.5) AS BIGINT)
                    FOR x IN {vec_col}] AS m
            FROM {table}
        )""",
        f"""c0 AS (
            SELECT CAST(vid // {stride} AS INT) AS cid, m AS cm FROM mu
            WHERE vid % {stride} = 0 AND vid < {k * stride}
        )""",
    ]
    for t in range(iters):
        ctes.append(f"""a{t} AS (
            SELECT vid, m, cid, _d2 FROM (
                SELECT e.vid, e.m, c.cid,
                       CAST({d2} AS BIGINT) AS _d2,
                       row_number() OVER (PARTITION BY e.vid
                           ORDER BY {d2} ASC, c.cid ASC) AS rn
                FROM mu e, c{t} c
            ) WHERE rn = 1
        )""")
        if t < iters - 1:
            ctes.append(f"""c{t + 1}d AS (
                SELECT cid, u.i AS dim,
                       CAST(floor(CAST(sum(m[u.i]) AS DOUBLE)
                                  / CAST(count(*) AS DOUBLE) + 0.5)
                            AS BIGINT) AS cv
                FROM a{t}, unnest(range(1, len(m) + 1)) AS u(i)
                GROUP BY cid, u.i
            )""")
            ctes.append(f"""c{t + 1} AS (
                SELECT cid, array_agg(cv ORDER BY dim) AS cm
                FROM c{t + 1}d GROUP BY cid
            )""")
    return ctes, f"a{iters - 1}"


def kmeans_sql(
    table: str = "embeddings",
    k: int = 8,
    iters: int = 2,
    key: str = "vec_id",
    vec_col: str = "embedding",
    n_rows: int = 500,
    sizes: bool = False,
    outliers_top: int | None = None,
) -> str:
    """DuckDB mirror of `kmeans` (same µunits, init stride, integer
    distances, tie-break, update rounding) with one CTE pair per Lloyd
    iteration, unrolled. `n_rows` must match the table the oracle runs
    on (sf0.01: 500 vectors). `sizes` mirrors `kmeans_sizes`;
    `outliers_top` mirrors `kmeans_outliers`."""
    ctes, last = kmeans_ctes(table, k, iters, key, vec_col, n_rows)
    if sizes:
        body = (f"SELECT cid AS cluster, count(*) AS n_vectors"
                f" FROM {last} GROUP BY 1 ORDER BY 1")
    elif outliers_top:
        body = (f"SELECT vid AS {key}, cid AS cluster, _d2 AS d2_mu"
                f" FROM {last} ORDER BY _d2 DESC, vid LIMIT {outliers_top}")
    else:
        body = (f"SELECT vid AS {key}, cid AS cluster"
                f" FROM {last} ORDER BY 1")
    return "WITH " + ",\n".join(ctes) + "\n" + body


def kcenter_select(
    emb: DataFrame,
    k: int = 8,
    key: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Greedy k-CENTER (farthest-point-first) DIVERSITY SELECTION — the
    coreset construction of Gonzalez 1985 / Sener & Savarese 2018:
    start from the smallest-id vector, then repeatedly select the
    vector FARTHEST (max-min integer squared L2) from everything
    selected so far. The selected set is a 2-approximation of the
    optimal k-center cover — the standard "pick a maximally diverse
    subset" primitive for training-data curation (diverse fine-tune
    seeds, eval-set picks, annotation batches).

    Output: (rank, key, d2_mu), rank-ascending — d2_mu is the coverage
    radius at selection (the max-min distance the pick closed; -1 for
    the rank-0 seed), so the row sequence doubles as the k-vs-coverage
    elbow curve. Selection stops early when the whole corpus is
    exactly covered (max-min distance 0 — duplicate-only remainder).

    100 TB design: the loop state is ONE narrow corpus table
    (vid, m, dmin); each of the k iterations is a 1-row TakeOrdered
    (the merge-decision scalar probe — the bpe_merges/kmeans
    precedent) plus a codegen `least(dmin, d2-to-literal-center)`
    projection, localCheckpoint-ed so lineage stays flat. k corpus
    passes total — the Lloyd cost family, no pairwise stage anywhere.
    All-integer distances + (dmin DESC, vid ASC) tie-breaks make the
    selection partitioning-independent and the DuckDB mirror
    bit-exact."""
    mu = emb.select(
        F.col(key).alias("vid"),
        F.expr(_MU_COL.format(vec=vec_col)).alias("m"),
    )
    seed = mu.orderBy("vid").limit(1).collect()[0]
    selected = [(0, int(seed["vid"]), -1)]

    def _d2_lit(center_m):
        lit = F.array(*[F.lit(int(x)) for x in center_m])
        return F.aggregate(
            F.zip_with(F.col("m"), lit, lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )

    state = mu.withColumn("dmin", _d2_lit(seed["m"])).localCheckpoint(
        eager=True)
    for r in range(1, k):
        best = (
            state.orderBy(F.col("dmin").desc(), F.col("vid").asc())
            .limit(1)
            .collect()
        )
        if not best or int(best[0]["dmin"]) == 0:
            break  # every vector coincides with a center: covered
        selected.append((r, int(best[0]["vid"]), int(best[0]["dmin"])))
        state = state.withColumn(
            "dmin", F.least(F.col("dmin"), _d2_lit(best[0]["m"]))
        ).localCheckpoint(eager=True)
    return (
        emb.sparkSession.createDataFrame(
            selected, f"rank int, {key} bigint, d2_mu bigint")
        .orderBy("rank")
    )


def kcenter_select_sql(
    table: str = "embeddings",
    k: int = 8,
    key: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB mirror of `kcenter_select`: one (pick, distance-update)
    CTE pair per iteration, unrolled — the kmeans_ctes pattern. The
    early covered-stop is mirrored by `WHERE dmin > 0` in each pick
    (an empty pick empties every later stage, exactly the loop break)."""
    d2_seed = ("list_sum([ (e.m[i] - s.m[i]) * (e.m[i] - s.m[i])"
               " FOR i IN range(1, len(e.m) + 1) ])")
    d2_pick = ("list_sum([ (d.m[i] - p.m[i]) * (d.m[i] - p.m[i])"
               " FOR i IN range(1, len(d.m) + 1) ])")
    ctes = [
        f"""mu AS (
            SELECT {key} AS vid,
                   [CAST(floor(CAST(x AS DOUBLE) * 1e6 + 0.5) AS BIGINT)
                    FOR x IN {vec_col}] AS m
            FROM {table}
        )""",
        """s0 AS (SELECT vid, m FROM mu ORDER BY vid LIMIT 1)""",
        f"""d0 AS (
            SELECT e.vid, e.m, CAST({d2_seed} AS BIGINT) AS dmin
            FROM mu e, s0 s
        )""",
    ]
    rows = ["SELECT 0 AS rank, vid, CAST(-1 AS BIGINT) AS d2_mu FROM s0"]
    for r in range(1, k):
        ctes.append(f"""p{r} AS (
            SELECT vid, m, dmin FROM d{r - 1}
            WHERE dmin > 0
            ORDER BY dmin DESC, vid ASC LIMIT 1
        )""")
        ctes.append(f"""d{r} AS (
            SELECT d.vid, d.m,
                   least(d.dmin, CAST({d2_pick} AS BIGINT)) AS dmin
            FROM d{r - 1} d, p{r} p
        )""")
        rows.append(f"SELECT {r} AS rank, vid, dmin AS d2_mu FROM p{r}")
    union = " UNION ALL ".join(rows)
    return ("WITH " + ",\n".join(ctes) + f"""
        SELECT rank, vid AS {key}, d2_mu FROM ({union}) ORDER BY rank""")


def cluster_source_mi(
    docs: DataFrame,
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    key: str = "doc_id",
    vec_key: str = "vec_id",
) -> DataFrame:
    """Cluster <-> source dependence audit: per-cluster source purity
    plus each cluster's mutual-information contribution, the diagnostic
    a mixture builder reads before cluster-balanced sampling (high MI =
    embedding clusters just re-discover the source split, so balancing
    on clusters double-counts the source mix; MI near 0 = clusters cut
    across sources and add a genuinely new diversity axis). Same
    motivation as the per-cluster source histograms in Abbas 2023
    (SemDeDup) Fig. 5's cluster composition analysis.

    Joins the Lloyd assignment (operators/clustering.kmeans) onto the
    document table via the vec_id == doc_id cross-modal contract and
    reduces to the C x S cell table; every count/share is exact integer
    (ppm via DIV), and the only float is ONE libm `ln` per CELL folded
    to micro-nats with floor(x*1e6 + 0.5) before the per-cluster sum —
    the `source_mix_entropy` exactness discipline, applied to
    mi_cs = p(c,s) * ln( p(c,s) / (p(c) * p(s)) ), with the ln operand
    formed as (n_cs / n_c) * (N / n_s) in that exact operand order on
    both engines. Output, cluster-ascending:
    (cluster, n_docs, n_sources, top_source, top_share_ppm, mi_mu_nats).

    100 TB: one corpus-keyed equi-join (assignment is one row per doc),
    one (cluster, source)-keyed partial-agg shuffle, then all
    arithmetic on the C x S statistic table. The cell table feeds FOUR
    consumers (cmarg/smarg/tot/final join) and Spark does not dedupe
    common subplans, so it is localCheckpointed (C x S rows,
    statistic-sized — the same lineage-cut discipline kmeans applies to
    centroids) to keep the corpus join+agg at exactly ONE execution.
    """
    assigned = kmeans(emb, k=k, iters=iters, key=vec_key)
    cells = (
        docs.select(key, "source")
        .join(assigned, F.col(key) == F.col(vec_key))
        .groupBy("cluster", "source")
        .agg(F.count("*").alias("n_cs"))
    ).localCheckpoint(eager=True)
    cmarg = cells.groupBy("cluster").agg(F.sum("n_cs").alias("n_c"))
    smarg = cells.groupBy("source").agg(F.sum("n_cs").alias("n_s"))
    tot = cells.agg(F.sum("n_cs").alias("n_tot"))
    scored = (
        cells.join(cmarg, "cluster")
        .join(smarg, "source")
        .join(F.broadcast(tot))
        .select(
            "cluster", "source", "n_cs", "n_c",
            F.expr("n_cs * 1000000 DIV n_c").alias("share_ppm"),
            F.expr(
                "CAST(floor((CAST(n_cs AS DOUBLE) / n_tot)"
                " * ln((CAST(n_cs AS DOUBLE) / n_c)"
                "      * (CAST(n_tot AS DOUBLE) / n_s))"
                " * 1e6 + 0.5) AS BIGINT)"
            ).alias("mi_mu"),
        )
    )
    return (
        scored.groupBy("cluster")
        .agg(
            F.max("n_c").alias("n_docs"),
            F.count("*").alias("n_sources"),
            F.max(F.struct(F.col("n_cs"), F.col("source"))).alias("_top"),
            F.max(F.struct(F.col("n_cs"), F.col("share_ppm"))).alias("_ts"),
            F.sum("mi_mu").alias("mi_mu_nats"),
        )
        .select(
            "cluster", "n_docs", "n_sources",
            F.col("_top.source").alias("top_source"),
            F.col("_ts.share_ppm").alias("top_share_ppm"),
            "mi_mu_nats",
        )
        .orderBy("cluster")
    )


def cluster_source_mi_sql(
    doc_table: str = "documents",
    emb_table: str = "embeddings",
    k: int = 8,
    iters: int = 2,
    key: str = "doc_id",
    vec_key: str = "vec_id",
    n_rows: int = 500,
) -> str:
    """DuckDB mirror of :func:`cluster_source_mi` (shared Lloyd CTEs +
    the identical cell/marginal/ln-operand arithmetic)."""
    ctes, last = kmeans_ctes(emb_table, k, iters, vec_key,
                             "embedding", n_rows)
    ctes.append(f"""cells AS (
        SELECT a.cid AS cluster, d.source, count(*) AS n_cs
        FROM {doc_table} d JOIN {last} a ON d.{key} = a.vid
        GROUP BY 1, 2
    )""")
    ctes.append("""cmarg AS (
        SELECT cluster, CAST(sum(n_cs) AS BIGINT) AS n_c
        FROM cells GROUP BY 1
    )""")
    ctes.append("""smarg AS (
        SELECT source, CAST(sum(n_cs) AS BIGINT) AS n_s
        FROM cells GROUP BY 1
    )""")
    ctes.append("""tot AS (
        SELECT CAST(sum(n_cs) AS BIGINT) AS n_tot FROM cells
    )""")
    ctes.append("""scored AS (
        SELECT c.cluster, c.source, c.n_cs, cm.n_c,
               CAST(c.n_cs * 1000000 // cm.n_c AS BIGINT) AS share_ppm,
               CAST(floor((CAST(c.n_cs AS DOUBLE) / t.n_tot)
                    * ln((CAST(c.n_cs AS DOUBLE) / cm.n_c)
                         * (CAST(t.n_tot AS DOUBLE) / sm.n_s))
                    * 1e6 + 0.5) AS BIGINT) AS mi_mu
        FROM cells c
        JOIN cmarg cm ON cm.cluster = c.cluster
        JOIN smarg sm ON sm.source = c.source
        CROSS JOIN tot t
    )""")
    return ("WITH " + ",\n".join(ctes) + """
        SELECT cluster, max(n_c) AS n_docs, count(*) AS n_sources,
               (SELECT source FROM scored s2 WHERE s2.cluster = scored.cluster
                ORDER BY n_cs DESC, source DESC LIMIT 1) AS top_source,
               (SELECT share_ppm FROM scored s3
                WHERE s3.cluster = scored.cluster
                ORDER BY n_cs DESC, share_ppm DESC LIMIT 1)
                   AS top_share_ppm,
               CAST(sum(mi_mu) AS BIGINT) AS mi_mu_nats
        FROM scored GROUP BY cluster ORDER BY cluster""")


def cluster_balance_sample(
    docs: DataFrame,
    emb: DataFrame,
    cap: int = 30,
    k: int = 8,
    iters: int = 2,
    key: str = "doc_id",
    vec_key: str = "vec_id",
    salt: str = "cluster_balance",
) -> DataFrame:
    """Cluster-balanced (embedding-diversity-preserving) selection: at
    most `cap` documents per Lloyd cluster, chosen by the deterministic
    salted-hash order — the embedding-space analogue of
    `corpus.domain_cap_sample` (same rank machinery, but the quota key
    is a LEARNED cluster instead of a metadata domain), so a corpus
    dominated by one dense topic region cannot dominate the subset even
    when its documents span many sources. The equal-per-cluster quota
    is the flattened mixture used for diversity-first curation.

    Output (kept rows only, doc_id-ascending): doc_id, cluster, rk
    (1-based hash rank within the cluster, <= cap).

    100 TB: the Lloyd passes, one assignment equi-join, then ONE window
    shuffle keyed by cluster (k keys; a mega-cluster hot partition
    switches to the two-phase salted top-k per the domain_cap_sample
    note)."""
    from .sampling import _bucket_col

    assigned = kmeans(emb, k=k, iters=iters, key=vec_key)
    b = _bucket_col(F.col(key).cast("string"), salt)
    w = Window.partitionBy("cluster").orderBy("bucket", key)
    return (
        docs.select(key)
        .join(assigned, F.col(key) == F.col(vec_key))
        .select(key, "cluster", b)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= cap)
        .select(key, "cluster", "rk")
        .orderBy(key)
    )


def cluster_balance_sample_sql(
    doc_table: str = "documents",
    emb_table: str = "embeddings",
    cap: int = 30,
    k: int = 8,
    iters: int = 2,
    key: str = "doc_id",
    vec_key: str = "vec_id",
    salt: str = "cluster_balance",
    n_rows: int = 500,
) -> str:
    """DuckDB mirror of :func:`cluster_balance_sample`."""
    from .sampling import _bucket_sql

    ctes, last = kmeans_ctes(emb_table, k, iters, vec_key,
                             "embedding", n_rows)
    b = _bucket_sql(f"CAST({key} AS VARCHAR)", salt)
    ctes.append(f"""ranked AS (
        SELECT d.{key}, a.cid AS cluster,
               row_number() OVER (
                   PARTITION BY a.cid
                   ORDER BY ({b}), d.{key}
               ) AS rk
        FROM {doc_table} d JOIN {last} a ON d.{key} = a.vid
    )""")
    return ("WITH " + ",\n".join(ctes) + f"""
        SELECT {key}, cluster, rk FROM ranked
        WHERE rk <= {cap} ORDER BY {key}""")


def kmeans_inertia_sweep(
    emb: DataFrame,
    ks: Sequence[int] = (2, 4, 8, 16),
    iters: int = 2,
    key: str = "vec_id",
    vec_col: str = "embedding",
    n_rows: int | None = None,
) -> DataFrame:
    """The ELBOW diagnostic that chooses k before any cluster-consuming
    stage (SemDeDup k, IVF n_lists, cluster-balanced quotas): total
    within-cluster squared distance (inertia) per candidate k, plus the
    percentage drop from the previous rung — the curve whose
    flattening point is the elbow. Per-vector d2 is the Lloyd kernel's
    exact µunit² BIGINT and inertia its exact sum; the drop is the one
    intentional float — (prev−cur) stays an exact BIGINT (1e6·inertia
    would overflow int64 at fixture magnitudes, so no integer-ppm form
    exists) and round(diff/prev·100, 6) is the identical IEEE op
    sequence on both engines. Output (k-ascending): k, n_vectors,
    inertia_mu2, drop_pct (NULL on the first rung).

    100 TB: one Lloyd run per rung (each = iters corpus scans with the
    Arrow argmin kernel, no shuffle on the assignment side) and a
    1-row aggregate per rung; the rung table is len(ks) rows, the
    window over it trivial."""
    # Optimization round 14: ONE persisted µ table shared by every rung
    # (each rung formerly re-scanned + re-converted the corpus 3×), and
    # the rungs' driver-side Lloyd loops run from a small thread pool so
    # their jobs overlap (guide §2.6 "overlap independent jobs") — the
    # rungs are independent by construction and each rung's exact
    # integer result is unchanged by scheduling. Futures are read in ks
    # order, so the output row order is deterministic.
    from concurrent.futures import ThreadPoolExecutor

    mu = emb.select(
        F.col(key).alias("vid"),
        F.expr(_MU_COL.format(vec=vec_col)).alias("m"),
    ).localCheckpoint(eager=True)
    if n_rows is None:
        n_rows = mu.count()

    def _rung(k: int) -> DataFrame:
        assigned, _ = _final_assignment(emb, k, iters, key, vec_col,
                                        n_rows, prepared_mu=mu)
        return assigned.agg(
            F.count("*").alias("n_vectors"),
            F.sum("_d2").alias("inertia_mu2"),
        ).select(F.lit(k).cast("int").alias("k"), "n_vectors",
                 "inertia_mu2")

    with ThreadPoolExecutor(max_workers=len(ks)) as pool:
        rows = list(pool.map(_rung, ks))
    per = rows[0]
    for row in rows[1:]:
        per = per.unionByName(row)
    w = Window.orderBy("k")
    return (
        per.withColumn("_prev", F.lag("inertia_mu2").over(w))
        .withColumn(
            "drop_pct",
            F.expr("round(CAST(_prev - inertia_mu2 AS DOUBLE)"
                   " / CAST(_prev AS DOUBLE) * 100, 6)"),
        )
        .select("k", "n_vectors", "inertia_mu2", "drop_pct")
        .orderBy("k")
    )


def kmeans_inertia_sweep_sql(
    table: str = "embeddings",
    ks: Sequence[int] = (2, 4, 8, 16),
    iters: int = 2,
    key: str = "vec_id",
    vec_col: str = "embedding",
    n_rows: int = 500,
) -> str:
    """DuckDB mirror of :func:`kmeans_inertia_sweep` (one unrolled
    Lloyd CTE chain per rung, CTE names suffixed by k)."""
    rungs = []
    all_ctes: list[str] = []
    for k in ks:
        ctes, last = kmeans_ctes(table, k, iters, key, vec_col, n_rows)
        suffixed = []
        for c in ctes:
            name, body = c.split(" AS ", 1)
            new = f"{name.strip()}_k{k} AS {body}"
            for t in range(iters):
                new = new.replace(f"FROM mu e, c{t} c",
                                  f"FROM mu_k{k} e, c{t}_k{k} c")
                new = new.replace(f"FROM a{t},", f"FROM a{t}_k{k},")
                new = new.replace(f"FROM c{t + 1}d", f"FROM c{t + 1}d_k{k}")
            new = new.replace(f"FROM {table}", f"FROM {table}", 1)
            suffixed.append(new)
        # the mu CTE references the raw table; centroid/assign CTEs
        # reference mu and each other — suffix those references too
        fixed = []
        for c in suffixed:
            c = c.replace("FROM mu\n", f"FROM mu_k{k}\n")
            c = c.replace("FROM mu WHERE", f"FROM mu_k{k} WHERE")
            fixed.append(c)
        all_ctes.extend(fixed)
        rungs.append(
            f"SELECT {k} AS k, count(*) AS n_vectors,"
            f" CAST(sum(_d2) AS BIGINT) AS inertia_mu2"
            f" FROM {last}_k{k}")
    union = " UNION ALL ".join(rungs)
    return ("WITH " + ",\n".join(all_ctes) + f""",
        per AS ({union})
        SELECT CAST(k AS INTEGER) AS k, n_vectors, inertia_mu2,
               round(CAST(lag(inertia_mu2) OVER (ORDER BY k)
                          - inertia_mu2 AS DOUBLE)
                     / CAST(lag(inertia_mu2) OVER (ORDER BY k)
                            AS DOUBLE) * 100, 6) AS drop_pct
        FROM per ORDER BY k""")
