"""End-to-end training-corpus assembly: near-dup groups → one canonical
document per group, picked by quality.

The composition a real pretraining pipeline runs after the individual
operators: `dedup.dedup_groups` (MinHash-LSH candidates → exact-Jaccard
edges → connected components) supplies the duplicate clusters;
`text.with_text_stats` supplies the quality signal; the canonical pick is
the highest-quality member (ties broken by min doc_id, so the choice is
deterministic under any execution order).

100 TB design: everything here is the already-scale-audited pieces plus
one window over (group_id) — groups are tiny (near-dup clusters), so the
window's hash partition by group_id is skew-free by construction. Nothing
new shuffles the corpus text: labels and stats are (doc_id, …) narrow
tables joined on doc_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import NUM_BANDS, NUM_HASHES, dedup_groups, dedup_groups_sql
from .text import text_stats_sql, with_text_stats


def assemble_corpus(
    docs: DataFrame,
    threshold: float = 0.6,
    shingle_n: int = 1,
    num_hashes: int = NUM_HASHES,
    num_bands: int = NUM_BANDS,
) -> DataFrame:
    """One row per near-dup group: the kept (canonical) document.

    Output: (doc_id, group_id, group_size, quality_score), group_id-
    ascending. doc_id is the canonical member — highest quality_score,
    then lowest doc_id.
    """
    from pyspark.sql.window import Window

    labels = dedup_groups(docs, threshold=threshold, shingle_n=shingle_n,
                          num_hashes=num_hashes, num_bands=num_bands)
    stats = with_text_stats(docs).select("doc_id", "quality_score")
    joined = labels.join(stats, "doc_id")
    w = Window.partitionBy("group_id")
    wpick = w.orderBy(F.col("quality_score").desc(), "doc_id")
    return (
        joined.withColumn("group_size", F.count("*").over(w))
        .withColumn("_pick", F.row_number().over(wpick))
        .filter(F.col("_pick") == 1)
        .select("doc_id", "group_id", "group_size", "quality_score")
        .orderBy("group_id")
    )


def assemble_corpus_sql(
    table: str = "documents",
    threshold: float = 0.6,
    shingle_n: int = 1,
    num_hashes: int = NUM_HASHES,
    num_bands: int = NUM_BANDS,
) -> str:
    """DuckDB mirror: recursive-CTE groups × stats, same pick order."""
    labels = dedup_groups_sql(table, threshold=threshold,
                              shingle_n=shingle_n, num_hashes=num_hashes,
                              num_bands=num_bands)
    stats = text_stats_sql(table)
    return f"""
        WITH labels AS ({labels}),
        stats AS ({stats}),
        j AS (
            SELECT labels.doc_id, labels.group_id, stats.quality_score
            FROM labels JOIN stats ON labels.doc_id = stats.doc_id
        ),
        ranked AS (
            SELECT *,
                   COUNT(*) OVER (PARTITION BY group_id) AS group_size,
                   row_number() OVER (
                       PARTITION BY group_id
                       ORDER BY quality_score DESC, doc_id
                   ) AS _pick
            FROM j
        )
        SELECT doc_id, group_id, group_size, quality_score
        FROM ranked WHERE _pick = 1 ORDER BY group_id
    """


def dedup_ensemble(
    docs: DataFrame,
    emb: DataFrame,
    shingle_n: int = 2,
    num_bands: int = 8,
    tau: float = 0.3,
) -> DataFrame:
    """Cross-modal dedup agreement: the union of TEXT near-dup candidate
    pairs (MinHash-LSH → exact n-gram Jaccard) and EMBEDDING near-dup
    pairs (sign-LSH buckets → exact cosine ≥ τ), full-outer-joined on the
    pair key. The disagreement rows are the actionable ones: text-only
    pairs are surface duplicates with drifted embeddings (stale index?),
    embedding-only pairs are paraphrases exact-text dedup misses.

    Requires aligned ids (embedding vec_id == doc_id — the usual layout
    where the embedding table is derived from the corpus).

    Output (ordered): doc_a, doc_b, jaccard (null if text path didn't
    propose it), cosine (null likewise), in_text, in_embedding.

    Scale: both inputs are the already-bucketed candidate generators —
    no new corpus-sized work; the ensemble join is candidate-pairs ×
    candidate-pairs on (doc_a, doc_b), tiny relative to the corpus.
    """
    from .dedup import ngram_jaccard_pairs
    from .similarity import embedding_near_dup

    text = ngram_jaccard_pairs(
        docs, shingle_n=shingle_n, num_bands=num_bands
    ).select("doc_a", "doc_b", "jaccard")
    vec = embedding_near_dup(emb, tau=tau).select(
        F.col("vec_a").alias("doc_a"),
        F.col("vec_b").alias("doc_b"),
        F.col("sim").alias("cosine"),
    )
    return (
        text.join(vec, ["doc_a", "doc_b"], "full_outer")
        .select(
            "doc_a",
            "doc_b",
            "jaccard",
            "cosine",
            F.col("jaccard").isNotNull().alias("in_text"),
            F.col("cosine").isNotNull().alias("in_embedding"),
        )
        .orderBy("doc_a", "doc_b")
    )


def dedup_ensemble_sql(
    doc_table: str = "documents",
    emb_table: str = "embeddings",
    shingle_n: int = 2,
    num_bands: int = 8,
    tau: float = 0.3,
) -> str:
    """DuckDB mirror of `dedup_ensemble` (USING coalesces the pair key
    in both engines)."""
    from .dedup import ngram_jaccard_sql
    from .similarity import embedding_near_dup_sql

    text = ngram_jaccard_sql(doc_table, shingle_n=shingle_n,
                             num_bands=num_bands)
    vec = embedding_near_dup_sql(emb_table, tau=tau)
    return f"""
        WITH text_pairs AS ({text}),
        vec_pairs AS (
            SELECT vec_a AS doc_a, vec_b AS doc_b, sim AS cosine
            FROM ({vec})
        )
        SELECT doc_a, doc_b, jaccard, cosine,
               jaccard IS NOT NULL AS in_text,
               cosine IS NOT NULL AS in_embedding
        FROM text_pairs
        FULL OUTER JOIN vec_pairs USING (doc_a, doc_b)
        ORDER BY doc_a, doc_b
    """


def corpus_diff(
    old: DataFrame, new: DataFrame, key: str = "doc_id"
) -> DataFrame:
    """Snapshot diff between two corpus versions: one row per document
    present in either — (key, status ∈ {added, removed, changed,
    unchanged}), key-ascending. 'changed' compares the md5 digest of
    NORMALIZED text (the dedup_exact digest), so whitespace/case churn
    does not read as a content change.

    The audit a pipeline runs between corpus snapshots: what did this
    refresh actually do — and the join key for incremental downstream
    work (re-embed only added ∪ changed, retire removed from indexes).

    100 TB: two digest projections (map-side) + ONE full-outer hash
    equi-join on the key; the digest comparison ships 16-byte md5s, not
    document bytes.
    """
    from .dedup import _NORM_SPARK
    o = old.select(
        F.col(key), F.expr(f"md5({_NORM_SPARK})").alias("_od"))
    n = new.select(
        F.col(key), F.expr(f"md5({_NORM_SPARK})").alias("_nd"))
    return (
        o.join(n, key, "full_outer")
        .select(
            key,
            F.when(F.col("_od").isNull(), F.lit("added"))
            .when(F.col("_nd").isNull(), F.lit("removed"))
            .when(F.col("_od") != F.col("_nd"), F.lit("changed"))
            .otherwise(F.lit("unchanged"))
            .alias("status"),
        )
        .orderBy(key)
    )



def corpus_diff_sql(
    old_pred: str,
    new_pred: str,
    table: str = "documents",
    key: str = "doc_id",
    new_text: str = "text",
) -> str:
    """DuckDB mirror of `corpus_diff` over two predicate-selected slices
    of one table (the oracle's two 'snapshots'); `new_text` lets the
    new side mutate text so the oracle can exercise 'changed'."""
    norm = r"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"
    norm_new = norm.replace("lower(text)", f"lower({new_text})")
    return f"""
        WITH o AS (SELECT {key}, md5({norm}) AS _od
                   FROM {table} WHERE {old_pred}),
        n AS (SELECT {key}, md5({norm_new}) AS _nd
              FROM {table} WHERE {new_pred})
        SELECT coalesce(o.{key}, n.{key}) AS {key},
               CASE WHEN o._od IS NULL THEN 'added'
                    WHEN n._nd IS NULL THEN 'removed'
                    WHEN o._od <> n._nd THEN 'changed'
                    ELSE 'unchanged' END AS status
        FROM o FULL OUTER JOIN n ON o.{key} = n.{key}
        ORDER BY 1
    """


def corpus_report(docs: DataFrame) -> DataFrame:
    """One-row corpus health report — the dashboard number a pipeline
    owner reads after every refresh, composed from the per-doc signals
    this package already computes:

        (n_docs, total_tokens, mean_quality, share_en,
         n_exact_dup_docs, mean_repetition)

    n_exact_dup_docs counts documents beyond each content group's keeper
    (n_docs − distinct normalized digests) — the volume exact dedup
    would remove. Means are integer-µunit deterministic (the
    source_quality_profile discipline): floor-half-up µ sums divided
    once, so partitioning cannot move a digit.

    100 TB: two doc-keyed equi-joins to line up the per-doc signals,
    then ONE aggregation (the single distinct-digest count rides Spark's
    expand, still one shuffle). Everything upstream is projection."""
    stats = with_text_stats(docs).select("doc_id", "n_tokens",
                                         "quality_score")
    from .contamination import repetition
    from .dedup import _NORM_SPARK
    from .text import with_lang_id

    # with_lang_id echoes the labeled `lang` column for comparison; the
    # report only needs the prediction, so synthesize the label when the
    # input has none (hand-built corpora)
    lang_in = docs if "lang" in docs.columns else docs.withColumn(
        "lang", F.lit(None).cast("string"))
    langs = with_lang_id(lang_in).select("doc_id", "pred_lang")
    reps = repetition(docs).select("doc_id", "repetition")
    digests = docs.select(
        "doc_id", F.expr(f"md5({_NORM_SPARK})").alias("_digest"))
    per_doc = (
        stats.join(langs, "doc_id")
        .join(reps, "doc_id")
        .join(digests, "doc_id")
        .select(
            "n_tokens",
            F.floor(F.col("quality_score") * 1e6 + F.lit(0.5))
             .cast("bigint").alias("_qmu"),
            (F.col("pred_lang") == "en").cast("int").alias("_is_en"),
            F.floor(F.col("repetition") * 1e6 + F.lit(0.5))
             .cast("bigint").alias("_rmu"),
            "_digest",
        )
    )
    n = F.count("*")
    return per_doc.agg(
        n.alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        (F.floor(F.sum("_qmu").cast("double") / n.cast("double") + F.lit(0.5))
         / 1e6).alias("mean_quality"),
        F.round(F.sum("_is_en").cast("double") / n.cast("double"), 6)
         .alias("share_en"),
        (n - F.countDistinct("_digest")).cast("bigint")
         .alias("n_exact_dup_docs"),
        (F.floor(F.sum("_rmu").cast("double") / n.cast("double") + F.lit(0.5))
         / 1e6).alias("mean_repetition"),
    )


def corpus_report_sql(table: str = "documents") -> str:
    """DuckDB mirror of `corpus_report` (same per-doc signals, µ-mean
    rounding, digest convention)."""
    from .contamination import repetition_sql
    from .text import lang_id_sql, norm_sql

    return f"""
        WITH stats AS ({text_stats_sql(table)}),
        langs AS ({lang_id_sql(table)}),
        reps AS ({repetition_sql(table)}),
        digests AS (
            SELECT doc_id, md5({norm_sql('text')}) AS _digest FROM {table}
        ),
        per_doc AS (
            SELECT s.n_tokens,
                   CAST(floor(s.quality_score * 1e6 + 0.5) AS BIGINT) AS _qmu,
                   CASE WHEN l.pred_lang = 'en' THEN 1 ELSE 0 END AS _is_en,
                   CAST(floor(r.repetition * 1e6 + 0.5) AS BIGINT) AS _rmu,
                   d._digest
            FROM stats s
            JOIN langs l ON s.doc_id = l.doc_id
            JOIN reps r ON s.doc_id = r.doc_id
            JOIN digests d ON s.doc_id = d.doc_id
        )
        SELECT count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
               floor(CAST(sum(_qmu) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                     + 0.5) / 1e6 AS mean_quality,
               round(CAST(sum(_is_en) AS DOUBLE) / CAST(count(*) AS DOUBLE),
                     6) AS share_en,
               CAST(count(*) - count(DISTINCT _digest) AS BIGINT)
                   AS n_exact_dup_docs,
               floor(CAST(sum(_rmu) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                     + 0.5) / 1e6 AS mean_repetition
        FROM per_doc
    """


def source_dedup_profile(docs: DataFrame) -> DataFrame:
    """Per-source duplicate-rate profile — the curation dashboard's
    "which feed is sending us copies?" row: (source, n_docs,
    n_unique, n_exact_dup_docs, dup_rate), source-ascending, where
    uniqueness is the normalized-text digest (the exact-dedup key).

    100 TB: one projection to 16-byte digests + one (source)-keyed
    aggregation with a distinct count — no joins, no document bytes
    shuffled."""
    from .text import norm_col

    per = docs.select("source", F.md5(norm_col("text")).alias("_d"))
    return (
        per.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.count_distinct("_d").alias("n_unique"),
        )
        .select(
            "source", "n_docs", "n_unique",
            (F.col("n_docs") - F.col("n_unique")).alias("n_exact_dup_docs"),
            F.round(
                (F.col("n_docs") - F.col("n_unique"))
                / F.col("n_docs"), 6
            ).alias("dup_rate"),
        )
        .orderBy("source")
    )


def source_dedup_profile_sql(table: str = "documents") -> str:
    """DuckDB mirror of `source_dedup_profile`."""
    from .text import norm_sql

    return f"""
        WITH per AS (
            SELECT source, md5({norm_sql('text')}) AS _d FROM {table}
        )
        SELECT source,
               count(*) AS n_docs,
               count(DISTINCT _d) AS n_unique,
               CAST(count(*) - count(DISTINCT _d) AS BIGINT)
                   AS n_exact_dup_docs,
               round(CAST(count(*) - count(DISTINCT _d) AS DOUBLE)
                     / CAST(count(*) AS DOUBLE), 6) AS dup_rate
        FROM per GROUP BY source ORDER BY source
    """


def domain_dedup(docs: DataFrame, domain_col: str = "source") -> DataFrame:
    """HOST-level exact dedup (VERDICT r10 #5a; RefinedWeb, Penedo et
    al. 2023 — deduplicate WITHIN each host/domain, keep cross-domain
    copies): within each (domain, normalized-text digest) group the
    smallest doc_id survives. The host-level scope is the boilerplate
    heuristic — a page repeated across a single domain is template
    noise, while the same text appearing on two domains is evidence of
    syndicated CONTENT the global `dedup_exact` pass weighs separately.

    Output per document (doc_id-ascending): doc_id, <domain_col>, keep.

    100 TB: one projection to 16-byte digests + one min() window over
    the (domain, digest) key — a single bounded shuffle, no document
    bytes moved; composes with `source_dedup_profile` (same digest) and
    feeds the admission pipeline like the `ok_exact` tier."""
    from pyspark.sql.window import Window

    from .text import norm_col

    w = Window.partitionBy(domain_col, F.md5(norm_col("text")))
    return (
        docs.select(
            "doc_id", domain_col,
            (F.col("doc_id") == F.min("doc_id").over(w)).alias("keep"),
        )
        .orderBy("doc_id")
    )


def domain_dedup_sql(table: str = "documents",
                     domain_col: str = "source") -> str:
    """DuckDB mirror of `domain_dedup`."""
    from .text import norm_sql

    return f"""
        SELECT doc_id, {domain_col},
               doc_id = min(doc_id) OVER (
                   PARTITION BY {domain_col}, md5({norm_sql('text')})
               ) AS keep
        FROM {table}
        ORDER BY doc_id
    """


def domain_cap_sample(
    docs: DataFrame,
    cap: int = 18,
    domain_col: str = "source",
    key: str = "doc_id",
    salt: str = "domain_cap",
) -> DataFrame:
    """Per-domain document cap (VERDICT r10 #5a; the RefinedWeb /
    FineWeb anti-over-representation control): keep at most `cap`
    documents per domain, chosen by a deterministic salted-hash order —
    a uniform random sample per domain that survives any cluster
    layout, so a crawl where one host contributes 10⁸ pages cannot
    dominate the training mixture.

    Output (kept rows only, doc_id-ascending): doc_id, <domain_col>,
    rk (the document's hash rank within its domain, 1-based ≤ cap).
    Rank order is (bucket, doc_id) over the shared md5 bucket trick
    (`sampling._bucket_col`), identical in both engines.

    100 TB: one window shuffle keyed by domain. A pathological
    mega-domain makes one hot partition — at that scale switch the
    rank to the two-phase salted top-k (the `distinct_users_daily_
    salted` pattern): per (domain, shard) local rank prunes to ≤cap
    rows per shard, then the global rank runs on ≤cap·shards rows."""
    from pyspark.sql.window import Window

    from .sampling import _bucket_col

    b = _bucket_col(F.col(key).cast("string"), salt)
    w = Window.partitionBy(domain_col).orderBy("bucket", key)
    return (
        docs.select(key, domain_col, b)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= cap)
        .select(key, domain_col, "rk")
        .orderBy(key)
    )


def domain_cap_sample_sql(
    table: str = "documents",
    cap: int = 18,
    domain_col: str = "source",
    key: str = "doc_id",
    salt: str = "domain_cap",
) -> str:
    """DuckDB mirror of `domain_cap_sample`."""
    from .sampling import _bucket_sql

    b = _bucket_sql(f"CAST({key} AS VARCHAR)", salt)
    return f"""
        SELECT {key}, {domain_col}, rk FROM (
            SELECT {key}, {domain_col},
                   row_number() OVER (
                       PARTITION BY {domain_col}
                       ORDER BY ({b}), {key}
                   ) AS rk
            FROM {table}
        ) WHERE rk <= {cap}
        ORDER BY {key}
    """


def source_mix_entropy(docs: DataFrame) -> DataFrame:
    """Shannon entropy of the SOURCE MIX (one row): how evenly the
    corpus draws from its sources — the single drift dial a recurring
    ingest watches next to `corpus_report` (entropy collapsing toward 0
    means one source is taking over; rising toward ln(S) means the mix
    is flattening). Also reports the dominant source and its share.

    Exactness: shares are exact integer ppm (cnt·1e6 DIV total); the
    entropy term is the single libm `ln` per SOURCE (the bm25_search
    last-ulp allowance), folded to µnats and summed over the S-row
    source table — never over the corpus. Output: (n_sources,
    entropy_mu_nats, top_source, top_share_ppm).

    100 TB: one source-keyed partial-agg shuffle (S keys), then S-row
    arithmetic."""
    per = docs.groupBy("source").agg(F.count("*").alias("cnt"))
    tot = per.agg(F.sum("cnt").alias("tot"))
    scored = per.join(F.broadcast(tot)).select(
        "source", "cnt",
        F.expr("cnt * 1000000 DIV tot").alias("share_ppm"),
        F.expr("CAST(floor(-ln(CAST(cnt AS DOUBLE) / tot)"
               " * (CAST(cnt AS DOUBLE) / tot) * 1e6 + 0.5) AS BIGINT)")
        .alias("h_mu"),
    )
    return scored.agg(
        F.count("*").alias("n_sources"),
        F.sum("h_mu").alias("entropy_mu_nats"),
        F.max(F.struct(F.col("cnt"), F.col("source"))).alias("_top"),
        F.max(F.struct(F.col("cnt"), F.col("share_ppm"))).alias("_ts"),
    ).select(
        "n_sources", "entropy_mu_nats",
        F.col("_top.source").alias("top_source"),
        F.col("_ts.share_ppm").alias("top_share_ppm"),
    )


def source_mix_entropy_sql(table: str = "documents") -> str:
    """DuckDB mirror of :func:`source_mix_entropy`."""
    return f"""
        WITH per AS (
            SELECT source, count(*) AS cnt FROM {table} GROUP BY 1
        ),
        tot AS (SELECT sum(cnt) AS tot FROM per),
        scored AS (
            SELECT source, cnt,
                   CAST(cnt * 1000000 // tot AS BIGINT) AS share_ppm,
                   CAST(floor(-ln(CAST(cnt AS DOUBLE) / tot)
                        * (CAST(cnt AS DOUBLE) / tot) * 1e6 + 0.5)
                        AS BIGINT) AS h_mu
            FROM per, tot
        )
        SELECT count(*) AS n_sources,
               CAST(sum(h_mu) AS BIGINT) AS entropy_mu_nats,
               (SELECT source FROM scored
                ORDER BY cnt DESC, source DESC LIMIT 1) AS top_source,
               (SELECT share_ppm FROM scored
                ORDER BY cnt DESC, share_ppm DESC LIMIT 1)
                   AS top_share_ppm
        FROM scored
    """


def tier_dup_lift(
    docs: DataFrame,
    min_est: float = 0.9,
    shingle_n: int = 2,
    num_bands: int = 8,
) -> DataFrame:
    """Quality-tier × near-duplicate CORRELATION audit: per edu tier,
    how much likelier are its documents to be verified near-duplicates
    than the corpus average — the RefinedWeb observation that
    low-quality strata are dup-heavy (so quality filtering and dedup
    partly overlap, and running both must be priced, not assumed
    additive).

    A document is "near-dup" when it appears on either side of a
    MinHash-LSH candidate pair with estimated Jaccard >= `min_est`
    (the round-6 estimate compares identically on both engines).
    Counts, ppm rates, and the lift ratio are all exact integers:
    dup_ppm = 1e6·n_dup DIV n_docs per tier, lift_ppm = dup_ppm·1e6
    DIV corpus_ppm (operands non-negative, so Spark DIV ≡ DuckDB //;
    dup_ppm ≤ 1e6 keeps the product ≤ 1e12, far inside int64).

    Output (tier-ascending): tier, n_docs, n_dup_docs, dup_ppm,
    lift_ppm.

    100 TB: the MinHash pass is `dedup_near`'s own banded-equi-join
    cost (shared with the dedup pipeline when both run); everything
    after is one distinct over pair endpoints, one doc-keyed left
    join, and a T-row statistic table with a 1-row broadcast attach."""
    from .dedup import dedup_near
    from .quality_rules import edu_tier

    tiers = edu_tier(docs).select("doc_id", "tier")
    pairs = dedup_near(docs, shingle_n=shingle_n, num_bands=num_bands,
                       min_est=min_est)
    dup_ids = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
        .withColumn("_dup", F.lit(1).cast("bigint"))
    )
    per = (
        tiers.join(dup_ids, "doc_id", "left")
        .groupBy("tier")
        .agg(F.count("*").alias("n_docs"),
             F.sum(F.coalesce(F.col("_dup"), F.lit(0).cast("bigint")))
             .alias("n_dup_docs"))
    )
    tot = per.agg(F.sum("n_docs").alias("_td"),
                  F.sum("n_dup_docs").alias("_tn"))
    return (
        per.join(F.broadcast(tot))
        .select(
            "tier", "n_docs", "n_dup_docs",
            F.expr("1000000 * n_dup_docs DIV n_docs").alias("dup_ppm"),
            F.expr("(1000000 * n_dup_docs DIV n_docs) * 1000000"
                   " DIV GREATEST(1000000 * _tn DIV _td, 1)")
            .alias("lift_ppm"),
        )
        .orderBy("tier")
    )


def tier_dup_lift_sql(
    table: str = "documents",
    min_est: float = 0.9,
    shingle_n: int = 2,
    num_bands: int = 8,
) -> str:
    """DuckDB mirror of :func:`tier_dup_lift` (edu_tier + dedup_near
    mirrors composed as derived tables, then the identical integer
    arithmetic)."""
    from .dedup import dedup_near_sql
    from .quality_rules import edu_tier_sql

    tiers = edu_tier_sql(table)
    pairs = dedup_near_sql(table, shingle_n=shingle_n,
                           num_bands=num_bands)
    return f"""
        WITH tiers AS (SELECT doc_id, tier FROM ({tiers})),
        pairs AS (SELECT * FROM ({pairs}) WHERE est_jaccard >= {min_est}),
        dup_ids AS (
            SELECT DISTINCT doc_id FROM (
                SELECT doc_a AS doc_id FROM pairs
                UNION ALL SELECT doc_b FROM pairs)
        ),
        per AS (
            SELECT t.tier, count(*) AS n_docs,
                   CAST(sum(CASE WHEN d.doc_id IS NULL THEN 0 ELSE 1 END)
                        AS BIGINT) AS n_dup_docs
            FROM tiers t LEFT JOIN dup_ids d ON d.doc_id = t.doc_id
            GROUP BY 1
        ),
        tot AS (
            SELECT CAST(sum(n_docs) AS BIGINT) AS td,
                   CAST(sum(n_dup_docs) AS BIGINT) AS tn
            FROM per
        )
        SELECT tier, n_docs, n_dup_docs,
               CAST(1000000 * n_dup_docs // n_docs AS BIGINT) AS dup_ppm,
               CAST((1000000 * n_dup_docs // n_docs) * 1000000
                    // greatest(1000000 * tn // td, 1) AS BIGINT)
                   AS lift_ppm
        FROM per, tot ORDER BY tier
    """


def token_mix_by_tier(docs: DataFrame) -> DataFrame:
    """The MIXTURE TABLE a tiered curriculum actually samples from:
    per (source, edu tier), document count, total whitespace tokens,
    and each cell's exact-ppm share of corpus tokens — the join of the
    source axis (`source_mix_entropy`, `domain_cap_sample`) with the
    quality axis (`edu_tier`) that upsampling/curriculum policies
    (`epoch_upsample`, `curriculum_select`, DoReMi weights) consume.

    All integers: token counts are BIGINT sums, shares are
    1e6·tokens DIV total. Output (source- then tier-ascending):
    source, tier, n_docs, tokens, token_share_ppm.

    100 TB: ONE codegen projection (tier features + token count in the
    same scan), one (source, tier)-keyed partial-agg shuffle (S×T
    keys), then statistic-table arithmetic with a 1-row broadcast."""
    from .quality_rules import edu_tier
    from .text import tokens_col

    tiers = edu_tier(docs).select("doc_id", "tier")
    toks = docs.select(
        "doc_id", "source",
        F.size(tokens_col("text")).cast("bigint").alias("_nt"))
    per = (
        toks.join(tiers, "doc_id")
        .groupBy("source", "tier")
        .agg(F.count("*").alias("n_docs"),
             F.sum("_nt").alias("tokens"))
    )
    tot = per.agg(F.sum("tokens").alias("_tt"))
    return (
        per.join(F.broadcast(tot))
        .select("source", "tier", "n_docs", "tokens",
                F.expr("1000000 * tokens DIV _tt")
                .alias("token_share_ppm"))
        .orderBy("source", "tier")
    )


def token_mix_by_tier_sql(table: str = "documents") -> str:
    """DuckDB mirror of :func:`token_mix_by_tier`."""
    from .quality_rules import edu_tier_sql
    from .text import tokens_sql

    tiers = edu_tier_sql(table)
    toks = tokens_sql("text")
    return f"""
        WITH tiers AS (SELECT doc_id, tier FROM ({tiers})),
        per AS (
            SELECT d.source, t.tier, count(*) AS n_docs,
                   CAST(sum(CAST(len({toks}) AS BIGINT)) AS BIGINT)
                       AS tokens
            FROM {table} d JOIN tiers t ON t.doc_id = d.doc_id
            GROUP BY 1, 2
        ),
        tot AS (SELECT CAST(sum(tokens) AS BIGINT) AS tt FROM per)
        SELECT source, tier, n_docs, tokens,
               CAST(1000000 * tokens // tt AS BIGINT) AS token_share_ppm
        FROM per, tot ORDER BY source, tier
    """


def length_bucket_drift(docs: DataFrame) -> DataFrame:
    """Per-source document-length distribution drift vs the corpus:
    docs bucket by the BIT WIDTH of their whitespace token count
    (length(bin(n)) — an exact integer ⌊log₂⌋+1 both engines compute
    identically, no float log), shares fold to exact integer ppm, and
    each source's drift is the L1 distance between its bucket
    distribution and the corpus distribution over the DENSE
    source×bucket grid (missing cells count as 0 — dropping them
    would understate drift for sources missing a corpus-heavy
    bucket). The "did this source's length profile shift the mix?"
    dial next to `source_mix_entropy`.

    100 TB: the bucket is a codegen projection; one (source, bucket)
    partial-agg shuffle; everything after is statistic-sized — the
    S×B grid is an S-row × B-row broadcast cross join (≤ a few
    hundred cells), never the corpus."""
    from .text import tokens_col

    b = docs.select(
        "source",
        F.length(F.bin(F.size(tokens_col("text")).cast("bigint")))
        .cast("bigint").alias("bucket"))
    cell = b.groupBy("source", "bucket").agg(F.count("*").alias("cnt"))
    stot = cell.groupBy("source").agg(F.sum("cnt").alias("_s_tot"))
    btot = cell.groupBy("bucket").agg(F.sum("cnt").alias("_b_cnt"))
    gtot = btot.agg(F.sum("_b_cnt").alias("_g_tot"))
    corpus = btot.join(F.broadcast(gtot)).select(
        "bucket", F.expr("_b_cnt * 1000000 DIV _g_tot").alias("_c_ppm"))
    grid = stot.join(F.broadcast(corpus))  # S-row × B-row statistic grid
    return (
        grid.join(cell, ["source", "bucket"], "left")
        .select(
            "source", "_s_tot",
            F.expr("abs(coalesce(cnt, 0) * 1000000 DIV _s_tot - _c_ppm)")
            .alias("_d"))
        .groupBy("source")
        .agg(F.max("_s_tot").alias("n_docs"),
             F.sum("_d").alias("l1_drift_ppm"))
        .orderBy("source")
    )


def length_bucket_drift_sql(table: str = "documents") -> str:
    """DuckDB mirror of :func:`length_bucket_drift`."""
    from .text import norm_sql

    toks = f"string_split({norm_sql('text')}, ' ')"
    return f"""
        WITH b AS (
            SELECT source,
                   CAST(length(bin(CAST(len({toks}) AS BIGINT)))
                        AS BIGINT) AS bucket
            FROM {table}
        ),
        cell AS (
            SELECT source, bucket, count(*) AS cnt FROM b GROUP BY 1, 2
        ),
        stot AS (
            SELECT source, CAST(sum(cnt) AS BIGINT) AS s_tot
            FROM cell GROUP BY 1
        ),
        btot AS (
            SELECT bucket, CAST(sum(cnt) AS BIGINT) AS b_cnt
            FROM cell GROUP BY 1
        ),
        corpus AS (
            SELECT bucket,
                   CAST(b_cnt * 1000000 // (SELECT sum(b_cnt) FROM btot)
                        AS BIGINT) AS c_ppm
            FROM btot
        ),
        grid AS (SELECT * FROM stot CROSS JOIN corpus)
        SELECT g.source, max(g.s_tot) AS n_docs,
               CAST(sum(abs(coalesce(c.cnt, 0) * 1000000 // g.s_tot
                            - g.c_ppm)) AS BIGINT) AS l1_drift_ppm
        FROM grid g
        LEFT JOIN cell c ON c.source = g.source AND c.bucket = g.bucket
        GROUP BY 1 ORDER BY 1
    """


def temperature_mix(docs: DataFrame, alpha_ppm: int = 700_000) -> DataFrame:
    """Temperature-scaled source sampling shares (the mT5/XLM-R
    mixing rule): p(s) ∝ share(s)^α with α = alpha_ppm/1e6 — α < 1
    up-weights low-resource sources; the table a mixture sampler
    consumes next to `doremi_weights` (learned) and
    `token_budget_sample` (fixed quotas).

    Exactness: per-source token counts are exact integers (size() of
    the token array, no explode); share is ONE IEEE division of two
    exact integers; share^α is computed as exp(α·ln(share)) — NOT
    pow() — which NARROWS the cross-engine exposure (ADVICE r11):
    pow is a single primitive whose rounding paths differ most
    between JVM Math.pow and libm, while exp/ln are the tightest
    (≤1-ulp, near-always correctly rounded) primitives on both.
    Neither engine GUARANTEES correct rounding, so the residual
    last-ulp-at-an-x.5-floor-boundary flip remains the accepted
    exposure class documented at unigram_bits — not eliminated; do
    not build exactness-load-bearing logic on this fold. The
    two libm calls are per SOURCE row (the source_mix_entropy ln
    allowance — S rows, never the corpus), folded to µunits; the
    normalized temperature share is
    then exact integer ppm of the µunit weights. Output: (source,
    n_docs, tokens, share_ppm, temp_share_ppm, boost_ppm =
    temp·1e6 DIV share — >1e6 means the temperature up-weighted the
    source), source-ascending.

    100 TB: one corpus scan with a codegen size() projection, one
    S-key partial-agg shuffle, then S-row arithmetic."""
    from .text import tokens_col

    alpha = alpha_ppm / 1e6
    per = docs.select(
        "source", F.size(tokens_col("text")).cast("bigint").alias("_nt")
    ).groupBy("source").agg(
        F.count("*").alias("n_docs"), F.sum("_nt").alias("tokens"))
    tot = per.agg(F.sum("tokens").alias("_tt"))
    w = per.join(F.broadcast(tot)).select(
        "source", "n_docs", "tokens",
        F.expr("tokens * 1000000 DIV _tt").alias("share_ppm"),
        F.expr(
            "CAST(floor(CASE WHEN tokens <= 0 THEN 0.0D ELSE"
            f" exp({alpha!r} * ln(CAST(tokens AS DOUBLE) / _tt)) END"
            " * 1e6 + 0.5) AS BIGINT)").alias("_w_mu"))
    wt = w.agg(F.sum("_w_mu").alias("_sw"))
    return (
        w.join(F.broadcast(wt))
        .select(
            "source", "n_docs", "tokens", "share_ppm",
            F.expr("_w_mu * 1000000 DIV _sw").alias("temp_share_ppm"),
            F.expr("CASE WHEN share_ppm = 0 THEN NULL ELSE"
                   " (_w_mu * 1000000 DIV _sw) * 1000000 DIV share_ppm"
                   " END").alias("boost_ppm"))
        .orderBy("source")
    )


def temperature_mix_sql(table: str = "documents",
                        alpha_ppm: int = 700_000) -> str:
    """DuckDB mirror of :func:`temperature_mix`."""
    from .text import norm_sql

    alpha = alpha_ppm / 1e6
    toks = f"string_split({norm_sql('text')}, ' ')"
    return f"""
        WITH per AS (
            SELECT source, count(*) AS n_docs,
                   CAST(sum(len({toks})) AS BIGINT) AS tokens
            FROM {table} GROUP BY 1
        ),
        tot AS (SELECT CAST(sum(tokens) AS BIGINT) AS tt FROM per),
        w AS (
            SELECT source, n_docs, tokens,
                   CAST(tokens * 1000000 // tt AS BIGINT) AS share_ppm,
                   CAST(floor(CASE WHEN tokens <= 0 THEN 0.0 ELSE
                        exp({alpha!r} * ln(CAST(tokens AS DOUBLE) / tt))
                        END * 1e6 + 0.5) AS BIGINT) AS w_mu
            FROM per, tot
        ),
        wt AS (SELECT CAST(sum(w_mu) AS BIGINT) AS sw FROM w)
        SELECT source, n_docs, tokens, share_ppm,
               CAST(w_mu * 1000000 // sw AS BIGINT) AS temp_share_ppm,
               CASE WHEN share_ppm = 0 THEN NULL ELSE
                   CAST((w_mu * 1000000 // sw) * 1000000 // share_ppm
                        AS BIGINT) END AS boost_ppm
        FROM w, wt
        ORDER BY source
    """


def source_pair_jaccard(docs: DataFrame) -> DataFrame:
    """Source-pair VOCABULARY overlap: exact Jaccard (in integer ppm)
    between every pair of sources' distinct-token sets — the "are two
    sources near-mirrors of each other" dial (e.g. two crawl dumps of
    the same sites) that `source_overlap` answers at the DOCUMENT
    level and this answers at the vocabulary level.

    Output: (source_a, source_b, vocab_a, vocab_b, common,
    jaccard_ppm), source_a < source_b, ordered by jaccard desc then
    the pair. Exact: |A∩B| counted on the (token, source)-distinct
    table, |A∪B| = |A| + |B| − |A∩B|, ppm by integer DIV. Pairs with
    an EMPTY intersection are ABSENT (token inner join) — at corpus
    scale the interesting output is the near-mirror head, and an
    all-pairs zero-fill would be S² rows of noise.

    Empty/whitespace-only documents tokenize to [''] (the split
    convention); the '' phantom is FILTERED here (the unigram_bits
    precedent) — without it two sources sharing only blank docs would
    report a perfect near-mirror.

    100 TB: ONE (source, token) distinct shuffle; the pair join is
    token-keyed and emits at most S²/2 rows per token (S = sources,
    tiny), so the join output is bounded by |vocab|·S² — never
    doc-sized; per-source vocab sizes ride the same distinct table."""
    from .text import tokens_col

    tok = (
        docs.select(
            "source",
            F.explode(F.array_distinct(tokens_col("text")))
            .alias("token"))
        .filter(F.col("token") != "")
        .distinct()
    )
    a = tok.select(F.col("source").alias("source_a"), "token")
    b = tok.select(F.col("source").alias("source_b"), "token")
    common = (
        a.join(b, "token")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("common"))
    )
    sizes = tok.groupBy("source").agg(F.count("*").alias("vocab"))
    sa = sizes.select(F.col("source").alias("source_a"),
                      F.col("vocab").alias("vocab_a"))
    sb = sizes.select(F.col("source").alias("source_b"),
                      F.col("vocab").alias("vocab_b"))
    return (
        common.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a", "source_b", "vocab_a", "vocab_b", "common",
            F.expr("common * 1000000"
                   " DIV (vocab_a + vocab_b - common)")
            .alias("jaccard_ppm"))
        .orderBy(F.col("jaccard_ppm").desc(), "source_a", "source_b")
    )


def source_pair_jaccard_sql(table: str = "documents") -> str:
    """DuckDB mirror of :func:`source_pair_jaccard`."""
    from .text import norm_sql

    toks = f"string_split({norm_sql('text')}, ' ')"
    return f"""
        WITH tok AS (
            SELECT DISTINCT source, token
            FROM (SELECT source, unnest(list_distinct({toks})) AS token
                  FROM {table})
            WHERE token <> ''
        ),
        common AS (
            SELECT a.source AS source_a, b.source AS source_b,
                   count(*) AS common
            FROM tok a JOIN tok b ON a.token = b.token
                                 AND a.source < b.source
            GROUP BY 1, 2
        ),
        sizes AS (SELECT source, count(*) AS vocab FROM tok GROUP BY 1)
        SELECT c.source_a, c.source_b,
               sa.vocab AS vocab_a, sb.vocab AS vocab_b,
               CAST(c.common AS BIGINT) AS common,
               CAST(c.common * 1000000
                    // (sa.vocab + sb.vocab - c.common) AS BIGINT)
                   AS jaccard_ppm
        FROM common c
        JOIN sizes sa ON sa.source = c.source_a
        JOIN sizes sb ON sb.source = c.source_b
        ORDER BY jaccard_ppm DESC, c.source_a, c.source_b
    """
