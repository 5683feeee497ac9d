"""Scaling probe: synthesize an sf1-equivalent dataset (10× sf0.1) and
time the headline operators at both scales.

All per-round scale claims are design arguments verified at sf0.1; this
script puts one real datapoint behind them — a super-linear surprise in
cover enumeration, connected-components round count, window skew, or
the IVF list layout would show up as a ratio well above the ~10×
data-volume factor (modulo fixed per-query overhead, which dominates
sub-second entries).

Generation (to $SPARK_GRAFT_SF1_DIR, default /tmp/explora_sf1): each
sf0.1 table is unioned 10× with consistent key shifts (+i·10⁹ on every
join key, so all FK relationships survive), dimension tables copied
as-is. Documents get a per-replica text salt (replicas become NEAR
duplicates, not exact — the harder dedup case); embeddings get a small
deterministic per-replica direction perturbation (pure copies would
make every top-k a tie). Events keep their time range and geo — 10×
densification per cell-time bucket, which is how a real deployment
grows.

Usage: python tools/bench_scale.py  → writes BENCH_sf1.json
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402
from explora_kafka_spark.session import get_spark  # noqa: E402

SF01_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF1_DIR = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/explora_sf1")
REPLICAS = 10
SHIFT = 1_000_000_000  # far above any sf0.1 key

#: per-table bigint key columns that must shift together (FK-consistent)
KEY_SHIFTS = {
    "customer": ["c_custkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
}
DIMS = ["nation", "region"]

#: headline entries: the reference's two query shapes + the heaviest
#: LLM-pipeline operators + one star-schema OLAP join
HEADLINE = [
    "history_range_hour", "snapshot_day", "snapshot_bbox_quad",
    "snapshot_polygon_quad",
    "dedup_near", "dedup_groups", "group_aware_split",
    "contamination_ngram",
    "token_frequency", "pack_sequences", "bpe_merges", "bpe_encode",
    "bigram_bits", "bm25_search",
    "ann_topk_ivf", "ann_topk_ivf_quantized", "ann_topk_pq",
    "ann_topk_ivfpq",
    "funnel_day", "join_rollup_nation", "topk_events",
    # round-8 fourth wave
    "ngram_repetition", "filter_pipeline", "pack_docs",
    "click_attribution", "embedding_covariance", "local_supplier_volume",
    # round-8 fifth wave
    "semantic_dedup", "dsir_weights",
    # round-8 sixth wave: index-served + composed + applied paths
    "semdedup_check", "corpus_gate_full", "pca_project", "dsir_select",
    "semantic_groups",
    # round-8 seventh wave: graph/selection/layout/behavioral
    "label_propagation", "knn_hubness", "kcenter_select",
    "quality_logit", "filter_pipeline_full", "metric_trend",
    "zorder_layout", "item_lift", "trending_items",
    "ann_recall_truncated", "snapshot_regions_quad",
    # round-9 wave: retrieval fusion, spatial joins, media dedup,
    # sketches, quality gate, graph metrics, kernelized kNN
    "hybrid_search", "proximity_pairs", "nearest_poi", "media_phash",
    "phash_near_dup", "expect_events", "cms_heavy_hitters",
    "knn_triangles", "weighted_sample", "cube_docs", "knn_graph",
    # round-9 late wave
    "phash_check", "expect_by_source", "revenue_q6",
    "priority_late_ships", "cust_order_dist", "winnow_fingerprints",
    "ann_topk_mmr", "session_view", "hopping_view",
    # round-9 late wave (VERDICT r9 #7) + round-10 additions
    "segment_view", "snapshot_smoothed", "metric_seasonality",
    "source_mix_entropy", "knn_pagerank", "doremi_weights",
    # round-11 waves: TPC-H shapes (exact-integer revenue), corpus
    # mixture audits, cluster diagnostics (kmeans family rides the
    # rekey overrides' rationale but these registry entries run the
    # sf-scoped fixture constants, so probe at registry parameters)
    "promo_revenue", "volume_shipping", "waiting_supplier",
    "large_orders", "idle_customers", "market_share",
    "domain_dedup", "domain_cap_sample", "contamination_width_audit",
    "edu_tier", "edu_web_disagreement", "token_mix_by_tier",
    "tier_dup_lift", "ann_topk_ivf_indexed", "pack_efficiency_report",
    # round-11 late waves: third TPC-H wave + lexical-diversity audits
    "nation_profit", "important_parts", "parts_supplier_variety",
    "concentrated_part_suppliers", "min_cost_supplier",
    "ttr_profile", "zipf_slope", "ngram_novelty", "length_bucket_drift",
    "temperature_mix", "vocab_coverage", "expect_embeddings",
    "near_dup_cluster_profile", "blocklist_filter",
    "source_pair_jaccard",
    # round-12 wave: incremental index maintenance + staleness audit
    # (ann_recall_drift rides a budgeted override — its brute truth
    # side shares ann_recall_truncated's fixed-fraction quadratic)
    "ivf_index_append", "ann_recall_drift", "ivf_list_skew",
    # round-13 wave: the index ledger ported to the dedup + media axes
    # (stream-appended indexes served + the band shard-skew audit)
    "dedup_index_append", "dedup_band_skew", "phash_index_append",
    "contamination_bloom_audit", "contamination_bloom_sweep",
    # round-14 wave: the Bloom scale mode wired into the gate + the
    # first-write-wins committed read over the verdict sinks + the
    # hot-bucket anchor cap (the *_capped probe twins run the three
    # documented sf1 dedup tails WITH the cap engaged, next to their
    # uncapped originals — the before/after of the r13 verdict's
    # "one missing scale valve")
    "corpus_gate_bloom", "gate_verdicts_read",
    "dedup_near_capped", "lsh_cap_audit",
    "dedup_groups_capped", "group_aware_split_capped",
    "near_dup_cluster_profile_capped",
    # ... and the cap extended to the two hamming-banded families,
    # probed next to their uncapped originals (phash_near_dup was
    # already a headline row; simhash_near_dup joins it here)
    "simhash_near_dup", "simhash_capped", "phash_capped",
    "phash_check_capped", "gate_verdict_log", "corpus_gate_capped",
    "simhash_cap_audit",
]


def _q_semantic_dedup_rekeyed(spark, sf_dir):
    """semantic_dedup on the sf1 replica set, re-keyed first: the
    generator's +i·10⁹ key shifts violate the kmeans dense-id stride
    contract (clustering.py docstring — a sparse id subset seeds fewer
    than k clusters, and ONE cluster would make the pair stage
    all-pairs). Re-keying with row_number is the contract's documented
    fix; at probe scale the global window is trivial, at corpus scale
    you re-key once at corpus build."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from explora_kafka_spark.operators import semdedup as SDD

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        (F.row_number().over(Window.orderBy("vec_id")) - 1)
        .alias("vec_id"), "embedding")
    return SDD.semantic_dedup(emb, k=64, iters=2, threshold_pct=30)


def _q_semantic_groups_rekeyed(spark, sf_dir):
    """semantic_groups with the same re-key + k=64 sizing as the
    semantic_dedup override (same sparse-id rationale)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from explora_kafka_spark.operators import semdedup as SDD

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        (F.row_number().over(Window.orderBy("vec_id")) - 1)
        .alias("vec_id"), "embedding")
    return SDD.semantic_groups(emb, k=64, iters=2, threshold_pct=30)


def _q_label_propagation_rekeyed(spark, sf_dir):
    """label_propagation with the semantic_dedup re-key (dense-id
    stride contract) + k_clusters=64 so expected cluster size stays
    ~√n-bounded for the within-cluster pair stage."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from explora_kafka_spark.operators import semdedup as SDD

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        (F.row_number().over(Window.orderBy("vec_id")) - 1)
        .alias("vec_id"), "embedding", "label")
    return SDD.label_propagation(emb, k_clusters=64, iters=2, k=5,
                                 rounds=3, seed_mod=5)


def _q_knn_hubness_rekeyed(spark, sf_dir):
    """knn_hubness with the same re-key + k_clusters=64 sizing."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from explora_kafka_spark.operators import semdedup as SDD

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        (F.row_number().over(Window.orderBy("vec_id")) - 1)
        .alias("vec_id"), "embedding")
    return SDD.knn_hubness(emb, k_clusters=64, iters=2, k=5, top=20)


#: probe-only entry replacements (re-keying etc.); measurement twins,
#: not correctness entries
def _q_ann_recall_truncated_budgeted(spark, sf_dir):
    """ann_recall_truncated with a FIXED query budget: the registry
    entry picks queries as a fixed FRACTION (vec_id % 50), which makes
    the brute audit quadratic under scale-up (queries × corpus both
    grow). A production audit fixes the query COUNT — query_mod scales
    with the corpus here (×10 at sf1 ⇒ same ~40 queries), so the probe
    ratio reflects corpus growth only. The sf0.1/sf0.01 entries are
    untouched (driver rows unaffected)."""
    from explora_kafka_spark.operators import similarity as S

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qm = max(1, emb.count() // 40)  # ~40 query ids at every scale
    return S.ann_recall_truncated(emb, query_mod=qm)


def _q_ann_topk_pq_budgeted(spark, sf_dir):
    """ann_topk_pq with the fixed ~40-query budget (the
    ann_recall_truncated override's rationale: serving cost per query
    is the scaling metric; the registry's fixed query FRACTION would
    make the probe quadratic)."""
    from explora_kafka_spark.operators import similarity as S

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qm = max(1, emb.count() // 40)
    return S.ann_topk_pq(emb, query_mod=qm)


def _q_ann_topk_ivf_budgeted(spark, sf_dir):
    """ann_topk_ivf with the fixed ~40-query budget (same rationale)."""
    from explora_kafka_spark.operators import similarity as S

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qm = max(1, emb.count() // 40)
    return S.ann_topk_ivf(emb, query_mod=qm)


def _q_knn_graph_rekeyed(spark, sf_dir):
    """knn_graph with the semantic_dedup re-key + k_clusters=64 sizing
    (dense-id stride contract; same rationale as the other overrides)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from explora_kafka_spark.operators import semdedup as SDD

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        (F.row_number().over(Window.orderBy("vec_id")) - 1)
        .alias("vec_id"), "embedding")
    return SDD.knn_graph(emb, k_clusters=64, iters=2, k=5)


def _q_knn_triangles_rekeyed(spark, sf_dir):
    """knn_triangles with the same re-key + k_clusters=64 sizing."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from explora_kafka_spark.operators import semdedup as SDD

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        (F.row_number().over(Window.orderBy("vec_id")) - 1)
        .alias("vec_id"), "embedding")
    return SDD.knn_triangles(emb, k_clusters=64, iters=2, k=5)


def _q_knn_pagerank_rekeyed(spark, sf_dir):
    """knn_pagerank with the semantic_dedup re-key + k_clusters=64
    sizing (dense-id stride contract; same rationale as knn_graph)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from explora_kafka_spark.operators import semdedup as SDD

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        (F.row_number().over(Window.orderBy("vec_id")) - 1)
        .alias("vec_id"), "embedding")
    return SDD.knn_pagerank(emb, k_clusters=64, iters=2, k=5, rounds=5)


def _q_ann_recall_drift_budgeted(spark, sf_dir):
    """ann_recall_drift with the fixed ~40-query budget (the
    ann_recall_truncated override's rationale: the brute truth side is
    quadratic under a fixed query FRACTION). Builds the stale index on
    the base slice in a probe-local temp dir via the entry layer's
    cached helper."""
    import __spark_entry__ as EE
    from explora_kafka_spark.operators import similarity as S

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qm = max(1, emb.count() // 40)
    return S.ann_recall_drift(
        spark, emb, EE._ivf_stale_index(spark, sf_dir), query_mod=qm)


def _q_dedup_groups_capped(spark, sf_dir):
    """dedup_groups with the hot-bucket anchor cap engaged (probe twin
    of the uncapped headline entry — the r13-verdict scale valve). The
    replica generator makes every doc a 10-clique member, so band
    buckets carry ~10× the members at sf1; max_bucket=20 (2× the
    clique width) leaves organic buckets untouched and bounds the
    boilerplate blow-up to linear."""
    from explora_kafka_spark.operators import dedup as D

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return D.dedup_groups(docs, threshold=0.6, shingle_n=2,
                          num_bands=8, max_bucket=20)


def _q_group_aware_split_capped(spark, sf_dir):
    """group_aware_split riding the capped dedup pass (same sizing
    rationale as _q_dedup_groups_capped)."""
    from explora_kafka_spark.operators import sampling as SMP

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return SMP.group_aware_split(docs, threshold=0.6, shingle_n=2,
                                 num_bands=8, max_bucket=20)


def _q_near_dup_cluster_profile_capped(spark, sf_dir):
    """near_dup_cluster_profile riding the capped dedup pass (same
    sizing rationale as _q_dedup_groups_capped)."""
    from explora_kafka_spark.operators import dedup as D

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return D.near_dup_cluster_profile(docs, threshold=0.6, shingle_n=2,
                                      num_bands=8, max_bucket=20)


OVERRIDES = {"semantic_dedup": _q_semantic_dedup_rekeyed,
             "dedup_groups_capped": _q_dedup_groups_capped,
             "group_aware_split_capped": _q_group_aware_split_capped,
             "near_dup_cluster_profile_capped":
                 _q_near_dup_cluster_profile_capped,
             "ann_recall_drift": _q_ann_recall_drift_budgeted,
             "knn_pagerank": _q_knn_pagerank_rekeyed,
             "semantic_groups": _q_semantic_groups_rekeyed,
             "label_propagation": _q_label_propagation_rekeyed,
             "knn_hubness": _q_knn_hubness_rekeyed,
             "knn_graph": _q_knn_graph_rekeyed,
             "knn_triangles": _q_knn_triangles_rekeyed,
             "ann_recall_truncated": _q_ann_recall_truncated_budgeted,
             "ann_topk_pq": _q_ann_topk_pq_budgeted,
             "ann_topk_ivf": _q_ann_topk_ivf_budgeted}


def generate(spark) -> None:
    from pyspark.sql import functions as F

    if os.path.exists(f"{SF1_DIR}/_DONE"):
        return
    os.makedirs(SF1_DIR, exist_ok=True)
    for t in DIMS:
        spark.read.parquet(f"{SF01_DIR}/{t}.parquet").write.mode(
            "overwrite").parquet(f"{SF1_DIR}/{t}.parquet")
    for t, keys in KEY_SHIFTS.items():
        base = spark.read.parquet(f"{SF01_DIR}/{t}.parquet")
        reps = []
        for i in range(REPLICAS):
            r = base
            for k in keys:
                r = r.withColumn(k, F.col(k) + F.lit(i * SHIFT))
            if t == "documents" and i > 0:
                r = r.withColumn(
                    "text", F.concat(F.col("text"), F.lit(f" zq{i}"))
                ).withColumn(
                    "n_chars", F.col("n_chars") + F.lit(len(f" zq{i}")))
            if t == "embeddings" and i > 0:
                r = r.withColumn("embedding", F.expr(
                    f"transform(embedding, (v, j) -> CAST(v +"
                    f" (({i} * (j + 1)) % 7) * 0.001 AS FLOAT))"))
            reps.append(r)
        out = reps[0]
        for r in reps[1:]:
            out = out.unionByName(r)
        out.repartition(32).write.mode("overwrite").parquet(
            f"{SF1_DIR}/{t}.parquet")
    open(f"{SF1_DIR}/_DONE", "w").write("ok")


def time_queries(spark, sf_dir: str) -> dict[str, float]:
    qs = E.queries()
    out: dict[str, float] = {}
    # ingestion builds timed separately (the bench.py convention)
    t0 = time.time()
    E._views(spark, sf_dir)
    E._geo_lattice(spark, sf_dir, "quad", 6, 6)
    out["view_build"] = round(time.time() - t0, 3)
    for name in HEADLINE:
        best = None
        for _ in range(2):  # min-of-2, the BASELINE.md variance policy
            spark.catalog.clearCache()
            gc.collect()
            t0 = time.time()
            try:
                (OVERRIDES.get(name) or qs[name])(spark, sf_dir).count()
            except Exception as exc:  # noqa: BLE001 — incl. KeyError
                # one broken/renamed headline entry must not discard
                # the whole probe after the expensive generation pass
                print(f"bench_scale {name} failed: {exc}",
                      file=sys.stderr)
                best = -1.0
                break
            t = round(time.time() - t0, 3)
            best = t if best is None else min(best, t)
        out[name] = best
    return out


def main() -> None:
    real_stdout = os.fdopen(os.dup(1), "w")
    os.dup2(2, 1)
    spark = get_spark(app_name="explora-bench-scale")
    spark.sparkContext.setLogLevel("ERROR")
    generate(spark)
    t01 = time_queries(spark, SF01_DIR)
    t1 = time_queries(spark, SF1_DIR)
    report = {
        "sf0.1": t01,
        "sf1": t1,
        "ratio": {k: (round(t1[k] / t01[k], 2)
                      if t01[k] > 0 and t1[k] >= 0 else None)
                  for k in t01},
        "replicas": REPLICAS,
        "note": ("ratio ≈ data factor (10) or below ⇒ linear or "
                 "overhead-dominated; well above ⇒ investigate"),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_sf1.json")
    with open(path, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    real_stdout.write(json.dumps(report["ratio"]) + "\n")
    real_stdout.flush()


if __name__ == "__main__":
    main()
