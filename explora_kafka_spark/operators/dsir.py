"""DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling").

The published data-selection recipe for pretraining corpora: featurize
every document as a bag of HASHED n-grams (unigrams + bigrams hashed
into B buckets), fit two bucket-multinomial language models — p̂ on a
small TARGET corpus (the domain you want more of) and q̂ on the RAW
corpus — and score each raw document by its importance log-ratio
log w(x) = Σ_b c_x[b]·(log p̂[b] − log q̂[b]). High-scoring documents
look like the target domain; resampling by w is the paper's selection
step (here: the score itself, so any downstream sampler — top-k,
curriculum_select-style quotas, weighted sampling — can consume it).

Spark-first shape: the corpus is featurized with ONE gram explode
(unigrams and bigrams in the same pass); the two bucket LMs are
B-row aggregates (map-side combined, B ≈ 10⁴ in the paper, 256 here);
the per-bucket log-ratio λ[b] is computed once on the B-row table and
broadcast; document scoring is gram → bucket → broadcast-join λ →
per-doc BIGINT sum. The only float op is one log2 per BUCKET (not per
gram), scaled to integer µbits — the unigram_bits/bigram_bits µbit
discipline (operators/text.py), so the per-doc sums are exact BIGINT
and partition-order independent; the DuckDB oracle mirrors the hash
(60-bit md5 prefix, operators/contamination.py), the tokenizer, the
smoothing, and the µbit rounding expression for expression.

Reference parity: no counterpart — engine-extension surface (the
data-selection tier of the LLM-pipeline family, alongside
quality_rules/curriculum_select/epoch_upsample).

100 TB design: the selection path (`dsir_select`) runs ONE
corpus-token-sized pass (the gram explode feeding a map-side-combined
per-(doc, bucket) count aggregation, ≤ B rows per doc on the wire); the
LM fit and the scoring both fold from that checkpointed count table.
The bare `dsir_weights` builder keeps two LAZY passes instead so
column-pruning consumers pay only for what they read (its docstring
has the measured trade-off). Every join is either broadcast-B-rows or
the one-row totals attach ONTO the B-row λ table (the unigram_bits
constant-attach allowance — never onto the corpus).
The target corpus is typically ≪ raw (Wikipedia vs a web crawl); its
LM fit prunes to the target partition via the pushed-down predicate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .text import norm_col, norm_sql

#: unigrams + bigrams of the whitespace-normalized token stream, one
#: array per document (empty-token guard for blank documents).
_GRAMS = (
    "filter(concat(_t, zip_with(slice(_t, 1, size(_t) - 1),"
    " slice(_t, 2, size(_t) - 1), (a, b) -> concat(a, ' ', b))),"
    " g -> g != '')"
)


def _bucket_col(gram: Column, n_buckets: int) -> Column:
    """Hash bucket: the house 60-bit md5-prefix bigint, mod B (the hash
    is non-negative, so % is already the positive residue)."""
    return (F.conv(F.substring(F.md5(gram), 1, 15), 16, 10)
            .cast("bigint") % n_buckets)


def _doc_grams(docs: DataFrame, key: str,
               extra: dict[str, Column] | None = None) -> DataFrame:
    """(key, *extra, gram): one row per gram OCCURRENCE (counts matter —
    the score is a sum over occurrences, not distinct grams). `extra`
    maps output names to Column expressions that ride the explode (so
    callers never re-inline the gram recipe)."""
    extra = extra or {}
    named = [c.alias(n) for n, c in extra.items()]
    return (
        docs.select(key, *named, F.split(norm_col("text"), " ").alias("_t"))
        .select(key, *extra.keys(), F.explode(F.expr(_GRAMS)).alias("gram"))
    )


def dsir_weights(
    docs: DataFrame,
    target_lang: str = "en",
    n_buckets: int = 256,
    key: str = "doc_id",
) -> DataFrame:
    """Per-document DSIR importance log-ratio against the `target_lang`
    slice of the same corpus as the target LM (the self-contained
    stand-in for the paper's external target corpus — the operator is
    agnostic to how the target rows are designated).

    Output: (key, n_grams, log_ratio_mu), key-ascending —
    `log_ratio_mu` is Σ grams λ[bucket] in integer µbits (positive ⇒
    target-like), NULL for gram-less documents.

    Two LAZY corpus passes (the count pass and the score pass — no
    materialization barrier anywhere): a consumer that prunes the
    score columns (e.g. a bare count of the key-complete output — the
    right side of the final left join is key-unique, so Spark
    eliminates the join outright) pays nothing for the scoring
    subtree. `dsir_select` consumes every column and therefore uses
    the one-pass checkpointed twin `_weights_one_pass` instead; both
    forms produce bit-identical rows (round 14 — measured here:
    forcing the one-pass materialization into THIS builder regressed
    the count-pruned consumers 0.35 s → 1.3-2.0 s at sf0.1)."""
    grams = _doc_grams(docs, key)
    bucketed = grams.select(key,
                            _bucket_col(F.col("gram"), n_buckets)
                            .alias("b"))
    both_cnt = (
        _doc_grams(docs, key,
                   extra={"_is_t": F.col("lang") == target_lang})
        .select(_bucket_col(F.col("gram"), n_buckets).alias("b"), "_is_t")
        .groupBy("b")
        .agg(F.count("*").alias("cr"),
             F.sum(F.col("_is_t").cast("long")).alias("ct"))
    )
    lam = _lambda_table(docs, both_cnt, n_buckets)
    scored = (
        bucketed.join(F.broadcast(lam), "b")
        .groupBy(key)
        .agg(F.count("*").alias("n_grams"),
             F.sum("lam").alias("log_ratio_mu"))
    )
    return (
        docs.select(key).join(scored, key, "left")
        .select(key,
                F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
                F.col("log_ratio_mu"))
        .orderBy(key)
    )


def _lambda_table(docs: DataFrame, both_cnt: DataFrame,
                  n_buckets: int) -> DataFrame:
    """(b, lam): the broadcast B-row log-ratio table from a
    (b, cr, ct) bucket-count aggregate — the shared tail of both
    weight builders (λ[b] = log2 p̂[b] − log2 q̂[b] in integer µbits,
    add-one smoothing over the B-bucket spine)."""
    spine = docs.sparkSession.range(n_buckets).select(
        F.col("id").alias("b"))
    counts = (
        spine.join(F.broadcast(both_cnt), "b", "left")
        .select("b",
                F.coalesce("cr", F.lit(0)).alias("cr"),
                F.coalesce("ct", F.lit(0)).alias("ct"))
    )
    totals = counts.agg(F.sum("cr").alias("Tr"), F.sum("ct").alias("Tt"))
    return (
        counts.join(F.broadcast(totals))
        .select(
            "b",
            F.floor(
                (F.log2((F.col("ct") + 1).cast("double")
                        / (F.col("Tt") + n_buckets).cast("double"))
                 - F.log2((F.col("cr") + 1).cast("double")
                          / (F.col("Tr") + n_buckets).cast("double")))
                * 1e6 + F.lit(0.5)
            ).cast("bigint").alias("lam"),
        )
    )


def _weights_one_pass(
    docs: DataFrame,
    target_lang: str = "en",
    n_buckets: int = 256,
    key: str = "doc_id",
) -> DataFrame:
    """One-corpus-pass twin of `dsir_weights` for consumers that read
    every output column (round 14, guide §2.4): the grams are exploded
    ONCE into a per-(doc, bucket) count table (the groupBy
    partial-aggregates map-side, so the shuffle ships ≤ B rows per doc
    per task, never gram occurrences), localCheckpointed, and BOTH the
    bucket LMs (`cr`/`ct` — sums of the per-doc counts) and the
    per-doc scores (Σ_b c·λ[b]) fold from it. Integer counts, so every
    value is bit-identical to `dsir_weights`; kept separate because
    the eager checkpoint would force the full scoring work onto
    consumers whose plans prune it (see `dsir_weights`)."""
    per_doc = (
        _doc_grams(docs, key,
                   extra={"_is_t": F.col("lang") == target_lang})
        .select(key, "_is_t",
                _bucket_col(F.col("gram"), n_buckets).alias("b"))
        .groupBy(key, "_is_t", "b")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=True)
    )
    both_cnt = (
        per_doc.groupBy("b")
        .agg(F.sum("c").alias("cr"),
             F.sum(F.when(F.col("_is_t"), F.col("c"))
                   .otherwise(F.lit(0))).alias("ct"))
    )
    lam = _lambda_table(docs, both_cnt, n_buckets)
    scored = (
        per_doc.join(F.broadcast(lam), "b")
        .groupBy(key)
        .agg(F.sum("c").alias("n_grams"),
             F.sum(F.col("c") * F.col("lam")).alias("log_ratio_mu"))
    )
    return (
        docs.select(key).join(scored, key, "left")
        .select(key,
                F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
                F.col("log_ratio_mu"))
        .orderBy(key)
    )


def dsir_select(
    docs: DataFrame,
    top: int = 100,
    target_lang: str = "en",
    n_buckets: int = 256,
    key: str = "doc_id",
) -> DataFrame:
    """The DSIR selection step: the `top` raw documents most like the
    target distribution by importance log-ratio (deterministic
    variant of the paper's Gumbel-noised resampling — ties break on
    the smaller key, gram-less documents never selected). Output
    (key, log_ratio_mu, rank), rank-ascending.

    100 TB: `_weights_one_pass`'s single gram pass (this consumer
    reads every weight column, so the checkpointed one-pass form wins
    — see the two builders' docstrings) plus one global top-`top` —
    Spark executes orderBy+limit as per-partition TakeOrdered then a
    `top`-sized merge, never a full sort materialization."""
    w = _weights_one_pass(docs, target_lang, n_buckets, key)
    ranked = (
        w.filter(F.col("log_ratio_mu").isNotNull())
        .orderBy(F.col("log_ratio_mu").desc(), F.col(key).asc())
        .limit(top)
    )
    win = Window.orderBy(F.col("log_ratio_mu").desc(), F.col(key).asc())
    return ranked.select(
        key, "log_ratio_mu",
        F.row_number().over(win).alias("rank"),
    ).orderBy("rank")


def dsir_select_sql(
    table: str = "documents",
    top: int = 100,
    target_lang: str = "en",
    n_buckets: int = 256,
    key: str = "doc_id",
) -> str:
    """DuckDB mirror of `dsir_select`."""
    inner = dsir_weights_sql(table, target_lang, n_buckets, key)
    return f"""
        SELECT {key}, log_ratio_mu,
               row_number() OVER (ORDER BY log_ratio_mu DESC,
                                  {key} ASC) AS rank
        FROM ({inner})
        WHERE log_ratio_mu IS NOT NULL
        ORDER BY log_ratio_mu DESC, {key} ASC
        LIMIT {top}
    """


def dsir_weights_sql(
    table: str = "documents",
    target_lang: str = "en",
    n_buckets: int = 256,
    key: str = "doc_id",
) -> str:
    """DuckDB mirror (same normalization, gram stream, md5 bucket hash,
    add-one smoothing, and µbit rounding)."""
    norm = norm_sql("text")
    return f"""
        WITH t AS (
            SELECT {key}, lang, string_split({norm}, ' ') AS tk
            FROM {table}
        ),
        g AS (
            SELECT {key}, lang, u.gram
            FROM t, unnest(list_filter(
                list_concat(tk,
                    [tk[i] || ' ' || tk[i + 1]
                     FOR i IN range(1, len(tk))]),
                x -> x != '')) AS u(gram)
        ),
        bk AS (
            SELECT {key}, lang,
                   CAST(concat('0x', substr(md5(gram), 1, 15)) AS BIGINT)
                       % {n_buckets} AS b
            FROM g
        ),
        counts AS (
            SELECT s.b,
                   coalesce(r.cr, 0) AS cr,
                   coalesce(tc.ct, 0) AS ct
            FROM (SELECT unnest(range({n_buckets})) AS b) s
            LEFT JOIN (SELECT b, count(*) AS cr FROM bk GROUP BY b) r
                   ON s.b = r.b
            LEFT JOIN (SELECT b, count(*) AS ct FROM bk
                       WHERE lang = '{target_lang}' GROUP BY b) tc
                   ON s.b = tc.b
        ),
        tot AS (SELECT sum(cr) AS Tr, sum(ct) AS Tt FROM counts),
        lam AS (
            SELECT b,
                   CAST(floor(
                       (log2(CAST(ct + 1 AS DOUBLE)
                             / CAST(Tt + {n_buckets} AS DOUBLE))
                        - log2(CAST(cr + 1 AS DOUBLE)
                               / CAST(Tr + {n_buckets} AS DOUBLE)))
                       * 1e6 + 0.5) AS BIGINT) AS lam
            FROM counts, tot
        ),
        scored AS (
            SELECT bk.{key}, count(*) AS n_grams,
                   sum(lam.lam) AS log_ratio_mu
            FROM bk JOIN lam ON bk.b = lam.b
            GROUP BY bk.{key}
        )
        SELECT d.{key},
               coalesce(s.n_grams, 0) AS n_grams,
               CAST(s.log_ratio_mu AS BIGINT) AS log_ratio_mu
        FROM {table} d LEFT JOIN scored s ON d.{key} = s.{key}
        ORDER BY 1
    """
