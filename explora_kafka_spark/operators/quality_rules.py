"""Gopher/MassiveText-style document quality rules.

Two operator families over a ``documents(doc_id, text, ...)`` table:

* :func:`ngram_repetition` — the MassiveText *repetition* signals
  (Rae et al. 2021, "Scaling Language Models", table A1): per document,
  the fraction of characters covered by the most frequent word n-gram
  (n = 2, 3, 4) and by all duplicated word n-grams (n = 5, 10).
  Boilerplate, SEO spam, and templated pages score high; clean prose
  scores near zero.
* :func:`gopher_rules` — the word-level MassiveText quality-rule flags
  (word-count bounds, mean-word-length band, symbol-to-word ratio,
  alphabetic-word fraction, stopword floor) plus the combined verdict.

Both are pure Column expressions with exact DuckDB SQL mirrors (the
``operators/text.py`` design rule): no Python UDFs, whole-stage codegen,
and driver-oracle checkable bit-for-bit.

Scale notes (100 TB): ``gopher_rules`` is a shuffle-free projection.
``ngram_repetition`` explodes each document into its word n-grams once
(all requested n in a single pass), then needs exactly two partial-agg
shuffles — (doc, n, gram) counting and the per-doc conditional rollup.
The exploded volume is ~``len(ns)`` × corpus tokens, linear and evenly
keyed; no joins, no windows.

The reference system has no text operators — this extends the engine
for LLM training-data pipelines (task brief), like the rest of the
text/dedup family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import STOPWORDS, norm_col, norm_sql, tokens_col, tokens_sql

#: n-gram sizes for the "top n-gram char fraction" signal (Gopher uses
#: 2, 3, 4 with thresholds 0.20 / 0.18 / 0.16).
TOP_NS: tuple[int, ...] = (2, 3, 4)

#: n-gram sizes for the "duplicate n-gram char fraction" signal (Gopher
#: uses 5..10; the 5 / 10 endpoints bound the band and keep the output
#: width sane).
DUP_NS: tuple[int, ...] = (5, 10)

# gopher_rules thresholds (MassiveText appendix values; the word-count
# floor matches the paper's 50).
MIN_WORDS = 50
MAX_WORDS = 100_000
MIN_MEAN_WORD_LEN = 3.0
MAX_MEAN_WORD_LEN = 10.0
MAX_SYMBOL_RATIO = 0.1
MIN_ALPHA_WORD_FRAC = 0.8
MIN_STOPWORDS = 2


# ---------------------------------------------------------------------------
# n-gram repetition signals
# ---------------------------------------------------------------------------


def ngram_repetition(
    docs: DataFrame,
    top_ns: tuple[int, ...] = TOP_NS,
    dup_ns: tuple[int, ...] = DUP_NS,
) -> DataFrame:
    """Per-document n-gram repetition fractions.

    For each ``n`` in ``top_ns``: ``top_{n}gram_frac`` = characters of
    the single most frequent word n-gram (occurrences × gram length,
    grams joined by single spaces) / normalized doc length. For each
    ``n`` in ``dup_ns``: ``dup_{n}gram_frac`` = total characters of all
    n-grams occurring ≥ 2 times, capped at 1.0 (overlapping occurrences
    are each counted — this upper-bounds Gopher's union-of-spans
    definition deterministically; the cap keeps it a fraction).

    Documents with fewer than ``n`` tokens score 0 for that ``n``.
    N-grams slide by one token (standard overlapping windows).

    Output (ordered by doc_id): doc_id, then one round-6 fraction column
    per requested n.

    Plan shape (optimization round 14, guide §2.3/§2.4): the former
    implementation EXPLODED every n-gram of every document (one row per
    token per n), shuffled all of them for a (doc, n, gram) count,
    shuffled the counts again for the per-doc rollup, and joined the
    rollup back to the corpus — 2 full gram-table exchanges + 1 join
    whose shuffled bytes grow with total corpus tokens × |ns|. The gram
    counting is a PER-DOCUMENT statistic, so it now computes entirely
    within the row: per n, sort the gram array and fold it with one
    ``aggregate`` run-length pass (equal grams are adjacent after the
    sort; a run of length c of gram g contributes c·length(g) chars —
    exactly the old ``cnt * length(gram)``). Zero exchanges, zero
    joins; at 100 TB nothing leaves the scan task. Integer char counts
    are identical, so every rounded fraction (and the DuckDB oracle)
    is unchanged bit-for-bit.
    """
    all_ns = sorted(set(top_ns) | set(dup_ns))
    # The explode of a 1-element array is a Generate node — a hard
    # projection-collapse barrier. Without it, CollapseProject inlines
    # the tokenizer split into every per-gram lambda below and codegen
    # re-splits the whole document for each gram index: O(tokens²)/doc
    # (25 s at sf0.1). Exactly one row out per doc — the wrapping array
    # always has one element.
    tokenized = docs.select(
        "doc_id",
        F.length(norm_col("text")).alias("nch"),
        F.explode(F.array(tokens_col("text"))).alias("toks"),
    )

    def _gram_sql(n: int) -> str:
        return (
            f"CASE WHEN size(toks) >= {n} THEN "
            f"transform(sequence(1, size(toks) - {n - 1}), "
            f"i -> array_join(slice(toks, i, {n}), ' ')) "
            f"ELSE CAST(array() AS ARRAY<STRING>) END"
        )

    def _runlen_sql(n: int) -> str:
        """(top, dup) char totals via one run-length fold over the
        sorted gram array: top = chars of the most frequent gram, dup =
        total chars of grams occurring >= 2 times."""
        close_top = "greatest(acc.top, acc.run * length(acc.prev))"
        close_dup = ("acc.dup + IF(acc.run >= 2, "
                     "acc.run * length(acc.prev), CAST(0 AS BIGINT))")
        return f"""aggregate(
            array_sort({_gram_sql(n)}),
            named_struct('prev', CAST(NULL AS STRING),
                         'run', CAST(0 AS BIGINT),
                         'top', CAST(0 AS BIGINT),
                         'dup', CAST(0 AS BIGINT)),
            (acc, x) -> CASE
                WHEN acc.prev IS NULL THEN named_struct(
                    'prev', x, 'run', CAST(1 AS BIGINT),
                    'top', acc.top, 'dup', acc.dup)
                WHEN x = acc.prev THEN named_struct(
                    'prev', x, 'run', acc.run + CAST(1 AS BIGINT),
                    'top', acc.top, 'dup', acc.dup)
                ELSE named_struct(
                    'prev', x, 'run', CAST(1 AS BIGINT),
                    'top', {close_top}, 'dup', {close_dup})
            END,
            acc -> named_struct(
                'top', CASE WHEN acc.prev IS NULL
                            THEN acc.top ELSE {close_top} END,
                'dup', CASE WHEN acc.prev IS NULL
                            THEN acc.dup ELSE {close_dup} END)
        )"""

    # second Generate barrier: the stats structs must be materialized
    # attributes before the final projection references .top/.dup —
    # otherwise CollapseProject re-inlines (and re-evaluates) each n's
    # sort+fold once per field reference
    stats = tokenized.select(
        "doc_id",
        "nch",
        F.explode(F.array(F.struct(*[
            F.expr(_runlen_sql(n)).alias(f"_st{n}") for n in all_ns
        ]))).alias("_st"),
    )
    cols = [F.col("doc_id")]
    for n in sorted(top_ns):
        cols.append(
            F.round(
                F.col(f"_st._st{n}.top") / F.greatest(F.col("nch"), F.lit(1)),
                6,
            ).alias(f"top_{n}gram_frac")
        )
    for n in sorted(dup_ns):
        cols.append(
            F.round(
                F.least(
                    F.col(f"_st._st{n}.dup")
                    / F.greatest(F.col("nch"), F.lit(1)),
                    F.lit(1.0),
                ),
                6,
            ).alias(f"dup_{n}gram_frac")
        )
    return stats.select(*cols).orderBy("doc_id")


def ngram_repetition_sql(
    table: str = "documents",
    top_ns: tuple[int, ...] = TOP_NS,
    dup_ns: tuple[int, ...] = DUP_NS,
) -> str:
    """DuckDB mirror of :func:`ngram_repetition` (identical integer char
    counts; DuckDB list slice ``l[i:j]`` is 1-based inclusive ≙ Spark
    ``slice(l, i, n)``)."""
    toks = tokens_sql("text")
    nch = f"len({norm_sql('text')})"
    all_ns = sorted(set(top_ns) | set(dup_ns))
    ns_list = ", ".join(str(n) for n in all_ns)
    top_cols = ",\n               ".join(
        f"round(coalesce(_top{n}, 0) / greatest(nch, 1), 6)"
        f" AS top_{n}gram_frac"
        for n in sorted(top_ns)
    )
    dup_cols = ",\n               ".join(
        f"round(least(coalesce(_dup{n}, 0) / greatest(nch, 1), 1.0), 6)"
        f" AS dup_{n}gram_frac"
        for n in sorted(dup_ns)
    )
    top_aggs = ",\n                   ".join(
        f"max(CASE WHEN n = {n} THEN chars END) AS _top{n}"
        for n in sorted(top_ns)
    )
    dup_aggs = ",\n                   ".join(
        f"sum(CASE WHEN n = {n} AND cnt >= 2 THEN chars END) AS _dup{n}"
        for n in sorted(dup_ns)
    )
    return f"""
        WITH base AS (
            SELECT doc_id, {nch} AS nch, {toks} AS toks FROM {table}
        ),
        grams AS (
            SELECT doc_id, nch, n,
                   array_to_string(toks[i:i + n - 1], ' ') AS gram
            FROM base,
                 unnest([{ns_list}]) AS nn(n),
                 unnest(generate_series(1, len(toks) - n + 1)) AS ii(i)
            WHERE len(toks) >= n
        ),
        counts AS (
            SELECT doc_id, nch, n, gram,
                   count(*) AS cnt, count(*) * len(gram) AS chars
            FROM grams GROUP BY doc_id, nch, n, gram
        ),
        per_doc AS (
            SELECT doc_id, nch,
                   {top_aggs},
                   {dup_aggs}
            FROM counts GROUP BY doc_id, nch
        )
        SELECT d.doc_id,
               {top_cols},
               {dup_cols}
        FROM {table} d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
        ORDER BY d.doc_id
    """


# ---------------------------------------------------------------------------
# word-level rule flags
# ---------------------------------------------------------------------------


def _gopher_signal_cols() -> dict:
    """The MassiveText word-level signals as named composable Columns —
    the single source of truth shared by `gopher_rules` and the fused
    admission pipeline (`_verdict_base`), so their values can never
    diverge."""
    toks = tokens_col("text")
    norm = norm_col("text")
    n_words = F.size(toks)
    nch = F.length(norm)
    mean_len = F.round(
        (nch - (n_words - 1)) / F.greatest(n_words, F.lit(1)), 6
    )
    hash_chars = nch - F.length(F.regexp_replace(norm, "#", ""))
    ellipses = F.size(F.split(norm, r"\.\.\.")) - 1
    symbol_ratio = F.round(
        (hash_chars + ellipses) / F.greatest(n_words, F.lit(1)), 6
    )
    alpha_words = F.size(F.filter(toks, lambda t: t.rlike("[a-z]")))
    alpha_frac = F.round(
        alpha_words / F.greatest(n_words, F.lit(1)), 6
    )
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return {
        "n_words": n_words,
        "mean_word_len": mean_len,
        "symbol_ratio": symbol_ratio,
        "alpha_word_frac": alpha_frac,
        "n_stopwords": n_stop,
    }


def _gopher_flag_exprs() -> dict:
    """Threshold flags over the signal COLUMN NAMES (apply after the
    signals are materialized as columns) — shared like the signals."""
    ok_words = (F.col("n_words") >= MIN_WORDS) & (
        F.col("n_words") <= MAX_WORDS
    )
    ok_len = (F.col("mean_word_len") >= MIN_MEAN_WORD_LEN) & (
        F.col("mean_word_len") <= MAX_MEAN_WORD_LEN
    )
    return {
        "ok_word_count": ok_words,
        "ok_mean_word_len": ok_len,
        "ok_symbol_ratio": F.col("symbol_ratio") <= MAX_SYMBOL_RATIO,
        "ok_alpha_frac": F.col("alpha_word_frac") >= MIN_ALPHA_WORD_FRAC,
        "ok_stopwords": F.col("n_stopwords") >= MIN_STOPWORDS,
    }


def gopher_rules(docs: DataFrame) -> DataFrame:
    """Per-document MassiveText word-level quality flags.

    Signals: n_words, mean_word_len (chars excluding separating spaces /
    words), symbol_ratio ((``#`` chars + ``...`` occurrences) / words),
    alpha_word_frac (words containing ≥ 1 [a-z]), n_stopwords. Flags:
    each signal against the module thresholds, plus ``passes_gopher`` =
    AND of all. A pretraining filter keeps ``passes_gopher`` docs;
    the per-rule flags make rejections auditable.

    Shuffle-free projection — whole-stage codegen end to end.
    """
    sig = docs.select("doc_id", *[
        c.alias(n) for n, c in _gopher_signal_cols().items()])
    flags = _gopher_flag_exprs()
    ok_words, ok_len = flags["ok_word_count"], flags["ok_mean_word_len"]
    ok_sym, ok_alpha = flags["ok_symbol_ratio"], flags["ok_alpha_frac"]
    ok_stop = flags["ok_stopwords"]
    return sig.select(
        "*",
        ok_words.alias("ok_word_count"),
        ok_len.alias("ok_mean_word_len"),
        ok_sym.alias("ok_symbol_ratio"),
        ok_alpha.alias("ok_alpha_frac"),
        ok_stop.alias("ok_stopwords"),
        (ok_words & ok_len & ok_sym & ok_alpha & ok_stop).alias(
            "passes_gopher"
        ),
    ).orderBy("doc_id")


def gopher_rules_sql(table: str = "documents") -> str:
    """DuckDB mirror of :func:`gopher_rules`."""
    toks = tokens_sql("text")
    norm = norm_sql("text")
    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    return f"""
        WITH sig AS (
            SELECT doc_id,
                   len({toks}) AS n_words,
                   round((len({norm}) - (len({toks}) - 1))
                       / greatest(len({toks}), 1), 6) AS mean_word_len,
                   round((len({norm})
                           - len(replace({norm}, '#', ''))
                           + len(string_split({norm}, '...')) - 1)
                       / greatest(len({toks}), 1), 6) AS symbol_ratio,
                   round(len(list_filter({toks},
                               t -> regexp_matches(t, '[a-z]')))
                       / greatest(len({toks}), 1), 6) AS alpha_word_frac,
                   len(list_filter({toks}, t -> t IN ({stop_list})))
                       AS n_stopwords
            FROM {table}
        )
        SELECT *,
               n_words >= {MIN_WORDS} AND n_words <= {MAX_WORDS}
                   AS ok_word_count,
               mean_word_len >= {MIN_MEAN_WORD_LEN}
                   AND mean_word_len <= {MAX_MEAN_WORD_LEN}
                   AS ok_mean_word_len,
               symbol_ratio <= {MAX_SYMBOL_RATIO} AS ok_symbol_ratio,
               alpha_word_frac >= {MIN_ALPHA_WORD_FRAC} AS ok_alpha_frac,
               n_stopwords >= {MIN_STOPWORDS} AS ok_stopwords,
               (n_words >= {MIN_WORDS} AND n_words <= {MAX_WORDS})
                   AND (mean_word_len >= {MIN_MEAN_WORD_LEN}
                        AND mean_word_len <= {MAX_MEAN_WORD_LEN})
                   AND symbol_ratio <= {MAX_SYMBOL_RATIO}
                   AND alpha_word_frac >= {MIN_ALPHA_WORD_FRAC}
                   AND n_stopwords >= {MIN_STOPWORDS} AS passes_gopher
        FROM sig
        ORDER BY doc_id
    """


# ---------------------------------------------------------------------------
# composed corpus filter pipeline
# ---------------------------------------------------------------------------

#: Gopher repetition thresholds (table A1): top n-gram char fraction
#: caps for n = 2, 3, 4 and duplicate n-gram caps for n = 5, 10.
TOP_FRAC_MAX = {2: 0.20, 3: 0.18, 4: 0.16}
DUP_FRAC_MAX = {5: 0.15, 10: 0.10}

#: language the pipeline admits (the MassiveText pipeline is
#: English-only; parameterize per deployment)
PIPELINE_LANG = "en"


def _verdict_base(docs: DataFrame, with_classifier: bool = False) -> DataFrame:
    """ONE corpus scan computing every PROJECTION-stage signal of the
    admission pipeline — the digest, the language prediction, the
    Gopher word-level signals, and (optionally) the classifier
    features — behind an `explode(array(struct(...)))` Generate
    barrier so each signal evaluates exactly once per row. The old
    composition ran each stage operator standalone and equi-joined
    them on doc_id: 6 corpus scans + 5 joins for what are projections
    over the same text (at 100 TB, 6× the scan IO). The stage
    OPERATORS are untouched — this shares their signal/flag builders
    (`_gopher_signal_cols`/`_gopher_flag_exprs`, `text.pred_lang_col`),
    so the fused verdict is value-identical by construction (and
    verified by the unchanged oracles)."""
    from .text import pred_lang_col

    norm = norm_col("text")
    fields = [
        F.md5(norm).alias("digest"),
        pred_lang_col().alias("pred_lang"),
    ]
    fields += [c.alias(n) for n, c in _gopher_signal_cols().items()]
    if with_classifier:
        fields += [
            F.length(F.regexp_replace(norm, r"[a-z0-9 ]", ""))
            .cast("bigint").alias("_pu"),
            F.length(norm).cast("bigint").alias("_nc"),
        ]
    return docs.select("doc_id", *fields)


def _ok_repetition(docs: DataFrame) -> DataFrame:
    """(doc_id, ok_repetition): the one admission stage that is an
    AGGREGATE (gram explode + per-doc rollup), joined onto the fused
    projection base."""
    rep = ngram_repetition(docs)
    ok_rep = F.lit(True)
    for n, cap in sorted(TOP_FRAC_MAX.items()):
        ok_rep = ok_rep & (F.col(f"top_{n}gram_frac") <= cap)
    for n, cap in sorted(DUP_FRAC_MAX.items()):
        ok_rep = ok_rep & (F.col(f"dup_{n}gram_frac") <= cap)
    return rep.select("doc_id", ok_rep.alias("ok_repetition"))


def filter_pipeline(docs: DataFrame) -> DataFrame:
    """The composed FineWeb/RefinedWeb-style corpus admission verdict.

    Chains the full document filter stack — exact-duplicate removal
    (first doc_id per normalized digest survives), language-ID gate
    (predicted ``PIPELINE_LANG``), the Gopher word-level rules, and the
    Gopher repetition thresholds — into one auditable per-document
    verdict: ``keep`` plus ``drop_reasons`` (comma-joined failed stages
    in fixed order ``exact_dup,lang,gopher,repetition``; empty when
    kept).

    Plan shape (round 9): every projection stage computes in ONE
    corpus scan (`_verdict_base` — shared signal builders with the
    standalone stage operators), the digest window adds the
    first-occurrence flag (16-byte md5 shuffle, never text), and the
    single join brings in the repetition AGGREGATE — 2 corpus scans +
    1 doc-keyed join total, down from 6 scans + 5 joins when the
    stages were composed as standalone operators.

    Output (ordered by doc_id): doc_id, keep, drop_reasons.
    """
    from pyspark.sql.window import Window

    base = _verdict_base(docs)
    flags = _gopher_flag_exprs()
    passes_gopher = (
        flags["ok_word_count"] & flags["ok_mean_word_len"]
        & flags["ok_symbol_ratio"] & flags["ok_alpha_frac"]
        & flags["ok_stopwords"]
    )
    w = Window.partitionBy("digest")
    canon = base.select(
        "doc_id",
        (F.col("doc_id") == F.min("doc_id").over(w)).alias("ok_exact"),
        (F.col("pred_lang") == PIPELINE_LANG).alias("ok_lang"),
        passes_gopher.alias("passes_gopher"),
    )
    joined = canon.join(_ok_repetition(docs), "doc_id")
    keep = (
        F.col("ok_exact") & F.col("ok_lang") & F.col("passes_gopher")
        & F.col("ok_repetition")
    )
    reasons = F.concat_ws(
        ",",
        F.when(~F.col("ok_exact"), F.lit("exact_dup")),
        F.when(~F.col("ok_lang"), F.lit("lang")),
        F.when(~F.col("passes_gopher"), F.lit("gopher")),
        F.when(~F.col("ok_repetition"), F.lit("repetition")),
    )
    return joined.select(
        "doc_id", keep.alias("keep"), reasons.alias("drop_reasons")
    ).orderBy("doc_id")


def filter_pipeline_sql(table: str = "documents") -> str:
    """DuckDB mirror of :func:`filter_pipeline` — composes the stage
    mirrors as CTEs (DuckDB ``concat_ws`` skips NULLs like Spark)."""
    from .text import lang_id_sql

    rep_checks = " AND ".join(
        [f"top_{n}gram_frac <= {c}" for n, c in sorted(TOP_FRAC_MAX.items())]
        + [f"dup_{n}gram_frac <= {c}" for n, c in sorted(DUP_FRAC_MAX.items())]
    )
    return f"""
        WITH gop AS ({gopher_rules_sql(table)}),
        rep AS ({ngram_repetition_sql(table)}),
        lng AS ({lang_id_sql(table)}),
        canon AS (
            SELECT doc_id,
                   doc_id = min(doc_id) OVER (
                       PARTITION BY md5({norm_sql('text')})
                   ) AS ok_exact
            FROM {table}
        )
        SELECT c.doc_id,
               c.ok_exact AND lng.pred_lang = '{PIPELINE_LANG}'
                   AND gop.passes_gopher AND ({rep_checks}) AS keep,
               concat_ws(',',
                   CASE WHEN NOT c.ok_exact THEN 'exact_dup' END,
                   CASE WHEN NOT lng.pred_lang = '{PIPELINE_LANG}'
                        THEN 'lang' END,
                   CASE WHEN NOT gop.passes_gopher THEN 'gopher' END,
                   CASE WHEN NOT ({rep_checks}) THEN 'repetition' END
               ) AS drop_reasons
        FROM canon c
        JOIN lng ON lng.doc_id = c.doc_id
        JOIN gop ON gop.doc_id = c.doc_id
        JOIN rep ON rep.doc_id = c.doc_id
        ORDER BY c.doc_id
    """


# ---------------------------------------------------------------------------
# model-based quality scoring (the classifier tier)
# ---------------------------------------------------------------------------

#: fixture weights for the linear quality model, in exact integer units
#: (see quality_logit). Shaped like a trained CCNet/fastText-style
#: quality classifier: stopword density and length are positive
#: evidence, punctuation density and over-long words negative.
LOGIT_W0 = 8_500_000           # intercept, µ-logits
LOGIT_W_STOP = 6               # per stopword-ppm
LOGIT_W_PUNCT = -8             # per punct-ppm
LOGIT_W_LEN = 3_000            # per token, capped at LOGIT_LEN_CAP
LOGIT_W_AWL = -2               # per avg-token-length-ppm
LOGIT_LEN_CAP = 500


def quality_logit(docs: DataFrame) -> DataFrame:
    """Model-based quality scoring — the CLASSIFIER tier of the filter
    stack (the fastText model in CCNet (Wenzek et al. 2020) / the
    quality classifier in GPT-3 and FineWeb), on top of the rule tiers
    (`gopher_rules`) and the statistical tiers (`unigram_bits`).

    Scores each document with a LINEAR model in log-odds space over
    exact integer features — stopword density (ppm), punctuation
    density (ppm), capped token count, average token length (ppm) —
    and keeps documents with non-negative log-odds. The weights here
    are a deterministic fixture standing in for trained classifier
    weights (no training stack in this sandbox — the multimodal
    deterministic-fake precedent); the engine-side shape is the real
    deliverable and is exactly what a trained model needs: a
    shuffle-free whole-stage-codegen projection, one pass, no UDF.

    Exactness: every feature is a BIGINT via integer floor division
    (`div`), the score is a BIGINT dot product — no float op, so the
    DuckDB mirror matches bit-for-bit and thresholding is
    engine-portable. Output: (doc_id, logit_mu, keep), doc_id-asc.

    100 TB: a projection — no shuffle, no join; composes into
    `filter_pipeline` as another stage plan the same way the Gopher
    word rules do."""
    toks = tokens_col("text")
    norm = norm_col("text")
    n_tokens = F.size(toks).cast("bigint")
    n_chars = F.length(norm).cast("bigint")
    punct = F.length(F.regexp_replace(norm, r"[a-z0-9 ]", "")).cast("bigint")
    stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).cast("bigint")
    d = docs.select(
        "doc_id",
        n_tokens.alias("_nt"), n_chars.alias("_nc"),
        punct.alias("_pu"), stop.alias("_st"),
    )
    logit = F.expr(f"""
        {LOGIT_W0}
        + {LOGIT_W_STOP} * ((1000000 * _st) div GREATEST(_nt, 1))
        + {LOGIT_W_PUNCT} * ((1000000 * _pu) div GREATEST(_nc, 1))
        + {LOGIT_W_LEN} * LEAST(_nt, {LOGIT_LEN_CAP})
        + {LOGIT_W_AWL} * ((1000000 * (_nc - (_nt - 1))) div GREATEST(_nt, 1))
    """).cast("bigint")
    return (
        d.select("doc_id", logit.alias("logit_mu"))
        .withColumn("keep", F.col("logit_mu") >= 0)
        .orderBy("doc_id")
    )


def quality_logit_sql(table: str = "documents") -> str:
    """DuckDB mirror of `quality_logit` (`//` = the same integer floor
    division as Spark's `div` on non-negative BIGINTs)."""
    toks = tokens_sql("text")
    norm = norm_sql("text")
    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    return f"""
        WITH f AS (
            SELECT doc_id,
                   CAST(len({toks}) AS BIGINT) AS nt,
                   CAST(len({norm}) AS BIGINT) AS nc,
                   CAST(len(regexp_replace({norm}, '[a-z0-9 ]', '', 'g'))
                        AS BIGINT) AS pu,
                   CAST(len(list_filter({toks}, t -> t IN ({stop_list})))
                        AS BIGINT) AS st
            FROM {table}
        )
        SELECT doc_id,
               CAST({LOGIT_W0}
                    + {LOGIT_W_STOP} * ((1000000 * st) // greatest(nt, 1))
                    + {LOGIT_W_PUNCT} * ((1000000 * pu) // greatest(nc, 1))
                    + {LOGIT_W_LEN} * least(nt, {LOGIT_LEN_CAP})
                    + {LOGIT_W_AWL}
                      * ((1000000 * (nc - (nt - 1))) // greatest(nt, 1))
                    AS BIGINT) AS logit_mu,
               ({LOGIT_W0}
                    + {LOGIT_W_STOP} * ((1000000 * st) // greatest(nt, 1))
                    + {LOGIT_W_PUNCT} * ((1000000 * pu) // greatest(nc, 1))
                    + {LOGIT_W_LEN} * least(nt, {LOGIT_LEN_CAP})
                    + {LOGIT_W_AWL}
                      * ((1000000 * (nc - (nt - 1))) // greatest(nt, 1))
                ) >= 0 AS keep
        FROM f ORDER BY doc_id
    """


# ---------------------------------------------------------------------------
# model-scored EDUCATIONAL tier (the FineWeb-edu second classifier)
# ---------------------------------------------------------------------------

#: fixture weights for the educational-value model (VERDICT r10 #5c —
#: FineWeb-edu, Penedo et al. 2024: a SECOND scorer over the same
#: features ranking "educational value" rather than generic web
#: quality, emitting the paper's integer 0–5 tier). Deterministic
#: fixture weights standing in for the Llama-annotated classifier (the
#: quality_logit precedent): vocabulary richness and long words are
#: positive evidence, filler stopwords negative, digits mildly
#: positive (data/figures).
EDU_W0 = -19_000_000           # intercept, µ-logits
EDU_W_UNIQ = 9                 # per unique-token-ratio ppm
EDU_W_AWL = 4                  # per avg-token-length ppm
EDU_W_DIGIT = 2                # per digit-density ppm
EDU_W_STOP = -5                # per stopword-ppm
EDU_TIER_STEP = 1_500_000      # µ-logits per tier rung
EDU_TIERS = 5                  # tiers 0..5, the FineWeb-edu scale


def edu_tier(docs: DataFrame) -> DataFrame:
    """FineWeb-edu-style educational-quality tier: a second linear
    model in exact integer µ-logits over shuffle-free projection
    features — unique-token ratio (ppm), average token length (ppm),
    digit density (ppm), stopword density (ppm) — bucketed to the
    integer 0–5 tier FineWeb-edu trains its classifier to emit
    (tier ≥ 3 is the paper's "keep for edu corpus" cut).

    Exactness: every feature is BIGINT floor division, the score a
    BIGINT dot product, the tier a clamped BIGINT floor division — no
    float op anywhere, bit-identical in DuckDB. Output: (doc_id,
    edu_mu, tier), doc_id-ascending.

    100 TB: one whole-stage-codegen projection — no shuffle, no join,
    no UDF; stacks on `quality_logit` as an independent second scorer
    (disagreement audited by `edu_web_disagreement`)."""
    toks = tokens_col("text")
    norm = norm_col("text")
    n_tokens = F.size(toks).cast("bigint")
    n_chars = F.length(norm).cast("bigint")
    uniq = F.size(F.array_distinct(toks)).cast("bigint")
    digits = F.length(F.regexp_replace(norm, r"[^0-9]", "")).cast("bigint")
    stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).cast("bigint")
    d = docs.select(
        "doc_id",
        n_tokens.alias("_nt"), n_chars.alias("_nc"),
        uniq.alias("_uq"), digits.alias("_dg"), stop.alias("_st"),
    )
    mu = F.expr(f"""
        {EDU_W0}
        + {EDU_W_UNIQ} * ((1000000 * _uq) div GREATEST(_nt, 1))
        + {EDU_W_AWL} * ((1000000 * (_nc - (_nt - 1))) div GREATEST(_nt, 1))
        + {EDU_W_DIGIT} * ((1000000 * _dg) div GREATEST(_nc, 1))
        + {EDU_W_STOP} * ((1000000 * _st) div GREATEST(_nt, 1))
    """).cast("bigint")
    tier = F.expr(
        f"LEAST({EDU_TIERS}, GREATEST(0, edu_mu div {EDU_TIER_STEP}))"
    ).cast("int")
    return (
        d.select("doc_id", mu.alias("edu_mu"))
        .withColumn("tier", tier)
        .orderBy("doc_id")
    )


def edu_tier_sql(table: str = "documents") -> str:
    """DuckDB mirror of `edu_tier` (operands non-negative where `//`
    runs, so DuckDB floor ≡ Spark `div` truncation — except edu_mu DIV
    step, where edu_mu can be negative: both sides clamp AFTER the
    division and any negative quotient clamps to 0 either way, so the
    floor-vs-truncate divergence is absorbed by GREATEST(0, ·))."""
    toks = tokens_sql("text")
    norm = norm_sql("text")
    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    mu = f"""({EDU_W0}
        + {EDU_W_UNIQ} * ((1000000 * uq) // greatest(nt, 1))
        + {EDU_W_AWL} * ((1000000 * (nc - (nt - 1))) // greatest(nt, 1))
        + {EDU_W_DIGIT} * ((1000000 * dg) // greatest(nc, 1))
        + {EDU_W_STOP} * ((1000000 * st) // greatest(nt, 1)))"""
    return f"""
        WITH f AS (
            SELECT doc_id,
                   CAST(len({toks}) AS BIGINT) AS nt,
                   CAST(len({norm}) AS BIGINT) AS nc,
                   CAST(len(list_distinct({toks})) AS BIGINT) AS uq,
                   CAST(len(regexp_replace({norm}, '[^0-9]', '', 'g'))
                        AS BIGINT) AS dg,
                   CAST(len(list_filter({toks}, t -> t IN ({stop_list})))
                        AS BIGINT) AS st
            FROM {table}
        )
        SELECT doc_id, CAST({mu} AS BIGINT) AS edu_mu,
               CAST(least({EDU_TIERS},
                    greatest(0, {mu} // {EDU_TIER_STEP})) AS INTEGER)
                   AS tier
        FROM f ORDER BY doc_id
    """


def edu_web_disagreement(docs: DataFrame, keep_tier: int = 3) -> DataFrame:
    """Per-source disagreement audit between the two classifier tiers
    (the FineWeb-edu paper's observation that edu-ranking and generic
    web-quality ranking select DIFFERENT documents): joins
    `quality_logit` (web keep) with `edu_tier` (edu keep = tier ≥
    `keep_tier`) and profiles, per source: n_docs, n_web_keep,
    n_edu_keep, n_web_only, n_edu_only, source-ascending.

    100 TB: both scorers are shuffle-free projections over the same
    corpus scan; the audit adds one doc-keyed join of two
    statistic-shaped score tables + one S-key aggregate."""
    web = quality_logit(docs).select("doc_id", "keep")
    edu = edu_tier(docs).select(
        "doc_id", (F.col("tier") >= keep_tier).alias("edu_keep"))
    j = (
        docs.select("doc_id", "source")
        .join(web, "doc_id")
        .join(edu, "doc_id")
    )
    return (
        j.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.count(F.when(F.col("keep"), True)).alias("n_web_keep"),
            F.count(F.when(F.col("edu_keep"), True)).alias("n_edu_keep"),
            F.count(F.when(F.col("keep") & ~F.col("edu_keep"), True))
            .alias("n_web_only"),
            F.count(F.when(F.col("edu_keep") & ~F.col("keep"), True))
            .alias("n_edu_only"),
        )
        .orderBy("source")
    )


def edu_web_disagreement_sql(table: str = "documents",
                             keep_tier: int = 3) -> str:
    """DuckDB mirror of `edu_web_disagreement`."""
    return f"""
        WITH web AS ({quality_logit_sql(table)}),
        edu AS ({edu_tier_sql(table)})
        SELECT d.source,
               count(*) AS n_docs,
               count(CASE WHEN web.keep THEN 1 END) AS n_web_keep,
               count(CASE WHEN edu.tier >= {keep_tier} THEN 1 END)
                   AS n_edu_keep,
               count(CASE WHEN web.keep AND edu.tier < {keep_tier}
                          THEN 1 END) AS n_web_only,
               count(CASE WHEN edu.tier >= {keep_tier} AND NOT web.keep
                          THEN 1 END) AS n_edu_only
        FROM {table} d
        JOIN web ON web.doc_id = d.doc_id
        JOIN edu ON edu.doc_id = d.doc_id
        GROUP BY d.source
        ORDER BY d.source
    """


def filter_pipeline_full(docs: DataFrame) -> DataFrame:
    """`filter_pipeline` with the CLASSIFIER tier stacked on — the full
    FineWeb-style stack: exact-dedup × language × Gopher word rules ×
    repetition × model-based quality (`quality_logit`'s linear
    log-odds, one more reason tag `classifier`, last in the fixed
    order). The classifier features ride the SAME fused projection
    scan as the other stages (`_verdict_base(with_classifier=True)` —
    n_words/n_stopwords are shared signals, punctuation/char counts
    the only extras), so the full five-tier verdict still costs 2
    corpus scans + 1 doc-keyed join.

    Output (ordered by doc_id): doc_id, keep, drop_reasons."""
    from pyspark.sql.window import Window

    base = _verdict_base(docs, with_classifier=True)
    flags = _gopher_flag_exprs()
    passes_gopher = (
        flags["ok_word_count"] & flags["ok_mean_word_len"]
        & flags["ok_symbol_ratio"] & flags["ok_alpha_frac"]
        & flags["ok_stopwords"]
    )
    # quality_logit's exact integer log-odds over the shared signals
    # (n_words ≡ its token count, n_stopwords ≡ its stopword count)
    logit = F.expr(f"""CAST(
        {LOGIT_W0}
        + {LOGIT_W_STOP} * ((1000000 * CAST(n_stopwords AS BIGINT))
                            div GREATEST(CAST(n_words AS BIGINT), 1))
        + {LOGIT_W_PUNCT} * ((1000000 * _pu) div GREATEST(_nc, 1))
        + {LOGIT_W_LEN} * LEAST(CAST(n_words AS BIGINT), {LOGIT_LEN_CAP})
        + {LOGIT_W_AWL} * ((1000000 * (_nc - (CAST(n_words AS BIGINT) - 1)))
                           div GREATEST(CAST(n_words AS BIGINT), 1))
    AS BIGINT)""")
    w = Window.partitionBy("digest")
    canon = base.select(
        "doc_id",
        (F.col("doc_id") == F.min("doc_id").over(w)).alias("ok_exact"),
        (F.col("pred_lang") == PIPELINE_LANG).alias("ok_lang"),
        passes_gopher.alias("passes_gopher"),
        (logit >= 0).alias("_ok_clf"),
    )
    joined = canon.join(_ok_repetition(docs), "doc_id")
    keep = (
        F.col("ok_exact") & F.col("ok_lang") & F.col("passes_gopher")
        & F.col("ok_repetition") & F.col("_ok_clf")
    )
    reasons = F.concat_ws(
        ",",
        F.when(~F.col("ok_exact"), F.lit("exact_dup")),
        F.when(~F.col("ok_lang"), F.lit("lang")),
        F.when(~F.col("passes_gopher"), F.lit("gopher")),
        F.when(~F.col("ok_repetition"), F.lit("repetition")),
        F.when(~F.col("_ok_clf"), F.lit("classifier")),
    )
    return joined.select(
        "doc_id", keep.alias("keep"), reasons.alias("drop_reasons")
    ).orderBy("doc_id")


def filter_pipeline_full_sql(table: str = "documents") -> str:
    """DuckDB mirror of :func:`filter_pipeline_full`: the base pipeline
    mirror joined with the classifier mirror, reason appended last."""
    return f"""
        WITH base AS ({filter_pipeline_sql(table)}),
        clf AS ({quality_logit_sql(table)})
        SELECT b.doc_id,
               b.keep AND c.keep AS keep,
               concat_ws(',',
                   CASE WHEN b.drop_reasons <> '' THEN b.drop_reasons END,
                   CASE WHEN NOT c.keep THEN 'classifier' END
               ) AS drop_reasons
        FROM base b JOIN clf c ON c.doc_id = b.doc_id
        ORDER BY b.doc_id
    """


def drop_reason_profile(docs: DataFrame) -> DataFrame:
    """Which filter tier does the WORK? Per-tier rejection counts over
    the full admission verdict (`filter_pipeline_full`): one row per
    reason token with how many documents it fired on (a doc rejected
    by three tiers counts toward all three) plus the kept count under
    the pseudo-reason ``(kept)``. The rule-ablation report a curation
    run reads before moving any threshold.

    100 TB: the verdict's own stage plans + one explode of the tiny
    comma-joined reason string + a |tiers|-row aggregate. The kept
    count rides the same explode as a ``(kept)`` pseudo-reason so the
    verdict is evaluated ONCE (a union of two branches would run the
    whole pipeline twice)."""
    v = filter_pipeline_full(docs)
    return (
        v.select(F.explode(F.concat(
            F.filter(F.split("drop_reasons", ","),
                     lambda x: x != F.lit("")),
            F.when(F.col("keep"), F.array(F.lit("(kept)")))
             .otherwise(F.array().cast("array<string>")),
        )).alias("reason"))
        .groupBy("reason")
        .agg(F.count("*").alias("n_docs"))
        .orderBy(F.col("n_docs").desc(), "reason")
    )


def drop_reason_profile_sql(table: str = "documents") -> str:
    """DuckDB mirror of :func:`drop_reason_profile`."""
    return f"""
        WITH v AS ({filter_pipeline_full_sql(table)}),
        r AS (
            SELECT unnest(string_split(drop_reasons, ',')) AS reason
            FROM v
        )
        SELECT reason, count(*) AS n_docs
        FROM r WHERE reason <> '' GROUP BY 1
        UNION ALL
        SELECT '(kept)', count(*) FROM v WHERE keep
        ORDER BY n_docs DESC, reason
    """


#: gopher_rules' per-rule flag columns, fixed report order
GOPHER_FLAGS = ("ok_word_count", "ok_mean_word_len", "ok_symbol_ratio",
                "ok_alpha_frac", "ok_stopwords")


def gopher_rule_impact(docs: DataFrame) -> DataFrame:
    """Rule-granularity ablation under `drop_reason_profile`'s tier
    view: for each MassiveText word rule, how many documents fail it,
    and for how many is it the ONLY failing rule (the marginal
    impact — the number that changes if just that threshold moves).

    100 TB: one pass over gopher_rules' flag projection collapsing to
    a single 2|rules|-column aggregate row, lazily unpivoted with
    ``stack`` — no driver collect, |rules| output rows."""
    g = gopher_rules(docs)
    only = [F.count(F.when(
        ~F.col(f) & F.expr(" AND ".join(o for o in GOPHER_FLAGS
                                        if o != f)), True))
        .alias(f"_only_{f}") for f in GOPHER_FLAGS]
    fails = [F.count(F.when(~F.col(f), True)).alias(f"_fail_{f}")
             for f in GOPHER_FLAGS]
    cells = ", ".join(
        f"'{f.removeprefix('ok_')}', _fail_{f}, _only_{f}"
        for f in GOPHER_FLAGS)
    return (
        g.agg(*(fails + only))
        .select(F.expr(
            f"stack({len(GOPHER_FLAGS)}, {cells})"
            " AS (rule, n_failing, n_sole_blocker)"))
        .orderBy("rule")
    )


def gopher_rule_impact_sql(table: str = "documents") -> str:
    """DuckDB mirror of :func:`gopher_rule_impact`."""
    rows = []
    for f in GOPHER_FLAGS:
        others = " AND ".join(o for o in GOPHER_FLAGS if o != f)
        rows.append(
            f"SELECT '{f[3:]}' AS rule,"
            f" count(*) FILTER (NOT {f}) AS n_failing,"
            f" count(*) FILTER (NOT {f} AND {others}) AS n_sole_blocker"
            f" FROM g")
    union = " UNION ALL ".join(rows)
    return f"""
        WITH g AS ({gopher_rules_sql(table)})
        SELECT * FROM ({union}) ORDER BY rule
    """


#: default banned-term list (the C4 "bad words" mechanism; the fixture
#: corpus is synthetic DB prose, so the defaults include one common
#: fixture term plus terms that exercise the zero-hit path)
BLOCKLIST = ("slow", "broken", "offensive")


def blocklist_filter(docs, blocklist=BLOCKLIST):
    """C4-style banned-term filter profile: per source, how many
    documents contain at least one blocklisted token and the flag
    rate in exact integer ppm — the "bad words" admission rule every
    web-corpus pipeline runs (C4 §2.2 uses a public list; the list
    here is a parameter).

    Per-doc hits = DISTINCT blocklisted tokens present
    (array_intersect dedups), computed as a pure codegen projection —
    no explode, no join, no shuffle beyond the S-key rollup. The
    per-doc verdict composes into `filter_pipeline`-style gates via
    hits = 0.

    100 TB: one corpus scan + one S-key partial agg; the blocklist is
    a literal array in the plan (broadcast-free). For list sizes past
    expression limits (~10⁴), switch to the token-explode +
    broadcast-semi-join shape (the decontaminate pattern)."""
    lit = F.array(*[F.lit(w) for w in blocklist])
    per = docs.select(
        "source",
        F.size(F.array_intersect(tokens_col("text"), lit))
        .alias("_hits"))
    return (
        per.groupBy("source")
        .agg(F.count("*").alias("n_docs"),
             F.count(F.when(F.col("_hits") > 0, True))
             .alias("flagged_docs"),
             F.sum("_hits").alias("total_hits"))
        .select("source", "n_docs", "flagged_docs", "total_hits",
                F.expr("flagged_docs * 1000000 DIV n_docs")
                .alias("flagged_ppm"))
        .orderBy("source")
    )


def blocklist_filter_sql(table="documents", blocklist=BLOCKLIST):
    """DuckDB mirror of :func:`blocklist_filter` (words are a USER
    parameter — single quotes are escaped; real bad-word lists carry
    apostrophes)."""
    lit = "[" + ", ".join(
        "'" + w.replace("'", "''") + "'" for w in blocklist) + "]"
    toks = tokens_sql("text")
    return f"""
        WITH per AS (
            SELECT source,
                   len(list_intersect({toks}, {lit})) AS hits
            FROM {table}
        )
        SELECT source, count(*) AS n_docs,
               CAST(count(*) FILTER (WHERE hits > 0) AS BIGINT)
                   AS flagged_docs,
               CAST(sum(hits) AS BIGINT) AS total_hits,
               CAST(count(*) FILTER (WHERE hits > 0) * 1000000
                    // count(*) AS BIGINT) AS flagged_ppm
        FROM per GROUP BY 1 ORDER BY 1
    """
