"""Deterministic sampling / splitting / PII redaction for training-data
pipelines over a `documents(doc_id, text, lang, source, n_chars)` table.

Three operators a 100 TB corpus pipeline needs between dedup and
training:

- `split_assign`: deterministic train/val/test assignment by content
  hash. A hash split (vs `randomSplit`) is reproducible across runs,
  engines, and re-partitioning, and documents keep their split when the
  corpus is re-built — the property training pipelines rely on to avoid
  leakage between iterations.
- `stratified_sample`: per-stratum deterministic downsampling by hash
  threshold (e.g. cap every language at 10%). Pure filter — no shuffle,
  no state; at 100 TB it runs entirely map-side with predicate/column
  pruning intact.
- `redact_pii`: regexp-based scrub of emails / phone numbers / IPv4s
  before training. Native `regexp_replace` (whole-stage codegen); the
  patterns are restricted to the RE2-compatible subset so the DuckDB
  oracle reproduces byte-identical output (no lookaround/backrefs).

All bucket math is the md5 → hex-prefix → BIGINT trick shared with
`operators/dedup.py` (`_bh`/`_bh_sql`): Spark `conv(substr(md5(x),1,15),
16,10)` ≙ DuckDB `CAST('0x' || substr(md5(x),1,15) AS BIGINT)` — both
positive (60-bit), so modulo buckets agree bit-for-bit.

The reference system has no sampling operators — these extend the
engine for LLM data pipelines (task brief), same design rule as
`operators/text.py`: pure Column expression + SQL mirror + driver-oracle
check.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bucket space for split/sample thresholds; 10k gives 0.01% resolution
N_BUCKETS = 10_000

#: canonical corpus split (shared by split_assign and the contamination
#: operator so both sides of an overlap check agree on membership)
DEFAULT_WEIGHTS: tuple[tuple[str, float], ...] = (
    ("train", 0.9), ("val", 0.05), ("test", 0.05),
)


def _bucket_col(key: Column, salt: str) -> Column:
    """Deterministic bucket in [0, N_BUCKETS) from a salted md5."""
    h = F.conv(F.substring(F.md5(F.concat(F.lit(salt), key)), 1, 15), 16, 10)
    return (h.cast("bigint") % N_BUCKETS).alias("bucket")


def _sq(text: str) -> str:
    """''-escape a value for embedding in a single-quoted SQL literal."""
    return text.replace("'", "''")


def _bucket_sql(key_expr: str, salt: str) -> str:
    return (
        f"CAST(concat('0x', substr(md5(concat('{_sq(salt)}', {key_expr})), 1, 15)) "
        f"AS BIGINT) % {N_BUCKETS}"
    )


# ---------------------------------------------------------------------------
# deterministic train/val/test split
# ---------------------------------------------------------------------------


def split_assign(
    docs: DataFrame,
    weights: Sequence[tuple[str, float]] = (
        ("train", 0.9), ("val", 0.05), ("test", 0.05),
    ),
    key: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Assign each document to a named split by hash bucket.

    `weights` are (name, fraction) pairs summing to ≤ 1 (any remainder
    falls into the last split). The assignment depends only on
    (salt, key value) — stable under re-partitioning, engine changes,
    and corpus growth. One projection; zero shuffles.
    """
    bucket = _bucket_col(F.col(key).cast("string"), salt)
    edge = 0.0
    # build CASE WHEN bucket < e1 THEN s1 WHEN bucket < e2 ... ELSE last
    cases: list[tuple[int, str]] = []
    for name, w in weights:
        edge += w
        cases.append((int(round(edge * N_BUCKETS)), name))
    expr = F.lit(cases[-1][1])
    for e, name in reversed(cases[:-1]):
        expr = F.when(F.col("bucket") < e, F.lit(name)).otherwise(expr)
    return (
        docs.withColumn("bucket", bucket)
        .withColumn("split", expr)
        .drop("bucket")
    )


def split_assign_sql(
    table: str = "documents",
    weights: Sequence[tuple[str, float]] = (
        ("train", 0.9), ("val", 0.05), ("test", 0.05),
    ),
    key: str = "doc_id",
    salt: str = "split",
) -> str:
    """DuckDB mirror of `split_assign` (bucket math identical)."""
    b = _bucket_sql(f"CAST({key} AS VARCHAR)", salt)
    edge = 0.0
    whens = []
    cases = []
    for name, w in weights:
        edge += w
        cases.append((int(round(edge * N_BUCKETS)), name))
    for e, name in cases[:-1]:
        whens.append(f"WHEN ({b}) < {e} THEN '{_sq(name)}'")
    when_sql = " ".join(whens)
    return (
        f"SELECT *, CASE {when_sql} ELSE '{_sq(cases[-1][1])}' END AS split "
        f"FROM {table}"
    )


# ---------------------------------------------------------------------------
# deterministic stratified sampling
# ---------------------------------------------------------------------------


def stratified_sample(
    docs: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "lang",
    key: str = "doc_id",
    default_fraction: float = 1.0,
    salt: str = "sample",
) -> DataFrame:
    """Keep a deterministic `fractions[stratum]` share of each stratum.

    Spark's `sampleBy` is seeded but partitioning-dependent; this is a
    pure hash-threshold filter — the same rows survive on any cluster
    layout, and the filter is map-side only (no shuffle, no sort) so it
    composes with pushdown at any scale.
    """
    bucket = _bucket_col(F.col(key).cast("string"), salt)
    thresh = F.lit(int(round(default_fraction * N_BUCKETS)))
    for stratum, frac in sorted(fractions.items()):
        thresh = F.when(
            F.col(strata_col) == stratum, int(round(frac * N_BUCKETS))
        ).otherwise(thresh)
    return (
        docs.withColumn("bucket", bucket)
        .filter(F.col("bucket") < thresh)
        .drop("bucket")
    )


def stratified_sample_sql(
    table: str = "documents",
    fractions: dict[str, float] | None = None,
    strata_col: str = "lang",
    key: str = "doc_id",
    default_fraction: float = 1.0,
    salt: str = "sample",
) -> str:
    fractions = fractions or {}
    b = _bucket_sql(f"CAST({key} AS VARCHAR)", salt)
    whens = " ".join(
        f"WHEN {strata_col} = '{_sq(s)}' THEN {int(round(f * N_BUCKETS))}"
        for s, f in sorted(fractions.items())
    )
    thresh = f"CASE {whens} ELSE {int(round(default_fraction * N_BUCKETS))} END"
    return f"SELECT * FROM {table} WHERE ({b}) < ({thresh})"


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

#: (pattern, replacement) — RE2-safe subset (no lookaround/backrefs) so
#: Spark's Java regex and DuckDB's RE2 agree byte-for-byte. Applied in
#: order, each pattern over the previous pattern's output (emails before
#: IPs so an address's dotted host is never half-eaten by the IP rule).
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\b\+?\d[\d -]{7,14}\d\b", "<PHONE>"),
)


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Replace emails / IPv4s / phone-ish number runs with typed tags.

    Output: doc_id, redacted (the scrubbed text), n_redactions (count of
    replaced spans — the audit metric a scrub job reports). All native
    `regexp_replace` / `regexp_extract_all`: whole-stage codegen, no
    Python in the hot path, trivially map-side at any scale.
    """
    redacted = F.col(text_col)
    n = F.lit(0)
    for pat, tag in PII_PATTERNS:
        n = n + F.size(F.regexp_extract_all(redacted, F.lit(pat), F.lit(0)))
        redacted = F.regexp_replace(redacted, pat, tag)
    return docs.select(
        "doc_id",
        redacted.alias("redacted"),
        n.cast("int").alias("n_redactions"),
    )


def redact_pii_sql(table: str = "documents", text_expr: str = "text") -> str:
    """DuckDB mirror: chained regexp_replace with the 'g' flag (Spark's
    regexp_replace is global by default; DuckDB's is first-match)."""
    redacted = text_expr
    counts = []
    # patterns contain no single quotes; DuckDB treats backslashes in
    # single-quoted literals literally, so they embed verbatim
    for pat, tag in PII_PATTERNS:
        counts.append(
            f"len(regexp_extract_all({redacted}, '{pat}'))"
        )
        redacted = f"regexp_replace({redacted}, '{pat}', '{tag}', 'g')"
    n = " + ".join(counts)
    return (
        f"SELECT doc_id, {redacted} AS redacted, "
        f"CAST({n} AS INT) AS n_redactions FROM {table}"
    )


# ---------------------------------------------------------------------------
# leakage-safe (near-dup-group-aware) split
# ---------------------------------------------------------------------------


def group_aware_split(
    docs: DataFrame,
    weights: Sequence[tuple[str, float]] = (
        ("train", 0.9), ("val", 0.05), ("test", 0.05),
    ),
    salt: str = "split",
    **dedup_kwargs,
) -> DataFrame:
    """Leakage-safe train/val/test split: hash the near-dup GROUP id
    (`dedup.dedup_groups`), not the document id, so a document and its
    near duplicates always land in the SAME split — the standard guard
    against train→test leakage that a plain per-doc split cannot give.
    Output: (doc_id, group_id, split), doc-ascending.

    100 TB design: the cost is the grouping itself (banded LSH pairs +
    pointer-jumping components — already the corpus dedup pass, shared/
    materialized in a real pipeline); the split assignment adds one
    hash projection, zero shuffles on top of the groups table.
    `dedup_kwargs` forwards to `dedup_groups` so the split uses the
    SAME dedup config the pipeline deduplicates with (unigram shingles
    would regroup — and re-price — the corpus differently)."""
    from .dedup import dedup_groups

    groups = dedup_groups(docs, **dedup_kwargs)
    assigned = split_assign(groups, weights, key="group_id", salt=salt)
    return assigned.select("doc_id", "group_id", "split").orderBy("doc_id")


def group_aware_split_sql(
    table: str = "documents",
    weights: Sequence[tuple[str, float]] = (
        ("train", 0.9), ("val", 0.05), ("test", 0.05),
    ),
    salt: str = "split",
    **dedup_kwargs,
) -> str:
    """DuckDB mirror: dedup_groups' recursive-CTE closure fed through
    split_assign_sql's bucket CASE keyed on group_id — ONE bucket-edge
    implementation, so the leakage-safe split can never drift from the
    plain split's rounding."""
    from .dedup import dedup_groups_sql

    inner = split_assign_sql(
        f"({dedup_groups_sql(table, **dedup_kwargs)}) AS g",
        weights, key="group_id", salt=salt)
    return (
        f"SELECT doc_id, group_id, split FROM ({inner}) "
        f"ORDER BY doc_id"
    )


# ---------------------------------------------------------------------------
# quality-weighted sampling (deterministic Bernoulli thinning)
# ---------------------------------------------------------------------------


def quality_weighted_sample(docs: DataFrame, salt: str = "qws") -> DataFrame:
    """Soft quality filtering: keep each document with probability equal
    to its quality score (text.with_text_stats), decided by a
    deterministic per-doc uniform draw u = bucket(salt, doc_id)/N — the
    CCNet-style "sample by quality" middle ground between keep-all and
    hard thresholding. Stable under repartitioning and corpus growth;
    pure projections + one doc-keyed equi-join, no shuffle beyond it.
    Output: kept documents (doc_id, quality_score, u), doc-ascending."""
    from .text import with_text_stats

    stats = with_text_stats(docs).select("doc_id", "quality_score")
    u = (
        _bucket_col(F.col("doc_id").cast("string"), salt).cast("double")
        / F.lit(float(N_BUCKETS))
    )
    return (
        stats.withColumn("u", F.round(u, 6))
        .filter(F.col("u") < F.col("quality_score"))
        .orderBy("doc_id")
    )


def quality_weighted_sample_sql(
    table: str = "documents", salt: str = "qws"
) -> str:
    """DuckDB mirror of `quality_weighted_sample`."""
    from .text import text_stats_sql

    b = _bucket_sql("CAST(doc_id AS VARCHAR)", salt)
    return f"""
        WITH stats AS ({text_stats_sql(table)})
        SELECT doc_id, quality_score,
               round(CAST({b} AS DOUBLE) / {float(N_BUCKETS)}, 6) AS u
        FROM stats
        WHERE round(CAST({b} AS DOUBLE) / {float(N_BUCKETS)}, 6)
              < quality_score
        ORDER BY doc_id
    """


# ---------------------------------------------------------------------------
# per-source epoch factors (mixture up-/down-sampling)
# ---------------------------------------------------------------------------


def epoch_upsample(
    docs: DataFrame,
    epochs: dict[str, float],
    default: float = 1.0,
    salt: str = "epoch",
) -> DataFrame:
    """Per-source epoch factors — the data-recipe knob that repeats
    high-value sources and thins low-value ones in the same pass: a
    factor e emits floor(e) copies of every doc plus one more with
    probability frac(e), decided by the deterministic per-doc uniform
    (so e < 1 down-samples with the identical mechanism). A source's
    expected doc mass scales by exactly e while every copy decision
    stays reproducible across runs, engines, and partitionings.

    Output: (doc_id, source, copy_idx) — one row per emitted copy,
    copy_idx 1..n. Pure projection + explode; zero shuffles."""
    u = (
        _bucket_col(F.col("doc_id").cast("string"), salt).cast("double")
        / F.lit(float(N_BUCKETS))
    )
    e = F.lit(float(default))
    for s, f in sorted(epochs.items()):
        e = F.when(F.col("source") == s, F.lit(float(f))).otherwise(e)
    n = (
        F.floor(e).cast("int")
        + F.when(u < (e - F.floor(e)), F.lit(1)).otherwise(F.lit(0))
    )
    copies = F.when(
        F.col("n_copies") >= 1,
        F.sequence(F.lit(1), F.col("n_copies")),
    ).otherwise(F.expr("CAST(array() AS array<int>)"))
    return (
        docs.select("doc_id", "source", n.alias("n_copies"))
        .select("doc_id", "source", F.explode(copies).alias("copy_idx"))
        .orderBy("doc_id", "copy_idx")
    )


def epoch_upsample_sql(
    table: str = "documents",
    epochs: dict[str, float] | None = None,
    default: float = 1.0,
    salt: str = "epoch",
) -> str:
    """DuckDB mirror of `epoch_upsample` (range() is end-exclusive and
    empty below 1, matching the guarded sequence; an empty/None epochs
    map degenerates to the constant default, like the Spark twin)."""
    b = _bucket_sql("CAST(doc_id AS VARCHAR)", salt)
    whens = " ".join(
        f"WHEN source = '{_sq(s)}' THEN CAST({float(f)} AS DOUBLE)"
        for s, f in sorted((epochs or {}).items()))
    e = (f"CASE {whens} ELSE CAST({float(default)} AS DOUBLE) END"
         if whens else f"CAST({float(default)} AS DOUBLE)")
    u = f"CAST({b} AS DOUBLE) / {float(N_BUCKETS)}"
    return f"""
        WITH base AS (
            SELECT doc_id, source,
                   CAST(floor({e}) AS INT)
                   + CASE WHEN {u} < ({e}) - floor({e})
                          THEN 1 ELSE 0 END AS n_copies
            FROM {table}
        )
        SELECT doc_id, source,
               CAST(unnest(range(1, n_copies + 1)) AS INT) AS copy_idx
        FROM base
        ORDER BY doc_id, copy_idx
    """


# ---------------------------------------------------------------------------
# curriculum selection (hard top-fraction quality cut per source)
# ---------------------------------------------------------------------------


def curriculum_select(docs: DataFrame, frac: float = 0.5) -> DataFrame:
    """Keep the top ``frac`` of each source's documents by quality
    score — the hard-threshold counterpart of quality_weighted_sample
    (curriculum / ablation corpora select "best X% per source" so no
    source is wiped out by a global cut).

    Per source, documents rank by (quality_score DESC, doc_id ASC —
    the deterministic tie-break) and the first ``ceil(frac * n_src)``
    survive. Output (ordered by source, rank): source, doc_id,
    quality_score, rank.

    One shuffle on source + the per-source window; the rank frontier
    is per-source, so a huge source costs only its own scan. Skewed
    sources are window partitions — at 100 TB shard the window key by
    (source, hash-bucket) and take per-bucket quotas if one source
    dominates.
    """
    from pyspark.sql.window import Window

    from .text import with_text_stats

    stats = with_text_stats(docs).select("doc_id", "quality_score")
    w = Window.partitionBy("source").orderBy(
        F.col("quality_score").desc(), F.col("doc_id").asc()
    )
    n_w = Window.partitionBy("source")
    return (
        docs.select("source", "doc_id")
        .join(stats, "doc_id")
        .withColumn("rank", F.row_number().over(w))
        .withColumn("n_src", F.count(F.lit(1)).over(n_w))
        .filter(F.col("rank") <= F.ceil(F.col("n_src") * frac))
        .select("source", "doc_id", "quality_score", "rank")
        .orderBy("source", "rank")
    )


def curriculum_select_sql(
    table: str = "documents", frac: float = 0.5
) -> str:
    """DuckDB mirror of `curriculum_select` (identical window order and
    ceil arithmetic)."""
    from .text import text_stats_sql

    return f"""
        WITH stats AS ({text_stats_sql(table)}),
        ranked AS (
            SELECT d.source, d.doc_id, s.quality_score,
                   row_number() OVER (
                       PARTITION BY d.source
                       ORDER BY s.quality_score DESC, d.doc_id ASC
                   ) AS rank,
                   count(*) OVER (PARTITION BY d.source) AS n_src
            FROM {table} d JOIN stats s ON s.doc_id = d.doc_id
        )
        SELECT source, doc_id, quality_score, rank
        FROM ranked
        WHERE rank <= ceil(n_src * {frac})
        ORDER BY source, rank
    """


def weighted_sample_topk(
    docs: DataFrame,
    weight_expr: str = "n_chars",
    k: int = 100,
    salt: str = "aes",
    key: str = "doc_id",
) -> DataFrame:
    """EXACT-SIZE weighted sampling without replacement (Efraimidis &
    Spirakis 2006 A-ES): every row draws a deterministic uniform
    u ∈ (0,1) from md5(salt ‖ key) and takes priority u^(1/w); the k
    largest priorities ARE a weighted sample without replacement. Where
    `quality_weighted_sample` keeps each row independently (Bernoulli —
    output size varies), this returns exactly k rows, the shape a fixed
    token-budget draw needs.

    Ranking uses the monotone-equivalent ln(u)/w, floored to integer
    µunits with the row key as tie-break. Determinism: u is a 52-bit
    dyadic rational (exact in double, identical across engines); ln is
    the single libm op (the bm25_search last-ulp allowance — a
    boundary flip needs two priorities within one µunit AND one ulp,
    ~1e-10 per row). Rows with non-positive weight are excluded (zero
    weight = never sampled; A-ES domain).

    Output: (key, weight, priority_mu, rank), rank 1..k by priority
    desc. 100 TB: one projection + TakeOrdered top-k — no shuffle
    beyond the k-row merge."""
    u = (f"(CAST(conv(substring(md5(concat('{salt}',"
         f" CAST({key} AS STRING))), 1, 13), 16, 10) AS DOUBLE) + 0.5)"
         f" / 4503599627370496.0")
    w = f"CAST(({weight_expr}) AS DOUBLE)"
    pri = f"CAST(floor(1e6 * ln({u}) / ({w})) AS BIGINT)"
    from pyspark.sql.window import Window

    ranked = (
        docs.filter(F.expr(f"({weight_expr}) > 0"))
        .select(F.col(key), F.expr(weight_expr).alias("weight"),
                F.expr(pri).alias("priority_mu"))
        .orderBy(F.col("priority_mu").desc(), F.col(key).asc())
        .limit(k)
    )
    w2 = Window.orderBy(F.col("priority_mu").desc(), F.col(key).asc())
    return ranked.withColumn("rank", F.row_number().over(w2))


def weighted_sample_topk_sql(
    table: str = "documents",
    weight_expr: str = "n_chars",
    k: int = 100,
    salt: str = "aes",
    key: str = "doc_id",
) -> str:
    """DuckDB mirror of :func:`weighted_sample_topk`."""
    u = (f"(CAST(CAST(concat('0x', substr(md5(concat('{salt}',"
         f" CAST({key} AS VARCHAR))), 1, 13)) AS BIGINT) AS DOUBLE)"
         f" + 0.5) / 4503599627370496.0")
    w = f"CAST(({weight_expr}) AS DOUBLE)"
    pri = f"CAST(floor(1e6 * ln({u}) / ({w})) AS BIGINT)"
    return f"""
        SELECT {key}, {weight_expr} AS weight, priority_mu,
               row_number() OVER (
                   ORDER BY priority_mu DESC, {key} ASC) AS rank
        FROM (
            SELECT {key}, {weight_expr}, {pri} AS priority_mu
            FROM {table} WHERE ({weight_expr}) > 0
        )
        ORDER BY priority_mu DESC, {key} ASC
        LIMIT {k}
    """


def doremi_weights(
    docs: DataFrame,
    steps: int = 10,
    eta_ppm: int = 100_000,
    smooth_ppm: int = 10_000,
    excess_cap_mu: int = 12_000_000,
) -> DataFrame:
    """DoReMi-style domain-mixture weight search (Xie et al. 2023,
    "DoReMi: Optimizing Data Mixtures Speeds Up Language Model
    Pretraining") over the corpus's OWN per-source statistics: the
    multiplicative-weights (Group-DRO) update the paper runs against a
    proxy model, driven here by a model-free excess-loss signal — each
    source's mean bits/token under the corpus-wide add-one-smoothed
    unigram LM (the `unigram_bits` statistic), clipped at the corpus
    baseline. Sources whose text the corpus LM finds surprising
    (underrepresented domains) gain weight over the trajectory; the
    published recipe's final mixture is the AVERAGE of the per-step
    weights smoothed toward uniform, reproduced verbatim.

    Deterministic exact-integer arithmetic end-to-end: per-source loss
    is `Σµbits DIV Σtokens` (BIGINT), excess is a clipped BIGINT
    difference CAPPED at `excess_cap_mu` (12 bits/token by default —
    the Group-DRO loss-clipping convention, and the overflow guard:
    the µ-rounded score exp(η·steps·excess) must stay below 2^63/1e6
    ≈ 9.2e12 so the ppm normalization cannot overflow BIGINT — Spark's
    non-ANSI mode would wrap silently where DuckDB throws, breaking
    engine parity exactly when a hapax-only source meets a repetitive
    corpus), the per-step multiplicative score exp(η·t·excess) —
    the single libm op, the unigram_bits/bm25 accepted last-ulp
    exposure — is µ-rounded IMMEDIATELY to BIGINT, and every
    normalization is integer ppm floor division, so both engines agree
    bit-for-bit. Output (source-ascending): source, n_tokens, loss_mu,
    excess_mu, weight_ppm. weight_ppm feeds `epoch_upsample` directly
    (weight_ppm / (1e6·share) = the per-source epoch factor).

    100 TB design: ONE corpus token scan (round 14 — previously the
    explode subtree re-executed once per consumer: the vocab agg, the
    scoring join's probe side, and again under each downstream branch
    of the S-row table, ~4 corpus passes in the plan): the explode
    folds straight into a (source, token, c) count table (map-side
    partial agg, vocab-sided × S rows), which is localCheckpointed and
    feeds BOTH the µbit LM (vocab = counts summed over sources) and
    the per-source loss sums (Σ c·mu_bits — bit-identical BIGINT to
    the per-occurrence sum); the S-row `per` table is checkpointed
    too, so everything after is S-row arithmetic — the step fan-out is
    S×steps rows, never the corpus.

    Why the eager checkpoints here, when `dsir_weights` deliberately
    stays lazy (ADVICE r14): dsir_weights has column-pruned consumers
    (`dsir_select` reads a 2-column slice; forcing materialization
    measured 0.35→1.3-2.0 s), while doremi_weights' only consumer is
    the full S-row mixture table and its plan references the corpus
    token fold FOUR times (vocab agg, scoring probe, and twice under
    the step fan-out) — without the checkpoint each reference re-runs
    the corpus explode. A future pruned consumer should add a lazy
    builder twin (the dsir.py split) rather than drop the checkpoint.
    """
    from explora_kafka_spark.operators.text import (
        tokens_col, unigram_mu_from_vocab)

    src_tok = (
        docs.select("source",
                    F.explode(tokens_col("text")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("source", "token")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=True)
    )
    mu = unigram_mu_from_vocab(
        src_tok.groupBy("token").agg(F.sum("c").alias("c")))
    per = (
        src_tok.join(mu, "token")
        .groupBy("source")
        .agg(F.sum("c").alias("n_tokens"),
             F.sum(F.col("c") * F.col("mu_bits")).alias("smu"))
        .localCheckpoint(eager=True)
    )
    base = per.agg(F.sum("smu").alias("tmu"),
                   F.sum("n_tokens").alias("tn"),
                   F.count("*").alias("S"))
    scored = (
        per.join(F.broadcast(base))
        .select(
            "source", "n_tokens", "S",
            F.expr("smu DIV n_tokens").alias("loss_mu"),
            F.least(
                F.greatest(F.expr("smu DIV n_tokens - tmu DIV tn"),
                           F.lit(0).cast("long")),
                F.lit(excess_cap_mu).cast("long")).alias("excess_mu"),
        )
    )
    st = (
        scored.select(
            "source", "n_tokens", "S", "loss_mu", "excess_mu",
            F.explode(F.sequence(F.lit(1), F.lit(steps))).alias("t"),
        )
        .withColumn(
            "e_mu",
            F.floor(
                F.exp((F.lit(eta_ppm).cast("long") * F.col("t")
                       * F.col("excess_mu")).cast("double") / F.lit(1e12))
                * 1e6 + F.lit(0.5)
            ).cast("bigint"),
        )
    )
    tot = st.groupBy("t").agg(F.sum("e_mu").alias("se"))
    w = (
        st.join(tot, "t")
        .select("source", "n_tokens", "S", "loss_mu", "excess_mu",
                F.expr("e_mu * 1000000 DIV se").alias("w_ppm"))
    )
    return (
        w.groupBy("source", "n_tokens", "S", "loss_mu", "excess_mu")
        .agg(F.sum("w_ppm").alias("sw"))
        .select(
            "source", "n_tokens", "loss_mu", "excess_mu",
            F.expr(
                f"(({1_000_000 - smooth_ppm}) * (sw DIV {steps})"
                f" + {smooth_ppm} * (1000000 DIV S)) DIV 1000000"
            ).alias("weight_ppm"),
        )
        .orderBy("source")
    )


def doremi_weights_sql(
    table: str = "documents",
    steps: int = 10,
    eta_ppm: int = 100_000,
    smooth_ppm: int = 10_000,
    excess_cap_mu: int = 12_000_000,
) -> str:
    """DuckDB mirror of :func:`doremi_weights` (same µbit vocabulary,
    integer losses, µ-rounded exp scores, and ppm floor divisions)."""
    from explora_kafka_spark.operators.text import unigram_mu_sql_ctes

    return f"""
        WITH {unigram_mu_sql_ctes(table, "source")},
        per AS (
            SELECT tk.source, count(*) AS n_tokens,
                   CAST(sum(mu.mu_bits) AS BIGINT) AS smu
            FROM tk JOIN mu ON tk.token = mu.token
            GROUP BY 1
        ),
        base AS (SELECT CAST(sum(smu) AS BIGINT) AS tmu,
                        CAST(sum(n_tokens) AS BIGINT) AS tn,
                        count(*) AS S FROM per),
        scored AS (
            SELECT source, n_tokens, S,
                   CAST(smu // n_tokens AS BIGINT) AS loss_mu,
                   CAST(least(greatest(smu // n_tokens - tmu // tn, 0),
                              {excess_cap_mu}) AS BIGINT) AS excess_mu
            FROM per, base
        ),
        st AS (
            SELECT source, n_tokens, S, loss_mu, excess_mu, u.t,
                   CAST(floor(exp(CAST({eta_ppm} * u.t * excess_mu
                                       AS DOUBLE) / 1e12)
                              * 1e6 + 0.5) AS BIGINT) AS e_mu
            FROM scored, unnest(range(1, {steps} + 1)) AS u(t)
        ),
        tot AS (SELECT t, CAST(sum(e_mu) AS BIGINT) AS se
                FROM st GROUP BY 1),
        w AS (
            SELECT st.source, st.n_tokens, st.S, st.loss_mu,
                   st.excess_mu,
                   CAST(st.e_mu * 1000000 // tot.se AS BIGINT) AS w_ppm
            FROM st JOIN tot ON st.t = tot.t
        )
        SELECT source, n_tokens, loss_mu, excess_mu,
               CAST((({1_000_000 - smooth_ppm})
                     * (CAST(sum(w_ppm) AS BIGINT) // {steps})
                     + {smooth_ppm} * (1000000 // S)) // 1000000
                    AS BIGINT) AS weight_ppm
        FROM w
        GROUP BY source, n_tokens, S, loss_mu, excess_mu
        ORDER BY source
    """
