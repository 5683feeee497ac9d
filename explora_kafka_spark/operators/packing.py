"""Sequence packing + token-budget mixture sampling for LLM pretraining.

Two operators that sit between corpus assembly (operators/corpus.py) and
the training job, both pure DataFrame plans with exact DuckDB mirrors:

- `pack_sequences`: concat-and-chunk packing — the standard pretraining
  layout where the shard's documents are concatenated in a deterministic
  order and cut every `budget` tokens. Emits one row per (pack, doc
  slice): which token range of which document lands where in which pack.
  Packing is SHARD-LOCAL by design: a single global concatenation order
  would funnel 100 TB through one window partition (a serial scan); with
  N hash shards every shard packs independently in parallel and only the
  last (partial) pack per shard is padding waste — at training scale
  shards ≫ 1000 and the waste fraction is `shards·budget/total_tokens`,
  negligible. The window runs inside each shard partition: one shuffle
  on `shard`, then codegen'd window + explode, no state.
- `token_budget_sample`: mixture sampling to a per-source token budget
  (e.g. "2B tokens of web, 0.5B of code"). Documents are ordered by a
  salted content hash (deterministic, re-run-stable — same property as
  `operators/sampling.py::split_assign`), token counts are cumulated per
  source, and a document is kept while its slice STARTS inside the
  budget — so the output is the smallest deterministic prefix covering
  the budget. One shuffle on `source`; the window partitions are
  per-source and the cumsum is streaming (no buffering of the
  partition), so a skewed giant source costs a scan, not memory.

Token counts use the same BPE-ish pretokenizer as `bpe_token_count`
(operators/text.py) so the packing plan budgets in the units the
training job consumes.

The reference system has no packing operators — these extend the engine
for LLM data pipelines (task brief), same design rule as
`operators/text.py`: native Column expressions + SQL mirror + driver
oracle check. No Python UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .text import bpe_tokens_col, norm_sql, BPE_PRETOKEN_RE

#: shard count for the driver-checked row; real deployments size this to
#: executor-count × a few (each shard is one window partition)
DEFAULT_SHARDS = 8

#: tokens per training sequence for the driver-checked row
DEFAULT_BUDGET = 256


def _bpe_count_sql(text_expr: str) -> str:
    pat = BPE_PRETOKEN_RE.replace("'", "''")
    return f"len(regexp_extract_all({norm_sql(text_expr)}, '{pat}'))"


def _shard_col(key, shards: int):
    """Deterministic shard in [0, shards): md5 hex prefix → 60-bit int →
    mod. Same trick as operators/sampling.py::_bucket_col (both engines
    agree bit-for-bit)."""
    h = F.conv(F.substring(F.md5(key.cast("string")), 1, 15), 16, 10)
    return (h.cast("bigint") % shards)


def _shard_sql(key_expr: str, shards: int) -> str:
    return (
        f"CAST(concat('0x', substr(md5(CAST({key_expr} AS VARCHAR)), 1, 15)) "
        f"AS BIGINT) % {shards}"
    )


def pack_sequences(
    docs: DataFrame,
    budget: int = DEFAULT_BUDGET,
    shards: int = DEFAULT_SHARDS,
) -> DataFrame:
    """Concat-and-chunk packing plan: one output row per document slice.

    Within each hash shard, documents are concatenated in `doc_id` order
    and cut every `budget` tokens. A document whose token range spans a
    cut contributes one slice row per pack it overlaps.

    Output (ordered by shard, pack_id, pack_offset):
      shard, pack_id, doc_id, doc_offset (first token of the slice
      within the doc), pack_offset (its position inside the pack),
      n_slice_tokens.

    The plan: projection → window cumsum per shard → sequence+explode of
    the overlapped pack ids → arithmetic. `sequence()` length per row is
    `1 + n_tokens/budget` — bounded by the longest single document, not
    by data volume.
    """
    toks = F.size(bpe_tokens_col("text")).cast("bigint")
    w = Window.partitionBy("shard").orderBy("doc_id")
    sliced = (
        docs.select(
            "doc_id",
            _shard_col(F.col("doc_id"), shards).alias("shard"),
            toks.alias("n_tokens"),
        )
        .filter(F.col("n_tokens") > 0)
        .withColumn("cum", F.sum("n_tokens").over(w))
        .withColumn("start", F.col("cum") - F.col("n_tokens"))
        .withColumn("first_pack", F.expr(f"start div {budget}"))
        .withColumn("last_pack", F.expr(f"(cum - 1) div {budget}"))
        .withColumn(
            "pack_id", F.explode(F.sequence("first_pack", "last_pack"))
        )
    )
    pack_start = F.col("pack_id") * budget
    slice_start = F.greatest(F.col("start"), pack_start)
    slice_end = F.least(F.col("cum"), pack_start + budget)
    return (
        sliced.select(
            "shard",
            "pack_id",
            "doc_id",
            (slice_start - F.col("start")).alias("doc_offset"),
            (slice_start - pack_start).alias("pack_offset"),
            (slice_end - slice_start).alias("n_slice_tokens"),
        )
        .orderBy("shard", "pack_id", "pack_offset")
    )


def pack_sequences_sql(
    table: str = "documents",
    budget: int = DEFAULT_BUDGET,
    shards: int = DEFAULT_SHARDS,
) -> str:
    """DuckDB mirror of `pack_sequences` (integer math identical; DuckDB
    `range(a, b)` is end-exclusive ≙ Spark `sequence(a, b)` inclusive)."""
    return f"""
        WITH toks AS (
            SELECT doc_id,
                   {_shard_sql("doc_id", shards)} AS shard,
                   {_bpe_count_sql("text")}::BIGINT AS n_tokens
            FROM {table}
        ),
        pos AS (
            SELECT doc_id, shard, n_tokens,
                   CAST(sum(n_tokens) OVER (
                       PARTITION BY shard ORDER BY doc_id
                       ROWS UNBOUNDED PRECEDING
                   ) AS BIGINT) AS cum
            FROM toks WHERE n_tokens > 0
        ),
        sliced AS (
            SELECT doc_id, shard, n_tokens, cum,
                   cum - n_tokens AS start,
                   unnest(range(
                       (cum - n_tokens) // {budget},
                       (cum - 1) // {budget} + 1
                   )) AS pack_id
            FROM pos
        )
        SELECT shard, pack_id, doc_id,
               greatest(start, pack_id * {budget}) - start AS doc_offset,
               greatest(start, pack_id * {budget})
                   - pack_id * {budget} AS pack_offset,
               least(cum, (pack_id + 1) * {budget})
                   - greatest(start, pack_id * {budget}) AS n_slice_tokens
        FROM sliced
        ORDER BY shard, pack_id, pack_offset
    """


def token_budget_sample(
    docs: DataFrame,
    budgets: dict[str, int],
    salt: str = "mix",
) -> DataFrame:
    """Deterministic per-source sampling to a token budget.

    For each source in `budgets`, documents are ordered by a salted
    content hash and kept while the cumulative token count BEFORE the
    document is under the source's budget — the smallest deterministic
    prefix whose token total covers the budget (the last kept document
    may overshoot; training-side packing truncates). Sources not listed
    are dropped, as are zero-token documents (same rule as
    pack_sequences — they contribute nothing to the budget, and their
    cum_tokens would tie with their predecessor's, ADVICE r6).

    Output (ordered by source, cum_tokens, doc_id — doc_id breaks the
    remaining theoretical tie, keeping the engine/oracle row order
    identical): source, doc_id, n_tokens, cum_tokens.
    """
    toks = F.size(bpe_tokens_col("text")).cast("bigint")
    order = F.md5(F.concat(F.lit(salt), F.col("doc_id").cast("string")))
    budget_case = F.lit(None).cast("bigint")
    for src, b in sorted(budgets.items()):
        budget_case = F.when(F.col("source") == src, F.lit(b)).otherwise(
            budget_case
        )
    w = Window.partitionBy("source").orderBy("ord", "doc_id")
    return (
        docs.select(
            "source", "doc_id", toks.alias("n_tokens"), order.alias("ord")
        )
        .filter(F.col("source").isin(list(budgets)))
        .filter(F.col("n_tokens") > 0)
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") - F.col("n_tokens") < budget_case)
        .select("source", "doc_id", "n_tokens", "cum_tokens")
        .orderBy("source", "cum_tokens", "doc_id")
    )


def token_budget_sample_sql(
    budgets: dict[str, int],
    table: str = "documents",
    salt: str = "mix",
) -> str:
    """DuckDB mirror of `token_budget_sample`."""
    salt_sq = salt.replace("'", "''")
    in_list = ", ".join(
        "'" + s.replace("'", "''") + "'" for s in sorted(budgets)
    )
    case = " ".join(
        "WHEN source = '" + s.replace("'", "''") + f"' THEN {b}"
        for s, b in sorted(budgets.items())
    )
    return f"""
        WITH toks AS (
            SELECT source, doc_id,
                   {_bpe_count_sql("text")}::BIGINT AS n_tokens,
                   md5(concat('{salt_sq}', CAST(doc_id AS VARCHAR))) AS ord
            FROM {table}
            WHERE source IN ({in_list})
        ),
        cums AS (
            SELECT source, doc_id, n_tokens,
                   CAST(sum(n_tokens) OVER (
                       PARTITION BY source ORDER BY ord, doc_id
                       ROWS UNBOUNDED PRECEDING
                   ) AS BIGINT) AS cum_tokens
            FROM toks
            WHERE n_tokens > 0
        )
        SELECT source, doc_id, n_tokens, cum_tokens
        FROM cums
        WHERE cum_tokens - n_tokens < CASE {case} END
        ORDER BY source, cum_tokens, doc_id
    """


def write_shards(
    packed: DataFrame,
    path: str,
    packs_per_file: int = 64,
) -> None:
    """Deliver a packing plan (`pack_sequences` output) as training
    shards: parquet under `{path}/data/` hive-partitioned by `shard`,
    each file holding whole packs (never a pack split across files),
    rows pack-then-offset ordered within files so a trainer streams
    slices in consumption order; plus `{path}/manifest/` with one row
    per shard — (shard, n_files, n_packs, n_rows, n_tokens) — the
    size/balance audit a training job reads before mounting the data.
    `n_files` counts the PHYSICAL parquet files actually written
    (input_file_name on read-back): repartition can hash several
    pack-file groups into one writer task, so the planned group count
    would overstate it.

    100 TB design: one repartition keyed by (shard, pack-file group) —
    every writer task owns whole packs, so no pack ever splits across
    files; the grouping helper is dropped before the write (delivered
    schema = the packing plan), and the manifest is one aggregation
    over the written data. No driver-side state.
    """
    grouped = packed.withColumn(
        "_fg", (F.col("pack_id") / packs_per_file).cast("bigint"))
    (
        grouped.repartition("shard", "_fg")
        .drop("_fg")
        .sortWithinPartitions("pack_id", "pack_offset")
        .write.mode("overwrite")
        .partitionBy("shard")
        .option("maxRecordsPerFile", 0)
        .parquet(f"{path}/data")
    )
    spark = packed.sparkSession
    written = spark.read.parquet(f"{path}/data").withColumn(
        "_file", F.input_file_name())
    manifest = (
        written.groupBy("shard")
        .agg(
            F.countDistinct("_file").alias("n_files"),
            F.countDistinct("pack_id").alias("n_packs"),
            F.count("*").alias("n_rows"),
            F.sum("n_slice_tokens").alias("n_tokens"),
        )
        .orderBy("shard")
    )
    manifest.write.mode("overwrite").parquet(f"{path}/manifest")


def pack_docs(
    docs: DataFrame,
    budget: int = DEFAULT_BUDGET,
    shards: int = DEFAULT_SHARDS,
) -> DataFrame:
    """Whole-document next-fit packing: no document is ever split.

    The complement of `pack_sequences` (concat-and-chunk): fine-tune /
    instruction corpora usually must keep documents intact, trading
    padding waste for boundary integrity. Within each hash shard,
    documents are scanned in `doc_id` order; a document goes into the
    current bin unless it would push the fill past `budget`, which
    closes the bin and opens the next (next-fit). A document longer
    than `budget` occupies a bin alone (overflowing it — the trainer's
    truncation decision, not the packer's). Zero-token documents are
    dropped (the `pack_sequences` rule).

    Output (ordered by shard, bin_id, doc_id): shard, bin_id (0-based
    per shard), doc_id, n_tokens.

    Bin assignment is inherently sequential per shard, so this is the
    grouped-map shape: one shuffle on `shard`, then an Arrow-batched
    linear scan per group. 100 TB design: shard count scales with the
    corpus (each shard's (doc_id, n_tokens) pairs — NOT the text —
    must fit one task; 16 bytes/doc ⇒ tens of millions of docs per
    shard are fine), and shards are mutually independent. The exact
    same spill-free argument as `write_shards`'s repartition.
    """
    import pandas as pd
    from pyspark.sql import types as T

    toks = F.size(bpe_tokens_col("text")).cast("bigint")
    base = docs.select(
        _shard_col(F.col("doc_id"), shards).alias("shard"),
        "doc_id",
        toks.alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)

    schema = T.StructType([
        T.StructField("shard", T.LongType()),
        T.StructField("bin_id", T.LongType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_tokens", T.LongType()),
    ])

    def _nextfit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        bins = []
        bin_id, fill = -1, 0
        for n in pdf["n_tokens"]:
            if bin_id < 0 or fill + n > budget:
                bin_id += 1
                fill = 0
            fill += int(n)
            bins.append(bin_id)
        pdf["bin_id"] = bins
        return pdf[["shard", "bin_id", "doc_id", "n_tokens"]]

    return (
        base.groupBy("shard")
        .applyInPandas(_nextfit, schema)
        .orderBy("shard", "bin_id", "doc_id")
    )


def pack_docs_sql(
    table: str = "documents",
    budget: int = DEFAULT_BUDGET,
    shards: int = DEFAULT_SHARDS,
) -> str:
    """DuckDB mirror of `pack_docs`: the sequential next-fit state is a
    recursive CTE stepping one document per shard per iteration
    (recursion depth = the longest shard's document count)."""
    return f"""
        WITH RECURSIVE toks AS (
            SELECT doc_id,
                   {_shard_sql("doc_id", shards)} AS shard,
                   {_bpe_count_sql("text")}::BIGINT AS n_tokens
            FROM {table}
        ),
        pos AS (
            SELECT doc_id, shard, n_tokens,
                   row_number() OVER (
                       PARTITION BY shard ORDER BY doc_id
                   ) AS rn
            FROM toks WHERE n_tokens > 0
        ),
        state AS (
            SELECT shard, rn, doc_id, n_tokens,
                   CAST(0 AS BIGINT) AS bin_id, n_tokens AS fill
            FROM pos WHERE rn = 1
            UNION ALL
            SELECT p.shard, p.rn, p.doc_id, p.n_tokens,
                   CASE WHEN s.fill + p.n_tokens > {budget}
                        THEN s.bin_id + 1 ELSE s.bin_id END,
                   CASE WHEN s.fill + p.n_tokens > {budget}
                        THEN p.n_tokens ELSE s.fill + p.n_tokens END
            FROM state s
            JOIN pos p ON p.shard = s.shard AND p.rn = s.rn + 1
        )
        SELECT shard, bin_id, doc_id, n_tokens
        FROM state
        ORDER BY shard, bin_id, doc_id
    """


def pack_efficiency_report(
    docs: DataFrame,
    budget: int = DEFAULT_BUDGET,
    shards: int = DEFAULT_SHARDS,
) -> DataFrame:
    """Packing-strategy efficiency audit: one row per strategy with the
    exact padding-waste accounting a training job reads before picking
    its packer — concat-and-chunk (`pack_sequences`: zero padding
    except each shard's final partial pack, but documents split across
    pack boundaries) vs whole-document next-fit (`pack_docs`: boundary
    integrity, real per-bin padding).

    Columns (strategy-ascending): strategy, n_docs, n_packs,
    used_tokens, capacity_tokens (n_packs·budget), pad_tokens
    (Σ per-pack max(budget − fill, 0) — an overflowing whole-doc bin
    contributes 0, not negative), pad_ppm (1e6·pad DIV capacity), and
    n_exceptions — the strategy's boundary-rule count: documents SPLIT
    across packs for concat_chunk, OVERSIZE bins (single doc longer
    than the budget) for whole_doc.

    All integers (counts, token sums, ppm by DIV — operands
    non-negative so Spark DIV ≡ DuckDB floor).

    100 TB: both packing passes are the underlying operators' own cost
    (window cumsum / grouped-map next-fit); the audit adds one
    (shard, pack)-keyed partial agg per strategy and 2-row arithmetic."""
    seq = pack_sequences(docs, budget, shards)
    seq_packs = (
        seq.groupBy("shard", "pack_id")
        .agg(F.sum("n_slice_tokens").alias("_fill"))
    )
    seq_docs = seq.groupBy("doc_id").agg(F.count("*").alias("_n_slices"))
    seq_row = (
        seq_packs.agg(
            F.count("*").alias("n_packs"),
            F.sum("_fill").alias("used_tokens"),
            F.sum(F.greatest(F.lit(budget) - F.col("_fill"),
                             F.lit(0).cast("bigint")))
            .alias("pad_tokens"))
        .join(F.broadcast(seq_docs.agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("_n_slices") > 1, 1).otherwise(0))
            .alias("n_exceptions"))))
        .select(F.lit("concat_chunk").alias("strategy"), "n_docs",
                "n_packs", "used_tokens", "pad_tokens", "n_exceptions")
    )
    whole = pack_docs(docs, budget, shards)
    whole_bins = (
        whole.groupBy("shard", "bin_id")
        .agg(F.sum("n_tokens").alias("_fill"))
    )
    whole_row = (
        whole_bins.agg(
            F.count("*").alias("n_packs"),
            F.sum("_fill").alias("used_tokens"),
            F.sum(F.greatest(F.lit(budget) - F.col("_fill"),
                             F.lit(0).cast("bigint")))
            .alias("pad_tokens"),
            F.sum(F.when(F.col("_fill") > budget, 1).otherwise(0))
            .alias("n_exceptions"))
        .join(F.broadcast(whole.agg(F.count("*").alias("n_docs"))))
        .select(F.lit("whole_doc").alias("strategy"), "n_docs",
                "n_packs", "used_tokens", "pad_tokens", "n_exceptions")
    )
    return (
        seq_row.unionByName(whole_row)
        .select(
            "strategy", "n_docs", "n_packs", "used_tokens",
            (F.col("n_packs") * budget).alias("capacity_tokens"),
            "pad_tokens",
            F.expr(f"1000000 * pad_tokens DIV (n_packs * {budget})")
            .alias("pad_ppm"),
            "n_exceptions",
        )
        .orderBy("strategy")
    )


def pack_efficiency_report_sql(
    table: str = "documents",
    budget: int = DEFAULT_BUDGET,
    shards: int = DEFAULT_SHARDS,
) -> str:
    """DuckDB mirror of :func:`pack_efficiency_report` (both packing
    mirrors as derived tables, identical integer accounting)."""
    seq = pack_sequences_sql(table, budget, shards)
    whole = pack_docs_sql(table, budget, shards)
    return f"""
        WITH seq AS ({seq}),
        seq_packs AS (
            SELECT shard, pack_id,
                   CAST(sum(n_slice_tokens) AS BIGINT) AS fill
            FROM seq GROUP BY 1, 2
        ),
        seq_docs AS (
            SELECT doc_id, count(*) AS n_slices FROM seq GROUP BY 1
        ),
        seq_row AS (
            SELECT 'concat_chunk' AS strategy,
                   (SELECT count(*) FROM seq_docs) AS n_docs,
                   count(*) AS n_packs,
                   CAST(sum(fill) AS BIGINT) AS used_tokens,
                   CAST(sum(greatest({budget} - fill, 0)) AS BIGINT)
                       AS pad_tokens,
                   (SELECT CAST(sum(CASE WHEN n_slices > 1 THEN 1
                                    ELSE 0 END) AS BIGINT)
                    FROM seq_docs) AS n_exceptions
            FROM seq_packs
        ),
        whole AS ({whole}),
        whole_bins AS (
            SELECT shard, bin_id, CAST(sum(n_tokens) AS BIGINT) AS fill
            FROM whole GROUP BY 1, 2
        ),
        whole_row AS (
            SELECT 'whole_doc' AS strategy,
                   (SELECT count(*) FROM whole) AS n_docs,
                   count(*) AS n_packs,
                   CAST(sum(fill) AS BIGINT) AS used_tokens,
                   CAST(sum(greatest({budget} - fill, 0)) AS BIGINT)
                       AS pad_tokens,
                   CAST(sum(CASE WHEN fill > {budget} THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_exceptions
            FROM whole_bins
        ),
        both_rows AS (
            SELECT * FROM seq_row UNION ALL SELECT * FROM whole_row
        )
        SELECT strategy, n_docs, n_packs, used_tokens,
               CAST(n_packs * {budget} AS BIGINT) AS capacity_tokens,
               pad_tokens,
               CAST(1000000 * pad_tokens // (n_packs * {budget})
                    AS BIGINT) AS pad_ppm,
               n_exceptions
        FROM both_rows ORDER BY strategy
    """
