"""Deduplication operators over `documents(doc_id, text, ...)`:

- exact dedup: md5 digest of normalized text, hash-groupBy (one shuffle)
- near dedup: MinHash signatures + LSH banding — candidate pairs come
  from an equi-join on (band_idx, band_key) buckets, NEVER an all-pairs
  crossJoin, so the plan scales as O(collisions), not O(n²)
- exact n-gram Jaccard rerank of the LSH candidates
- SimHash fingerprints (portable bit-count construction)

All hashing is md5-based (`h_i(s) = int64(md5(i || '|' || s)[:15])`) so
every value has an exact DuckDB mirror (the `*_sql` builders) — the
driver's oracle gate checks values, not just shapes. At 100 TB the same
plans hold: digest/minhash are embarrassingly parallel projections; the
LSH join shuffles on band keys (bounded by bucket collisions); AQE skew
handling covers hot buckets.

No counterpart exists in the reference (it has no text pipeline); these
are the LLM-data-pipeline extensions the task brief mandates.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import index_ledger as ledger
from .text import norm_sql, tokens_sql

#: MinHash configuration: 16 hashes, 2 bands × 8 rows. r=8 keeps the
#: candidate set sparse even when baseline Jaccard is high (word-salad
#: corpora): P(collision) = 1 - (1 - j^8)^2.
NUM_HASHES = 16
NUM_BANDS = 2
ROWS_PER_BAND = NUM_HASHES // NUM_BANDS

#: Mersenne prime 2^31 - 1: the universal-hash family h_i(x) =
#: (a_i·x + b_i) mod P over a 31-bit base hash. With a_i < P and x < 2^31
#: the product stays < 2^62 — no int64 overflow on either engine (DuckDB
#: errors on overflow; Spark non-ANSI silently wraps — both avoided).
_P = (1 << 31) - 1


def _family_params(i: int) -> tuple[int, int]:
    a = int(hashlib.md5(f"a{i}".encode()).hexdigest()[:15], 16) % (_P - 1) + 1
    b = int(hashlib.md5(f"b{i}".encode()).hexdigest()[:15], 16) % _P
    return a, b


def _base_hash_spark(var: str) -> str:
    """One md5 per shingle; 31-bit base value. The 16 family members are
    cheap affine transforms of this — not 16 separate md5 passes."""
    return (
        f"CAST(conv(substring(md5({var}), 1, 15), 16, 10) AS BIGINT) & {_P}"
    )


def _base_hash_duck(var: str) -> str:
    return (
        f"CAST(concat('0x', substr(md5({var}), 1, 15)) AS BIGINT) & {_P}"
    )


def _hash_expr_spark(i: int, var: str) -> str:
    a, b = _family_params(i)
    return f"(({a} * ({_base_hash_spark(var)}) + {b}) % {_P})"


def _hash_expr_duck(i: int, var: str) -> str:
    a, b = _family_params(i)
    return f"(({a} * ({_base_hash_duck(var)}) + {b}) % {_P})"


def _shingles_expr_spark(n: int) -> str:
    """Word n-gram shingle array from a `_toks` column (n=1 → token set)."""
    if n == 1:
        return "_toks"
    return (
        f"transform(sequence(1, greatest(size(_toks) - {n - 1}, 1)),"
        f" i -> array_join(slice(_toks, i, {n}), ' '))"
    )


def _shingles_expr_duck(toks: str, n: int) -> str:
    if n == 1:
        return toks
    return (
        f"[array_to_string(list_slice({toks}, i, i + {n - 1}), ' ')"
        f" FOR i IN range(1, greatest(len({toks}) - {n - 1}, 1) + 1)]"
    )


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def dedup_exact(docs: DataFrame) -> DataFrame:
    """Exact duplicate groups by md5 of normalized text. Returns one row
    per distinct content: (digest, keep_doc_id = min, n_dups). A single
    hash-partitioned shuffle on the digest; partial aggregation runs
    map-side, so at scale the shuffle carries one row per distinct digest
    per task."""
    return (
        docs.select("doc_id", F.md5(F.expr(_NORM_SPARK)).alias("digest"))
        .groupBy("digest")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_dups"))
    )


_NORM_SPARK = r"trim(regexp_replace(lower(text), '\\s+', ' '))"


def dedup_exact_sql(table: str = "documents") -> str:
    return f"""
        SELECT md5({norm_sql('text')}) AS digest,
               min(doc_id) AS keep_doc_id,
               count(*) AS n_dups
        FROM {table}
        GROUP BY 1
    """


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def shingle_sets(docs: DataFrame, shingle_n: int = 1) -> DataFrame:
    """(doc_id, shingles array<bigint>) — distinct 60-bit md5-HASHED
    word n-gram sets. Pure projection; the shared first stage of
    MinHash and exact-Jaccard. Hashing happens ONCE per doc here (the
    contamination-shingle discipline): the rerank intersections run on
    8-byte longs instead of strings (2.4× faster and a ~4× smaller
    rerank-join shuffle, measured at the sf1 probe), and the MinHash
    base hash is exactly `h & P`, so every signature, band key, and
    est_jaccard is BIT-IDENTICAL to the former string pipeline. The
    exact-Jaccard counts distinct hashes rather than distinct strings
    — divergence requires a 59-bit md5 collision inside one document
    (the documented contamination caveat, ~n²/2⁶⁰)."""
    sh = _shingles_expr_spark(shingle_n)
    h60 = "CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT)"
    return (
        docs.withColumn("_toks", F.expr(f"split({_NORM_SPARK}, ' ')"))
        .select("doc_id", F.expr(
            f"array_distinct(transform({sh}, s -> {h60}))"
        ).alias("shingles"))
    )


def signatures_from_shingles(
    shingled: DataFrame, num_hashes: int = NUM_HASHES
) -> DataFrame:
    """(doc_id, sig array<long>[num_hashes]) from a `shingles` column."""
    mins = ", ".join(
        "array_min(transform(_bh, h -> (({a} * h + {b}) % {p})))".format(
            a=_family_params(i)[0], b=_family_params(i)[1], p=_P
        )
        for i in range(num_hashes)
    )
    return (
        # shingles are pre-hashed 60-bit longs (shingle_sets); the
        # 31-bit family base is h & P — bit-identical to hashing the
        # string here, with zero md5 calls in this stage
        shingled.withColumn(
            "_bh", F.expr(f"transform(shingles, h -> h & {_P})")
        )
        .select("doc_id", F.expr(f"array({mins})").alias("sig"))
    )


def minhash_signatures(
    docs: DataFrame, num_hashes: int = NUM_HASHES, shingle_n: int = 1
) -> DataFrame:
    """(doc_id, sig array<long>[num_hashes]) — min over shingle hashes per
    hash family. Pure projection: distributes with zero shuffles."""
    return signatures_from_shingles(shingle_sets(docs, shingle_n), num_hashes)


def banded_signatures(
    sigs: DataFrame,
    num_bands: int = NUM_BANDS,
    rows_per_band: int = ROWS_PER_BAND,
) -> DataFrame:
    """(doc_id, sig, band_idx, band_key): one row per (doc, band); the
    band key is the md5 of that band's signature slice. Pure projection
    (×num_bands row blow-up) — the shared banding stage of the one-shot
    pair generator and the materialized index."""
    bands = F.array(*[
        F.md5(F.concat_ws(",", F.expr(
            f"slice(sig, {b * rows_per_band + 1}, {rows_per_band})"
        ))) for b in range(num_bands)
    ])
    return sigs.select(
        "doc_id", "sig", F.posexplode(bands).alias("band_idx", "band_key")
    )


def _bucket_anchor_rank() -> Column:
    """Deterministic per-bucket rank hash for the hot-bucket cap:
    md5(band_key | doc_id) spreads anchor selection pseudo-randomly
    within each bucket (the repo's hash-rank sampling convention) and
    is reproduced verbatim by the DuckDB mirrors."""
    return F.md5(F.concat_ws(
        "|", F.col("band_key"), F.col("doc_id").cast("string")))


def _bucket_anchor_rank_sql(doc_col: str = "doc_id") -> str:
    return (f"md5(concat(band_key, '|', "
            f"CAST({doc_col} AS VARCHAR)))")


def lsh_candidate_pairs(
    sigs: DataFrame,
    num_bands: int = NUM_BANDS,
    rows_per_band: int = ROWS_PER_BAND,
    max_bucket: int | None = None,
) -> DataFrame:
    """LSH banding: band key = md5 of one signature slice; docs sharing
    any band bucket become a candidate pair (doc_a < doc_b) with
    est_jaccard = matching-component fraction.

    Plan shape: explode to num_bands rows/doc, shuffle on the band key
    (equi-join), distinct pairs. No cartesian product anywhere — the
    driver test asserts CartesianProduct/BroadcastNestedLoopJoin absent.

    **`max_bucket` is the hot-bucket pair-generation valve** (r13
    verdict #4: the one super-linear risk left in the pipeline). The
    plain band join emits all C(b,2) pairs per bucket — one boilerplate
    bucket (a shared header, a template page) holding 1M docs at 100 TB
    means 5·10¹¹ pairs from a single key, and no join strategy saves
    you from rows you asked for. With `max_bucket=c`, each bucket
    elects c ANCHORS by a deterministic hash rank and emits only
    anchor×member pairs: a bucket with b ≤ c members still produces
    EXACTLY its full C(b,2) set (every member is an anchor — the cap
    is invisible until it engages), while a hot bucket produces
    c·(b−c) + C(c,2) pairs — linear in b. Every member keeps an edge
    to every anchor, so downstream connected components still collapse
    the bucket into one group; what's lost is only non-anchor↔
    non-anchor edges, whose endpoints are already mutually reachable
    through the anchors at the CANDIDATE level (the exact-Jaccard
    rerank may still cut an anchor edge a dropped edge would have
    survived — the documented approximation). `lsh_cap_audit` prices
    the dropped mass per band before you commit to a cap."""
    # materialize the banding ONCE before the self-join (optimization
    # round 15 — the af8fede r14 pattern extended to the MinHash tier):
    # without this the per-doc signature mins + per-band md5 keys
    # execute on BOTH sides of the band join. The est_jaccard
    # projection below runs BEFORE the pair dedup for the same §2.3
    # reason — the distinct shuffle then carries (doc_a, doc_b, est)
    # at 8 bytes instead of two 16-long sig arrays (~10× fewer shuffle
    # bytes); est is band-invariant and symmetric, so which duplicate
    # row survives cannot change the value.
    banded = banded_signatures(sigs, num_bands, rows_per_band) \
        .localCheckpoint(eager=True)
    n = F.size("sig_a")
    matches = F.size(F.expr(
        "filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v)"
    ))
    est = F.round(matches / n, 6).alias("est_jaccard")
    if max_bucket is None:
        a = banded.alias("a")
        b = banded.alias("b")
        return (
            a.join(
                b,
                (F.col("a.band_idx") == F.col("b.band_idx"))
                & (F.col("a.band_key") == F.col("b.band_key"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
                F.col("a.sig").alias("sig_a"),
                F.col("b.sig").alias("sig_b"),
            )
            .select("doc_a", "doc_b", est)
            .dropDuplicates(["doc_a", "doc_b"])
        )
    else:
        w = (Window.partitionBy("band_idx", "band_key")
             .orderBy(_bucket_anchor_rank().asc(), F.col("doc_id").asc()))
        anchors = (
            banded.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= max_bucket)
            .drop("_rk")
        )
        a = anchors.alias("a")
        b = banded.alias("b")
        # anchor×member join; both orientations of an anchor-anchor
        # pair normalize to the same (doc_a, doc_b) and est_jaccard is
        # symmetric, so the dropDuplicates collapse is value-stable
        return (
            a.join(
                b,
                (F.col("a.band_idx") == F.col("b.band_idx"))
                & (F.col("a.band_key") == F.col("b.band_key"))
                & (F.col("a.doc_id") != F.col("b.doc_id")),
            )
            .select(
                F.least("a.doc_id", "b.doc_id").alias("doc_a"),
                F.greatest("a.doc_id", "b.doc_id").alias("doc_b"),
                F.col("a.sig").alias("sig_a"),
                F.col("b.sig").alias("sig_b"),
            )
            .select("doc_a", "doc_b", est)
            .dropDuplicates(["doc_a", "doc_b"])
        )


def lsh_cap_audit(
    docs: DataFrame,
    max_bucket: int,
    num_hashes: int = NUM_HASHES,
    num_bands: int = NUM_BANDS,
    shingle_n: int = 1,
) -> DataFrame:
    """The dropped-mass report behind a `max_bucket` choice: per band,
    how many buckets exceed the cap and how many candidate pairs the
    anchor cap would drop vs the full C(b,2) expansion. Read BEFORE
    committing to a cap — `dedup_band_skew` finds the hot buckets;
    this prices acting on them. Output, band_idx-ascending:

        (band_idx, n_buckets, n_hot, max_bucket_size,
         pairs_full, pairs_capped, pairs_dropped)

    Cost: the banding projection + ONE bucket-count aggregation —
    statistic-sized output, no pair is ever materialized (the audit of
    a 10¹²-pair bucket costs one count). Exact int64 arithmetic:
    b·(b−1)/2 stays in-range past 10⁹-member buckets."""
    banded = banded_signatures(
        minhash_signatures(docs, num_hashes, shingle_n),
        num_bands, num_hashes // num_bands,
    )
    c = int(max_bucket)
    anchor_pairs = c * (c - 1) // 2
    sizes = (
        banded.groupBy(
            F.col("band_idx").cast("bigint").alias("band_idx"),
            "band_key")
        .agg(F.count("*").alias("b"))
        .withColumn("_full", F.expr("b * (b - 1) DIV 2"))
        .withColumn("_capped", F.expr(
            f"CASE WHEN b <= {c} THEN b * (b - 1) DIV 2"
            f" ELSE {c} * (b - {c}) + {anchor_pairs} END"))
    )
    return (
        sizes.groupBy("band_idx")
        .agg(
            F.count("*").alias("n_buckets"),
            F.sum((F.col("b") > c).cast("long")).alias("n_hot"),
            F.max("b").alias("max_bucket_size"),
            F.sum("_full").alias("pairs_full"),
            F.sum("_capped").alias("pairs_capped"),
        )
        .withColumn("pairs_dropped",
                    F.col("pairs_full") - F.col("pairs_capped"))
        .orderBy("band_idx")
    )


def lsh_cap_audit_sql(
    table: str = "documents",
    max_bucket: int = 8,
    num_hashes: int = NUM_HASHES,
    num_bands: int = NUM_BANDS,
    shingle_n: int = 1,
) -> str:
    """DuckDB mirror of :func:`lsh_cap_audit` (same banding, same
    exact integer pair arithmetic)."""
    rows = num_hashes // num_bands
    toks = tokens_sql("text")
    sh = _shingles_expr_duck("_toks", shingle_n)
    mins = ", ".join(
        "list_min([(({a} * h + {b}) % {p}) FOR h IN _bh])".format(
            a=_family_params(i)[0], b=_family_params(i)[1], p=_P
        )
        for i in range(num_hashes)
    )
    band_keys = ", ".join(
        f"md5(array_to_string(sig[{b * rows + 1}:{(b + 1) * rows}], ','))"
        for b in range(num_bands)
    )
    c = int(max_bucket)
    anchor_pairs = c * (c - 1) // 2
    return f"""
        WITH t AS (SELECT doc_id, {toks} AS _toks FROM {table}),
        s AS (SELECT doc_id,
                     list_distinct([CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT) FOR s IN {sh}])
                         AS _sh FROM t),
        bh AS (SELECT doc_id, [(h & {_P}) FOR h IN _sh] AS _bh FROM s),
        sig AS (SELECT doc_id, [{mins}] AS sig FROM bh),
        banded AS (
            SELECT doc_id, CAST(u.b - 1 AS BIGINT) AS band_idx,
                   [{band_keys}][u.b] AS band_key
            FROM sig, unnest(range(1, {num_bands} + 1)) AS u(b)
        ),
        sizes AS (
            SELECT band_idx, band_key, CAST(count(*) AS BIGINT) AS b
            FROM banded GROUP BY 1, 2
        ),
        priced AS (
            SELECT band_idx, b,
                   CAST(b * (b - 1) // 2 AS BIGINT) AS _full,
                   CAST(CASE WHEN b <= {c} THEN b * (b - 1) // 2
                        ELSE {c} * (b - {c}) + {anchor_pairs}
                        END AS BIGINT) AS _capped
            FROM sizes
        )
        SELECT band_idx,
               count(*) AS n_buckets,
               CAST(sum(CASE WHEN b > {c} THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_hot,
               max(b) AS max_bucket_size,
               CAST(sum(_full) AS BIGINT) AS pairs_full,
               CAST(sum(_capped) AS BIGINT) AS pairs_capped,
               CAST(sum(_full) - sum(_capped) AS BIGINT)
                   AS pairs_dropped
        FROM priced
        GROUP BY band_idx
        ORDER BY band_idx
    """


def dedup_near(
    docs: DataFrame,
    num_hashes: int = NUM_HASHES,
    num_bands: int = NUM_BANDS,
    shingle_n: int = 1,
    min_est: float = 0.0,
    max_bucket: int | None = None,
) -> DataFrame:
    """MinHash+LSH near-duplicate candidate pairs, sorted for stable
    output. `min_est` filters by estimated Jaccard; `max_bucket`
    engages the hot-bucket anchor cap (`lsh_candidate_pairs`)."""
    sigs = minhash_signatures(docs, num_hashes, shingle_n)
    pairs = lsh_candidate_pairs(sigs, num_bands, num_hashes // num_bands,
                                max_bucket=max_bucket)
    if min_est > 0:
        pairs = pairs.filter(F.col("est_jaccard") >= min_est)
    return pairs.orderBy("doc_a", "doc_b")


def dedup_near_sql(
    table: str = "documents",
    num_hashes: int = NUM_HASHES,
    num_bands: int = NUM_BANDS,
    shingle_n: int = 1,
    min_est: float = 0.0,
    max_bucket: int | None = None,
) -> str:
    """DuckDB mirror of dedup_near (same hashes, bands, ordering; with
    `max_bucket`, the same hash-ranked anchor election)."""
    rows = num_hashes // num_bands
    toks = tokens_sql("text")
    sh = _shingles_expr_duck("_toks", shingle_n)
    mins = ", ".join(
        "list_min([(({a} * h + {b}) % {p}) FOR h IN _bh])".format(
            a=_family_params(i)[0], b=_family_params(i)[1], p=_P
        )
        for i in range(num_hashes)
    )
    band_keys = ", ".join(
        f"md5(array_to_string(sig[{b * rows + 1}:{(b + 1) * rows}], ','))"
        for b in range(num_bands)
    )
    if max_bucket is None:
        pairs_cte = """
        pairs AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   a.sig AS sig_a, b.sig AS sig_b
            FROM banded a JOIN banded b
              ON a.band_idx = b.band_idx AND a.band_key = b.band_key
             AND a.doc_id < b.doc_id
        )"""
    else:
        # sig_a/sig_b swap across the two orientations of an
        # anchor-anchor pair, so the DISTINCT is taken over
        # (doc_a, doc_b, est) — est is symmetric, the rows collapse
        rank = _bucket_anchor_rank_sql()
        pairs_cte = f"""
        anchors AS (
            SELECT doc_id, sig, band_idx, band_key FROM (
                SELECT banded.*, row_number() OVER (
                    PARTITION BY band_idx, band_key
                    ORDER BY {rank}, doc_id) AS _rk
                FROM banded)
            WHERE _rk <= {int(max_bucket)}
        ),
        pairs AS (
            SELECT DISTINCT
                   least(a.doc_id, b.doc_id) AS doc_a,
                   greatest(a.doc_id, b.doc_id) AS doc_b,
                   a.sig AS sig_a, b.sig AS sig_b
            FROM anchors a JOIN banded b
              ON a.band_idx = b.band_idx AND a.band_key = b.band_key
             AND a.doc_id <> b.doc_id
        )"""
    est = (f"round(len([i FOR i IN range(1, {num_hashes} + 1)"
           f" IF sig_a[i] = sig_b[i]]) / {num_hashes}.0, 6)")
    return f"""
        WITH t AS (SELECT doc_id, {toks} AS _toks FROM {table}),
        s AS (SELECT doc_id,
                     list_distinct([CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT) FOR s IN {sh}])
                         AS _sh FROM t),
        bh AS (SELECT doc_id, [(h & {_P}) FOR h IN _sh] AS _bh FROM s),
        sig AS (SELECT doc_id, [{mins}] AS sig FROM bh),
        banded AS (
            SELECT doc_id, sig, u.b AS band_idx, [{band_keys}][u.b] AS band_key
            FROM sig, unnest(range(1, {num_bands} + 1)) AS u(b)
        ),
        {pairs_cte}
        SELECT DISTINCT doc_a, doc_b, {est} AS est_jaccard
        FROM pairs
        WHERE {est} >= {min_est}
        ORDER BY doc_a, doc_b
    """


# ---------------------------------------------------------------------------
# exact n-gram Jaccard (rerank of LSH candidates)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(docs: DataFrame, shingle_n: int = 1,
                        min_est: float = 0.0,
                        num_hashes: int = NUM_HASHES,
                        num_bands: int = NUM_BANDS,
                        max_bucket: int | None = None) -> DataFrame:
    """LSH candidates reranked with EXACT Jaccard over distinct word
    n-gram sets. The exact computation touches only candidate pairs —
    the standard two-phase near-dup pipeline (cheap recall, exact
    precision).

    The shingle sets are computed ONCE and materialized: signatures,
    the band join, and the rerank join all reuse them (without it,
    Spark re-derives the shingle arrays for each of the four lineage
    branches). `localCheckpoint`, not `persist` (optimization round
    14, the clustering.py µ-table finding): the columnar cache
    re-encodes the array<bigint> shingle column element-by-element
    through the generic ColumnType path — measurably slower to build
    AND to read than checkpointed UnsafeRow blocks."""
    shingled = shingle_sets(docs, shingle_n).localCheckpoint(eager=True)
    sigs = signatures_from_shingles(shingled, num_hashes)
    pairs = lsh_candidate_pairs(sigs, num_bands, num_hashes // num_bands,
                                max_bucket=max_bucket)
    if min_est > 0:
        pairs = pairs.filter(F.col("est_jaccard") >= min_est)
    cand = pairs  # no intermediate sort — the rerank join would destroy it
    a = shingled.alias("sa")
    b = shingled.alias("sb")
    joined = (
        cand.join(a, cand.doc_a == F.col("sa.doc_id"))
        .join(b, cand.doc_b == F.col("sb.doc_id"))
    )
    # |A ∪ B| = |A| + |B| - |A ∩ B|: one array traversal per pair instead
    # of two (array_union re-walks both arrays; ~2x faster rerank,
    # measured). Identical values — same integer numerator/denominator,
    # so the SQL oracle keeps the plain intersect/union spelling.
    inter = F.size(F.expr("array_intersect(sa.shingles, sb.shingles)"))
    return (
        joined.withColumn("_i", inter)
        .select(
            "doc_a", "doc_b", "est_jaccard",
            F.round(
                F.col("_i")
                / (F.size(F.expr("sa.shingles"))
                   + F.size(F.expr("sb.shingles")) - F.col("_i")),
                6,
            ).alias("jaccard"),
        )
        .orderBy("doc_a", "doc_b")
    )


def ngram_jaccard_sql(table: str = "documents", shingle_n: int = 1,
                      min_est: float = 0.0,
                      num_hashes: int = NUM_HASHES,
                      num_bands: int = NUM_BANDS,
                      max_bucket: int | None = None) -> str:
    inner = dedup_near_sql(table, num_hashes=num_hashes,
                           num_bands=num_bands,
                           shingle_n=shingle_n, min_est=min_est,
                           max_bucket=max_bucket)
    toks = tokens_sql("text")
    sh = _shingles_expr_duck("_toks", shingle_n)
    return f"""
        WITH cand AS ({inner}),
        t AS (SELECT doc_id, {toks} AS _toks FROM {table}),
        sh AS (SELECT doc_id,
                      list_distinct([CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT) FOR s IN {sh}])
                          AS shingles FROM t)
        SELECT cand.doc_a, cand.doc_b, cand.est_jaccard,
               round(len(list_intersect(sa.shingles, sb.shingles))
                     / len(list_distinct(list_concat(sa.shingles, sb.shingles))),
                     6) AS jaccard
        FROM cand
        JOIN sh sa ON cand.doc_a = sa.doc_id
        JOIN sh sb ON cand.doc_b = sb.doc_id
        ORDER BY doc_a, doc_b
    """


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(docs: DataFrame, bits: int = 32) -> DataFrame:
    """(doc_id, simhash long): bit j set iff more than half of the
    document's distinct tokens have bit j set in their 60-bit md5-derived
    hash. Pure projection — no shuffle."""
    terms = []
    for j in range(bits):
        ones = (
            f"size(filter(_hs, h -> (h >> {j}) % 2 = 1))"
        )
        terms.append(f"CAST(IF({ones} * 2 > size(_hs), {1 << j}, 0) AS BIGINT)")
    return (
        docs.withColumn("_toks", F.expr(f"array_distinct(split({_NORM_SPARK}, ' '))"))
        .withColumn("_hs", F.expr(
            f"transform(_toks, t -> {_hash_expr_spark(0, 't')})"
        ))
        .select("doc_id", F.expr(" + ".join(terms)).alias("simhash"))
    )


def simhash_sql(table: str = "documents", bits: int = 32) -> str:
    toks = tokens_sql("text")
    terms = []
    for j in range(bits):
        ones = f"len(list_filter(_hs, h -> (h >> {j}) % 2 = 1))"
        terms.append(
            f"CAST(CASE WHEN {ones} * 2 > len(_hs) THEN {1 << j} ELSE 0 END AS BIGINT)"
        )
    return f"""
        WITH t AS (SELECT doc_id, list_distinct({toks}) AS _toks FROM {table}),
        h AS (SELECT doc_id, [{_hash_expr_duck(0, 't')} FOR t IN _toks] AS _hs
              FROM t)
        SELECT doc_id, {" + ".join(terms)} AS simhash FROM h
    """


def fp_banded_pairs(banded: DataFrame, id_col: str, fp_col: str,
                    max_bucket: int | None = None) -> DataFrame:
    """Candidate pairs over an integer-banded fingerprint table
    `(id_col, fp_col, band, val)` — the shared pair-generation step of
    the two hamming-banded families (`simhash_near_dup` on text,
    `multimodal.phash_near_dup` on media). Uncapped: all C(b,2) pairs
    per (band, val) bucket. With `max_bucket=c`, the LSH hot-bucket
    anchor cap (`lsh_candidate_pairs`) on integer band values: each
    bucket elects c anchors by the deterministic rank
    md5(band|val|id) and emits only anchor×member pairs — linear in
    bucket size, invisible until it engages (a bucket with b ≤ c
    members still produces exactly its full expansion: every member
    is an anchor). The hot-bucket case here is WORSE than MinHash
    LSH's: byte-identical boilerplate shares the exact fingerprint,
    so one template bucket holds every copy in EVERY band. Capping
    trades the families' pigeonhole 100% pairwise recall for
    anchor-mediated recall: every member keeps an edge to every
    anchor of its buckets, so groups stay connected at the candidate
    level; only non-anchor↔non-anchor pairs are dropped (priced by
    the same `lsh_cap_audit` arithmetic on these buckets).

    Output: distinct (`{id}_a`, `{id}_b`, fp_a, fp_b), id_a < id_b.
    """
    ida, idb = f"{id_col}_a", f"{id_col}_b"
    if max_bucket is None:
        a = banded.select(F.col(id_col).alias(ida),
                          F.col(fp_col).alias("fp_a"), "band", "val")
        b = banded.select(F.col(id_col).alias(idb),
                          F.col(fp_col).alias("fp_b"), "band", "val")
        return (
            a.join(b, ["band", "val"])
            .filter(F.col(ida) < F.col(idb))
            .select(ida, idb, "fp_a", "fp_b")
            .distinct()
        )
    rank = F.md5(F.concat_ws("|", F.col("band"), F.col("val"),
                             F.col(id_col)))
    w = (Window.partitionBy("band", "val")
         .orderBy(rank.asc(), F.col(id_col).asc()))
    anchors = (
        banded.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= max_bucket)
        .drop("_rk")
    )
    a = anchors.select(F.col(id_col).alias("_ida"),
                       F.col(fp_col).alias("_fpa"), "band", "val")
    b = banded.select(F.col(id_col).alias("_idb"),
                      F.col(fp_col).alias("_fpb"), "band", "val")
    # anchor×member; both orientations of an anchor-anchor pair
    # normalize to the same (id_a, id_b) with fp_a/fp_b swapped —
    # hamming is symmetric, so the pair-key dedup is value-stable
    return (
        a.join(b, ["band", "val"])
        .filter(F.col("_ida") != F.col("_idb"))
        .select(
            F.least("_ida", "_idb").alias(ida),
            F.greatest("_ida", "_idb").alias(idb),
            F.col("_fpa").alias("fp_a"),
            F.col("_fpb").alias("fp_b"),
        )
        .dropDuplicates([ida, idb])
    )


def fp_banded_pairs_sql(id_col: str, fp_col: str, a_name: str,
                        b_name: str, max_bucket: int | None = None) -> str:
    """DuckDB mirror of :func:`fp_banded_pairs`: the `pairs` CTE body
    over a `banded({id_col}, {fp_col}, band, val)` CTE (shared by
    `simhash_near_dup_sql` and `multimodal.phash_near_dup_sql`).
    Emits (a_name, b_name, fp_a, fp_b); the anchor election reproduces
    the Spark md5 rank bit-for-bit. Callers must take their FINAL
    select DISTINCT: an anchor-anchor pair surfaces in both
    orientations with fp_a/fp_b swapped (hamming symmetric)."""
    if max_bucket is None:
        return f"""pairs AS (
            SELECT DISTINCT a.{id_col} AS {a_name}, b.{id_col} AS {b_name},
                   a.{fp_col} AS fp_a, b.{fp_col} AS fp_b
            FROM banded a JOIN banded b
              ON a.band = b.band AND a.val = b.val
             AND a.{id_col} < b.{id_col}
        )"""
    return f"""anchors AS (
            SELECT {id_col}, {fp_col}, band, val FROM (
                SELECT banded.*, row_number() OVER (
                    PARTITION BY band, val
                    ORDER BY md5(concat_ws('|', band, val, {id_col})),
                             {id_col}) AS _rk
                FROM banded)
            WHERE _rk <= {int(max_bucket)}
        ),
        pairs AS (
            SELECT DISTINCT
                   least(a.{id_col}, b.{id_col}) AS {a_name},
                   greatest(a.{id_col}, b.{id_col}) AS {b_name},
                   a.{fp_col} AS fp_a, b.{fp_col} AS fp_b
            FROM anchors a JOIN banded b
              ON a.band = b.band AND a.val = b.val
             AND a.{id_col} <> b.{id_col}
        )"""


def fp_cap_audit(banded: DataFrame, max_bucket: int) -> DataFrame:
    """`lsh_cap_audit`'s arithmetic on an integer-banded fingerprint
    table (columns band, val) — the dropped-mass report behind a
    `max_bucket` choice for the hamming-banded families ("no silent
    caps": every valve ships with the audit that prices it). Output,
    band-ascending: (band, n_buckets, n_hot, max_bucket_size,
    pairs_full, pairs_capped, pairs_dropped). Same cost shape as the
    MinHash audit: one bucket-count aggregation + a per-band rollup,
    statistic-sized, no pair materialized."""
    c = int(max_bucket)
    anchor_pairs = c * (c - 1) // 2
    sizes = (
        banded.groupBy(F.col("band").cast("bigint").alias("band"), "val")
        .agg(F.count("*").alias("b"))
        .withColumn("_full", F.expr("b * (b - 1) DIV 2"))
        .withColumn("_capped", F.expr(
            f"CASE WHEN b <= {c} THEN b * (b - 1) DIV 2"
            f" ELSE {c} * (b - {c}) + {anchor_pairs} END"))
    )
    return (
        sizes.groupBy("band")
        .agg(
            F.count("*").alias("n_buckets"),
            F.sum((F.col("b") > c).cast("long")).alias("n_hot"),
            F.max("b").alias("max_bucket_size"),
            F.sum("_full").alias("pairs_full"),
            F.sum("_capped").alias("pairs_capped"),
        )
        .withColumn("pairs_dropped",
                    F.col("pairs_full") - F.col("pairs_capped"))
        .orderBy("band")
    )


def simhash_cap_audit(
    docs: DataFrame,
    max_bucket: int,
    bits: int = 32,
    num_bands: int = 4,
) -> DataFrame:
    """Price a `simhash_near_dup(max_bucket=...)` choice: per band,
    buckets over the cap and full-vs-capped pair counts over the
    SimHash banding (`fp_cap_audit`). The hamming twin of
    `lsh_cap_audit` — read before engaging the valve; an
    identical-fingerprint boilerplate clique shows up as one hot
    bucket in EVERY band here."""
    assert bits % num_bands == 0
    width = bits // num_bands
    mask = (1 << width) - 1
    sh = simhash(docs, bits=bits)
    bands = F.explode(
        F.array(*[
            F.struct(
                F.lit(i).alias("band"),
                F.expr(f"(simhash >> {i * width}) & {mask}").alias("val"),
            )
            for i in range(num_bands)
        ])
    )
    banded = sh.select("doc_id", bands.alias("b")).select(
        "b.band", "b.val")
    return fp_cap_audit(banded, max_bucket)


def simhash_cap_audit_sql(
    table: str = "documents",
    max_bucket: int = 8,
    bits: int = 32,
    num_bands: int = 4,
) -> str:
    """DuckDB mirror of :func:`simhash_cap_audit` (same banding, same
    exact integer pair arithmetic as `lsh_cap_audit_sql`)."""
    width = bits // num_bands
    mask = (1 << width) - 1
    inner = simhash_sql(table, bits=bits)
    band_rows = " UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS band,"
        f" (simhash >> {i * width}) & {mask} AS val FROM sh"
        for i in range(num_bands)
    )
    c = int(max_bucket)
    anchor_pairs = c * (c - 1) // 2
    return f"""
        WITH sh AS ({inner}),
        banded AS ({band_rows}),
        sizes AS (
            SELECT band, val, CAST(count(*) AS BIGINT) AS b
            FROM banded GROUP BY 1, 2
        ),
        priced AS (
            SELECT band, b,
                   CAST(b * (b - 1) // 2 AS BIGINT) AS _full,
                   CAST(CASE WHEN b <= {c} THEN b * (b - 1) // 2
                        ELSE {c} * (b - {c}) + {anchor_pairs}
                        END AS BIGINT) AS _capped
            FROM sizes
        )
        SELECT band,
               count(*) AS n_buckets,
               CAST(sum(CASE WHEN b > {c} THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_hot,
               max(b) AS max_bucket_size,
               CAST(sum(_full) AS BIGINT) AS pairs_full,
               CAST(sum(_capped) AS BIGINT) AS pairs_capped,
               CAST(sum(_full) - sum(_capped) AS BIGINT)
                   AS pairs_dropped
        FROM priced
        GROUP BY band
        ORDER BY band
    """


def simhash_near_dup(
    docs: DataFrame,
    hamming_max: int = 3,
    bits: int = 32,
    num_bands: int = 4,
    max_bucket: int | None = None,
) -> DataFrame:
    """SimHash near-dup pairs: hamming-banded candidate join + exact
    popcount filter — the pair-generation step the `simhash` fingerprint
    feeds.

    By pigeonhole, two fingerprints within `hamming_max` bits differ in
    at most `hamming_max` of the `num_bands` equal-width bands, so with
    `num_bands > hamming_max` they MUST agree on at least one band —
    the banded equi-join is therefore EXACT (100% recall), unlike the
    probabilistic MinHash banding. Candidates are only same-band pairs
    (never all-pairs), and the final test is one xor + bit_count per
    candidate. Output (ordered): doc_a, doc_b, hamming ≤ hamming_max.

    `max_bucket` is the hot-bucket anchor cap (`fp_banded_pairs`) —
    byte-identical boilerplate shares one fingerprint and so one
    bucket per band; the cap bounds that bucket's pair expansion to
    linear, trading pigeonhole pairwise recall for anchor-mediated
    recall (every member keeps all its anchor edges, and an
    identical-fingerprint clique survives the hamming filter on every
    one of them).
    """
    assert num_bands > hamming_max, "pigeonhole needs num_bands > hamming_max"
    assert bits % num_bands == 0
    width = bits // num_bands
    mask = (1 << width) - 1
    # materialize (doc_id, simhash) ONCE (round 14, guide §2.4): the
    # banded self-join consumes it on both sides, and the fingerprint
    # projection (tokenize + per-token 60-bit hash + `bits` bit-count
    # folds per row) would otherwise run twice
    sh = simhash(docs, bits=bits).localCheckpoint(eager=True)
    bands = F.explode(
        F.array(*[
            F.struct(
                F.lit(i).alias("band"),
                F.expr(f"(simhash >> {i * width}) & {mask}").alias("val"),
            )
            for i in range(num_bands)
        ])
    )
    banded = sh.select("doc_id", "simhash", bands.alias("b")).select(
        "doc_id", "simhash", "b.band", "b.val"
    )
    pairs = fp_banded_pairs(banded, "doc_id", "simhash",
                            max_bucket=max_bucket)
    ham = F.expr("bit_count(fp_a ^ fp_b)")
    return (
        pairs.select(F.col("doc_id_a").alias("doc_a"),
                     F.col("doc_id_b").alias("doc_b"),
                     ham.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= hamming_max)
        .orderBy("doc_a", "doc_b")
    )


def simhash_near_dup_sql(
    table: str = "documents",
    hamming_max: int = 3,
    bits: int = 32,
    num_bands: int = 4,
    max_bucket: int | None = None,
) -> str:
    """DuckDB mirror of `simhash_near_dup` (same bands, xor + bit_count;
    `max_bucket` mirrors the anchor election bit-for-bit)."""
    width = bits // num_bands
    mask = (1 << width) - 1
    inner = simhash_sql(table, bits=bits)
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, simhash, {i} AS band, "
        f"(simhash >> {i * width}) & {mask} AS val FROM sh"
        for i in range(num_bands)
    )
    pairs_cte = fp_banded_pairs_sql("doc_id", "simhash", "doc_a", "doc_b",
                                    max_bucket=max_bucket)
    return f"""
        WITH sh AS ({inner}),
        banded AS ({band_rows}),
        {pairs_cte}
        SELECT DISTINCT doc_a, doc_b,
               CAST(bit_count(xor(fp_a, fp_b)) AS INT) AS hamming
        FROM pairs
        WHERE bit_count(xor(fp_a, fp_b)) <= {hamming_max}
        ORDER BY doc_a, doc_b
    """


# ---------------------------------------------------------------------------
# dedup groups: connected components over the near-dup graph
# ---------------------------------------------------------------------------


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    max_iterations: int = 25,
    driver_threshold: int = 500_000,
) -> DataFrame:
    """Min-label propagation connected components (the groups step that
    turns near-dup PAIRS into dedup GROUPS).

    nodes: (doc_id), edges: (doc_a, doc_b) undirected pairs (one row per
    pair is enough — both directions are derived here). Output: (doc_id,
    group_id) where group_id = min doc_id of the component (singletons
    label themselves).

    Distributed path (optimization round 15, VERDICT r14 #2):
    alternating LARGE-STAR / SMALL-STAR contraction (Kiveris et al.
    2014, "Connected Components in MapReduce and Beyond") — each
    round, every node hangs its larger neighbors (large-star), then
    its smaller neighbors (small-star), off the minimum of its
    neighborhood-plus-self; the edge set contracts toward one star per
    component whose root is the component MINIMUM, so the final labels
    are read straight off the star edges. Each half-round is one
    partial-agg min per node + one equi-join + one distinct, all over
    the (endpoint-bounded) edge table; `localCheckpoint(eager)` caps
    lineage per round, and set-equality (count, then exceptAll only
    when counts match) detects the fixpoint. Measured against the
    former min-label + pointer-jumping loop on a 20k-node
    near-percolation random graph — the realistic near-dup shape —
    7 rounds vs 22 and 8-23 s vs 52-71 s (the former loop wins only
    on adversarial pure-path graphs, where halving is true doubling).

    The loop iterates over EDGE ENDPOINTS only: a node with no edge is
    its own component by definition and joins the result after
    convergence via an anti-side coalesce. In a deduplicated corpus the
    overwhelming majority of documents are singletons, so the per-round
    edge table is O(|endpoints|) ≪ |nodes| — at 100 TB that is the
    difference between iterating over the duplicate subgraph and
    iterating over the whole corpus.
    """
    edges = edges.select("doc_a", "doc_b").persist()
    # Adaptive small-graph path (the COVER_ENUM_LIMIT / kcenter /
    # bpe_merges precedent: statistic-sized state may visit the
    # driver): near-dup edge sets are duplicate-subgraph-sized, not
    # corpus-sized — when the edge count is below the threshold
    # (500k rows ≈ 8 MB Arrow; the parent dict stays endpoint-bounded,
    # worst-case ~1M small-int entries), exact union-find on the driver
    # replaces ~4-6 distributed rounds × 3 joins each, producing the
    # IDENTICAL min-label-per-component result (pytest-pinned). The
    # threshold was 200k through r9; the r10 sf1 probe showed the
    # semantic-groups edge set (~450k at 10× data) falling just past it
    # onto the distributed path and paying ~3.5 s of join rounds where
    # the driver loop takes well under a second. The iterative
    # pointer-jumping path below remains the corpus-scale route and
    # is exercised directly by tests. The probe count materializes the
    # cache either way, so neither path pays an extra edge scan.
    n_dir = edges.count()
    if n_dir <= driver_threshold:
        parent: dict = {}

        def find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != r:
                parent[x], x = r, parent[x]
            return r

        # Arrow both ways: toPandas for the collect and a pandas frame
        # for the label table — a Python-tuple createDataFrame of ~10^5
        # label rows costs seconds of serialization (measured at the
        # sf1 probe), the Arrow path is ~free
        pdf = edges.toPandas()
        edges.unpersist()
        ea = pdf["doc_a"].tolist()
        eb = pdf["doc_b"].tolist()
        for va, vb in zip(ea, eb):
            ra, rb = find(va), find(vb)
            if ra != rb:
                # union by MIN label so roots are component minima
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        members = sorted(set(ea) | set(eb))
        import pandas as _pd

        lab_pdf = _pd.DataFrame({
            "doc_id": _pd.array(members, dtype="int64"),
            "_g": _pd.array([find(v) for v in members], dtype="int64"),
        })
        spark = nodes.sparkSession
        labdf = spark.createDataFrame(lab_pdf) if members else \
            spark.createDataFrame([], "doc_id long, _g long")
        return (
            nodes.select("doc_id")
            .join(F.broadcast(labdf), "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce(F.col("_g"), F.col("doc_id")).alias("group_id"),
            )
        )
    def _symd(e: DataFrame) -> DataFrame:
        return e.union(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        ).distinct()

    try:
        prev = _symd(
            edges.select(F.col("doc_a").alias("u"),
                         F.col("doc_b").alias("v")).filter("u != v")
        ).localCheckpoint(eager=True)
        n_prev = prev.count()
        # size the round tables by their rows, not the session
        # parallelism (the semdedup._ITER_ROWS_PER_PART lesson: every
        # round otherwise schedules one near-empty task per upstream
        # partition); 2-column bigint rows, so 4M rows ≈ 64 MB.
        parts = max(1, -(-n_prev // 4_000_000))
        if prev.rdd.getNumPartitions() > parts:
            prev = prev.coalesce(parts)
        for _ in range(max_iterations):
            # large-star: hang every LARGER neighbor of u off
            # m = min(Γ(u) ∪ {u})
            mins = prev.groupBy("u").agg(
                F.least(F.min("v"), F.first("u")).alias("m"))
            large = (
                prev.join(mins, "u").filter("v > u")
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
                .filter("u != v")
            )
            e2 = (_symd(large).coalesce(parts)
                  .localCheckpoint(eager=True))
            # small-star over edges oriented v < u: hang every SMALLER
            # neighbor (and u itself) off m = min(Γ<(u) ∪ {u})
            o = e2.filter("v < u")
            mins2 = o.groupBy("u").agg(
                F.least(F.min("v"), F.first("u")).alias("m"))
            small = (
                o.join(mins2, "u")
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
                .union(mins2.select("u", F.col("m").alias("v")))
                .filter("u != v")
            )
            e3 = (_symd(small).coalesce(parts)
                  .localCheckpoint(eager=True))
            n3 = e3.count()
            # fixpoint = identical edge set; the count gate keeps the
            # exact (exceptAll) comparison off the hot rounds
            if n3 == n_prev and e3.exceptAll(prev).isEmpty():
                prev = e3
                break
            prev, n_prev = e3, n3
        else:
            # partial contraction is silently WRONG groups — fail
            # loudly rather than return labels a dedup job would act on
            raise RuntimeError(
                f"connected_components did not converge within "
                f"{max_iterations} iterations; raise max_iterations for "
                f"adversarially deep graphs"
            )
    finally:
        edges.unpersist()
    # at the fixpoint every component is a star rooted at its MINIMUM:
    # each non-root's only smaller neighbor is the root
    labels = (
        prev.filter("v < u").groupBy("u").agg(F.min("v").alias("_g"))
        .select(F.col("u").alias("doc_id"), "_g")
    )
    # singletons (no edges) label themselves; endpoints take the
    # converged label
    return (
        nodes.select("doc_id")
        .join(labels, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("_g"), F.col("doc_id")).alias("group_id"),
        )
    )


#: MinHash-estimate prefilter margin for dedup_groups: candidates with
#: est_jaccard < threshold - margin skip the exact rerank entirely. With
#: 16 hashes the estimate's granularity is 1/16, so 0.35 is ~5 bands of
#: slack — the same probabilistic recall trade the banding itself makes
#: (a true >=threshold pair with an estimate this far below threshold
#: already had near-zero banding collision probability).
EST_PREFILTER_MARGIN = 0.35


def dedup_groups(docs: DataFrame, threshold: float = 0.6,
                 shingle_n: int = 1,
                 num_hashes: int = NUM_HASHES,
                 num_bands: int = NUM_BANDS,
                 max_bucket: int | None = None) -> DataFrame:
    """Full near-dup grouping pipeline: LSH candidates → exact-Jaccard
    edges (≥ threshold) → connected components. Output (doc_id,
    group_id) for EVERY document; keeping `group_id == doc_id` rows
    yields the deduplicated corpus (canonical = min doc_id per group)."""
    min_est = max(0.0, threshold - EST_PREFILTER_MARGIN)
    pairs = (
        ngram_jaccard_pairs(docs, shingle_n=shingle_n, min_est=min_est,
                            num_hashes=num_hashes, num_bands=num_bands,
                            max_bucket=max_bucket)
        .select("doc_a", "doc_b", "jaccard")
        .persist()
    )
    try:
        # materialize BEFORE filtering: a lazy filter on the computed
        # jaccard column gets pushed into the rerank join and re-evaluates
        # the per-pair array arithmetic (~2x the pipeline cost, measured);
        # filtering from the cache is a scan
        pairs.count()
        edges = pairs.filter(F.col("jaccard") >= threshold).select(
            "doc_a", "doc_b"
        )
        labels = connected_components(docs.select("doc_id"), edges)
    finally:
        # the loop's eager checkpoints materialized `labels`, so the
        # pair cache is no longer referenced by the returned plan
        pairs.unpersist()
    return labels.orderBy("doc_id")


def dedup_groups_sql(table: str = "documents", threshold: float = 0.6,
                     shingle_n: int = 1,
                     num_hashes: int = NUM_HASHES,
                     num_bands: int = NUM_BANDS,
                     max_bucket: int | None = None) -> str:
    """Recursive-CTE oracle: transitive closure over the same edge set
    (labels = min reachable doc_id). The UNION-dedup bounds the
    recursion; min() is taken outside the recursive term (aggregates are
    not allowed inside one). The est-prefilter is applied with the SAME
    formula as dedup_groups so the edge sets agree by construction."""
    min_est = max(0.0, threshold - EST_PREFILTER_MARGIN)
    inner = ngram_jaccard_sql(table, shingle_n=shingle_n, min_est=min_est,
                              num_hashes=num_hashes, num_bands=num_bands,
                              max_bucket=max_bucket)
    return f"""
        WITH RECURSIVE cand AS ({inner}),
        e AS (
            SELECT doc_a AS a, doc_b AS b FROM cand WHERE jaccard >= {threshold}
            UNION ALL
            SELECT doc_b, doc_a FROM cand WHERE jaccard >= {threshold}
        ),
        reach(a, b) AS (
            SELECT doc_id, doc_id FROM {table}
            UNION
            SELECT e.a, r.b FROM e JOIN reach r ON r.a = e.b
        )
        SELECT a AS doc_id, min(b) AS group_id FROM reach GROUP BY a
        ORDER BY 1
    """


# ---------------------------------------------------------------------------
# incremental near-dup: materialized signature index + batch check
# ---------------------------------------------------------------------------


def build_dedup_index(
    docs: DataFrame,
    path: str,
    num_hashes: int = NUM_HASHES,
    num_bands: int = NUM_BANDS,
    shingle_n: int = 1,
) -> None:
    """Materialize the corpus's banded MinHash signatures once per corpus
    snapshot — the incremental twin of `lsh_candidate_pairs`, for the
    "is this incoming batch a near-dup of anything we already hold?"
    question a continuously-growing training corpus asks on every
    ingest. Without the index, every batch pays a full corpus re-scan +
    re-signature; with it, a batch pays only its own signatures and an
    equi-join against stored band buckets (`dedup_check`).

    Layout: `{path}/bands`, columns (band_idx, band_key, doc_id, sig),
    repartitioned on the join key (band_idx, band_key) so the parquet
    files are band-bucket-clustered. Same materialize-once pattern as
    `similarity.build_ivf_index` and
    `contamination.build_contamination_index`."""
    banded = banded_signatures(
        minhash_signatures(docs, num_hashes, shingle_n),
        num_bands, num_hashes // num_bands,
    )
    (banded.repartition("band_idx", "band_key")
     .write.mode("overwrite").parquet(f"{path}/bands"))
    ledger.reset_manifest_if_present(path, "bands")


def read_dedup_bands(spark, path: str) -> DataFrame:
    """The index's band table = union of the manifest's committed dirs
    (`index_ledger.committed_union`); a pre-manifest (legacy) index
    reads as the single `bands` dir — fully backward compatible. Each
    delta dir is batch-sized by construction; `compact_dedup_index`
    folds them back when their count grows."""
    return ledger.committed_union(spark, path, "bands")


def update_dedup_index(
    docs: DataFrame,
    path: str,
    num_hashes: int = NUM_HASHES,
    num_bands: int = NUM_BANDS,
    shingle_n: int = 1,
    batch_id: int | str | None = None,
    stream_id: str | None = None,
    enforce_unique: bool = True,
) -> bool:
    """Append newly admitted documents' banded signatures into the
    index — the gate-learns step for the MinHash tier: once a batch is
    admitted, re-sent near-copies must collide with it in
    `dedup_check`.

    Two safety layers (round 13 — the IVF-index ledger ported to the
    dedup axis, VERDICT r12 #3):

    - **Replay-safe by VALUE** (r12): the batch's band rows are
      anti-joined on (doc_id, band_idx) against the COMMITTED index —
      a row's full identity, band_key being a function of the doc —
      so a replayed batch appends nothing and a crash mid-append
      CONVERGES on retry. The anti-join probes only the index's two
      key columns (column-pruned scan).
    - **Exactly-once by LEDGER** (r13): with `batch_id` set (e.g. the
      foreachBatch epoch id — `dedup_index_update_stream`), the
      append is a committed manifest entry (`operators/index_ledger`):
      a replayed epoch no-ops in O(1) metadata — it never pays the
      signature computation or the index anti-join scan — and the
      batch's rows land in their own delta dir that becomes visible
      only at the atomic manifest swap, so readers never observe a
      torn append. `stream_id` scopes the watermark per checkpoint
      (the Delta txnAppId idea), same contract as
      `similarity.update_ivf_index`.

    Without ids (legacy ad-hoc use, the streaming/corpus_gate.py
    default), behavior is unchanged from r12: value-converged append
    into the base `bands` dir. Returns True if the batch was applied,
    False on a ledger replay no-op.

    `enforce_unique=False` (ledgered path only) skips the anti-join —
    the index's ONE per-batch cost that grows with index size (a
    column-pruned scan of its two key columns). With the ledger
    already making replays exactly-once, the anti-join only guards
    against the SAME doc id arriving in two DIFFERENT committed
    batches; when the upstream mints fresh ids per admitted doc (the
    normal ingest contract), that cannot happen and the scan is pure
    cost at 100 TB. Safety either way: `dedup_check` dedups candidate
    PAIRS before scoring, so duplicated band rows can never change
    its output (test-pinned) — the invariant trades storage tidiness,
    not correctness."""
    spark = docs.sparkSession

    def _new_rows(anti_join: bool = True) -> DataFrame:
        banded = banded_signatures(
            minhash_signatures(docs, num_hashes, shingle_n),
            num_bands, num_hashes // num_bands,
        )
        if not anti_join:
            return banded.localCheckpoint(eager=True)
        existing = read_dedup_bands(spark, path).select(
            "doc_id", "band_idx")
        return (
            banded.join(existing, ["doc_id", "band_idx"], "left_anti")
            .localCheckpoint(eager=True)
        )

    def _write_delta(delta_path: str, anti_join: bool) -> bool:
        rows = _new_rows(anti_join=anti_join)
        if rows.isEmpty():
            return False
        (rows.repartition("band_idx", "band_key")
         .write.mode("overwrite").parquet(delta_path))
        return True

    if batch_id is None and stream_id is None:
        # legacy path always anti-joins: without a ledger the
        # anti-join is ALSO the replay guard. On a MANIFESTED index
        # the rows go through an unguarded ledger commit instead of
        # the raw base dir — after a compaction the base dir is no
        # longer in the manifest, and an append there would be
        # permanently invisible to readers (r13 review)
        if os.path.exists(os.path.join(path, ledger.MANIFEST)):
            return ledger.ledger_append(
                path, "bands", "bands_delta",
                lambda dp: _write_delta(dp, True))
        (_new_rows().repartition("band_idx", "band_key")
         .write.mode("append").parquet(f"{path}/bands"))
        return True

    return ledger.ledger_append(
        path, "bands", "bands_delta",
        lambda dp: _write_delta(dp, enforce_unique),
        batch_id, stream_id)


def compact_dedup_index(spark, path: str, gc: bool = True) -> None:
    """Fold accumulated band delta dirs back into one (the OPTIMIZE
    job of the dedup-index lifecycle — `index_ledger.compact`: folds
    only its snapshot's dirs, carries late-committed deltas over,
    keeps the batch/stream ledgers; `gc=False` defers folded-dir
    deletion to `vacuum_dedup_index`, the serving-safe mode). The
    fold is rewritten band-bucket-clustered like `build_dedup_index`."""

    def _rewrite(union: DataFrame, new_path: str) -> None:
        (union.repartition("band_idx", "band_key")
         .write.mode("overwrite").parquet(new_path))

    ledger.compact(spark, path, "bands", "bands_compact", _rewrite,
                   gc=gc)


def vacuum_dedup_index(path: str, grace_secs: float = 86400.0
                       ) -> list[str]:
    """Delete crash-orphaned band delta/compact dirs older than the
    grace lease (`index_ledger.vacuum`; lease rule documented there)."""
    return ledger.vacuum(path, "bands",
                         ("bands_delta_", "bands_compact_"), grace_secs)


def dedup_band_skew(spark, index_path: str) -> DataFrame:
    """Per-band bucket-load audit of a materialized dedup index — the
    fingerprint-shard skew dial read after a run of
    `update_dedup_index` appends (the `ivf_list_stats` twin on the
    dedup axis: boilerplate-heavy ingest funnels re-sent template text
    into a few hot band buckets, and `dedup_check`'s equi-join cost on
    a probed bucket is proportional to bucket SIZE). Output, one row
    per band, band-ascending:

        (band_idx, n_buckets, n_rows, max_bucket,
         max_share_ppm, hot_load_milli)

    max_share_ppm = max_bucket·1e6 DIV n_rows (the hottest bucket's
    share of its band); hot_load_milli = max_share_ppm·n_buckets DIV
    1000 (load factor vs perfectly balanced, 1000 = balanced) —
    derived from the SHARE quotient rather than the raw triple
    product max·buckets·1e6, which overflows int64 once
    rows·buckets crosses ~9e18 (the load_ppm lesson, r13 review).
    When hot_load_milli crosses the serving budget, the hot buckets
    are the AQE skew-join case — or the banding config (bands×rows)
    needs re-pricing via `dedup_recall_audit`.

    100 TB: one (band_idx, band_key)-keyed partial-agg shuffle over
    the index's key projection (no signature bytes move), then a
    num_bands-row statistic table."""
    per = (
        read_dedup_bands(spark, index_path)
        .groupBy("band_idx", "band_key")
        .agg(F.count("*").alias("n_docs"))
    )
    return (
        per.groupBy(F.col("band_idx").cast("bigint").alias("band_idx"))
        .agg(
            F.count("*").alias("n_buckets"),
            F.sum("n_docs").alias("n_rows"),
            F.max("n_docs").alias("max_bucket"),
        )
        .select(
            "band_idx", "n_buckets", "n_rows", "max_bucket",
            F.expr("max_bucket * 1000000 DIV n_rows")
            .alias("max_share_ppm"),
            F.expr("(max_bucket * 1000000 DIV n_rows) * n_buckets"
                   " DIV 1000").alias("hot_load_milli"),
        )
        .orderBy("band_idx")
    )


def dedup_band_skew_sql(
    table: str = "documents",
    num_hashes: int = NUM_HASHES,
    num_bands: int = NUM_BANDS,
    shingle_n: int = 1,
) -> str:
    """DuckDB mirror of :func:`dedup_band_skew` over an index holding
    ALL rows of `table` (the appended-index fixture: base slice built
    + delta slice streamed in = the whole corpus) — same shingle/
    minhash/banding CTEs as `dedup_check_sql`, same integer quotient
    forms. The banded CTE's 1-based unnest ordinal maps to the
    0-based Spark band_idx."""
    rows = num_hashes // num_bands
    toks = tokens_sql("text")
    sh = _shingles_expr_duck("_toks", shingle_n)
    mins = ", ".join(
        "list_min([(({a} * h + {b}) % {p}) FOR h IN _bh])".format(
            a=_family_params(i)[0], b=_family_params(i)[1], p=_P
        )
        for i in range(num_hashes)
    )
    band_keys = ", ".join(
        f"md5(array_to_string(sig[{b * rows + 1}:{(b + 1) * rows}], ','))"
        for b in range(num_bands)
    )
    return f"""
        WITH t AS (SELECT doc_id, {toks} AS _toks FROM {table}),
        s AS (SELECT doc_id,
                     list_distinct([CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT) FOR s IN {sh}])
                         AS _sh FROM t),
        bh AS (SELECT doc_id, [(h & {_P}) FOR h IN _sh] AS _bh FROM s),
        sig AS (SELECT doc_id, [{mins}] AS sig FROM bh),
        banded AS (
            SELECT doc_id, CAST(u.b - 1 AS BIGINT) AS band_idx,
                   [{band_keys}][u.b] AS band_key
            FROM sig, unnest(range(1, {num_bands} + 1)) AS u(b)
        ),
        per AS (
            SELECT band_idx, band_key, count(*) AS n_docs
            FROM banded GROUP BY 1, 2
        )
        SELECT band_idx,
               count(*) AS n_buckets,
               CAST(sum(n_docs) AS BIGINT) AS n_rows,
               CAST(max(n_docs) AS BIGINT) AS max_bucket,
               CAST(max(n_docs) * 1000000
                    // CAST(sum(n_docs) AS BIGINT) AS BIGINT)
                   AS max_share_ppm,
               CAST((max(n_docs) * 1000000
                     // CAST(sum(n_docs) AS BIGINT)) * count(*) // 1000
                    AS BIGINT) AS hot_load_milli
        FROM per
        GROUP BY 1
        ORDER BY 1
    """


def dedup_check(
    spark,
    batch: DataFrame,
    index_path: str,
    num_hashes: int = NUM_HASHES,
    num_bands: int = NUM_BANDS,
    shingle_n: int = 1,
    min_est: float = 0.0,
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-dup check of an incoming batch against a MATERIALIZED corpus
    signature index (`build_dedup_index`): (doc_id, match_id,
    est_jaccard), one row per (batch doc, indexed corpus doc) candidate
    pair, batch-side key first. Self-matches (same id on both sides) are
    excluded so a batch may safely overlap the indexed corpus.

    Parity contract (pinned by tests/test_operators.py): checking the
    corpus against its own index yields exactly
    `lsh_candidate_pairs`'s pairs, once in each orientation.
    ID CONTRACT: doc ids are identity — the self-match exclusion assumes
    a batch row carrying an indexed id IS that document (a batch that
    reuses an indexed id for different content suppresses that one
    pair); mint fresh ids for genuinely new documents.

    100 TB: the batch is signatured from scratch (it is new data); the
    corpus is NOT re-read as documents — only the stored 8-byte-keyed
    band rows join in, on (band_idx, band_key), a plain hash equi-join.
    A hot band bucket (boilerplate-heavy corpora) is an AQE skew-join
    case, same story as the one-shot path (tests/test_lsh_skew.py) —
    until bucket size itself is the cost: `max_bucket` caps the INDEX
    side of each bucket to that many hash-ranked anchors (the
    `lsh_candidate_pairs` valve, serve-time flavor), so one probe
    meets at most `max_bucket` index rows per band instead of the
    whole boilerplate bucket. A probe landing in a hot bucket still
    flags (it always meets the anchors — every near-dup VERDICT
    survives); what's capped is how many of its match_ids are
    enumerated. Buckets at or under the cap are returned in full —
    the cap is invisible until it engages."""
    idx = read_dedup_bands(spark, index_path).select(
        "band_idx", "band_key",
        F.col("doc_id").alias("match_id"), F.col("sig").alias("sig_b"),
    )
    if max_bucket is not None:
        w = (Window.partitionBy("band_idx", "band_key")
             .orderBy(F.md5(F.concat_ws(
                 "|", F.col("band_key"),
                 F.col("match_id").cast("string"))).asc(),
                 F.col("match_id").asc()))
        idx = (idx.withColumn("_rk", F.row_number().over(w))
               .filter(F.col("_rk") <= max_bucket)
               .drop("_rk"))
    bb = banded_signatures(
        minhash_signatures(batch, num_hashes, shingle_n),
        num_bands, num_hashes // num_bands,
    ).select("band_idx", "band_key", "doc_id", F.col("sig").alias("sig_a"))
    pairs = (
        bb.join(idx, ["band_idx", "band_key"])
        .filter(F.col("doc_id") != F.col("match_id"))
        .dropDuplicates(["doc_id", "match_id"])
    )
    n = F.size("sig_a")
    matches = F.size(F.expr(
        "filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v)"
    ))
    out = pairs.select(
        "doc_id", "match_id",
        F.round(matches / n, 6).alias("est_jaccard"),
    )
    if min_est > 0:
        out = out.filter(F.col("est_jaccard") >= min_est)
    return out.orderBy("doc_id", "match_id")


def _corpus_b_sql(corpus_pred: str, max_bucket: int | None) -> str:
    """The index side of `dedup_check_sql`'s band join: the plain
    predicate slice of `banded`, or (with `max_bucket`) its hash-ranked
    per-bucket anchor cap — the same election as the Spark serve path."""
    if max_bucket is None:
        return f"SELECT * FROM banded WHERE {corpus_pred}"
    rank = _bucket_anchor_rank_sql()
    return f"""SELECT doc_id, sig, band_idx, band_key FROM (
                SELECT banded.*, row_number() OVER (
                    PARTITION BY band_idx, band_key
                    ORDER BY {rank}, doc_id) AS _rk
                FROM banded WHERE {corpus_pred})
            WHERE _rk <= {int(max_bucket)}"""


def dedup_check_sql(
    table: str = "documents",
    batch_pred: str = "doc_id % 5 = 0",
    corpus_pred: str = "doc_id % 5 <> 0",
    num_hashes: int = NUM_HASHES,
    num_bands: int = NUM_BANDS,
    shingle_n: int = 1,
    min_est: float = 0.0,
    max_bucket: int | None = None,
) -> str:
    """DuckDB mirror of `dedup_check` where the index was built over
    `corpus_pred` rows of `table` and the batch is its `batch_pred` rows
    (the oracle recomputes both sides from scratch — same hashes, bands,
    ordering as `dedup_near_sql`; with `max_bucket`, the same
    hash-ranked index-side anchor cap)."""
    rows = num_hashes // num_bands
    toks = tokens_sql("text")
    sh = _shingles_expr_duck("_toks", shingle_n)
    mins = ", ".join(
        "list_min([(({a} * h + {b}) % {p}) FOR h IN _bh])".format(
            a=_family_params(i)[0], b=_family_params(i)[1], p=_P
        )
        for i in range(num_hashes)
    )
    band_keys = ", ".join(
        f"md5(array_to_string(sig[{b * rows + 1}:{(b + 1) * rows}], ','))"
        for b in range(num_bands)
    )
    est = (f"round(len([i FOR i IN range(1, {num_hashes} + 1)"
           f" IF a.sig[i] = b.sig[i]]) / {num_hashes}.0, 6)")
    return f"""
        WITH t AS (SELECT doc_id, {toks} AS _toks FROM {table}),
        s AS (SELECT doc_id,
                     list_distinct([CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT) FOR s IN {sh}])
                         AS _sh FROM t),
        bh AS (SELECT doc_id, [(h & {_P}) FOR h IN _sh] AS _bh FROM s),
        sig AS (SELECT doc_id, [{mins}] AS sig FROM bh),
        banded AS (
            SELECT doc_id, sig, u.b AS band_idx, [{band_keys}][u.b] AS band_key
            FROM sig, unnest(range(1, {num_bands} + 1)) AS u(b)
        ),
        batch_b AS (SELECT * FROM banded WHERE {batch_pred}),
        corpus_b AS ({_corpus_b_sql(corpus_pred, max_bucket)}),
        pairs AS (
            SELECT DISTINCT a.doc_id AS doc_id, b.doc_id AS match_id,
                   {est} AS est_jaccard
            FROM batch_b a JOIN corpus_b b
              ON a.band_idx = b.band_idx AND a.band_key = b.band_key
             AND a.doc_id <> b.doc_id
        )
        SELECT doc_id, match_id, est_jaccard
        FROM pairs
        WHERE est_jaccard >= {min_est}
        ORDER BY doc_id, match_id
    """


# ---------------------------------------------------------------------------
# LSH quality audit: recall/precision vs exact Jaccard on a sample
# ---------------------------------------------------------------------------


def dedup_recall_audit(
    docs: DataFrame,
    jaccard_min: float = 0.5,
    sample_mod: int = 5,
    shingle_n: int = 1,
    num_hashes: int = NUM_HASHES,
    num_bands: int = NUM_BANDS,
) -> DataFrame:
    """Price the MinHash+LSH approximation the way `ann_recall_lsh`
    prices the ANN path: on a deterministic document SAMPLE
    (doc_id % sample_mod = 0), compare the LSH candidate pairs against
    the EXACT-Jaccard ground truth (all sampled pairs with true Jaccard
    >= jaccard_min) and report one audit row:

        (n_true_pairs, n_candidates, n_hits, recall, precision)

    recall = found-truth / truth (NULL when no true pair exists);
    precision = found-truth / candidates (NULL when no candidate) —
    together they price the banding config (bands x rows) before a full
    corpus run commits to it.

    100 TB: the all-pairs exact baseline is the audit's cost and exists
    ONLY here, bounded to (n / sample_mod)^2 pairs by the sample — the
    same deliberate, allow-listed brute-force the ANN audits carry; the
    production pair generator stays the bucketed equi-join."""
    sample = docs.filter(F.col("doc_id") % sample_mod == 0)
    # ONE shingle computation (round 14, guide §2.4 — previously three:
    # both all-pairs sides AND the MinHash stage re-tokenized the
    # sample); the checkpointed sets feed the truth self-join and the
    # signature projection (the ngram_jaccard_pairs convention)
    sh = shingle_sets(sample, shingle_n).localCheckpoint(eager=True)
    a = sh.select(F.col("doc_id").alias("doc_a"),
                  F.col("shingles").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"),
                  F.col("shingles").alias("sh_b"))
    jac = F.round(
        F.size(F.array_intersect("sh_a", "sh_b"))
        / F.size(F.array_union("sh_a", "sh_b")), 6)
    truth = (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= jaccard_min)
    )
    cand = lsh_candidate_pairs(
        signatures_from_shingles(sh, num_hashes),
        num_bands, num_hashes // num_bands,
    ).select("doc_a", "doc_b")
    # ONE execution of the all-pairs truth join and of the LSH pipeline
    # (previously each ran twice: once under its count, once under the
    # hits join): a full-outer join on the pair key feeds a single
    # aggregate — count(_t)/count(_c)/count(both) are the identical
    # LONG counts the three separate aggregates produced
    both = truth.select("doc_a", "doc_b", F.lit(1).alias("_t")).join(
        cand.select("doc_a", "doc_b", F.lit(1).alias("_c")),
        ["doc_a", "doc_b"], "full_outer",
    )
    return (
        both.agg(
            F.count("_t").alias("n_true_pairs"),
            F.count("_c").alias("n_candidates"),
            F.count(F.when(F.col("_t").isNotNull()
                           & F.col("_c").isNotNull(), True))
             .alias("n_hits"),
        )
        .select(
            "n_true_pairs", "n_candidates", "n_hits",
            F.when(F.col("n_true_pairs") > 0,
                   F.round(F.col("n_hits") / F.col("n_true_pairs"), 6))
             .alias("recall"),
            F.when(F.col("n_candidates") > 0,
                   F.round(F.col("n_hits") / F.col("n_candidates"), 6))
             .alias("precision"),
        )
    )


def dedup_recall_audit_sql(
    table: str = "documents",
    jaccard_min: float = 0.5,
    sample_mod: int = 5,
    shingle_n: int = 1,
    num_hashes: int = NUM_HASHES,
    num_bands: int = NUM_BANDS,
) -> str:
    """DuckDB mirror of `dedup_recall_audit` (same sample, shingles,
    signatures, banding, rounding)."""
    rows = num_hashes // num_bands
    toks = tokens_sql("text")
    sh = _shingles_expr_duck("_toks", shingle_n)
    mins = ", ".join(
        "list_min([(({a} * h + {b}) % {p}) FOR h IN _bh])".format(
            a=_family_params(i)[0], b=_family_params(i)[1], p=_P
        )
        for i in range(num_hashes)
    )
    band_keys = ", ".join(
        f"md5(array_to_string(sig[{b * rows + 1}:{(b + 1) * rows}], ','))"
        for b in range(num_bands)
    )
    return f"""
        WITH sample AS (
            SELECT * FROM {table} WHERE doc_id % {sample_mod} = 0
        ),
        t AS (SELECT doc_id, {toks} AS _toks FROM sample),
        s AS (SELECT doc_id,
                     list_distinct([CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT) FOR s IN {sh}])
                         AS _sh FROM t),
        truth AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM s a JOIN s b ON a.doc_id < b.doc_id
            WHERE round(len(list_intersect(a._sh, b._sh)) * 1.0
                        / len(list_distinct(a._sh || b._sh)), 6)
                  >= {jaccard_min}
        ),
        bh AS (SELECT doc_id, [(h & {_P}) FOR h IN _sh] AS _bh FROM s),
        sig AS (SELECT doc_id, [{mins}] AS sig FROM bh),
        banded AS (
            SELECT doc_id, u.b AS band_idx, [{band_keys}][u.b] AS band_key
            FROM sig, unnest(range(1, {num_bands} + 1)) AS u(b)
        ),
        cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM banded a JOIN banded b
              ON a.band_idx = b.band_idx AND a.band_key = b.band_key
             AND a.doc_id < b.doc_id
        ),
        hits AS (SELECT * FROM truth INTERSECT SELECT * FROM cand)
        SELECT (SELECT count(*) FROM truth) AS n_true_pairs,
               (SELECT count(*) FROM cand) AS n_candidates,
               (SELECT count(*) FROM hits) AS n_hits,
               CASE WHEN (SELECT count(*) FROM truth) > 0
                    THEN round((SELECT count(*) FROM hits) * 1.0
                               / (SELECT count(*) FROM truth), 6) END
                   AS recall,
               CASE WHEN (SELECT count(*) FROM cand) > 0
                    THEN round((SELECT count(*) FROM hits) * 1.0
                               / (SELECT count(*) FROM cand), 6) END
                   AS precision
    """


def dedup_sweep(
    docs: DataFrame,
    rungs: tuple = (10, 20, 30, 40, 50, 60, 70, 80, 90),
    num_hashes: int = NUM_HASHES,
    num_bands: int = NUM_BANDS,
    shingle_n: int = 1,
) -> DataFrame:
    """Price the MinHash `min_est` threshold dial — the TEXT-tier twin
    of `semdedup_sweep`: from ONE LSH pair scan, how many documents
    would each estimated-Jaccard cutoff flag as near-duplicates (the
    first-occurrence-survives policy: a doc is flagged at rung t iff
    some SMALLER-id candidate partner estimates ≥ t/100)?

    Output: (min_est_pct, n_flagged, n_kept), rung-ascending; each row
    is pytest-pinned equal to an independent
    `dedup_near(min_est=t/100)` run's flagged-doc count. Estimates are
    exact multiples of 1/num_hashes, so the ×100 comparison never
    hits float fuzz and the DuckDB mirror matches exactly.

    100 TB: the pair stage is dedup_near's one banded equi-join;
    everything after is a per-doc MAX aggregate + ONE |rungs|-column
    conditional aggregate (a scalar probe row — the bpe/kcenter
    precedent) over the candidate-doc-sized tier table."""
    pairs = dedup_near(docs, num_hashes, num_bands, shingle_n)
    me = pairs.groupBy(F.col("doc_b").alias("d")).agg(
        F.max("est_jaccard").alias("me"))
    n_docs = docs.count()
    row = me.agg(*[
        F.count(F.when(F.col("me") * 100 >= r, True)).alias(f"_{r}")
        for r in rungs
    ]).collect()[0]
    data = [(int(r), int(row[f"_{r}"]), n_docs - int(row[f"_{r}"]))
            for r in rungs]
    return docs.sparkSession.createDataFrame(
        data, "min_est_pct int, n_flagged bigint, n_kept bigint")


def dedup_sweep_sql(
    table: str = "documents",
    rungs: tuple = (10, 20, 30, 40, 50, 60, 70, 80, 90),
    num_hashes: int = NUM_HASHES,
    num_bands: int = NUM_BANDS,
    shingle_n: int = 1,
) -> str:
    """DuckDB mirror of `dedup_sweep`."""
    pairs = dedup_near_sql(table, num_hashes, num_bands, shingle_n)
    vals = ", ".join(f"({r})" for r in rungs)
    return f"""
        WITH pairs AS ({pairs}),
        me AS (
            SELECT doc_b AS d, max(est_jaccard) AS me
            FROM pairs GROUP BY 1
        ),
        nd AS (SELECT count(*) AS n_docs FROM {table})
        SELECT r AS min_est_pct,
               (SELECT count(*) FROM me WHERE me * 100 >= r)
                   AS n_flagged,
               n_docs - (SELECT count(*) FROM me WHERE me * 100 >= r)
                   AS n_kept
        FROM (VALUES {vals}) t(r), nd
        ORDER BY 1
    """


def near_dup_cluster_profile(docs: DataFrame, threshold: float = 0.6,
                             shingle_n: int = 1,
                             num_hashes: int = NUM_HASHES,
                             num_bands: int = NUM_BANDS,
                             max_bucket: int | None = None) -> DataFrame:
    """Near-dup cluster SIZE profile — the one-page dedup report a
    pipeline reads before committing a threshold: for each group size,
    how many groups, how many documents they hold, and how many a
    keep-one-per-group pass removes (singletons remove 0).

    Output: (group_size, n_groups, n_docs, docs_removed),
    size-ascending. Composition over `dedup_groups` (LSH candidates →
    exact-Jaccard edges → connected components) — the expensive part
    is the already-scale-audited grouping; this adds one group-keyed
    count and one size-keyed rollup, both statistic-sized."""
    g = dedup_groups(docs, threshold=threshold, shingle_n=shingle_n,
                     num_hashes=num_hashes, num_bands=num_bands,
                     max_bucket=max_bucket)
    sizes = g.groupBy("group_id").agg(F.count("*").alias("group_size"))
    return (
        sizes.groupBy("group_size")
        .agg(F.count("*").alias("n_groups"))
        .select(
            "group_size", "n_groups",
            (F.col("group_size") * F.col("n_groups")).alias("n_docs"),
            ((F.col("group_size") - 1) * F.col("n_groups"))
            .alias("docs_removed"))
        .orderBy("group_size")
    )


def near_dup_cluster_profile_sql(table: str = "documents",
                                 threshold: float = 0.6,
                                 shingle_n: int = 1,
                                 num_hashes: int = NUM_HASHES,
                                 num_bands: int = NUM_BANDS,
                                 max_bucket: int | None = None) -> str:
    """DuckDB mirror of :func:`near_dup_cluster_profile` (same
    recursive-CTE grouping as `dedup_groups_sql`)."""
    groups = dedup_groups_sql(table, threshold=threshold,
                              shingle_n=shingle_n, num_hashes=num_hashes,
                              num_bands=num_bands, max_bucket=max_bucket)
    return f"""
        WITH g AS ({groups}),
        sizes AS (
            SELECT group_id, count(*) AS group_size FROM g GROUP BY 1
        )
        SELECT group_size, count(*) AS n_groups,
               CAST(group_size * count(*) AS BIGINT) AS n_docs,
               CAST((group_size - 1) * count(*) AS BIGINT)
                   AS docs_removed
        FROM sizes GROUP BY 1 ORDER BY 1
    """
