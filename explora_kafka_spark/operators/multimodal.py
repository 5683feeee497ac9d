"""Multimodal column handling: image/audio/video as opaque `binary`
payloads with typed metadata, processed in Arrow-batched Pandas stages
(`mapInPandas`) — the shape a 100 TB media pipeline needs.

The container has no image/audio libraries, so the actual decoders are
STUBS: `decode_media` raises NotImplementedError unless PIL/soundfile
are importable, and `fake_decode` provides a deterministic stand-in
(metadata derived from the payload digest) so the Spark-side plumbing —
schema, partitioning, UDF signature, Arrow batch shape — is real and
tested end-to-end.

Scale notes: payloads stay columnar binary end-to-end (no base64 blow-up,
no driver collect); mapInPandas streams Arrow batches bounded by
`spark.sql.execution.arrow.maxRecordsPerBatch`, so executor memory is
batch-bounded regardless of table size; metadata extraction is a pure
projection (no shuffle).
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import index_ledger as ledger

#: output schema of extract_meta
META_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("digest", T.StringType()),
])

#: output schema of (fake_)decode for images
DECODED_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_channels", T.IntegerType()),
])

#: output schema of frame sampling: one row per sampled frame
FRAMES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("frame_digest", T.StringType()),
])


def media_from_documents(docs: DataFrame, kind: str = "image") -> DataFrame:
    """Synthesize a media table from the documents fixture: the utf-8
    bytes of `text` stand in for an encoded payload. Real deployments
    read (media_id, kind, payload, meta) from parquet directly —
    everything downstream only sees the binary column."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
    )


def extract_meta(media: DataFrame) -> DataFrame:
    """Byte length + md5 digest per payload via mapInPandas (Arrow
    batches; hashing in Python is the realistic shape — real metadata
    extraction parses container headers, which no SQL builtin does)."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(len).astype("int64"),
                "digest": pdf["payload"].map(
                    lambda b: hashlib.md5(bytes(b)).hexdigest()
                ),
            })

    return media.mapInPandas(_batches, META_SCHEMA)


def decode_media(media: DataFrame) -> DataFrame:
    """Real decoder — requires an image library, absent in this
    container. Gate, don't crash at import time."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image decoding requires Pillow; use fake_decode() for the "
            "deterministic test stand-in"
        ) from exc
    raise NotImplementedError("real decode path not implemented in sandbox")


def fake_decode(media: DataFrame) -> DataFrame:
    """Deterministic decode stand-in: dimensions derived from the payload
    digest (stable across runs/partitionings). Exercises the exact
    mapInPandas schema/batch path a real decoder would use."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            digs = pdf["payload"].map(lambda b: hashlib.md5(bytes(b)).digest())
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "width": digs.map(lambda d: 16 + d[0] % 240).astype("int32"),
                "height": digs.map(lambda d: 16 + d[1] % 240).astype("int32"),
                "n_channels": digs.map(lambda d: 1 + d[2] % 4).astype("int32"),
            })

    return media.mapInPandas(_batches, DECODED_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 64,
                 max_frames: int = 8) -> DataFrame:
    """Frame sampling stand-in: treat each `every_n_bytes` slice of the
    payload as one "frame" and emit a digest per sampled frame — the
    1-to-many mapInPandas shape (one input row → N output rows) of real
    video frame extraction."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, digs = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                for i in range(min(max(len(b) // every_n_bytes, 1), max_frames)):
                    chunk = b[i * every_n_bytes:(i + 1) * every_n_bytes]
                    ids.append(mid)
                    idxs.append(i)
                    digs.append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame({
                "media_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "frame_digest": pd.Series(digs, dtype="object"),
            })

    return media.mapInPandas(_batches, FRAMES_SCHEMA)


def meta_sql(table: str = "documents", kind: str = "image") -> str:
    """DuckDB oracle for extract_meta over media_from_documents: the
    payload is the utf-8 encoding of `text`, so octet_length(encode())
    and md5(text) reproduce the Python-side values exactly."""
    return f"""
        SELECT doc_id AS media_id,
               '{kind}' AS kind,
               octet_length(encode(text)) AS n_bytes,
               md5(text) AS digest
        FROM {table}
    """


def decode_sql(table: str = "documents") -> str:
    """DuckDB oracle for fake_decode: dimensions derive from the first
    md5-digest bytes of the payload; hex-pair → int reproduces Python's
    digest[i] byte values."""
    d = f"md5({table}.text)"
    return f"""
        SELECT doc_id AS media_id,
               CAST(16 + CAST(('0x' || substr({d}, 1, 2)) AS INTEGER) % 240
                    AS INTEGER) AS width,
               CAST(16 + CAST(('0x' || substr({d}, 3, 2)) AS INTEGER) % 240
                    AS INTEGER) AS height,
               CAST(1 + CAST(('0x' || substr({d}, 5, 2)) AS INTEGER) % 4
                    AS INTEGER) AS n_channels
        FROM {table}
    """


def frames_sql(table: str = "documents", every_n_bytes: int = 64,
               max_frames: int = 8) -> str:
    """DuckDB oracle for frame_sample. The Spark side slices BYTES of the
    binary payload; this oracle slices characters — equivalent because
    the synthetic documents fixture is pure ASCII (asserted in
    tests/test_multimodal.py)."""
    n = every_n_bytes
    return f"""
        WITH f AS (
            SELECT doc_id, text,
                   unnest(generate_series(
                       0, least(greatest(length(text) // {n}, 1),
                                {max_frames}) - 1)) AS i
            FROM {table}
        )
        SELECT doc_id AS media_id,
               CAST(i AS INTEGER) AS frame_idx,
               md5(substr(text, i * {n} + 1, {n})) AS frame_digest
        FROM f
    """


#: output schema of (fake_)resize: new dims + digest of the resized
#: payload (digest as hex string — binary columns canonicalize
#: differently across engines, the audit value is the identity anyway)
RESIZED_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("resized_digest", T.StringType()),
])

#: feature-extraction dimensionality (media → embedding bridge)
FEATURE_DIM = 8

FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("features", T.ArrayType(T.DoubleType())),
])


def resize_media(media: DataFrame, width: int, height: int) -> DataFrame:
    """Real resize — requires an image library, absent in this
    container. Gate, don't crash at import time."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image resize requires Pillow; use fake_resize() for the "
            "deterministic test stand-in"
        ) from exc
    raise NotImplementedError("real resize path not implemented in sandbox")


def fake_resize(media: DataFrame, width: int = 64,
                height: int = 64) -> DataFrame:
    """Deterministic resize stand-in: the 'resized payload' is the md5 of
    (payload ‖ 'WxH'), digested again for the audit column — exercising
    the binary-in/derived-out mapInPandas shape of a real thumbnailer
    (constant target dims, per-row payload transform, no shuffle)."""

    tag = f"{width}x{height}".encode()

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "width": pd.Series([width] * len(pdf), dtype="int32"),
                "height": pd.Series([height] * len(pdf), dtype="int32"),
                "resized_digest": pdf["payload"].map(
                    lambda b: hashlib.md5(bytes(b) + tag).hexdigest()
                ),
            })

    return media.mapInPandas(_batches, RESIZED_SCHEMA)


def fake_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Feature-extraction stand-in: `dim` doubles in [0, 1] from the
    payload digest's leading byte pairs — the media → embedding bridge
    that feeds the similarity operators (`array<double>` output composes
    directly with ann_topk_* / embedding_near_dup). Values are
    round(byte/255, 6), reproducible bit-for-bit in SQL."""

    def _feat(b: bytes) -> list[float]:
        h = hashlib.md5(bytes(b)).hexdigest()
        return [round(int(h[2 * i:2 * i + 2], 16) / 255, 6)
                for i in range(dim)]

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "features": pdf["payload"].map(_feat),
            })

    return media.mapInPandas(_batches, FEATURES_SCHEMA)


def resize_sql(table: str = "documents", width: int = 64,
               height: int = 64) -> str:
    """DuckDB oracle for fake_resize: md5 of (text ‖ 'WxH') — payload is
    the utf-8 encoding of text, so string concat reproduces the bytes."""
    return f"""
        SELECT doc_id AS media_id,
               CAST({width} AS INTEGER) AS width,
               CAST({height} AS INTEGER) AS height,
               md5(text || '{width}x{height}') AS resized_digest
        FROM {table}
    """


def features_sql(table: str = "documents", dim: int = FEATURE_DIM) -> str:
    """DuckDB oracle for fake_features: hex-pair → int → round(x/255, 6),
    assembled into a list — identical float derivation as the Python
    stage (exact integer division then one rounded double divide)."""
    d = f"md5({table}.text)"
    elems = ", ".join(
        f"round(CAST(('0x' || substr({d}, {2 * i + 1}, 2)) AS INTEGER)"
        f" / 255.0, 6)"
        for i in range(dim)
    )
    return f"SELECT doc_id AS media_id, [{elems}] AS features FROM {table}"


def features_exploded_sql(table: str = "documents",
                          dim: int = FEATURE_DIM) -> str:
    """DuckDB oracle for the exploded registry shape of fake_features:
    one (media_id, dim_idx, value) row per dimension. Same float
    derivation as `features_sql`, emitted as a dim-way UNION ALL so no
    engine-specific unnest/ordinality syntax is needed — the driver's
    canonicalizer can hash plain numeric rows but not array cells."""
    d = f"md5({table}.text)"
    selects = [
        f"SELECT doc_id AS media_id, CAST({i} AS INTEGER) AS dim_idx,"
        f" round(CAST(('0x' || substr({d}, {2 * i + 1}, 2)) AS INTEGER)"
        f" / 255.0, 6) AS value FROM {table}"
        for i in range(dim)
    ]
    return " UNION ALL ".join(selects)


# ---------------------------------------------------------------------------
# Perceptual-hash dedup tier: the media twin of SimHash text dedup.
# Real pipelines compute pHash/aHash over DECODED grayscale pixels; the
# sandbox has no decoder (see module docstring), so the hash runs over
# the payload BYTE stream — the exact block-mean average-hash math and
# the exact banded-join serving shape, with bytes standing in for
# pixels (the fake_decode convention). Swapping in a real decoder only
# changes what fills the byte buffer.
# ---------------------------------------------------------------------------

_I64_MIN_WRAP = 1 << 64
_I64_SIGN = 1 << 63


def media_phash(media: DataFrame, bits: int = 64) -> DataFrame:
    """Block-mean perceptual hash (aHash) per payload: split the byte
    stream into `bits` contiguous blocks (byte j → block j·bits//L),
    set bit i (MSB-first) iff block i's mean exceeds the global mean —
    compared in EXACT integers (sum_i·L > total·n_i, no division), so
    the hash is engine- and partitioning-independent. Payloads shorter
    than `bits` bytes leave their empty blocks 0; empty payloads hash
    to 0. Output: (media_id, phash BIGINT), id-ascending upstream use.

    Near-identical payloads (a few bytes changed) flip few block means
    ⇒ small hamming distance — the property `phash_near_dup` banding
    exploits. mapInPandas (Arrow-batched numpy bincount per payload;
    no shuffle)."""
    import numpy as np

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for payload in pdf["payload"]:
                b = bytes(payload)
                L = len(b)
                h = 0
                if L:
                    v = np.frombuffer(b, dtype=np.uint8)
                    blk = (np.arange(L, dtype=np.int64) * bits) // L
                    s = np.bincount(blk, weights=v,
                                    minlength=bits).astype(np.int64)
                    n = np.bincount(blk, minlength=bits).astype(np.int64)
                    total = int(v.sum(dtype=np.int64))
                    hot = (s * L) > (total * n)
                    for i in np.nonzero(hot)[0]:
                        h |= 1 << (bits - 1 - int(i))
                    if h >= _I64_SIGN:
                        h -= _I64_MIN_WRAP
                out.append(h)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "phash": pd.array(out, dtype="int64"),
            })

    return media.mapInPandas(_batches, "media_id long, phash long")


def phash_near_dup(
    media: DataFrame,
    hamming_max: int = 7,
    num_bands: int = 8,
    bits: int = 64,
    max_bucket: int | None = None,
) -> DataFrame:
    """Perceptual near-dup media pairs: hamming-banded candidate join +
    exact popcount — the simhash_near_dup machinery on the 64-bit
    media hash. Pigeonhole-exact: hamming ≤ hamming_max < num_bands ⇒
    at least one of the num_bands equal-width bands agrees, so the
    banded equi-join has 100% recall. Output (ordered):
    media_a, media_b, hamming ≤ hamming_max.

    100 TB: identical scale story to simhash_near_dup — candidates are
    same-band pairs only (never all-pairs), one xor+bit_count per
    candidate; a hot band value is the LSH hot-bucket case, and
    `max_bucket` is the same anchor-cap valve (`dedup.fp_banded_pairs`
    — a re-encoded logo or template thumbnail repeated across a crawl
    shares ONE phash, so its bucket holds every copy in every band;
    the cap bounds that expansion to linear, every member keeping its
    anchor edges)."""
    assert num_bands > hamming_max, "pigeonhole needs num_bands > hamming_max"
    assert bits % num_bands == 0
    from .dedup import fp_banded_pairs
    width = bits // num_bands
    mask = (1 << width) - 1
    # materialize the (media_id, phash) table ONCE (round 14, guide
    # §2.4/§4): the banded self-join consumes it on BOTH sides, and
    # without the checkpoint each side re-runs the mapInPandas
    # decode+phash Python kernel over every payload — the single most
    # expensive stage in the query, executed twice for two longs per
    # row of output. localCheckpoint per the repo convention.
    ph = media_phash(media, bits=bits).localCheckpoint(eager=True)
    bands = F.explode(
        F.array(*[
            F.struct(
                F.lit(i).alias("band"),
                F.expr(f"(phash >> {i * width}) & {mask}").alias("val"),
            )
            for i in range(num_bands)
        ])
    )
    banded = ph.select("media_id", "phash", bands.alias("b")).select(
        "media_id", "phash", "b.band", "b.val")
    pairs = fp_banded_pairs(banded, "media_id", "phash",
                            max_bucket=max_bucket)
    ham = F.expr("bit_count(fp_a ^ fp_b)")
    return (
        pairs.select(F.col("media_id_a").alias("media_a"),
                     F.col("media_id_b").alias("media_b"),
                     ham.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= hamming_max)
        .orderBy("media_a", "media_b")
    )


def _phash_cte(table: str, bits: int = 64, sfx: str = "") -> str:
    """Shared DuckDB CTE chain computing (media_id, phash) from the
    documents fixture (ASCII text bytes stand in for the payload, the
    meta_sql convention). Exact-integer block means; HUGEINT bit
    assembly wrapped to signed 64-bit so xor/bit_count match Spark.
    `sfx` suffixes every CTE name so two chains (e.g. index + batch in
    phash_check_sql) can coexist in one WITH clause."""
    return f"""m{sfx} AS (
            SELECT doc_id AS media_id, text, length(text) AS L
            FROM {table}
        ),
        ch{sfx} AS (
            SELECT media_id, L,
                   ((u.j - 1) * {bits}) // L AS blk,
                   ascii(substr(text, u.j, 1)) AS v
            FROM m{sfx}, unnest(range(1, L + 1)) AS u(j)
        ),
        tot{sfx} AS (
            SELECT media_id, any_value(L) AS L, sum(v) AS total
            FROM ch{sfx} GROUP BY media_id
        ),
        bsum{sfx} AS (
            SELECT media_id, blk, sum(v) AS s, count(*) AS n
            FROM ch{sfx} GROUP BY 1, 2
        ),
        hraw{sfx} AS (
            SELECT b.media_id,
                   bit_or(CASE WHEN b.s * t.L > t.total * b.n
                          THEN (1::HUGEINT) << ({bits} - 1 - b.blk)
                          ELSE 0::HUGEINT END) AS hh
            FROM bsum{sfx} b JOIN tot{sfx} t USING (media_id)
            GROUP BY 1
        ),
        ph{sfx} AS (
            SELECT m.media_id,
                   CAST(CASE
                        WHEN hh IS NULL THEN 0::HUGEINT
                        WHEN hh >= CAST('9223372036854775808' AS HUGEINT)
                        THEN hh - CAST('18446744073709551616' AS HUGEINT)
                        ELSE hh END AS BIGINT) AS phash
            FROM m{sfx} m LEFT JOIN hraw{sfx} USING (media_id)
        )"""


def phash_sql(table: str = "documents", bits: int = 64) -> str:
    """DuckDB mirror of :func:`media_phash` over the documents fixture."""
    return f"""
        WITH {_phash_cte(table, bits)}
        SELECT media_id, phash FROM ph ORDER BY media_id
    """


def phash_near_dup_sql(
    table: str = "documents",
    hamming_max: int = 7,
    num_bands: int = 8,
    bits: int = 64,
    max_bucket: int | None = None,
) -> str:
    """DuckDB mirror of :func:`phash_near_dup` (same bands, xor +
    bit_count; `max_bucket` mirrors the anchor election bit-for-bit)."""
    from .dedup import fp_banded_pairs_sql
    width = bits // num_bands
    mask = (1 << width) - 1
    band_rows = " UNION ALL ".join(
        f"SELECT media_id, phash, {i} AS band,"
        f" (phash >> {i * width}) & {mask} AS val FROM ph"
        for i in range(num_bands)
    )
    pairs_cte = fp_banded_pairs_sql("media_id", "phash",
                                    "media_a", "media_b",
                                    max_bucket=max_bucket)
    return f"""
        WITH {_phash_cte(table, bits)},
        banded AS ({band_rows}),
        {pairs_cte}
        SELECT DISTINCT media_a, media_b,
               CAST(bit_count(xor(fp_a, fp_b)) AS INT) AS hamming
        FROM pairs
        WHERE bit_count(xor(fp_a, fp_b)) <= {hamming_max}
        ORDER BY media_a, media_b
    """


def build_phash_index(media: DataFrame, path: str, bits: int = 64) -> None:
    """Materialize the media dedup state once per corpus snapshot —
    the media tier of the incremental-index family (text LSH band
    buckets in operators/dedup.py, semantic reps in
    operators/semdedup.py): `{path}/phash` holds (media_id, phash).
    Without it every incoming batch pays a full corpus re-hash; with
    it a batch pays its own hashes + one banded equi-join."""
    media_phash(media, bits=bits).write.mode("overwrite").parquet(
        f"{path}/phash")
    ledger.reset_manifest_if_present(path, "phash")


def read_phash_index(spark, path: str) -> DataFrame:
    """The index's (media_id, phash) table = union of the manifest's
    committed dirs (`index_ledger.committed_union`); a pre-manifest
    (legacy) index reads as the single `phash` dir."""
    return ledger.committed_union(spark, path, "phash")


def update_phash_index(
    media: DataFrame,
    path: str,
    bits: int = 64,
    batch_id: int | str | None = None,
    stream_id: str | None = None,
) -> bool:
    """Append newly admitted media payloads' perceptual hashes into
    the index — the gate-learns step for the media tier, completing
    ledger parity across all four incremental index families (ANN
    lists r12; text bands + shingles r13; phash here). With
    `batch_id` (a foreachBatch epoch id) the append commits through
    the exactly-once manifest ledger (`operators/index_ledger`):
    replays no-op in O(1) metadata without re-hashing the batch, and
    the delta dir is invisible until the atomic swap. New hashes are
    anti-joined on media_id against the committed union first (id
    identity — the dedup-axis value layer; duplicate phash rows would
    be harmless to `phash_check`'s min-match but bloat the scan).
    Without ids, legacy value-converged append into the base `phash`
    dir. Returns True if applied, False on a replay no-op."""
    spark = media.sparkSession

    def _new_rows() -> DataFrame:
        existing = read_phash_index(spark, path).select("media_id")
        return (
            media_phash(media, bits=bits)
            .join(existing, "media_id", "left_anti")
            .localCheckpoint(eager=True)
        )

    def _write(delta_path: str) -> bool:
        rows = _new_rows()
        if rows.isEmpty():
            return False
        rows.write.mode("overwrite").parquet(delta_path)
        return True

    if batch_id is None and stream_id is None:
        # legacy no-id path: on a MANIFESTED index route through an
        # unguarded ledger commit — after a compaction the base dir is
        # no longer in the manifest and a raw append there would be
        # permanently invisible to readers (r13 review)
        if os.path.exists(os.path.join(path, ledger.MANIFEST)):
            return ledger.ledger_append(path, "phash", "phash_delta",
                                        _write)
        _new_rows().write.mode("append").parquet(f"{path}/phash")
        return True

    return ledger.ledger_append(path, "phash", "phash_delta", _write,
                                batch_id, stream_id)


def compact_phash_index(spark, path: str, gc: bool = True) -> None:
    """Fold accumulated phash delta dirs back into one
    (`index_ledger.compact`: snapshot-scoped, late deltas carried,
    ledgers kept; `gc=False` defers folded-dir deletion to
    `vacuum_phash_index`, the serving-safe mode)."""

    def _rewrite(union: DataFrame, new_path: str) -> None:
        union.write.mode("overwrite").parquet(new_path)

    ledger.compact(spark, path, "phash", "phash_compact", _rewrite,
                   gc=gc)


def vacuum_phash_index(path: str, grace_secs: float = 86400.0
                       ) -> list[str]:
    """Delete crash-orphaned phash delta/compact dirs older than the
    grace lease (`index_ledger.vacuum`; lease rule documented there)."""
    return ledger.vacuum(path, "phash",
                         ("phash_delta_", "phash_compact_"), grace_secs)


def phash_check(
    spark,
    batch: DataFrame,
    index_path: str,
    hamming_max: int = 7,
    num_bands: int = 8,
    bits: int = 64,
    max_bucket: int | None = None,
) -> DataFrame:
    """Check an incoming media batch against the materialized
    perceptual-hash index WITHOUT rescanning the corpus: hash the
    batch payloads, band both sides, equi-join on (band, val), exact
    popcount ≤ hamming_max. Pigeonhole recall holds exactly as in
    `phash_near_dup`. Output (media_id-ascending): media_id, is_dup,
    match_id — match_id the SMALLEST matching stored id (NULL when
    novel). Contract: batch ids disjoint from stored ids (the
    semdedup_check convention).

    100 TB: batch-sized hashing + a banded equi-join against the
    stored table — per-batch cost independent of corpus size once the
    index is bucketed/partitioned by band value. `max_bucket` is the
    serve-time face of the hot-bucket anchor cap (`dedup_check`'s
    twin on the media tier): a stored template/logo bucket holding b
    copies makes every probe landing there enumerate b rows; with
    the cap each probe meets only the bucket's c md5-elected anchors
    (identical machinery and rank as `dedup.fp_banded_pairs`,
    mirrored bit-for-bit by the oracle). For a byte-identical stored
    clique the verdict is unchanged (hamming 0 against every
    anchor); a near-dup within hamming_max of only NON-anchors can
    slip through — the same documented approximation as the
    pair-generation cap, priced by the bucket-size audits. With the
    cap, `match_id` is the smallest matching ANCHOR id."""
    assert num_bands > hamming_max
    width = bits // num_bands
    mask = (1 << width) - 1
    bands = F.explode(
        F.array(*[
            F.struct(
                F.lit(i).alias("band"),
                F.expr(f"(phash >> {i * width}) & {mask}").alias("val"),
            )
            for i in range(num_bands)
        ])
    )
    bp = media_phash(batch, bits=bits)
    banded_b = bp.select("media_id", "phash", bands.alias("b")).select(
        F.col("media_id"), F.col("phash").alias("ph_b"),
        "b.band", "b.val")
    idx = read_phash_index(spark, index_path)
    banded_i = idx.select("media_id", "phash", bands.alias("b")).select(
        F.col("media_id").alias("stored_id"),
        F.col("phash").alias("ph_i"), "b.band", "b.val")
    if max_bucket is not None:
        from pyspark.sql.window import Window
        rank = F.md5(F.concat_ws("|", F.col("band"), F.col("val"),
                                 F.col("stored_id")))
        w = (Window.partitionBy("band", "val")
             .orderBy(rank.asc(), F.col("stored_id").asc()))
        banded_i = (
            banded_i.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= max_bucket)
            .drop("_rk")
        )
    hits = (
        banded_b.join(banded_i, ["band", "val"])
        .filter(F.expr(f"bit_count(ph_b ^ ph_i) <= {hamming_max}"))
        .groupBy("media_id")
        .agg(F.min("stored_id").alias("match_id"))
    )
    return (
        bp.select("media_id").join(hits, "media_id", "left")
        .select("media_id",
                F.col("match_id").isNotNull().alias("is_dup"),
                "match_id")
        .orderBy("media_id")
    )


def phash_check_sql(
    table: str = "documents",
    corpus_pred: str = "doc_id < 1000000",
    batch_sql: str | None = None,
    hamming_max: int = 7,
    num_bands: int = 8,
    bits: int = 64,
    max_bucket: int | None = None,
) -> str:
    """DuckDB mirror of :func:`phash_check`: the index side is
    `{table}` rows matching `corpus_pred`; the batch side is
    `batch_sql` (a query producing (doc_id, text); defaults to the
    non-corpus rows). Both recomputed from scratch — the
    dedup_check_batch oracle pattern. `max_bucket` mirrors the
    index-side anchor election bit-for-bit."""
    width = bits // num_bands
    mask = (1 << width) - 1
    if batch_sql is None:
        batch_sql = (f"SELECT doc_id, text FROM {table}"
                     f" WHERE NOT ({corpus_pred})")
    band_rows = " UNION ALL ".join(
        f"SELECT media_id, phash, {i} AS band,"
        f" (phash >> {i * width}) & {mask} AS val FROM {{src}}"
        for i in range(num_bands)
    )
    idx_cte = _phash_cte(
        f"(SELECT doc_id, text FROM {table} WHERE {corpus_pred}) corpus",
        bits)
    batch_cte = _phash_cte(f"({batch_sql}) batch", bits, sfx="2")
    bi_body = band_rows.format(src="ph")
    if max_bucket is not None:
        bi_body = f"""SELECT media_id, phash, band, val FROM (
                SELECT raw.*, row_number() OVER (
                    PARTITION BY band, val
                    ORDER BY md5(concat_ws('|', band, val, media_id)),
                             media_id) AS _rk
                FROM ({bi_body}) raw)
            WHERE _rk <= {int(max_bucket)}"""
    return f"""
        WITH {idx_cte},
        {batch_cte},
        bb AS ({band_rows.format(src="ph2")}),
        bi AS ({bi_body}),
        hits AS (
            SELECT b.media_id, min(i.media_id) AS match_id
            FROM bb b JOIN bi i ON b.band = i.band AND b.val = i.val
            WHERE bit_count(xor(b.phash, i.phash)) <= {hamming_max}
            GROUP BY 1
        )
        SELECT p.media_id, h.match_id IS NOT NULL AS is_dup, h.match_id
        FROM ph2 p LEFT JOIN hits h ON h.media_id = p.media_id
        ORDER BY 1
    """
