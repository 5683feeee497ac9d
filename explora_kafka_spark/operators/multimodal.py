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
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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
