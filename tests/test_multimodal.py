"""Multimodal plumbing tests: Arrow batch shape, 1-to-many frame
sampling, gated real decoder, deterministic fake decode."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from explora_kafka_spark.operators import multimodal as M

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return M.media_from_documents(docs)


def test_payload_is_binary(media):
    assert dict(media.dtypes)["payload"] == "binary"


def test_extract_meta_values(spark, media):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = {r.media_id: (r.n_bytes, r.digest) for r in M.extract_meta(media).collect()}
    want = {
        r.doc_id: (r.n_bytes, r.digest)
        for r in docs.select(
            "doc_id",
            F.length(F.encode("text", "UTF-8")).alias("n_bytes"),
            F.md5(F.encode("text", "UTF-8")).alias("digest"),
        ).collect()
    }
    assert got == want


def test_extract_meta_respects_arrow_batch_size(spark, media):
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "32")
    try:
        assert M.extract_meta(media).count() == media.count()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")


def test_fake_decode_deterministic_and_bounded(media):
    a = {r.media_id: (r.width, r.height, r.n_channels)
         for r in M.fake_decode(media).collect()}
    b = {r.media_id: (r.width, r.height, r.n_channels)
         for r in M.fake_decode(media.repartition(7)).collect()}
    assert a == b
    for w, h, c in a.values():
        assert 16 <= w < 256 and 16 <= h < 256 and 1 <= c <= 4


def test_real_decode_is_gated(media):
    with pytest.raises(NotImplementedError):
        M.decode_media(media)


def test_frame_sample_one_to_many(media):
    frames = M.frame_sample(media, every_n_bytes=64, max_frames=8)
    rows = frames.collect()
    per_media: dict[int, list[int]] = {}
    for r in rows:
        per_media.setdefault(r.media_id, []).append(r.frame_idx)
    n_media = media.count()
    assert len(per_media) == n_media
    assert len(rows) > n_media  # genuinely 1-to-many
    for idxs in per_media.values():
        assert sorted(idxs) == list(range(len(idxs)))
        assert 1 <= len(idxs) <= 8


def test_documents_fixture_is_ascii(spark):
    """frames_sql/decode_sql oracles slice VARCHAR characters while the
    Spark operators slice payload BYTES — equivalent only while the
    documents fixture is pure ASCII. Guard that oracle assumption."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    assert docs.filter(F.octet_length("text") != F.length("text")).count() == 0


def test_fake_resize_deterministic_and_shaped(spark, media):
    out = M.fake_resize(media, width=32, height=48)
    rows = out.collect()
    assert len(rows) == media.count()
    assert all(r.width == 32 and r.height == 48 for r in rows)
    # deterministic under repartition
    again = {(r.media_id, r.resized_digest)
             for r in M.fake_resize(media.repartition(7), 32, 48).collect()}
    assert again == {(r.media_id, r.resized_digest) for r in rows}


def test_fake_features_bounded_and_composable(spark, media):
    out = M.fake_features(media)
    rows = out.collect()
    assert all(len(r.features) == M.FEATURE_DIM for r in rows)
    assert all(0.0 <= v <= 1.0 for r in rows for v in r.features)
    # the media -> embedding bridge: output schema composes with the
    # similarity operators' expected (id, array<double>) shape
    assert dict(out.dtypes)["features"] == "array<double>"


def test_resize_media_gated_without_pillow(media):
    import importlib.util
    if importlib.util.find_spec("PIL") is not None:
        pytest.skip("Pillow present; gate not exercisable")
    with pytest.raises(NotImplementedError):
        M.resize_media(media, 64, 64)


def _media_of(spark, rows):
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    return M.media_from_documents(docs)


def test_media_phash_hand_computed(spark):
    # 8 bytes, bits=8 -> one byte per block: bit i set iff byte i > mean.
    # 'aaaazzzz': mean between 'a'(97) and 'z'(122) -> hash 00001111
    media = _media_of(spark, [(1, "aaaazzzz")])
    [r] = M.media_phash(media, bits=8).collect()
    assert r["phash"] == 0b00001111
    # uniform payload: no block exceeds the mean -> 0
    media = _media_of(spark, [(2, "bbbbbbbb")])
    [r] = M.media_phash(media, bits=8).collect()
    assert r["phash"] == 0


def test_media_phash_sign_bit_and_determinism(spark):
    # first block hottest -> MSB set -> negative signed 64-bit hash
    media = _media_of(spark, [(1, "z" * 8 + "a" * 504)])
    [r] = M.media_phash(media).collect()
    assert r["phash"] < 0
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    a = sorted(map(tuple, M.media_phash(
        M.media_from_documents(docs)).collect()))
    b = sorted(map(tuple, M.media_phash(
        M.media_from_documents(docs.repartition(7))).collect()))
    assert a == b


def test_phash_near_dup_finds_perturbed_twin(spark):
    base = "the quick brown fox jumps over the lazy dog " * 12
    rows = [(1, base), (2, "zzz" + base[3:]),      # few-byte twin
            (3, "".join(reversed(base)))]           # scrambled
    out = M.phash_near_dup(_media_of(spark, rows)).collect()
    pairs = {(r.media_a, r.media_b): r.hamming for r in out}
    assert (1, 2) in pairs, pairs
    assert pairs[(1, 2)] <= 7
    # identical payloads always pair at hamming 0 (pigeonhole recall)
    out2 = M.phash_near_dup(_media_of(spark, [(1, base), (2, base)])).collect()
    assert [(r.media_a, r.media_b, r.hamming) for r in out2] == [(1, 2, 0)]


def test_phash_check_flags_twins_passes_novel(spark, tmp_path):
    base = "the quick brown fox jumps over the lazy dog " * 12
    corpus = _media_of(spark, [(1, base), (2, "completely different text "
                                              * 20)])
    M.build_phash_index(corpus, str(tmp_path / "idx"))
    batch = _media_of(spark, [
        (100, "zzz" + base[3:]),                # twin of 1 -> dup
        (101, "".join(reversed(base))),         # scrambled -> novel
    ])
    out = {r.media_id: (r.is_dup, r.match_id)
           for r in M.phash_check(spark, batch,
                                  str(tmp_path / "idx")).collect()}
    assert out[100] == (True, 1)
    assert out[101] == (False, None)
