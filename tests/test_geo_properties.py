"""Property-based parity tests (hypothesis): the native Column
expressions, the pure-Python codecs, and the SQL oracle fragments must
agree on arbitrary inputs — these three implementations are the engine's
correctness triangle for geo keys."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from explora_kafka_spark.functions import geo

# Mercator-safe domain; stay off exact cell boundaries (float paths may
# differ by 1 ulp exactly on an edge, flipping the floor)
lat_s = st.floats(min_value=-84.9, max_value=84.9,
                  allow_nan=False, allow_infinity=False)
lon_s = st.floats(min_value=-179.9, max_value=179.9,
                  allow_nan=False, allow_infinity=False)


@settings(max_examples=30, deadline=None)
@given(lat=lat_s, lon=lon_s, zoom=st.integers(min_value=1, max_value=14))
def test_quadkey_sql_matches_pure(lat, lon, zoom):
    # CAST: a bare high-precision literal parses as DECIMAL in DuckDB and
    # overflows on +180; the engine always feeds DOUBLE columns
    sql = geo.quadkey_sql(f"CAST({lat!r} AS DOUBLE)",
                          f"CAST({lon!r} AS DOUBLE)", zoom)
    got = duckdb.sql(f"SELECT {sql}").fetchone()[0]
    assert got == geo.quadkey(lat, lon, zoom)


@settings(max_examples=30, deadline=None)
@given(lat=lat_s, lon=lon_s, precision=st.integers(min_value=1, max_value=9))
def test_geohash_sql_matches_pure(lat, lon, precision):
    sql = geo.geohash_sql(f"CAST({lat!r} AS DOUBLE)",
                          f"CAST({lon!r} AS DOUBLE)", precision)
    got = duckdb.sql(f"SELECT {sql}").fetchone()[0]
    assert got == geo.geohash_encode(lat, lon, precision)


@settings(max_examples=30, deadline=None)
@given(lat=lat_s, lon=lon_s, precision=st.integers(min_value=1, max_value=9))
def test_geohash_decode_roundtrip(lat, lon, precision):
    gh = geo.geohash_encode(lat, lon, precision)
    lat_lo, lat_hi, lon_lo, lon_hi = geo.geohash_decode_bbox(gh)
    # scaled-multiply encoding absorbs sub-ulp offsets near cell edges
    # (90.0 + 2e-16 == 90.0), so containment holds to float epsilon
    tol = 1e-9
    assert lat_lo - tol <= lat <= lat_hi + tol
    assert lon_lo - tol <= lon <= lon_hi + tol


@settings(max_examples=20, deadline=None)
@given(
    s=st.floats(min_value=-60, max_value=50, allow_nan=False),
    w=st.floats(min_value=-170, max_value=160, allow_nan=False),
    dlat=st.floats(min_value=0.1, max_value=20, allow_nan=False),
    dlon=st.floats(min_value=0.1, max_value=20, allow_nan=False),
    zoom=st.integers(min_value=3, max_value=8),
)
def test_quadkey_cover_contains_interior_points(s, w, dlat, dlon, zoom):
    n, e = s + dlat, w + dlon
    cover = set(geo.quadkey_cover_bbox(n, w, s, e, zoom))
    assert geo.quadkey_cover_size(n, w, s, e, zoom) == len(cover)
    # the center of the bbox must be covered
    assert geo.quadkey((s + n) / 2, (w + e) / 2, zoom) in cover


def test_column_exprs_match_pure_on_batch(spark):
    """One Spark job covering many random points (cheaper than a job per
    hypothesis example): Column-built quadkeys/geohashes == pure Python."""
    import random

    rng = random.Random(42)
    rows = [
        (i, rng.uniform(-84.9, 84.9), rng.uniform(-179.9, 179.9))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "id long, lat double, lon double")
    got = {
        r.id: (r.qk, r.gh)
        for r in df.select(
            "id",
            geo.quadkey_from_latlon_col(F.col("lat"), F.col("lon"), 12).alias("qk"),
            geo.geohash_col(F.col("lat"), F.col("lon"), 7).alias("gh"),
        ).collect()
    }
    for i, lat, lon in rows:
        assert got[i][0] == geo.quadkey(lat, lon, 12), (lat, lon)
        assert got[i][1] == geo.geohash_encode(lat, lon, 7), (lat, lon)


@settings(max_examples=25, deadline=None)
@given(
    s=st.floats(min_value=-60, max_value=50, allow_nan=False),
    w=st.floats(min_value=-170, max_value=160, allow_nan=False),
    dlat=st.floats(min_value=0.5, max_value=40, allow_nan=False),
    dlon=st.floats(min_value=0.5, max_value=40, allow_nan=False),
)
def test_compress_cover_membership_equivalence(s, w, dlat, dlon):
    """compress_cover output must decide membership identically to the
    enumerated cover: cell ∈ cover ⇔ some compressed prefix prefixes it —
    on cover members, perturbed neighbours, and far-away cells."""
    n, e = min(s + dlat, 85.0), min(w + dlon, 179.9)
    for alphabet, cover_fn, grain in (
        (geo.QUAD_ALPHABET, geo.quadkey_cover_bbox, 6),
        (geo.GEOHASH_ALPHABET, geo.geohash_cover_bbox, 3),
    ):
        cover = cover_fn(n, w, s, e, grain)
        comp = geo.compress_cover(cover, alphabet)
        full = set(cover)

        def member(c):
            return any(c.startswith(p) for p in comp)

        # exact partition: all members match, and compression never grows
        assert all(member(c) for c in cover)
        assert len(comp) <= len(cover)
        # non-members (flip last char to something outside the sibling set
        # only when the parent family was NOT complete) must not match
        probe = cover[:: max(1, len(cover) // 50)]
        for c in probe:
            for ch in alphabet:
                cand = c[:-1] + ch
                assert member(cand) == (cand in full)
