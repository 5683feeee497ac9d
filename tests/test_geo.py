"""Golden tests for the pure geo module (semantics pinned by
/root/reference/src/main/java/util/QuadHash.java and the public geohash spec)."""

import math

from explora_kafka_spark.functions import geo

# Antwerp load-test bbox (sim_api_load.sh:2): N, W, S, E
ANTWERP = (51.311646, 4.306641, 51.168823, 4.504395)


def test_tile_known_values():
    # Antwerp city center; cross-checked against the asinh form of the OSM
    # slippy-map formula (tile row 5469 spans lat 51.2069..51.2206).
    assert geo.latlon_to_tile(51.2194, 4.4025, 14) == (8392, 5469)
    # the equator/prime-meridian boundary belongs to the south-east tile
    assert geo.latlon_to_tile(0.0, 0.0, 1) == (1, 1)
    assert geo.latlon_to_tile(0.0001, 0.0001, 1) == (1, 0)
    assert geo.latlon_to_tile(-0.0001, -0.0001, 1) == (0, 1)
    # zoom 0: whole world is tile (0, 0)
    assert geo.latlon_to_tile(51.2194, 4.4025, 0) == (0, 0)


def test_quadkey_interleave():
    # From the Bing tile-system spec: tile (3, 5) @ zoom 3 → "213"
    assert geo.tile_to_quadkey(3, 5, 3) == "213"
    assert geo.tile_to_quadkey(0, 0, 3) == "000"
    assert geo.tile_to_quadkey(7, 7, 3) == "333"
    # digit = xbit + 2*ybit, MSB first
    assert geo.tile_to_quadkey(1, 0, 1) == "1"
    assert geo.tile_to_quadkey(0, 1, 1) == "2"


def test_quadkey_roundtrip_tile_bits():
    x, y, zoom = 8392, 5467, 14
    qk = geo.tile_to_quadkey(x, y, zoom)
    assert len(qk) == zoom
    rx = ry = 0
    for c in qk:
        d = int(c)
        rx = (rx << 1) | (d & 1)
        ry = (ry << 1) | (d >> 1)
    assert (rx, ry) == (x, y)


def test_quadkey_cover_bbox_antwerp():
    n, w, s, e = ANTWERP
    cover = geo.quadkey_cover_bbox(n, w, s, e, 14)
    # expected grid size from the tile corners
    min_x, min_y = geo.latlon_to_tile(s, w, 14)
    max_x, max_y = geo.latlon_to_tile(n, e, 14)
    assert len(cover) == (max_x - min_x + 1) * (min_y - max_y + 1)
    assert cover == sorted(cover)
    assert len(set(cover)) == len(cover)
    # every member tile's centroid quadkey is in the cover
    assert geo.quadkey(51.24, 4.40, 14) in cover


def test_cover_single_tile():
    # degenerate bbox → exactly the containing tile
    cover = geo.quadkey_cover_bbox(51.2194, 4.4025, 51.2194, 4.4025, 14)
    assert cover == [geo.tile_to_quadkey(8392, 5469, 14)]


def test_geohash_known_values():
    # Public geohash test vectors
    assert geo.geohash_encode(57.64911, 10.40744, 11) == "u4pruydqqvj"
    assert geo.geohash_encode(42.6, -5.6, 5) == "ezs42"
    lat, lon = geo.geohash_decode("ezs42")
    assert abs(lat - 42.60498) < 0.022
    assert abs(lon - (-5.60303)) < 0.044


def test_geohash_roundtrip():
    for lat, lon in [(51.2194, 4.4025), (-33.86, 151.21), (0.0, 0.0), (89.9, -179.9)]:
        gh = geo.geohash_encode(lat, lon, 12)
        dlat, dlon = geo.geohash_decode(gh)
        assert abs(dlat - lat) < 1e-6
        assert abs(dlon - lon) < 1e-6


def test_geohash_children():
    kids = geo.geohash_children("u4pr", 5)
    assert len(kids) == 32
    assert all(k.startswith("u4pr") and len(k) == 5 for k in kids)
    assert kids == sorted(kids)
    assert geo.geohash_children("u4pruydqqvjb", 5) == ["u4pru"]


def test_geohash_cover_bbox_antwerp():
    n, w, s, e = ANTWERP
    cover = geo.geohash_cover_bbox(n, w, s, e, 5)
    assert cover == sorted(cover)
    # every corner + center cell present
    for lat, lon in [(n, w), (n, e), (s, w), (s, e), ((n + s) / 2, (w + e) / 2)]:
        assert geo.geohash_encode(lat, lon, 5) in cover
    # no cell entirely outside the bbox
    for gh in cover:
        lat_lo, lat_hi, lon_lo, lon_hi = geo.geohash_decode_bbox(gh)
        assert lat_hi >= s and lat_lo <= n and lon_hi >= w and lon_lo <= e


def test_quadkey_column_matches_pure(spark):
    """Native bit-arithmetic Column == pure-Python quadkey, row by row."""
    from pyspark.sql import functions as F
    rows = [(51.2194, 4.4025), (51.17, 4.31), (-33.86, 151.21), (40.0, -74.0), (0.1, 0.1)]
    df = spark.createDataFrame(rows, "lat double, lon double")
    got = (
        df.withColumn("qk", geo.quadkey_from_latlon_col(F.col("lat"), F.col("lon"), 14))
        .select("lat", "lon", "qk")
        .collect()
    )
    for r in got:
        assert r.qk == geo.quadkey(r.lat, r.lon, 14), (r.lat, r.lon)


def test_quadkey_decode_bbox_roundtrip():
    for qk in ["0", "3", "0231", "123123", "333333"]:
        n, w, s, e = geo.quadkey_decode_bbox(qk)
        assert n > s and e > w
        assert geo.quadkey((n + s) / 2, (w + e) / 2, len(qk)) == qk


def test_circle_cover_is_conservative_and_tight():
    import math
    import random

    lat, lon, r = 10.0, 20.0, 2_000_000.0
    cov = set(geo.quadkey_cover_circle(lat, lon, r, 6))
    assert geo.quadkey(lat, lon, 6) in cov
    assert geo.quadkey(-lat, lon + 160.0, 6) not in cov
    # every sampled point inside the circle lands in a covered tile
    rng = random.Random(11)
    for _ in range(200):
        brg, frac = rng.uniform(0, 2 * math.pi), rng.uniform(0, 1)
        d = r * frac
        plat = lat + math.degrees(d * math.cos(brg) / geo.EARTH_RADIUS_M)
        plon = lon + math.degrees(
            d * math.sin(brg)
            / (geo.EARTH_RADIUS_M * math.cos(math.radians(lat)))
        )
        if geo.haversine_m(lat, lon, plat, plon) <= r:
            assert geo.quadkey(plat, plon, 6) in cov
    # tight: every kept tile actually touches the circle
    for qk in cov:
        assert geo.bbox_min_dist_m(geo.quadkey_decode_bbox(qk), lat, lon) <= r
    # the refinement really prunes: cover < full bbox cover
    bbox_cover = geo.quadkey_cover_bbox(*geo.circle_bbox(lat, lon, r), 6)
    assert len(cov) < len(bbox_cover)


def test_geohash_circle_cover_contains_center_and_prunes():
    lat, lon, r = 10.0, 20.0, 2_000_000.0
    cov = geo.geohash_cover_circle(lat, lon, r, 3)
    assert geo.geohash_encode(lat, lon, 3) in cov
    bbox_cover = geo.geohash_cover_bbox(*geo.circle_bbox(lat, lon, r), 3)
    assert len(cov) < len(bbox_cover)


def test_circle_bboxes_split_at_antimeridian():
    import math

    boxes = geo.circle_bboxes(10.0, 179.5, 100_000.0)
    assert len(boxes) == 2
    # the two boxes jointly span the circle's longitude range on both sides
    (n1, w1, s1, e1), (n2, w2, s2, e2) = boxes
    assert e1 >= 180.0 - 1e-6 and w2 == -180.0
    assert n1 == n2 and s1 == s2
    # non-wrapping circles still produce one box (and circle_bbox works)
    assert len(geo.circle_bboxes(10.0, 20.0, 100_000.0)) == 1
    geo.circle_bbox(10.0, 20.0, 100_000.0)
    try:
        geo.circle_bbox(10.0, 179.5, 100_000.0)
        raise AssertionError("expected ValueError on wrapping circle")
    except ValueError:
        pass
    # pole-reaching circle degrades to one full-longitude band
    (bn, bw, bs, be), = geo.circle_bboxes(89.0, 0.0, 300_000.0)
    assert bw == -180.0 and be > 179.0
    assert math.isclose(bn, 90.0)


def test_antimeridian_circle_cover_is_conservative():
    """ADVICE r6 medium: points within radius on the FAR side of ±180 must
    land in a covered cell (the old single clamped bbox dropped them)."""
    import math
    import random

    lat, lon, r = 10.0, 179.5, 300_000.0
    qcov = set(geo.quadkey_cover_circle(lat, lon, r, 6))
    gcov = set(geo.geohash_cover_circle(lat, lon, r, 3))
    rng = random.Random(7)
    for _ in range(300):
        brg, frac = rng.uniform(0, 2 * math.pi), rng.uniform(0, 1)
        d = r * frac
        plat = lat + math.degrees(d * math.cos(brg) / geo.EARTH_RADIUS_M)
        plon = lon + math.degrees(
            d * math.sin(brg)
            / (geo.EARTH_RADIUS_M * math.cos(math.radians(lat)))
        )
        if plon > 180.0:
            plon -= 360.0
        if geo.haversine_m(lat, lon, plat, plon) <= r:
            assert geo.quadkey(plat, plon, 6) in qcov, (plat, plon)
            assert geo.geohash_encode(plat, plon, 3) in gcov, (plat, plon)
    # far-side cells genuinely present (the old behavior had none)
    assert any(q in qcov for q in {geo.quadkey(10.0, -179.9, 6)})
    assert geo.geohash_encode(10.0, -179.9, 3) in gcov


def test_polar_circle_cover_full_longitude_band():
    """A circle enclosing the pole must cover every longitude at its
    latitudes (geohash mode; quad clamps to the Mercator domain)."""
    lat, r = 88.0, 400_000.0  # encloses the north pole (dlat ≈ 3.6°)
    gcov = set(geo.geohash_cover_circle(lat, 0.0, r, 2))
    for plon in (-179.0, -90.0, 0.0, 90.0, 179.0):
        # points at the circle's own latitude all around the pole are
        # within r of the center? no — only those near it; test points
        # NEAR the pole instead, which every such circle contains
        assert geo.geohash_encode(89.5, plon, 2) in gcov, plon


def test_bbox_min_dist_exact_meridian_foot():
    """ADVICE r6 low: at high latitude the perpendicular foot to a
    meridian edge sits poleward of the point's own latitude; the exact
    distance must be <= the old clamped-point haversine and must not
    prune an intersecting tile."""
    # point at 70N, tile edge 10 degrees of longitude away
    bbox = (75.0, 30.0, 65.0, 40.0)  # (north, west, south, east)
    lat, lon = 70.0, 20.0
    exact = geo.bbox_min_dist_m(bbox, lat, lon)
    clamped = geo.haversine_m(lat, lon, 70.0, 30.0)
    assert exact <= clamped
    # brute-force check against a dense sample of the bbox boundary
    import math
    best = float("inf")
    for i in range(2001):
        t = i / 2000
        for pt in (
            (65.0 + 10.0 * t, 30.0), (65.0 + 10.0 * t, 40.0),
            (65.0, 30.0 + 10.0 * t), (75.0, 30.0 + 10.0 * t),
        ):
            best = min(best, geo.haversine_m(lat, lon, *pt))
    assert math.isclose(exact, best, rel_tol=1e-6, abs_tol=5.0)


def test_bbox_min_dist_wraps_longitude():
    """Tile just across the antimeridian: nearest edge is the ±180 line,
    not the tile's far edge."""
    bbox = (11.0, -180.0, 9.0, -179.8)
    d = geo.bbox_min_dist_m(bbox, 10.0, 179.5)
    # 0.5 degrees of longitude at lat 10 ≈ 54.8 km; the old unwrapped
    # clamp gave ~0.7 degrees (to the -179.8 edge). The exact min is the
    # cross-track distance — at most the same-latitude arc, and within a
    # fraction of a permille of it for this tiny offset.
    same_lat = geo.haversine_m(10.0, 179.5, 10.0, -180.0)
    assert d <= same_lat and d > 0.999 * same_lat
    assert geo.bbox_min_dist_m(bbox, 10.0, -179.9) == 0.0


# ---------------------------------------------------------------------------
# polygon covers
# ---------------------------------------------------------------------------


def test_point_in_polygon_basics():
    from explora_kafka_spark.functions import geo

    square = [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)]
    assert geo.point_in_polygon(5.0, 5.0, square)
    assert not geo.point_in_polygon(15.0, 5.0, square)
    assert not geo.point_in_polygon(-1.0, 5.0, square)
    # concave "C": the notch is outside
    cshape = [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (8.0, 10.0),
              (8.0, 2.0), (2.0, 2.0), (2.0, 10.0), (0.0, 10.0)]
    assert not geo.point_in_polygon(5.0, 6.0, cshape)   # inside the notch
    assert geo.point_in_polygon(1.0, 5.0, cshape)       # in the left arm


def test_polygon_box_intersection_cases():
    from explora_kafka_spark.functions import geo

    tri = [(0.0, 0.0), (10.0, 0.0), (0.0, 10.0)]
    # box fully inside the triangle
    assert geo.polygon_intersects_bbox(tri, 3.0, 1.0, 1.0, 3.0)
    # polygon fully inside the box
    assert geo.polygon_intersects_bbox(tri, 50.0, -50.0, -50.0, 50.0)
    # edge passes through a box containing no vertex of either
    assert geo.polygon_intersects_bbox(tri, 6.0, 3.0, 4.0, 7.0)
    # clearly disjoint
    assert not geo.polygon_intersects_bbox(tri, 30.0, 30.0, 20.0, 40.0)
    # box beyond the hypotenuse (bbox overlaps, geometry doesn't)
    assert not geo.polygon_intersects_bbox(tri, 9.5, 8.0, 8.0, 9.5)


def test_polygon_cover_subset_of_bbox_cover_and_rect_equivalence():
    from explora_kafka_spark.functions import geo

    poly = [(25.0, 5.0), (30.0, 20.0), (25.0, 35.0),
            (-5.0, 30.0), (-10.0, 20.0), (-5.0, 10.0)]
    pc = set(geo.quadkey_cover_polygon(poly, 6))
    n, w, s, e = geo.polygon_bbox(poly)
    bc = set(geo.quadkey_cover_bbox(n, w, s, e, 6))
    assert pc and pc <= bc and pc != bc  # the hexagon trims corners
    # a rectangle-as-polygon covers exactly like the bbox cover
    rect = [(s, w), (s, e), (n, e), (n, w)]
    assert set(geo.quadkey_cover_polygon(rect, 6)) == bc
    gc = set(geo.geohash_cover_polygon(poly, 3))
    gb = set(geo.geohash_cover_bbox(n, w, s, e, 3))
    assert gc and gc <= gb


def test_polygon_cover_is_conservative_for_interior_points():
    """Every interior probe point's cell is in the cover (no false
    pruning) — the containment contract the query path relies on."""
    from explora_kafka_spark.functions import geo

    poly = [(25.0, 5.0), (30.0, 20.0), (25.0, 35.0),
            (-5.0, 30.0), (-10.0, 20.0), (-5.0, 10.0)]
    cover = set(geo.quadkey_cover_polygon(poly, 8))
    ghc = set(geo.geohash_cover_polygon(poly, 4))
    import random

    rng = random.Random(42)
    hits = 0
    for _ in range(300):
        la = rng.uniform(-10.0, 30.0)
        lo = rng.uniform(5.0, 35.0)
        if not geo.point_in_polygon(la, lo, poly):
            continue
        hits += 1
        assert geo.tile_to_quadkey(*geo.latlon_to_tile(la, lo, 8), 8) \
            in cover
        assert geo.geohash_encode(la, lo, 4) in ghc
    assert hits > 50


def test_segment_box_distance_cases():
    from explora_kafka_spark.functions import geo

    k = 1.0  # equatorial scale: degrees are isotropic
    box = (1.0, 10.0, 0.0, 11.0)  # north, west, south, east
    # segment crossing the box -> 0
    assert geo.segment_box_dist_m((0.5, 9.0), (0.5, 12.0), *box, k) == 0.0
    # endpoint inside -> 0
    assert geo.segment_box_dist_m((0.5, 10.5), (5.0, 10.5), *box, k) == 0.0
    # horizontal segment 1 degree north of the box: distance = 1 degree
    d = geo.segment_box_dist_m((2.0, 9.0), (2.0, 12.0), *box, k)
    assert abs(d - geo._M_PER_DEG) < 1e-6
    # diagonal approach to a corner: sqrt(2)/2 degree to the (1, 11) corner
    d = geo.segment_box_dist_m((2.0, 12.0), (1.5, 11.5), *box, k)
    want = geo._M_PER_DEG * (0.5 ** 2 + 0.5 ** 2) ** 0.5
    assert abs(d - want) < 1e-6


def test_route_cover_is_conservative_for_corridor_points():
    """Every probe point within the corridor radius of the polyline has
    its cell in the cover — the no-false-pruning contract."""
    import random

    from explora_kafka_spark.functions import geo

    route = [(-20.0, -40.0), (-10.0, -20.0), (-2.0, -5.0)]
    r = 500_000.0
    cover = set(geo.quadkey_cover_route(route, r, 8))
    ghc = set(geo.geohash_cover_route(route, r, 4))
    k = geo._route_lon_scale(route)
    rng = random.Random(7)
    hits = 0
    for _ in range(400):
        la = rng.uniform(-25.0, 3.0)
        lo = rng.uniform(-45.0, 0.0)
        # distance from the point (as a degenerate box) to the route
        d = geo.route_min_dist_m(route, la, lo, la, lo, k)
        if d > r * 0.98:  # stay off the planar-vs-cover boundary
            continue
        hits += 1
        assert geo.tile_to_quadkey(*geo.latlon_to_tile(la, lo, 8), 8) \
            in cover
        assert geo.geohash_encode(la, lo, 4) in ghc
    assert hits > 60


def test_route_cover_subset_of_expanded_bbox_cover():
    from explora_kafka_spark.functions import geo

    route = [(-20.0, -40.0), (-10.0, -20.0), (-2.0, -5.0)]
    r = 500_000.0
    rc = set(geo.quadkey_cover_route(route, r, 7))
    n, w, s, e = geo._route_bbox_expanded(route, r)
    bc = set(geo.quadkey_cover_bbox(n, w, s, e, 7))
    assert rc and rc <= bc and rc != bc  # the corridor trims the box
