"""API layer tests: the L5 validation matrix (table-driven against the
exact reference messages — QueryingService.java:46-222) and the S7
Message envelope golden shape."""

from __future__ import annotations

import pytest

from explora_kafka_spark import api
from explora_kafka_spark.plans.views import view_lattice
from explora_kafka_spark.sources.tables import load_readings

NOW = 1706616000000  # 2024-01-30T12:00:00Z

HISTORY_400S = [
    # (params-override, expected message) — order-sensitive matrix
    ({"geohashes": ""},
     "[getAirQualityHistory] You need to provide a list of comma-separated "
     "geohash prefixes"),
    ({"aggregate": "median"},
     "[getAirQualityHistory] aggregate median is not yet supported"),
    ({"gh_precision": "abc"}, 'For input string: "abc"'),
    ({"from": "xyz"}, 'For input string: "xyz"'),
    ({"from": str(NOW + 1)},
     "[getAirQualityHistory] fromDate cannot be set to a future date"),
    ({"from": "200", "to": "100"},
     "[getAirQualityHistory] fromDate parameter should be less than toDate"),
    ({"gh_precision": "9"},
     "[getAirQualityHistory] precision 9 is not yet supported"),
    ({"res": "", "interval": ""},
     "[getAirQualityHistory] Invalid values for resolution () or interval ()"),
    ({"res": "decade", "interval": "2years"},
     "[getAirQualityHistory] Invalid values for resolution (decade) or "
     "interval (2years)"),
]


@pytest.mark.parametrize("override,msg", HISTORY_400S)
def test_history_validation_matrix(override, msg):
    params = {"geohashes": "u4pru", "res": "hour"}
    aggregate = override.pop("aggregate", "avg")
    params.update(override)
    with pytest.raises(api.ApiError) as exc:
        api.validate_history("m", aggregate, params, now_ms=NOW)
    assert str(exc.value) == msg
    assert exc.value.body == {"errorMessage": msg, "errorCode": 400}


SNAPSHOT_400S = [
    ({"ts": "-1"},
     "[getAirQualitySnapshot] You need to provide a valid timestamp in "
     "milliseconds"),
    ({"ts": "nope"},
     "[getAirQualitySnapshot] You need to provide a valid timestamp in "
     "milliseconds"),
    ({"bbox": ""},
     "[getAirQualitySnapshot] You need to provide a set of coordinates "
     "corresponding to a valid bounding box: (N,W,S,E)"),
    ({"bbox": "a,b,c,d"},
     "[getAirQualitySnapshot] You need to provide valid double values for "
     "the bounding box coordinates"),
    ({"aggregate": "p99"},
     "[getAirQualitySnapshot] aggregate p99 is not yet supported"),
    ({"gh_precision": "zz"}, 'For input string: "zz"'),
    ({"gh_precision": "3"},
     "[getAirQualitySnapshot] geohash precision 3 is not yet supported"),
]


@pytest.mark.parametrize("override,msg", SNAPSHOT_400S)
def test_snapshot_validation_matrix(override, msg):
    params = {"ts": "1704844800000", "bbox": "51.31,4.31,51.17,4.50"}
    aggregate = override.pop("aggregate", "avg")
    params.update(override)
    with pytest.raises(api.ApiError) as exc:
        api.validate_snapshot("m", aggregate, params)
    assert str(exc.value) == msg


def test_history_valid_spatial_and_interval():
    req = api.validate_history(
        "m", "AVG",
        {"geohashes": "U4,C2", "res": "hour", "gh_precision": "7"},
        now_ms=NOW,
    )
    assert req.mode == "spatial" and req.aggregate == "avg"
    assert req.geohashes == ["u4", "c2"] and req.precision == 7
    req2 = api.validate_history(
        "m", "sum", {"geohashes": "u4", "interval": "1day"}, now_ms=NOW
    )
    assert req2.mode == "spatiotemporal" and req2.interval == "1day"
    # res takes priority over interval when both valid (reference if/else)
    req3 = api.validate_history(
        "m", "sum", {"geohashes": "u4", "res": "min", "interval": "1day"},
        now_ms=NOW,
    )
    assert req3.mode == "spatial"


@pytest.fixture(scope="module")
def lattice(spark):
    readings = load_readings(spark, "/root/testdata/sf0.001")
    return view_lattice(readings, precisions=(6,), resolutions=("min", "hour", "day"))


def test_history_envelope_shape(spark, lattice):
    cells = [r.gh for r in lattice.select("gh").distinct().limit(3).collect()]
    env = api.handle_history(
        lattice, "view", "avg",
        {"geohashes": ",".join(cells), "res": "hour"},
        supported_precision=(6,), now_ms=NOW,
    )
    assert env["columns"] == ["timestamp", "avg"]
    assert env["metadata"] == {"metric_id": "view"}
    assert env["data"], "expected data rows"
    for ts_ms, v in env["data"]:
        assert isinstance(ts_ms, int) and isinstance(v, float)
    assert [d[0] for d in env["data"]] == sorted(d[0] for d in env["data"])


def test_snapshot_envelope_shape(spark, lattice):
    env = api.handle_snapshot(
        lattice, "view", "count",
        {"ts": "1704844800000", "bbox": "40.0,-90.0,-40.0,90.0",
         "res": "day", "gh_precision": "6"},
        geo_index="geohashing", supported_precision=(6,),
    )
    assert env["columns"] == ["geohash", "count"]
    keys = [d[0] for d in env["data"]]
    assert keys == sorted(keys)


def test_history_raw_dispatch(spark, lattice):
    readings = load_readings(spark, "/root/testdata/sf0.001")
    env = api.handle_history(
        lattice, "error", "sum",
        {"geohashes": "a,b,c,d,e,f,0,1,2,3,4,5,6,7,8,9", "res": "min",
         "src": "raw", "gh_precision": "1"},
        supported_precision=(1,), now_ms=NOW, readings=readings,
    )
    assert env["columns"] == ["timestamp", "sum"]
