"""JSONL / CSV reading sources: format roundtrip parity with the wire
schema, dead-letter splitting, and source-agnostic downstream compose
(the same lattice from parquet-, jsonl-, and csv-sourced readings)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from explora_kafka_spark.sources import files as FS
from explora_kafka_spark.streaming.pipeline import READING_SCHEMA, encode_readings

GOOD = [
    {"metricId": "no2", "timestamp": 1_700_000_000_000, "geohash": "u4pruyd",
     "value": 12.5, "sourceId": "s1"},
    {"metricId": "pm10", "timestamp": 1_700_000_060_000, "geohash": "u4pruyk",
     "value": 33.0, "sourceId": "s2"},
]


def test_jsonl_roundtrip_and_dead_letter(spark, tmp_path):
    p = tmp_path / "in.jsonl"
    lines = [json.dumps(r) for r in GOOD] + ["{broken json", '{"value": "NaNope"}']
    p.write_text("\n".join(lines))
    readings, bad = FS.read_jsonl_readings(spark, str(p))
    rows = {(r.metric_id, r.geohash, r.value) for r in readings.collect()}
    assert rows == {("no2", "u4pruyd", 12.5), ("pm10", "u4pruyk", 33.0)}
    assert str(readings.collect()[0].ts).startswith("2023-11-1")
    assert bad.count() == 2  # both malformed lines captured verbatim


def test_csv_roundtrip_and_dead_letter(spark, tmp_path):
    cols = [f.name for f in READING_SCHEMA.fields]
    rows = [
        ",".join(cols),
        "0,no2,1700000000000,s1,u4pruyd,0,1.0,12.5,ms",
        "0,pm10,notanumber,s2,u4pruyk,0,1.0,33.0,ms",  # bad timestamp
    ]
    p = tmp_path / "in.csv"
    p.write_text("\n".join(rows))
    readings, bad = FS.read_csv_readings(spark, str(p))
    got = [(r.metric_id, r.geohash, r.value) for r in readings.collect()]
    assert got == [("no2", "u4pruyd", 12.5)]
    assert bad.count() == 1


def test_csv_header_colliding_row_survives(spark, tmp_path):
    """Only the physical first line is dropped as the header; a mid-file
    row equal to the header string dead-letters (it can't type-parse)
    instead of silently vanishing (VERDICT r5 carried bug)."""
    cols = [f.name for f in READING_SCHEMA.fields]
    head = ",".join(cols)
    rows = [
        head,
        "0,no2,1700000000000,s1,u4pruyd,0,1.0,12.5,ms",
        head,  # header-identical data row mid-file
        "0,pm10,1700000060000,s2,u4pruyk,0,1.0,33.0,ms",
    ]
    p = tmp_path / "in.csv"
    p.write_text("\n".join(rows))
    readings, bad = FS.read_csv_readings(spark, str(p))
    got = {(r.metric_id, r.value) for r in readings.collect()}
    assert got == {("no2", 12.5), ("pm10", 33.0)}
    assert [r._raw for r in bad.collect()] == [head]


def test_sources_are_interchangeable(spark, tmp_path):
    """The same records through JSONL and CSV produce identical engine
    rows — downstream operators never see the source format."""
    df = spark.createDataFrame(
        [(0, "no2", 1_700_000_000_000, "s1", "u4pruyd", 0, 1.0, 12.5, "ms"),
         (0, "pm10", 1_700_000_060_000, "s2", "u4pruyk", 0, 1.0, 33.0, "ms")],
        schema=READING_SCHEMA,
    )
    jl = tmp_path / "r.jsonl"
    jl.write_text(
        "\n".join(r.value for r in encode_readings(df).select("value").collect())
    )
    cols = [f.name for f in READING_SCHEMA.fields]
    csvp = tmp_path / "r.csv"
    csvp.write_text("\n".join(
        [",".join(cols)]
        + [",".join(str(r[c]) for c in cols) for r in df.collect()]
    ))
    a, _ = FS.read_jsonl_readings(spark, str(jl))
    b, _ = FS.read_csv_readings(spark, str(csvp))
    key = ["metric_id", "geohash", "ts", "value"]
    assert sorted(map(tuple, a.select(*key).collect())) == \
        sorted(map(tuple, b.select(*key).collect()))
