"""Batch file-format sources for the reading stream: JSONL and CSV.

The reference ingests only Kafka JSON (IngestStream.java:292); this
engine's durable layout is parquet (`sources/tables.py`). These loaders
add the other two formats a bulk backfill actually arrives in — newline-
delimited JSON and CSV dumps — by reading the file as TEXT and pushing
every line through the SAME serde edge as the Kafka topology
(`decode_readings` ≙ S2 for JSONL; `from_csv` with identical PERMISSIVE
corrupt capture for CSV), then `to_engine_columns` → `with_event_time`.
Downstream operators never see the source format.

Design rules (same as the streaming serde edge):
- explicit wire schema (`READING_SCHEMA`), never schema inference — at
  100 TB, inference is an extra full scan AND a correctness hazard
  (a numeric-looking metric id flips the column type);
- malformed rows dead-letter instead of failing the job, carrying the
  raw line for reprocessing;
- one projection per row — no shuffle, composes with scan pruning.
  (Reading as text also sidesteps Spark's corrupt-record-column query
  restriction on raw file scans.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming.pipeline import (
    READING_SCHEMA,
    decode_readings,
    to_engine_columns,
    with_event_time,
)


def _split(decoded: DataFrame) -> tuple[DataFrame, DataFrame]:
    bad = decoded.filter(F.col("_corrupt")).select("_raw")
    good = decoded.filter(~F.col("_corrupt")).drop("_corrupt", "_raw")
    return with_event_time(to_engine_columns(good)), bad


def read_jsonl_readings(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """Newline-delimited JSON readings → (readings, dead_letter).

    `readings` has the engine shape (snake_case + event-time `ts`);
    `dead_letter` carries the raw offending line. Decode is literally the
    Kafka topology's S2 operator over text lines.
    """
    raw = spark.read.text(path)  # one `value` string column, like Kafka
    return _split(decode_readings(raw))


def read_csv_readings(
    spark: SparkSession, path: str, header: bool = True, sep: str = ","
) -> tuple[DataFrame, DataFrame]:
    """CSV readings dump → (readings, dead_letter). Columns must be the
    wire names in READING_SCHEMA order; a type-invalid cell dead-letters
    its row (PERMISSIVE `from_csv` + corrupt capture), mirroring the
    JSONL/Kafka serde semantics."""
    # from_csv takes a DDL string, not a StructType
    ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in READING_SCHEMA.fields
    ) + ", _cr string"
    # read whole lines via the CSV reader (separator that can't occur,
    # quoting off): its `header` option drops exactly the FIRST PHYSICAL
    # line of each file — unlike a value filter, a data/corrupt row that
    # happens to equal the header string survives to the serde below
    lines = (
        spark.read.format("csv")
        .schema("value STRING")
        .option("sep", "\x01")
        .option("quote", "")
        .option("header", "true" if header else "false")
        .option("enforceSchema", "true")
        .load(path)
    )
    parsed = lines.select(
        F.from_csv(
            F.col("value"), ddl,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_cr",
             "sep": sep},
        ).alias("r"),
        F.col("value").alias("_raw"),
    ).select("r.*", "_raw")
    decoded = parsed.withColumn(
        "_corrupt", F.col("_cr").isNotNull()
    ).drop("_cr")
    return _split(decoded)
