"""Z-order (Morton) interleaving for multi-dimensional data layout.

The lakehouse layout technique (Delta OPTIMIZE ZORDER BY / Iceberg
sort-order z-ordering): interleave the bits of several bounded integer
coordinates into one BIGINT sort key, so that range-sorting files by
that key gives every coordinate locality at once — parquet min/max
(and partition-range) skipping then prunes on ANY of the dimensions,
not just the leading sort column. The reference engine gets its layout
locality from its store's (cell, time) key order
(`state/ViewStore.java` key layout); this is the Spark-side
generalization to N dimensions at file granularity.

Everything is native bit arithmetic (shiftleft/shiftright/&) inside
whole-stage codegen — no UDF — with an exact DuckDB SQL mirror.
Coordinates must be non-negative and fit in `bits` bits; callers clamp
(the `tile_x_col` domain rule).

100 TB design: computing the key is a shuffle-free projection;
`zorder_repartition` does ONE repartitionByRange (a range shuffle —
the same cost as any sorted write) + sortWithinPartitions, after which
every written file covers a small hyper-rectangle of the coordinate
space. That turns "scan everything unless the query hits the leading
sort column" into min/max skipping for every z-ordered dimension —
the difference between reading ~1/files_touched and reading the whole
table for the non-leading dimensions.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: default bits per coordinate (3 × 16 = 48 bits — inside BIGINT)
DEFAULT_BITS = 16


def zorder_key_col(coords: list[Column], bits: int = DEFAULT_BITS) -> Column:
    """BIGINT Morton key: bit b of coordinate i lands at position
    len(coords)·b + i (LSB-first interleave, dimension 0 least
    significant). Pure codegen bit math."""
    n = len(coords)
    terms = [
        F.shiftleft(
            F.shiftright(c.cast("bigint"), b).bitwiseAND(F.lit(1)),
            n * b + i,
        )
        for i, c in enumerate(coords)
        for b in range(bits)
    ]
    return reduce(lambda a, t: a + t, terms).cast("bigint")


def zorder_key_sql(coords: list[str], bits: int = DEFAULT_BITS) -> str:
    """DuckDB mirror of `zorder_key_col` (same bit layout)."""
    n = len(coords)
    terms = [
        f"(((CAST({c} AS BIGINT) >> {b}) & 1) << {n * b + i})"
        for i, c in enumerate(coords)
        for b in range(bits)
    ]
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def zorder_repartition(
    df: DataFrame,
    coords: list[Column],
    num_partitions: int,
    bits: int = DEFAULT_BITS,
    key_name: str = "zkey",
) -> DataFrame:
    """The write-side layout: attach the Morton key, range-partition on
    it, and sort each partition — the `build_views` write discipline
    (plans/views.py) applied to N dimensions. Write the result with
    any parquet writer; every output file then covers a compact
    hyper-rectangle and carries tight min/max for EVERY coordinate."""
    keyed = df.withColumn(key_name, zorder_key_col(coords, bits))
    return keyed.repartitionByRange(num_partitions, key_name) \
                .sortWithinPartitions(key_name)
