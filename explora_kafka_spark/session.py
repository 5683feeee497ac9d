"""SparkSession factory with engine defaults.

All engine semantics are pinned to UTC (SURVEY.md §1.3: the reference truncates
timestamps in the JVM's system zone — a DST bug we deliberately fix by doing all
truncation in UTC).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "explora-kafka-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    Defaults target the driver harness (local[N]); on a real cluster the same
    configs apply, only master/shuffle sizing change. AQE is on so skewed cell
    keys and over-partitioned shuffles get re-planned at runtime.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "4")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or max(int(cpus) * 2, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    spark = builder.getOrCreate()
    # Ensure UTC even when reusing a session created elsewhere (driver harness).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark


def configure(spark: SparkSession) -> SparkSession:
    """Apply engine-required runtime confs to an externally created session."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
        # right-size shuffles for a session left at Spark's stock default
        # (the driver harness creates a bare local[N] session): 200-part
        # shuffles on a small box waste more in task launch than they
        # parallelize. Only touch the exact stock value — a deliberately
        # configured session (any other setting) is left alone; on a real
        # cluster the operator sizes this to the data, not the driver.
        if spark.conf.get("spark.sql.shuffle.partitions") == "200":
            par = spark.sparkContext.defaultParallelism
            spark.conf.set("spark.sql.shuffle.partitions", str(max(par * 2, 8)))
    except Exception:
        pass  # immutable on some deployments; UTC is the only hard requirement
    return spark
