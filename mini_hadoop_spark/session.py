"""SparkSession bootstrap tuned for the local[32] harness.

At 100 TB / 1000 executors the same settings translate to: AQE on (runtime
coalesce + skew-join), shuffle partitions sized to cluster cores, UTC
session timezone (oracle comparability), Arrow for the Pandas-UDF paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "mini_hadoop_spark", cpus: int | None = None) -> SparkSession:
    """Create (or reuse) a SparkSession.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (default 32).  Shuffle
    partitions match core count — the right setting for local mode; on a
    real cluster this would be ~2-3x total cores and AQE coalesces down.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # nanosAsLong is NOT set here: the catalog probes each file's
        # actual timestamp encoding and flips the conf only when a nanos
        # column is really present (sources/catalog.py).
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
