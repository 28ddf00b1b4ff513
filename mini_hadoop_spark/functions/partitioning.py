"""Partition-shape helpers for compute-heavy pipelines.

The LLM-pipeline operators (shingling, minhash, simhash, text scoring,
embedding math) do expensive per-row expression work, often followed by
an explode that amplifies row counts 50-100x.  When the source parquet
is a single small file, the scan is ONE input split — so all of that
per-row compute runs on one core while the other 31 idle.  That is a
local-mode/small-SF artifact: at any real scale the scan has hundreds
of splits and the same plan parallelizes naturally.

``spread_small_scan`` repairs only the artifact: it round-robin
repartitions UP to the session's default parallelism when (and only
when) the plan's scan has fewer partitions than cores.  On a 100 TB
corpus the condition is never true and no shuffle is added; on a
single-file input the shuffle moves only the small file's bytes once,
and every downstream expression runs on all cores.  This mirrors what
``spark.sql.files.maxPartitionBytes``/AQE would do for a LARGE file —
Spark has no knob that splits one small row-group for CPU-bound work,
so the operator states the need explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_small_scan(df: DataFrame) -> DataFrame:
    """Repartition ``df`` up to default parallelism iff its current plan
    yields fewer partitions — a no-op (no added shuffle) on any input
    that already has enough splits."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
