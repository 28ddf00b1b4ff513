"""Bucketed tables: pre-shuffled storage for repeated co-located joins.

At 100 TB the same fact⋈fact join key (orders ⋈ lineitem on orderkey)
recurs across every pipeline run; paying the shuffle once at WRITE time
and never again is the classic bucketing win.  ``bucketBy(n, key)`` +
``sortBy(key)`` stores each table pre-hash-partitioned; a join between
two tables bucketed the same way compiles to a SortMergeJoin with NO
Exchange on either side (verified by tests/test_bucketing.py asserting
the physical plan is Exchange-free).

Bucketed writes require the session catalog (``saveAsTable``); the
bucket count must match on both sides and should be sized so one bucket
of the bigger table fits an executor core's working set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    num_buckets: int = 8,
    path: str | None = None,
) -> None:
    """Persist ``df`` hash-bucketed (and per-bucket sorted) on ``key``."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, key).sortBy(key)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, key: str) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key —
    Catalyst sees the matching hash distributions and elides both
    Exchanges (shuffle-free join)."""
    return spark.table(left_table).join(spark.table(right_table), key)
