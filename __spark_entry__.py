"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship WordCount query (the reference's
flagship workload, lib/mini_hadoop/examples/word_count.ex) at sf0.001.
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 with DuckDB oracle twins.
"""

from __future__ import annotations

import os
import sys

# Self-contained bootstrap: a driver may load this contract module by
# file path (importlib spec_from_file_location) from any cwd, in which
# case the repo root is not on sys.path and the package import below
# would fail.
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mini_hadoop_spark.registry import ALL_ORACLES, ALL_QUERIES
from mini_hadoop_spark.sources.catalog import load_table
from mini_hadoop_spark.workloads.wordcount import word_count


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    return word_count(docs)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ driver-
    mandated extensions).  Each callable takes (spark, sf_dir)."""
    return dict(ALL_QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each queries() key (omitted for
    genuinely non-SQL-expressible ops → rows-only check)."""
    return dict(ALL_ORACLES)
