"""Reference-parity workloads (WordCount, PageRank) as queries()/oracle
pairs over the driver's tables.

WordCount runs on ``documents.text``; PageRank runs on a deterministic
bipartite graph derived from lineitem (src=l_orderkey, dst=l_partkey) —
the driver provides no adjacency table, so the graph is derived from data
both engines see identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mini_hadoop_spark.sources.catalog import load_table
from mini_hadoop_spark.workloads.pagerank import pagerank
from mini_hadoop_spark.workloads.wordcount import word_count, word_count_strict

PAGERANK_DAMPING = 0.85
PAGERANK_ITERS = 2


def wordcount_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return word_count(load_table(spark, sf_dir, "documents"))


WORDCOUNT_SQL = """
SELECT word, count(*) AS cnt
FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS word
      FROM documents)
WHERE word <> ''
GROUP BY word
"""


def wordcount_strict_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return word_count_strict(load_table(spark, sf_dir, "documents"))


WORDCOUNT_STRICT_SQL = r"""
SELECT word, count(*) AS cnt
FROM (SELECT unnest(regexp_extract_all(lower(text), '[\p{L}\p{Nd}''_\-]+')) AS word
      FROM documents)
WHERE word <> ''
  AND (word IN ('a', 'i') OR (strlen(word) >= 2 AND regexp_matches(word, '\p{L}')))
GROUP BY word
"""


def _lineitem_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return l.select(F.col("l_orderkey").alias("src"), F.col("l_partkey").alias("dst"))


def pagerank_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2 PageRank iterations, d=0.85, on the lineitem-derived graph —
    mirrors the reference's two-job flow (mini_hadoop.ex:34-73)."""
    ranks = pagerank(_lineitem_edges(spark, sf_dir), iterations=PAGERANK_ITERS, damping=PAGERANK_DAMPING)
    return ranks.select("page", F.round("rank", 8).alias("rank"))


# The oracle unrolls the two iterations as CTEs.  Semantics mirror
# page_rank.ex:31-88: baseline (1-d)/n per distinct source; contribution
# d*rank(src)/out_degree(src) per edge; rank defaults 1.0 when absent.
PAGERANK_SQL = """
WITH edges AS (
  SELECT l_orderkey AS src, l_partkey AS dst FROM lineitem
), outdeg AS (
  SELECT src, count(*) AS deg FROM edges GROUP BY src
), npages AS (
  SELECT count(*) AS n FROM (
    SELECT src AS page FROM edges UNION SELECT dst FROM edges
  )
), iter1 AS (
  -- 0.85 * (rank / deg): parenthesization matches the Spark side's
  -- d * w with w = rank/out_degree, so the IEEE op order is identical
  SELECT page, sum(contrib) AS rank FROM (
    SELECT e.dst AS page, 0.85 * (1.0 / o.deg) AS contrib
    FROM edges e JOIN outdeg o ON e.src = o.src
    UNION ALL
    SELECT src AS page, 0.15 / (SELECT n FROM npages) AS contrib FROM outdeg
  ) GROUP BY page
), iter2 AS (
  SELECT page, sum(contrib) AS rank FROM (
    SELECT e.dst AS page, 0.85 * (coalesce(r.rank, 1.0) / o.deg) AS contrib
    FROM edges e JOIN outdeg o ON e.src = o.src
    LEFT JOIN iter1 r ON e.src = r.page
    UNION ALL
    SELECT src AS page, 0.15 / (SELECT n FROM npages) AS contrib FROM outdeg
  ) GROUP BY page
)
SELECT page, round(rank, 8) AS rank FROM iter2
"""


QUERIES = {
    "wordcount": wordcount_query,
    "wordcount_strict": wordcount_strict_query,
    "pagerank_2iter": pagerank_query,
}

ORACLES = {
    "wordcount": WORDCOUNT_SQL,
    "wordcount_strict": WORDCOUNT_STRICT_SQL,
    "pagerank_2iter": PAGERANK_SQL,
}
