"""mini_hadoop_spark — a PySpark-native engine with the query and
data-processing capabilities of dis-functional-bros/mini-hadoop.

The reference (read-only at /root/reference) is an Elixir Hadoop-1.x clone:
a block DFS plus a MapReduce framework whose only workloads are WordCount
and iterative PageRank.  This package re-expresses that capability surface
Spark-first (DataFrame/SQL, Catalyst-optimized) and extends it with the
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns) required by the driver contract (BASELINE.json
``north_star``).

Layout:
  session     — tuned SparkSession bootstrap
  sources     — table catalog + DFS-equivalent store/retrieve/delete + sinks
  engine      — generic MapReduce surface (JobSpec / run_job) on RDDs
  workloads   — WordCount + PageRank as DataFrame queries (reference parity)
  operators   — relational battery + dedup/similarity/text/multimodal
  streaming   — Structured Streaming windowed aggregation / sessionization
"""

__version__ = "0.1.0"
