from mini_hadoop_spark.workloads.wordcount import word_count, word_count_strict
from mini_hadoop_spark.workloads.pagerank import pagerank

__all__ = ["word_count", "word_count_strict", "pagerank"]
