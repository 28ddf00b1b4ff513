"""Generic MapReduce engine surface — the reference's public compute API
(submit_job, lib/mini_hadoop.ex:18-20) re-expressed on Spark RDDs.

This is the ONE part of the rebuild that genuinely needs the RDD escape
hatch: user map/reduce closures over raw text blocks cannot be Catalyst
expressions (SURVEY.md §7.1).  Everything else in the repo is DataFrame.
"""

from mini_hadoop_spark.engine.mapreduce import JobSpec, run_job  # noqa: F401
