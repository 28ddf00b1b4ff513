"""Canned jobs through the generic MapReduce shim — the reference's
word_count_submit_job / page_rank_*_submit_job (mini_hadoop.ex:22-73)
with the SAME map/reduce semantics, runnable via ``run_job``.

These exist to prove the shim faithfully executes the reference's two
flagship workloads; the production-path equivalents are the DataFrame
versions in workloads/ (Catalyst-optimized, no Python in the hot path).
tests/test_engine.py asserts shim output == DataFrame output.
"""

from __future__ import annotations

import re
from collections import defaultdict

from pyspark.sql import SparkSession

from mini_hadoop_spark.engine.mapreduce import JobResult, JobSpec, run_job

# README.md:653-660 tokenizer: lowercase, strip non-word chars, split on
# whitespace (the same semantics as workloads/wordcount.py word_count).
_WORD_RE = re.compile(r"[a-z0-9_]+")


def word_count_mapper(block: str, _context: dict) -> list[tuple[str, int]]:
    """word_count.ex:12-24 shape: tokenize the whole block and pre-count
    per block (map-update) so the shuffle carries (word, n), not one
    pair per occurrence."""
    counts: dict[str, int] = defaultdict(int)
    for word in _WORD_RE.findall(block.lower()):
        counts[word] += 1
    return list(counts.items())


def word_count_reducer(_key: str, values: list[int], _context: dict) -> int:
    """word_count.ex:133-147: sum integer values per key (non-integers
    filtered, as the reference does)."""
    return sum(v for v in values if isinstance(v, int))


def word_count_submit_job(
    spark: SparkSession, input_files: list[str], sort_desc_by_count: bool = True
) -> JobResult:
    """mini_hadoop.ex:22-32 equivalent."""
    spec = JobSpec.create(
        job_name="word_count",
        input_files=input_files,
        map_function=word_count_mapper,
        reduce_function=word_count_reducer,
        sort_result_opt=("value", "desc") if sort_desc_by_count else None,
    )
    # word counting is associative: declare the combiner for map-side
    # combine (the upgrade the reference's map-side grouping never had)
    return run_job(spark, spec, combiner=lambda a, b: a + b)


def pagerank_mapper(block: str, context: dict) -> list[tuple[str, float]]:
    """page_rank.ex:31-88 semantics: for each adjacency line
    ``src\\tt1 t2 ...`` emit the baseline (1-d)/n for the source plus
    d * rank(src)/out_degree per target; rank defaults to 1.0
    (page_rank.ex:56); dangling sources emit only the baseline
    (page_rank.ex:70-73).  Prior ranks arrive via the context — the
    broadcast that replaces the reference's shared-JSON side file
    (mini_hadoop.ex:53-73)."""
    damping = context.get("damping", 0.85)
    total_pages = context.get("total_pages", 1_000_000)
    ranks = context.get("ranks", {})
    baseline = (1.0 - damping) / total_pages
    out: list[tuple[str, float]] = []
    for line in block.split("\n"):
        line = line.strip()
        if not line:
            continue
        parts = line.split("\t")
        src = parts[0]
        targets = parts[1].split() if len(parts) > 1 and parts[1] else []
        out.append((src, baseline))
        if targets:
            contrib = damping * ranks.get(src, 1.0) / len(targets)
            out.extend((t, contrib) for t in targets)
    return out


def pagerank_reducer(_key: str, values: list[float], _context: dict) -> float:
    """page_rank.ex:102-122: sum contributions per page."""
    return sum(values)


def page_rank_iter_submit_job(
    spark: SparkSession,
    input_files: list[str],
    ranks: dict[str, float] | None = None,
    damping: float = 0.85,
    total_pages: int = 1_000_000,
) -> JobResult:
    """One PageRank iteration (mini_hadoop.ex:34-73).  Pass the previous
    iteration's ranks dict to run iteration N (the reference threads
    this through a shared JSON file; here it is a broadcast context)."""
    spec = JobSpec.create(
        job_name="page_rank_iter",
        input_files=input_files,
        map_function=pagerank_mapper,
        reduce_function=pagerank_reducer,
        map_context={"damping": damping, "total_pages": total_pages, "ranks": ranks or {}},
    )
    return run_job(spark, spec, combiner=lambda a, b: a + b)
