#!/usr/bin/env python
"""Reference-parity benchmark — times the TWO workloads the reference
repo itself ships benchmark inputs for (BASELINE.md "Reference-parity
workloads to time"):

* WordCount over generated random-word text at 4 MB / 16 MB
  (file_gen.py-style inputs; 256 MB with SPARK_GRAFT_PARITY_LARGE=1),
  through BOTH the DataFrame path (workloads/wordcount.py) and the
  reference-shaped MapReduce shim (engine/mapreduce.py) at 4 MB.
* PageRank x2 iterations, d=0.85, over the reference's own
  41,332-node / 100,000-edge adjacency TSV (the exact input and config
  of its published run — mini_hadoop.ex:42-47; skipped gracefully if
  the file is absent).

Prints ONE JSON line:
    {"metric": "parity_wall_sec", "value": N, "unit": "sec",
     "workloads": {"wordcount_df_4mb": sec, ...}}

The reference publishes no timings for these inputs (BASELINE.md), so
this harness records OUR single-node numbers for the same data scale —
the comparison artifact its missing numbers would have filled.
"""

from __future__ import annotations

import json
import os
import random
import string
import sys
import tempfile
import time

REF_ADJACENCY = os.environ.get(
    "SPARK_GRAFT_REF_ADJACENCY",
    "/root/reference/test_file/adjacency_41332_nodes_100000_edges.tsv",
)
REF_TOTAL_PAGES = 41332  # the reference's published run config (mini_hadoop.ex:42-47)


def generate_words_file(path: str, size_mb: int, seed: int = 7) -> None:
    """Deterministic random-word text, file_gen.py-STYLE (random
    lowercase words, space-separated, newline-terminated lines) — same
    data shape, original generator."""
    rng = random.Random(seed * 1000 + size_mb)
    target = size_mb * 1024 * 1024
    written = 0
    with open(path, "w") as f:
        while written < target:
            words = (
                "".join(rng.choices(string.ascii_lowercase, k=rng.randint(3, 10)))
                for _ in range(100)
            )
            line = " ".join(words) + "\n"
            f.write(line)
            written += len(line)


def generate_adjacency_file(
    path: str, n_nodes: int = 227323, n_edges: int = 1000000, seed: int = 227323
) -> None:
    """Deterministic adjacency TSV with EXACTLY ``n_nodes`` distinct node
    ids and ``n_edges`` distinct directed edges — the same shape as the
    reference's stripped largest PageRank input
    (.MISSING_LARGE_BLOBS:1 names adjacency_227323_nodes_1000000_edges.tsv;
    only the 41,332-node file survived in test_file/).  Shape mirrored
    from the surviving file: sparse integer ids (max id ~100x node
    count), ~96.9% of nodes are sources (the rest are dangling —
    pure-target nodes with no out-edges, exercising the reference's
    dangling-node PageRank semantics at page_rank.ex:70-73), line format
    ``src<TAB>dst1 dst2 ...``."""
    rng = random.Random(seed)
    id_space = n_nodes * 100
    nodes = rng.sample(range(id_space), n_nodes)
    n_src = round(n_nodes * 40047 / 41332)  # the 41k file's source share
    sources, sinks = nodes[:n_src], nodes[n_src:]
    edges: set[tuple[int, int]] = set()
    # coverage first: every source emits >=1 edge, every sink receives
    # >=1 edge — so the distinct-node count is exact by construction
    for i, s in enumerate(sources):
        t = sinks[i % len(sinks)] if i < len(sinks) else nodes[rng.randrange(n_nodes)]
        while t == s or (s, t) in edges:
            t = nodes[rng.randrange(n_nodes)]
        edges.add((s, t))
    while len(edges) < n_edges:
        s = sources[rng.randrange(n_src)]
        t = nodes[rng.randrange(n_nodes)]
        if t != s:
            edges.add((s, t))
    adj: dict[int, list[int]] = {}
    for s, t in edges:
        adj.setdefault(s, []).append(t)
    with open(path, "w") as f:
        for s in sorted(adj, key=str):  # the 41k file is string-sorted
            f.write(f"{s}\t{' '.join(str(t) for t in sorted(adj[s]))}\n")


def main() -> int:
    from pyspark.sql import functions as F

    from mini_hadoop_spark.session import get_spark
    from mini_hadoop_spark.workloads.pagerank import adjacency_edges, pagerank
    from mini_hadoop_spark.workloads.wordcount import word_count

    spark = get_spark("mini_hadoop_spark-parity-bench")
    timings: dict[str, float] = {}
    failures: dict[str, str] = {}

    def timed(name, fn):
        # MIN-OF-2 passes, like bench.py: this host shows external load
        # spikes (load-average bursts with no local process) that can
        # inflate a single pass 3x — the min measures the engine, not
        # the neighbor.  ``fn`` receives the pass number so side-effecting
        # workloads (FileStore names) can disambiguate.
        best = None
        try:
            for p in (1, 2):
                t0 = time.perf_counter()
                fn(p)
                elapsed = time.perf_counter() - t0
                best = elapsed if best is None else min(best, elapsed)
            timings[name] = round(best, 4)
        except Exception as exc:  # noqa: BLE001 — record and keep benching
            failures[name] = f"{type(exc).__name__}: {exc}"[:200]
            print(f"parity: {name} FAILED: {failures[name]}", file=sys.stderr)

    # warm up codegen/scheduler once so workload timings exclude JVM startup
    spark.range(1000).select(F.sum("id")).write.format("noop").mode("overwrite").save()
    # pre-fork the Python worker pool + Arrow serialization (same warmup
    # as bench.py): the first mapInPandas plan otherwise pays ~8 s of
    # daemon spawn + codegen inside whichever workload runs it first —
    # measured on split_binary_100mb: 10.2 s cold vs 1.6 s warm
    n = spark.sparkContext.defaultParallelism
    (
        spark.range(0, n, 1, n)
        .mapInPandas(lambda it: it, "id long")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    sizes = [4, 16]
    if os.environ.get("SPARK_GRAFT_PARITY_LARGE") == "1":
        sizes.append(256)
    with tempfile.TemporaryDirectory(prefix="parity_wc_") as tmp:
        for mb in sizes:
            path = os.path.join(tmp, f"words_{mb}mb.txt")
            generate_words_file(path, mb)
            docs = spark.read.text(path).withColumnRenamed("value", "text")
            timed(
                f"wordcount_df_{mb}mb",
                lambda _p, d=docs: word_count(d).write.format("noop").mode("overwrite").save(),
            )

        # the reference-shaped generic-MapReduce path (engine shim) on the
        # 4 MB input: arbitrary-Python map/reduce closures over blocks —
        # the slow-by-design compatibility surface, timed for honesty
        from mini_hadoop_spark.engine.mapreduce import JobSpec, run_job

        def wc_map(block: str, _ctx):
            out = {}
            for w in block.lower().split():
                w = "".join(c for c in w if c.isalnum() or c == "_")
                if w:
                    out[w] = out.get(w, 0) + 1
            return list(out.items())

        def wc_reduce(_key, values, _ctx):
            return sum(values)

        spec = JobSpec(
            job_name="parity_wc",
            input_files=[os.path.join(tmp, "words_4mb.txt")],
            map_function=wc_map,
            reduce_function=wc_reduce,
        )
        timed(
            "wordcount_shim_4mb",
            lambda _p: run_job(spark, spec).pairs.write.format("noop").mode("overwrite").save(),
        )

        # the reference's split benchmark (benchmark_split.exs:4-58):
        # binary-split vs newline-split store throughput, 64 KB blocks.
        # Reference ran 100 MB; default here is the largest generated
        # words file (16 MB), 100 MB under SPARK_GRAFT_PARITY_LARGE=1.
        from mini_hadoop_spark.sources.dfs import FileStore

        split_mb = 100 if os.environ.get("SPARK_GRAFT_PARITY_LARGE") == "1" else max(sizes)
        split_src = os.path.join(tmp, f"words_{split_mb}mb.txt")
        if not os.path.exists(split_src):
            generate_words_file(split_src, split_mb)
        store = FileStore(spark, os.path.join(tmp, "split_store"))
        timed(
            f"split_binary_{split_mb}mb",
            lambda p: store.store_file(
                f"bin_{split_mb}_p{p}", split_src, split_on_newline=False, block_size=64 * 1024
            ),
        )
        timed(
            f"split_newline_{split_mb}mb",
            lambda p: store.store_file(
                f"nl_{split_mb}_p{p}", split_src, split_on_newline=True, block_size=64 * 1024
            ),
        )

    if os.path.exists(REF_ADJACENCY):
        edges = adjacency_edges(spark, REF_ADJACENCY)
        timed(
            "pagerank_2iter_ref_graph",
            lambda _p: pagerank(
                edges, iterations=2, damping=0.85, total_pages=REF_TOTAL_PAGES
            ).write.format("noop").mode("overwrite").save(),
        )
    else:
        print(f"parity: reference adjacency not found at {REF_ADJACENCY}; skipped", file=sys.stderr)

    # the reference's LARGEST published PageRank input (227,323 nodes /
    # 1M edges) was stripped from the repo as a large blob
    # (.MISSING_LARGE_BLOBS:1) — regenerate a same-shape graph
    # deterministically and complete the parity table at that scale
    with tempfile.TemporaryDirectory(prefix="parity_pr_") as tmp:
        big = os.path.join(tmp, "adjacency_227323_nodes_1000000_edges.tsv")
        generate_adjacency_file(big)
        edges_big = adjacency_edges(spark, big)
        timed(
            "pagerank_2iter_ref_graph_227k",
            lambda _p: pagerank(
                edges_big, iterations=2, damping=0.85, total_pages=227323
            ).write.format("noop").mode("overwrite").save(),
        )
        # the reference's headline flow iterates PageRank until the
        # README convergence helper fires (mini_hadoop.ex:53-73 +
        # README.md:843-854) — the loop-until-converged counterpart on
        # the same 227k-node/1M-edge graph (fixed-point ranks, mean-|Δ|
        # stop rule; r12)
        from mini_hadoop_spark.workloads.pagerank import pagerank_fixed_point

        conv_iters: list[int] = []

        def run_converged(_p):
            ranks, iters = pagerank_fixed_point(edges_big, max_iters=12)
            ranks.write.format("noop").mode("overwrite").save()
            conv_iters.append(iters)

        timed("pagerank_converged_ref_graph_227k", run_converged)

    out = {
        "metric": "parity_wall_sec",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "timing": "min_of_2_passes",
        "workloads": timings,
    }
    if conv_iters:
        out["pagerank_converged_iters"] = conv_iters[0]
    if failures:
        out["failures"] = failures
    print(json.dumps(out))
    spark.stop()
    return 0 if not failures else 1


if __name__ == "__main__":
    sys.exit(main())
