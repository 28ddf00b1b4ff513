"""Iterative PageRank as a DataFrame loop — reference parity workload.

Reference semantics (lib/mini_hadoop/examples/page_rank.ex):
  * mapper (page_rank.ex:31-88): for each adjacency line ``src\\tt1 t2 ...``
    emit baseline ``{src, (1-d)/n}`` once per source line, plus
    ``{target, d * rank(src) / out_degree(src)}`` per target; ``rank(src)``
    defaults to 1.0 when absent from the prior-ranks side file
    (page_rank.ex:56); dangling sources emit only the baseline
    (page_rank.ex:70-73).
  * reducer (page_rank.ex:102-122): sum contributions per page.
  * iteration: the reference threads prior ranks through a shared JSON file
    (mini_hadoop.ex:53-73) — a hand-rolled broadcast join.  Here prior
    ranks are simply a DataFrame joined to the edge list; Catalyst
    broadcasts it when small, shuffles on ``src`` otherwise.

Scale posture: each iteration is one join + one hash aggregate, both keyed
shuffles that AQE can re-plan; ranks are cached between iterations and the
lineage is truncated via localCheckpoint every few iterations so the plan
does not grow linearly with iteration count (the classic iterative-Spark
pitfall).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 2,
    damping: float = 0.85,
    total_pages: int | None = None,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Run PageRank over an edge list ``(src, dst)``.

    Returns ``(page, rank)``.  Matches page_rank.ex semantics: baseline
    (1-d)/n is emitted per distinct source; destination-only pages receive
    only in-edge contributions; initial rank is 1.0 for every source
    (page_rank.ex:56 default).
    """
    edges = edges.select("src", "dst")
    out_deg = edges.groupBy("src").agg(F.count("*").alias("out_degree"))
    sources = out_deg.select("src")

    if total_pages is None:
        total_pages = (
            edges.select(F.col("src").alias("page"))
            .union(edges.select(F.col("dst").alias("page")))
            .distinct()
            .count()
        )
    baseline = F.lit((1.0 - damping) / total_pages)

    # iteration 1: every source has rank 1.0 (page_rank.ex:56 default)
    ranks = out_deg.select("src", F.lit(1.0).alias("rank"))

    result = None
    for i in range(iterations):
        contribs = (
            edges.join(out_deg, "src")
            .join(ranks, "src", "left")
            .select(
                F.col("dst").alias("page"),
                (F.lit(damping) * F.coalesce(F.col("rank"), F.lit(1.0)) / F.col("out_degree")).alias("contrib"),
            )
        )
        base = sources.select(F.col("src").alias("page"), baseline.alias("contrib"))
        result = contribs.unionAll(base).groupBy("page").agg(F.sum("contrib").alias("rank"))
        if i < iterations - 1:
            # feed ranks of pages that are sources back into the next iter
            ranks = result.select(F.col("page").alias("src"), "rank")
            if (i + 1) % checkpoint_every == 0:
                ranks = ranks.localCheckpoint(eager=True)
    return result


def converged(old: DataFrame, new: DataFrame, tolerance: float = 1e-4) -> bool:
    """README.md:843-854 convergence helper: max |Δrank| < tolerance."""
    delta = (
        old.select(F.col("page"), F.col("rank").alias("old_rank"))
        .join(new, "page", "full")
        .select(F.abs(F.coalesce("rank", F.lit(0.0)) - F.coalesce("old_rank", F.lit(0.0))).alias("d"))
        .agg(F.max("d").alias("max_delta"))
        .first()
    )
    return (delta["max_delta"] or 0.0) < tolerance
