"""Embedding clustering — topic/cluster structure over the corpus's
vector space, built on the memoized IVF machinery
(operators/similarity.py::ivf_quantizer / ivf_lists).

``cluster_kmeans_topics`` is the training-data-pipeline use of k-means
(vs. the ANN use in similarity_ann_ivf): cluster the corpus embeddings,
then report per-cluster size, label purity, and cohesion — the report a
curation pipeline reads to balance topic mix or drop degenerate
clusters.  Fully DuckDB-oracled since r7: the quantizer's Lloyd mean is
an order-independent fixed-point sum (similarity.ivf_index), so the
oracle reproduces centroids, assignments, and the decimal cohesion sum
bit-for-bit; determinism, full assignment, and purity bounds are
additionally pinned in tests/test_llm_pipeline.py.

Determinism contract: seeds are the first K vectors by vec_id (no RNG),
assignment tiebreaks on cid, majority labels tiebreak on label, and the
cohesion mean is an exact DECIMAL sum of per-row rounded cosines — so
repeated runs (and runs at different parallelism) emit identical rows.

At 100 TB: the quantizer is a K-row broadcast artifact; assignment is
one broadcast-join pass over the vectors (built once per session and
shared with the ANN queries); the stats are one K-key aggregate.  The
label-majority window runs over K x |labels| rows — constant-sized."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mini_hadoop_spark.functions.text import round_half_up
from mini_hadoop_spark.functions.vectors import dot, norm
from mini_hadoop_spark.operators.similarity import ivf_lists, ivf_quantizer
from mini_hadoop_spark.sources.catalog import load_table


def cluster_kmeans_topics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster corpus report: size, majority label + purity,
    cohesion (mean cosine of members to their centroid).

    Plan (r17): the member stream is aggregated ONCE to (cid, label)
    partials carrying both count and the exact decimal cosine sum;
    majority, size and cohesion all derive from that tiny table
    (cohesion = Σ_label scos / Σ_label n — decimal addition associates,
    so the two-level sum is bit-identical to the r16 direct per-cid
    aggregate, which made a SECOND full pass over the member stream).
    The partials are lazily localCheckpoint-ed: column pruning gives the
    two consumers non-identical aggregate subtrees (majority never reads
    scos), so ReuseExchange cannot merge them — the checkpoint pins the
    K×|labels|-row table and guarantees the member stream is scored
    once."""
    lists = ivf_lists(spark, sf_dir)  # (vec_id, e, nv, cid) — memoized
    cent = ivf_quantizer(spark, sf_dir).withColumn("nce", norm(F.col("ce")))
    labels = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")

    member_cos = (
        lists.join(F.broadcast(cent), "cid")
        .select(
            "cid",
            "vec_id",
            # per-row rounding BEFORE the exact decimal sum: the mean is
            # then order-independent (same trick as the TPC-H money sums)
            round_half_up(dot(F.col("e"), F.col("ce")) / F.col("nv") / F.col("nce"), 9)
            .cast("decimal(18,9)")
            .alias("cos"),
        )
        .join(labels, "vec_id")
    )
    per_label = member_cos.groupBy("cid", "label").agg(
        F.count("*").alias("n"), F.sum("cos").alias("scos")
    ).localCheckpoint(eager=False)
    w = W.partitionBy("cid").orderBy(F.col("n").desc(), F.col("label"))
    majority = (
        per_label.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select("cid", F.col("label").alias("top_label"), F.col("n").alias("top_n"))
    )
    stats = per_label.groupBy("cid").agg(
        F.sum("n").alias("n_vecs"),
        (F.sum("scos").cast("double") / F.sum("n")).alias("_cohesion"),
    )
    return (
        stats.join(majority, "cid")
        .select(
            "cid",
            "n_vecs",
            "top_label",
            round_half_up(F.col("top_n").cast("double") / F.col("n_vecs"), 6).alias(
                "top_label_frac"
            ),
            round_half_up(F.col("_cohesion"), 6).alias("cohesion"),
        )
    )


def _kmeans_topics_sql() -> str:
    from mini_hadoop_spark.functions.text import sql_round_half_up
    from mini_hadoop_spark.operators.similarity import _ivf_ctes

    cos9 = sql_round_half_up(
        "list_dot_product(l.e, c.ce) / l.nv / sqrt(list_dot_product(c.ce, c.ce))", 9
    )
    return f"""
WITH {_ivf_ctes()}, member AS (
  SELECT l.cid, l.vec_id,
         CAST({cos9} AS DECIMAL(18,9)) AS cos,
         emb.label
  FROM lists l
  JOIN cent c USING (cid)
  JOIN embeddings emb ON l.vec_id = emb.vec_id
), majority AS (
  SELECT cid, label AS top_label, n AS top_n FROM (
    SELECT cid, label, count(*) AS n,
           row_number() OVER (PARTITION BY cid ORDER BY count(*) DESC, label) AS r
    FROM member GROUP BY cid, label)
  WHERE r = 1
), stats AS (
  SELECT cid, count(*) AS n_vecs,
         CAST(sum(cos) AS DOUBLE) / count(*) AS coh
  FROM member GROUP BY cid
)
SELECT s.cid, s.n_vecs, m.top_label,
       {sql_round_half_up('CAST(m.top_n AS DOUBLE) / s.n_vecs', 6)} AS top_label_frac,
       {sql_round_half_up('s.coh', 6)} AS cohesion
FROM stats s JOIN majority m USING (cid)
"""


# Oracle-able since r7: the IVF quantizer's Lloyd mean is an
# order-independent fixed-point sum (see similarity.ivf_index), so the
# centroids — and therefore assignments, majorities, and the decimal
# cohesion sum — are bit-identical between Spark and DuckDB.
CLUSTER_KMEANS_TOPICS_SQL = _kmeans_topics_sql()

QUERIES = {
    "cluster_kmeans_topics": cluster_kmeans_topics,
}

ORACLES: dict[str, str] = {
    "cluster_kmeans_topics": CLUSTER_KMEANS_TOPICS_SQL,
}
