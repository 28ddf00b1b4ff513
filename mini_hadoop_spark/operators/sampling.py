"""Deterministic sampling / splitting over ``documents`` — the
train/val/test machinery of a training-data pipeline (driver contract
BASELINE.json ``north_star`` family; no reference analogue — its only
workloads are WordCount/PageRank, SURVEY.md §2.3).

* ``split_train_val_test``     — 80/10/10 split by a CONTENT-hash
                                 bucket: md5(text) mod 100.  Hashing
                                 content (not doc_id) keeps every
                                 exact duplicate in the SAME split —
                                 no train/test leakage via dups; and a
                                 re-run over re-ingested data lands
                                 each document in the same split
                                 (reproducible pipelines).  Output is
                                 per-(lang, split) counts.
* ``sample_stratified_per_lang`` — k docs per language, chosen by
                                 md5-hash order: a deterministic
                                 "random" stratified sample (the
                                 eyeball-QA / eval-set primitive).

Both are md5-based so the DuckDB oracle computes the IDENTICAL buckets
— unlike xxhash64 (Spark-only), md5 is standard on both engines.

Scale posture: the split is a pure projection + one hash agg (the
bucket never shuffles document bodies); the stratified sample is one
window shuffle on ``lang`` where per-group state is a top-k heap —
both O(n) with tiny shuffles.  At 100 TB you'd write the split label
as a partition column (``df.write.partitionBy("split")``) and the
sample query is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W, functions as F

from mini_hadoop_spark.sources.catalog import load_table

SPLIT_BUCKETS = 100
TRAIN_UPTO = 80  # [0, 80) -> train
VAL_UPTO = 90    # [80, 90) -> val; [90, 100) -> test
SAMPLE_K = 5


def _md5_bucket(col, buckets: int = SPLIT_BUCKETS):
    """First 8 hex chars of md5 → long → mod buckets (engine-identical:
    md5 and base-16 parsing are bit-exact on both Spark and DuckDB)."""
    return F.pmod(F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long"), F.lit(buckets))


def split_label(col) -> Column:
    b = _md5_bucket(col)
    return (
        F.when(b < TRAIN_UPTO, "train").when(b < VAL_UPTO, "val").otherwise("test")
    )


def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(lang, split) document counts under the content-hash 80/10/10
    split — the summary a pipeline materializes to sanity-check split
    balance before training."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("lang", split_label(F.col("text")).alias("split"))
        .groupBy("lang", "split")
        .agg(F.count("*").alias("n_docs"))
    )


SPLIT_SQL = f"""
WITH t AS (
  SELECT lang,
         ('0x' || substr(md5(text), 1, 8))::BIGINT % {SPLIT_BUCKETS} AS b
  FROM documents
)
SELECT lang,
       CASE WHEN b < {TRAIN_UPTO} THEN 'train'
            WHEN b < {VAL_UPTO} THEN 'val'
            ELSE 'test' END AS split,
       count(*) AS n_docs
FROM t GROUP BY 1, 2
"""


def sample_stratified_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample: the ``SAMPLE_K`` documents per
    language with the smallest md5(text) — hash order is
    indistinguishable from random for sampling purposes but exactly
    reproducible across runs and engines.  Tiebreak on doc_id makes the
    selection total even for duplicate texts."""
    d = load_table(spark, sf_dir, "documents")
    # explicit NULLS LAST on both twins: Spark defaults ASC NULLS FIRST,
    # DuckDB defaults NULLS LAST — a NULL text/doc_id would silently
    # rank opposite ends without the pin.
    w = W.partitionBy("lang").orderBy(
        F.md5(F.col("text")).asc_nulls_last(), F.col("doc_id").asc_nulls_last()
    )
    return (
        d.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= SAMPLE_K)
        .select("lang", "rk", "doc_id", "n_chars")
    )


SAMPLE_STRATIFIED_SQL = f"""
WITH r AS (
  SELECT lang, doc_id, n_chars,
         row_number() OVER (PARTITION BY lang
                            ORDER BY md5(text) NULLS LAST, doc_id NULLS LAST) AS rk
  FROM documents
)
SELECT lang, rk, doc_id, n_chars FROM r WHERE rk <= {SAMPLE_K}
"""


def sample_weighted_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic WEIGHTED downsampling — the execution step of the
    domain-mixing weights (text_analysis.mix_domain_weights): each
    source is down-sampled to the SMALLEST source's token budget, so
    the sampled corpus approaches uniform source shares.

    Acceptance is a pure hash test: accept a doc iff the high 32 bits
    of md5(text ‖ ':' ‖ doc_id) fall below rate·2³², where
    rate(source) = min_source_tokens / source_tokens (one exact-integer
    division — bit-identical cross-engine).  Hash-threshold sampling is
    reproducible across runs/engines AND composable: a different salt
    (the ':' tag) decorrelates it from the content-hash split buckets.

    Output: per-source summary (n_docs, n_sampled, target_rate).
    Scale: one token-count aggregate, a broadcast rate attach, one
    map-combined summary aggregate — the accept flag itself is a pure
    projection, so at 100 TB the sampled corpus is written by the same
    scan that computes the flag (no second pass)."""
    from mini_hadoop_spark.functions.text import round_half_up, tokens

    d = load_table(spark, sf_dir, "documents")
    per = d.groupBy("source").agg(F.sum(F.size(tokens("text"))).alias("n_tokens"))
    mn = per.agg(F.min("n_tokens").alias("min_tokens"))
    rates = per.crossJoin(F.broadcast(mn)).select(
        "source", (F.col("min_tokens") / F.col("n_tokens")).alias("rate")
    )
    hv = F.conv(
        F.substring(F.md5(F.concat(F.col("text"), F.lit(":"), F.col("doc_id"))), 1, 8), 16, 10
    ).cast("long")
    flagged = d.select("source", hv.alias("hv")).join(F.broadcast(rates), "source")
    return (
        flagged.groupBy("source", "rate")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(
                F.when(F.col("hv") < F.col("rate") * F.lit(4294967296.0), 1).otherwise(0)
            ).alias("n_sampled"),
        )
        .select("source", "n_docs", "n_sampled", round_half_up(F.col("rate"), 6).alias("target_rate"))
    )


def _weighted_mix_sql() -> str:
    from mini_hadoop_spark.functions.text import sql_round_half_up

    return f"""
WITH per AS (
  SELECT source, sum(len(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS n_tokens
  FROM documents GROUP BY source
), mn AS (
  SELECT min(n_tokens) AS min_tokens FROM per
), rates AS (
  SELECT source, min_tokens * 1.0 / n_tokens AS rate FROM per, mn
), h AS (
  SELECT d.source, r.rate,
         ('0x' || substr(md5(d.text || ':' || d.doc_id::VARCHAR), 1, 8))::BIGINT AS hv
  FROM documents d JOIN rates r ON d.source = r.source
)
SELECT source, count(*) AS n_docs,
       sum(CASE WHEN hv < rate * 4294967296.0 THEN 1 ELSE 0 END)::BIGINT AS n_sampled,
       {sql_round_half_up('rate', 6)} AS target_rate
FROM h GROUP BY source, rate
"""


QUERIES = {
    "split_train_val_test": split_train_val_test,
    "sample_stratified_per_lang": sample_stratified_per_lang,
    "sample_weighted_mix": sample_weighted_mix,
}

ORACLES = {
    "split_train_val_test": SPLIT_SQL,
    "sample_stratified_per_lang": SAMPLE_STRATIFIED_SQL,
    "sample_weighted_mix": _weighted_mix_sql(),
}
