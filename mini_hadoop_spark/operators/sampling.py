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


def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test LEAKAGE audit over the near-duplicate graph — the
    cross-family query a pipeline runs before trusting its split: for
    each split strategy, how many near-dup pairs (exact word-3-gram
    Jaccard >= 0.2, the corpus's planted near-dups) straddle two
    different splits?

    Strategies compared in ONE pass over the pair set:
      * ``id_hash``      — bucket on md5(doc_id): the naive split; near-
                           dups land independently, so leakage ~ pair
                           count x (1 - sum split_share^2).
      * ``content_hash`` — bucket on md5(text): exact dups can never
                           leak, but near-dups (different bytes) still
                           can.
      * ``cluster_hash`` — bucket on md5(cluster id), the min doc_id of
                           the connected component: every member of a
                           dup cluster shares a split, so leakage is 0
                           BY CONSTRUCTION — the audit proves it.

    Plan: reuses the memoized pair graph + CC labels (near_dup_pairs /
    near_dup_labels — the same session-scoped index the cluster queries
    share), one broadcast-joined label attach, one aggregate, then a
    3-row stack.  Shuffles carry pair rows (bounded by the dup graph,
    not the corpus).  Oracle: the same Jaccard CTE chain + recursive-CTE
    labels DuckDB-side."""
    from mini_hadoop_spark.operators.dedup import near_dup_labels, near_dup_pairs

    d = load_table(spark, sf_dir, "documents")
    pairs = near_dup_pairs(spark, sf_dir, "jaccard").select("doc_a", "doc_b")
    labels = near_dup_labels(spark, sf_dir, "jaccard")  # (id, label=min id)
    base = (
        d.join(labels, d.doc_id == labels.id, "left")
        .select(
            "doc_id",
            split_label(F.col("doc_id").cast("string")).alias("s_id"),
            split_label(F.col("text")).alias("s_content"),
            split_label(
                F.coalesce(F.col("label"), F.col("doc_id")).cast("string")
            ).alias("s_cluster"),
        )
    )
    a = base.select(
        F.col("doc_id").alias("doc_a"),
        F.col("s_id").alias("a_id"),
        F.col("s_content").alias("a_ct"),
        F.col("s_cluster").alias("a_cl"),
    )
    b = base.select(
        F.col("doc_id").alias("doc_b"),
        F.col("s_id").alias("b_id"),
        F.col("s_content").alias("b_ct"),
        F.col("s_cluster").alias("b_cl"),
    )
    agg = (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum((F.col("a_id") != F.col("b_id")).cast("long")).alias("lk_id"),
            F.sum((F.col("a_ct") != F.col("b_ct")).cast("long")).alias("lk_ct"),
            F.sum((F.col("a_cl") != F.col("b_cl")).cast("long")).alias("lk_cl"),
        )
    )
    return agg.select(
        F.expr(
            "stack(3, 'id_hash', n_pairs, lk_id, "
            "'content_hash', n_pairs, lk_ct, "
            "'cluster_hash', n_pairs, lk_cl) AS (strategy, n_pairs, n_leaked)"
        )
    )


def _split_leakage_sql() -> str:
    from mini_hadoop_spark.operators.dedup import _JACCARD_CTES

    def bucket(expr: str) -> str:
        return (
            f"CASE WHEN ('0x' || substr(md5({expr}), 1, 8))::BIGINT % {SPLIT_BUCKETS}"
            f" < {TRAIN_UPTO} THEN 'train'"
            f" WHEN ('0x' || substr(md5({expr}), 1, 8))::BIGINT % {SPLIT_BUCKETS}"
            f" < {VAL_UPTO} THEN 'val' ELSE 'test' END"
        )

    return f"""
WITH RECURSIVE {_JACCARD_CTES}, und AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION ALL
  SELECT doc_b, doc_a FROM pairs
), reach(a, b) AS (
  SELECT a, b FROM und
  UNION
  SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a
), labels AS (
  SELECT a AS id, least(min(b), a) AS label FROM reach GROUP BY a
), base AS (
  SELECT d.doc_id,
         {bucket("d.doc_id::VARCHAR")} AS s_id,
         {bucket("d.text")} AS s_content,
         {bucket("coalesce(l.label, d.doc_id)::VARCHAR")} AS s_cluster
  FROM documents d LEFT JOIN labels l ON d.doc_id = l.id
), agg AS (
  SELECT count(*)::BIGINT AS n_pairs,
         sum(CASE WHEN a.s_id <> b.s_id THEN 1 ELSE 0 END)::BIGINT AS lk_id,
         sum(CASE WHEN a.s_content <> b.s_content THEN 1 ELSE 0 END)::BIGINT AS lk_ct,
         sum(CASE WHEN a.s_cluster <> b.s_cluster THEN 1 ELSE 0 END)::BIGINT AS lk_cl
  FROM pairs p JOIN base a ON p.doc_a = a.doc_id JOIN base b ON p.doc_b = b.doc_id
)
SELECT 'id_hash' AS strategy, n_pairs, lk_id AS n_leaked FROM agg
UNION ALL
SELECT 'content_hash', n_pairs, lk_ct FROM agg
UNION ALL
SELECT 'cluster_hash', n_pairs, lk_cl FROM agg
"""


QUERIES = {
    "split_train_val_test": split_train_val_test,
    "sample_stratified_per_lang": sample_stratified_per_lang,
    "sample_weighted_mix": sample_weighted_mix,
    "split_leakage_audit": split_leakage_audit,
}

ORACLES = {
    "split_train_val_test": SPLIT_SQL,
    "sample_stratified_per_lang": SAMPLE_STRATIFIED_SQL,
    "sample_weighted_mix": _weighted_mix_sql(),
    "split_leakage_audit": _split_leakage_sql(),
}
