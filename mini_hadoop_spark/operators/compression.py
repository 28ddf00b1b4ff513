"""Compression-flavored pre-training utilities — more LLM-pipeline
surface beyond the reference (whose only text workload is WordCount,
word_count.ex; these reuse the same tokenizer family via
functions/text.py).

* ``bpe_merge_candidates``     — corpus-weighted adjacent character-pair
                                 counts within tokens, top
                                 ``BPE_TOP_MERGES``: the first step of
                                 byte-pair-encoding tokenizer training
                                 (Sennrich et al. 2016 — BPE is
                                 literally a compression algorithm run
                                 on the corpus).  Distinct from
                                 ``ngram_bigram_freq`` (WORD bigrams)
                                 and ``text_char_bigram_novelty``
                                 (char bigrams of raw text per doc):
                                 this is within-token, corpus-global,
                                 frequency-weighted — the merge-table
                                 input.
* ``quantize_embeddings_int8`` — symmetric per-vector int8 quantization
                                 of the embedding column with exact
                                 integer checksums and reconstruction-
                                 error stats: the vector-store
                                 compression pass (4x smaller ANN
                                 index), reported as a quality audit.

Scale posture:

* bpe: two explodes (corpus tokens -> within-token char pairs) feeding
  ONE hash aggregate whose key space is bounded by |charset|² — map-side
  partial aggregation collapses each partition to at most that many
  rows before the shuffle, so shuffle volume is independent of corpus
  size.  The final top-K is a TakeOrdered over <=|charset|² rows.
* quantize: a pure per-row projection — zero shuffles, embarrassingly
  parallel, never moves the vectors.  All arithmetic follows the
  functions/vectors.py determinism contract (cast to double first,
  fold-ordered sums) so the DuckDB oracle hash-matches bit-for-bit;
  roundings use the shared floor-half-up idiom.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mini_hadoop_spark.functions.partitioning import spread_small_scan
from mini_hadoop_spark.functions.text import round_half_up, sql_round_half_up, tokens
from mini_hadoop_spark.functions.vectors import as_double, dot
from mini_hadoop_spark.sources.catalog import load_table

BPE_TOP_MERGES = 20

# int8 symmetric quantization: q = clamp(round(x / scale), ±127),
# scale = max|x| / 127.
QUANT_LEVELS = 127


def bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-``BPE_TOP_MERGES`` adjacent char pairs within tokens, by
    corpus-weighted count (every occurrence of every token counts).
    Ties break on the pair string so the cutoff is engine-stable.

    Output: (pair, cnt)."""
    d = spread_small_scan(load_table(spark, sf_dir, "documents"))
    tok = d.select(F.explode(tokens("text")).alias("tok")).where(F.length("tok") >= 2)
    pairs = tok.select(
        F.explode(
            F.expr("transform(sequence(1, length(tok) - 1), i -> substring(tok, i, 2))")
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("pair"))
        .limit(BPE_TOP_MERGES)
    )


BPE_MERGE_SQL = f"""
WITH tok AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok FROM documents
), pairs AS (
  SELECT unnest(list_transform(range(1, strlen(tok)), i -> substr(tok, i, 2))) AS pair
  FROM tok WHERE strlen(tok) >= 2
)
SELECT pair, count(*) AS cnt FROM pairs GROUP BY pair
ORDER BY cnt DESC, pair
LIMIT {BPE_TOP_MERGES}
"""


def quantize_embeddings_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector int8 quantization audit: scale, exact integer
    checksums of the quantized vector (sum / sum-of-abs — these are
    EXACT cross-engine, the strongest oracle signal), and
    reconstruction error (MSE + max abs error, 9-decimal rounded).

    Zero-vector guard: scale 0 -> q all zeros, zero error."""
    emb = spread_small_scan(load_table(spark, sf_dir, "embeddings"))
    d = emb.select("vec_id", as_double("embedding").alias("e"))
    max_abs = F.array_max(F.transform(F.col("e"), lambda x: F.abs(x)))
    d = d.withColumn("scale", max_abs / F.lit(float(QUANT_LEVELS)))
    lo, hi = F.lit(-QUANT_LEVELS).cast("long"), F.lit(QUANT_LEVELS).cast("long")
    q = F.when(
        F.col("scale") > 0,
        F.transform(
            F.col("e"),
            lambda x: F.greatest(lo, F.least(hi, F.floor(x / F.col("scale") + F.lit(0.5)))),
        ),
    ).otherwise(F.transform(F.col("e"), lambda x: F.lit(0).cast("long")))
    d = d.withColumn("q", q)
    err = F.zip_with(
        F.col("e"), F.col("q"), lambda x, qi: x - qi.cast("double") * F.col("scale")
    )
    d = d.withColumn("err", err).withColumn("n_dims", F.size("e").cast("long"))
    sum_q = F.aggregate(F.col("q"), F.lit(0).cast("long"), lambda acc, x: acc + x)
    sum_abs_q = F.aggregate(
        F.col("q"), F.lit(0).cast("long"), lambda acc, x: acc + F.abs(x)
    )
    mse = dot(F.col("err"), F.col("err")) / F.col("n_dims")
    max_err = F.array_max(F.transform(F.col("err"), lambda x: F.abs(x)))
    return d.select(
        "vec_id",
        "n_dims",
        round_half_up(F.col("scale"), 9).alias("scale_r"),
        sum_q.alias("sum_q"),
        sum_abs_q.alias("sum_abs_q"),
        round_half_up(mse, 9).alias("mse_r"),
        round_half_up(max_err, 9).alias("max_abs_err_r"),
    )


QUANTIZE_INT8_SQL = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
), s AS (
  SELECT vec_id, e, list_max(list_transform(e, x -> abs(x))) / {float(QUANT_LEVELS)} AS scale
  FROM e
), q AS (
  SELECT vec_id, e, scale,
         CASE WHEN scale > 0
              THEN list_transform(e, x -> greatest(CAST(-{QUANT_LEVELS} AS BIGINT),
                     least(CAST({QUANT_LEVELS} AS BIGINT), CAST(floor(x / scale + 0.5) AS BIGINT))))
              ELSE list_transform(e, x -> CAST(0 AS BIGINT)) END AS q
  FROM s
), err AS (
  SELECT vec_id, scale, q, CAST(len(e) AS BIGINT) AS n_dims,
         list_transform(range(1, len(e) + 1), i -> e[i] - q[i] * scale) AS err
  FROM q
)
SELECT vec_id, n_dims,
       {sql_round_half_up("scale", 9)} AS scale_r,
       CAST(list_sum(q) AS BIGINT) AS sum_q,
       CAST(list_sum(list_transform(q, x -> abs(x))) AS BIGINT) AS sum_abs_q,
       {sql_round_half_up("list_dot_product(err, err) / n_dims", 9)} AS mse_r,
       {sql_round_half_up("list_max(list_transform(err, x -> abs(x)))", 9)} AS max_abs_err_r
FROM err
"""


QUERIES = {
    "bpe_merge_candidates": bpe_merge_candidates,
    "quantize_embeddings_int8": quantize_embeddings_int8,
}

ORACLES = {
    "bpe_merge_candidates": BPE_MERGE_SQL,
    "quantize_embeddings_int8": QUANTIZE_INT8_SQL,
}
