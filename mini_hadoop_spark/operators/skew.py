"""Skew-handling operators: salted aggregation and salted broadcast join.

Hot keys are the canonical 100 TB failure mode: one reducer gets the
whale key's entire partition while 999 executors idle.  Two standard
mitigations, expressed as reusable DataFrame transforms:

* ``salted_agg`` — two-stage aggregation: stage 1 groups on
  (key, salt) so a hot key's rows spread over SALT_BUCKETS reducers and
  combine map-side; stage 2 merges the per-salt partials on the true
  key — a shuffle of at most |keys| x SALT_BUCKETS tiny rows.  The
  decomposition (count→sum, sum→sum, min→min, max→max,
  avg→sum/count-of-non-null) is value-exact for integers; for doubles
  the per-salt partial sums add in a different IEEE order than the
  single-stage plan, so equality holds to ~1 ulp (the registered query
  rounds at 4 dp, far coarser than the ulp drift on these magnitudes).
* ``salted_join`` — replicate the SMALL side SALT_BUCKETS times (one
  copy per salt value) and salt the big side's key deterministically, so
  a hot join key's rows land on SALT_BUCKETS different reducers.  Only
  worth it when the small side is too big to broadcast outright but the
  key histogram is spiked; with AQE's skew-join handling ON (session.py)
  Spark usually does this re-split automatically — this operator is the
  explicit form for engines/pipelines where the optimizer can't see the
  skew (e.g. a pre-partitioned bucketed table).

The salt is ``xxhash64(row-identity) % SALT_BUCKETS`` — deterministic,
so results are reproducible and oracle-checkable (no ``rand()``).

The registered query ``agg_salted_skew`` runs the salted two-stage plan
over ``events`` (5 event types x 100k rows = a genuinely spiked key
histogram) and must produce EXACTLY the rows of the plain one-stage
aggregation — same oracle SQL as ``events_type_value_stats``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W, functions as F

from mini_hadoop_spark.sources.catalog import load_table

SALT_BUCKETS = 16


def _salt(salt_on: str, buckets: int) -> Column:
    return F.pmod(F.xxhash64(F.col(salt_on)), F.lit(buckets))


def salted_agg(
    df: DataFrame,
    key: str,
    value: str,
    salt_on: str,
    buckets: int = SALT_BUCKETS,
) -> DataFrame:
    """Two-stage skew-safe aggregation of count/min/max/avg over
    ``value`` grouped by ``key``; ``salt_on`` is any column that varies
    within a key (an id / timestamp) to derive the deterministic salt.

    Output schema matches the plain single-stage aggregation:
    (key, n, min_v, max_v, avg_v)."""
    stage1 = (
        df.withColumn("_salt", _salt(salt_on, buckets))
        .groupBy(key, "_salt")
        .agg(
            F.count("*").alias("_n"),
            # avg ignores NULL values: its denominator is the non-null
            # count, NOT count(*) — they differ whenever value has nulls.
            F.count(value).alias("_nv"),
            F.sum(value).alias("_sum"),
            F.min(value).alias("_min"),
            F.max(value).alias("_max"),
        )
    )
    return (
        stage1.groupBy(key)
        .agg(
            F.sum("_n").alias("n"),
            F.round(F.min("_min"), 4).alias("min_v"),
            F.round(F.max("_max"), 4).alias("max_v"),
            F.round(F.sum("_sum") / F.sum("_nv"), 4).alias("avg_v"),
        )
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_on: str,
    buckets: int = SALT_BUCKETS,
) -> DataFrame:
    """Inner equi-join where ``big``'s key histogram is spiked: the big
    side gets a deterministic salt from ``salt_on``; the small side is
    exploded x``buckets`` (one row per salt value) so every
    (key, salt) pair still matches — the hot key's rows now spread over
    ``buckets`` reducers instead of one."""
    big_salted = big.withColumn("_salt", _salt(salt_on, buckets))
    small_exploded = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i).cast("bigint") for i in range(buckets)]))
    )
    return big_salted.join(small_exploded, [key, "_salt"]).drop("_salt")


def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events grouped by its 5-value event_type through the salted
    two-stage plan — result must be IDENTICAL to the single-stage
    ``events_type_value_stats`` (shared oracle)."""
    e = load_table(spark, sf_dir, "events")
    return salted_agg(e, key="event_type", value="value", salt_on="event_id").select(
        "event_type", "n", "min_v", "max_v", "avg_v"
    )


# Exactly the plain aggregation's SQL: the salted plan must be
# result-invariant (decomposed avg rounds identically at 4 dp).
AGG_SALTED_SQL = """
SELECT event_type, count(*) AS n,
       round(min(value), 4) AS min_v,
       round(max(value), 4) AS max_v,
       round(avg(value), 4) AS avg_v
FROM events GROUP BY event_type
"""

def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exercise ``salted_join`` on a genuinely spiked key: lineitem's
    3-value l_returnflag (≈N/3 rows per key — the whale-key shape).
    The small side is each flag's price midpoint (min+max)/2 — min/max
    are order-independent and the single division is one IEEE op, so
    the threshold is bit-identical cross-engine (no float-sum drift in
    the comparison).  Joined back salted, then a conditional count of
    rows above their flag's midpoint.

    Result must be IDENTICAL to the unsalted plain-join plan (the
    oracle is that plain join): salting is a physical rewrite only."""
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_orderkey", "l_extendedprice"
    )
    mid = l.groupBy("l_returnflag").agg(
        ((F.min("l_extendedprice") + F.max("l_extendedprice")) / 2).alias("mid")
    )
    joined = salted_join(l, mid, key="l_returnflag", salt_on="l_orderkey")
    return joined.groupBy("l_returnflag").agg(
        F.count("*").alias("n_total"),
        F.sum(F.when(F.col("l_extendedprice") > F.col("mid"), 1).otherwise(0)).alias(
            "n_above_mid"
        ),
    )


JOIN_SALTED_SQL = """
WITH mid AS (
  SELECT l_returnflag, (min(l_extendedprice) + max(l_extendedprice)) / 2 AS mid
  FROM lineitem GROUP BY l_returnflag
)
SELECT l.l_returnflag, count(*) AS n_total,
       sum(CASE WHEN l.l_extendedprice > m.mid THEN 1 ELSE 0 END)::BIGINT AS n_above_mid
FROM lineitem l JOIN mid m ON l.l_returnflag = m.l_returnflag
GROUP BY l.l_returnflag
"""


#: heavy-hitter keys reported by the skew diagnostic
HH_TOP = 20


def skew_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-histogram diagnostic — "measure before you salt": the top
    keys by row count with each key's share and cumulative share of the
    table.  This is the report that decides whether a join/agg key needs
    salting (one key at 30% → salt; flat top-20 → don't bother).

    Plan: one map-side-combined count per key (shuffle ≤ |keys| rows), a
    TakeOrdered top-k (per-partition heaps), a 1-row broadcast total,
    and rank/cumulative windows over the ≤``HH_TOP`` surviving rows.
    Shares are exact-integer divisions — bit-identical cross-engine."""
    e = load_table(spark, sf_dir, "events").select("user_id")
    counts = e.groupBy("user_id").agg(F.count("*").alias("cnt"))
    total = F.broadcast(counts.agg(F.sum("cnt").alias("total")))
    top = counts.orderBy(F.desc("cnt"), "user_id").limit(HH_TOP)
    order = [F.desc("cnt"), F.asc("user_id")]
    w_run = W.orderBy(*order).rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        top.crossJoin(total)
        .select(
            "user_id",
            "cnt",
            F.row_number().over(W.orderBy(*order)).alias("rnk"),
            _round6(F.col("cnt").cast("double") / F.col("total").cast("double")).alias("share"),
            _round6(
                F.sum("cnt").over(w_run).cast("double") / F.col("total").cast("double")
            ).alias("cum_share"),
        )
    )


def _round6(col: Column) -> Column:
    """floor-half-up at 6 dp — identical IEEE ops on both engines (the
    shared idiom from functions/text.py, local to avoid a text import
    in the skew module)."""
    return F.floor(col * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


SKEW_HH_SQL = f"""
WITH c AS (
  SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id
), t AS (
  SELECT sum(cnt) AS total FROM c
), top AS (
  SELECT * FROM c ORDER BY cnt DESC, user_id LIMIT {HH_TOP}
)
SELECT user_id, cnt,
       row_number() OVER (ORDER BY cnt DESC, user_id) AS rnk,
       CAST(floor(CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE) * 1e6 + 0.5) AS BIGINT) / 1e6 AS share,
       CAST(floor(CAST(sum(cnt) OVER (ORDER BY cnt DESC, user_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / CAST(total AS DOUBLE) * 1e6 + 0.5) AS BIGINT) / 1e6 AS cum_share
FROM top, t
"""


QUERIES = {
    "agg_salted_skew": agg_salted_skew,
    "join_salted_skew": join_salted_skew,
    "skew_heavy_hitters": skew_heavy_hitters,
}

ORACLES = {
    "agg_salted_skew": AGG_SALTED_SQL,
    "join_salted_skew": JOIN_SALTED_SQL,
    "skew_heavy_hitters": SKEW_HH_SQL,
}
