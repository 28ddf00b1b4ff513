"""TPC-H-shaped relational widening — the classic decision-support query
shapes adapted to the driver's schema (no partsupp / shipmode / commitdate
/ phone columns).  As of r6 ALL 22 TPC-H query SHAPES are covered:
Q1/Q3/Q5-Q10/Q13/Q14/Q18/Q19/Q22 near-literally, Q2/Q11/Q12/Q15/Q16/Q20/Q21
as documented nearest-shape adaptations in this module (each docstring
states the substitution), Q4's EXISTS shape as
``subquery_exists_priority`` and Q17's correlated avg as
``correlated_scalar_subquery`` (operators/relational_ext.py).

The reference (dis-functional-bros/mini-hadoop) has no relational layer at
all — its only dataflow is flatMap + group-reduce (SURVEY.md §2.3), so this
whole battery is the "capability-equivalent upgrade" surface: every query
is a declarative Catalyst plan with a DuckDB oracle twin.

Scale posture, per query, is noted on the docstring: the recurring shapes
are (a) selective dim filter → broadcast-able join → keyed shuffle agg,
(b) two-level aggregation where the second level is tiny, and (c)
disjunctive predicates that Catalyst still pushes to the parquet scan as
an OR filter.  Nothing here shuffles more than once on a fact table except
the self-aggregating Q18 (agg → join back), whose first agg output is
|orderkey| rows but immediately filtered by HAVING before the join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mini_hadoop_spark.sources.catalog import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# Exact-decimal revenue term: float sums are order-dependent (Spark's
# partial aggregation order differs run-to-run and from DuckDB's), and a
# sum that lands within ~1 ulp of a rounding boundary then hash-mismatches
# (observed: q10 at sf0.01, 307843.595 rounding either way).  Casting each
# term to DECIMAL first makes the sum exact and order-independent on both
# engines; the final cast back to double is then bit-identical.
def _dec(col: str):
    return F.col(col).cast("decimal(18,6)")


def _rev():
    """l_extendedprice * (1 - l_discount) as an exact decimal term."""
    return _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,6)") - _dec("l_discount"))


REV_SQL = "l_extendedprice::DECIMAL(18,6) * (1::DECIMAL(18,6) - l_discount::DECIMAL(18,6))"


# ---------------------------------------------------------------------------
# Q6: forecasting revenue change — pure scan + filter + global agg
# ---------------------------------------------------------------------------

def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: no join at all — a triple-predicate scan and one
    global sum.  All three predicates push to the parquet reader
    (PushedFilters); the agg moves one partial row per task.  The
    canonical 'is your pushdown working' probe: at 100 TB this reads only
    the 4 referenced columns and row-groups whose shipdate range
    overlaps."""
    l = _t(spark, sf_dir, "lineitem")
    out = (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(_dec("l_extendedprice") * _dec("l_discount")), 2)
            .cast("double")
            .alias("revenue")
        )
    )
    return out


Q6_SQL = """
SELECT CAST(round(sum(l_extendedprice::DECIMAL(18,6) * l_discount::DECIMAL(18,6)), 2) AS DOUBLE)
           AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


# ---------------------------------------------------------------------------
# Q7: volume shipping between two nations
# ---------------------------------------------------------------------------

def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: lineitem⋈supplier⋈orders⋈customer with BOTH ends
    resolved to nations and the (supp_nation, cust_nation) pair
    restricted to {(N3,N7),(N7,N3)}.  nation is 25 rows (broadcast);
    supplier/customer are SF-scaled but the nation filter makes the
    joined dims small — AQE decides broadcast vs shuffle.  The only big
    shuffles are lineitem⋈orders on orderkey and the final tiny 3-key
    agg."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")

    n1 = F.broadcast(n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")))
    sup = s.join(n1, s.s_nationkey == F.col("s_nk")).select("s_suppkey", "supp_nation")
    cus = c.join(n2, c.c_nationkey == F.col("c_nk")).select("c_custkey", "cust_nation")

    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))

    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01")) & (F.col("l_shipdate") < F.lit("1998-01-01"))
        )
        .join(sup, l.l_suppkey == sup.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(cus, o.o_custkey == cus.c_custkey)
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(_rev()), 2).cast("double").alias("revenue"))
    )


Q7_SQL = f"""
SELECT supp_nation, cust_nation, l_year, CAST(round(sum(volume), 2) AS DOUBLE) AS revenue
FROM (
    SELECT ns.n_name AS supp_nation,
           nc.n_name AS cust_nation,
           year(l.l_shipdate) AS l_year,
           {REV_SQL} AS volume
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation nc  ON c.c_nationkey = nc.n_nationkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
      AND ((ns.n_name = 'NATION_3' AND nc.n_name = 'NATION_7')
        OR (ns.n_name = 'NATION_7' AND nc.n_name = 'NATION_3'))
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""


# ---------------------------------------------------------------------------
# Q8: national market share within a region
# ---------------------------------------------------------------------------

def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: share of one supplier-nation's revenue in a
    region's purchases of one part type, per year.  part is filtered on
    p_type first (selective → broadcast-able), region restricts the
    customer side via nation⋈region (both tiny, broadcast).  The
    conditional share is sum(CASE)/sum — a single agg, no second pass."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    p = _t(spark, sf_dir, "part")

    pf = p.filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    # customer-side nation must sit in EUROPE
    ncr = F.broadcast(
        n.join(r, n.n_regionkey == r.r_regionkey)
        .filter(F.col("r_name") == "EUROPE")
        .select(F.col("n_nationkey").alias("c_nk"))
    )
    ns = F.broadcast(n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")))

    vol = (
        l.join(pf, l.l_partkey == pf.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") < F.lit("1998-01-01"))
        )
        .join(c, o.o_custkey == c.c_custkey)
        .join(ncr, c.c_nationkey == F.col("c_nk"))
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(ns, s.s_nationkey == F.col("s_nk"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            _rev().alias("volume"),
            "supp_nation",
        )
    )
    zero = F.lit(0).cast("decimal(38,12)")
    return vol.groupBy("o_year").agg(
        F.round(
            F.sum(F.when(F.col("supp_nation") == "NATION_5", F.col("volume")).otherwise(zero))
            .cast("double")
            / F.sum("volume").cast("double"),
            6,
        ).alias("mkt_share")
    )


Q8_SQL = f"""
SELECT o_year,
       round(CAST(sum(CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE 0 END) AS DOUBLE)
             / CAST(sum(volume) AS DOUBLE), 6)
           AS mkt_share
FROM (
    SELECT year(o.o_orderdate) AS o_year,
           {REV_SQL} AS volume,
           ns.n_name AS supp_nation
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation nc  ON c.c_nationkey = nc.n_nationkey
    JOIN region r   ON nc.n_regionkey = r.r_regionkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
    WHERE p.p_type = 'ECONOMY'
      AND r.r_name = 'EUROPE'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
) all_nations
GROUP BY o_year
"""


# ---------------------------------------------------------------------------
# Q10: returned-item reporting — top 20 customers by lost revenue
# ---------------------------------------------------------------------------

def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: quarter of orders ⋈ their returned lineitems ⋈
    customer ⋈ nation, agg revenue per customer, top 20.  The orderdate
    filter and l_returnflag='R' both push down; the final TakeOrdered is
    per-partition heaps + a 20-row driver merge, not a global sort."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")

    return (
        l.filter(F.col("l_returnflag") == "R")
        .join(
            o.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01"))
                & (F.col("o_orderdate") < F.lit("1996-04-01"))
            ),
            l.l_orderkey == o.o_orderkey,
        )
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(_rev()), 2).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


Q10_SQL = f"""
SELECT c_custkey, c_name, c_acctbal, n_name,
       CAST(round(sum({REV_SQL}), 2) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1996-04-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Q13: customer order-count distribution (left outer + double agg)
# ---------------------------------------------------------------------------

def q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: LEFT OUTER customer⋈orders (customers with no
    matching orders must appear with count 0 — count(o_orderkey) skips
    nulls), then the distribution of that count.  Two aggs: the first
    shuffles on custkey (SF-scaled), the second is |distinct counts|
    rows — tiny.  The priority filter stands in for TPC-H's comment
    anti-pattern (the schema has no o_comment)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


Q13_SQL = """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
    SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
    FROM customer c
    LEFT OUTER JOIN (SELECT * FROM orders WHERE o_orderpriority <> '1-URGENT') o
        ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
) c_orders
GROUP BY c_count
"""


# ---------------------------------------------------------------------------
# Q14: promotion revenue share (conditional agg over a join)
# ---------------------------------------------------------------------------

def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: one month of lineitem ⋈ part, promo share =
    100 * sum(CASE p_type)/sum(all).  The shipdate filter pushes down;
    part joins on partkey (broadcast under threshold, else shuffle both
    sides on partkey — AQE's call).  Single agg, single output row."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    zero = F.lit(0).cast("decimal(38,12)")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-09-01")) & (F.col("l_shipdate") < F.lit("1996-10-01"))
        )
        .join(p, l.l_partkey == p.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", _rev()).otherwise(zero)).cast("double")
                / F.sum(_rev()).cast("double"),
                6,
            ).alias("promo_revenue_pct")
        )
    )


Q14_SQL = f"""
SELECT round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                              THEN {REV_SQL} ELSE 0 END) AS DOUBLE)
             / CAST(sum({REV_SQL}) AS DOUBLE), 6) AS promo_revenue_pct
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
  AND l.l_shipdate <  TIMESTAMP '1996-10-01'
"""


# ---------------------------------------------------------------------------
# Q18: large-volume orders (self-agg + join back)
# ---------------------------------------------------------------------------

def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds a threshold.
    The lineitem self-agg shuffles once on orderkey; HAVING cuts it to a
    handful of keys BEFORE the join back to orders/customer, so the
    second join's build side is tiny (AQE broadcasts it).  Top-100 by
    totalprice via TakeOrdered."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")

    big = (
        l.groupBy("l_orderkey")
        .agg(F.round(F.sum(_dec("l_quantity")), 2).cast("double").alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


Q18_SQL = """
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       round(o_totalprice, 2) AS o_totalprice,
       total_qty
FROM orders o
JOIN (
    SELECT l_orderkey, CAST(round(sum(l_quantity::DECIMAL(18,6)), 2) AS DOUBLE) AS total_qty
    FROM lineitem
    GROUP BY l_orderkey
    HAVING CAST(round(sum(l_quantity::DECIMAL(18,6)), 2) AS DOUBLE) > 250
) big ON o.o_orderkey = big.l_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


# ---------------------------------------------------------------------------
# Q19: disjunctive brand/size/quantity predicate (OR-of-ANDs pushdown)
# ---------------------------------------------------------------------------

def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR of three (brand, size-range,
    qty-range) conjunctions.  The interesting plan property: Catalyst
    extracts the common join key and pushes the disjunction as a single
    OR filter after the join (and the qty bounds' common superset
    l_quantity BETWEEN 1 AND 40 CAN push to the scan).  One join + one
    global agg."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = l.join(p, l.l_partkey == p.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & (F.col("p_size").between(1, 15))
            & (F.col("l_quantity").between(1, 11))
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & (F.col("p_size").between(1, 25))
            & (F.col("l_quantity").between(10, 20))
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & (F.col("p_size").between(1, 35))
            & (F.col("l_quantity").between(20, 40))
        )
    )
    return j.filter(cond).agg(
        F.round(F.sum(_rev()), 2).cast("double").alias("revenue")
    )


Q19_SQL = f"""
SELECT CAST(round(sum({REV_SQL}), 2) AS DOUBLE) AS revenue
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25 AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35 AND l.l_quantity BETWEEN 20 AND 40)
"""


# ---------------------------------------------------------------------------
# Q22-adapted: rich customers gone quiet (global scalar + anti join + agg)
# ---------------------------------------------------------------------------

def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape adapted (schema has no c_phone): customers whose
    acctbal exceeds the global positive-balance average AND who placed no
    order after 2000-01-01, grouped by nation.  Three pieces: a 1-row
    scalar broadcast (the avg), a LEFT ANTI join against the filtered
    orders (semi-join shuffle on custkey, no row multiplication), and a
    25-key agg.  At 100 TB: the anti join's right side is date-pruned at
    the scan before the shuffle."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")

    # exact-decimal avg: a float avg differs from DuckDB's in the last ulp
    # (summation order), and a customer whose balance sits within that ulp
    # of the threshold would flip membership between engines
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        (F.sum(_dec("c_acctbal")).cast("double") / F.count("*")).alias("avg_bal")
    )
    recent = o.filter(F.col("o_orderdate") >= F.lit("2000-01-01")).select("o_custkey")
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum(_dec("c_acctbal")), 2).cast("double").alias("totacctbal"),
        )
    )


Q22_SQL = """
SELECT n_name, CAST(count(*) AS BIGINT) AS numcust,
       CAST(round(sum(c_acctbal::DECIMAL(18,6)), 2) AS DOUBLE) AS totacctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE c.c_acctbal > (SELECT CAST(sum(c_acctbal::DECIMAL(18,6)) AS DOUBLE) / count(*)
                     FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderdate >= TIMESTAMP '2000-01-01'
  )
GROUP BY n_name
"""


# ---------------------------------------------------------------------------
# Q2 shape: min-cost supplier per part within a region — correlated min
# over a 4-dim join.  Adaptation: no partsupp table, so the "offer" is the
# minimum l_extendedprice a supplier ever shipped that part at.
# ---------------------------------------------------------------------------

def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for ECONOMY parts of size <= 10, the EUROPE
    supplier(s) offering the minimal price.  Plan: broadcast the dim
    chain region→nation→supplier and the filtered part list onto the
    lineitem scan, aggregate min offer per (part, supplier), derive the
    per-part minimum with a second (tiny, |parts|-row) aggregate and
    join back on equality — the correlated-subquery shape without a
    window, so no per-part sort and every shuffle is keyed.  Ties (two
    suppliers at the same min) are all emitted, deterministically."""
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    p = _t(spark, sf_dir, "part")

    eu_nations = n.join(
        F.broadcast(r.filter(F.col("r_name") == "EUROPE")),
        n.n_regionkey == F.col("r_regionkey"),
    ).select("n_nationkey", "n_name")
    eu_sup = s.join(
        F.broadcast(eu_nations), s.s_nationkey == F.col("n_nationkey")
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    parts = p.filter((F.col("p_type") == "ECONOMY") & (F.col("p_size") <= 10)).select(
        "p_partkey", "p_name"
    )
    offers = (
        l.join(F.broadcast(eu_sup.select("s_suppkey")), l.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(parts), l.l_partkey == F.col("p_partkey"))
        .groupBy("p_partkey", "l_suppkey")
        .agg(F.min(_dec("l_extendedprice")).alias("offer"))
    )
    best = offers.groupBy("p_partkey").agg(F.min("offer").alias("best_offer"))
    return (
        offers.join(best, "p_partkey")
        .filter(F.col("offer") == F.col("best_offer"))
        .join(F.broadcast(eu_sup), offers.l_suppkey == eu_sup.s_suppkey)
        .join(F.broadcast(parts), "p_partkey")
        .select(
            "s_acctbal",
            "s_name",
            F.col("n_name").alias("nation"),
            "p_partkey",
            "p_name",
            F.col("offer").cast("double").alias("min_price"),
        )
    )


Q2_SQL = """
WITH eu_sup AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
), parts AS (
  SELECT p_partkey, p_name FROM part WHERE p_type = 'ECONOMY' AND p_size <= 10
), offers AS (
  SELECT p_partkey, l_suppkey, min(l_extendedprice::DECIMAL(18,6)) AS offer
  FROM lineitem JOIN eu_sup ON l_suppkey = s_suppkey
  JOIN parts ON l_partkey = p_partkey
  GROUP BY 1, 2
), best AS (
  SELECT p_partkey, min(offer) AS best_offer FROM offers GROUP BY 1
)
SELECT s_acctbal, s_name, n_name AS nation, o.p_partkey, p_name,
       CAST(offer AS DOUBLE) AS min_price
FROM offers o
JOIN best b ON o.p_partkey = b.p_partkey AND o.offer = b.best_offer
JOIN eu_sup ON o.l_suppkey = s_suppkey
JOIN parts ON o.p_partkey = parts.p_partkey
"""


# ---------------------------------------------------------------------------
# Q11 shape: important stock — keyed value aggregate filtered against a
# global-total scalar.  Adaptation: "stock value" is shipped
# extendedprice x quantity for suppliers of one nation (no partsupp).
# ---------------------------------------------------------------------------

def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part shipped value for NATION_1's suppliers,
    keeping parts above 0.1% of the nation's total.  Exact DECIMAL
    value sums; the HAVING threshold compares CAST-to-double on both
    sides with the identical op sequence (cast, multiply by the same
    literal, compare), so row selection is bit-deterministic.  Plan:
    one keyed aggregate + a 1-row broadcast scalar — the global total
    reuses the per-part aggregate (ReusedExchange), no second scan."""
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    nat_sup = s.join(
        F.broadcast(n.filter(F.col("n_name") == "NATION_1")),
        s.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey")
    vals = (
        l.join(F.broadcast(nat_sup), l.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(_dec("l_extendedprice") * _dec("l_quantity")).alias("value_d"))
    )
    total = vals.agg(F.sum("value_d").alias("total_d"))
    return (
        vals.crossJoin(F.broadcast(total))
        .filter(F.col("value_d").cast("double") > F.lit(0.001) * F.col("total_d").cast("double"))
        .select(
            "l_partkey",
            F.round(F.col("value_d"), 2).cast("double").alias("part_value"),
        )
    )


Q11_SQL = """
WITH nat_sup AS (
  SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_1'
), vals AS (
  -- operand widths chosen so the product type is DECIMAL(38,12): DuckDB
  -- sizes a product as (w1+w2, s1+s2) and overflows rather than widen
  SELECT l_partkey,
         sum(l_extendedprice::DECIMAL(24,6) * l_quantity::DECIMAL(14,6)) AS value_d
  FROM lineitem JOIN nat_sup ON l_suppkey = s_suppkey
  GROUP BY 1
), tot AS (
  SELECT sum(value_d) AS total_d FROM vals
)
SELECT l_partkey, CAST(round(value_d, 2) AS DOUBLE) AS part_value
FROM vals, tot
WHERE CAST(value_d AS DOUBLE) > 0.001 * CAST(total_d AS DOUBLE)
"""


# ---------------------------------------------------------------------------
# Q12 shape: shipping-delay priority audit.  Adaptation: no
# l_shipmode/l_commitdate — "mode" is l_linestatus and "late" is a
# ship-after-order lag over 60 days.
# ---------------------------------------------------------------------------

def q12_shipping_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: among lineitems shipped > 60 days after their
    order date in 1996, per linestatus count critical-priority
    (1-URGENT/2-HIGH) vs other orders.  Plan: one orderkey join (the
    only fact shuffle) + conditional-sum aggregate over a 2-value key;
    the date-range filter pushes to the lineitem scan."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
        )
        .join(o, l.l_orderkey == o.o_orderkey)
        .filter(F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")) > 60)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(crit, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~crit, 1).otherwise(0)).alias("low_line_count"),
        )
    )


Q12_SQL = """
SELECT l_linestatus,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)::BIGINT
           AS high_line_count,
       sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)::BIGINT
           AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_shipdate::DATE - o_orderdate::DATE > 60
GROUP BY l_linestatus
"""


# ---------------------------------------------------------------------------
# Q15 shape: top supplier by quarterly revenue — revenue view + max
# scalar + equality join back (ties all emitted).
# ---------------------------------------------------------------------------

def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: per-supplier 1996Q1 revenue, returning the
    supplier(s) achieving the maximum.  Exact DECIMAL revenue rounded
    to 2 before the max/equality, so the tie set is bit-deterministic
    across engines.  Plan: one keyed aggregate, a 1-row broadcast max
    (ReusedExchange of the same aggregate), broadcast supplier names."""
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    rev = (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-04-01"))
        )
        .groupBy("l_suppkey")
        .agg(F.round(F.sum(_rev()), 2).cast("double").alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(s.select("s_suppkey", "s_name")), rev.l_suppkey == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


Q15_SQL = f"""
WITH rev AS (
  SELECT l_suppkey, CAST(round(sum({REV_SQL}), 2) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY 1
)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
"""


# ---------------------------------------------------------------------------
# Q16 shape: supplier counts by part attribute, excluding flagged
# suppliers.  Adaptation: the (partkey, suppkey) relation comes from
# lineitem (no partsupp); "complaint" suppliers = negative acctbal.
# ---------------------------------------------------------------------------

def q16_parts_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier count per (brand, type, size)
    for non-Brand#1, non-PROMO parts in six sizes, excluding suppliers
    with negative balances via a broadcast ANTI join.  Plan: the
    distinct-pair projection shuffles (partkey, suppkey) once; the
    count-distinct agg keys on the 3 attributes; every dim side is
    broadcast."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    s = _t(spark, sf_dir, "supplier")
    parts = p.filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 11, 20, 35, 50)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = s.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        l.select("l_partkey", "l_suppkey")
        .join(F.broadcast(parts), l.l_partkey == parts.p_partkey)
        .join(F.broadcast(bad), l.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1, 5, 11, 20, 35, 50)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# Q20 shape: suppliers with excess shipped volume — nested IN with a
# self-referential scalar threshold.
# ---------------------------------------------------------------------------

def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers whose 1996 shipped quantity of
    'small *' parts exceeds half the average such quantity — a nested
    aggregate feeding an IN-list, threshold self-referential so the
    semantics are scale-free.  Quantities are integral by data contract
    (1..50), summed as BIGINT — the threshold comparison
    ``2 * n * qty > total`` is pure integer arithmetic, bit-identical
    on both engines.  Plan: one keyed BIGINT aggregate over the
    part-filtered scan + a 1-row broadcast (total, n) scalar; supplier
    and nation names broadcast onto the survivors."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    small = p.filter(F.col("p_name").startswith("small ")).select("p_partkey")
    qty = (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
        )
        .join(F.broadcast(small), l.l_partkey == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("qty"))
    )
    scalar = qty.agg(
        F.sum("qty").alias("total_qty"), F.count("*").alias("n_sup")
    )
    keep = (
        qty.crossJoin(F.broadcast(scalar))
        .filter(F.lit(2) * F.col("n_sup") * F.col("qty") > F.col("total_qty"))
        .select("l_suppkey", "qty")
    )
    nm = n.select(F.col("n_nationkey").alias("nk"), F.col("n_name").alias("nation"))
    return (
        keep.join(F.broadcast(s), keep.l_suppkey == s.s_suppkey)
        .join(F.broadcast(nm), F.col("s_nationkey") == F.col("nk"))
        .select("s_suppkey", "s_name", "nation", "qty")
    )


Q20_SQL = """
WITH qty AS (
  SELECT l_suppkey, sum(l_quantity::BIGINT)::BIGINT AS qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'small %'
    AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY 1
), scalar AS (
  SELECT sum(qty)::BIGINT AS total_qty, count(*) AS n_sup FROM qty
)
SELECT s_suppkey, s_name, n_name AS nation, qty.qty AS qty
FROM qty, scalar
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE 2 * n_sup * qty.qty > total_qty
"""


# ---------------------------------------------------------------------------
# Q21 shape: suppliers who kept orders waiting — per-order exists /
# not-exists over the same fact.  Adaptation: no receipt/commit dates, so
# "the one who kept the order waiting" = the UNIQUE latest-shipping
# supplier on a multi-supplier finalized order.
# ---------------------------------------------------------------------------

def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: for finalized ('F') multi-supplier orders where
    exactly ONE supplier shipped last, count such orders per supplier
    (numwait).  EXISTS (another supplier on the order) and NOT EXISTS
    (another supplier also at the max ship date) fold into window
    aggregates over ONE hash(l_orderkey) clustering (r17; previously an
    orderkey agg + a two-key (orderkey, max date) join-back that
    re-shuffled the full lines stream twice more): max_ship, the
    distinct-supplier count, and the distinct-suppliers-at-max count are
    all whole-partition window values, the survivors collapse to one row
    per order with a partitioning-preserving dropDuplicates(orderkey)
    (within a surviving order every at-max row carries the SAME
    supplier — n_at_max == 1 — so the pick is deterministic), and no
    correlated per-row probes remain.  Restricted to EUROPE suppliers
    (broadcast dim chain)."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")

    f_orders = o.filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    lines = l.join(f_orders, l.l_orderkey == F.col("o_orderkey")).select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    w_ok = W.partitionBy("l_orderkey")
    lines2 = lines.withColumn("max_ship", F.max("l_shipdate").over(w_ok)).withColumn(
        "n_sup", F.size(F.collect_set("l_suppkey").over(w_ok))
    )
    lines3 = lines2.withColumn(
        "n_at_max",
        F.size(
            F.collect_set(
                F.when(F.col("l_shipdate") == F.col("max_ship"), F.col("l_suppkey"))
            ).over(w_ok)
        ),
    )
    waiting = (
        lines3.filter(
            (F.col("l_shipdate") == F.col("max_ship"))
            & (F.col("n_sup") > 1)
            & (F.col("n_at_max") == 1)
        )
        .dropDuplicates(["l_orderkey"])
        .select("l_orderkey", "l_suppkey")
    )
    eu_sup = (
        s.join(
            F.broadcast(
                n.join(
                    F.broadcast(r.filter(F.col("r_name") == "EUROPE")),
                    n.n_regionkey == F.col("r_regionkey"),
                ).select("n_nationkey")
            ),
            s.s_nationkey == F.col("n_nationkey"),
        ).select("s_suppkey", "s_name")
    )
    return (
        waiting.join(F.broadcast(eu_sup), waiting.l_suppkey == eu_sup.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count("*").alias("numwait"))
    )


Q21_SQL = """
WITH lines AS (
  SELECT l_orderkey, l_suppkey, l_shipdate
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
), per_order AS (
  SELECT l_orderkey, max(l_shipdate) AS max_ship,
         count(DISTINCT l_suppkey) AS n_sup
  FROM lines GROUP BY 1
), at_max AS (
  SELECT DISTINCT l.l_orderkey AS ok, l.l_suppkey, p.n_sup
  FROM lines l JOIN per_order p
    ON l.l_orderkey = p.l_orderkey AND l.l_shipdate = p.max_ship
), waiting AS (
  SELECT ok, l_suppkey FROM (
    SELECT ok, l_suppkey, n_sup, count(*) OVER (PARTITION BY ok) AS n_at_max
    FROM at_max
  ) WHERE n_sup > 1 AND n_at_max = 1
), eu_sup AS (
  SELECT s_suppkey, s_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
)
SELECT s_suppkey, s_name, count(*)::BIGINT AS numwait
FROM waiting JOIN eu_sup ON l_suppkey = s_suppkey
GROUP BY 1, 2
"""


QUERIES = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q11_important_stock": q11_important_stock,
    "q12_shipping_delay": q12_shipping_delay,
    "q15_top_supplier": q15_top_supplier,
    "q16_parts_supplier_counts": q16_parts_supplier_counts,
    "q20_excess_suppliers": q20_excess_suppliers,
    "q21_waiting_suppliers": q21_waiting_suppliers,
    "q6_revenue_forecast": q6_revenue_forecast,
    "q7_volume_shipping": q7_volume_shipping,
    "q8_market_share": q8_market_share,
    "q10_returned_items": q10_returned_items,
    "q13_custdist": q13_custdist,
    "q14_promo_revenue": q14_promo_revenue,
    "q18_large_orders": q18_large_orders,
    "q19_disjunctive_revenue": q19_disjunctive_revenue,
    "q22_idle_rich_customers": q22_idle_rich_customers,
}

ORACLES = {
    "q2_min_cost_supplier": Q2_SQL,
    "q11_important_stock": Q11_SQL,
    "q12_shipping_delay": Q12_SQL,
    "q15_top_supplier": Q15_SQL,
    "q16_parts_supplier_counts": Q16_SQL,
    "q20_excess_suppliers": Q20_SQL,
    "q21_waiting_suppliers": Q21_SQL,
    "q6_revenue_forecast": Q6_SQL,
    "q7_volume_shipping": Q7_SQL,
    "q8_market_share": Q8_SQL,
    "q10_returned_items": Q10_SQL,
    "q13_custdist": Q13_SQL,
    "q14_promo_revenue": Q14_SQL,
    "q18_large_orders": Q18_SQL,
    "q19_disjunctive_revenue": Q19_SQL,
    "q22_idle_rich_customers": Q22_SQL,
}
