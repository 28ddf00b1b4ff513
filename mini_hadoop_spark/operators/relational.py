"""Relational operator battery — scans, filters, joins, aggregations,
windows, sorts, set ops, scalar functions.

The reference has NO relational operators (SURVEY.md §2.3) — its only
dataflow is flatMap + group-reduce.  This module operationalizes the
"Spark gives it for free" claim into checked artifacts: every query here
is a Catalyst-optimized DataFrame plan with a DuckDB oracle twin
(ORACLES).  Conventions for oracle hash parity:

  * every computed double is ``round(x, N)`` on BOTH sides;
  * timestamps are emitted as formatted strings;
  * DuckDB integer sums are cast to BIGINT (DuckDB's sum(BIGINT) is
    HUGEINT, which would not hash-match Spark's LongType);
  * rollup/cube grouping nulls are coalesced to 'ALL' on both sides;
  * every LIMIT has a deterministic total tiebreak order.

Scale notes are on each query: what shuffles, what broadcasts, what
pushes down.  At 100 TB the dimension tables (region/nation/supplier/
part/customer) stay broadcast-able; lineitem/orders/events shuffles are
keyed hash shuffles that AQE re-plans (coalesce + skew split).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mini_hadoop_spark.sources.catalog import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# TPC-H-style headline queries
# ---------------------------------------------------------------------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan with pushed-down date filter, 8-agg hash
    aggregate on 2 low-cardinality keys.  One shuffle (partial agg map-side
    — the upgraded version of the reference's map-side grouping,
    task_result_storage.ex:291-304)."""
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
    return (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))), 2
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                           AS sum_qty,
       round(sum(l_extendedprice), 2)                                      AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)                   AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)     AS sum_charge,
       round(avg(l_quantity), 6)                                           AS avg_qty,
       round(avg(l_extendedprice), 6)                                      AS avg_price,
       round(avg(l_discount), 6)                                           AS avg_disc,
       count(*)                                                            AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → join → agg → top-10.
    The filtered customer broadcasts when it fits (threshold + AQE decide
    — no forced hint, since customer scales with SF); orders joins
    lineitem on the shuffle key l_orderkey; top-k via
    TakeOrderedAndProject (no full sort at scale)."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1998-03-15"))
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1998-03-15"))
    joined = l.join(o, l.l_orderkey == o.o_orderkey).join(
        c, o.o_custkey == c.c_custkey
    )
    agg = (
        joined.groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )
    return (
        agg.orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
        .select(
            "o_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
    )


Q3_SQL = """
SELECT o_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       strftime(o_orderdate, '%Y-%m-%d')                 AS o_orderdate,
       o_orderpriority
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate  > TIMESTAMP '1998-03-15'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 5-way join; the only big shuffle is
    lineitem⋈orders on l_orderkey.

    Broadcast hints ONLY on the fixed-cardinality dims (region=5,
    nation=25).  supplier/customer scale with SF, so their join strategy
    is left to the autoBroadcastJoinThreshold + AQE: they broadcast at
    small SF and fall back to shuffle joins at 100 TB instead of OOMing
    the executors on a forced hint."""
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    l = _t(spark, sf_dir, "lineitem")
    joined = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(c, (o.o_custkey == c.c_custkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return joined.groupBy("n_name").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
    )


Q5_SQL = """
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
"""


# ---------------------------------------------------------------------------
# Operator-focused queries
# ---------------------------------------------------------------------------

def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate pushdown + column pruning: the parquet scan must read only
    4 of 11 columns and apply both filters at the source (PushedFilters in
    .explain)."""
    l = _t(spark, sf_dir, "lineitem")
    # round-half-up via floor(x*100 + 0.5)/100.0: identical IEEE double ops
    # on both engines (Spark's F.round uses BigDecimal HALF_UP; DuckDB's
    # round resolves halfway doubles differently — a one-cent divergence).
    net = F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5) / F.lit(100.0)
    return (
        l.filter((F.col("l_shipdate") < F.lit("1996-01-01")) & (F.col("l_discount") > 0.05))
        .select("l_orderkey", "l_linenumber", net.alias("net_price"))
    )


FILTER_PROJECT_SQL = """
SELECT l_orderkey, l_linenumber,
       CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT) / 100.0 AS net_price
FROM lineitem
WHERE l_shipdate < TIMESTAMP '1996-01-01' AND l_discount > 0.05
"""


def join_inner_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders ⋈ customer (shuffle on custkey unless broadcast) + hash agg."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_spent"),
        )
    )


JOIN_INNER_SQL = """
SELECT c_mktsegment, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total_spent
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def join_left_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers without matching high-value
    orders; null-aware count."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_big_orders"))
    )


JOIN_LEFT_SQL = """
SELECT c_custkey, count(o_orderkey) AS n_big_orders
FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 400000) o
  ON c_custkey = o_custkey
GROUP BY c_custkey
"""


def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as a left-semi join (no row multiplication, build side can
    broadcast)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


JOIN_SEMI_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
"""


def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as a left-anti join: customers who never triggered an
    'error' event."""
    c = _t(spark, sf_dir, "customer")
    e = _t(spark, sf_dir, "events").filter(F.col("event_type") == "error")
    return c.join(e, c.c_custkey == e.user_id, "left_anti").select("c_custkey", "c_mktsegment")


JOIN_ANTI_SQL = """
SELECT c_custkey, c_mktsegment FROM customer
WHERE NOT EXISTS (SELECT 1 FROM events
                  WHERE user_id = c_custkey AND event_type = 'error')
"""


def join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-join through two broadcast dims (customer→nation→region): no
    shuffle of the fact side at all."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("sum_acctbal"),
        )
    )


JOIN_BROADCAST_SQL = """
SELECT r_name, count(*) AS n_customers, round(sum(c_acctbal), 2) AS sum_acctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) — expands to a two-phase agg under Catalyst; plus
    approx_count_distinct is the at-scale variant (HLL, single pass) kept
    out of the checked columns (nondeterministic across engines)."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count("*").alias("n_orders"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
    )


AGG_DISTINCT_SQL = """
SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_customers,
       count(*) AS n_orders, round(avg(o_totalprice), 4) AS avg_price
FROM orders GROUP BY o_orderpriority
"""


def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping hierarchy; grouping nulls coalesced to 'ALL' for
    oracle hash parity."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count("*").alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("l_returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("l_linestatus"),
            "sum_qty",
            "n",
        )
    )


AGG_ROLLUP_SQL = """
SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
       coalesce(l_linestatus, 'ALL') AS l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total"), F.count("*").alias("n"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("o_orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("o_orderpriority"),
            "total",
            "n",
        )
    )


AGG_CUBE_SQL = """
SELECT coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
       coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
       round(sum(o_totalprice), 2) AS total, count(*) AS n
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via SQL (Catalyst Expand operator)."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("gs_lineitem")
    return spark.sql(
        """
        SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
               coalesce(l_linestatus, 'ALL') AS l_linestatus,
               round(sum(l_extendedprice), 2) AS sum_price
        FROM gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


AGG_GROUPING_SETS_SQL = """
SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
       coalesce(l_linestatus, 'ALL') AS l_linestatus,
       round(sum(l_extendedprice), 2) AS sum_price
FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
"""


def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer: row_number window with deterministic
    tiebreak.  At scale this is the rank-pushdown pattern (Spark 3.4+
    WindowGroupLimit pushes the limit below the sort)."""
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"), "rn")
    )


WINDOW_TOPK_SQL = """
SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice, rn
FROM (SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders)
WHERE rn <= 3
"""


def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum per supplier over ship time (rows-between frame).

    The sort includes l_quantity as the final tiebreak: the synthetic
    data carries duplicate (orderkey, linenumber) rows at larger SFs,
    and without a total order over everything that affects the sum,
    tied rows accumulate in engine-dependent order (full duplicates are
    then genuinely order-insensitive)."""
    l = _t(spark, sf_dir, "lineitem")
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber", "l_quantity")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return l.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.round(F.sum("l_quantity").over(w), 2).alias("running_qty"),
    )


WINDOW_RUNNING_SQL = """
SELECT l_suppkey, l_orderkey, l_linenumber,
       round(sum(l_quantity) OVER (PARTITION BY l_suppkey
                                   ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
           AS running_qty
FROM lineitem
"""


def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Days since the customer's previous order (lag window)."""
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(
            F.to_date("o_orderdate"), F.to_date(F.lag("o_orderdate").over(w))
        ).alias("days_since_prev"),
    )


WINDOW_LAG_SQL = """
SELECT o_custkey, o_orderkey,
       date_diff('day',
                 CAST(lag(o_orderdate) OVER (PARTITION BY o_custkey
                                             ORDER BY o_orderdate, o_orderkey) AS DATE),
                 CAST(o_orderdate AS DATE)) AS days_since_prev
FROM orders
"""


def global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-20 — TakeOrderedAndProject, not a full sort (O(n) scan +
    per-partition heap at scale)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("o_totalprice"))
    )


GLOBAL_TOPK_SQL = """
SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
"""


def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: building-segment customers who also placed urgent orders."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select(F.col("c_custkey").alias("custkey"))
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(F.col("o_custkey").alias("custkey"))
    return building.intersect(urgent)


SET_INTERSECT_SQL = """
SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
INTERSECT
SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
"""


def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: customers with orders but no events."""
    o = _t(spark, sf_dir, "orders")
    e = _t(spark, sf_dir, "events")
    return (
        o.select(F.col("o_custkey").alias("custkey"))
        .exceptAll(e.select(F.col("user_id").alias("custkey"))).distinct()
    )


SET_EXCEPT_SQL = """
SELECT DISTINCT custkey FROM (
  SELECT o_custkey AS custkey FROM orders
  EXCEPT ALL
  SELECT user_id AS custkey FROM events
)
"""


def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of key sets from two tables."""
    c = _t(spark, sf_dir, "customer")
    e = _t(spark, sf_dir, "events")
    return (
        c.filter(F.col("c_acctbal") < 0).select(F.col("c_custkey").alias("k"))
        .union(e.filter(F.col("event_type") == "signup").select(F.col("user_id").alias("k")))
        .distinct()
    )


SET_UNION_SQL = """
SELECT c_custkey AS k FROM customer WHERE c_acctbal < 0
UNION
SELECT user_id AS k FROM events WHERE event_type = 'signup'
"""


def pivot_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT — Spark native pivot; oracle via conditional aggregation."""
    l = _t(spark, sf_dir, "lineitem")
    p = (
        l.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum("l_quantity"))
    )
    return p.select(
        "l_returnflag",
        F.round(F.coalesce(F.col("O"), F.lit(0.0)), 2).alias("qty_open"),
        F.round(F.coalesce(F.col("F"), F.lit(0.0)), 2).alias("qty_filled"),
    )


PIVOT_SQL = """
SELECT l_returnflag,
       round(coalesce(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 0), 2) AS qty_open,
       round(coalesce(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 0), 2) AS qty_filled
FROM lineitem GROUP BY l_returnflag
"""


def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String expression battery (all JVM codegen, no UDFs)."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_type").alias("type_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("name_novowel"),
        F.split(F.col("p_name"), " ").getItem(0).alias("first_token"),
    )


SCALAR_STRING_SQL = """
SELECT p_partkey,
       upper(p_type)                    AS type_upper,
       lower(p_brand)                   AS brand_lower,
       length(p_name)                   AS name_len,
       substr(p_name, 1, 5)             AS name_prefix,
       concat_ws('/', p_brand, p_type)  AS brand_type,
       regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowel,
       string_split(p_name, ' ')[1]     AS first_token
FROM part
"""


def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time expression battery."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        F.date_format(F.date_add(F.to_date("o_orderdate"), 30), "yyyy-MM-dd").alias("due_date"),
    )


SCALAR_DATE_SQL = """
SELECT o_orderkey,
       year(o_orderdate)    AS yr,
       month(o_orderdate)   AS mo,
       day(o_orderdate)     AS dom,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d')     AS month_start,
       strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date
FROM orders
"""


def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math expression battery (rounded for float parity)."""
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    return l.select(
        "l_orderkey",
        F.round(F.abs(F.col("l_extendedprice") - 30000), 2).alias("abs_dev"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor("l_quantity").alias("qty_floor"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.pow(F.col("l_discount"), 2), 6).alias("disc_sq"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).alias("key_mod7"),
    )


SCALAR_MATH_SQL = """
SELECT l_orderkey,
       round(abs(l_extendedprice - 30000), 2)  AS abs_dev,
       CAST(ceil(l_quantity) AS BIGINT)        AS qty_ceil,
       CAST(floor(l_quantity) AS BIGINT)       AS qty_floor,
       round(sqrt(l_extendedprice), 6)         AS price_sqrt,
       round(ln(l_extendedprice), 6)           AS price_ln,
       round(pow(l_discount, 2), 6)            AS disc_sq,
       l_orderkey % 7                          AS key_mod7
FROM lineitem WHERE l_linenumber = 1
"""


def case_when_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing + aggregation."""
    o = _t(spark, sf_dir, "orders")
    tier = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 200000, "medium")
        .otherwise("large")
    )
    return (
        o.select(tier.alias("tier"), "o_totalprice")
        .groupBy("tier")
        .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
    )


CASE_WHEN_SQL = """
SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
            WHEN o_totalprice < 200000 THEN 'medium'
            ELSE 'large' END AS tier,
       count(*) AS n, round(sum(o_totalprice), 2) AS total
FROM orders GROUP BY 1
"""


def having_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate + HAVING (post-agg filter)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("spent"))
        .filter(F.col("n_orders") >= 15)
    )


HAVING_SQL = """
SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 2) AS spent
FROM orders GROUP BY o_custkey HAVING count(*) >= 15
"""


def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery (decorrelated to a semi join by both engines)."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("sq_orders")
    _t(spark, sf_dir, "customer").createOrReplaceTempView("sq_customer")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice FROM sq_orders
        WHERE o_custkey IN (SELECT c_custkey FROM sq_customer WHERE c_acctbal > 9000)
        """
    ).select("o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"))


SUBQUERY_IN_SQL = """
SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
"""


def correlated_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: orders above their customer's average
    order value.  Catalyst decorrelates into an aggregate + join."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("cs_orders")
    return spark.sql(
        """
        SELECT o.o_orderkey, round(o.o_totalprice, 2) AS o_totalprice
        FROM cs_orders o
        WHERE o.o_totalprice > 2 * (SELECT avg(i.o_totalprice) FROM cs_orders i
                                    WHERE i.o_custkey = o.o_custkey)
        """
    )


CORRELATED_SCALAR_SQL = """
SELECT o.o_orderkey, round(o.o_totalprice, 2) AS o_totalprice
FROM orders o
WHERE o.o_totalprice > 2 * (SELECT avg(i.o_totalprice) FROM orders i
                            WHERE i.o_custkey = o.o_custkey)
"""


def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction from the events.props JSON column."""
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"), F.count("k").alias("n_with_k"))
    )


JSON_EXTRACT_SQL = """
SELECT event_type,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       count(json_extract_string(props, '$.k')) AS n_with_k
FROM events GROUP BY event_type
"""



def agg_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates — the 100 TB substitutes for exact distinct and
    exact median: HyperLogLog++ approx_count_distinct (fixed-size sketch,
    map-side mergeable, vs. the full shuffle of countDistinct) and
    KLL/GK percentile_approx.  Deterministic for a given input (sketch
    merges are order-independent), but DuckDB's approx implementations
    differ, so the driver applies the rows-only check; accuracy bounds
    vs the exact answers are pinned in tests/test_oracle_battery.py."""
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
        F.percentile_approx("l_extendedprice", [0.5, 0.95], 10000).alias("price_p50_p95"),
        F.count("*").alias("n_rows"),
    ).select(
        "l_returnflag",
        "approx_orders",
        F.col("price_p50_p95").getItem(0).alias("price_p50"),
        F.col("price_p50_p95").getItem(1).alias("price_p95"),
        "n_rows",
    )


QUERIES = {
    "agg_approx_sketches": agg_approx_sketches,
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier_volume": q5_local_supplier_volume,
    "filter_project": filter_project,
    "join_inner_agg": join_inner_agg,
    "join_left_null_handling": join_left_null_handling,
    "join_semi": join_semi,
    "join_anti": join_anti,
    "join_broadcast_dims": join_broadcast_dims,
    "agg_distinct": agg_distinct,
    "agg_rollup": agg_rollup,
    "agg_cube": agg_cube,
    "agg_grouping_sets": agg_grouping_sets,
    "window_topk_per_group": window_topk_per_group,
    "window_running_sum": window_running_sum,
    "window_lag_delta": window_lag_delta,
    "global_topk": global_topk,
    "set_intersect": set_intersect,
    "set_except": set_except,
    "set_union_distinct": set_union_distinct,
    "pivot_linestatus": pivot_linestatus,
    "scalar_string_funcs": scalar_string_funcs,
    "scalar_date_funcs": scalar_date_funcs,
    "scalar_math_funcs": scalar_math_funcs,
    "case_when_bucketing": case_when_bucketing,
    "having_filter": having_filter,
    "subquery_in": subquery_in,
    "correlated_scalar_subquery": correlated_scalar_subquery,
    "json_extract_props": json_extract_props,
}

ORACLES = {
    "q1_pricing_summary": Q1_SQL,
    "q3_shipping_priority": Q3_SQL,
    "q5_local_supplier_volume": Q5_SQL,
    "filter_project": FILTER_PROJECT_SQL,
    "join_inner_agg": JOIN_INNER_SQL,
    "join_left_null_handling": JOIN_LEFT_SQL,
    "join_semi": JOIN_SEMI_SQL,
    "join_anti": JOIN_ANTI_SQL,
    "join_broadcast_dims": JOIN_BROADCAST_SQL,
    "agg_distinct": AGG_DISTINCT_SQL,
    "agg_rollup": AGG_ROLLUP_SQL,
    "agg_cube": AGG_CUBE_SQL,
    "agg_grouping_sets": AGG_GROUPING_SETS_SQL,
    "window_topk_per_group": WINDOW_TOPK_SQL,
    "window_running_sum": WINDOW_RUNNING_SQL,
    "window_lag_delta": WINDOW_LAG_SQL,
    "global_topk": GLOBAL_TOPK_SQL,
    "set_intersect": SET_INTERSECT_SQL,
    "set_except": SET_EXCEPT_SQL,
    "set_union_distinct": SET_UNION_SQL,
    "pivot_linestatus": PIVOT_SQL,
    "scalar_string_funcs": SCALAR_STRING_SQL,
    "scalar_date_funcs": SCALAR_DATE_SQL,
    "scalar_math_funcs": SCALAR_MATH_SQL,
    "case_when_bucketing": CASE_WHEN_SQL,
    "having_filter": HAVING_SQL,
    "subquery_in": SUBQUERY_IN_SQL,
    "correlated_scalar_subquery": CORRELATED_SCALAR_SQL,
    "json_extract_props": JSON_EXTRACT_SQL,
}
