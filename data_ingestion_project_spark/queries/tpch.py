"""TPC-H-style analytic queries over the star schema.

The reference has no query surface at all (SURVEY.md §2 — no filter,
join, group-by, window, sort or set-op anywhere); this module IS the
engine's analytic capability, built per the north star. Query shapes
follow the public TPC-H patterns adapted to the driver's synthetic
schema (TESTDATA.md).

Scale notes per query are inline. General rules applied:
- dimension joins (region, nation) are explicit ``F.broadcast``;
  mid-size sides (supplier, part, customer) are left to AQE, which
  switches to broadcast when runtime sizes allow;
- aggregations are expressed as groupBy().agg() so Catalyst plans
  partial (map-side) aggregation automatically;
- top-k = orderBy().limit() which Spark executes as TakeOrdered
  (per-partition heap + merge), never a full sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_project_spark.queries._precision import dec_avg, dec_sum, sql_dec_avg, sql_dec_sum
from data_ingestion_project_spark.queries._precision import dec_sum_final as _dec_sum_final
from data_ingestion_project_spark.sources.readers import table

REV = "l_extendedprice * (1 - l_discount)"  # SQL twin of _rev()


def _rev() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# ------------------------------------------------------------------ q1


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-scan aggregate: 2-key groupBy with 8 aggregates, one shuffle
    of pre-aggregated partials (6 groups total → partial agg does ~all
    the work map-side; survives any scale)."""
    l = table(spark, sf_dir, "lineitem")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum(F.col("l_quantity")).alias("sum_qty"),
            dec_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            dec_sum(_rev()).alias("sum_disc_price"),
            dec_sum(_rev() * (1 + F.col("l_tax"))).alias("sum_charge"),
            dec_avg(F.col("l_quantity")).alias("avg_qty"),
            dec_avg(F.col("l_extendedprice")).alias("avg_price"),
            dec_avg(F.col("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


ORACLE_PRICING_SUMMARY = f"""
SELECT l_returnflag, l_linestatus,
       {sql_dec_sum('l_quantity')} AS sum_qty,
       {sql_dec_sum('l_extendedprice')} AS sum_base_price,
       {sql_dec_sum(REV)} AS sum_disc_price,
       {sql_dec_sum(REV + ' * (1 + l_tax)')} AS sum_charge,
       {sql_dec_avg('l_quantity')} AS avg_qty,
       {sql_dec_avg('l_extendedprice')} AS avg_price,
       {sql_dec_avg('l_discount')} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# ------------------------------------------------------------------ q3


def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join + group + top-10. customer filter first (segment cuts
    ~80%), then joins shuffle on the key; AQE broadcasts the filtered
    customer side when it fits."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    l = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dec_sum(_rev()).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


ORACLE_SHIPPING_PRIORITY = f"""
SELECT l_orderkey,
       {sql_dec_sum(REV)} AS revenue,
       strftime(o_orderdate, '%Y-%m-%d')                 AS orderdate,
       o_orderpriority
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate  > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


# ------------------------------------------------------------------ q5


def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-way join where customer and supplier must share a nation.
    region→nation are broadcast (5 / 25 rows at any SF); the c=s nation
    equality rides the join condition, so no post-join filter blowup."""
    r = F.broadcast(table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"))
    n = F.broadcast(table(spark, sf_dir, "nation"))
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = table(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dec_sum(_rev()).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


ORACLE_LOCAL_SUPPLIER_VOLUME = f"""
SELECT n_name, {sql_dec_sum(REV)} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name ASC
"""


# ------------------------------------------------------------------ q6


def revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure scan-filter-aggregate: all three predicates push to the
    parquet scan (PushedFilters), single partial-agg shuffle of 1 row."""
    l = table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 25)
        )
        .agg(dec_sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


ORACLE_REVENUE_FORECAST = f"""
SELECT {sql_dec_sum("l_extendedprice * l_discount")} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.02 AND 0.06
  AND l_quantity < 25
"""


# ------------------------------------------------------------- q4-like


def order_priority_discount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS → left-semi join (never duplicates order rows, unlike an
    inner join + distinct; half the shuffle width)."""
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") <= 5)
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


ORACLE_ORDER_PRIORITY_DISCOUNT = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity <= 5)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ------------------------------------------------------------ q10-like


def returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = F.broadcast(table(spark, sf_dir, "nation"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dec_sum(_rev()).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


ORACLE_RETURNED_ITEMS = f"""
SELECT c_custkey, c_name, n_name,
       {sql_dec_sum(REV)} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


# ------------------------------------------------------------- q7-like


def nation_volume_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two nation joins under different aliases (supplier's vs
    customer's nation) — classic role-playing dimension, broadcast
    twice."""
    n1 = F.broadcast(table(spark, sf_dir, "nation")).select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = F.broadcast(table(spark, sf_dir, "nation")).select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    s = table(spark, sf_dir, "supplier")
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    pairs = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n1, s.s_nationkey == F.col("s_nkey"))
        .join(n2, c.c_nationkey == F.col("c_nkey"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
            )
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        pairs.groupBy("supp_nation", "cust_nation", F.year("o_orderdate").alias("o_year"))
        .agg(dec_sum(_rev()).alias("volume"))
        .orderBy("supp_nation", "cust_nation", "o_year")
    )


ORACLE_NATION_VOLUME_PAIRS = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(o_orderdate) AS INTEGER) AS o_year,
       {sql_dec_sum(REV)} AS volume
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY n1.n_name, n2.n_name, year(o_orderdate)
ORDER BY supp_nation, cust_nation, o_year
"""


# ------------------------------------------------------------- q9-like


def product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = table(spark, sf_dir, "supplier")
    n = F.broadcast(table(spark, sf_dir, "nation"))
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(dec_sum(_rev()).alias("profit"))
        .orderBy(F.col("nation").asc(), F.col("o_year").desc())
    )


ORACLE_PRODUCT_TYPE_PROFIT = f"""
SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
       {sql_dec_sum(REV)} AS profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_type = 'PROMO'
GROUP BY n_name, year(o_orderdate)
ORDER BY nation ASC, o_year DESC
"""


# ------------------------------------------------------------ q15-like


def top_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    s = table(spark, sf_dir, "supplier")
    rev = l.groupBy("l_suppkey").agg(dec_sum(_rev()).alias("total_revenue"))
    return (
        rev.join(s, rev.l_suppkey == s.s_suppkey)
        .select(F.col("s_suppkey"), F.col("s_name"), F.col("total_revenue"))
        .orderBy(F.col("total_revenue").desc(), F.col("s_suppkey").asc())
        .limit(5)
    )


ORACLE_TOP_SUPPLIERS = f"""
SELECT s_suppkey, s_name, total_revenue
FROM (
  SELECT l_suppkey, {sql_dec_sum(REV)} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
) r
JOIN supplier ON l_suppkey = s_suppkey
ORDER BY total_revenue DESC, s_suppkey ASC
LIMIT 5
"""


# ------------------------------------------------------------ q13-like


def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left join so 0-order customers are counted; two aggregations
    (per-customer then histogram) — second one is tiny after the first."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


ORACLE_CUSTOMER_ORDER_DISTRIBUTION = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
) t
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# ------------------------------------------------------------ q18-like


def big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-then-join: compute per-order quantity first (shrinks
    lineitem 4:1 before the join) instead of join-then-aggregate."""
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    big = (
        l.groupBy("l_orderkey")
        .agg(dec_sum(F.col("l_quantity")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 180)
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .select("o_orderkey", "o_custkey", "o_totalprice", "sum_qty")
        .orderBy(F.col("sum_qty").desc(), F.col("o_orderkey").asc())
        .limit(100)  # top-k => TakeOrdered; an unbounded global sort's
        # output is itself the bottleneck at 100x scale
    )


ORACLE_BIG_ORDERS = f"""
SELECT o_orderkey, o_custkey, o_totalprice, sum_qty
FROM orders
JOIN (
  SELECT l_orderkey, {sql_dec_sum('l_quantity')} AS sum_qty
  FROM lineitem GROUP BY l_orderkey HAVING {sql_dec_sum('l_quantity')} > 180
) b ON o_orderkey = l_orderkey
ORDER BY sum_qty DESC, o_orderkey ASC
LIMIT 100
"""


# ---------------------------------------------------------- simple aggs


def segment_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dec_avg(F.col("c_acctbal")).alias("avg_acctbal"),
            F.round(F.min("c_acctbal"), 2).alias("min_acctbal"),
            F.round(F.max("c_acctbal"), 2).alias("max_acctbal"),
        )
        .orderBy("c_mktsegment")
    )


ORACLE_SEGMENT_ACCTBAL = f"""
SELECT c_mktsegment, COUNT(*) AS n_customers,
       {sql_dec_avg('c_acctbal')} AS avg_acctbal,
       ROUND(MIN(c_acctbal), 2) AS min_acctbal,
       ROUND(MAX(c_acctbal), 2) AS max_acctbal
FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


def brand_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return (
        p.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            dec_avg(F.col("p_retailprice")).alias("avg_price"),
            F.round(F.min("p_retailprice"), 2).alias("min_price"),
            F.round(F.max("p_retailprice"), 2).alias("max_price"),
            F.count_distinct(F.col("p_type")).alias("n_types"),
        )
        .orderBy("p_brand")
    )


ORACLE_BRAND_PRICE_STATS = f"""
SELECT p_brand, COUNT(*) AS n_parts,
       {sql_dec_avg('p_retailprice')} AS avg_price,
       ROUND(MIN(p_retailprice), 2) AS min_price,
       ROUND(MAX(p_retailprice), 2) AS max_price,
       COUNT(DISTINCT p_type) AS n_types
FROM part GROUP BY p_brand ORDER BY p_brand
"""


# ------------------------------------------------------------- windows


def top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key top-k via row_number window — one shuffle on o_custkey.
    At scale prefer this over groupBy+sort_array for wide payloads."""
    from pyspark.sql import Window

    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    )


ORACLE_TOP_ORDERS_PER_CUSTOMER = """
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                                 ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rn
  FROM orders
) t
WHERE rn <= 3
ORDER BY o_custkey, rn
"""


def monthly_revenue_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global running total over months: the outer window is a single
    partition by design, but it runs over ~84 pre-aggregated rows, not
    the fact table — aggregate first, window the small result."""
    from pyspark.sql import Window

    o = table(spark, sf_dir, "orders")
    monthly = (
        o.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("ym"))
        .agg(dec_sum(F.col("o_totalprice")).alias("monthly_revenue"))
    )
    w = Window.orderBy("ym").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        monthly.withColumn("running_revenue", F.round(F.sum("monthly_revenue").over(w), 2))
        .orderBy("ym")
    )


ORACLE_MONTHLY_REVENUE_RUNNING = f"""
SELECT ym, monthly_revenue,
       ROUND(SUM(monthly_revenue) OVER (ORDER BY ym
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_revenue
FROM (
  SELECT strftime(o_orderdate, '%Y-%m') AS ym,
         {sql_dec_sum('o_totalprice')} AS monthly_revenue
  FROM orders GROUP BY 1
) m
ORDER BY ym
"""


def monthly_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = table(spark, sf_dir, "orders")
    monthly = (
        o.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("ym"))
        .agg(dec_sum(F.col("o_totalprice")).alias("monthly_revenue"))
    )
    w = Window.orderBy("ym")
    return (
        monthly.withColumn(
            "growth", F.round(F.col("monthly_revenue") - F.lag("monthly_revenue").over(w), 2)
        )
        .orderBy("ym")
    )


ORACLE_MONTHLY_REVENUE_GROWTH = f"""
SELECT ym, monthly_revenue,
       ROUND(monthly_revenue - LAG(monthly_revenue) OVER (ORDER BY ym), 2) AS growth
FROM (
  SELECT strftime(o_orderdate, '%Y-%m') AS ym,
         {sql_dec_sum('o_totalprice')} AS monthly_revenue
  FROM orders GROUP BY 1
) m
ORDER BY ym
"""


# -------------------------------------------------------------- set ops


def customers_in_both_statuses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT — Spark plans this as a hash semi-join over distincts."""
    o = table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    b = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    return a.intersect(b).orderBy("custkey").limit(1000)  # bounded output


ORACLE_CUSTOMERS_IN_BOTH_STATUSES = """
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
INTERSECT
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
ORDER BY custkey
LIMIT 1000
"""


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (≡ distinct anti-join). At scale the anti-join form lets
    AQE broadcast the smaller distinct side."""
    c = table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    o = table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    return c.subtract(o).orderBy("custkey")  # subtract == EXCEPT DISTINCT


ORACLE_CUSTOMERS_WITHOUT_ORDERS = """
SELECT c_custkey AS custkey FROM customer
EXCEPT
SELECT o_custkey AS custkey FROM orders
ORDER BY custkey
"""


def excess_returned_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — the multiset set-op (each occurrence counts):
    parts whose 'R'-flag lineitem count exceeds their 'A'-flag count,
    keeping exactly the surplus occurrences.

    Spark plans ``exceptAll`` as a counted aggregate + generate (sum
    of +1/−1 tags, replicate the positive excess) — one shuffle on the
    value, never a quadratic pairing; the follow-up GROUP BY collapses
    the replicated rows, so at 100 TB the surviving data is bounded by
    |distinct parts|. Top-k bounded with a full tie-break.
    """
    l = table(spark, sf_dir, "lineitem")
    r = l.filter(F.col("l_returnflag") == "R").select("l_partkey")
    a = l.filter(F.col("l_returnflag") == "A").select("l_partkey")
    return (
        r.exceptAll(a)
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n_excess"))
        .orderBy(F.col("n_excess").desc(), "l_partkey")
        .limit(15)
    )


ORACLE_EXCESS_RETURNED_PARTS = """
SELECT l_partkey, COUNT(*) AS n_excess FROM (
  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
  EXCEPT ALL
  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'
) t
GROUP BY l_partkey
ORDER BY n_excess DESC, l_partkey
LIMIT 15
"""


# --------------------------------------------------------------- rollup


def _flag_status_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Finest-grain (returnflag, linestatus) cells with RE-AGGREGATABLE
    partials (exact count + unrounded DECIMAL revenue sum) — the shared
    first level of the two-level ROLLUP/CUBE plans below. Expanding
    grouping sets over the raw fact multiplies the shuffle by the
    number of sets (x3 rollup / x4 cube on 100 TB of lineitem);
    aggregating to the ~6 finest cells FIRST and expanding only the
    cell table does the same work on metadata-sized input. Decimal
    addition is associative, so folding cell partials and rounding at
    the end is bit-equal to the single-level aggregate."""
    from data_ingestion_project_spark.queries._precision import dec_sum_partial

    l = table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("__n"),
        dec_sum_partial(_rev()).alias("__rev"),
    )


def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (flag, status) via the two-level plan: one partial-agg
    shuffle to the finest cells, then the x3 grouping-set expand runs
    over ~6 rows instead of the whole fact table."""
    return (
        _flag_status_cells(spark, sf_dir)
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum("__n").alias("n_items"),
            _dec_sum_final(F.sum("__rev"), 2).alias("revenue"),
        )
        .orderBy(F.col("l_returnflag").asc_nulls_first(), F.col("l_linestatus").asc_nulls_first())
    )


ORACLE_ROLLUP_REVENUE = f"""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n_items,
       {sql_dec_sum(REV)} AS revenue
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
"""


# ------------------------------------------------------- distinct aggs


def supplier_part_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) — Spark plans expand + two-stage agg; the
    approx_count_distinct variant (bench-only) avoids the expand."""
    l = table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_suppkey")
        .agg(
            F.count_distinct(F.col("l_partkey")).alias("n_parts"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy(F.col("n_parts").desc(), F.col("l_suppkey").asc())
        .limit(10)
    )


ORACLE_SUPPLIER_PART_BREADTH = """
SELECT l_suppkey, COUNT(DISTINCT l_partkey) AS n_parts, COUNT(*) AS n_lines
FROM lineitem GROUP BY l_suppkey
ORDER BY n_parts DESC, l_suppkey ASC
LIMIT 10
"""


def cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus) via the two-level plan (see
    _flag_status_cells): the 2^2 grouping-set expand runs over the ~6
    finest cells, not the fact table — measured 2.5 s → sub-second at
    sf0.1, and the win grows with the x4 expand at scale."""
    return (
        _flag_status_cells(spark, sf_dir)
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.sum("__n").alias("n_items"),
            _dec_sum_final(F.sum("__rev"), 2).alias("revenue"),
        )
        .orderBy(F.col("l_returnflag").asc_nulls_first(), F.col("l_linestatus").asc_nulls_first())
    )


ORACLE_CUBE_REVENUE = f"""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n_items,
       {sql_dec_sum(REV)} AS revenue
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
"""


QUERIES = {
    "pricing_summary": pricing_summary,
    "cube_revenue": cube_revenue,
    "shipping_priority": shipping_priority,
    "local_supplier_volume": local_supplier_volume,
    "revenue_forecast": revenue_forecast,
    "order_priority_discount": order_priority_discount,
    "returned_items": returned_items,
    "nation_volume_pairs": nation_volume_pairs,
    "product_type_profit": product_type_profit,
    "top_suppliers": top_suppliers,
    "customer_order_distribution": customer_order_distribution,
    "big_orders": big_orders,
    "segment_acctbal": segment_acctbal,
    "brand_price_stats": brand_price_stats,
    "top_orders_per_customer": top_orders_per_customer,
    "monthly_revenue_running": monthly_revenue_running,
    "monthly_revenue_growth": monthly_revenue_growth,
    "customers_in_both_statuses": customers_in_both_statuses,
    "customers_without_orders": customers_without_orders,
    "excess_returned_parts": excess_returned_parts,
    "rollup_revenue": rollup_revenue,
    "supplier_part_breadth": supplier_part_breadth,
}

ORACLE = {
    "pricing_summary": ORACLE_PRICING_SUMMARY,
    "cube_revenue": ORACLE_CUBE_REVENUE,
    "shipping_priority": ORACLE_SHIPPING_PRIORITY,
    "local_supplier_volume": ORACLE_LOCAL_SUPPLIER_VOLUME,
    "revenue_forecast": ORACLE_REVENUE_FORECAST,
    "order_priority_discount": ORACLE_ORDER_PRIORITY_DISCOUNT,
    "returned_items": ORACLE_RETURNED_ITEMS,
    "nation_volume_pairs": ORACLE_NATION_VOLUME_PAIRS,
    "product_type_profit": ORACLE_PRODUCT_TYPE_PROFIT,
    "top_suppliers": ORACLE_TOP_SUPPLIERS,
    "customer_order_distribution": ORACLE_CUSTOMER_ORDER_DISTRIBUTION,
    "big_orders": ORACLE_BIG_ORDERS,
    "segment_acctbal": ORACLE_SEGMENT_ACCTBAL,
    "brand_price_stats": ORACLE_BRAND_PRICE_STATS,
    "top_orders_per_customer": ORACLE_TOP_ORDERS_PER_CUSTOMER,
    "monthly_revenue_running": ORACLE_MONTHLY_REVENUE_RUNNING,
    "monthly_revenue_growth": ORACLE_MONTHLY_REVENUE_GROWTH,
    "customers_in_both_statuses": ORACLE_CUSTOMERS_IN_BOTH_STATUSES,
    "customers_without_orders": ORACLE_CUSTOMERS_WITHOUT_ORDERS,
    "excess_returned_parts": ORACLE_EXCESS_RETURNED_PARTS,
    "rollup_revenue": ORACLE_ROLLUP_REVENUE,
    "supplier_part_breadth": ORACLE_SUPPLIER_PART_BREADTH,
}
