"""TPC-H-breadth relational queries over the benchmark star schema.

Round-3 widening of the relational surface (SURVEY.md §2.5 "the engine
will still expose Spark's built-ins"): the classic TPC-H shapes the
reference never needed but any analytics engine must run well —
correlated aggregate subqueries (decorrelated into joins), scalar
subqueries, distribution aggregates over outer joins, disjunctive
predicate pushdown, and group-by-having semi-joins. Each adapted to
the columns the synthetic schema actually has (no partsupp table, no
l_commitdate/l_receiptdate/l_shipmode).

Scale notes inline per query: every dimension side is broadcast, every
correlated subquery is a decorrelated partial-agg join (never a
per-row subplan), and single-row aggregates ride as lazy scalar
subqueries (Spark 4 ``DataFrame.scalar``) — no 1-row cross joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ccgp_data_wrangling_spark.catalog import load_table
from ccgp_data_wrangling_spark.queries import register

# ---------------------------------------------------------------------------
# Q7 volume shipping: nation-pair trade flow by year.
# lineitem⋈orders shuffles on orderkey; supplier/customer/nation are
# broadcast dims. The pair filter is applied AFTER the nation joins but
# prunes to 2 of 625 pairs before the final (tiny) aggregation, and the
# nation joins are broadcast so no shuffle depends on the filter.
# ---------------------------------------------------------------------------

_Q7_SQL = """
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INT) AS yr,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l.l_shipdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                       AND TIMESTAMP '1998-12-31 00:00:00'
GROUP BY 1, 2, 3
"""


@register("q7_nation_volume", _Q7_SQL)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").between("1995-01-01 00:00:00", "1998-12-31 00:00:00")
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    pair_ok = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .where(pair_ok)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("yr"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# Q8 market share: NATION_3's share of ECONOMY-part revenue delivered to
# region-1 customers, by order year. The share divides two conditional
# sums in ONE aggregation — not two scans.
# ---------------------------------------------------------------------------

_Q8_SQL = """
SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INT) AS yr,
       ROUND(SUM(CASE WHEN n1.n_name = 'NATION_3'
                      THEN l.l_extendedprice * (1 - l.l_discount)
                      ELSE 0 END)
             / SUM(l.l_extendedprice * (1 - l.l_discount)), 6) AS mkt_share
FROM lineitem l
JOIN part p     ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
WHERE p.p_type = 'ECONOMY'
  AND n2.n_regionkey = 1
  AND o.o_orderdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                        AND TIMESTAMP '1996-12-31 00:00:00'
GROUP BY 1
"""


@register("q8_market_share", _Q8_SQL)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate").between("1995-01-01 00:00:00", "1996-12-31 00:00:00")
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    # customer-side nation restricted to the region BEFORE the join —
    # the filter prunes customers at the broadcast build, not post-join
    n2 = nation.where(F.col("n_regionkey") == 1).select(
        F.col("n_nationkey").alias("c_nk")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .groupBy(F.year("o_orderdate").alias("yr"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
    )


# ---------------------------------------------------------------------------
# Q9 product profit by supplier nation and year. No partsupp table in
# this schema, so cost is proxied as 40% of retail price × quantity —
# the plan shape (fact ⋈ two broadcast dims ⋈ orders, two-key agg) is
# what the query is here to exercise.
# ---------------------------------------------------------------------------

_Q9_SQL = """
SELECT n.n_name AS nation,
       CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INT) AS yr,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)
                 - 0.4 * p.p_retailprice * l.l_quantity), 2) AS profit
FROM lineitem l
JOIN part p     ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
WHERE p.p_name LIKE '%ring%'
GROUP BY 1, 2
"""


@register("q9_product_profit", _Q9_SQL)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%ring%"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.4 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(
            F.broadcast(part.select("p_partkey", "p_retailprice")),
            li.l_partkey == F.col("p_partkey"),
        )
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("nation", F.year("o_orderdate").alias("yr"))
        .agg(F.round(F.sum(profit), 2).alias("profit"))
    )


# ---------------------------------------------------------------------------
# Q13 customer order-count distribution, INCLUDING zero-order customers:
# left outer join + two-level aggregation. The outer join shuffles on
# custkey; level-2 agg groups on the tiny count domain.
# ---------------------------------------------------------------------------

_Q13_SQL = """
WITH per_cust AS (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY 1
)
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM per_cust
GROUP BY c_count
"""


@register("q13_order_distribution", _Q13_SQL)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# ---------------------------------------------------------------------------
# Q14 conditional revenue share (PROMO parts) over one shipdate month.
# Part dim broadcast; single conditional aggregation; the date filter
# reaches the parquet scan.
# ---------------------------------------------------------------------------

_Q14_SQL = """
SELECT ROUND(100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0 END)
             / SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_share
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
"""


@register("q14_promo_share", _Q14_SQL)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-03-01 00:00:00")
        & (F.col("l_shipdate") < "1996-04-01 00:00:00")
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(0.0))
                / F.sum(vol),
                4,
            ).alias("promo_share")
        )
    )


# ---------------------------------------------------------------------------
# Q15 top supplier(s): suppliers whose quarterly revenue equals the
# maximum. Revenue is rounded to 2 dp on BOTH sides before the equality
# so the max-comparison is ulp-stable across engines. The max rides as
# a lazy scalar subquery over the (tiny, ≤ #suppliers rows) revenue agg
# — no second scan of lineitem, no 1-row cross join.
# ---------------------------------------------------------------------------

_Q15_SQL = """
WITH rev AS (
  SELECT l_suppkey AS s_suppkey,
         ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY 1
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM rev r
JOIN supplier s USING (s_suppkey)
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
"""


@register("q15_top_supplier", _Q15_SQL)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01 00:00:00")
        & (F.col("l_shipdate") < "1996-04-01 00:00:00")
    )
    rev = (
        li.groupBy(F.col("l_suppkey").alias("s_suppkey"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "total_revenue"
            )
        )
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    best = rev.agg(F.max("total_revenue")).scalar()
    return rev.where(F.col("total_revenue") == best).join(F.broadcast(supp), "s_suppkey")


# ---------------------------------------------------------------------------
# Q17 small-quantity revenue: lineitems of Brand#2 parts whose quantity
# is below half the part's average quantity. The correlated AVG
# subquery is decorrelated into a per-part partial aggregate joined
# back — one lineitem scan feeds both sides via an exchange reuse, and
# the threshold is rounded to 4 dp so the boundary comparison is
# engine-stable.
# ---------------------------------------------------------------------------

_Q17_SQL = """
WITH brand_parts AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#2'),
avg_qty AS (
  SELECT l_partkey, ROUND(0.5 * AVG(l_quantity), 4) AS half_avg
  FROM lineitem JOIN brand_parts ON p_partkey = l_partkey
  GROUP BY 1
)
SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem l
JOIN avg_qty a ON a.l_partkey = l.l_partkey
WHERE l.l_quantity < a.half_avg
"""


@register("q17_small_quantity", _Q17_SQL)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    brand = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_brand") == "Brand#2")
        .select("p_partkey")
    )
    branded = li.join(F.broadcast(brand), li.l_partkey == F.col("p_partkey"))
    avg_qty = branded.groupBy("l_partkey").agg(
        F.round(0.5 * F.avg("l_quantity"), 4).alias("half_avg")
    )
    return (
        branded.select("l_partkey", "l_quantity", "l_extendedprice")
        .join(avg_qty.withColumnRenamed("l_partkey", "ap"), F.col("l_partkey") == F.col("ap"))
        .where(F.col("l_quantity") < F.col("half_avg"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


# ---------------------------------------------------------------------------
# Q18 large orders: group-by-having on the fact table, then the
# qualifying keyset (tiny) joins back to pick up order/customer
# attributes. The HAVING filter collapses before any wide join.
# ---------------------------------------------------------------------------

_Q18_SQL = """
WITH big AS (
  SELECT l_orderkey, ROUND(SUM(l_quantity), 2) AS sum_qty
  FROM lineitem GROUP BY 1 HAVING SUM(l_quantity) > 140
)
SELECT c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice, b.sum_qty
FROM big b
JOIN orders o   ON o.o_orderkey = b.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
"""


@register("q18_large_orders", _Q18_SQL)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("raw_qty"))
        .where(F.col("raw_qty") > 140)
        .select("l_orderkey", F.round("raw_qty", 2).alias("sum_qty"))
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select("c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
    )


# ---------------------------------------------------------------------------
# Q19 disjunctive-predicate revenue: three OR-of-AND blocks mixing
# part and lineitem columns. Catalyst extracts the common l_quantity
# bounds and pushes the part-only conjuncts into the broadcast build;
# the residual OR evaluates post-join inside codegen.
# ---------------------------------------------------------------------------

_Q19_SQL = """
SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#3'  AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 21)
   OR (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity BETWEEN 10 AND 30)
   OR (p.p_brand = 'Brand#21' AND p.p_size BETWEEN 1 AND 35
       AND l.l_quantity BETWEEN 20 AND 40)
"""


@register("q19_disjunctive_revenue", _Q19_SQL)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15) & q.between(1, 21))
        | ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 25) & q.between(10, 30))
        | ((F.col("p_brand") == "Brand#21") & F.col("p_size").between(1, 35) & q.between(20, 40))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .where(cond)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# Q22 idle rich customers: acctbal above the average positive balance,
# no orders on file, grouped by a derived country code. Exercises a
# scalar aggregate subquery + anti-join + derived-key aggregation.
# The average is rounded to 4 dp before the comparison (ulp-stable).
# ---------------------------------------------------------------------------

_Q22_SQL = """
WITH cutoff AS (
  SELECT ROUND(AVG(c_acctbal), 4) AS avg_bal FROM customer WHERE c_acctbal > 0
)
SELECT CAST(c.c_nationkey % 5 AS INT) AS cntrycode,
       CAST(COUNT(*) AS BIGINT) AS numcust,
       ROUND(SUM(c.c_acctbal), 2) AS totacctbal
FROM customer c
WHERE c.c_acctbal > (SELECT avg_bal FROM cutoff)
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY 1
"""


@register("q22_idle_customers", _Q22_SQL)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    avg_bal = (
        cust.where(F.col("c_acctbal") > 0)
        .agg(F.round(F.avg("c_acctbal"), 4))
        .scalar()
    )
    return (
        cust.where(F.col("c_acctbal") > avg_bal)
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy((F.col("c_nationkey") % 5).cast("int").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )
