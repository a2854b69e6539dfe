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


# ---------------------------------------------------------------------------
# Q2 (adapted) min-cost supplier: the schema has no partsupp table, so
# the supply relation is DERIVED from lineitem — unit cost per
# (partkey, suppkey) = min(extendedprice/quantity), rounded to 4 dp so
# the min-equality comparison is engine-stable. The correlated
# "cost = (SELECT MIN(...))" of the canonical Q2 is decorrelated into
# a per-part partial aggregate joined back (one supply scan feeds both
# sides); region/nation/supplier/part are broadcast dims.
# ---------------------------------------------------------------------------

_Q2_SQL = """
WITH eu_supp AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON n_nationkey = s_nationkey
  JOIN region ON r_regionkey = n_regionkey
  WHERE r_name = 'EUROPE'
),
target_parts AS (
  SELECT p_partkey, p_brand
  FROM part WHERE p_type = 'STANDARD' AND p_size = 15
),
supply AS (
  -- scaled-integer half-up rounding: FLOOR(x*1e4 + 0.5) is the same
  -- IEEE arithmetic in every engine, unlike ROUND(double, 4) whose
  -- half-boundary behaviour is library-dependent
  SELECT l_partkey, l_suppkey,
         MIN(CAST(FLOOR(l_extendedprice / l_quantity * 10000 + 0.5)
             AS BIGINT)) AS unit_cost_s
  FROM lineitem
  JOIN target_parts ON p_partkey = l_partkey
  JOIN eu_supp ON s_suppkey = l_suppkey
  WHERE l_quantity > 0
  GROUP BY 1, 2
),
best AS (
  SELECT l_partkey, MIN(unit_cost_s) AS min_cost_s FROM supply GROUP BY 1
)
SELECT s.s_name, s.s_acctbal, s.n_name,
       p.p_partkey, p.p_brand, y.unit_cost_s / 10000.0 AS min_cost
FROM supply y
JOIN best b ON b.l_partkey = y.l_partkey AND y.unit_cost_s = b.min_cost_s
JOIN eu_supp s ON s.s_suppkey = y.l_suppkey
JOIN target_parts p ON p.p_partkey = y.l_partkey
"""


@register("q2_min_cost_supplier", _Q2_SQL)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-cost supplier per target part (TPC-H Q2 shape, derived supply).

    Parity: reference has no TPC-H layer; this widens SURVEY.md §2.5.
    Scale: lineitem shuffles once on (partkey, suppkey) to build the
    supply relation; the per-part MIN rides the same key prefix, and
    every dimension (region-filtered suppliers, size/type-filtered
    parts) broadcasts. No window, no cartesian.
    """
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    region = load_table(spark, sf_dir, "region").where(
        F.col("r_name") == "EUROPE"
    )
    eu_supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    parts = (
        load_table(spark, sf_dir, "part")
        .where((F.col("p_type") == "STANDARD") & (F.col("p_size") == 15))
        .select("p_partkey", "p_brand")
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 0)
    # scaled-integer half-up rounding (FLOOR(x*1e4+0.5)): bit-identical
    # across engines, unlike ROUND(double, 4) at half boundaries
    unit = F.floor(
        F.col("l_extendedprice") / F.col("l_quantity") * 10000 + 0.5
    ).cast("long")
    supply = (
        li.join(F.broadcast(parts), li.l_partkey == parts.p_partkey)
        .join(F.broadcast(eu_supp.select("s_suppkey")), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(unit).alias("unit_cost_s"))
    )
    best = supply.groupBy(F.col("l_partkey").alias("bp")).agg(
        F.min("unit_cost_s").alias("min_cost_s")
    )
    return (
        supply.join(
            best,
            (supply.l_partkey == best.bp)
            & (supply.unit_cost_s == best.min_cost_s),
        )
        .join(F.broadcast(eu_supp), supply.l_suppkey == eu_supp.s_suppkey)
        .join(F.broadcast(parts), supply.l_partkey == parts.p_partkey)
        .select(
            "s_name",
            "s_acctbal",
            "n_name",
            "p_partkey",
            "p_brand",
            (F.col("unit_cost_s") / 10000.0).alias("min_cost"),
        )
    )


# ---------------------------------------------------------------------------
# Q11 (adapted) important part value: per-part revenue contributed by
# one nation's suppliers, kept only where it exceeds a fraction of the
# nation's total — the canonical scalar-subquery HAVING. The total
# rides as a lazy scalar over the SAME aggregated relation (exchange
# reuse), never a 1-row cross join.
# ---------------------------------------------------------------------------

_Q11_SQL = """
WITH nat_supply AS (
  SELECT l_partkey, ROUND(SUM(l_extendedprice), 2) AS value
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation   ON n_nationkey = s_nationkey
  WHERE n_name = 'NATION_3'
  GROUP BY 1
)
SELECT l_partkey AS p_partkey, value
FROM nat_supply
WHERE value > (SELECT ROUND(SUM(value) * 0.001, 2) FROM nat_supply)
"""


@register("q11_important_value", _Q11_SQL)
def q11_important_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose one-nation supply value beats a global fraction (Q11 shape)."""
    nation = load_table(spark, sf_dir, "nation").where(
        F.col("n_name") == "NATION_3"
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    nat_supply = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("value"))
    )
    cutoff = nat_supply.agg(F.round(F.sum("value") * 0.001, 2)).scalar()
    return nat_supply.where(F.col("value") > cutoff).select(
        F.col("l_partkey").alias("p_partkey"), "value"
    )


# ---------------------------------------------------------------------------
# Q12 (adapted) lateness bands: the schema has no shipmode/commitdate,
# so the band is ship lag (shipdate − orderdate in days): >90 'late',
# else 'ontime', over 1996 shipments. Keeps Q12's one-join CASE-sum
# shape: counts split by order priority class inside the aggregate.
# ---------------------------------------------------------------------------

_Q12_SQL = """
SELECT CASE WHEN DATEDIFF('day', o.o_orderdate, l.l_shipdate) > 90
            THEN 'late' ELSE 'ontime' END AS ship_band,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY 1
"""


@register("q12_priority_lateness", _Q12_SQL)
def q12_priority_lateness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority counts by ship-lag band (TPC-H Q12 shape, lag for shipmode)."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01 00:00:00")
        & (F.col("l_shipdate") < "1997-01-01 00:00:00")
    ).select("l_orderkey", "l_shipdate")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    lag = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.when(lag > 90, "late").otherwise("ontime").alias("ship_band")
        )
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Q16 (adapted) supplier count by part attributes: distinct suppliers
# per (brand, type, size) over the lineitem-derived supply pairs,
# excluding "complaint" suppliers (negative account balance stands in
# for the comment-text predicate). NOT-IN becomes a broadcast
# anti-join on the tiny exclusion set; COUNT(DISTINCT) rides a
# two-level hash aggregate, no window.
# ---------------------------------------------------------------------------

_Q16_SQL = """
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#5'
  AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
"""


@register("q16_supplier_count", _Q16_SQL)
def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct supplier count per part attribute triple (Q16 shape)."""
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    complaints = load_table(spark, sf_dir, "supplier").where(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    pairs = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .dropDuplicates()
    )
    return (
        pairs.join(F.broadcast(part), pairs.l_partkey == part.p_partkey)
        .join(
            F.broadcast(complaints),
            pairs.l_suppkey == complaints.s_suppkey,
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Q20 (adapted) excess suppliers: suppliers of red parts whose shipped
# quantity for some part exceeds half that part's total shipped
# quantity — availqty is derived from lineitem since there is no
# partsupp. The canonical nested IN-chain becomes: per-(part,supplier)
# agg → join per-part total (same shuffle key) → threshold filter →
# ids-only semi-join onto the nation-filtered supplier dim.
# ---------------------------------------------------------------------------

_Q20_SQL = """
WITH red_parts AS (
  SELECT p_partkey FROM part WHERE p_name LIKE 'red%'
),
shipped AS (
  SELECT l_partkey, l_suppkey, ROUND(SUM(l_quantity), 2) AS qty
  FROM lineitem JOIN red_parts ON p_partkey = l_partkey
  GROUP BY 1, 2
),
part_total AS (
  SELECT l_partkey, ROUND(0.15 * SUM(qty), 2) AS thresh
  FROM shipped GROUP BY 1
),
excess AS (
  SELECT DISTINCT s.l_suppkey
  FROM shipped s
  JOIN part_total t ON t.l_partkey = s.l_partkey
  WHERE s.qty > t.thresh
)
SELECT s.s_suppkey, s.s_name
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE n.n_name = 'NATION_3'
  AND s.s_suppkey IN (SELECT l_suppkey FROM excess)
"""


@register("q20_excess_supply", _Q20_SQL)
def q20_excess_supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers holding >half a red part's shipped quantity (Q20 shape)."""
    red = load_table(spark, sf_dir, "part").where(
        F.col("p_name").like("red%")
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    shipped = (
        li.join(F.broadcast(red), li.l_partkey == red.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("qty"))
    )
    part_total = shipped.groupBy(F.col("l_partkey").alias("tp")).agg(
        F.round(0.15 * F.sum("qty"), 2).alias("thresh")
    )
    excess = (
        shipped.join(part_total, shipped.l_partkey == part_total.tp)
        .where(F.col("qty") > F.col("thresh"))
        .select("l_suppkey")
        .dropDuplicates()
    )
    nation = load_table(spark, sf_dir, "nation").where(
        F.col("n_name") == "NATION_3"
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name")
    )
    return supp.join(
        excess, supp.s_suppkey == excess.l_suppkey, "left_semi"
    ).select("s_suppkey", "s_name")


# ---------------------------------------------------------------------------
# Q21 (adapted) suppliers who kept waiting: in finished multi-supplier
# orders, the supplier whose latest line matches the order's latest
# ship date held everyone up (ship lag stands in for the missing
# commit/receipt dates). The canonical EXISTS / NOT EXISTS pair
# becomes two aggregates sharing the orderkey shuffle: per-order
# (max ship, distinct suppliers) joined to per-(order, supplier)
# max ship — no correlated subplan, no window over the fact table.
# ---------------------------------------------------------------------------

_Q21_SQL = """
WITH per_order AS (
  SELECT l.l_orderkey,
         MAX(l.l_shipdate) AS order_max,
         COUNT(DISTINCT l.l_suppkey) AS n_supp
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderstatus = 'F'
  GROUP BY 1
),
per_supp AS (
  SELECT l.l_orderkey, l.l_suppkey, MAX(l.l_shipdate) AS supp_max
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderstatus = 'F'
  GROUP BY 1, 2
)
SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM per_supp ps
JOIN per_order po ON po.l_orderkey = ps.l_orderkey
JOIN supplier s   ON s.s_suppkey = ps.l_suppkey
JOIN nation n     ON n.n_nationkey = s.s_nationkey
WHERE po.n_supp >= 2 AND ps.supp_max = po.order_max
  AND n.n_name = 'NATION_4'
GROUP BY 1
"""


@register("q21_waiting_supplier", _Q21_SQL)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers whose line closed out finished multi-supplier orders (Q21 shape)."""
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
    )
    per_order = li.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.max("l_shipdate").alias("order_max"),
        F.count_distinct("l_suppkey").alias("n_supp"),
    )
    per_supp = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("l_shipdate").alias("supp_max")
    )
    nation = load_table(spark, sf_dir, "nation").where(
        F.col("n_name") == "NATION_4"
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name")
    )
    return (
        per_supp.join(per_order, per_supp.l_orderkey == per_order.ok)
        .where((F.col("n_supp") >= 2) & (F.col("supp_max") == F.col("order_max")))
        .join(F.broadcast(supp), per_supp.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
