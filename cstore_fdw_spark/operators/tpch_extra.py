"""Extended TPC-H-shape coverage (Q4/Q7/Q8/Q13/Q15/Q17/Q19/Q20/Q21/Q22
adapted to the driver's schema — no partsupp table, l_shipdate in place of
commit/receipt dates).

Together with relational/joins/subqueries these cover every TPC-H query
archetype expressible over the test schema: EXISTS-per-order (Q4), nation
bi-directional volume (Q7), market share (Q8), distribution histogram
(Q13), CTE + global max (Q15), per-key-average correlated filter (Q17),
disjunctive bracketed predicates (Q19), nested IN chains (Q20),
multi-supplier wait analysis (Q21), and prefix cohorts with anti join
(Q22).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cstore_fdw_spark.operators import register, table
from cstore_fdw_spark.operators.relational import D, _dbl, dec, dsum, to_dbl


@register(
    "q4_order_priority",
    category="tpch",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """)
def q4_order_priority(spark, sf_dir):
    """Q4 shape: per-order EXISTS (any line shipped after order date) —
    correlated semi join with a non-equi residual."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp")))
    li = table(spark, sf_dir, "lineitem")
    return (o.join(li, (o.o_orderkey == li.l_orderkey)
                   & (li.l_shipdate > o.o_orderdate), "left_semi")
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("order_count"))
            .orderBy("o_orderpriority"))


@register(
    "q7_volume_shipping",
    category="tpch",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           {_dbl(f"SUM(CAST(volume AS DECIMAL(22,6)))")} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(YEAR FROM l.l_shipdate) AS BIGINT) AS l_year,
             CAST(l.l_extendedprice AS {D})
               * (1 - CAST(l.l_discount AS DECIMAL(8,4))) AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """)
def q7_volume_shipping(spark, sf_dir):
    """Q7 shape: bi-directional trade volume between two nations by year
    (disjunctive join filter over two nation dims)."""
    s = table(spark, sf_dir, "supplier")
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n1 = table(spark, sf_dir, "nation").alias("n1")
    n2 = table(spark, sf_dir, "nation").alias("n2")
    na, nb = "NATION_1", "NATION_2"
    vol = dec("l_extendedprice") * (F.lit(1) - dec("l_discount", "decimal(8,4)"))
    df = (li.join(s, li.l_suppkey == s.s_suppkey)
          .join(o, o.o_orderkey == li.l_orderkey)
          .join(c, c.c_custkey == o.o_custkey)
          .join(F.broadcast(n1), s.s_nationkey == F.col("n1.n_nationkey"))
          .join(F.broadcast(n2), c.c_nationkey == F.col("n2.n_nationkey"))
          .filter(((F.col("n1.n_name") == na) & (F.col("n2.n_name") == nb))
                  | ((F.col("n1.n_name") == nb) & (F.col("n2.n_name") == na)))
          .select(F.col("n1.n_name").alias("supp_nation"),
                  F.col("n2.n_name").alias("cust_nation"),
                  F.year("l_shipdate").cast("long").alias("l_year"),
                  vol.alias("volume")))
    return (df.groupBy("supp_nation", "cust_nation", "l_year")
            .agg(to_dbl(F.sum(F.col("volume").cast("decimal(22,6)")))
                 .alias("revenue"))
            .orderBy("supp_nation", "cust_nation", "l_year"))


@register(
    "q8_market_share",
    category="tpch",
    oracle=f"""
    WITH all_nations AS (
      SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
             CAST(l.l_extendedprice AS {D})
               * (1 - CAST(l.l_discount AS DECIMAL(8,4))) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem l
      JOIN part p     ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
      JOIN region r   ON n1.n_regionkey = r.r_regionkey
      JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO')
    SELECT o_year,
           {_dbl("SUM(CASE WHEN supp_nation = 'NATION_1' THEN CAST(volume AS DECIMAL(22,6)) ELSE CAST(0 AS DECIMAL(22,6)) END)")}
             / NULLIF({_dbl("SUM(CAST(volume AS DECIMAL(22,6)))")}, 0)
             AS mkt_share
    FROM all_nations GROUP BY o_year ORDER BY o_year
    """)
def q8_market_share(spark, sf_dir):
    """Q8 shape: one nation's share of a region's PROMO volume by year
    (conditional-sum ratio; NULLIF guards empty years)."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n1 = table(spark, sf_dir, "nation").alias("n1")
    n2 = table(spark, sf_dir, "nation").alias("n2")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol = (dec("l_extendedprice")
           * (F.lit(1) - dec("l_discount", "decimal(8,4)"))).cast("decimal(22,6)")
    base = (li.join(p, li.l_partkey == p.p_partkey)
            .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
            .join(o, o.o_orderkey == li.l_orderkey)
            .join(c, c.c_custkey == o.o_custkey)
            .join(F.broadcast(n1), c.c_nationkey == F.col("n1.n_nationkey"))
            .join(F.broadcast(r), F.col("n1.n_regionkey") == r.r_regionkey)
            .join(F.broadcast(n2), s.s_nationkey == F.col("n2.n_nationkey"))
            .select(F.year("o_orderdate").cast("long").alias("o_year"),
                    vol.alias("volume"),
                    F.col("n2.n_name").alias("supp_nation")))
    nat_vol = F.when(F.col("supp_nation") == "NATION_1",
                     F.col("volume")).otherwise(F.lit(0).cast("decimal(22,6)"))
    return (base.groupBy("o_year")
            .agg((to_dbl(F.sum(nat_vol))
                  / F.nullif(to_dbl(F.sum("volume")), F.lit(0.0)))
                 .alias("mkt_share"))
            .orderBy("o_year"))


@register(
    "q13_customer_distribution",
    category="tpch",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey) t
    GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """)
def q13_customer_distribution(spark, sf_dir):
    """Q13 shape: two-level aggregation — orders-per-customer histogram."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    per_cust = (c.join(o, c.c_custkey == o.o_custkey, "left")
                .groupBy("c_custkey")
                .agg(F.count("o_orderkey").alias("c_count")))
    return (per_cust.groupBy("c_count")
            .agg(F.count(F.lit(1)).alias("custdist"))
            .orderBy(F.col("custdist").desc(), F.col("c_count").desc()))


@register(
    "q15_top_supplier",
    category="tpch",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {_dbl(f"SUM(CAST(l_extendedprice AS {D}) * (1 - CAST(l_discount AS DECIMAL(8,4))))")}
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
    """)
def q15_top_supplier(spark, sf_dir):
    """Q15 shape: CTE revenue view + global-max scalar subquery."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp")))
    rev = dec("l_extendedprice") * (F.lit(1) - dec("l_discount", "decimal(8,4)"))
    revenue = (li.groupBy(F.col("l_suppkey").alias("supplier_no"))
               .agg(to_dbl(F.sum(rev)).alias("total_revenue")))
    max_rev = revenue.agg(F.max("total_revenue").alias("m"))
    s = table(spark, sf_dir, "supplier")
    return (s.join(revenue, s.s_suppkey == revenue.supplier_no)
            .join(F.broadcast(max_rev),
                  F.col("total_revenue") == F.col("m"))
            .select("s_suppkey", "s_name", "total_revenue")
            .orderBy("s_suppkey"))


@register(
    "q17_small_quantity",
    category="tpch",
    oracle=f"""
    SELECT {_dbl(f"SUM(CAST(l.l_extendedprice AS {D}))")} / 7.0
             AS avg_yearly,
           COUNT(*) AS n
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (SELECT l_partkey,
                 {_dbl(f"SUM(CAST(l_quantity AS {D}))")} / COUNT(*) AS avg_qty
          FROM lineitem GROUP BY l_partkey) a
      ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1' AND l.l_quantity < 0.5 * a.avg_qty
    """)
def q17_small_quantity(spark, sf_dir):
    """Q17 shape: rows below half their part's average quantity —
    per-key aggregate joined back to the fact (Catalyst's decorrelated
    form of the correlated avg subquery)."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    avg_q = (li.groupBy(F.col("l_partkey").alias("ak"))
             .agg((to_dbl(dsum("l_quantity")) / F.count(F.lit(1)))
                  .alias("avg_qty")))
    return (li.join(p, li.l_partkey == p.p_partkey)
            .join(avg_q, li.l_partkey == F.col("ak"))
            .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
            .agg((to_dbl(dsum("l_extendedprice")) / 7.0).alias("avg_yearly"),
                 F.count(F.lit(1)).alias("n")))


@register(
    "q19_disjunctive_brackets",
    category="tpch",
    oracle=f"""
    SELECT {_dbl(f"SUM(CAST(l_extendedprice AS {D}) * (1 - CAST(l_discount AS DECIMAL(8,4))))")}
             AS revenue,
           COUNT(*) AS n
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 21)
       OR (p.p_brand = 'Brand#7' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 20 AND 40)
       OR (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 35 AND 50)
    """)
def q19_disjunctive_brackets(spark, sf_dir):
    """Q19 shape: OR of three conjunctive brackets across the join —
    exercises CNF conversion / partial pushdown of disjunctions."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    rev = dec("l_extendedprice") * (F.lit(1) - dec("l_discount", "decimal(8,4)"))
    b1 = ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
          & F.col("l_quantity").between(1, 21))
    b2 = ((F.col("p_brand") == "Brand#7") & F.col("p_size").between(10, 30)
          & F.col("l_quantity").between(20, 40))
    b3 = ((F.col("p_brand") == "Brand#13") & F.col("p_size").between(20, 50)
          & F.col("l_quantity").between(35, 50))
    return (li.join(p, li.l_partkey == p.p_partkey)
            .filter(b1 | b2 | b3)
            .agg(to_dbl(F.sum(rev)).alias("revenue"),
                 F.count(F.lit(1)).alias("n")))


@register(
    "q20_nested_in_chain",
    category="tpch",
    oracle=f"""
    SELECT s_suppkey, s_name FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part
                          WHERE p_name LIKE '%widget%')
      GROUP BY l_suppkey
      HAVING SUM(CAST(l_quantity AS {D})) > 100)
    ORDER BY s_suppkey
    """)
def q20_nested_in_chain(spark, sf_dir):
    """Q20 shape: IN over (IN + grouped HAVING) — a two-level semi-join
    chain ending in an aggregate filter."""
    s = table(spark, sf_dir, "supplier")
    li = table(spark, sf_dir, "lineitem")
    p = (table(spark, sf_dir, "part")
         .filter(F.col("p_name").like("%widget%")).select("p_partkey"))
    heavy = (li.join(p.withColumnRenamed("p_partkey", "pk"),
                     F.col("l_partkey") == F.col("pk"), "left_semi")
             .groupBy("l_suppkey")
             .agg(dsum("l_quantity").alias("q"))
             .filter(F.col("q") > 100)
             .select("l_suppkey"))
    return (s.join(heavy, s.s_suppkey == heavy.l_suppkey, "left_semi")
            .select("s_suppkey", "s_name").orderBy("s_suppkey"))


@register(
    "q21_suppliers_kept_waiting",
    category="tpch",
    oracle="""
    WITH multi AS (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING COUNT(DISTINCT l_suppkey) >= 2),
    late AS (
      SELECT DISTINCT l.l_orderkey, l.l_suppkey
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    SELECT s.s_name, COUNT(*) AS numwait
    FROM late
    JOIN multi ON multi.l_orderkey = late.l_orderkey
    JOIN supplier s ON s.s_suppkey = late.l_suppkey
    GROUP BY s.s_name ORDER BY numwait DESC, s.s_name
    """)
def q21_suppliers_kept_waiting(spark, sf_dir):
    """Q21 shape (adapted to available dates): suppliers shipping >60 days
    after order date on finished multi-supplier orders."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = table(spark, sf_dir, "supplier")
    multi = (li.groupBy("l_orderkey")
             .agg(F.countDistinct("l_suppkey").alias("ns"))
             .filter(F.col("ns") >= 2).select("l_orderkey"))
    late = (li.join(o, o.o_orderkey == li.l_orderkey)
            .filter(F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
            .select("l_orderkey", "l_suppkey").distinct())
    return (late.join(multi.withColumnRenamed("l_orderkey", "mk"),
                      F.col("l_orderkey") == F.col("mk"), "left_semi")
            .join(s, F.col("l_suppkey") == s.s_suppkey)
            .groupBy("s_name")
            .agg(F.count(F.lit(1)).alias("numwait"))
            .orderBy(F.col("numwait").desc(), "s_name"))


@register(
    "q22_global_sales_opportunity",
    category="tpch",
    oracle=f"""
    WITH avg_bal AS (
      SELECT {_dbl(f"SUM(CAST(c_acctbal AS {D}))")} / COUNT(*) AS a
      FROM customer WHERE c_acctbal > 0),
    cohort AS (
      SELECT SUBSTRING(c.c_name, 17, 2) AS cntry, c.c_custkey, c.c_acctbal
      FROM customer c, avg_bal
      WHERE c.c_acctbal > avg_bal.a
        AND NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey
                          AND o.o_orderpriority = '1-URGENT'))
    SELECT cntry, COUNT(*) AS numcust,
           {_dbl(f"SUM(CAST(c_acctbal AS {D}))")} AS totacctbal
    FROM cohort GROUP BY cntry ORDER BY cntry
    """)
def q22_global_sales_opportunity(spark, sf_dir):
    """Q22 shape: above-average-balance customers with no urgent orders,
    grouped by a name-suffix cohort (anti join + uncorrelated scalar
    average; urgent-only subquery keeps the cohort non-empty on the
    synthetic data, where every customer has ≥1 order)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT")
    avg_bal = (c.filter(F.col("c_acctbal") > 0)
               .agg((to_dbl(dsum("c_acctbal")) / F.count(F.lit(1)))
                    .alias("a")))
    return (c.join(F.broadcast(avg_bal))
            .filter(F.col("c_acctbal") > F.col("a"))
            .join(o, c.c_custkey == o.o_custkey, "left_anti")
            .select(F.substring("c_name", 17, 2).alias("cntry"), "c_acctbal")
            .groupBy("cntry")
            .agg(F.count(F.lit(1)).alias("numcust"),
                 to_dbl(dsum("c_acctbal")).alias("totacctbal"))
            .orderBy("cntry"))
