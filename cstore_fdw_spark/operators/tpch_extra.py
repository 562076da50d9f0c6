"""Extended TPC-H-shape coverage (Q2/Q4/Q7/Q8/Q9/Q11/Q13/Q15/Q16/Q17/Q19/
Q20/Q21/Q22 adapted to the driver's schema — no partsupp table, so the
observed (l_partkey, l_suppkey) pairs in lineitem stand in for the
part-supplier relationship, unit price for ps_supplycost, p_retailprice
for the cost side of Q9's profit, and l_shipdate for commit/receipt
dates).

Together with relational/joins/subqueries these cover every TPC-H query
archetype expressible over the test schema: min-cost supplier with a
correlated min (Q2), EXISTS-per-order (Q4), nation bi-directional volume
(Q7), market share (Q8), profit decomposition (Q9), value concentration
with a scalar-threshold HAVING (Q11), distribution histogram (Q13), CTE +
global max (Q15), distinct-supplier counting with NOT IN (Q16),
per-key-average correlated filter (Q17), disjunctive bracketed predicates
(Q19), nested IN chains (Q20), multi-supplier wait analysis (Q21), and
prefix cohorts with anti join (Q22).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cstore_fdw_spark.operators import register, table, track_cache
from cstore_fdw_spark.operators.relational import D, D4, _dbl, dec, dsum, to_dbl


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
    "q21_suppliers_kept_waiting", bench=True,
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
    allow_bnlj=True,  # 1-row avg-balance scalar subquery comparison
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


@register(
    "q2_min_cost_supplier",
    category="tpch",
    oracle="""
    WITH costs AS (
      SELECT l.l_partkey, l.l_suppkey,
             MIN(l.l_extendedprice / l.l_quantity) AS unit_cost
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      JOIN region r   ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'ASIA'
      GROUP BY l.l_partkey, l.l_suppkey)
    SELECT s.s_acctbal, s.s_name, n.n_name AS nation,
           p.p_partkey, p.p_name, c.unit_cost AS supplycost
    FROM part p
    JOIN costs c    ON c.l_partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = c.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE p.p_size BETWEEN 10 AND 20 AND p.p_type = 'PROMO'
      AND c.unit_cost = (SELECT MIN(c2.unit_cost) FROM costs c2
                         WHERE c2.l_partkey = p.p_partkey)
    ORDER BY s.s_acctbal DESC, nation, s.s_name, p.p_partkey
    """)
def q2_min_cost_supplier(spark, sf_dir):
    """Q2 shape: cheapest regional supplier per part — correlated MIN
    subquery decorrelated into a per-part min join. ps_supplycost is
    adapted to the observed unit price MIN(l_extendedprice/l_quantity)
    per (part, supplier) pair; doubles divide/bit-compare identically in
    Spark and DuckDB, so the min-equality join is engine-exact.

    Scale: the costs table is built once (localCheckpoint) and feeds both
    the candidate join and the per-part-min side — at cluster scale this
    is the persisted signature-table step, not a recomputation. Dims
    (nation/region/part-filter) broadcast."""
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    costs = (li.join(F.broadcast(s.select("s_suppkey", "s_nationkey")),
                     li.l_suppkey == F.col("s_suppkey"))
             .join(F.broadcast(n.select("n_nationkey", "n_regionkey")),
                   F.col("s_nationkey") == F.col("n_nationkey"))
             .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey,
                   "left_semi")
             .groupBy("l_partkey", "l_suppkey")
             .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity"))
                  .alias("unit_cost"))
             .localCheckpoint(eager=False))
    track_cache(costs)
    min_cost = (costs.groupBy(F.col("l_partkey").alias("mk"))
                .agg(F.min("unit_cost").alias("mc")))
    p = (table(spark, sf_dir, "part")
         .filter(F.col("p_size").between(10, 20) & (F.col("p_type") == "PROMO"))
         .select("p_partkey", "p_name"))
    s2 = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name",
                                                 "s_acctbal", "s_nationkey")
    n2 = table(spark, sf_dir, "nation").select("n_nationkey",
                                               F.col("n_name").alias("nation"))
    return (costs.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
            .join(min_cost, (F.col("l_partkey") == F.col("mk"))
                  & (F.col("unit_cost") == F.col("mc")), "left_semi")
            .join(F.broadcast(s2), F.col("l_suppkey") == F.col("s_suppkey"))
            .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_acctbal", "s_name", "nation", "p_partkey", "p_name",
                    F.col("unit_cost").alias("supplycost"))
            .orderBy(F.col("s_acctbal").desc(), "nation", "s_name",
                     "p_partkey"))


@register(
    "q9_product_type_profit",
    bench=True,
    category="tpch",
    oracle=f"""
    SELECT nation, o_year,
           {_dbl("SUM(CAST(amount AS DECIMAL(22,6)))")} AS sum_profit
    FROM (
      SELECT n.n_name AS nation,
             CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
             CAST(l.l_extendedprice AS {D})
               * (1 - CAST(l.l_discount AS {D4}))
               - CAST(p.p_retailprice AS {D}) * CAST(l.l_quantity AS {D})
               AS amount
      FROM lineitem l
      JOIN part p     ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      WHERE p.p_name LIKE '%widget%') profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """)
def q9_product_type_profit(spark, sf_dir):
    """Q9 shape: profit (revenue minus cost) by supplier nation and order
    year for one product family. ps_supplycost is adapted to
    p_retailprice × quantity. All arithmetic stays in exact decimals
    (scale ≤ 6) until the final to_dbl, per the engine's determinism
    conventions.

    Scale: part filter and supplier/nation dims broadcast; the only big
    shuffle is lineitem ⋈ orders on orderkey, then one partial-agg
    shuffle on (nation, year) — 175 groups, so the combine is map-side."""
    li = table(spark, sf_dir, "lineitem")
    p = (table(spark, sf_dir, "part")
         .filter(F.col("p_name").like("%widget%"))
         .select("p_partkey", "p_retailprice"))
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    n = table(spark, sf_dir, "nation")
    amount = (dec("l_extendedprice")
              * (F.lit(1) - dec("l_discount", "decimal(8,4)"))
              - dec("p_retailprice") * dec("l_quantity"))
    return (li.join(F.broadcast(p), li.l_partkey == F.col("p_partkey"))
            .join(F.broadcast(s), li.l_suppkey == F.col("s_suppkey"))
            .join(o, li.l_orderkey == F.col("o_orderkey"))
            .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
            .select(F.col("n_name").alias("nation"),
                    F.year("o_orderdate").cast("long").alias("o_year"),
                    amount.alias("amount"))
            .groupBy("nation", "o_year")
            .agg(to_dbl(F.sum(F.col("amount").cast("decimal(22,6)")))
                 .alias("sum_profit"))
            .orderBy("nation", F.col("o_year").desc()))


@register(
    "q11_important_stock",
    category="tpch",
    allow_bnlj=True,  # 1-row global-value scalar subquery comparison
    oracle=f"""
    WITH value_by_part AS (
      SELECT l.l_partkey,
             CAST(SUM(CAST(l.l_extendedprice AS {D})
                      * CAST(l.l_quantity AS {D})) AS DECIMAL(18,4)) AS v
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      JOIN region r   ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'ASIA'
      GROUP BY l.l_partkey),
    tot AS (SELECT SUM(v) AS total, CAST(COUNT(*) AS DECIMAL(10,0)) AS cnt
            FROM value_by_part)
    SELECT p.l_partkey, {_dbl("p.v")} AS part_value
    FROM value_by_part p, tot t
    WHERE p.v * t.cnt > t.total + t.total
    ORDER BY part_value DESC, p.l_partkey
    """)
def q11_important_stock(spark, sf_dir):
    """Q11 shape: parts whose one-region value exceeds a threshold tied
    to the whole distribution — grouped agg + uncorrelated scalar in
    HAVING. TPC-H scales its fraction by 1/SF; the scale-invariant analog
    here is "v above 2× the mean part value", and the comparison is
    cross-multiplied (v × cnt > 2 × total) so it stays in EXACT decimals —
    a double-typed total would sum in engine-dependent order and flip
    boundary rows.

    Scale: value_by_part is one shuffle on l_partkey after a broadcast
    supplier-semi-join, localCheckpointed so the scalar total does not
    re-scan lineitem; the (total, cnt) scalar broadcasts."""
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = (table(spark, sf_dir, "region")
         .filter(F.col("r_name") == "ASIA").select("r_regionkey"))
    reg_sup = (s.join(F.broadcast(n), s.s_nationkey == F.col("n_nationkey"))
               .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"),
                     "left_semi")
               .select("s_suppkey"))
    value = (li.join(F.broadcast(reg_sup), li.l_suppkey == F.col("s_suppkey"),
                     "left_semi")
             .groupBy("l_partkey")
             .agg(F.sum(dec("l_extendedprice") * dec("l_quantity"))
                  .cast("decimal(18,4)").alias("v"))
             .localCheckpoint(eager=False))
    track_cache(value)
    tot = value.agg(F.sum("v").alias("total"),
                    F.count(F.lit(1)).cast("decimal(10,0)").alias("cnt"))
    return (value.join(F.broadcast(tot))
            .filter(F.col("v") * F.col("cnt")
                    > F.col("total") + F.col("total"))
            .select("l_partkey", to_dbl(F.col("v")).alias("part_value"))
            .orderBy(F.col("part_value").desc(), "l_partkey"))


@register(
    "q16_supplier_part_count",
    category="tpch",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type NOT LIKE 'MEDIUM%'
      AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                              WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """)
def q16_supplier_part_count(spark, sf_dir):
    """Q16 shape: distinct-supplier counts per part attribute bucket with
    negated predicates and a NOT IN exclusion (reference's "customer
    complaints" filter adapted to negative-balance suppliers). The
    lineitem (part, supplier) pairs stand in for partsupp.

    Scale: part filter and the excluded-supplier set broadcast (anti
    join); COUNT(DISTINCT) shuffles on the 3-column group key — Spark
    expands it to a two-phase distinct-then-count, which is the right
    plan at 100 TB too."""
    li = table(spark, sf_dir, "lineitem")
    p = (table(spark, sf_dir, "part")
         .filter((F.col("p_brand") != "Brand#1")
                 & ~F.col("p_type").like("MEDIUM%")
                 & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
         .select("p_partkey", "p_brand", "p_type", "p_size"))
    bad = (table(spark, sf_dir, "supplier")
           .filter(F.col("s_acctbal") < 0).select("s_suppkey"))
    return (li.join(F.broadcast(p), li.l_partkey == F.col("p_partkey"))
            .join(F.broadcast(bad), li.l_suppkey == F.col("s_suppkey"),
                  "left_anti")
            .groupBy("p_brand", "p_type", "p_size")
            .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
            .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type",
                     "p_size"))
