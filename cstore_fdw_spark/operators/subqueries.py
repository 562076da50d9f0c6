"""Subquery & CTE surface: scalar (correlated + uncorrelated), IN/NOT IN,
lateral joins, CTE chains, and the TPC-H shapes built on them.

PostgreSQL's executor gives the reference's users full subquery support
(SURVEY §2.B); Catalyst provides the same via RewriteCorrelatedScalarSubquery
/ decorrelation — declared here through spark.sql over registered views
(the idiomatic Spark path for subquery syntax; DataFrame equivalents are
joins, already covered in operators/joins.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cstore_fdw_spark.operators import register, table
from cstore_fdw_spark.operators.relational import D, _dbl


def _views(spark, sf_dir, *names):
    for n in names:
        table(spark, sf_dir, n).createOrReplaceTempView(n)


@register(
    "subquery_scalar_uncorrelated",
    category="subquery",
    bench=True,
    oracle=f"""
    SELECT COUNT(*) AS n_above,
           {_dbl(f"SUM(CAST(l_extendedprice AS {D}))")} AS price_above
    FROM lineitem
    WHERE l_extendedprice > (SELECT 2 * {_dbl(f"SUM(CAST(l_extendedprice AS {D}))")}
                                    / COUNT(*) FROM lineitem)
    """)
def subquery_scalar_uncorrelated(spark, sf_dir):
    """Uncorrelated scalar subquery: items above 2× the average price
    (average via exact-decimal sum/count)."""
    _views(spark, sf_dir, "lineitem")
    return spark.sql(f"""
        SELECT COUNT(*) AS n_above,
               {_dbl(f"SUM(CAST(l_extendedprice AS {D}))")} AS price_above
        FROM lineitem
        WHERE l_extendedprice > (SELECT 2 * {_dbl(f"SUM(CAST(l_extendedprice AS {D}))")}
                                        / COUNT(*) FROM lineitem)
    """)


@register(
    "subquery_scalar_correlated",
    category="subquery",
    oracle="""
    SELECT c_custkey, c_nationkey,
           (SELECT COUNT(*) FROM orders o
            WHERE o.o_custkey = c.c_custkey) AS n_orders
    FROM customer c
    WHERE c_custkey < 200
    """)
def subquery_scalar_correlated(spark, sf_dir):
    """Correlated scalar subquery in the select list — Catalyst decorrelates
    it into an aggregate + left join (no nested-loop re-execution)."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql("""
        SELECT c_custkey, c_nationkey,
               (SELECT COUNT(*) FROM orders o
                WHERE o.o_custkey = c.c_custkey) AS n_orders
        FROM customer c
        WHERE c_custkey < 200
    """)


@register(
    "subquery_in_notin",
    category="subquery",
    oracle="""
    SELECT
      (SELECT COUNT(*) FROM part
       WHERE p_partkey IN (SELECT l_partkey FROM lineitem
                           WHERE l_quantity > 45)) AS n_in,
      (SELECT COUNT(*) FROM part
       WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem
                               WHERE l_quantity > 45)) AS n_not_in
    """)
def subquery_in_notin(spark, sf_dir):
    """IN / NOT IN subqueries (keys are non-null, so NOT IN's three-valued
    trap doesn't bite; both engines agree)."""
    _views(spark, sf_dir, "part", "lineitem")
    return spark.sql("""
        SELECT
          (SELECT COUNT(*) FROM part
           WHERE p_partkey IN (SELECT l_partkey FROM lineitem
                               WHERE l_quantity > 45)) AS n_in,
          (SELECT COUNT(*) FROM part
           WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem
                                   WHERE l_quantity > 45)) AS n_not_in
    """)


@register(
    "cte_chain",
    category="subquery",
    oracle=f"""
    WITH big_orders AS (
      SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      WHERE o_totalprice > 200000),
    per_customer AS (
      SELECT o_custkey, COUNT(*) AS n,
             {_dbl(f"SUM(CAST(o_totalprice AS {D}))")} AS total
      FROM big_orders GROUP BY o_custkey)
    SELECT c.c_mktsegment, COUNT(*) AS customers,
           {_dbl("SUM(CAST(pc.total AS DECIMAL(18,6)))")} AS segment_total
    FROM per_customer pc JOIN customer c ON c.c_custkey = pc.o_custkey
    GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment
    """)
def cte_chain(spark, sf_dir):
    """Chained CTEs feeding a join + aggregate."""
    _views(spark, sf_dir, "orders", "customer")
    return spark.sql(f"""
        WITH big_orders AS (
          SELECT o_orderkey, o_custkey, o_totalprice FROM orders
          WHERE o_totalprice > 200000),
        per_customer AS (
          SELECT o_custkey, COUNT(*) AS n,
                 {_dbl(f"SUM(CAST(o_totalprice AS {D}))")} AS total
          FROM big_orders GROUP BY o_custkey)
        SELECT c.c_mktsegment, COUNT(*) AS customers,
               {_dbl("SUM(CAST(pc.total AS DECIMAL(18,6)))")} AS segment_total
        FROM per_customer pc JOIN customer c ON c.c_custkey = pc.o_custkey
        GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment
    """)


@register(
    "lateral_topn_per_region",
    category="subquery",
    oracle="""
    SELECT r.r_name, t.n_name, t.n_nationkey
    FROM region r, LATERAL (
      SELECT n_name, n_nationkey FROM nation n
      WHERE n.n_regionkey = r.r_regionkey
      ORDER BY n_nationkey DESC LIMIT 2) t
    """)
def lateral_topn_per_region(spark, sf_dir):
    """LATERAL correlated subquery: top-2 nations per region (per-row
    subquery with ORDER BY + LIMIT)."""
    _views(spark, sf_dir, "region", "nation")
    return spark.sql("""
        SELECT r.r_name, t.n_name, t.n_nationkey
        FROM region r, LATERAL (
          SELECT n_name, n_nationkey FROM nation n
          WHERE n.n_regionkey = r.r_regionkey
          ORDER BY n_nationkey DESC LIMIT 2) t
    """)


@register(
    "q6_forecast_revenue",
    category="subquery",
    bench=True,
    oracle=f"""
    SELECT {_dbl(f"SUM(CAST(l_extendedprice AS {D}) * CAST(l_discount AS DECIMAL(8,4)))")}
             AS revenue,
           COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.04 AND 0.07
      AND l_quantity < 24
    """)
def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: tight multi-predicate scan + global aggregate —
    the pure pushdown/skipping benchmark (every predicate reaches the
    Parquet reader; zero shuffles beyond the final partial-agg merge)."""
    from cstore_fdw_spark.operators.relational import dec, to_dbl
    li = table(spark, sf_dir, "lineitem")
    return (li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.04, 0.07)
            & (F.col("l_quantity") < 24))
            .agg(to_dbl(F.sum(dec("l_extendedprice")
                              * dec("l_discount", "decimal(8,4)")))
                 .alias("revenue"),
                 F.count(F.lit(1)).alias("n")))


@register(
    "q12_shipmode_priority",
    category="subquery",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_linestatus ORDER BY l_linestatus
    """)
def q12_shipmode_priority(spark, sf_dir):
    """TPC-H Q12 shape: conditional counting inside a grouped aggregate
    over a join (CASE pivots computed map-side)."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp")))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("l_linestatus")
            .agg(F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
                 F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"))
            .orderBy("l_linestatus"))


@register(
    "q18_large_volume_customer",
    category="subquery",
    bench=True,
    oracle=f"""
    SELECT c_custkey, o_orderkey,
           {_dbl(f"SUM(CAST(l_quantity AS {D}))")} AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS {D})) > 150)
    GROUP BY c_custkey, o_orderkey
    ORDER BY total_qty DESC, o_orderkey
    LIMIT 20
    """)
def q18_large_volume_customer(spark, sf_dir):
    """TPC-H Q18 shape: IN over a grouped-HAVING subquery (semi join on an
    aggregated key set), top-20."""
    from cstore_fdw_spark.operators.relational import dec, dsum, to_dbl
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    big = (li.groupBy("l_orderkey")
           .agg(dsum("l_quantity").alias("q"))
           .filter(F.col("q") > 150)
           .select("l_orderkey"))
    # the HAVING-filtered key set is small → semi join is broadcastable by
    # AQE; orders/customer stay shuffle joins (fact-scale at 100 TB)
    return (li.join(big.withColumnRenamed("l_orderkey", "bk"),
                    F.col("l_orderkey") == F.col("bk"), "left_semi")
            .join(o, F.col("l_orderkey") == o.o_orderkey)
            .join(c, o.o_custkey == c.c_custkey)
            .groupBy("c_custkey", "o_orderkey")
            .agg(to_dbl(dsum("l_quantity")).alias("total_qty"))
            .orderBy(F.col("total_qty").desc(), "o_orderkey")
            .limit(20))


@register(
    "q14_promo_effect",
    category="subquery",
    oracle=f"""
    SELECT
      {_dbl(f"SUM(CASE WHEN p_type LIKE 'PROMO%' THEN CAST(l_extendedprice AS {D}) * (1 - CAST(l_discount AS DECIMAL(8,4))) ELSE CAST(0 AS DECIMAL(22,6)) END)")}
        AS promo_revenue,
      {_dbl(f"SUM(CAST(l_extendedprice AS {D}) * (1 - CAST(l_discount AS DECIMAL(8,4))))")}
        AS total_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
    """)
def q14_promo_effect(spark, sf_dir):
    """TPC-H Q14 shape: conditional revenue share over a fact⋈dim join."""
    from cstore_fdw_spark.operators.relational import dec, to_dbl
    p = table(spark, sf_dir, "part")
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp")))
    rev = dec("l_extendedprice") * (F.lit(1) - dec("l_discount", "decimal(8,4)"))
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(
        F.lit(0).cast("decimal(22,6)"))
    return (li.join(p, li.l_partkey == p.p_partkey)
            .agg(to_dbl(F.sum(promo)).alias("promo_revenue"),
                 to_dbl(F.sum(rev)).alias("total_revenue")))


@register(
    "subquery_any_all_acctbal",
    category="subquery",
    oracle="""
    SELECT s_suppkey, s_name, s_nationkey, s_acctbal
    FROM supplier s
    WHERE s_acctbal > ALL (SELECT c_acctbal FROM customer c
                           WHERE c.c_nationkey = s.s_nationkey)
    """)
def subquery_any_all_acctbal(spark, sf_dir):
    """Quantified comparison (``> ALL`` over a correlated subquery — the
    PG idiom next to EXISTS/IN): suppliers whose account balance beats
    EVERY customer of their nation. Decorrelated the way a planner
    would: ``> ALL S`` ≡ ``> max(S)`` when S is NULL-free, and an empty
    S is vacuously true — so the plan is one per-nation max aggregate
    (25 rows, broadcast) left-joined to suppliers; no per-row subquery
    execution anywhere. The same rewrite holds at 100 TB: the inner
    aggregate is keyed on the correlation column, one shuffle."""
    s = table(spark, sf_dir, "supplier")
    c = table(spark, sf_dir, "customer")
    nmax = (c.groupBy(F.col("c_nationkey").alias("s_nationkey"))
            .agg(F.max("c_acctbal").alias("max_bal")))
    return (s.join(F.broadcast(nmax), "s_nationkey", "left")
            .filter(F.col("max_bal").isNull()
                    | (F.col("s_acctbal") > F.col("max_bal")))
            .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal"))


#: clamped-balance recursion depth (well under Spark's default
#: cteRecursionLevelLimit of 100)
RB_STEPS = 40

#: the recursion body, shared verbatim by Spark and DuckDB: a ranked
#: per-supplier delta stream (returns add stock, shipments drain it)
#: folded through balance' = max(0, balance + delta) with a clamp
#: counter — a NON-LINEAR recurrence no window function can express
#: (the clamp makes prefix sums wrong the moment any prefix dips below
#: zero), i.e. the query class that genuinely requires WITH RECURSIVE.
_RB_BODY = f"""
    deltas AS (
      SELECT l_suppkey AS s, rn,
             CASE WHEN l_returnflag = 'R'
                  THEN CAST(ROUND(l_quantity) AS BIGINT)
                  ELSE -CAST(ROUND(l_quantity) AS BIGINT) END AS delta
      FROM (
        SELECT l_suppkey, l_returnflag, l_quantity,
               ROW_NUMBER() OVER (PARTITION BY l_suppkey
                                  ORDER BY l_shipdate, l_orderkey,
                                           l_linenumber) AS rn
        FROM lineitem) r
      WHERE rn <= {RB_STEPS}),
    bal(s, rn, balance, clamps) AS (
      SELECT DISTINCT l_suppkey, 0, CAST(0 AS BIGINT), CAST(0 AS BIGINT)
      FROM lineitem
      UNION ALL
      SELECT b.s, b.rn + 1,
             GREATEST(CAST(0 AS BIGINT), b.balance + d.delta),
             b.clamps + CASE WHEN b.balance + d.delta < 0
                             THEN 1 ELSE 0 END
      FROM bal b JOIN deltas d ON d.s = b.s AND d.rn = b.rn + 1)
    SELECT s AS l_suppkey, CAST(balance AS BIGINT) AS final_balance,
           CAST(clamps AS BIGINT) AS n_clamps
    FROM bal WHERE rn = {RB_STEPS} ORDER BY l_suppkey
"""


@register(
    "recursive_clamped_balance",
    category="subquery",
    oracle=f"WITH RECURSIVE {_RB_BODY}")
def recursive_clamped_balance(spark, sf_dir):
    """WITH RECURSIVE through Spark's native recursive-CTE support
    (SPARK-24497, Spark 4.x): per-supplier inventory replay where
    returns restock and shipments drain, clamped at zero — the
    recurrence balance' = max(0, balance + delta) is non-linear, so NO
    window/prefix-sum formulation exists (any prefix dipping below zero
    breaks linearity); this is the query class the reference's users
    run through PostgreSQL's recursive CTEs (the host-executor surface
    cstore_fdw delegates to, cstore_fdw.c:1743-1750) and the DuckDB
    oracle runs the IDENTICAL text. All-integer arithmetic, so the fold
    hash-matches bit for bit.

    Scale: recursion depth is the bounded RB_STEPS (40), not the corpus
    — each recursive step is one hash join of the |suppliers|-sized
    frontier against the rank-pruned delta table, so total work is
    O(steps x suppliers), independent of lineitem row count once the
    ranked prefix is cut. The ROW_NUMBER prune shuffles the corpus
    once; a pre-sorted projection (projections.py) would remove even
    that at 100 TB."""
    _views(spark, sf_dir, "lineitem")
    return spark.sql(f"WITH RECURSIVE {_RB_BODY}")
