"""Window-function surface: ranking, offsets, running/frame aggregates.

PG window functions are host-executor capabilities the reference's users
rely on (SURVEY §2.B window row). Spark's WindowExec shuffles once on the
partition key and sorts within partitions — at 100 TB the partition key
cardinality (custkey, priority) keeps partitions bounded.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cstore_fdw_spark.operators import register, table
from cstore_fdw_spark.operators.relational import dec, to_dbl


@register(
    "window_topk_per_group",
    bench=True,
    category="window",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice, rn FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             CAST(ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
      FROM orders) t
    WHERE rn <= 3
    """)
def window_topk_per_group(spark, sf_dir):
    """row_number top-k per group (the canonical 'top orders per priority')."""
    w = (Window.partitionBy("o_orderpriority")
         .orderBy(F.col("o_totalprice").desc(), "o_orderkey"))
    return (table(spark, sf_dir, "orders")
            .select("o_orderpriority", "o_orderkey", "o_totalprice",
                    F.row_number().over(w).cast("long").alias("rn"))
            .filter(F.col("rn") <= 3))


@register(
    "window_rank_dense",
    category="window",
    oracle="""
    SELECT c_nationkey, c_custkey, c_acctbal,
           CAST(RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS BIGINT) AS rnk,
           CAST(DENSE_RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS BIGINT) AS drnk
    FROM customer
    """)
def window_rank_dense(spark, sf_dir):
    """rank / dense_rank (rank value depends only on the order key, so ties
    are deterministic without a tiebreaker column)."""
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc())
    return (table(spark, sf_dir, "customer")
            .select("c_nationkey", "c_custkey", "c_acctbal",
                    F.rank().over(w).cast("long").alias("rnk"),
                    F.dense_rank().over(w).cast("long").alias("drnk")))


@register(
    "window_lag_lead",
    category="window",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
           LAG(o_totalprice)  OVER w AS prev_price,
           LEAD(o_totalprice) OVER w AS next_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """)
def window_lag_lead(spark, sf_dir):
    """lag/lead offsets along each customer's order history (raw column
    passthrough — no float arithmetic, so bit-exact)."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (table(spark, sf_dir, "orders")
            .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice",
                    F.lag("o_totalprice").over(w).alias("prev_price"),
                    F.lead("o_totalprice").over(w).alias("next_price")))


@register(
    "window_running_sum",
    category="window",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DECIMAL(38,6)) AS STRING) AS DOUBLE) AS running_total
    FROM orders
    """)
def window_running_sum(spark, sf_dir):
    """Running total with an explicit ROWS frame (exact decimal inside the
    frame aggregate)."""
    w = (Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (table(spark, sf_dir, "orders")
            .select("o_custkey", "o_orderkey",
                    to_dbl(F.sum(dec("o_totalprice")).over(w))
                    .alias("running_total")))


@register(
    "window_range_frame",
    category="window",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice,
           COUNT(*) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice
                          RANGE BETWEEN 5000 PRECEDING AND CURRENT ROW)
             AS near_cheaper
    FROM orders
    """)
def window_range_frame(spark, sf_dir):
    """RANGE (value-based) frame: count of orders within $5000 below each
    order's price in its priority class."""
    w = (Window.partitionBy("o_orderpriority").orderBy("o_totalprice")
         .rangeBetween(-5000, Window.currentRow))
    return (table(spark, sf_dir, "orders")
            .select("o_orderpriority", "o_orderkey", "o_totalprice",
                    F.count(F.lit(1)).over(w).alias("near_cheaper")))


@register(
    "window_distribution",
    category="window",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CAST(NTILE(4) OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal, c_custkey) AS BIGINT) AS quartile,
           CAST(PERCENT_RANK() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal, c_custkey) AS DOUBLE) AS pct_rank,
           CAST(CUME_DIST() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal, c_custkey) AS DOUBLE) AS cume
    FROM customer
    """)
def window_distribution(spark, sf_dir):
    """ntile / percent_rank / cume_dist (ratios of exact integer counts —
    deterministic double division)."""
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return (table(spark, sf_dir, "customer")
            .select("c_custkey", "c_mktsegment",
                    F.ntile(4).over(w).cast("long").alias("quartile"),
                    F.percent_rank().over(w).cast("double").alias("pct_rank"),
                    F.cume_dist().over(w).cast("double").alias("cume")))


@register(
    "window_first_last_value",
    category="window",
    oracle="""
    SELECT o_custkey, o_orderkey,
           FIRST_VALUE(o_orderdate) OVER w AS first_order,
           LAST_VALUE(o_orderdate) OVER (PARTITION BY o_custkey
              ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS last_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """)
def window_first_last_value(spark, sf_dir):
    """first_value / last_value with an explicit full frame for last."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (table(spark, sf_dir, "orders")
            .select("o_custkey", "o_orderkey",
                    F.first("o_orderdate").over(w).alias("first_order"),
                    F.last("o_orderdate").over(wfull).alias("last_order")))


@register(
    "window_gaps_islands",
    category="window",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
      FROM events),
    tagged AS (
      SELECT user_id, d,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS rn
      FROM days),
    isl AS (
      SELECT user_id, d, d - CAST(rn AS INTEGER) AS island_key
      FROM tagged)
    SELECT user_id,
           MIN(d) AS streak_start, MAX(d) AS streak_end,
           CAST(COUNT(*) AS BIGINT) AS streak_days
    FROM isl GROUP BY user_id, island_key
    """)
def window_gaps_islands(spark, sf_dir):
    """Gaps-and-islands (the classic SQL archetype for consecutive-run
    detection — session streaks, uptime windows, inventory runs): each
    user's runs of CONSECUTIVE active days, found by the row_number
    difference trick (day − rn is constant within a run). One distinct
    + one window + one aggregate, all partitioned by user_id — a single
    key's work never leaves its partition, so the plan is one shuffle
    at any scale. Output: (user_id, streak_start, streak_end,
    streak_days)."""
    e = table(spark, sf_dir, "events")
    days = (e.select("user_id",
                     F.to_date(F.date_trunc("day", "ts")).alias("d"))
            .distinct())
    w = Window.partitionBy("user_id").orderBy("d")
    isl = (days.withColumn("rn", F.row_number().over(w))
           .withColumn("island_key", F.date_sub("d", F.col("rn"))))
    return (isl.groupBy("user_id", "island_key")
            .agg(F.min("d").alias("streak_start"),
                 F.max("d").alias("streak_end"),
                 F.count(F.lit(1)).alias("streak_days"))
            .drop("island_key"))
