"""Join surface: inner/left/right/full/cross, equi & theta, semi/anti,
multi-way analytical joins, and an as-of join.

The reference delegates all joins to PostgreSQL's executor (its scan just
declares join-compatible columns, reference ``cstore_fdw.c:1860``); here
Catalyst picks broadcast-hash / sort-merge / shuffled-hash. Scale notes on
each query: small dimensions are explicitly ``broadcast()`` so the big
fact-table side never shuffles for the join; AQE handles skew.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cstore_fdw_spark.operators import register, table
from cstore_fdw_spark.operators.relational import D, _dbl, dec, dsum, to_dbl


@register(
    "join_inner_broadcast",
    category="join",
    bench=True,
    oracle=f"""
    SELECT c.c_mktsegment,
           COUNT(*) AS orders,
           {_dbl(f"SUM(CAST(o.o_totalprice AS {D}))")} AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment
    """)
def join_inner_broadcast(spark, sf_dir):
    """Inner equi-join fact→dimension. customer is ~1% of lineitem scale →
    broadcast: zero shuffle of the orders side, agg is partial+final."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return (o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("orders"),
                 to_dbl(dsum("o_totalprice")).alias("revenue"))
            .orderBy("c_mktsegment"))


@register(
    "join_left_outer",
    category="join",
    oracle="""
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
    """)
def join_left_outer(spark, sf_dir):
    """LEFT OUTER join — customers with zero orders kept (count = 0)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (c.join(o, c.c_custkey == o.o_custkey, "left")
            .groupBy("c_custkey")
            .agg(F.count("o_orderkey").alias("n_orders")))


@register(
    "join_right_outer",
    category="join",
    oracle="""
    SELECT n.n_name, COUNT(s.s_suppkey) AS suppliers
    FROM supplier s RIGHT JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """)
def join_right_outer(spark, sf_dir):
    """RIGHT OUTER join — nations with no suppliers kept."""
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    return (s.join(n, s.s_nationkey == n.n_nationkey, "right")
            .groupBy("n_name")
            .agg(F.count("s_suppkey").alias("suppliers")))


@register(
    "join_full_outer",
    category="join",
    oracle="""
    WITH cs AS (SELECT c_nationkey AS nk, COUNT(*) AS customers
                FROM customer GROUP BY c_nationkey),
         su AS (SELECT s_nationkey AS nk, COUNT(*) AS suppliers
                FROM supplier GROUP BY s_nationkey)
    SELECT COALESCE(cs.nk, su.nk) AS nationkey,
           COALESCE(cs.customers, 0) AS customers,
           COALESCE(su.suppliers, 0) AS suppliers
    FROM cs FULL JOIN su ON cs.nk = su.nk
    """)
def join_full_outer(spark, sf_dir):
    """FULL OUTER join of two pre-aggregated sides (aggregate-then-join:
    the scale-correct order — join inputs are tiny after the agg)."""
    cs = (table(spark, sf_dir, "customer").groupBy(F.col("c_nationkey").alias("nk"))
          .agg(F.count(F.lit(1)).alias("customers")))
    su = (table(spark, sf_dir, "supplier").groupBy(F.col("s_nationkey").alias("nk"))
          .agg(F.count(F.lit(1)).alias("suppliers")))
    return (cs.join(su, cs.nk == su.nk, "full")
            .select(F.coalesce(cs.nk, su.nk).alias("nationkey"),
                    F.coalesce("customers", F.lit(0)).alias("customers"),
                    F.coalesce("suppliers", F.lit(0)).alias("suppliers")))


@register(
    "join_semi_exists",
    category="join",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 300000)
    """)
def join_semi_exists(spark, sf_dir):
    """Semi join (EXISTS): customers having a large order. Spark left_semi
    never materializes the probe side's payload."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return (c.join(o, c.c_custkey == o.o_custkey, "left_semi")
            .select("c_custkey", "c_name"))


@register(
    "join_anti_not_exists",
    category="join",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    """)
def join_anti_not_exists(spark, sf_dir):
    """Anti join (NOT EXISTS): customers with no urgent orders. (Every
    customer in the synthetic data has ≥1 order, so the subquery filters
    to urgent ones to keep the anti join non-vacuous.)"""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT")
    return (c.join(o, c.c_custkey == o.o_custkey, "left_anti")
            .select("c_custkey", "c_name"))


@register(
    "join_cross",
    category="join",
    allow_bnlj=True,  # the cross-join operator itself (5 × distinct statuses)
    oracle="""
    SELECT r.r_name, s.o_orderstatus
    FROM region r CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
    """)
def join_cross(spark, sf_dir):
    """CROSS join of two tiny inputs (5 regions × order statuses)."""
    r = table(spark, sf_dir, "region").select("r_name")
    s = table(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return r.crossJoin(s)


@register(
    "join_theta_pairs",
    category="join",
    oracle="""
    SELECT n1.n_name AS nation_a, n2.n_name AS nation_b, n1.n_regionkey AS rk
    FROM nation n1 JOIN nation n2
      ON n1.n_regionkey = n2.n_regionkey
     AND n1.n_nationkey < n2.n_nationkey
    """)
def join_theta_pairs(spark, sf_dir):
    """Theta join: equi key + inequality residual (unordered pairs within a
    region). The classic 'pairs without self-pairs' shape used by the dedup
    operators at scale."""
    n1 = table(spark, sf_dir, "nation").alias("n1")
    n2 = table(spark, sf_dir, "nation").alias("n2")
    return (n1.join(n2, (F.col("n1.n_regionkey") == F.col("n2.n_regionkey"))
                    & (F.col("n1.n_nationkey") < F.col("n2.n_nationkey")))
            .select(F.col("n1.n_name").alias("nation_a"),
                    F.col("n2.n_name").alias("nation_b"),
                    F.col("n1.n_regionkey").alias("rk")))


@register(
    "q3_shipping_priority",
    category="join",
    bench=True,
    oracle=f"""
    SELECT l.l_orderkey,
           {_dbl(f"SUM(CAST(l.l_extendedprice AS {D}) * (1 - CAST(l.l_discount AS DECIMAL(8,4))))")} AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: 3-way join, grouped revenue, top-10. customer is
    broadcast; orders⋈lineitem is the only shuffle pair; top-k via
    TakeOrderedAndProject (no global sort)."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp"))
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp"))
    rev = dec("l_extendedprice") * (F.lit(1) - dec("l_discount", "decimal(8,4)"))
    # no explicit broadcast: orders/customer are fact-scale at 100 TB;
    # AQE's stats-based planning auto-broadcasts them at small SF
    return (li.join(o.join(c, o.o_custkey == c.c_custkey)
                    .select("o_orderkey", "o_orderdate", "o_orderpriority"),
                    F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
            .agg(to_dbl(F.sum(rev)).alias("revenue"))
            .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
            .orderBy(F.col("revenue").desc(), "l_orderkey")
            .limit(10))


@register(
    "q5_local_supplier_volume",
    category="join",
    bench=True,
    oracle=f"""
    SELECT n.n_name,
           {_dbl(f"SUM(CAST(l.l_extendedprice AS {D}) * (1 - CAST(l.l_discount AS DECIMAL(8,4))))")} AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n.n_name
    """)
def q5_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 shape: 6-way join with the customer-nation == supplier-nation
    correlation. All dimensions broadcast; lineitem (the 100 TB table)
    streams through a single pipeline of broadcast hash joins — no
    fact-table shuffle until the final 25-group aggregate."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = dec("l_extendedprice") * (F.lit(1) - dec("l_discount", "decimal(8,4)"))
    # broadcast only the bounded dims (supplier/nation/region); orders and
    # customer are fact-scale at 100 TB — shuffle joins + AQE handle them
    return (li
            .join(o, li.l_orderkey == o.o_orderkey)
            .join(c, o.o_custkey == c.c_custkey)
            .join(F.broadcast(s), (li.l_suppkey == s.s_suppkey)
                  & (c.c_nationkey == s.s_nationkey))
            .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .groupBy("n_name")
            .agg(to_dbl(F.sum(rev)).alias("revenue"))
            .orderBy(F.col("revenue").desc(), "n_name"))


@register(
    "q10_returned_items",
    category="join",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           {_dbl(f"SUM(CAST(l.l_extendedprice AS {D}) * (1 - CAST(l.l_discount AS DECIMAL(8,4))))")} AS revenue,
           n.n_name
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """)
def q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: revenue lost to returns, top-20 customers."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = table(spark, sf_dir, "nation")
    rev = dec("l_extendedprice") * (F.lit(1) - dec("l_discount", "decimal(8,4)"))
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .join(c, o.o_custkey == c.c_custkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .groupBy("c_custkey", "c_name", "n_name")
            .agg(to_dbl(F.sum(rev)).alias("revenue"))
            .select("c_custkey", "c_name", "revenue", "n_name")
            .orderBy(F.col("revenue").desc(), "c_custkey")
            .limit(20))


@register(
    "asof_join_last_click", bench=True,
    category="join",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts,
           (SELECT MAX(c.ts) FROM events c
            WHERE c.user_id = p.user_id AND c.event_type = 'click'
              AND c.ts <= p.ts) AS last_click_ts
    FROM events p WHERE p.event_type = 'purchase'
    """)
def asof_join_last_click(spark, sf_dir):
    """As-of join (no dedicated operator in the reference either — its users
    write the correlated-subquery form, which is the oracle here). Spark
    plan: union the two event streams tagged, one window pass per user
    ordered by time carrying the last click timestamp forward — a single
    shuffle on user_id, no nested-loop. This is the scale path: O(n log n)
    per user partition instead of O(purchases × clicks)."""
    ev = table(spark, sf_dir, "events")
    # ONE scan with an isin filter, not a union of two filtered scans:
    # the union form read the events parquet twice (verified in the
    # r17 before-plan: two FileScan nodes) to derive what one pass can
    # tag — at 100 TB that is the whole input read twice for nothing
    is_p = (F.col("event_type") == "purchase")
    tagged = (ev.filter(F.col("event_type").isin("click", "purchase"))
              .select("user_id", "ts",
                      F.when(is_p, F.col("event_id")).alias("event_id"),
                      is_p.cast("int").alias("is_purchase")))
    # order clicks before purchases at identical ts (<= semantics)
    w = (Window.partitionBy("user_id")
         .orderBy("ts", "is_purchase")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    click_ts = F.when(F.col("is_purchase") == 0, F.col("ts"))
    out = (tagged
           .withColumn("last_click_ts", F.last(click_ts, ignorenulls=True).over(w))
           .filter(F.col("is_purchase") == 1)
           .select("event_id", "user_id", "ts", "last_click_ts"))
    return out


@register(
    "join_range_bucketed",
    category="join",
    oracle="""
    SELECT a.event_id AS anchor_id, b.event_id AS follow_id,
           date_diff('second', a.ts, b.ts) AS secs_after
    FROM events a JOIN events b
      ON a.event_type = 'signup' AND b.event_type = 'purchase'
     AND b.ts >= a.ts AND b.ts < a.ts + INTERVAL 1 HOUR
    """)
def join_range_bucketed(spark, sf_dir):
    """Range (band) join with NO equi-key: every purchase within 1 hour
    after any signup. A naive theta join is a broadcast-nested-loop —
    O(|A|·|B|) compares at 100 TB. The scale path implemented here is the
    canonical bucketized band join: quantize time into band-width (1h)
    buckets, each anchor emits its bucket h and h+1 (a [ts, ts+1h) window
    spans at most two), probes emit their single bucket, and the join
    becomes an EQUI-join on the bucket key (shuffle-hash/sort-merge,
    linear + per-bucket work) with the exact band predicate as a residual
    filter. Each pair meets in exactly one bucket, so no dedup is needed.

    secs_after is computed as the difference of epoch-second floors —
    DuckDB date_diff('second') counts second-boundary crossings, not
    elapsed microseconds."""
    e = table(spark, sf_dir, "events")
    us = 3_600_000_000  # 1h of microseconds: the band width = bucket width
    a = (e.filter(F.col("event_type") == "signup")
         .select(F.col("event_id").alias("anchor_id"),
                 F.col("ts").alias("a_ts"),
                 F.expr(f"unix_micros(ts) div {us}").alias("h"))
         .select("anchor_id", "a_ts",
                 F.explode(F.array(F.col("h"), F.col("h") + 1))
                 .alias("bucket")))
    b = (e.filter(F.col("event_type") == "purchase")
         .select(F.col("event_id").alias("follow_id"),
                 F.col("ts").alias("b_ts"),
                 F.expr(f"unix_micros(ts) div {us}").alias("bucket")))
    return (a.join(b, "bucket")
            .filter((F.col("b_ts") >= F.col("a_ts"))
                    & (F.col("b_ts") < F.col("a_ts")
                       + F.expr("INTERVAL 1 HOUR")))
            .select("anchor_id", "follow_id",
                    (F.expr("unix_micros(b_ts) div 1000000")
                     - F.expr("unix_micros(a_ts) div 1000000"))
                    .alias("secs_after")))


@register(
    "join_asof_tolerance",
    category="join",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts,
           (SELECT MAX(c.ts) FROM events c
            WHERE c.user_id = p.user_id AND c.event_type = 'click'
              AND c.ts <= p.ts
              AND c.ts >= p.ts - INTERVAL 30 MINUTE) AS last_click_ts
    FROM events p WHERE p.event_type = 'purchase'
    """)
def join_asof_tolerance(spark, sf_dir):
    """As-of join WITH TOLERANCE (the pandas ``merge_asof(tolerance=...)``
    / Polars ``join_asof(tolerance=...)`` shape): each purchase picks up
    the last click at most 30 minutes before it, NULL when the nearest
    click is staler. Same single window pass per user as the plain as-of
    join — the tolerance is a post-carry filter on the carried
    timestamp, so the plan stays one shuffle on user_id with no
    nested-loop; at 100 TB this is O(n log n) per user partition
    exactly like the untolerated form."""
    ev = table(spark, sf_dir, "events")
    clicks = (ev.filter(F.col("event_type") == "click")
              .select("user_id", "ts",
                      F.lit(None).cast("long").alias("event_id"),
                      F.lit(0).alias("is_purchase")))
    purchases = (ev.filter(F.col("event_type") == "purchase")
                 .select("user_id", "ts", "event_id",
                         F.lit(1).alias("is_purchase")))
    tagged = clicks.unionByName(purchases)
    w = (Window.partitionBy("user_id")
         .orderBy("ts", "is_purchase")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    click_ts = F.when(F.col("is_purchase") == 0, F.col("ts"))
    carried = F.last(click_ts, ignorenulls=True).over(w)
    within = (F.col("carried") >=
              F.col("ts") - F.expr("INTERVAL 30 MINUTE"))
    return (tagged
            .withColumn("carried", carried)
            .filter(F.col("is_purchase") == 1)
            .select("event_id", "user_id", "ts",
                    F.when(within, F.col("carried"))
                    .alias("last_click_ts")))


@register(
    "join_skew_salted_enrich",
    category="join",
    oracle="""
    SELECT e.event_id, e.user_id, c.c_mktsegment AS segment
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    """)
def join_skew_salted_enrich(spark, sf_dir):
    """Salted replicated join (the manual skew lever next to the salted
    aggregation already registered): the dimension is replicated once
    per salt and the fact's key is salted, so a key holding 30% of the
    fact spreads across n_salts reducers instead of melting one. Row
    set PROVABLY identical to the plain join (that is the oracle). When
    the dim fits in memory a broadcast is strictly better (see
    events_enrich_segment — no shuffle at all); salting is for the case
    where the join MUST shuffle (dim too large to broadcast) and the
    fact key is skewed beyond what AQE's skew-join splitting handles.
    Output: (event_id, user_id, segment)."""
    from cstore_fdw_spark.functions import salted_join_small

    e = (table(spark, sf_dir, "events")
         .select("event_id", "user_id"))
    c = (table(spark, sf_dir, "customer")
         .select(F.col("c_custkey").alias("user_id"),
                 F.col("c_mktsegment").alias("segment")))
    return (salted_join_small(e, c, "user_id")
            .select("event_id", "user_id", "segment"))
