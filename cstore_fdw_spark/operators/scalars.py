"""Scalar-function surface: string, math, date/time, conditional, series.

These are the PG scalar-function families the reference's test corpus and
README exercise over cstore tables (SURVEY §2.B: length/md5/string_agg/
regexp_replace, round/width_bucket, date arithmetic, generate_series).

Determinism: transcendental functions (ln/exp/pow) are libm-dependent and
can differ across engines by 1 ulp, so outputs stick to IEEE-exact ops
(+,-,*,/,sqrt), exact decimal rounding, and integer math.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cstore_fdw_spark.operators import register, table
from cstore_fdw_spark.operators.relational import dec


@register(
    "string_functions",
    category="scalar",
    oracle="""
    SELECT p_partkey,
           LENGTH(p_name) AS name_len,
           UPPER(p_brand) AS brand_upper,
           LOWER(p_type) AS type_lower,
           SUBSTRING(p_name, 1, 8) AS name_prefix,
           CONCAT(p_brand, ':', p_type) AS brand_type,
           MD5(p_name) AS name_md5,
           REGEXP_REPLACE(p_name, '[aeiou]', '_', 'g') AS devoweled,
           REVERSE(p_brand) AS brand_rev,
           TRIM('  x  ') AS trimmed
    FROM part WHERE p_partkey < 500
    """)
def string_functions(spark, sf_dir):
    """String family: length/upper/lower/substr/concat/md5/regexp_replace
    (reference README.md:251, sql/insert.sql:30-37 exercise these)."""
    p = table(spark, sf_dir, "part").filter(F.col("p_partkey") < 500)
    return p.select(
        "p_partkey",
        F.length("p_name").cast("long").alias("name_len"),
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.md5(F.col("p_name").cast("binary")).alias("name_md5"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.reverse(F.col("p_brand")).alias("brand_rev"),
        F.trim(F.lit("  x  ")).alias("trimmed"))


@register(
    "string_agg_sorted",
    category="scalar",
    oracle="""
    SELECT r.r_name, STRING_AGG(n.n_name, ',' ORDER BY n.n_name) AS nations
    FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name ORDER BY r.r_name
    """)
def string_agg_sorted(spark, sf_dir):
    """string_agg with deterministic ordering — Spark expresses it as
    array_join(array_sort(collect_list(...)))."""
    r = table(spark, sf_dir, "region")
    n = table(spark, sf_dir, "nation")
    return (n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .groupBy("r_name")
            .agg(F.array_join(F.array_sort(F.collect_list("n_name")), ",")
                 .alias("nations"))
            .orderBy("r_name"))


@register(
    "math_functions",
    category="scalar",
    oracle="""
    SELECT p_partkey,
           CAST(ROUND(CAST(p_retailprice AS DECIMAL(12,2)), 1) AS DOUBLE) AS price_rounded,
           ABS(p_size - 25) AS size_dist,
           CAST(CEIL(p_retailprice) AS BIGINT) AS price_ceil,
           CAST(FLOOR(p_retailprice) AS BIGINT) AS price_floor,
           SQRT(CAST(p_size AS DOUBLE)) AS size_sqrt,
           p_size % 7 AS size_mod,
           CAST(SIGN(p_size - 25) AS BIGINT) AS size_sign,
           CAST(p_retailprice * p_size AS DOUBLE) AS extended
    FROM part WHERE p_partkey < 500
    """)
def math_functions(spark, sf_dir):
    """Math family: round (exact decimal), abs, ceil/floor, sqrt (IEEE-exact),
    modulo, sign, arithmetic (reference README.md:250-252)."""
    p = table(spark, sf_dir, "part").filter(F.col("p_partkey") < 500)
    return p.select(
        "p_partkey",
        F.round(dec("p_retailprice"), 1).cast("double").alias("price_rounded"),
        F.abs(F.col("p_size") - 25).alias("size_dist"),
        F.ceil("p_retailprice").alias("price_ceil"),
        F.floor("p_retailprice").alias("price_floor"),
        F.sqrt(F.col("p_size").cast("double")).alias("size_sqrt"),
        (F.col("p_size") % 7).alias("size_mod"),
        F.signum(F.col("p_size") - 25).cast("long").alias("size_sign"),
        (F.col("p_retailprice") * F.col("p_size")).cast("double")
        .alias("extended"))


@register(
    "width_bucket_histogram",
    category="scalar",
    oracle="""
    SELECT bucket, COUNT(*) AS n FROM (
      SELECT CAST(LEAST(GREATEST(FLOOR((c_acctbal - 0.0) * 10 / 10000.0) + 1,
                                 0), 11) AS BIGINT) AS bucket
      FROM customer) t
    GROUP BY bucket ORDER BY bucket
    """)
def width_bucket_histogram(spark, sf_dir):
    """width_bucket(c_acctbal, 0, 10000, 10) histogram — the reference
    README's grouped-agg demo (README.md:249-261). PG width_bucket semantics
    replicated with IEEE-exact floor arithmetic (identical expression on
    both engines; Spark 4 also has F.width_bucket, used implicitly via the
    same formula to stay engine-portable)."""
    c = table(spark, sf_dir, "customer")
    bucket = F.least(
        F.greatest(F.floor((F.col("c_acctbal") - 0.0) * 10 / 10000.0) + 1,
                   F.lit(0)),
        F.lit(11)).cast("long").alias("bucket")
    return (c.select(bucket).groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n")).orderBy("bucket"))


@register(
    "date_functions",
    category="scalar",
    oracle="""
    SELECT o_orderkey,
           CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS order_year,
           CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS order_month,
           CAST(EXTRACT(DAY FROM o_orderdate) AS BIGINT) AS order_day,
           CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS order_month_start,
           o_orderdate + INTERVAL 30 DAY AS due_date,
           CAST(o_orderdate AS DATE) AS order_date,
           CAST(EPOCH(o_orderdate) AS BIGINT) AS order_epoch
    FROM orders WHERE o_orderkey < 1000
    """)
def date_functions(spark, sf_dir):
    """Date/time family: extract, date_trunc, interval arithmetic, casts,
    epoch (reference README.md:244-246 date filters)."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("long").alias("order_day"),
        F.date_trunc("month", "o_orderdate").alias("order_month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        F.to_date("o_orderdate").alias("order_date"),
        F.unix_timestamp("o_orderdate").alias("order_epoch"))


@register(
    "generate_series_months",
    category="scalar",
    oracle="""
    WITH months AS (SELECT UNNEST(GENERATE_SERIES(1, 12)) AS m),
         cnt AS (SELECT CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS m,
                        COUNT(*) AS orders
                 FROM orders
                 WHERE EXTRACT(YEAR FROM o_orderdate) = 1995
                 GROUP BY 1)
    SELECT months.m, COALESCE(cnt.orders, 0) AS orders
    FROM months LEFT JOIN cnt ON months.m = cnt.m
    ORDER BY months.m
    """)
def generate_series_months(spark, sf_dir):
    """generate_series parity (reference sql/truncate.sql:21 uses it):
    Spark expresses the series as explode(sequence(..)) — month skeleton
    left-joined to 1995 order counts so empty months appear as 0."""
    months = spark.range(1, 13).select(F.col("id").alias("m"))
    o = table(spark, sf_dir, "orders")
    cnt = (o.filter(F.year("o_orderdate") == 1995)
           .groupBy(F.month("o_orderdate").cast("long").alias("m"))
           .agg(F.count(F.lit(1)).alias("orders")))
    return (months.join(cnt, "m", "left")
            .select("m", F.coalesce("orders", F.lit(0)).alias("orders"))
            .orderBy("m"))


@register(
    "case_coalesce_nullif",
    category="scalar",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal > 5000 THEN 'high'
                WHEN c_acctbal > 0 THEN 'mid'
                ELSE 'low' END AS tier,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg,
           IFNULL(NULLIF(c_nationkey, 0), -1) AS nk_or_neg
    FROM customer
    """)
def case_coalesce_nullif(spark, sf_dir):
    """Conditional expressions: CASE / COALESCE / NULLIF / IFNULL."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") > 5000, "high")
         .when(F.col("c_acctbal") > 0, "mid")
         .otherwise("low").alias("tier"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")),
                   F.lit("OTHER")).alias("seg"),
        F.ifnull(F.nullif(F.col("c_nationkey"), F.lit(0)),
                 F.lit(-1)).alias("nk_or_neg"))


#: Danish-alphabet sample appended to the nation names: Å/Æ/Ø sort after
#: Z, and 'Aa' is the traditional digraph spelling of Å (ICU da places it
#: at the end too) — the cases the reference's da_DK collation test
#: exercises (input/block_filtering.source:62-71).
_DANISH_NAMES = ["Århus", "Ærø", "Ødis", "Aalborg", "Aarhus", "ALGERIA"]


@register(
    "collation_danish_order",
    category="scalar",
    oracle=f"""
    WITH names(name) AS (
      SELECT n_name FROM nation
      UNION ALL
      SELECT * FROM (VALUES {", ".join(f"('{n}')" for n in _DANISH_NAMES)})),
    ranked AS (
      SELECT name,
             ROW_NUMBER() OVER (ORDER BY name COLLATE da, name) AS da_rank
      FROM names)
    SELECT name, da_rank, (name COLLATE da > 'VIETNAM') AS after_vietnam
    FROM ranked
    """)
def collation_danish_order(spark, sf_dir):
    """Locale-aware text ordering via ICU collation (Spark 4 ``COLLATE
    da`` ≡ PostgreSQL ``collate "da_DK"``): ranks nation names plus a
    Danish-letter sample under the Danish alphabet, where Æ/Ø/Å (and the
    digraph 'Aa') sort AFTER Z — the reference's collation test shape
    (input/block_filtering.source:62-71). The DuckDB oracle runs the
    identical ICU collation, so the full collated order is value-checked,
    not just a behavioral smoke test. ``after_vietnam`` mirrors the
    reference's collated range predicate (A > 'B'); collated predicates
    are deliberately NOT pushed to parquet zone maps, whose min/max are
    binary order (the reference stores collated stripe min/max instead —
    cstore_writer.c comparisons run through the column's collation)."""
    n = table(spark, sf_dir, "nation").select(F.col("n_name").alias("name"))
    extra = spark.createDataFrame([(x,) for x in _DANISH_NAMES],
                                  "name string")
    names = n.unionByName(extra)
    ranked = names.select(
        "name",
        F.row_number().over(
            Window.orderBy(F.expr("name COLLATE da"), "name")
        ).cast("long").alias("da_rank"))
    return ranked.select(
        "name", "da_rank",
        F.expr("name COLLATE da > 'VIETNAM'").alias("after_vietnam"))
