"""Skew-mitigation helpers must be result-equivalent to their naive forms."""

from __future__ import annotations

from pyspark.sql import functions as F

from cstore_fdw_spark.functions import salted_count, salted_join_small


def _skewed(spark):
    # 90% of rows share one key — the classic hot-key shape
    return spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, "hot").otherwise(
            F.concat(F.lit("cold-"), (F.col("id") % 50).cast("string")))
        .alias("k"),
        F.col("id").alias("v"))


def test_salted_count_equivalence(spark):
    df = _skewed(spark)
    naive = {(r.k, r["count"]) for r in
             df.groupBy("k").agg(F.count(F.lit(1)).alias("count")).collect()}
    salted = {(r.k, r["count"]) for r in salted_count(df, ["k"]).collect()}
    assert naive == salted


def test_salted_join_equivalence(spark):
    big = _skewed(spark)
    small = spark.createDataFrame(
        [("hot", 1), ("cold-7", 2)], "k string, tag int")
    naive = {(r.k, r.v, r.tag) for r in big.join(small, "k").collect()}
    salted = {(r.k, r.v, r.tag)
              for r in salted_join_small(big, small, "k").collect()}
    assert naive == salted
    assert len(salted) > 0


def test_salted_count_spreads_partitions(spark):
    # the partial aggregate must produce multiple shards for the hot key
    df = _skewed(spark)
    partial = (df.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(16)))
        .groupBy("k", "__salt").count())
    hot_shards = partial.filter(F.col("k") == "hot").count()
    assert hot_shards > 1


def test_salted_sum_count_equivalence(spark):
    from cstore_fdw_spark.functions import salted_sum_count

    df = _skewed(spark)
    naive = {(r.k, r.n, r.total_value) for r in
             df.groupBy("k").agg(F.count(F.lit(1)).alias("n"),
                                 F.sum("v").alias("total_value")).collect()}
    salted = {(r.k, r.n, r.total_value)
              for r in salted_sum_count(df, ["k"], F.col("v")).collect()}
    assert naive == salted


def test_distributed_cumsum_equals_global_window(spark):
    """The two-pass distributed prefix sum must equal the naive
    unpartitioned-window cumsum exactly — including with duplicate
    order keys collapsed first (the contract callers rely on) — while
    never windowing the full dataset in one partition."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from cstore_fdw_spark.functions import distributed_cumsum

    df = (spark.range(0, 5_000)
          .select((F.col("id") * 37 % 1009).alias("k"),
                  (F.col("id") % 7).alias("a"),
                  (F.col("id") % 3).alias("b"))
          .groupBy("k").agg(F.sum("a").alias("a"), F.sum("b").alias("b")))
    got = {r.k: (r.a_cum, r.b_cum)
           for r in distributed_cumsum(df, "k", ["a", "b"],
                                       num_partitions=8).collect()}
    w = (Window.orderBy("k")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    want = {r.k: (r.a_cum, r.b_cum)
            for r in df.withColumn("a_cum", F.sum("a").over(w))
            .withColumn("b_cum", F.sum("b").over(w)).collect()}
    assert got == want
