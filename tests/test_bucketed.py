"""Bucketed-table co-located joins: the layout is only worth anything if
the EXECUTED PLAN proves the exchanges are gone, so every test here
asserts on plan structure, not just results.

Reference scope note: the reference delegates all join planning to the
host executor (every join re-hashes at query time); pre-bucketed layouts
are the engine's Spark-native extension for 100 TB fact-fact joins
(SCALE.md "Joins").
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cstore_fdw_spark.catalog import CStoreError
from cstore_fdw_spark.sources.bucketed import (bucket_spec, read_bucketed,
                                               write_bucketed)

N_BUCKETS = 4


@pytest.fixture(scope="module")
def bucketed_pair(spark, sf_dir):
    """orders and lineitem saved bucketed on the join key."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_extendedprice")
    write_bucketed(o, "cb_orders", "o_orderkey", N_BUCKETS, overwrite=True)
    write_bucketed(li.withColumnRenamed("l_orderkey", "o_orderkey"),
                   "cb_lineitem", "o_orderkey", N_BUCKETS, overwrite=True)
    yield "cb_orders", "cb_lineitem"
    spark.sql("DROP TABLE IF EXISTS cb_orders")
    spark.sql("DROP TABLE IF EXISTS cb_lineitem")


def _executed_plan(df) -> str:
    df.write.format("noop").mode("overwrite").save()  # finalize AQE
    return df._jdf.queryExecution().executedPlan().toString()


def _shuffle_count(plan: str) -> int:
    # count shuffle exchanges only; broadcast exchanges are a different
    # (and here irrelevant) mechanism
    return sum(line.count("Exchange hashpartitioning")
               + line.count("Exchange rangepartitioning")
               + line.count("Exchange RoundRobin")
               for line in plan.splitlines()
               if "ReusedExchange" not in line)


@pytest.fixture()
def no_broadcast(spark):
    """Force sort-merge joins so the exchange assertions are about the
    bucket layout, not about one side being broadcastable-small."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_bucketed_join_no_shuffle(spark, bucketed_pair,
                                           no_broadcast):
    bo, bl = bucketed_pair
    j = (read_bucketed(spark, bo).join(read_bucketed(spark, bl),
                                       "o_orderkey")
         .select("o_orderkey", "o_totalprice", "l_quantity"))
    plan = _executed_plan(j)
    assert _shuffle_count(plan) == 0, plan
    # and the co-located join is the sort-merge the layout was built for
    assert "SortMergeJoin" in plan, plan


def test_bucketed_join_sorts_within_partitions_only(spark, bucketed_pair,
                                                    no_broadcast):
    """The residual Sort nodes under the co-located SortMergeJoin are
    per-partition (`global=false`) — open-source Spark does not trust
    bucket sortBy metadata at read time (SPARK-19256 is unresolved), so
    a cheap in-partition sort remains, but there is still no exchange
    and no global sort."""
    bo, bl = bucketed_pair
    j = read_bucketed(spark, bo).join(read_bucketed(spark, bl),
                                      "o_orderkey")
    plan = _executed_plan(j)
    assert _shuffle_count(plan) == 0, plan
    for line in plan.splitlines():
        if "Sort [" in line and "SortMergeJoin" not in line:
            assert "false, 0" in line, line  # global=false: no range shuffle


def test_half_bucketed_join_shuffles_only_other_side(spark, bucketed_pair,
                                                     no_broadcast, sf_dir):
    bo, _ = bucketed_pair
    raw_li = (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
              .withColumnRenamed("l_orderkey", "o_orderkey")
              .select("o_orderkey", "l_quantity"))
    j = read_bucketed(spark, bo).join(raw_li, "o_orderkey")
    plan = _executed_plan(j)
    # exactly ONE shuffle: the raw side moves into the bucketed side's
    # distribution; the bucketed scan stays put
    assert _shuffle_count(plan) == 1, plan


def test_groupby_bucket_key_no_shuffle(spark, bucketed_pair):
    bo, _ = bucketed_pair
    agg = (read_bucketed(spark, bo).groupBy("o_orderkey")
           .agg(F.sum("o_totalprice").alias("t")))
    plan = _executed_plan(agg)
    assert _shuffle_count(plan) == 0, plan


def test_join_results_match_unbucketed(spark, bucketed_pair, sf_dir):
    bo, bl = bucketed_pair
    bucketed = (read_bucketed(spark, bo)
                .join(read_bucketed(spark, bl), "o_orderkey")
                .groupBy().agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum(F.col("l_quantity")).alias("q")).collect()[0])
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
          .withColumnRenamed("l_orderkey", "o_orderkey"))
    raw = (o.join(li, "o_orderkey").groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity")).alias("q")).collect()[0])
    assert bucketed.n == raw.n and bucketed.q == raw.q


def test_bucket_spec_metadata(spark, bucketed_pair):
    bo, _ = bucketed_pair
    spec = bucket_spec(spark, bo)
    assert spec["n_buckets"] == N_BUCKETS
    assert "o_orderkey" in spec["bucket_columns"]
    assert "o_orderkey" in spec["sort_columns"]


def test_bucketed_validation_errors(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    with pytest.raises(CStoreError, match="n_buckets"):
        write_bucketed(o, "cb_bad", "o_orderkey", 0)
    with pytest.raises(CStoreError, match="not in"):
        write_bucketed(o, "cb_bad", "nope", 4)
    # non-bucketed table has no spec
    o.limit(1).write.mode("overwrite").saveAsTable("cb_plain")
    try:
        with pytest.raises(CStoreError, match="not bucketed"):
            bucket_spec(spark, "cb_plain")
    finally:
        spark.sql("DROP TABLE IF EXISTS cb_plain")
