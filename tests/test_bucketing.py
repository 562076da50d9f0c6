"""Bucketed co-located joins — the shuffle-elimination lever for repeated
big-table joins at 100 TB (SURVEY 'Partitioning & shuffle': bucketing for
co-located joins). Both sides bucketed on the join key → SortMergeJoin
with NO Exchange on either side."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cstore_fdw_spark.plans import explain_str


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    (spark.read.parquet(f"{sf_dir}/orders.parquet")
     .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
     .mode("overwrite").saveAsTable("b_orders"))
    (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
     .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
     .mode("overwrite").saveAsTable("b_lineitem"))
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    ot, lt = bucketed_tables
    # disable auto-broadcast so the join would otherwise shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (spark.table(lt).join(spark.table(ot),
                                  F.col("l_orderkey") == F.col("o_orderkey"))
             .groupBy("o_orderpriority").count())
        plan = explain_str(j, "simple")
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        # no Exchange feeding the join: bucket layout satisfies the
        # distribution requirement on both sides
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_bucketed_join_matches_unbucketed(spark, sf_dir, bucketed_tables):
    ot, lt = bucketed_tables
    bucketed = {tuple(r) for r in
                (spark.table(lt).join(spark.table(ot),
                                      F.col("l_orderkey") == F.col("o_orderkey"))
                 .groupBy("o_orderpriority").count().collect())}
    plain_o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    plain_l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    plain = {tuple(r) for r in
             (plain_l.join(plain_o,
                           F.col("l_orderkey") == F.col("o_orderkey"))
              .groupBy("o_orderpriority").count().collect())}
    assert bucketed == plain
