#!/usr/bin/env python
"""Materialized-view maintenance demo: the round-8 aggview family over
epoch-committed managed tables.

Flow, on a temp warehouse so it runs in seconds:
1. load ``orders`` as the fact and a nation-derived dim into managed
   tables (epoch commits);
2. single-table aggregate view over orders, refreshed incrementally as
   batches land (only the new epochs are scanned — watch the reported
   ``mode``);
3. star-schema JOIN view (orders ⋈ customer-region dim) maintained by
   the delta-join algebra — a dim append retroactively joins OLD fact
   rows, exactly once;
4. the Structured Streaming twin maintains a third view from the fact
   table's file stream and lands bit-identical state;
5. a rewrite (DELETE) collapses history: the next refresh reports an
   honest ``full`` recompute.

Run: python examples/materialized_views_demo.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cstore_fdw_spark import CStoreCatalog, get_spark  # noqa: E402
from cstore_fdw_spark.aggview import (  # noqa: E402
    create_agg_view, create_join_agg_view, refresh_agg_view,
    refresh_join_agg_view)
from cstore_fdw_spark.streaming.aggview import (  # noqa: E402
    maintain_agg_view_stream)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark(app_name="materialized-views-demo",
                      master="local[4]")
    wh = tempfile.mkdtemp(prefix="mv_demo_")
    cat = CStoreCatalog(spark, warehouse=wh)
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")

    # 1. fact + dim tables; fact loads in two epoch batches
    cat.create_table("orders_t", orders.schema)
    cat.create_table("cust_dim", "o_custkey long, segment string")
    half = orders.filter(F.col("o_orderkey") % 2 == 0)
    rest = orders.filter(F.col("o_orderkey") % 2 == 1)
    cat.insert("orders_t", half)
    cat.insert("cust_dim", cust.select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_mktsegment").alias("segment")))

    # 2. single-table view: per-status order stats
    create_agg_view(cat, "v_status", "orders_t",
                    keys=["o_orderstatus"], measures=["o_totalprice"])
    print("refresh #1:", refresh_agg_view(cat, "v_status"))
    cat.insert("orders_t", rest)  # second batch lands
    print("refresh #2 (scans ONLY epoch 2):",
          refresh_agg_view(cat, "v_status"))
    cat.read("v_status").orderBy("o_orderstatus").show(5)

    # 3. join view: per-segment revenue, delta-join maintained
    create_join_agg_view(cat, "v_seg", "orders_t", "cust_dim",
                         on=["o_custkey"], keys=["segment"],
                         measures=["o_totalprice"])
    print("join refresh:", refresh_join_agg_view(cat, "v_seg"))
    cat.read("v_seg").orderBy("segment").show()

    # 4. streaming twin: identical state from the file stream
    create_agg_view(cat, "v_stream", "orders_t",
                    keys=["o_orderstatus"], measures=["o_totalprice"])
    q = maintain_agg_view_stream(cat, "v_stream",
                                 tempfile.mkdtemp(prefix="mv_ck_"))
    q.awaitTermination(120)
    batch_state = sorted(map(tuple, cat.read("v_status").collect()))
    stream_state = sorted(map(tuple, cat.read("v_stream").collect()))
    print("stream twin equals batch refresh:",
          batch_state == stream_state)

    # 5. a rewrite collapses history -> honest full recompute
    cat.delete_where("orders_t", "o_orderstatus = 'P'")
    print("after DELETE:", refresh_agg_view(cat, "v_status"))
    spark.stop()


if __name__ == "__main__":
    main()
