#!/usr/bin/env python
"""Bring-your-cstore-tables demo: the reference's v1.7 binary format as
a first-class Spark source/sink AND a managed catalog format.

Flow, on a temp warehouse so it runs in seconds:
1. write a DataFrame straight to .cstore files (stripes, skip lists,
   exists bitmaps, pglz) with ``df.write.format("cstore")``;
2. read it back schema-on-read — exactly the reference's CREATE FOREIGN
   TABLE model — and watch pushed filters drive skip-list block
   skipping;
3. load the reference's own regression CSV corpus into a catalog table
   with ``storage_format='cstore'`` and run the reference's query.sql
   aggregations against it (epochs, time travel, and compact all work
   on the binary format);
4. convert the table to parquet and back with one
   ``alter_table_layout`` call each way.

Run: python examples/cstore_format_demo.py
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from cstore_fdw_spark import CStoreCatalog, get_spark  # noqa: E402
from cstore_fdw_spark.io import copy_from_csv  # noqa: E402
from cstore_fdw_spark.sources.cstore_datasource import (  # noqa: E402
    register_cstore)


def main() -> None:
    spark = get_spark(app_name="cstore-format-demo", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    register_cstore(spark)
    tmp = tempfile.mkdtemp(prefix="cstore_demo_")

    # 1. plain source/sink -------------------------------------------------
    df = spark.range(0, 20_000).select(
        F.col("id"), (F.col("id") % 97).alias("bucket"),
        F.concat(F.lit("name-"), F.col("id")).alias("name"))
    path = os.path.join(tmp, "plain")
    (df.write.format("cstore").option("block_row_count", "1000")
       .mode("overwrite").save(path))
    print("wrote", len([f for f in os.listdir(path)
                        if f.endswith(".cstore")]), ".cstore part files")

    # 2. schema-on-read + block skipping ----------------------------------
    ddl = "id BIGINT, bucket BIGINT, name STRING"
    back = spark.read.format("cstore").schema(ddl).load(path)
    hit = back.filter("id between 5000 and 5009").count()
    print("filtered read (skip-list pruned):", hit, "rows")

    # 3. the reference's own corpus, managed in its own format -------------
    cat = CStoreCatalog(spark, warehouse=os.path.join(tmp, "wh"))
    cat.create_table(
        "contestant",
        "handle STRING, birthdate DATE, rating INT, percentile DOUBLE, "
        "country STRING, achievements STRING",
        storage_format="cstore", compression="pglz")
    for part in ("1", "2"):
        copy_from_csv(cat, "contestant",
                      f"/root/reference/data/contestants.{part}.csv")
    t = cat.read("contestant")
    print("reference corpus rows:", t.count(),
          "| metadata-only row_count:", cat.row_count("contestant"))
    t.filter("rating > 2200").groupBy("country").agg(
        F.avg("rating").alias("avg_rating")).orderBy("country").show()

    # 4. convert formats in place ------------------------------------------
    cat.alter_table_layout("contestant", storage_format="parquet",
                           compression="zstd")
    print("as parquet:", cat.read("contestant").count(), "rows")
    cat.alter_table_layout("contestant", storage_format="cstore",
                           compression="pglz")
    print("back to cstore:", cat.read("contestant").count(), "rows")
    spark.stop()


if __name__ == "__main__":
    main()
