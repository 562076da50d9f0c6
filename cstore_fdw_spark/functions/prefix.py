"""Distributed prefix sums — running totals without the
single-partition trap.

A cumulative sum expressed as ``sum().over(Window.orderBy(col))`` with
no partitioning is executed by Spark as a GLOBAL sort into ONE
partition — the whole dataset funnels through a single task, which is
exactly the shape that dies at 100 TB. This module implements the
textbook two-pass scan instead:

1. range-repartition on the order column and compute partition-LOCAL
   running sums in parallel (each task windows only its own slice);
2. aggregate one total per partition (a #partitions-sized table),
   prefix-sum THAT tiny table, and broadcast the resulting offsets back
   so every row adds the total of all partitions before it.

The driver never touches data; the only global object is the
#partitions-row offset table. Used by ``stats_ks_two_sample`` (exact
KS CDFs) and available to any pipeline needing running totals at
scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def distributed_cumsum(df: DataFrame, order_col: str,
                       value_cols: Sequence[str],
                       num_partitions: int = 16) -> DataFrame:
    """Append ``{c}_cum`` (running total of ``c`` in ``order_col``
    order, current row inclusive) for each value column — equal to the
    unpartitioned-window cumsum, computed with per-partition
    parallelism. Row order in the result is not defined (as with any
    shuffle); the cum columns carry the ordering information."""
    parts = (df.repartitionByRange(num_partitions, order_col)
             .sortWithinPartitions(order_col)
             .withColumn("__pid", F.spark_partition_id()))
    wloc = (Window.partitionBy("__pid").orderBy(order_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    out = parts
    for c in value_cols:
        out = out.withColumn(f"__l_{c}", F.sum(c).over(wloc))
    ptot = parts.groupBy("__pid").agg(
        *[F.sum(c).alias(f"__t_{c}") for c in value_cols])
    # the offset table is #partitions rows — this tiny unpartitioned
    # window is bounded by construction, never by data volume
    woff = (Window.orderBy("__pid")
            .rowsBetween(Window.unboundedPreceding, -1))
    offs = ptot.select(
        "__pid",
        *[F.coalesce(F.sum(f"__t_{c}").over(woff), F.lit(0))
          .alias(f"__o_{c}") for c in value_cols])
    out = out.join(F.broadcast(offs), "__pid")
    for c in value_cols:
        out = out.withColumn(f"{c}_cum",
                             F.col(f"__l_{c}") + F.col(f"__o_{c}"))
    drop = (["__pid"] + [f"__l_{c}" for c in value_cols]
            + [f"__o_{c}" for c in value_cols])
    return out.drop(*drop)
