"""Streaming twin of the HDR quantile sketch: the sketch is a SUM of
per-bucket counters, so a complete-mode streaming aggregation maintains
the IDENTICAL histogram the batch query computes — mergeability across
micro-batches is the same property that merges it across partitions and
epochs (stats_hdr_quantile_sketch's scale contract, made live)."""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cstore_fdw_spark.operators.analytics import hdr_bucket_idx


def read_lineitem_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the lineitem parquet (micro-batch per
    file in tests; Kafka/files on a real deployment)."""
    # stream-rewrite-guard: exempt — READ-ONLY fixture parquet, not a
    # catalog table (no floor/identity to move, no derived state
    # maintained); catalog-table streams use the guarded readers. See
    # tests/test_streaming.py::test_every_readstream_guarded_or_exempt.
    return (spark.readStream.schema(
        spark.read.parquet(f"{sf_dir}/lineitem.parquet").schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "lineitem.parquet")
        .parquet(sf_dir))


def hdr_sketch_stream(lineitem: DataFrame) -> DataFrame:
    """Maintain the per-return-flag HDR histogram over the stream: one
    stateful aggregation whose state is the sketch itself — bounded by
    the bucket geometry (~64*128 counters per group), NOT by rows seen,
    which is what makes an unbounded stream affordable."""
    return (lineitem
            .select(F.col("l_returnflag").alias("g"), hdr_bucket_idx())
            .groupBy("g", "idx")
            .agg(F.count(F.lit(1)).alias("cnt")))


def run_sketch_available_now(spark: SparkSession, sf_dir: str,
                             query_name: str = "hdr_sketch") -> DataFrame:
    """Execute the streamed sketch with Trigger.AvailableNow into a
    memory sink; returns the final histogram as a batch DataFrame."""
    out = hdr_sketch_stream(read_lineitem_stream(spark, sf_dir))
    with tempfile.TemporaryDirectory() as ckpt:
        q = (out.writeStream.format("memory").queryName(query_name)
             .outputMode("complete")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
    return spark.table(query_name)
