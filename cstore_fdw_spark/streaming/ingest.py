"""Streaming ingestion into managed columnar tables.

The reference's only ingestion paths are batch COPY / INSERT-SELECT
(SURVEY §1.4); this extension continuously appends micro-batches into a
catalog table via ``foreachBatch`` → :meth:`CStoreCatalog.insert`. Each
micro-batch lands as new Parquet files (new 'stripes'), preserving the
reference's append-only stripe model; the checkpoint gives exactly-once
appends across restarts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from cstore_fdw_spark.catalog import CStoreCatalog


def stream_into_table(catalog: CStoreCatalog, table: str, stream: DataFrame,
                      checkpoint: str,
                      trigger_available_now: bool = False) -> StreamingQuery:
    """Continuously append a streaming DataFrame into a managed table.

    ``trigger_available_now=True`` drains the current source content and
    stops (used by tests and backfills); the default runs continuously.
    """
    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        catalog.insert(table, batch_df)

    writer = (stream.writeStream
              .foreachBatch(write_batch)
              .option("checkpointLocation", checkpoint))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
