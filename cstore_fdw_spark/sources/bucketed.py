"""Bucketed (hash-clustered) tables: shuffle-free co-located joins.

The reference stores each foreign table as one monolithic columnar file
and leaves join strategy entirely to PostgreSQL's executor, which always
(re)hashes both sides at query time (reference ``cstore_fdw.c`` delegates
all joins to the host executor). At 100 TB the dominant cost of a
fact-to-fact join is exactly that re-hash: two full shuffles of the big
tables on every query.

Spark's native bucketing is the engine answer: write each table
pre-hash-partitioned into N buckets on the join key (``bucketBy``) with
an in-bucket sort (``sortBy``). The bucket spec lives in the session
catalog, so at read time the scan's ``outputPartitioning`` already
satisfies the join's distribution requirement — Catalyst plans a
sort-merge join with NO ShuffleExchange on either side (and no per-bucket
sort either, when sortBy matches the join key). Writing is the same
one-time shuffle a single query would have paid; every subsequent join,
aggregate, or window on the bucket key rides it for free.

Guidance encoded here (and asserted by ``tests/test_bucketed.py``):

- both sides bucketed on the join key with the SAME bucket count →
  zero exchanges (a cheap per-partition sort remains under the SMJ:
  open-source Spark doesn't trust bucket sortBy metadata at read time,
  SPARK-19256 — the sortBy still buys file-local ordering, hence better
  column compression and page-level zone maps);
- one side bucketed → only the other side shuffles (into the bucketed
  side's distribution);
- ``groupBy(bucket_key)`` → partial + final aggregate with no exchange;
- bucket counts should be sized so one bucket of the biggest table fits
  an executor's task comfortably (at 100 TB: thousands of buckets; the
  bucket count, unlike shuffle partitions, is a durable layout choice).

This intentionally lives OUTSIDE the epoch/time-travel catalog: a bucket
spec is session-catalog metadata attached to a saved table, while the
CStore catalog manages raw epoch-stamped files. A bucketed table is the
long-lived, join-optimized projection of curated data — the reference's
"load once, query many" contract (``README.md`` usage flow), one level
further.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cstore_fdw_spark.catalog import CStoreError


def write_bucketed(df: DataFrame, name: str, key: str | list[str],
                   n_buckets: int, path: str | None = None,
                   sort: bool = True, overwrite: bool = False,
                   single_file_buckets: bool = True) -> None:
    """Save ``df`` as a bucketed parquet table in the session catalog.

    ``key`` is the clustering column (or columns); ``n_buckets`` the
    bucket count — a durable layout decision (see module docstring).
    ``path`` makes it an external table (data survives DROP TABLE).

    ``single_file_buckets`` pre-repartitions on the bucket key with the
    bucket count (the write-side hash is the same Murmur3-pmod Spark's
    bucketing uses, so each task holds exactly one bucket and writes
    exactly one file) — without it every write task emits a file per
    bucket it touches, and a T-task write creates up to T×N tiny files.
    Turn it off for very large appends where parallel writers per bucket
    matter more than file count.
    """
    keys = [key] if isinstance(key, str) else list(key)
    if n_buckets < 1:
        raise CStoreError(f"n_buckets must be >= 1, got {n_buckets}")
    missing = [k for k in keys if k not in df.columns]
    if missing:
        raise CStoreError(f"bucket key(s) {missing} not in {df.columns}")
    if single_file_buckets:
        df = df.repartition(n_buckets, *keys)
    w = (df.write.format("parquet")
         .mode("overwrite" if overwrite else "errorifexists")
         .bucketBy(n_buckets, *keys))
    if sort:
        w = w.sortBy(*keys)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(name)


def read_bucketed(spark: SparkSession, name: str) -> DataFrame:
    """Read a bucketed table back; the scan carries the bucket spec, so
    joins/aggregates on the bucket key need no exchange."""
    return spark.table(name)


def bucket_spec(spark: SparkSession, name: str) -> dict:
    """The table's bucket layout: {n_buckets, bucket_columns,
    sort_columns} (from DESCRIBE EXTENDED — session-catalog metadata)."""
    rows = {r.col_name: r.data_type
            for r in spark.sql(f"DESCRIBE TABLE EXTENDED {name}").collect()}
    if "Num Buckets" not in rows:
        raise CStoreError(f"table {name} is not bucketed")
    return {
        "n_buckets": int(rows["Num Buckets"]),
        "bucket_columns": rows.get("Bucket Columns", ""),
        "sort_columns": rows.get("Sort Columns", ""),
    }
