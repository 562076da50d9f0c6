"""Format-pluggable sources/sinks.

The reference's IO surface is COPY FROM/TO with PostgreSQL's CSV dialect
plus its own columnar format (SURVEY §2.A A5/A6). The Spark engine
generalizes this: any supported format reads into a DataFrame and writes
from one, with the engine's Parquet layout as the native storage
(``cstore_fdw_spark.catalog``).

Formats: parquet (native), csv (PG COPY dialect defaults), json (lines),
orc. All reads are distributed scans; all writes go through Spark's
committer (atomic, like the reference's footer temp+rename).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from cstore_fdw_spark.io import _PG_CSV_OPTS

SUPPORTED_FORMATS = ("parquet", "csv", "json", "orc")

#: sentinel used to keep PostgreSQL COPY's distinction between unquoted
#: empty (NULL) and quoted "" (empty string) through Spark's CSV parser,
#: which would otherwise fold both into nullValue.
_EMPTY_SENTINEL = "__CSTORE_EMPTY__"


def _check_format(fmt: str) -> str:
    fmt = fmt.lower()
    if fmt not in SUPPORTED_FORMATS:
        raise ValueError(
            f"unsupported format '{fmt}'; supported: {SUPPORTED_FORMATS}")
    return fmt


def read_source(spark: SparkSession, path: str, fmt: str = "parquet",
                schema: T.StructType | str | None = None,
                **options: Any) -> DataFrame:
    """Read ``path`` in the given format. CSV defaults to the PostgreSQL
    COPY dialect (empty-unquoted NULLs, double-quote escapes) so reference
    data files load verbatim; JSON is newline-delimited."""
    fmt = _check_format(fmt)
    reader = spark.read
    if fmt == "csv":
        opts = dict(_PG_CSV_OPTS)
        # quoted "" parses to the sentinel (emptyValue), unquoted empty to
        # NULL (nullValue) — restored to ''/'NULL' below, PG COPY parity
        opts["emptyValue"] = _EMPTY_SENTINEL
        opts.update({k: str(v) for k, v in options.items()})
        reader = reader.options(**opts)
    else:
        reader = reader.options(**{k: str(v) for k, v in options.items()})
    if schema is not None:
        if isinstance(schema, str):
            schema = T.StructType.fromDDL(schema)
        reader = reader.schema(schema)
    elif fmt == "csv":
        reader = reader.option("inferSchema", "true")
    df = getattr(reader, fmt)(path)
    if fmt == "csv":
        from pyspark.sql import functions as F
        for f_ in df.schema.fields:
            if isinstance(f_.dataType, T.StringType):
                df = df.withColumn(
                    f_.name,
                    F.when(F.col(f_.name) == _EMPTY_SENTINEL, F.lit(""))
                    .otherwise(F.col(f_.name)))
    return df


def write_sink(df: DataFrame, path: str, fmt: str = "parquet",
               mode: str = "overwrite", partition_by: list[str] | None = None,
               **options: Any) -> None:
    """Write a DataFrame to ``path`` in the given format (COPY TO
    generalized). ``partition_by`` produces hive-style partition dirs —
    the 100 TB layout lever the reference lacks entirely."""
    fmt = _check_format(fmt)
    writer = df.write.mode(mode)
    if fmt == "csv":
        opts = dict(_PG_CSV_OPTS)
        opts.update({k: str(v) for k, v in options.items()})
        writer = writer.options(**opts)
    else:
        writer = writer.options(**{k: str(v) for k, v in options.items()})
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    getattr(writer, fmt)(path)
