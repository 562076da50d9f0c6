"""Bulk load / export — COPY FROM / COPY TO parity.

The reference implements ``COPY table FROM 'file.csv'`` by driving
PostgreSQL's CSV parser into its stripe writer
(reference ``cstore_fdw.c:539-642``) and ``COPY table TO`` by rewriting to
``COPY (SELECT * FROM t) TO`` (reference ``cstore_fdw.c:651-707``).
Here both are declarative DataFrame reads/writes — distributed, no
driver-side row loop.

CSV dialect: PostgreSQL COPY CSV uses empty-unquoted as NULL, ``"`` quoting
with ``""`` escapes; we mirror that (SURVEY §7 hard-spot #4).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

from cstore_fdw_spark.catalog import CStoreCatalog, CStoreError

_PG_CSV_OPTS = {
    "header": "false",
    "quote": '"',
    "escape": '"',
    "nullValue": "",
    "emptyValue": "",
    "timestampFormat": "yyyy-MM-dd HH:mm:ss[.SSSSSS]",
    "dateFormat": "yyyy-MM-dd",
}


def copy_from_csv(catalog: CStoreCatalog, table: str, path: str,
                  columns: list[str] | None = None,
                  **csv_options: Any) -> None:
    """A5: ``COPY table FROM path WITH CSV`` — bulk load into a managed table.

    ``columns`` supports COPY's column-list form (reference
    ``input/load.source:26-42``): the CSV supplies exactly those columns, in
    that order; unlisted table columns become NULL.
    """
    meta = catalog._load_meta(table)
    schema = meta.schema()
    opts = dict(_PG_CSV_OPTS)
    opts.update({k: str(v) for k, v in csv_options.items()})
    if columns is None:
        df = catalog.spark.read.options(**opts).schema(schema).csv(path)
    else:
        from pyspark.sql import types as T
        sub = T.StructType([schema[c] for c in columns])
        df = catalog.spark.read.options(**opts).schema(sub).csv(path)
        from pyspark.sql import functions as F
        for f_ in schema.fields:
            if f_.name not in columns:
                df = df.withColumn(f_.name, F.lit(None).cast(f_.dataType))
        df = df.select(*schema.fieldNames())
    catalog.insert(table, df)


def copy_to_csv(catalog: CStoreCatalog, table_or_df: str | DataFrame,
                path: str, header: bool = False, **csv_options: Any) -> None:
    """A6: ``COPY table TO path`` / ``COPY (query) TO path``.

    Accepts a table name or an arbitrary DataFrame — matching the
    reference's rewrite of table form into query form
    (``cstore_fdw.c:651-707``).
    """
    df = (catalog.read(table_or_df) if isinstance(table_or_df, str)
          else table_or_df)
    opts = dict(_PG_CSV_OPTS)
    opts["header"] = str(header).lower()
    opts.update({k: str(v) for k, v in csv_options.items()})
    df.write.mode("overwrite").options(**opts).csv(path)


def insert_into_select(catalog: CStoreCatalog, table: str, query: str,
                       spark: SparkSession | None = None) -> None:
    """A7: ``INSERT INTO table SELECT ...`` — the reference's only supported
    DML form (``cstore_fdw.c:2269-2306``). The SELECT runs against whatever
    temp views are registered on the session."""
    spark = spark or catalog.spark
    catalog.insert(table, spark.sql(query))


def copy_from_program(catalog: CStoreCatalog, table: str, command: str,
                      columns: list[str] | None = None,
                      **csv_options: Any) -> None:
    """A5 (program form): ``COPY table FROM PROGRAM 'cmd'`` — run a
    producer command, ingest its stdout as CSV (reference
    ``input/load.source`` exercises program/STDIN pipes; the reference
    gates this behind superuser, ``cstore_fdw.c:481-505`` — here it is a
    plain utility).

    The program output is staged to a temp file and bulk-loaded with the
    same distributed CSV path as file loads.
    """
    import subprocess
    import tempfile

    with tempfile.NamedTemporaryFile(mode="wb", suffix=".csv",
                                     delete=False) as tmp:
        proc = subprocess.run(command, shell=True, stdout=subprocess.PIPE,
                              stderr=subprocess.PIPE, check=False)
        if proc.returncode != 0:
            raise CStoreError(
                f"program failed (exit {proc.returncode}): "
                f"{proc.stderr.decode(errors='replace')[:500]}")
        tmp.write(proc.stdout)
        staged = tmp.name
    try:
        copy_from_csv(catalog, table, staged, columns=columns, **csv_options)
    finally:
        import os as _os
        _os.unlink(staged)
