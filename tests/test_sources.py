"""Source/sink format round-trips (COPY FROM/TO generalized — SURVEY §2.A
A5/A6 plus json/orc the reference never had)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cstore_fdw_spark.sources import read_source, write_sink


@pytest.fixture(scope="module")
def sample(spark):
    return spark.createDataFrame(
        [(1, "x", 1.5, None), (2, "with,comma", -2.0, "q\"uote"),
         (3, None, None, "z")],
        "id int, name string, val double, note string")


@pytest.mark.parametrize("fmt", ["parquet", "csv", "json", "orc"])
def test_roundtrip(spark, sample, tmp_path, fmt):
    path = str(tmp_path / fmt)
    write_sink(sample, path, fmt)
    schema = "id int, name string, val double, note string"
    back = read_source(spark, path, fmt, schema=schema)
    want = {tuple(r) for r in sample.collect()}
    got = {tuple(r) for r in back.select("id", "name", "val", "note").collect()}
    assert got == want, f"{fmt}: {got} != {want}"


def test_partitioned_write(spark, sample, tmp_path):
    path = str(tmp_path / "bypart")
    write_sink(sample, path, "parquet", partition_by=["id"])
    import os
    assert any(d.startswith("id=") for d in os.listdir(path))
    back = read_source(spark, path, "parquet")
    assert back.count() == 3
    # partition pruning: only one directory is scanned for id=2
    pruned = back.filter(F.col("id") == 2)
    assert pruned.count() == 1


def test_unsupported_format(spark, sample, tmp_path):
    with pytest.raises(ValueError, match="unsupported format"):
        write_sink(sample, str(tmp_path / "x"), "avro")
    with pytest.raises(ValueError, match="unsupported format"):
        read_source(spark, str(tmp_path / "x"), "xml")


def test_csv_pg_dialect_nulls(spark, tmp_path):
    # PG COPY CSV parity: empty unquoted = NULL; quoted "" = empty string
    p = str(tmp_path / "nulls.csv")
    with open(p, "w") as f:
        f.write('1,\n2,""\n3,x\n')
    df = read_source(spark, p, "csv", schema="id int, s string")
    rows = {r.id: r.s for r in df.collect()}
    assert rows[1] is None
    assert rows[2] == ""
    assert rows[3] == "x"


def test_copy_malformed_input_errors_like_pg(spark, catalog, tmp_path):
    # PG COPY raises 'invalid input syntax' on malformed values; Spark's
    # PERMISSIVE default would silently NULL them — COPY defaults to
    # FAILFAST with a CStoreError, PERMISSIVE available by explicit opt-in
    import pytest
    from cstore_fdw_spark.catalog import CStoreError
    from cstore_fdw_spark.io import copy_from_csv
    catalog.create_table("tmf", "a int, b int")
    bad = tmp_path / "bad.csv"
    bad.write_text("1,2\nnotanint,3\n4,5\n")
    with pytest.raises(CStoreError, match="invalid input syntax"):
        copy_from_csv(catalog, "tmf", str(bad))
    # explicit opt-in to permissive NULL-filling
    copy_from_csv(catalog, "tmf", str(bad), mode="PERMISSIVE")
    assert catalog.row_count("tmf") == 3
    # malformed timestamps error too (they read via the ±infinity string
    # path, which FAILFAST alone can't see)
    catalog.create_table("tmt", "a int, ts timestamp")
    badts = tmp_path / "badts.csv"
    badts.write_text("1,2024-01-01 00:00:00\n2,notadate\n")
    with pytest.raises(CStoreError, match="invalid input syntax"):
        copy_from_csv(catalog, "tmt", str(badts))
    # a malformed NON-datetime value in a file that ALSO has datetime
    # columns surfaces through the eager ±infinity validation probe —
    # it must still translate to the COPY contract, not a raw Spark error
    badint = tmp_path / "badint.csv"
    badint.write_text("1,2024-01-01 00:00:00\nnotanint,2024-01-02 00:00:00\n")
    with pytest.raises(CStoreError, match="invalid input syntax"):
        copy_from_csv(catalog, "tmt", str(badint))
