"""Bring-your-tables integration against a COMMITTED v1.7 binary
artifact: tests/fixtures/contestant.cstore mirrors the reference's own
corpus — data/contestants.1.csv under the contestant foreign-table
layout (input/create.source:35-38), pglz-compressed like
contestant_compressed. Because the fixture bytes are CHECKED IN (not
rewritten per run), every future reader revision is proven against
bytes a past writer revision produced — codec drift fails loudly, the
role the reference's expected/*.source regressions play."""

from __future__ import annotations

import os

import pytest

from scripts.make_contestant_fixture import OUT, TYPES, load_rows

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "contestant.cstore")


def test_fixture_is_committed():
    assert os.path.exists(FIXTURE), \
        "run scripts/make_contestant_fixture.py and commit the output"
    assert os.path.exists(FIXTURE + ".footer")
    assert OUT == FIXTURE


def test_committed_fixture_reads_bit_exactly():
    """The committed binary decodes to exactly the reference CSV's
    rows — types, dates, the CHAR(3) trailing pad, the array literal,
    pglz blocks and all."""
    from cstore_fdw_spark.sources.cstore_format import (
        cstore_row_count, read_cstore_file, read_footer)

    rows = load_rows()
    got = list(read_cstore_file(FIXTURE, TYPES))
    assert got == rows
    # metadata-only row count walks the same skip lists the reference's
    # CStoreTableRowCount does (cstore_reader.c:400-462)
    assert cstore_row_count(FIXTURE) == len(rows)
    brc, stripes = read_footer(FIXTURE)
    assert brc == 10000 and len(stripes) == 1


def test_committed_fixture_through_spark_source(spark):
    """format('cstore') serves the committed artifact schema-on-read —
    a real reference table brought over as-is, queried by Spark."""
    import pyspark.sql.functions as F

    from cstore_fdw_spark.sources.cstore_datasource import register_cstore

    register_cstore(spark)
    ddl = ("handle STRING, birthdate DATE, rating INT, "
           "percentile DOUBLE, country STRING, achievements STRING")
    df = spark.read.format("cstore").schema(ddl).load(FIXTURE)
    rows = load_rows()
    assert df.count() == len(rows)
    got = {r.handle: (r.birthdate, r.rating, r.percentile, r.country,
                      r.achievements) for r in df.collect()}
    for handle, bd, rating, pct, country, ach in rows:
        assert got[handle] == (bd, rating, pytest.approx(pct), country,
                               ach)
    # the reference's own load.source sanity aggregate shape
    top = (df.filter(F.col("percentile") > 98.0)
           .agg(F.count(F.lit(1)).alias("n")).collect()[0].n)
    assert top == sum(1 for r in rows if r[3] > 98.0)


def test_committed_arrays_fixture_reads_bit_exactly(spark):
    """Second committed artifact: the same corpus with achievements as
    a REAL PG text[] array datum (utils/array.h layout) — proves array
    decode against past-writer bytes, and serves it through Spark."""
    import pyspark.sql.functions as F

    from cstore_fdw_spark.sources.cstore_datasource import register_cstore
    from cstore_fdw_spark.sources.cstore_format import read_cstore_file
    from scripts.make_contestant_fixture import (
        OUT_ARR, TYPES_ARR, load_rows_arrays)

    assert os.path.exists(OUT_ARR), \
        "run scripts/make_contestant_fixture.py and commit the output"
    rows = load_rows_arrays()
    assert list(read_cstore_file(OUT_ARR, TYPES_ARR)) == rows
    register_cstore(spark)
    df = spark.read.format("cstore").schema(
        "handle STRING, birthdate DATE, rating INT, percentile DOUBLE, "
        "country STRING, achievements ARRAY<STRING>").load(OUT_ARR)
    got = {r.handle: r.achievements for r in df.collect()}
    for handle, _bd, _r, _p, _c, ach in rows:
        assert got[handle] == ach
    # array function surface over the served fixture
    n = df.filter(F.array_contains("achievements", "a")).count()
    assert n == sum(1 for r in rows if "a" in r[5])
