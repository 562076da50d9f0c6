"""Type-fidelity round-trips through the managed table layer — port of the
reference's data_types regression corpus (FIXTURES.md F3-F12; reference
``input/data_types.source``, ``sql/insert.sql:28-53``).

The format is type-agnostic in the reference (stores any PG Datum); here
Parquet must round-trip every Spark type from SURVEY §1.5's mapping.
"""

from __future__ import annotations

import datetime
import hashlib
import random
from decimal import Decimal

from pyspark.sql import Row
from pyspark.sql import functions as F


def _roundtrip(catalog, spark, name, schema, rows):
    catalog.create_table(name, schema)
    catalog.insert(name, spark.createDataFrame(rows, schema))
    return catalog.read(name)


def test_array_types(spark, catalog):
    # F3: int/bigint/text arrays with empties, extremes, empty-string elems
    out = _roundtrip(
        catalog, spark, "array_types",
        "id int, int_array array<int>, bigint_array array<bigint>, "
        "text_array array<string>",
        [(1, [], [], []),
         (2, [-2147483648, 2147483647], [-9223372036854775808,
                                         9223372036854775807], [""]),
         (3, [1, None, 3], None, ["a", "", None])])
    rows = {r.id: r for r in out.collect()}
    assert rows[1].int_array == [] and rows[1].text_array == []
    assert rows[2].int_array == [-2147483648, 2147483647]
    assert rows[2].bigint_array == [-9223372036854775808, 9223372036854775807]
    assert rows[2].text_array == [""]
    assert rows[3].int_array == [1, None, 3]
    assert rows[3].bigint_array is None
    assert rows[3].text_array == ["a", "", None]


def test_datetime_types(spark, catalog):
    # F4: timestamp (instant), timestamp_ntz, date, day-time interval
    out = _roundtrip(
        catalog, spark, "datetime_types",
        "id int, ts timestamp, ts_ntz timestamp_ntz, d date, "
        "iv interval day to second",
        [(1, datetime.datetime(1970, 1, 1, 0, 0, 0),
          datetime.datetime(2000, 6, 15, 12, 30, 1, 500),
          datetime.date(1, 1, 1), datetime.timedelta(hours=4)),
         (2, datetime.datetime(2262, 4, 11, 23, 47, 16),
          None, datetime.date(9999, 12, 31),
          datetime.timedelta(days=2, seconds=3661, microseconds=7))])
    rows = {r.id: r for r in out.collect()}
    assert rows[1].ts == datetime.datetime(1970, 1, 1, 0, 0, 0)
    assert rows[1].ts_ntz == datetime.datetime(2000, 6, 15, 12, 30, 1, 500)
    assert rows[1].d == datetime.date(1, 1, 1)
    assert rows[1].iv == datetime.timedelta(hours=4)
    assert rows[2].d == datetime.date(9999, 12, 31)
    assert rows[2].iv == datetime.timedelta(days=2, seconds=3661,
                                            microseconds=7)


def test_composite_and_enum(spark, catalog):
    # F5: struct with null members / null struct; enum as constrained string
    schema = ("id int, composite struct<a:int,b:string>, enum_col string")
    out = _roundtrip(
        catalog, spark, "composite_enum", schema,
        [(1, Row(a=2, b="b"), "a"),
         (2, Row(a=None, b=None), "b"),
         (3, None, None)])
    rows = {r.id: r for r in out.collect()}
    assert rows[1].composite == Row(a=2, b="b")
    assert rows[2].composite == Row(a=None, b=None)
    assert rows[3].composite is None


def test_range_types_as_structs(spark, catalog):
    # F6: PG ranges modeled as lo/hi/inclusivity structs (SURVEY §1.5)
    schema = ("id int, int4range struct<lo:int,hi:int,lo_inc:boolean,"
              "hi_inc:boolean,is_empty:boolean>")
    out = _roundtrip(
        catalog, spark, "range_types", schema,
        [(1, Row(lo=1, hi=10, lo_inc=True, hi_inc=False, is_empty=False)),
         (2, Row(lo=1, hi=None, lo_inc=True, hi_inc=False, is_empty=False)),
         (3, Row(lo=None, hi=None, lo_inc=False, hi_inc=False,
                 is_empty=True))])
    rows = {r.id: r for r in out.collect()}
    assert rows[1].int4range.hi == 10
    assert rows[2].int4range.hi is None          # unbounded [1,)
    assert rows[3].int4range.is_empty            # 'empty'
    # range-containment query over the struct encoding
    catalog.sql_view("range_types")
    hits = spark.sql("""
        SELECT id FROM range_types
        WHERE NOT int4range.is_empty
          AND (int4range.lo IS NULL OR int4range.lo <= 5)
          AND (int4range.hi IS NULL OR 5 < int4range.hi)
    """).collect()
    assert sorted(r.id for r in hits) == [1, 2]


def test_other_scalar_types(spark, catalog):
    # F7: bool, bytea, money(decimal), inet/uuid/bit as validated strings,
    # json as string + from_json
    schema = ("id int, flag boolean, payload binary, money decimal(19,2), "
              "inet string, uuid string, bits string, js string")
    out = _roundtrip(
        catalog, spark, "other_types", schema,
        [(1, True, bytearray(b"\xde\xad\xbe\xef"), Decimal("123.45"),
          "192.168.1.1/32", "a0eebc99-9c0b-4ef8-bb6d-6bb9bd380a11",
          "10101", '{"key": "value"}'),
         (2, False, bytearray(b""), Decimal("-0.01"), None, None, "",
          "[]")])
    rows = {r.id: r for r in out.collect()}
    assert rows[1].flag is True
    assert bytes(rows[1].payload) == b"\xde\xad\xbe\xef"
    assert rows[1].money == Decimal("123.45")
    assert rows[2].money == Decimal("-0.01")
    # json queryable via from_json / get_json_object
    catalog.sql_view("other_types")
    v = spark.sql("SELECT get_json_object(js, '$.key') AS k "
                  "FROM other_types WHERE id = 1").collect()[0].k
    assert v == "value"


def test_null_values_and_allnull_scan(spark, catalog):
    # F8: all-null column, [null] arrays, null structs; scans/filters must
    # not mis-skip all-null blocks (reference cstore_reader.c:780-787)
    schema = "a int, b array<int>, c struct<x:int,y:string>"
    out = _roundtrip(
        catalog, spark, "null_values", schema,
        [(None, [None], Row(x=None, y=None)),
         (None, None, None)])
    rows = out.collect()
    assert all(r.a is None for r in rows)
    assert catalog.read("null_values").filter(F.col("a").isNull()).count() == 2
    assert catalog.read("null_values").filter(F.col("a") == 1).count() == 0
    assert catalog.read("null_values").filter(F.col("a").isNotNull()).count() == 0


def test_famous_constants_partial_columns(spark, catalog):
    # F9: COPY column-list loads with reordered/partial columns
    from cstore_fdw_spark.io import copy_from_csv
    import os
    catalog.create_table("famous_constants",
                         "id int, name string, value float")
    base = catalog.warehouse
    p1 = os.path.join(base, "fc1.csv")
    p2 = os.path.join(base, "fc2.csv")
    with open(p1, "w") as f:
        f.write("3.141,pi,1\n2.718,e,2\n")        # (value, name, id)
    with open(p2, "w") as f:
        f.write("eulers,0.577\n")                  # (name, value)
    copy_from_csv(catalog, "famous_constants", p1,
                  columns=["value", "name", "id"])
    copy_from_csv(catalog, "famous_constants", p2,
                  columns=["name", "value"])
    rows = catalog.read("famous_constants").orderBy(
        F.col("id").asc_nulls_last(), "name").collect()
    assert [(r.id, r.name) for r in rows] == [
        (1, "pi"), (2, "e"), (None, "eulers")]


def test_long_text_roundtrip(spark, catalog):
    # F12: ~30KB values survive insert-select with intact digests
    rng = random.Random(42)
    big = [(i, "".join(str(rng.random()) for _ in range(2000)))
           for i in range(10)]
    want = {i: hashlib.md5(t.encode()).hexdigest() for i, t in big}
    catalog.create_table("long_text", "id int, t string")
    catalog.insert("long_text", spark.createDataFrame(big, "id int, t string"))
    catalog.sql_view("long_text")
    # insert-select round-trip (reference sql/insert.sql:28-53)
    catalog.create_table("long_text2", "id int, t string")
    from cstore_fdw_spark.io import insert_into_select
    insert_into_select(catalog, "long_text2", "SELECT id, t FROM long_text")
    got = {r.id: r.h for r in catalog.read("long_text2")
           .select("id", F.md5(F.col("t").cast("binary")).alias("h"))
           .collect()}
    assert got == want


def test_decimal_precision_roundtrip(spark, catalog):
    # PG numeric → DecimalType cap (SURVEY M2 hard spot)
    schema = "id int, small decimal(5,2), wide decimal(38,18)"
    out = _roundtrip(
        catalog, spark, "decimals", schema,
        [(1, Decimal("999.99"), Decimal("12345678901234567890.123456789")),
         (2, Decimal("-999.99"), Decimal("-0.000000000000000001"))])
    rows = {r.id: r for r in out.collect()}
    assert rows[1].small == Decimal("999.99")
    assert rows[1].wide == Decimal("12345678901234567890.123456789000000000")
    assert rows[2].wide == Decimal("-1E-18")


def test_infinity_timestamp_sentinels(spark, catalog, tmp_path):
    # M2 policy: PG's ±infinity (reference data/datetime_types.csv:2 via
    # input/data_types.source:22-30) maps to documented extreme-instant
    # sentinels; ordering/filters behave like PG and COPY round-trips the
    # 'infinity'/'-infinity' text forms.
    import datetime as dt
    from cstore_fdw_spark import io as cio
    csv = tmp_path / "dt.csv"
    csv.write_text("1,2000-01-02 04:05:06,2000-01-02\n"
                   "2,infinity,infinity\n"
                   "3,-infinity,-infinity\n")
    catalog.create_table("dtt", "id int, ts timestamp, d date")
    cio.copy_from_csv(catalog, "dtt", str(csv))
    rows = {r.id: r for r in catalog.read("dtt").collect()}
    assert rows[2].ts == dt.datetime(9999, 12, 31, 23, 59, 59, 999999)
    assert rows[3].ts == dt.datetime(1, 1, 2)
    assert rows[2].d == dt.date(9999, 12, 31)
    assert rows[3].d == dt.date(1, 1, 1)
    # PG comparison semantics: -infinity < every finite value < infinity
    assert [r.id for r in catalog.read("dtt").orderBy("ts").collect()] \
        == [3, 1, 2]
    assert catalog.read("dtt").filter(F.col("ts") > "2400-01-01").count() == 1
    assert catalog.read("dtt").filter(F.col("d") < "1900-01-01").count() == 1
    # export prints the sentinels back as PG's infinity text
    out = tmp_path / "outdir"
    cio.copy_to_csv(catalog, "dtt", str(out))
    text = "".join(p.read_text() for p in sorted(out.glob("part-*")))
    assert "2,infinity,infinity" in text
    assert "3,-infinity,-infinity" in text
    assert "2000-01-02 04:05:06" in text
