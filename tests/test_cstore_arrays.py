"""PG 1-D array support in the cstore v1.7 codec: the public
utils/array.h datum layout (ndim/dataoffset/elemtype header, dims +
lbounds, LSB-first present-bitmap, MAXALIGN'd data, elements under
standard attribute rules) — the reference stores arrays through its
generic datum path (input/data_types.source exercises int[]/text[];
the README's customer_reviews DDL has a CHAR(10)[] column)."""

from __future__ import annotations

import datetime
import random
import struct
from decimal import Decimal

import pytest

from cstore_fdw_spark.sources.cstore_format import (
    cstore_type_props, pg_array_decode, pg_array_encode,
    read_cstore_file, write_cstore_file)


def _rt(vals, elemkind, typlen, align):
    return pg_array_decode(pg_array_encode(vals, elemkind, typlen,
                                           align), elemkind, typlen,
                           align)


def test_pg_array_spec_vector():
    """{1,2}::int4[] — ndim 1, dataoffset 0 (no NULLs), oid 23,
    dim 2, lbound 1, data at MAXALIGN(24)=24 datum-relative."""
    p = pg_array_encode([1, 2], "i", 4, 4)
    assert p == struct.pack("<iiiii", 1, 0, 23, 2, 1) + \
        struct.pack("<ii", 1, 2)
    # empty array: PG canonical ndim=0 form, 12-byte payload
    p0 = pg_array_encode([], "i", 4, 4)
    assert p0 == struct.pack("<iii", 0, 0, 23)
    assert pg_array_decode(p0, "i", 4, 4) == []
    # with a NULL: dataoffset set, present-bitmap LSB-first
    pn = pg_array_encode([7, None], "i", 4, 4)
    ndim, dataoffset, oid = struct.unpack_from("<iii", pn, 0)
    assert (ndim, oid) == (1, 23) and dataoffset == 32  # align(25)
    assert pn[20] == 0b01  # element 0 present, element 1 NULL
    assert pg_array_decode(pn, "i", 4, 4) == [7, None]


def test_pg_array_short_varlena_elements_decode():
    """Foreign files pack text elements as SHORT varlenas (no padding,
    1-byte header); the decoder must accept them."""
    # {'ab','c'} with short headers: data at 24 datum-relative
    data = bytes([(2 + 1) << 1 | 1]) + b"ab" + bytes([(1 + 1) << 1 | 1]) + b"c"
    payload = struct.pack("<iiiii", 1, 0, 25, 2, 1) + data
    assert pg_array_decode(payload, "text", -1, 4) == ["ab", "c"]


def test_pg_array_property_round_trips():
    rnd = random.Random(99)
    for _ in range(800):
        n = rnd.randint(0, 12)
        vals = [None if rnd.random() < .25 else rnd.randint(-2**40, 2**40)
                for _ in range(n)]
        assert _rt(vals, "q", 8, 8) == vals
    for _ in range(800):
        n = rnd.randint(0, 9)
        vals = [None if rnd.random() < .25 else
                "ø" * rnd.randint(0, 30) + str(rnd.random())
                for _ in range(n)]
        assert _rt(vals, "text", -1, 4) == vals
    for _ in range(400):
        n = rnd.randint(0, 16)
        vals = [struct.unpack("<f", struct.pack("<f", rnd.random()))[0]
                for _ in range(n)]
        assert _rt(vals, "f", 4, 4) == vals
    # decimal elements (numeric[], oid 1700)
    for _ in range(400):
        n = rnd.randint(0, 6)
        vals = [None if rnd.random() < .2 else
                Decimal(rnd.randint(-10**10, 10**10)).scaleb(-3)
                for _ in range(n)]
        assert _rt(vals, "num:18:3", -1, 4) == vals
    # dates and timestamps
    d0 = datetime.date(2021, 6, 1)
    vals = [d0 + datetime.timedelta(days=k) for k in range(5)]
    assert _rt(vals, "date", 4, 4) == vals
    t0 = datetime.datetime(2022, 3, 4, 5, 6, 7, 890123)
    vals = [t0 + datetime.timedelta(seconds=k * 7) for k in range(4)]
    assert _rt(vals, "ts", 8, 8) == vals


def test_pg_array_multidim_is_loud():
    bad = struct.pack("<iii", 2, 0, 23)
    with pytest.raises(ValueError, match="1-D"):
        pg_array_decode(bad, "i", 4, 4)
    with pytest.raises(ValueError, match="nested"):
        cstore_type_props("array<array<integer>>")


@pytest.mark.parametrize("comp", ["none", "pglz"])
def test_cstore_array_file_round_trip(tmp_path, comp):
    """array columns survive a multi-stripe file round trip with NULL
    arrays, NULL elements, and empty arrays (row writer path)."""
    rnd = random.Random(5)
    rows = []
    for i in range(2500):
        if i % 19 == 0:
            rows.append((i, None, None))
            continue
        ints = [None if rnd.random() < .2 else rnd.randint(-999, 999)
                for _ in range(rnd.randint(0, 6))]
        txts = [f"t{i % 50}-{k}" for k in range(i % 4)]
        rows.append((i, ints, txts))
    types = ["bigint", "array<integer>", "array<string>"]
    path = str(tmp_path / "arr.cstore")
    write_cstore_file(path, rows, types, stripe_row_count=1000,
                      block_row_count=1000, compression=comp)
    assert list(read_cstore_file(path, types)) == rows


def test_cstore_array_spark_datasource_round_trip(spark, tmp_path):
    """ARRAY<FLOAT> (the embeddings shape) through format('cstore')
    sink + source: Arrow list arrays -> PG array datums -> back."""
    import pyspark.sql.functions as F

    from cstore_fdw_spark.sources.cstore_datasource import register_cstore

    register_cstore(spark)
    df = (spark.range(0, 3000)
          .select(F.col("id").alias("k"),
                  F.array(
                      (F.col("id") % 97).cast("float"),
                      (F.col("id") % 31 / 8).cast("float"),
                      (F.col("id") * 3).cast("float")).alias("vec"),
                  F.when(F.col("id") % 7 == 0, None)
                  .otherwise(F.array(F.concat(F.lit("s"),
                                              F.col("id") % 13)))
                  .alias("tags")))
    path = str(tmp_path / "arrds")
    (df.write.format("cstore").option("stripe_row_count", "1000")
     .option("block_row_count", "1000").mode("overwrite").save(path))
    back = (spark.read.format("cstore")
            .schema("k BIGINT, vec ARRAY<FLOAT>, tags ARRAY<STRING>")
            .load(path))
    assert back.orderBy("k").collect() == df.orderBy("k").collect()


def test_catalog_cstore_array_table(spark, tmp_path):
    """storage_format='cstore' tables accept array columns end to end,
    including pruned reads."""
    import pyspark.sql.functions as F

    from cstore_fdw_spark.catalog import CStoreCatalog

    cat = CStoreCatalog(spark, warehouse=str(tmp_path / "wh"))
    cat.create_table("atab", "k BIGINT, xs ARRAY<BIGINT>",
                     storage_format="cstore", stripe_row_count=1000,
                     block_row_count=1000)
    df = spark.range(0, 1200).select(
        F.col("id").alias("k"),
        F.array(F.col("id"), F.col("id") * 2).alias("xs"))
    cat.insert("atab", df)
    assert cat.read("atab").orderBy("k").collect() == \
        df.orderBy("k").collect()
    pruned = cat.read("atab", columns=["xs"])
    assert pruned.columns == ["xs"]
    got = pruned.select(F.explode("xs").alias("e")) \
        .agg(F.sum("e").alias("s")).collect()[0].s
    assert got == sum(i + i * 2 for i in range(1200))
