"""PG ``numeric`` support in the cstore v1.7 codec: the REAL varlena
digit layout (base-10000 groups, weight/dscale/sign header, short AND
long header forms — the public on-disk format of PostgreSQL's
numeric.c), so decimal columns in bring-your-own cstore files read
bit-exactly and files written here carry genuine PG numeric datums.
The reference stores numerics through this exact datum path
(``input/data_types.source`` exercises the type; cstore_writer.c
serializes any PG datum via its type's typlen/typalign)."""

from __future__ import annotations

import random
import struct
from decimal import Decimal, getcontext

import pytest

from cstore_fdw_spark.sources.cstore_format import (
    pg_numeric_decode, pg_numeric_encode, read_cstore_file,
    write_cstore_file)


def test_pg_numeric_spec_vectors():
    """Hand-derived byte vectors for the documented layout: long header
    = uint16 sign|dscale + int16 weight + int16 base-10000 digits."""
    v = pg_numeric_encode(Decimal("1.5"), 1)
    assert v == bytes([0x01, 0x00, 0x00, 0x00, 0x01, 0x00, 0x88, 0x13])
    assert pg_numeric_decode(v) == Decimal("1.5")
    # zero stores ndigits=0, weight 0, positive sign
    v0 = pg_numeric_encode(Decimal("0.00"), 2)
    assert v0 == bytes([0x02, 0x00, 0x00, 0x00])
    assert pg_numeric_decode(v0) == Decimal("0.00")
    # -12345.678 -> groups [1|2345|6780], weight 1, sign 0x4000
    vneg = pg_numeric_encode(Decimal("-12345.678"), 3)
    assert vneg == struct.pack("<Hh3h", 0x4003, 1, 1, 2345, 6780)
    assert pg_numeric_decode(vneg) == Decimal("-12345.678")
    # trailing zero digit groups are stripped: 5.0000 -> just [5]
    vtz = pg_numeric_encode(Decimal("5.0000"), 4)
    assert vtz == struct.pack("<Hh1h", 0x0004, 0, 5)
    assert pg_numeric_decode(vtz) == Decimal("5.0000")


def test_pg_numeric_short_header_decode():
    """Foreign files may carry the SHORT header form (PG >= 9.1 writes
    it when sign/dscale/weight fit); the decoder must accept both."""
    # 1.5 short: flag 0x8000 | dscale 1 << 7, weight 0
    short = struct.pack("<H2h", 0x8000 | (1 << 7), 1, 5000)
    assert pg_numeric_decode(short) == Decimal("1.5")
    # 0.0001: digits [1], weight -1 (sign-extended 6-bit), dscale 4
    short2 = struct.pack("<Hh", 0x8000 | (4 << 7) | 0x0040 | (64 - 1), 1)
    assert pg_numeric_decode(short2) == Decimal("0.0001")
    # negative short: -2.5 -> sign bit 0x2000
    short3 = struct.pack("<H2h", 0x8000 | 0x2000 | (1 << 7), 2, 5000)
    assert pg_numeric_decode(short3) == Decimal("-2.5")
    # NaN (long header 0xC000) is loudly unsupported, never a wrong row
    with pytest.raises(ValueError, match="NaN"):
        pg_numeric_decode(struct.pack("<Hh", 0xC000, 0))


def test_pg_numeric_property_round_trip():
    getcontext().prec = 60
    rnd = random.Random(42)
    for _ in range(5000):
        p = rnd.randint(1, 38)
        scale = rnd.randint(0, min(p, 20))
        digs = rnd.randint(1, p)
        n = rnd.randint(0, 10 ** digs - 1)
        if rnd.random() < 0.5:
            n = -n
        d = Decimal(n).scaleb(-scale)
        enc = pg_numeric_encode(d, scale)
        back = pg_numeric_decode(enc)
        assert back == d, (d, back)


@pytest.mark.parametrize("comp", ["none", "pglz"])
def test_cstore_decimal_file_round_trip(tmp_path, comp):
    """decimal columns survive a multi-stripe, multi-block file round
    trip (row writer path) with NULLs, negatives, and mixed magnitudes;
    skip-node min/max on numerics enable block pruning."""
    getcontext().prec = 60
    rows = []
    for i in range(2500):
        if i % 13 == 0:
            rows.append((i, None))
            continue
        d = (Decimal(i * 7919) - Decimal(9_000_000)).scaleb(-2)
        rows.append((i, d))
    types = ["bigint", "decimal(18,2)"]
    path = str(tmp_path / "dec.cstore")
    write_cstore_file(path, rows, types, stripe_row_count=1000,
                      block_row_count=1000, compression=comp)
    back = list(read_cstore_file(path, types))
    assert back == rows
    # block pruning on the numeric column: min/max skip nodes compare
    # as Decimals (collation-free, unlike text)
    thr = Decimal("0.00")
    pruned = list(read_cstore_file(
        path, types, wanted=[0, 1],
        block_pred=lambda c, lo, hi: c != 1 or hi >= thr))
    assert len(pruned) < len(rows)
    want = {r[0] for r in rows if r[1] is not None and r[1] >= thr}
    assert want <= {r[0] for r in pruned}


def test_cstore_decimal_spark_datasource_round_trip(spark, tmp_path):
    """DecimalType(p,s) through the format('cstore') sink+source: the
    Arrow writer serializes real PG numeric datums, the Arrow reader
    rebuilds decimal128 arrays, values hash-match the original."""
    import pyspark.sql.functions as F

    from cstore_fdw_spark.sources.cstore_datasource import register_cstore

    register_cstore(spark)
    df = (spark.range(0, 5000)
          .select(F.col("id").alias("k"),
                  ((F.col("id") - 2500) * 997 / 100)
                  .cast("decimal(14,2)").alias("amt"),
                  F.when(F.col("id") % 11 == 0, None)
                  .otherwise((F.col("id") * 13) / 10000)
                  .cast("decimal(9,4)").alias("rate")))
    path = str(tmp_path / "decds")
    (df.write.format("cstore").option("stripe_row_count", "2000")
     .option("block_row_count", "1000").mode("overwrite").save(path))
    back = (spark.read.format("cstore")
            .schema("k BIGINT, amt DECIMAL(14,2), rate DECIMAL(9,4)")
            .load(path))
    a = df.orderBy("k").collect()
    b = back.orderBy("k").collect()
    assert a == b
    # pushed range filter on a decimal column drives block skipping
    got = back.filter(F.col("amt") > 24800).select("k").collect()
    want = df.filter(F.col("amt") > 24800).select("k").collect()
    assert sorted(r.k for r in got) == sorted(r.k for r in want)


def test_catalog_cstore_decimal_table(spark, tmp_path):
    """storage_format='cstore' tables accept decimal columns end to
    end: insert, read, pruned read, metadata row_count."""
    import pyspark.sql.functions as F

    from cstore_fdw_spark.catalog import CStoreCatalog

    cat = CStoreCatalog(spark, warehouse=str(tmp_path / "wh"))
    cat.create_table("dtab", "k BIGINT, price DECIMAL(12,2)",
                     storage_format="cstore", stripe_row_count=1000,
                     block_row_count=1000)
    df = spark.range(0, 1500).select(
        F.col("id").alias("k"),
        (F.col("id") * 3 / 4).cast("decimal(12,2)").alias("price"))
    cat.insert("dtab", df)
    assert cat.row_count("dtab") == 1500
    assert cat.read("dtab").orderBy("k").collect() == \
        df.orderBy("k").collect()
    pruned = cat.read("dtab", columns=["price"])
    assert pruned.columns == ["price"]
    assert pruned.agg(F.sum("price").alias("s")).collect()[0].s == \
        df.agg(F.sum("price").alias("s")).collect()[0].s


def test_cstore_unsupported_decimal_is_loud():
    """Nothing silently truncates: a non-decimal exotic type name still
    raises the documented loud error."""
    from cstore_fdw_spark.sources.cstore_format import cstore_type_props

    assert cstore_type_props("decimal(18,2)")[1] == -1
    with pytest.raises(ValueError, match="does not store"):
        cstore_type_props("map<string,int>")


def test_pg_numeric_encode_rounds_half_away_from_zero():
    """Narrowing to the declared dscale uses PG's rounding (numeric.c
    round_var: half AWAY from zero), not Python's banker's rounding:
    1.25 @ dscale 1 must store 1.3 (an f-string would give 1.2)."""
    from decimal import Decimal

    from cstore_fdw_spark.sources.cstore_format import (
        pg_numeric_decode, pg_numeric_encode)

    for src, dscale, want in [("1.25", 1, "1.3"), ("-1.25", 1, "-1.3"),
                              ("0.5", 0, "1"), ("-0.5", 0, "-1"),
                              ("2.675", 2, "2.68"),
                              ("1.2349999", 3, "1.235")]:
        got = pg_numeric_decode(pg_numeric_encode(Decimal(src), dscale))
        assert got == Decimal(want), (src, dscale, got)
