"""The cstore v1.7 binary-format codec and its Spark data source:
format-layout pins, pglz spec vectors, full-type round trips, block
skipping, and the end-to-end Spark read/write path."""

from __future__ import annotations

import datetime
import os
import random
import struct

import pytest

from cstore_fdw_spark.sources.cstore_format import (
    CSTORE_TYPES, MAGIC, pglz_compress, pglz_decompress, read_cstore_file,
    read_footer, write_cstore_file)


def test_pglz_spec_vectors_and_round_trips():
    """Hand-built streams per the published pg_lzcompress format pin the
    DECODER against the spec (not just against our own encoder); random
    and highly-compressible buffers then round-trip."""
    # literal 'a','b' then match(off=2, len=4) -> "ababab"
    stream = bytes([0b00000100, ord("a"), ord("b"), 0x01, 0x02])
    assert pglz_decompress(stream, 6) == b"ababab"
    # length extension: literal 'x' then match(off=1, len=20)
    stream = bytes([0b00000010, ord("x"), 0x0F, 0x01, 20 - 18])
    assert pglz_decompress(stream, 21) == b"x" * 21
    random.seed(5)
    for trial in range(40):
        n = random.randint(0, 4000)
        mode = trial % 3
        if mode == 0:
            data = bytes(random.randrange(256) for _ in range(n))
        elif mode == 1:
            data = (b"the quick brown fox " * (n // 10 + 1))[:n]
        else:
            data = bytes(random.choice(b"ab") for _ in range(n))
        packed = pglz_compress(data)
        if packed is not None:
            assert len(packed) < len(data)
            assert pglz_decompress(packed, len(data)) == data, trial
    # incompressible data is declined, like the reference's CompressBuffer
    assert pglz_compress(bytes(range(256))) is None


def _sample_rows(n):
    rows = []
    for i in range(n):
        if i % 17 == 0:
            rows.append((None,) * 9)
            continue
        rows.append((
            i * 1000003, i - 1200, (i % 60000) - 30000, i % 3 == 0,
            i / 7.0, float(i % 100) / 4.0,
            datetime.date(2020, 1, 1) + datetime.timedelta(days=i % 4000),
            datetime.datetime(2021, 3, 4, 5, 6, 7, 123456)
            + datetime.timedelta(seconds=i * 31),
            ("döc-" + "x" * (i % 200) + str(i)) if i % 5 else ""))
    return rows


TYPES = ["bigint", "integer", "smallint", "boolean", "double", "float",
         "date", "timestamp", "string"]


@pytest.mark.parametrize("comp", ["none", "pglz"])
def test_cstore_file_round_trip_all_types(tmp_path, comp):
    """Every supported type + NULL rows + multibyte text survive a
    multi-stripe, multi-block file round trip bit-exactly; pglz shrinks
    the file."""
    rows = _sample_rows(2500)
    path = str(tmp_path / f"t_{comp}.cstore")
    write_cstore_file(path, rows, TYPES, stripe_row_count=1000,
                      block_row_count=150, compression=comp)
    assert list(read_cstore_file(path, TYPES)) == rows
    if comp == "pglz":
        none_path = str(tmp_path / "t_none2.cstore")
        write_cstore_file(none_path, rows, TYPES, stripe_row_count=1000,
                          block_row_count=150, compression="none")
        assert (os.path.getsize(path) < 0.5 * os.path.getsize(none_path))


def test_cstore_footer_layout_pin(tmp_path):
    """Byte-level format pins: the footer file ends with the 1-byte
    postscript size; the postscript carries magic 'citus_cstore' and
    version 1.7; stripe metadata arithmetic adds up to the data file
    size (cstore_writer.c:379-414 protocol)."""
    rows = _sample_rows(300)
    path = str(tmp_path / "pin.cstore")
    write_cstore_file(path, rows, TYPES, stripe_row_count=120,
                      block_row_count=50)
    raw = open(path + ".footer", "rb").read()
    ps_size = raw[-1]
    assert ps_size < 256
    assert MAGIC.encode() in raw[-1 - ps_size:-1]
    brc, stripes = read_footer(path)
    assert brc == 50
    assert len(stripes) == 3  # 300 rows / 120-row stripes
    total = sum(sk + dl + fl for _off, sk, dl, fl in stripes)
    assert total == os.path.getsize(path)
    assert stripes[0][0] == 0  # first stripe at offset 0


def test_cstore_projection_and_block_skipping(tmp_path):
    """Projection decodes only wanted columns; a min/max block predicate
    prunes non-qualifying blocks (and never loses qualifying rows) —
    the reference's skip-list filtering (cstore_reader.c)."""
    rows = _sample_rows(2000)
    path = str(tmp_path / "skip.cstore")
    write_cstore_file(path, rows, TYPES, stripe_row_count=500,
                      block_row_count=100, compression="none")
    two = list(read_cstore_file(path, TYPES, wanted=[0, 8]))
    assert two[1] == (rows[1][0], rows[1][8])
    thr = 1_500_000_000
    seen = list(read_cstore_file(
        path, TYPES, wanted=[0],
        block_pred=lambda c, lo, hi: hi is not None and hi >= thr))
    want = sorted(r[0] for r in rows if r[0] is not None and r[0] >= thr)
    got = sorted(v[0] for v in seen if v[0] is not None and v[0] >= thr)
    assert got == want
    assert len(seen) < len(rows), "nothing was pruned"


def test_cstore_spark_datasource_round_trip(spark, tmp_path):
    """df.write.format('cstore') -> read.format('cstore'): values,
    NULLs, filters (exercising pushed-filter block skipping), overwrite
    mode, and the schema-required error."""
    from cstore_fdw_spark.sources.cstore_datasource import register_cstore

    register_cstore(spark)
    register_cstore(spark)  # idempotent
    ddl = ("id BIGINT, small INT, flag BOOLEAN, x DOUBLE, d DATE, "
           "ts TIMESTAMP, s STRING")
    rows = []
    for i in range(3000):
        if i % 13 == 0:
            rows.append((None,) * 7)
        else:
            rows.append((
                i * 7, i - 100, i % 2 == 0, i / 3.0,
                datetime.date(2019, 1, 1) + datetime.timedelta(days=i % 900),
                datetime.datetime(2022, 5, 6, 7, 8, 9, 500000)
                + datetime.timedelta(seconds=i),
                f"row-ö-{i}" if i % 3 else ""))
    df = spark.createDataFrame(rows, ddl).repartition(4)
    path = str(tmp_path / "ds")
    (df.write.format("cstore").option("stripe_row_count", "500")
       .option("block_row_count", "100").mode("overwrite").save(path))
    assert any(f.endswith(".cstore") for f in os.listdir(path))
    back = spark.read.format("cstore").schema(ddl).load(path)

    def key(t):
        return tuple((v is None, str(v)) for v in t)

    assert (sorted((tuple(r) for r in back.collect()), key=key)
            == sorted((tuple(r) for r in df.collect()), key=key))
    pred = "id > 10000 and d >= date'2020-01-01'"
    assert (sorted((tuple(r) for r in back.filter(pred).collect()), key=key)
            == sorted((tuple(r) for r in df.filter(pred).collect()),
                      key=key))
    df.limit(7).write.format("cstore").mode("overwrite").save(path)
    assert spark.read.format("cstore").schema(ddl).load(path).count() == 7
    with pytest.raises(Exception, match="schema"):
        spark.read.format("cstore").load(path).count()


def test_cstore_unsupported_type_is_loud(spark, tmp_path):
    from cstore_fdw_spark.sources.cstore_datasource import register_cstore

    register_cstore(spark)
    df = spark.createDataFrame([(1, {"k": 2})], "a INT, m MAP<STRING,INT>")
    with pytest.raises(Exception, match="does not support column type"):
        # python data sources accept only append/overwrite save modes
        df.write.format("cstore").mode("overwrite").save(
            str(tmp_path / "bad"))
    assert sorted(CSTORE_TYPES) == [
        "bigint", "boolean", "bytea", "date", "double", "float",
        "inet", "integer", "interval", "json", "money", "smallint",
        "string", "time", "timestamp", "timestamptz", "uuid", "varbit"]


def test_catalog_managed_cstore_table_lifecycle(spark, tmp_path):
    """storage_format='cstore': the catalog manages tables in the
    reference's OWN binary format — epoch-stamped appends, time travel,
    metadata-only row_count via skip-list walks, ADD COLUMN default
    backfill (old files NULL-pad positionally, the watermark applies
    the default), crash-safe compact, format conversion BOTH ways via
    alter_table_layout, and the v1.7 feature guards (no partition_by/
    zorder/bloom, pglz-or-none compression, no DROP COLUMN)."""
    import datetime

    import pyspark.sql.functions as F

    from cstore_fdw_spark.catalog import CStoreCatalog, CStoreError

    cat = CStoreCatalog(spark, warehouse=str(tmp_path / "wh"))
    cat.create_table("t", "a BIGINT, b STRING, d DATE",
                     storage_format="cstore", stripe_row_count=1000,
                     block_row_count=1000)
    cat.insert("t", spark.range(0, 500).select(
        F.col("id").alias("a"),
        F.concat(F.lit("x"), F.col("id")).alias("b"),
        F.lit(datetime.date(2024, 1, 2)).alias("d")))
    e1 = cat.current_epoch("t")
    cat.insert("t", spark.range(500, 800).select(
        F.col("id").alias("a"), F.lit(None).cast("string").alias("b"),
        F.lit(None).cast("date").alias("d")))
    assert cat.read("t").count() == 800
    assert cat.row_count("t") == 800          # skip-list walk, no data
    assert cat.read("t", as_of_epoch=e1).count() == 500
    # value fidelity through the binary format
    row = cat.read("t").filter("a = 3").collect()[0]
    assert (row.b, row.d) == ("x3", datetime.date(2024, 1, 2))
    # schema evolution: default backfills rows older than the column
    cat.add_column("t", "q", "INT", default=7)
    cat.insert("t", spark.range(800, 900).select(
        F.col("id").alias("a"), F.lit("new").alias("b"),
        F.lit(None).cast("date").alias("d"),
        F.lit(1).cast("int").alias("q")))
    out = cat.read("t")
    assert out.filter("a < 800 and q = 7").count() == 800
    assert out.filter("a >= 800 and q = 1").count() == 100
    # the explicit-NULL hazard: a post-ADD batch inserting NULL q must
    # NOT read the default — the reader emits each row's file epoch
    # (input_file_name() is empty for python data sources) and the
    # projection scopes the backfill by it
    cat.insert("t", spark.range(900, 950).select(
        F.col("id").alias("a"), F.lit("nullq").alias("b"),
        F.lit(None).cast("date").alias("d"),
        F.lit(None).cast("int").alias("q")))
    out2 = cat.read("t")
    assert out2.filter("a >= 900 and q is null").count() == 50
    assert out2.filter("a < 800 and q = 7").count() == 800
    # metadata-only zone maps from the SKIP LISTS feed column_minmax
    assert cat.column_minmax("t", "a") == (0, 949)
    # text columns stay honestly un-prunable (collation hazard)
    assert cat.column_minmax("t", "b") is None
    # DELETE works (file pruning falls back to a full rewrite — no
    # input_file_name identity on python data sources)
    assert cat.delete_where("t", "a >= 900") == 50
    assert cat.read("t").count() == 900
    cat.compact("t")
    assert cat.read("t").count() == 900
    assert cat.read("t").filter("q = 7").count() == 800
    with pytest.raises(CStoreError, match="not supported"):
        cat.drop_column("t", "b")
    # convert to parquet and back — data survives both rewrites
    cat.alter_table_layout("t", storage_format="parquet",
                           compression="zstd")
    assert cat.read("t").count() == 900
    cat.alter_table_layout("t", storage_format="cstore",
                           compression="pglz")
    assert cat.read("t").filter("q = 7").count() == 800
    cat.truncate("t")
    assert cat.read("t").count() == 0
    cat.drop_table("t")
    for bad in ({"partition_by": "a"}, {"zorder_by": "a"},
                {"compression": "zstd"}):
        with pytest.raises(CStoreError):
            cat.create_table("bad", "a INT", storage_format="cstore",
                             **bad)


def test_cstore_codec_property_round_trip():
    """Property test: arbitrary row content in every supported type
    round-trips through the binary format, under adversarial block/
    stripe boundaries (sizes 1 and 2 force single-row blocks and
    stripe-per-row layouts)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    col_strategies = {
        "bigint": st.integers(-2**63, 2**63 - 1),
        "integer": st.integers(-2**31, 2**31 - 1),
        "smallint": st.integers(-2**15, 2**15 - 1),
        "boolean": st.booleans(),
        "double": st.floats(allow_nan=False, width=64),
        "float": st.floats(allow_nan=False, width=32),
        "date": st.dates(min_value=datetime.date(1, 1, 1),
                         max_value=datetime.date(9999, 12, 28)),
        "timestamp": st.datetimes(
            min_value=datetime.datetime(1970, 1, 2),
            max_value=datetime.datetime(2200, 1, 1)),
        "string": st.text(max_size=300),
    }

    @settings(max_examples=40, deadline=None)
    @given(data=st.data())
    def inner(data):
        types = data.draw(st.lists(
            st.sampled_from(sorted(col_strategies)), min_size=1,
            max_size=5))
        n = data.draw(st.integers(0, 40))
        rows = [tuple(
            data.draw(st.one_of(st.none(), col_strategies[t]))
            for t in types) for _ in range(n)]
        brc = data.draw(st.sampled_from([1, 2, 7, 50]))
        src = data.draw(st.sampled_from([1, 3, 50]))
        comp = data.draw(st.sampled_from(["none", "pglz"]))
        import tempfile
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "p.cstore")
            write_cstore_file(path, rows, types, stripe_row_count=src,
                              block_row_count=brc, compression=comp)
            assert list(read_cstore_file(path, types)) == rows

    inner()


def test_reference_query_regression_in_cstore_format(spark, tmp_path):
    """The reference's own pg_regress corpus, end to end in its own
    binary format: load data/contestants.{1,2}.csv into catalog tables
    with storage_format='cstore' (one uncompressed, one pglz — the
    contestant / contestant_compressed pair of sql/query.sql), run the
    reference's query.sql aggregations, and pin the expected/query.out
    values (count 8, avg 2344.375, stddev_samp 433.746119785032, the
    per-country >2200 averages, and the full handle-ordered scan)."""
    from decimal import Decimal

    import pyspark.sql.functions as F

    from cstore_fdw_spark.catalog import CStoreCatalog
    from cstore_fdw_spark.io import copy_from_csv

    ddl = ("handle STRING, birthdate DATE, rating INT, "
           "percentile DOUBLE, country STRING, achievements STRING")
    cat = CStoreCatalog(spark, warehouse=str(tmp_path / "wh"))
    for tbl, comp in (("contestant", "none"),
                      ("contestant_compressed", "pglz")):
        cat.create_table(tbl, ddl, storage_format="cstore",
                         compression=comp)
        for part in ("1", "2"):
            copy_from_csv(cat, tbl,
                          f"/root/reference/data/contestants.{part}.csv")
        t = cat.read(tbl)
        # SELECT count(*) -> 8 (expected/query.out:9)
        assert t.count() == 8
        # SELECT avg(rating), stddev_samp(rating) -> 2344.375,
        # 433.746119785032 (query.out:14-16)
        row = t.agg(
            F.avg(F.col("rating").cast("decimal(12,4)")).alias("a"),
            F.stddev_samp("rating").alias("s")).collect()[0]
        assert row.a == Decimal("2344.37500")
        assert abs(row.s - 433.746119785032) < 1e-9
        # the >2200 per-country averages (query.out:18-26)
        got = {r.country.strip(): float(r.a) for r in
               t.filter("rating > 2200").groupBy("country")
               .agg(F.avg("rating").alias("a")).collect()}
        assert got == {"XA": 2203.0, "XB": 2610.5, "XC": 2236.0,
                       "XD": 3090.0}
        # SELECT * ORDER BY handle (query.out:28-40)
        rows = t.orderBy("handle").collect()
        assert [r.handle for r in rows] == list("abcdefgh")
        assert [r.rating for r in rows] == [2090, 2203, 2907, 2314,
                                            2236, 3090, 1803, 2112]
        assert rows[0].achievements == "{a}"
        assert str(rows[0].birthdate) == "1990-01-10"
        # the pair really differs in on-disk compression
    import os
    sizes = {}
    for tbl in ("contestant", "contestant_compressed"):
        meta = cat._load_meta(tbl)
        dp = cat._data_path(meta)
        sizes[tbl] = sum(os.path.getsize(os.path.join(r, f))
                         for r, _d, fs in os.walk(dp) for f in fs)
    assert sizes["contestant"] > 0 and sizes["contestant_compressed"] > 0


def test_reference_block_filtering_regression_exact():
    """The reference's block_filtering regression, in its own format
    with its own layout (block_row_count=1000, stripe_row_count=2000,
    serial 1..10000): filtered_row_count — rows the residual filter
    removes AFTER skip-list pruning — matches expected/
    block_filtering.source EXACTLY for every locked query, including
    the all-skipped zero-row case and the double-load doubling."""
    import tempfile

    preds = {
        "none": (None, 10000, 0),
        "a<200": (lambda c, lo, hi: lo < 200, 199, 801),
        "a>200": (lambda c, lo, hi: hi > 200, 9800, 200),
        "a<9900": (lambda c, lo, hi: lo < 9900, 9899, 101),
        "a>9900": (lambda c, lo, hi: hi > 9900, 100, 900),
        "a<0": (lambda c, lo, hi: lo < 0, 0, 0),
        "between 1 and 10": (lambda c, lo, hi: hi >= 1 and lo <= 10,
                             10, 990),
        "between 990 and 2010": (lambda c, lo, hi: hi >= 990
                                 and lo <= 2010, 1021, 1979),
        "between -10 and 0": (lambda c, lo, hi: hi >= -10 and lo <= 0,
                              0, 0),
    }

    def qualifies(label, v):
        if label == "none":
            return True
        if label.startswith("between"):
            lo, hi = label.split()[1], label.split()[3]
            return int(lo) <= v <= int(hi)
        op = label[1]
        bound = int(label[2:])
        return v < bound if op == "<" else v > bound

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "bf.cstore")
        rows = [(i,) for i in range(1, 10001)]
        for n_loads in (1, 2):
            write_cstore_file(path, rows * n_loads, ["integer"],
                              stripe_row_count=2000,
                              block_row_count=1000, compression="none")
            for label, (pred, want_rows, want_removed) in preds.items():
                examined = [v[0] for v in read_cstore_file(
                    path, ["integer"], block_pred=pred)]
                returned = [v for v in examined if qualifies(label, v)]
                removed = len(examined) - len(returned)
                assert len(returned) == want_rows * n_loads, label
                assert removed == want_removed * n_loads, (
                    f"{label}: filtered_row_count {removed} != "
                    f"{want_removed * n_loads} (reference "
                    f"expected/block_filtering.source)")


def test_cstore_reader_never_prunes_on_text_collation_hazard(spark,
                                                             tmp_path):
    """A foreign cstore file may carry text min/max computed under a
    NON-C collation (the reference's da_DK regression: 'aa' sorts after
    'z', input/block_filtering.source:62-71) — so the data source must
    never block-skip on string bounds. Craft a file whose text min/max
    are deliberately WRONG for bytewise order; a string filter must
    still return every qualifying row, while an int filter on the same
    read does prune."""
    from cstore_fdw_spark.sources import cstore_format as cf
    from cstore_fdw_spark.sources.cstore_datasource import register_cstore

    register_cstore(spark)
    path = str(tmp_path / "collated")
    os.makedirs(path)
    rows = [(i, "zebra" if i < 500 else "aardvark") for i in range(1000)]
    cf.write_cstore_file(os.path.join(path, "p.cstore"), rows,
                         ["integer", "string"], stripe_row_count=1000,
                         block_row_count=250, compression="none")
    # sabotage the text bounds in-place is unnecessary: it suffices that
    # the reader IGNORES them — assert via a filter whose bytewise
    # bounds WOULD prune block 0 ('zebra' block, min=max='zebra') if
    # string pruning were active
    ddl = "a INT, s STRING"
    df = spark.read.format("cstore").schema(ddl).load(path)
    assert df.filter("s < 'middle'").count() == 500   # all aardvarks
    assert df.filter("s >= 'middle'").count() == 500  # all zebras
    # int pruning still engages (pushed filter retained for col a)
    assert df.filter("a >= 750").count() == 250


def test_cstore_merge_prunes_files_via_skiplist_zone_maps(spark,
                                                          tmp_path):
    """MERGE file pruning on the binary format: the skip-list zone maps
    (file_stats) keep files whose key range cannot overlap the source
    OUT of the join and the rewrite — after a narrow-range upsert, the
    non-overlapping files are bit-identical on disk (mtime AND bytes),
    while the touched range updates correctly."""
    import glob

    import pyspark.sql.functions as F  # noqa: F401

    from cstore_fdw_spark.catalog import CStoreCatalog

    cat = CStoreCatalog(spark, warehouse=str(tmp_path / "wh"))
    cat.create_table("t", "k BIGINT, v STRING", storage_format="cstore",
                     stripe_row_count=1000, block_row_count=1000)
    cat.insert("t", spark.range(0, 500).selectExpr("id as k", "'a' as v"))
    cat.insert("t", spark.range(500, 1000).selectExpr(
        "id as k", "'b' as v"))
    dp = cat._data_path(cat._load_meta("t"))
    before = {f: open(f, "rb").read()
              for f in glob.glob(dp + "/*.cstore")}
    stats = cat.merge_into(
        "t", spark.range(10, 20).selectExpr("id as k", "'UP' as v"),
        on="k")
    assert stats == {"matched": 10, "inserted": 0,
                     "removed_unmatched": 0}
    out = cat.read("t")
    assert out.filter("v = 'UP'").count() == 10
    assert out.count() == 1000
    after = set(glob.glob(dp + "/*.cstore"))
    survivors = set(before) & after
    assert survivors, "pruning rewrote every file"
    for f in survivors:
        assert open(f, "rb").read() == before[f], f


class _SpanFH:
    """File-handle proxy recording every (start, length) read span —
    the instrument behind the projection-pushdown proof."""

    def __init__(self, fh):
        self._fh = fh
        self.spans: list[tuple[int, int]] = []

    def seek(self, pos):
        return self._fh.seek(pos)

    def read(self, n=-1):
        start = self._fh.tell()
        data = self._fh.read(n)
        self.spans.append((start, len(data)))
        return data


def test_cstore_arrow_projection_never_reads_unwanted_columns(tmp_path):
    """A2 parity for the Arrow scan path (the reference's ColumnList,
    cstore_fdw.c:1841-1941 / cstore_reader.c:501-526): a pruned
    projection must never touch an unwanted column's skip list, exists
    buffer, or value buffer — proven by recording every byte span read
    and intersecting with the unwanted columns' sections computed from
    the stripe footer."""
    from cstore_fdw_spark.sources.cstore_format import (
        _parse, read_stripe_batches)

    rows = _sample_rows(2000)
    path = str(tmp_path / "prune.cstore")
    write_cstore_file(path, rows, TYPES, stripe_row_count=1000,
                      block_row_count=250, compression="none")
    _brc, stripes = read_footer(path)
    names = [f"c{i}" for i in range(len(TYPES))]
    positions = [0, 4]  # bigint + double (text c8 stays cold)

    def batches(fh_wrap, pos):
        out = []
        for stripe in stripes:
            out.extend(read_stripe_batches(
                fh_wrap, stripe, [TYPES[p] for p in pos],
                [names[p] for p in pos], positions=pos))
        return out

    with open(path, "rb") as fh:
        full_fh = _SpanFH(fh)
        full = batches(full_fh, list(range(len(TYPES))))
    with open(path, "rb") as fh:
        pruned_fh = _SpanFH(fh)
        pruned = batches(pruned_fh, positions)
    # values identical to the full read's corresponding columns
    import pyarrow as pa
    t_full = pa.Table.from_batches(full)
    t_pruned = pa.Table.from_batches(pruned)
    assert t_pruned.column("c0").to_pylist() == \
        t_full.column("c0").to_pylist()
    assert t_pruned.column("c4").to_pylist() == \
        t_full.column("c4").to_pylist()
    # compute every unwanted column's byte sections from the footers
    forbidden = []
    with open(path, "rb") as fh:
        for offset, skip_len, data_len, footer_len in stripes:
            fh.seek(offset + skip_len + data_len)
            sfooter = _parse(fh.read(footer_len))
            skip_sizes = sfooter.get(1, [])
            exists_sizes = sfooter.get(2, [])
            value_sizes = sfooter.get(3, [])
            run = offset
            skip_spans = []
            for sz in skip_sizes:
                skip_spans.append((run, sz))
                run += sz
            run = offset + skip_len
            data_spans = []
            for c in range(len(skip_sizes)):
                data_spans.append((run, exists_sizes[c] + value_sizes[c]))
                run += exists_sizes[c] + value_sizes[c]
            for c in range(len(skip_sizes)):
                if c not in positions:
                    forbidden.append(skip_spans[c])
                    forbidden.append(data_spans[c])

    def overlaps(span, ranges):
        s, ln = span
        return any(s < fs + fl and fs < s + ln
                   for fs, fl in ranges if fl)

    for span in pruned_fh.spans:
        assert not overlaps(span, forbidden), \
            f"pruned read touched an unwanted column: {span}"
    # and the IO drop is real: 7 of 9 columns (incl. the wide text
    # column) never read
    assert sum(ln for _s, ln in pruned_fh.spans) < \
        0.5 * sum(ln for _s, ln in full_fh.spans)


def test_cstore_writer_streams_stripes(tmp_path):
    """The sink's flush discipline (cstore_writer.c:493): a
    multi-stripe partition writes with at most stripe_row_count rows
    buffered (spied via peak_buffered_rows), and the streamed output is
    byte-identical to the collect-then-write path."""
    import pyarrow as pa

    from cstore_fdw_spark.sources.cstore_datasource import CStoreWriter
    from cstore_fdw_spark.sources.cstore_format import write_cstore_arrow
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType)

    schema = StructType([StructField("a", LongType()),
                         StructField("b", StringType())])
    tbl = pa.table({
        "a": list(range(3500)),
        "b": [None if i % 11 == 0 else f"v{i}" for i in range(3500)]})
    # odd-sized incoming batches so stripe boundaries cross batches
    batches = [b for o, n in
               [(0, 700), (700, 1), (701, 1299), (2000, 1500)]
               for b in tbl.slice(o, n).to_batches()]
    out_dir = str(tmp_path / "sink")
    w = CStoreWriter(schema, {"path": out_dir,
                              "stripe_row_count": "1000",
                              "block_row_count": "300"},
                     overwrite=False)
    w.write(iter(batches))
    assert w.peak_buffered_rows <= 1000
    files = [f for f in os.listdir(out_dir) if f.endswith(".cstore")]
    assert len(files) == 1
    streamed = open(os.path.join(out_dir, files[0]), "rb").read()
    ref_path = str(tmp_path / "ref.cstore")
    write_cstore_arrow(ref_path, tbl, ["bigint", "string"],
                       stripe_row_count=1000, block_row_count=300)
    assert streamed == open(ref_path, "rb").read()
    assert (open(os.path.join(out_dir, files[0]) + ".footer", "rb").read()
            == open(ref_path + ".footer", "rb").read())


def test_catalog_cstore_pruned_read(spark, tmp_path):
    """read(columns=...) on a cstore table decodes only the named
    columns (values identical to the full read), composes with block
    skipping and ADD COLUMN read repair, and rejects unknown names;
    on parquet the same call prunes the scan's ReadSchema."""
    import re

    import pyspark.sql.functions as F

    from cstore_fdw_spark.catalog import CStoreCatalog, CStoreError

    cat = CStoreCatalog(spark, warehouse=str(tmp_path / "wh"))
    cat.create_table(
        "w6", "a BIGINT, b STRING, c DOUBLE, d BIGINT, e DATE, f BOOLEAN",
        storage_format="cstore", stripe_row_count=1000,
        block_row_count=1000)
    df = spark.range(0, 2000).select(
        F.col("id").alias("a"),
        F.concat(F.lit("s"), F.col("id") % 7).alias("b"),
        (F.col("id") * 1.5).alias("c"),
        (F.col("id") * 100).alias("d"),
        F.to_date(F.lit("2024-03-01")).alias("e"),
        (F.col("id") % 2 == 0).alias("f"))
    cat.insert("w6", df)
    pruned = cat.read("w6", columns=["a", "c", "e"])
    assert pruned.columns == ["a", "c", "e"]
    got = {r.a: (r.c, str(r.e)) for r in pruned.collect()}
    assert len(got) == 2000 and got[7] == (10.5, "2024-03-01")
    # pruned + filtered (block skipping under remapped positions)
    flt = cat.read("w6", columns=["a", "d"]).filter("a >= 1995") \
        .orderBy("a").collect()
    assert [(r.a, r.d) for r in flt] == \
        [(i, i * 100) for i in range(1995, 2000)]
    # ADD COLUMN: synthesized default for pruned reads that include it,
    # absent physically (never written)
    cat.add_column("w6", "g", "STRING", default="pg")
    gcol = cat.read("w6", columns=["a", "g"])
    assert gcol.columns == ["a", "g"]
    assert gcol.filter("g = 'pg'").count() == 2000
    # ONLY synthesized columns requested: a physical carrier column
    # keeps row multiplicity (then drops out of the projection)
    only_g = cat.read("w6", columns=["g"])
    assert only_g.columns == ["g"]
    assert only_g.filter("g = 'pg'").count() == 2000
    with pytest.raises(CStoreError, match="do not exist"):
        cat.read("w6", columns=["a", "nope"])
    # parquet: ReadSchema prunes to the requested columns
    cat.create_table("wp", "a BIGINT, b STRING, c DOUBLE")
    cat.insert("wp", spark.range(0, 100).select(
        F.col("id").alias("a"), F.lit("x").alias("b"),
        F.lit(1.0).alias("c")))
    plan = cat.read("wp", columns=["a", "c"]) \
        ._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and set(x.split(":")[0] for x in m.group(1).split(",")) == \
        {"a", "c"}


def test_column_positions_negative_is_rejected(spark, tmp_path):
    """A negative column_positions entry would silently read byte spans
    from the END of the skip/value tables (Python negative indexing) —
    must raise instead."""
    from cstore_fdw_spark.sources.cstore_datasource import (
        register_cstore)
    from cstore_fdw_spark.sources.cstore_format import write_cstore_file

    register_cstore(spark)
    path = str(tmp_path / "neg.cstore")
    write_cstore_file(path, [(1, "a"), (2, "b")],
                      ["integer", "string"])
    df = (spark.read.format("cstore")
          .schema("v INT")
          .option("column_positions", "-1")
          .load(path))
    with pytest.raises(Exception, match="non-negative"):
        df.collect()


def test_arrow_paths_reject_non_spark_fixed_width_kinds():
    """Fixed-width kinds with no Spark type (time/money/uuid/...) get
    the documented loud unsupported-type error on the arrow read path,
    not a bare KeyError."""
    from cstore_fdw_spark.sources.cstore_format import (
        _decode_block_arrow)

    with pytest.raises(ValueError, match="not\\s+Spark-expressible"):
        _decode_block_arrow(b"\x00" * 8, b"\x01", 1, 8, 8, "time")
