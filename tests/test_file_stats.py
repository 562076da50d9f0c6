"""Metadata-resident zone maps: merge/delete planning must prune from
``meta.file_stats`` (captured per file at commit time) with ZERO parquet
footer reads — the reference reads all stripe skip data from the single
footer it already has open (cstore_reader.c:164-225,744-806); the analog
here is stats-in-metadata. Legacy metas without stats fall back to
per-file footer reads and self-heal at the next commit."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

import cstore_fdw_spark.catalog as catalog_mod
from cstore_fdw_spark.catalog import (
    _file_stats_from_footer, _stats_decode, _stats_encode)


def _parquet_files(path):
    return sorted(fn for fn in os.listdir(path) if fn.endswith(".parquet"))


def _file_inventory(path):
    out = {}
    for root, _dirs, files in os.walk(path):
        for fn in files:
            p = os.path.join(root, fn)
            st = os.stat(p)
            out[os.path.relpath(p, path)] = (st.st_ino, st.st_size,
                                             st.st_mtime_ns)
    return out


@pytest.fixture
def footer_counter(monkeypatch):
    """Counts every _parquet_minmax call (the legacy footer-read path)."""
    calls = []
    orig = catalog_mod._parquet_minmax

    def counted(path, column):
        calls.append((path, column))
        return orig(path, column)

    monkeypatch.setattr(catalog_mod, "_parquet_minmax", counted)
    return calls


def _three_file_table(spark, catalog, name):
    catalog.create_table(name, "k long, v long")
    for lo in (0, 100, 200):
        catalog.insert(name, spark.range(lo, lo + 100).coalesce(1)
                       .selectExpr("id as k", "id as v"))


def test_merge_prunes_from_metadata_zero_footer_reads(
        spark, catalog, footer_counter):
    """The headline contract: a selective merge plans its file pruning
    entirely from table metadata — no per-file parquet footer reads —
    and untouched files stay byte-identical."""
    _three_file_table(spark, catalog, "zm")
    data = os.path.join(catalog.table_path("zm"), "data")
    before = _file_inventory(data)
    assert len(before) == 3
    footer_counter.clear()

    src = spark.createDataFrame([(150, 99150)], "k long, v long")
    res = catalog.merge_into("zm", src, on="k")

    assert res == {"matched": 1, "inserted": 0, "removed_unmatched": 0}
    assert footer_counter == [], "merge planning read parquet footers"
    after = _file_inventory(data)
    untouched = {r for r in before if after.get(r) == before[r]}
    assert len(untouched) == 2  # [0,99] and [200,299] byte-identical
    assert {(r.k, r.v) for r in catalog.read("zm").collect()} == \
        {(k, k) for k in range(300) if k != 150} | {(150, 99150)}


def test_commit_time_stats_cover_every_file_and_column(spark, catalog):
    _three_file_table(spark, catalog, "zc")
    meta = catalog._load_meta("zc")
    data = os.path.join(catalog.table_path("zc"), "data")
    files = _parquet_files(data)
    assert sorted(meta.file_stats) == files
    ranges = sorted((s["k"][0], s["k"][1])
                    for s in meta.file_stats.values())
    assert ranges == [(0, 99), (100, 199), (200, 299)]
    assert all("v" in s for s in meta.file_stats.values())


def test_legacy_meta_falls_back_to_footers_and_self_heals(
        spark, catalog, footer_counter):
    """A meta written before zone maps existed (file_stats empty) still
    prunes via per-file footer reads; the next commit backfills the
    stats so later merges go metadata-only."""
    _three_file_table(spark, catalog, "zl")
    meta = catalog._load_meta("zl")
    meta.file_stats = {}  # simulate a pre-stats meta
    catalog._save_meta(meta)
    data = os.path.join(catalog.table_path("zl"), "data")
    before = _file_inventory(data)
    footer_counter.clear()

    src = spark.createDataFrame([(150, 99150)], "k long, v long")
    catalog.merge_into("zl", src, on="k")
    assert len(footer_counter) == 3  # legacy path: one read per file
    after = _file_inventory(data)
    assert len({r for r in before if after.get(r) == before[r]}) == 2

    # the merge's own commit reconciled stats for every surviving file
    meta = catalog._load_meta("zl")
    assert sorted(meta.file_stats) == _parquet_files(data)
    footer_counter.clear()
    catalog.merge_into("zl", spark.createDataFrame(
        [(250, 99250)], "k long, v long"), on="k")
    assert footer_counter == []


def test_stats_follow_lifecycle(spark, catalog):
    """compact / delete / vacuum / truncate keep file_stats exactly in
    sync with the visible file population."""
    _three_file_table(spark, catalog, "zf")
    data = os.path.join(catalog.table_path("zf"), "data")

    catalog.delete_where("zf", "k >= 110 and k < 130")
    meta = catalog._load_meta("zf")
    assert sorted(meta.file_stats) == _parquet_files(data)

    catalog.compact("zf")
    meta = catalog._load_meta("zf")
    assert sorted(meta.file_stats) == _parquet_files(data)
    ks = [s["k"] for s in meta.file_stats.values() if "k" in s]
    assert min(lo for lo, _ in ks) == 0 and max(hi for _, hi in ks) == 299

    catalog.truncate("zf")
    assert catalog._load_meta("zf").file_stats == {}


def test_backfilled_key_column_defeats_stale_stats(spark, catalog):
    """DROP + re-ADD of a merge-key column: the physical footer stats
    (and any zone map captured from them) describe bytes the reader no
    longer returns — rows read the re-added column's DEFAULT. Files at
    or below the backfill watermark must stay merge candidates, or a
    matching row would be silently skipped."""
    catalog.create_table("zb", "k long, v long")
    catalog.insert("zb", spark.range(100, 200).coalesce(1)
                   .selectExpr("id as k", "id as v"))
    catalog.insert("zb", spark.range(300, 400).coalesce(1)
                   .selectExpr("id as k", "id as v"))
    catalog.drop_column("zb", "k")
    catalog.add_column("zb", "k", "long", default=5)
    assert [r.k for r in catalog.read("zb").limit(3).collect()] == [5, 5, 5]

    # stale zone maps say k ranges [100,199]/[300,399] — but every row
    # now reads k=5, so a merge on k=5 must match ALL 200 rows
    src = spark.createDataFrame([(5, -1)], "k long, v long")
    res = catalog.merge_into("zb", src, on="k")
    assert res["matched"] == 200
    assert all(r.v == -1 for r in catalog.read("zb").collect())


def test_stats_encode_decode_roundtrip():
    import datetime
    from decimal import Decimal

    vals = [7, -3.5, "abc", True,
            datetime.date(2024, 2, 29),
            datetime.datetime(2024, 2, 29, 12, 30, 15, 123456),
            Decimal("123.456")]
    for v in vals:
        enc = _stats_encode(v)
        assert enc is not None
        got = _stats_decode(enc)
        assert got == v and type(got) is type(v)
    assert _stats_encode(b"bytes") is None  # non-round-trippable: omit


def test_footer_stats_extraction(spark, tmp_path):
    p = str(tmp_path / "one.parquet")
    (spark.range(50)
     .select(F.col("id").alias("a"),
             F.concat(F.lit("s"), F.format_string("%03d", "id")).alias("s"),
             F.struct(F.col("id").alias("x")).alias("nested"))
     .coalesce(1).write.parquet(p))
    f = [os.path.join(p, fn) for fn in os.listdir(p)
         if fn.endswith(".parquet")][0]
    st = _file_stats_from_footer(f)
    assert st["a"] == [0, 49]
    assert st["s"] == ["s000", "s049"]
    assert "nested.x" not in st and "nested" not in st


def test_dropped_column_bytes_never_resurface(spark, catalog):
    """PG semantics: a dropped column's physical bytes are dead. Re-ADD
    without a default reads NULL for pre-drop rows; with a default reads
    the default; rows written after the re-add keep their stored values."""
    catalog.create_table("dr", "k long, v long")
    catalog.insert("dr", spark.createDataFrame(
        [(1, 10), (2, 20)], "k long, v long"))
    catalog.drop_column("dr", "v")
    catalog.add_column("dr", "v", "long")  # no default
    got = {(r.k, r.v) for r in catalog.read("dr").collect()}
    assert got == {(1, None), (2, None)}

    catalog.insert("dr", spark.createDataFrame(
        [(3, 33)], "k long, v long"))
    got = {(r.k, r.v) for r in catalog.read("dr").collect()}
    assert got == {(1, None), (2, None), (3, 33)}

    # compact bakes the projected values and clears the reset epoch
    catalog.compact("dr")
    assert catalog._load_meta("dr").column_reset_epoch == {}
    got = {(r.k, r.v) for r in catalog.read("dr").collect()}
    assert got == {(1, None), (2, None), (3, 33)}


def test_dropped_column_readd_with_default(spark, catalog):
    catalog.create_table("dd", "k long, v long")
    catalog.insert("dd", spark.createDataFrame(
        [(1, 10), (2, 20)], "k long, v long"))
    catalog.drop_column("dd", "v")
    catalog.add_column("dd", "v", "long", default=7)
    got = {(r.k, r.v) for r in catalog.read("dd").collect()}
    assert got == {(1, 7), (2, 7)}
    # an explicit NULL written after the re-add stays NULL
    catalog.insert("dd", spark.createDataFrame(
        [(3, None)], "k long, v long"))
    got = {(r.k, r.v) for r in catalog.read("dd").collect()}
    assert got == {(1, 7), (2, 7), (3, None)}


def test_vacuum_with_active_reset_falls_back_to_rewrite(spark, catalog):
    """Vacuum stamps consolidated files AT the cutoff epoch, which can
    fall under an active column reset — it must take the full-rewrite
    path (baking values and clearing the reset) instead."""
    catalog.create_table("vr", "k long, v long")
    for lo in (0, 100):
        catalog.insert("vr", spark.range(lo, lo + 10).coalesce(1)
                       .selectExpr("id as k", "id as v"))
    catalog.drop_column("vr", "v")
    catalog.add_column("vr", "v", "long", default=-1)
    catalog.insert("vr", spark.createDataFrame(
        [(500, 555)], "k long, v long"))
    catalog.vacuum("vr", keep_epochs=1)
    meta = catalog._load_meta("vr")
    assert meta.column_reset_epoch == {}
    got = {(r.k, r.v) for r in catalog.read("vr").collect()}
    assert got == {(k, -1) for k in range(10)} \
        | {(k, -1) for k in range(100, 110)} | {(500, 555)}


def test_column_minmax_metadata_only(spark, catalog, footer_counter):
    """(min, max) straight from the commit-time zone maps: zero footer
    reads on a stats-complete table, exact values, and an honest None
    whenever metadata could disagree with the reader."""
    _three_file_table(spark, catalog, "cm")
    footer_counter.clear()
    assert catalog.column_minmax("cm", "k") == (0, 299)
    assert catalog.column_minmax("cm", "v") == (0, 299)
    assert footer_counter == []
    with pytest.raises(Exception, match="does not exist"):
        catalog.column_minmax("cm", "nope")

    # active backfill watermark -> None (rows read the default)
    catalog.add_column("cm", "w", "long", default=7)
    assert catalog.column_minmax("cm", "w") is None
    # baked by compact -> metadata answer valid again
    catalog.compact("cm")
    assert catalog.column_minmax("cm", "w") == (7, 7)
    assert catalog.column_minmax("cm", "k") == (0, 299)

    # drop/re-add reset -> None until the next rewrite
    catalog.drop_column("cm", "v")
    catalog.add_column("cm", "v", "long", default=-3)
    assert catalog.column_minmax("cm", "v") is None

    # legacy meta without stats: footer fallback still answers
    meta = catalog._load_meta("cm")
    meta.file_stats = {}
    catalog._save_meta(meta)
    footer_counter.clear()
    assert catalog.column_minmax("cm", "k") == (0, 299)
    assert len(footer_counter) >= 1
