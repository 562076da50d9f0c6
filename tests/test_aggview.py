"""Incremental aggregate views: refreshes scan only the epochs since the
watermark, merge bit-exactly with stored state, and fall back to a full
recompute whenever the source's history collapses (rewrites)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import cstore_fdw_spark.catalog as catalog_mod
from cstore_fdw_spark.aggview import create_agg_view, refresh_agg_view
from cstore_fdw_spark.catalog import CStoreError


def _full(spark, catalog, source, keys, measures):
    df = catalog.read(source).groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[e for m in measures for e in
          (F.sum(m).alias(f"{m}_sum"), F.min(m).alias(f"{m}_min"),
           F.max(m).alias(f"{m}_max"))])
    return sorted(tuple(r) for r in df.collect())


def _view(catalog):
    return sorted(tuple(r) for r in catalog.read("v").collect())


def test_incremental_refresh_matches_full_recompute(spark, catalog):
    catalog.create_table("src", "g string, x long, y double")
    create_agg_view(catalog, "v", "src", keys=["g"], measures=["x", "y"])

    def batch(rows):
        catalog.insert("src", spark.createDataFrame(
            rows, "g string, x long, y double"))

    batch([("a", 1, 0.5), ("a", 3, 1.5), ("b", 10, -2.0)])
    r = refresh_agg_view(catalog, "v")
    assert r["mode"] == "incremental" and r["to_epoch"] == 1
    assert _view(catalog) == _full(spark, catalog, "src", ["g"], ["x", "y"])

    # second batch: new group + updates to both existing groups
    batch([("a", 7, 9.0), ("b", -1, 4.0), ("c", 100, 0.0)])
    r = refresh_agg_view(catalog, "v")
    assert r == {"mode": "incremental", "from_epoch": 1, "to_epoch": 2}
    assert _view(catalog) == _full(spark, catalog, "src", ["g"], ["x", "y"])

    # no new commits -> noop, state untouched
    before = _view(catalog)
    assert refresh_agg_view(catalog, "v")["mode"] == "noop"
    assert _view(catalog) == before


def test_incremental_reads_only_delta_files(spark, catalog, monkeypatch):
    """The incremental path must hand _read_files ONLY the files stamped
    after the watermark — the 100 TB contract."""
    catalog.create_table("src", "g string, x long")
    create_agg_view(catalog, "v", "src", keys=["g"], measures=["x"])
    for i in range(3):
        catalog.insert("src", spark.createDataFrame(
            [("a", i), ("b", 10 * i)], "g string, x long"))
    refresh_agg_view(catalog, "v")  # watermark -> 3

    seen: list[list[str]] = []
    orig = catalog_mod.CStoreCatalog._read_files

    def spy(self, meta, paths):
        seen.append(sorted(paths))
        return orig(self, meta, paths)

    monkeypatch.setattr(catalog_mod.CStoreCatalog, "_read_files", spy)
    catalog.insert("src", spark.createDataFrame(
        [("a", 999)], "g string, x long"))
    r = refresh_agg_view(catalog, "v")
    assert r["mode"] == "incremental"
    delta_reads = [ps for ps in seen
                   if ps and all("/src/" in p for p in ps)]
    assert delta_reads and all(
        all("e000000000004-" in p for p in ps) for ps in delta_reads)
    assert _view(catalog) == _full(spark, catalog, "src", ["g"], ["x"])


def test_rewrite_forces_full_recompute(spark, catalog):
    catalog.create_table("src", "g string, x long")
    create_agg_view(catalog, "v", "src", keys=["g"], measures=["x"])
    catalog.insert("src", spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 5)], "g string, x long"))
    refresh_agg_view(catalog, "v")

    catalog.delete_where("src", "x = 2")  # history collapses
    r = refresh_agg_view(catalog, "v")
    assert r["mode"] == "full"
    assert _view(catalog) == _full(spark, catalog, "src", ["g"], ["x"])
    assert {(t[0], t[1]) for t in _view(catalog)} == {("a", 1), ("b", 1)}

    # compact also moves the floor: full again, values unchanged
    catalog.insert("src", spark.createDataFrame(
        [("c", 9)], "g string, x long"))
    catalog.compact("src")
    r = refresh_agg_view(catalog, "v")
    assert r["mode"] == "full"
    assert _view(catalog) == _full(spark, catalog, "src", ["g"], ["x"])


def test_agg_view_validation(spark, catalog):
    catalog.create_table("src", "g string, x long")
    with pytest.raises(CStoreError, match="not in source"):
        create_agg_view(catalog, "v", "src", ["g"], ["nope"])
    with pytest.raises(CStoreError, match="at least one"):
        create_agg_view(catalog, "v", "src", [], ["x"])
    with pytest.raises(CStoreError, match="non-numeric"):
        create_agg_view(catalog, "v", "src", ["x"], ["g"])
    with pytest.raises(CStoreError, match="not an aggregate view"):
        catalog.create_table("plain", "a int")
        refresh_agg_view(catalog, "plain")


def test_agg_view_survives_source_schema_evolution(spark, catalog):
    """Backfill defaults flow through the delta read: a measure column
    added with a default aggregates the values the READER returns."""
    catalog.create_table("src", "g string, x long")
    catalog.insert("src", spark.createDataFrame(
        [("a", 1)], "g string, x long"))
    catalog.add_column("src", "w", "long", default=5)
    create_agg_view(catalog, "v", "src", ["g"], ["w"])
    catalog.insert("src", spark.createDataFrame(
        [("a", 2, 7)], "g string, x long, w long"))
    refresh_agg_view(catalog, "v")
    assert _view(catalog) == _full(spark, catalog, "src", ["g"], ["w"])
    [(g, n, s, mn, mx)] = _view(catalog)
    assert (g, n, s, mn, mx) == ("a", 2, 12, 5, 7)
