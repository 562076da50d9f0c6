"""Bounds/determinism checks for the approximate analytics operators."""

from __future__ import annotations

from cstore_fdw_spark.operators import load_all

REGISTRY = load_all()


def test_approx_distinct_within_bound(spark, sf_dir):
    rows = REGISTRY["approx_distinct_sketch"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.approx_in_bounds, r.c_mktsegment


def test_tablesample_deterministic_and_sized(spark, sf_dir):
    df = REGISTRY["tablesample_deterministic"].builder(spark, sf_dir)
    a = sorted(r.o_orderkey for r in df.collect())
    b = sorted(r.o_orderkey for r in
               REGISTRY["tablesample_deterministic"].builder(spark, sf_dir)
               .collect())
    assert a == b, "seeded sample must be reproducible"
    from cstore_fdw_spark.operators import table
    n = table(spark, sf_dir, "orders").count()
    assert 0.05 * n < len(a) < 0.2 * n
