"""The reference README demo workflow must run end-to-end (examples/)."""

from __future__ import annotations

import importlib.util
import os


def test_reference_demo_end_to_end(spark):
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples", "reference_demo.py")
    spec = importlib.util.spec_from_file_location("reference_demo", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = mod.main()
    assert out["rows"] == 40_000
    assert out["dune_reviews_1998"] > 0
    assert out["table_size_bytes"] > 0
    assert all(1.0 <= avg <= 5.0 for _b, avg, _n in out["buckets"])
    assert sum(n for _b, _avg, n in out["buckets"]) == 40_000


def test_driver_contract_registry_integrity():
    """Fast (no-Spark-action) lock on the driver contract: every
    registered query has a DuckDB oracle (zero rows-only entries — the
    stronger gate), oracle keys never dangle, and the registry only
    grows with names sorting AFTER 'group_having' so the driver's
    first-50-alphabetical correctness window stays stable."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry_mod", "__spark_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    qs, oracles = m.queries(), m.oracle_sql()
    assert len(qs) >= 172
    assert set(oracles) == set(qs), (
        set(oracles) ^ set(qs))  # every query oracle-checked, none dangle
    window = sorted(qs)[:50]
    assert window[0] == "agg_salted_hot_key"
    assert window[-1] == "group_having", (
        "a new query name sorted into the driver's first-50 window and "
        f"displaced group_having: window now ends at {window[-1]!r}")
