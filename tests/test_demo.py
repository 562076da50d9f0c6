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
