"""Driver contract for the spark-graft builder (PySpark target).

The engine lives in ``cstore_fdw_spark``; every implemented operator from
SURVEY.md §2 is registered in ``cstore_fdw_spark.operators.REGISTRY`` with
a DataFrame builder and (when SQL-expressible) a DuckDB oracle.  This
module just exposes that registry in the driver's shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cstore_fdw_spark.operators import load_all  # noqa: E402
from cstore_fdw_spark.session import apply_engine_confs  # noqa: E402

_REGISTRY = load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on /root/testdata/sf0.001."""
    apply_engine_confs(spark)
    return _REGISTRY["q1_pricing_summary"].builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, spec in sorted(_REGISTRY.items()):
        def make(s=spec):
            def run(spark: SparkSession, sf_dir: str) -> DataFrame:
                apply_engine_confs(spark)
                return s.builder(spark, sf_dir)
            return run
        out[name] = make()
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each query (omitted → rows-only check)."""
    return {name: spec.oracle for name, spec in sorted(_REGISTRY.items())
            if spec.oracle}
