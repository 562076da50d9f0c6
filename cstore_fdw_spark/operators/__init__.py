"""Operator registry — the engine's declared query surface.

Every operator from SURVEY §2 gets a named entry: a DataFrame builder
``(spark, sf_dir) -> DataFrame`` and (when SQL-expressible) a DuckDB oracle
SQL string computing the same result. The driver's correctness gate runs
both sides at sf0.01 and hash-compares.

Determinism conventions (required for oracle hash-parity):
- Aggregates over doubles go through exact DECIMAL arithmetic
  (``CAST(x AS DECIMAL(12,2))`` inputs, factors as ``DECIMAL(8,4)``), and
  any final cast to DOUBLE first narrows to ``DECIMAL(18,4)`` — wide
  decimal→double casts are double-rounded in DuckDB (int128 path) and
  produce 1-ulp mismatches vs Spark's BigDecimal path.
- Rankings/LIMIT always order by a key that is unique (add key columns as
  tie-breakers).
- Collected lists are sorted (``array_sort(collect_list(..))``).
- No raw floating-point aggregate ever appears in an output column.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    category: str
    doc: str = ""
    #: queries worth timing at bench scale
    bench: bool = False


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, category: str = "general",
             bench: bool = False):
    def deco(fn):
        REGISTRY[name] = QuerySpec(name, fn, oracle, category,
                                   (fn.__doc__ or "").strip(), bench)
        return fn
    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every operator module (each registers its queries)."""
    from cstore_fdw_spark.operators import (  # noqa: F401
        relational, joins, windows, scalars, nested, subqueries, tpch_extra,
        analytics, udfs, dedup, similarity, text, multimodal, events,
    )
    return REGISTRY


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # events.parquet stores TIMESTAMP(NANOS), which Spark's vectorized
        # reader rejects; with spark.sql.legacy.parquet.nanosAsLong (set in
        # session.ENGINE_CONFS) it arrives as a long. Truncate to micros
        # with integer division (nanos ~1.7e18 exceed double's 2^53, so no
        # float path) — matching DuckDB's truncating nanos→micros read.
        from pyspark.sql import functions as F
        from pyspark.sql import types as T
        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df
