"""Operator registry — the engine's declared query surface.

Every operator from SURVEY §2 gets a named entry: a DataFrame builder
``(spark, sf_dir) -> DataFrame`` and (when SQL-expressible) a DuckDB oracle
SQL string computing the same result. The driver's correctness gate runs
both sides at sf0.01 and hash-compares.

Determinism conventions (required for oracle hash-parity):
- Aggregates over doubles go through exact DECIMAL arithmetic
  (``CAST(x AS DECIMAL(12,2))`` inputs, factors as ``DECIMAL(8,4)``), and
  any final cast to DOUBLE goes through ``relational.to_dbl`` on the Spark
  side and ``relational._dbl`` in the oracle SQL — DECIMAL(38,6) plus a
  STRING hop in DuckDB. These are the ONLY sanctioned decimal→double
  paths: precision 38 because DECIMAL(18,6) overflowed on a g1.0
  sum-of-squares, and the VARCHAR hop because DuckDB's native
  decimal→double is double-rounded (integer payload → double, then
  /10^scale) and off by 1 ulp once the unscaled value passes 2^53 —
  both found only by the r13 10×-scale sweep. Do not hand-roll a
  ``DECIMAL(18,4)``-style narrow cast in new operators.
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
    #: plan-shape declaration: this query deliberately plans a
    #: BroadcastNestedLoopJoin whose broadcast side is BOUNDED (a query
    #: set, a centroid table, a 1-row scalar) — never O(corpus). The
    #: plan-audit test (tests/test_pushdown.py::
    #: test_no_unbounded_nested_loop_joins) derives its whitelist from
    #: this flag, so the declaration lives in the same diff that defines
    #: the operator. Flag it in the @register call with a comment naming
    #: the bounded side.
    allow_bnlj: bool = False


REGISTRY: dict[str, QuerySpec] = {}

#: persisted/localCheckpoint'ed intermediates created by the CURRENT
#: builder invocation. Builders return lazy DataFrames, so they can never
#: unpersist their own caches (the caller hasn't run the query yet); left
#: alone, a long-lived session (the driver's 131-query correctness sweep,
#: a 30-execution bench run) accumulates every cached prefix/signature
#: table from every invocation until the JVM heap fills (the round-3
#: BENCH OOM). Instead each builder registers its caches here via
#: :func:`track_cache`, and the NEXT builder invocation releases them —
#: cache residency is bounded at one query's working set. Contract: a
#: builder's returned DataFrame is valid until the next builder runs
#: (every harness — driver gate, bench, local gate, tests — consumes
#: results sequentially).
_BUILD_CACHES: list[DataFrame] = []


def track_cache(df: DataFrame) -> DataFrame:
    """Register a persisted/checkpointed intermediate for deferred release
    at the next builder invocation (or an explicit ``clear_caches``)."""
    _BUILD_CACHES.append(df)
    return df


def release_build_caches() -> None:
    """Unpersist every intermediate tracked since the last release."""
    while _BUILD_CACHES:
        df = _BUILD_CACHES.pop()
        try:
            df.unpersist()
        except Exception:  # noqa: BLE001 — session may already be gone
            pass


def clear_caches(spark: SparkSession) -> None:
    """Session-wide cache hygiene between queries: release tracked builder
    caches, drop table caches, and unpersist any straggler RDD (e.g.
    localCheckpoint blocks). bench.py and scripts/local_gate.py call this
    between queries; after it runs ``getPersistentRDDs()`` is empty."""
    release_build_caches()
    try:
        spark.catalog.clearCache()
    except Exception:  # noqa: BLE001
        pass
    try:
        jrdds = spark.sparkContext._jsc.getPersistentRDDs()
        for _rid, rdd in jrdds.items():  # py4j JavaMap → MutableMapping
            rdd.unpersist()
    except Exception:  # noqa: BLE001
        pass


def scratch_catalog(spark, sf_dir: str, tag: str, build):
    """Deterministic per-(sf_dir, tag) scratch warehouse for registered
    queries that need catalog machinery (projections, histograms) over
    the fixture tables: built ONCE by ``build(catalog)`` and reused
    across gate/bench invocations (a fresh mkdtemp per call leaked one
    orphaned table copy per run — ADVICE r9). A crashed partial build
    (dir present, no marker) is torn down and rebuilt."""
    import hashlib
    import os
    import shutil
    import tempfile

    from cstore_fdw_spark.catalog import CStoreCatalog

    wh = os.path.join(
        tempfile.gettempdir(),
        f"cstore_{tag}_" + hashlib.md5(
            os.path.abspath(sf_dir).encode()).hexdigest()[:12])
    marker = os.path.join(wh, "_built")
    if not os.path.exists(marker):
        shutil.rmtree(wh, ignore_errors=True)
        cat = CStoreCatalog(spark, warehouse=wh)
        # offline-build broadcast budget: the one-time table build can
        # broadcast sides whose subtrees are expensive at build scale
        # (the 60 M-row v1.7 file-set write starved the 300 s
        # interactive default at g10.0) — same offline-path rationale
        # as similarity._cached_codebook; restored after the build
        prev = spark.conf.get("spark.sql.broadcastTimeout", "300")
        try:
            spark.conf.set("spark.sql.broadcastTimeout", "3600")
            build(cat)
        finally:
            spark.conf.set("spark.sql.broadcastTimeout", prev)
        with open(marker, "w") as fh:
            fh.write(os.path.abspath(sf_dir))
        return cat
    return CStoreCatalog(spark, warehouse=wh)


def register(name: str, oracle: str | None = None, category: str = "general",
             bench: bool = False, allow_bnlj: bool = False):
    def deco(fn):
        import functools

        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            release_build_caches()  # previous query's caches die here
            # per-query conf hygiene: a prior builder's fine-coalescing
            # opt-in (session.set_fine_coalescing) must not leak into
            # queries that are faster at the default floor
            from cstore_fdw_spark.session import (
                ADAPTIVE_CONF, CBO_CONF, CBO_JOINREORDER_CONF,
                DEFAULT_MIN_PARTITION_SIZE, EXCLUDED_RULES_CONF,
                MIN_PARTITION_SIZE_CONF)
            try:
                spark.conf.set(MIN_PARTITION_SIZE_CONF,
                               DEFAULT_MIN_PARTITION_SIZE)
                # likewise un-leak a prior builder's static-planning
                # opt-out (session.set_static_planning)
                spark.conf.set(ADAPTIVE_CONF, "true")
                # ... and a prior builder's CBO opt-out (session.set_no_cbo)
                spark.conf.set(CBO_CONF, "true")
                spark.conf.set(CBO_JOINREORDER_CONF, "true")
                # ... and a prior builder's optimizer-rule opt-out
                # (session.set_no_generate_filter_inference)
                spark.conf.unset(EXCLUDED_RULES_CONF)
            except Exception:  # noqa: BLE001 — read-only conf surface
                pass
            return fn(spark, sf_dir)

        REGISTRY[name] = QuerySpec(name, wrapped, oracle, category,
                                   (fn.__doc__ or "").strip(), bench,
                                   allow_bnlj)
        return fn
    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every operator module (each registers its queries)."""
    from cstore_fdw_spark.operators import (  # noqa: F401
        relational, joins, windows, scalars, nested, subqueries, tpch_extra,
        analytics, udfs, dedup, similarity, text, multimodal, jpeg_codec,
        events,
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


def spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition to cluster parallelism — ONLY when the
    plan currently has fewer partitions than cores.

    Spark sizes scan partitions by bytes (maxPartitionBytes), so a small
    file (e.g. the whole documents table in one 600 KB parquet) becomes
    ONE task, and every CPU-heavy per-row projection downstream (char
    n-gram builds, shingling, per-token digests) runs single-threaded.
    The conditional keeps this an explicit small-input fix: at 100 TB a
    scan already has thousands of splits, the predicate is false, and no
    full-corpus shuffle is ever introduced. (Partition count comes from
    the file listing — no data is read.)"""
    n = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < n:
        return df.repartition(n)
    return df
