"""SparkSession factory with the engine's scale-minded defaults.

The reference's tuning surface is four table options
(``filename/compression/stripe_row_count/block_row_count``,
reference ``cstore_fdw.h:26-41``). Our equivalents are Spark/Parquet
configs; everything else (pushdown, pruning, codegen, AQE) is Catalyst.

Designed for a 1000-executor cluster; tested on local[N]. Nothing here is
local-mode specific except the master URL default.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import SparkSession

# Parquet analogs of the reference's stripe/block layout
# (reference cstore_fdw.h:34-35: stripe=150k rows, block=10k rows).
DEFAULT_PAGE_ROW_LIMIT = 10_000        # block analog: page-level stats granularity
DEFAULT_ROW_GROUP_BYTES = 128 * 1024 * 1024  # stripe analog: row-group size

#: AQE reducer-size floor (Spark default). Individual queries opt into a
#: finer floor via :func:`set_fine_coalescing`.
MIN_PARTITION_SIZE_CONF = \
    "spark.sql.adaptive.coalescePartitions.minPartitionSize"
DEFAULT_MIN_PARTITION_SIZE = "1m"
FINE_MIN_PARTITION_SIZE = "256k"

ENGINE_CONFS: dict[str, str] = {
    # --- Adaptive execution: runtime re-planning, skew-join handling,
    # shuffle-partition coalescing. Essential at 100 TB.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # let AQE re-plan (coalesce/broadcast) INSIDE persisted subtrees too:
    # the default pins a cached plan's output partitioning, so every
    # persist() in a pipeline otherwise executes with the full static
    # shuffle-partition count — for the dedup pipelines that meant ~35
    # stages of tiny tasks per query (measured 3-5x slower at sf0.1);
    # at 100 TB the same setting sizes cached partitions to the AQE
    # advisory target instead of the static count.
    "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning": "true",
    # AQE's parallelism-first coalescing floors reducer sizes at
    # minPartitionSize. The session default stays at Spark's 1m: an
    # earlier session-wide 256k floor helped CPU-dense-per-byte stages
    # but taxed every broadcast-heavy query with extra tiny-task
    # scheduling (A/B at sf0.1: q3 1.18 s @ 1m vs 1.46 s @ 256k).
    # Queries that NEED fine coalescing — hash self-joins over 8-byte
    # token digests carrying a few MB but seconds of CPU — opt in per
    # query via :func:`set_fine_coalescing` (see the PPJoin pipeline);
    # the operator registry resets this conf to the default before each
    # build so the override never leaks across queries.
    "spark.sql.adaptive.coalescePartitions.minPartitionSize":
        DEFAULT_MIN_PARTITION_SIZE,
    # --- Columnar scan: pushdown + pruning (zone-map parity, SURVEY §4).
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    "spark.sql.parquet.recordLevelFilter.enabled": "false",
    # --- Writer: page rows ≈ reference block_row_count so page-level
    # statistics give the same skipping granularity.
    "spark.hadoop.parquet.page.row.count.limit": str(DEFAULT_PAGE_ROW_LIMIT),
    "spark.hadoop.parquet.block.size": str(DEFAULT_ROW_GROUP_BYTES),
    "spark.sql.parquet.compression.codec": "zstd",
    # --- Arrow for any pandas-UDF path (the sanctioned Python escape hatch).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # --- Deterministic semantics for oracle comparison.
    "spark.sql.session.timeZone": "UTC",
    # events.parquet carries TIMESTAMP(NANOS); read as long + convert
    # (operators.table) instead of failing the scan.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Python data source filter pushdown (the cstore-format source uses
    # pushed range/equality filters for skip-list block skipping)
    "spark.sql.python.filterPushdown.enabled": "true",
    # parquet TIMESTAMP(isAdjustedToUTC=false) reads as plain TIMESTAMP,
    # not TIMESTAMP_NTZ (Spark 3.4+ default infers NTZ, on which the
    # engine's unix_micros/interval arithmetic is ill-typed). With the
    # UTC session timezone the instant semantics match DuckDB's naive
    # read bit-for-bit — same contract the nanos path provides.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    # ANSI off: the engine mirrors permissive PostgreSQL-executor behavior
    # for arithmetic edge cases; DuckDB oracle queries are written to agree.
    "spark.sql.ansi.enabled": "false",
    # --- Cost-based optimization (reference delegates costing to PG's
    # planner; Catalyst CBO + ANALYZE is our equivalent, SURVEY §4).
    # These confs bind to SESSION-CATALOG tables with collected stats:
    # CStoreCatalog.register_table() + analyze() runs the real `ANALYZE
    # TABLE … FOR ALL COLUMNS` (plan test: test_catalog.py asserts a
    # stats-driven broadcast decision). Bare-path reads (the benchmark
    # queries) are costed by file size + AQE runtime stats instead.
    "spark.sql.cbo.enabled": "true",
    "spark.sql.cbo.joinReorder.enabled": "true",
    # --- Maintain stripe-like bounded files on write.
    "spark.sql.files.maxRecordsPerFile": "5000000",
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32"),
}


def get_spark(app_name: str = "cstore_fdw_spark", master: str | None = None,
              extra_confs: dict[str, str] | None = None) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` when no cluster
    manager is configured; on a real cluster, pass ``None`` with
    ``--master`` supplied externally and this just applies confs.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_MASTER" not in os.environ:
        master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)
    # In local[N] ONE JVM holds the driver, every executor thread, and
    # every cached block; the JVM-ergonomics default heap (~1/4 of RAM)
    # is memory-marginal for a 32-thread run (round-3 bench OOM'd there
    # — from unbounded cache accumulation, since fixed by track_cache).
    # 16g is deliberate: with caches bounded to one query's working set
    # the bench peaks far below it, and a LARGER heap measurably hurts —
    # at 64g G1's young generation grows to tens of GB and one allocation
    # burst per bench run ate a multi-second collection pause (observed
    # as a random query 3-4x over its steady-state time). Set before JVM
    # launch (PySpark passes builder confs to spark-submit at gateway
    # start); env-overridable for bigger scale factors. On a real
    # cluster spark-submit's own --driver-memory wins.
    builder = builder.config(
        "spark.driver.memory",
        os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    for k, v in ENGINE_CONFS.items():
        builder = builder.config(k, v)
    for k, v in (extra_confs or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    ship_package(spark)
    return spark


def ship_package(spark: SparkSession) -> None:
    """Make ``cstore_fdw_spark`` importable on executors' Python workers.

    The driver process may run from any cwd; Pandas-UDF closures reference
    this package by module name, so workers need it on their path. A zip of
    the package is shipped once per session via ``addPyFile`` (works on
    local and cluster mode alike).
    """
    if getattr(spark, "_cstore_pkg_shipped", False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_base = os.path.join(tempfile.gettempdir(),
                            f"cstore_fdw_spark_pkg_{os.getpid()}")
    zip_path = zip_base + ".zip"
    if not os.path.exists(zip_path):
        shutil.make_archive(zip_base, "zip",
                            root_dir=os.path.dirname(pkg_dir),
                            base_dir=os.path.basename(pkg_dir))
    spark.sparkContext.addPyFile(zip_path)
    spark._cstore_pkg_shipped = True  # type: ignore[attr-defined]


def apply_engine_confs(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine confs to an externally-created session.

    The driver hands us its own SparkSession; static confs (codegen, arrow)
    can't change post-start, but the semantic ones (timezone, ANSI,
    pushdown) can and must.
    """
    for k, v in ENGINE_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on a live session — builder default applies
    ship_package(spark)
    return spark


def set_fine_coalescing(spark: SparkSession) -> None:
    """Opt THIS query into a fine AQE reducer-size floor (256k).

    For CPU-dense-per-byte shuffle stages — hash self-joins and window
    ranks over 8-byte token digests that carry a few MB at sf0.1 but
    seconds of CPU — the default 1m floor coalesces to ~6 reducers on 32
    cores; 256k restores full width (measured 2x on the PPJoin token
    pipeline). Broadcast-heavy queries are FASTER at the default floor
    (q3: 1.18 s vs 1.46 s), so this is per-query, not session-wide: the
    operator registry resets the conf to DEFAULT_MIN_PARTITION_SIZE
    before every build, and pipelines that want the fine floor call this
    at build time. At 100 TB both floors are no-ops — reducers are sized
    by bytes/parallelism, far above either value."""
    spark.conf.set(MIN_PARTITION_SIZE_CONF, FINE_MIN_PARTITION_SIZE)


ADAPTIVE_CONF = "spark.sql.adaptive.enabled"

CBO_CONF = "spark.sql.cbo.enabled"
CBO_JOINREORDER_CONF = "spark.sql.cbo.joinReorder.enabled"


def set_no_cbo(spark: SparkSession) -> None:
    """Opt THIS query out of cost-based-optimizer stats derivation.

    CBO exists for session-catalog tables with collected ANALYZE stats
    (catalog.py); bare-path parquet reads have none, so for them the
    CBO stats visitor is pure driver overhead — and AQE re-runs the
    optimizer at every stage boundary, so a plan that is cheap to
    EXECUTE can still pay seconds of driver time being re-costed. Only
    measurably hot on plans with very wide expression trees over many
    mini-stages (the HLL finisher's 1024-register grid + literal ln
    table: interleaved min-of-3 A/B at sf0.1 measured 2.93 s with CBO
    vs 1.77 s without; every other bench query was within noise, so
    this stays per-query, not session-wide). The operator registry
    restores both confs before every build, so the opt-out never
    leaks — catalog-stats queries keep the CBO default."""
    spark.conf.set(CBO_CONF, "false")
    spark.conf.set(CBO_JOINREORDER_CONF, "false")


EXCLUDED_RULES_CONF = "spark.sql.optimizer.excludedRules"

_INFER_FROM_GENERATE_RULE = (
    "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")


def set_no_generate_filter_inference(spark: SparkSession) -> None:
    """Opt THIS query out of ``InferFiltersFromGenerate``.

    The rule adds ``size(e) > 0 AND isnotnull(e)`` below every explode so
    rows that would generate nothing are dropped before they shuffle —
    the right trade when ``e`` is a stored column. When ``e`` is an
    EXPENSIVE DERIVED expression (the MinHash pipelines explode the
    word-shingle array built by split+transform+array_distinct), filter
    pushdown then carries that whole expression through the spread()
    exchange down to the parquet scan: the complete shingle build runs
    once per scanned row inside the scan's few splits (single-threaded
    on a small file, and ALWAYS at scan rather than cluster parallelism)
    and then AGAIN post-exchange for the projection itself — the same
    single-threaded-scan defect measured at 22 s vs 1.1 s on the route
    tier's gram build (r16, g1.0), which the r17 inherited commit
    removed for the route tier by filtering above the persist but could
    not remove here because the inference re-creates the filter from the
    explode itself. Excluding the rule is semantics-free (the filter it
    infers is redundant — explode already emits nothing for empty
    arrays); what is lost is only shuffling the rare zero-shingle doc's
    (doc_id, text) row once, and what is gained is evaluating the
    shingle build exactly once per row at full parallelism. Like the
    other per-query opt-outs, the operator registry restores the conf
    before every build, so queries that explode stored columns keep the
    inference."""
    spark.conf.set(EXCLUDED_RULES_CONF, _INFER_FROM_GENERATE_RULE)


def set_static_planning(spark: SparkSession) -> None:
    """Opt THIS query out of adaptive execution.

    AQE materializes every exchange as its own job to re-plan on real
    sizes — exactly right for corpus-sized shuffles, pure sequential
    overhead for pipelines made of DOZENS of bounded mini-stages
    (trainer chains, one-row codebook aggregates, per-query probe
    tables): the IVFADC pipeline spends more wall time on AQE job
    barriers than on data (A/B at sf0.1: ~9 s static vs ~12-18 s
    adaptive). Safe here because the pipeline's only corpus-sized
    shuffles are hash-partitioned by vec_id (near-uniform — no skew
    for AQE to fix) and every join side is an explicit broadcast()
    (no plan for AQE to switch). Like the fine-coalescing floor, this
    is per-query: the operator registry restores adaptive execution
    before every build, so the opt-out never leaks."""
    spark.conf.set(ADAPTIVE_CONF, "false")
