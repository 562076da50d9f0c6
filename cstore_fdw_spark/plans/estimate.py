"""Histogram-driven plan estimates: the engine's CBO hook.

The reference's single planner contribution is a selectivity-based row
estimate fed to PostgreSQL's costing (``cstore_fdw.c:1628-1638`` —
``clauselist_selectivity`` × ``baserestrictcost`` over the raw tuple
count). This module is the Spark-side consumer of the analog statistics
this engine already collects (``CStoreCatalog.analyze_histograms`` —
equi-depth bounds persisted in table metadata): it turns a range
predicate into an estimated row count and BYTE size, and uses that to
make the one physical-plan decision Spark leaves to the caller — whether
a filtered dimension is small enough to broadcast.

Estimates never gate correctness: a wrong histogram yields a slower
join, never a wrong answer (Spark executes whichever join it plans).
At 100 TB this decision is the difference between shipping a few MB of
filtered dimension to every executor and shuffling the entire fact
table on the join key.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, functions as F

#: Spark's own default for spark.sql.autoBroadcastJoinThreshold
DEFAULT_BROADCAST_THRESHOLD = 10 * 1024 * 1024


def explain_estimate(catalog, name: str, column: str,
                     lo: float | None = None, hi: float | None = None,
                     broadcast_threshold: int = DEFAULT_BROADCAST_THRESHOLD,
                     ) -> dict[str, Any] | None:
    """Cost sketch for ``lo <= column < hi`` on table ``name`` from the
    persisted equi-depth histogram: estimated rows, selectivity,
    estimated post-filter bytes (rows × on-disk avg row width — a
    deliberate UNDER-estimate of in-memory width, matching Spark's own
    use of file sizes for broadcast decisions), and the resulting
    broadcast-vs-shuffle recommendation. Returns None when the table was
    never ``analyze_histograms``'d — an honest "no statistics", never a
    guess (the reference likewise falls back to PostgreSQL's default
    selectivity when ANALYZE hasn't run)."""
    est = catalog.estimate_rows(name, column, lo, hi)
    if est is None:
        return None
    total = max(int(catalog.row_count(name)), 1)
    row_bytes = catalog.table_size(name) / total
    est_bytes = int(est * row_bytes)
    return {
        "table": name, "column": column, "lo": lo, "hi": hi,
        "estimated_rows": est, "total_rows": total,
        "selectivity": est / total,
        "estimated_bytes": est_bytes,
        "broadcast_threshold": broadcast_threshold,
        "strategy": ("broadcast" if est_bytes <= broadcast_threshold
                     else "shuffle"),
    }


def join_by_estimate(catalog, fact: DataFrame, dim_name: str, on: list[str],
                     column: str, lo: float | None = None,
                     hi: float | None = None,
                     broadcast_threshold: int = DEFAULT_BROADCAST_THRESHOLD,
                     ) -> DataFrame:
    """The demo consumer: join ``fact`` against the ``[lo, hi)``-filtered
    dimension, broadcasting the dim side iff the HISTOGRAM estimate says
    its filtered size fits under ``broadcast_threshold``.

    Why the estimate matters: Spark's static size check sees the dim's
    FULL file size — a selective filter on a huge dimension looks
    too-big-to-broadcast until runtime (AQE can recover, but only after
    the first shuffle map stage already ran). The histogram knows the
    post-filter cardinality BEFORE execution, the same pre-execution
    stats role as the reference's selectivity estimate
    (cstore_fdw.c:1628-1638). With no histogram, falls back to Spark's
    own planning — never guesses."""
    dim = catalog.read(dim_name)
    if lo is not None:
        dim = dim.filter(F.col(column) >= lo)
    if hi is not None:
        dim = dim.filter(F.col(column) < hi)
    est = explain_estimate(catalog, dim_name, column, lo, hi,
                           broadcast_threshold)
    if est is not None and est["strategy"] == "broadcast":
        dim = F.broadcast(dim)
    return fact.join(dim, on)
