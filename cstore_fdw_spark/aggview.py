"""Incrementally-maintained aggregate views over managed tables.

The reference is append-only (stripes accumulate per COPY/INSERT,
``cstore_writer.c``); this extension exploits exactly that property the
way a lakehouse materialized view does: an aggregate view records the
source's write epoch at every refresh, and the next refresh scans ONLY
the data files committed since (epoch stamps are already the insert
commit protocol — no new bookkeeping), merging mergeable aggregate
state (count/sum/min/max — avg is sum/count at read time) into the
stored per-group rows. At 100 TB this turns a nightly
full-table-group-by into a scan of one day's appends.

Rewrites (compact / DELETE / MERGE / vacuum / overwrite) collapse epoch
history — they raise the source's ``history_floor``, and the view
cannot tell a byte-identical compact from a destructive delete, so any
floor advance past the view's watermark triggers an honest FULL
recompute (same contract as ``read(as_of_epoch)`` refusing vacuumed
snapshots: never silently-wrong rows).

The view itself is an ordinary managed table — readable, SQL-exposable
via ``register_table``, time-travelable — plus one JSON sidecar holding
the spec and the refresh watermark.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import DataFrame, functions as F

from cstore_fdw_spark.catalog import (
    CStoreCatalog, CStoreError, _file_epoch)

SIDECAR = "_cstore_aggview.json"


def _sidecar_path(catalog: CStoreCatalog, view: str) -> str:
    return os.path.join(catalog.table_path(view), SIDECAR)


def _load_spec(catalog: CStoreCatalog, view: str) -> dict[str, Any]:
    try:
        with open(_sidecar_path(catalog, view)) as f:
            return json.load(f)
    except FileNotFoundError:
        raise CStoreError(
            f'"{view}" is not an aggregate view (no {SIDECAR})') from None


def _save_spec(catalog: CStoreCatalog, view: str,
               spec: dict[str, Any]) -> None:
    path = _sidecar_path(catalog, view)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(spec, f)
    os.replace(tmp, path)


def _agg_exprs(measures: list[str]) -> list:
    exprs = [F.count(F.lit(1)).alias("n_rows")]
    for m in measures:
        exprs += [F.sum(m).alias(f"{m}_sum"),
                  F.min(m).alias(f"{m}_min"),
                  F.max(m).alias(f"{m}_max")]
    return exprs


def _merge_exprs(measures: list[str]) -> list:
    """Combine two partial-state row sets: every stored aggregate is
    MERGEABLE (that's the selection criterion), so the merge is the same
    function over the partials."""
    exprs = [F.sum("n_rows").alias("n_rows")]
    for m in measures:
        exprs += [F.sum(f"{m}_sum").alias(f"{m}_sum"),
                  F.min(f"{m}_min").alias(f"{m}_min"),
                  F.max(f"{m}_max").alias(f"{m}_max")]
    return exprs


def _aggregate(df: DataFrame, keys: list[str],
               measures: list[str]) -> DataFrame:
    return df.groupBy(*keys).agg(*_agg_exprs(measures))


def create_agg_view(catalog: CStoreCatalog, view: str, source: str,
                    keys: list[str], measures: list[str]) -> None:
    """Declare an aggregate view: per-``keys`` group, ``n_rows`` plus
    ``{m}_sum/_min/_max`` for each measure. The view starts EMPTY at
    watermark 0 — the first :func:`refresh_agg_view` populates it (and,
    on a fresh source, is already the incremental path)."""
    smeta = catalog._load_meta(source)
    fields = set(smeta.schema().fieldNames())
    for c in keys + measures:
        if c not in fields:
            raise CStoreError(
                f'column "{c}" not in source table "{source}"')
    if not keys or not measures:
        raise CStoreError("agg view needs at least one key and one measure")
    for m in measures:
        dt = smeta.schema()[m].dataType.simpleString()
        if dt not in ("tinyint", "smallint", "int", "bigint",
                      "float", "double"):
            raise CStoreError(
                f'measure "{m}" has non-numeric type {dt}')
    # schema probe: a zero-row plan gives the exact aggregate types
    probe = _aggregate(catalog.read(source), keys, measures)
    catalog.create_table(view, probe.schema)
    _save_spec(catalog, view, {
        "source": source, "keys": keys, "measures": measures,
        "last_epoch": 0, "version": 1})


def refresh_agg_view(catalog: CStoreCatalog, view: str) -> dict[str, Any]:
    """Bring the view up to the source's current epoch. Returns
    ``{"mode": "noop"|"incremental"|"full", "from_epoch", "to_epoch"}``.

    - ``noop``: nothing committed since the watermark.
    - ``incremental``: only data files stamped in
      ``(last_epoch, write_epoch]`` are scanned; their partial
      aggregates merge with the stored state (count/sum via sum,
      min/max via min/max) and the small state table is rewritten.
    - ``full``: the source's ``history_floor`` moved past the watermark
      (some rewrite collapsed history — the epochs the view was built
      from no longer exist as files), so the state recomputes from a
      full scan. Correct for every rewrite kind, including ones that
      changed no data."""
    spec = _load_spec(catalog, view)
    smeta = catalog._load_meta(spec["source"])
    keys, measures = spec["keys"], spec["measures"]
    last = int(spec["last_epoch"])
    cur = smeta.write_epoch
    if smeta.history_floor <= last and cur == last:
        return {"mode": "noop", "from_epoch": last, "to_epoch": cur}
    if smeta.history_floor > last:
        state = _aggregate(catalog.read(spec["source"]), keys, measures)
        mode = "full"
    else:
        delta_files = [p for p in catalog._visible_files(smeta)
                       if _file_epoch(p) > last]
        delta = catalog._read_files(smeta, delta_files)
        partial = _aggregate(delta, keys, measures)
        state = (catalog.read(view).unionByName(partial)
                 .groupBy(*keys).agg(*_merge_exprs(measures)))
        mode = "incremental"
    catalog.insert(view, state, overwrite=True)
    spec["last_epoch"] = cur
    _save_spec(catalog, view, spec)
    return {"mode": mode, "from_epoch": last, "to_epoch": cur}
