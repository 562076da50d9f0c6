#!/usr/bin/env python
"""Pin pagerank's per-iteration slope attribution with SPILL COUNTERS
(VERDICT r15 task 3).

SCALE_r15.json measured the per-iteration term at alpha 1.30 across
g3.0->g10.0 and ATTRIBUTED it to the 120 M-row cached edge frame
partially outgrowing the storage fraction — by reasoning, not by a
metric. This script reads the actual evidence: for each scale it runs
``pagerank_fixed_point(iters=10)`` and sums every stage's
``memoryBytesSpilled`` / ``diskBytesSpilled`` from the Spark UI REST
API (diffed across the run, so concurrent history doesn't pollute),
alongside the RDD storage numbers for the cached graph
(memoryUsed / diskUsed from /storage/rdd — disk > 0 IS the cache
overflowing its storage fraction).

Two arms per scale:

  deser   the operator's default — Spark's deserialized
          MEMORY_AND_DISK columnar cache
  ser     StorageLevel.MEMORY_AND_DISK (serialized batches): smaller
          footprint, per-iteration CPU to deserialize — the mitigation
          arm the verdict asked to measure IF spill is confirmed

Usage::

    python scripts/pagerank_spill.py --dirs testdata_scale/g3.0,\
testdata_scale/g10.0 --runs 2 --out PAGERANK_SPILL_r16.json
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel  # noqa: E402

from cstore_fdw_spark.operators import clear_caches, load_all  # noqa: E402
from cstore_fdw_spark.session import get_spark  # noqa: E402


def _api(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}{path}",
                                timeout=30) as r:
        return json.load(r)


def spill_totals(spark) -> tuple[int, int]:
    mem = disk = 0
    for st in _api(spark, "/stages?status=complete"):
        mem += st.get("memoryBytesSpilled", 0)
        disk += st.get("diskBytesSpilled", 0)
    return mem, disk


def rdd_storage(spark) -> list[dict]:
    out = []
    for r in _api(spark, "/storage/rdd"):
        out.append({"name": (r.get("name") or "")[:80],
                    "memoryUsed": r.get("memoryUsed", 0),
                    "diskUsed": r.get("diskUsed", 0),
                    "numCachedPartitions": r.get("numCachedPartitions", 0)})
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ap.add_argument("--dirs", default=",".join(
        os.path.join(repo, "testdata_scale", g) for g in ("g3.0", "g10.0")))
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    spark = get_spark(app_name="pagerank-spill")
    spark.sparkContext.setLogLevel("ERROR")
    load_all()
    from cstore_fdw_spark.operators.analytics import pagerank_fixed_point

    arms = {"deser": None, "ser": StorageLevel.MEMORY_AND_DISK}
    out: dict[str, dict] = {}
    for d in args.dirs.split(","):
        label = os.path.basename(d.rstrip("/"))
        out[label] = {}
        spark.read.parquet(f"{d}/lineitem.parquet").limit(1).count()
        for arm, lvl in arms.items():
            best = None
            rec = None
            for _ in range(args.runs):
                clear_caches(spark)
                m0, d0 = spill_totals(spark)
                t0 = time.perf_counter()
                df = pagerank_fixed_point(spark, d, args.iters,
                                          cache_level=lvl)
                # storage read happens BEFORE clear_caches drops the
                # graph frame; the noop write has materialized it
                df.write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                storage = rdd_storage(spark)
                m1, d1 = spill_totals(spark)
                r = {"sec": round(dt, 3),
                     "memoryBytesSpilled": m1 - m0,
                     "diskBytesSpilled": d1 - d0,
                     "cached_rdds": storage}
                print(f"# {label}/{arm}: {r['sec']}s "
                      f"memSpill={r['memoryBytesSpilled']/1e9:.2f}GB "
                      f"diskSpill={r['diskBytesSpilled']/1e9:.2f}GB "
                      f"cacheDisk={sum(s['diskUsed'] for s in storage)/1e9:.2f}GB",
                      file=sys.stderr, flush=True)
                if best is None or dt < best:
                    best, rec = dt, r
            out[label][arm] = rec
    payload = {"_meta": {
        "purpose": "VERDICT r15 task 3: pagerank per-iteration alpha "
                   "1.30 attribution — stage spill totals (REST API, "
                   "diffed per run) + cached-RDD disk overflow at "
                   f"iters={args.iters}; 'ser' arm = "
                   "StorageLevel.MEMORY_AND_DISK (serialized batches) "
                   "vs the default deserialized cache",
        "iters": args.iters, "runs_per_arm": args.runs,
        "kept_run": "fastest (its counters)"},
        "arms": out}
    print(json.dumps(payload, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(payload, f, indent=1)


if __name__ == "__main__":
    main()
