#!/usr/bin/env python
"""Time ONE registered query with the bench's exact methodology
(noop sink, clear_caches between runs, N runs, run 1 = cold) and print
a JSON line — the per-query A/B arm used by interleaved optimization
measurements.

Usage::

    python scripts/single_query_bench.py QUERY [--runs 4]
        [--sf-dir /root/testdata/sf0.1]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("--runs", type=int, default=4)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from cstore_fdw_spark.operators import clear_caches, load_all
    from cstore_fdw_spark.session import get_spark

    spark = get_spark(app_name=f"sqb-{args.query}")
    spark.sparkContext.setLogLevel("ERROR")
    spec = load_all()[args.query]
    spark.read.parquet(f"{args.sf_dir}/lineitem.parquet").limit(1).count()
    runs = []
    for _ in range(args.runs):
        clear_caches(spark)
        t0 = time.perf_counter()
        df = spec.builder(spark, args.sf_dir)
        df.write.format("noop").mode("overwrite").save()
        runs.append(round(time.perf_counter() - t0, 3))
    print(json.dumps({
        "query": args.query, "runs": runs, "cold": runs[0],
        "warm_min": min(runs[1:]) if len(runs) > 1 else None,
        "repo": REPO}))


if __name__ == "__main__":
    main()
