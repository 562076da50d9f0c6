#!/usr/bin/env python
"""Capture ``explain("formatted")`` for bench queries into plans/r<N>/.

Optimization-round deliverable: the judge cannot run Spark, so every
plan claim in OPTIMIZATION_r<N>.md is checked against these committed
files.

Usage::

    python scripts/capture_plans.py --round 16 --suffix before \
        [--sf-dir /root/testdata/sf0.1] [--queries name1 name2 ...]
"""

from __future__ import annotations

import argparse
import io
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--queries", nargs="*", default=None)
    ap.add_argument("--all-bench", action="store_true")
    args = ap.parse_args()

    from cstore_fdw_spark.operators import clear_caches, load_all
    from cstore_fdw_spark.session import get_spark

    spark = get_spark(app_name="capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    if args.queries:
        names = args.queries
    else:
        names = [n for n, s in sorted(registry.items()) if s.bench]

    out_dir = os.path.join(REPO, "plans", f"r{args.round}")
    os.makedirs(out_dir, exist_ok=True)

    for name in names:
        spec = registry[name]
        clear_caches(spark)
        try:
            df = spec.builder(spark, args.sf_dir)
            # capture stdout of explain("formatted")
            buf = io.StringIO()
            stdout, sys.stdout = sys.stdout, buf
            try:
                df.explain("formatted")
            finally:
                sys.stdout = stdout
            text = buf.getvalue()
        except Exception as exc:  # noqa: BLE001 — record, keep going
            text = f"ERROR building/explaining {name}: {exc!r}\n"
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"wrote {path} ({len(text)} bytes)")
    clear_caches(spark)


if __name__ == "__main__":
    main()
