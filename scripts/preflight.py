#!/usr/bin/env python
"""Mandatory pre-commit gate for feature commits: run the FULL pytest
suite, then (optionally) the local correctness gate for the queries the
commit touches.

Two of the last three rounds shipped a red test suite from the same
cause — a feature landed at the buzzer without `pytest tests/` being
run. This script makes the gate one command; a feature commit is not
ready until it exits 0.

Usage::

    python scripts/preflight.py                       # full suite only
    python scripts/preflight.py --queries q1 q2 ...   # + oracle-check them
    python scripts/preflight.py --round 9 --all-queries  # + full local gate

Exit status is non-zero if ANY stage fails; stages run in order and stop
at the first failure so the feedback loop stays tight.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(label: str, cmd: list[str]) -> int:
    print(f"\n=== preflight: {label}: {' '.join(cmd)}", flush=True)
    t0 = time.time()
    rc = subprocess.call(cmd, cwd=REPO)
    print(f"=== preflight: {label} {'OK' if rc == 0 else 'FAILED'} "
          f"({time.time() - t0:.0f}s)", flush=True)
    return rc


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", nargs="*",
                    help="registry names to oracle-check via local_gate")
    ap.add_argument("--all-queries", action="store_true",
                    help="run the full local gate (all registered queries)")
    ap.add_argument("--round", type=int, default=99,
                    help="round number for the local-gate artifact name")
    ap.add_argument("--skip-pytest", action="store_true",
                    help="only run the local-gate stage")
    args = ap.parse_args()

    if not args.skip_pytest:
        rc = run("pytest", [sys.executable, "-m", "pytest", "tests/", "-q"])
        if rc != 0:
            return rc

    gate = [sys.executable, "scripts/local_gate.py",
            "--round", str(args.round)]
    if args.all_queries:
        rc = run("local gate (all queries)", gate)
        if rc != 0:
            return rc
    elif args.queries:
        rc = run("local gate (subset)", gate + ["--only", *args.queries])
        if rc != 0:
            return rc

    print("\npreflight GREEN — commit away")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
