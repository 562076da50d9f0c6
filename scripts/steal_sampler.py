#!/usr/bin/env python
"""Sample /proc/stat steal + idle time at a fixed cadence and append
window summaries to a log file.

The r16 adjudication showed single bench samples on this shared host are
non-evidence (measured 10%+ steal windows with 3x wall-clock swings on
unchanged code); every perf claim must carry the steal level of the
window it was measured in. This makes that sampler a committed tool
instead of an ad-hoc shell loop.

Usage::

    python scripts/steal_sampler.py /tmp/steal.log [interval_sec] &

Each line: ``<unix_ts> steal_pct=<p> idle_pct=<p> load1=<l>``
computed over the preceding interval (default 30 s).
"""

from __future__ import annotations

import sys
import time


def read_stat() -> tuple[int, int, int]:
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(v) for v in parts[1:]]
    # user nice system idle iowait irq softirq steal guest guest_nice
    total = sum(vals[:8])
    idle = vals[3] + vals[4]
    steal = vals[7] if len(vals) > 7 else 0
    return total, idle, steal


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/steal.log"
    interval = float(sys.argv[2]) if len(sys.argv) > 2 else 30.0
    prev = read_stat()
    while True:
        time.sleep(interval)
        cur = read_stat()
        dt = cur[0] - prev[0]
        if dt <= 0:
            prev = cur
            continue
        idle_pct = 100.0 * (cur[1] - prev[1]) / dt
        steal_pct = 100.0 * (cur[2] - prev[2]) / dt
        with open("/proc/loadavg") as f:
            load1 = f.read().split()[0]
        with open(out, "a") as f:
            f.write(f"{time.time():.0f} steal_pct={steal_pct:.1f} "
                    f"idle_pct={idle_pct:.1f} load1={load1}\n")
        prev = cur


if __name__ == "__main__":
    main()
