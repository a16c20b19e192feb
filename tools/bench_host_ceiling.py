"""Measure the HOST's own concurrency-scaling ceiling.

The north rule's efficiency criterion divides walls measured at two
parallelism levels on one shared box.  A single machine does not
deliver 4x compute at 4x threads: SMT pairing, turbo/frequency
scaling, and the shared memory bus all tax the higher level, so even
an embarrassingly parallel job with ZERO coordination scales below
1.0.  This tool quantifies that tax with pure CPU burn — identical
fixed-size work per process, no shared state, no I/O — at low and
high concurrency; per-process slowdown at the high level IS the
hardware ceiling any Spark-side efficiency number on this host must
be read against.

Usage: python tools/bench_host_ceiling.py [low] [high] [repeats]
Prints one JSON line:
  {"low": N, "high": M, "wall_low": s, "wall_high": s,
   "ceiling": wall_low / wall_high}
ceiling = the efficiency an ideal linearly-scaling job would measure
going from `low`-way to `high`-way parallelism on this host (1.0 =
no contention).
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

BURN = r"""
import hashlib
h = b"x" * 64
for i in range(6_000_000):
    h = hashlib.sha256(h).digest()
print(h[:4].hex())
"""


def run_level(n_procs: int, repeats: int) -> float:
    walls = []
    for _ in range(repeats):
        t0 = time.monotonic()
        procs = [subprocess.Popen([sys.executable, "-c", BURN],
                                  stdout=subprocess.DEVNULL)
                 for _ in range(n_procs)]
        for p in procs:
            if p.wait() != 0:
                raise RuntimeError("burn process failed")
        walls.append(time.monotonic() - t0)
    return min(walls)


def main() -> None:
    low = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    high = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    run_level(low, 1)  # warm the interpreter/page cache
    wall_low = run_level(low, repeats)    # `low` procs, one unit each
    wall_high = run_level(high, repeats)  # `high` procs, one unit each
    # per-process wall at `high`-way concurrency vs `low`-way: an ideal
    # host runs both in the same time (each process has its own core)
    print(json.dumps({
        "low": low, "high": high,
        "wall_low": round(wall_low, 3), "wall_high": round(wall_high, 3),
        "ceiling": round(wall_low / wall_high, 3),
    }))


if __name__ == "__main__":
    main()
