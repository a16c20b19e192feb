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

Usage: python tools/bench_host_ceiling.py [low] [high] [repeats] [mode]
mode = "cpu" (default: sha256 burn, core-local, catches SMT/turbo) or
"mem" (large-array streaming, catches the shared memory bus — the
roofline that shuffle-heavy stages actually hit).
Prints one JSON line:
  {"mode": ..., "low": N, "high": M, "wall_low": s, "wall_high": s,
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

# streaming over an array far beyond L3: every pass reads+writes the
# whole buffer through the shared bus — the shuffle-write/read analog
MEM_BURN = r"""
import numpy as np
a = np.arange(60_000_000, dtype=np.int64)  # ~480 MB
s = 0
for _ in range(12):
    a += 1
    s += int(a[::4_096].sum())
print(s % 97)
"""


def run_level(n_procs: int, repeats: int, burn: str = BURN) -> float:
    walls = []
    for _ in range(repeats):
        t0 = time.monotonic()
        procs = [subprocess.Popen([sys.executable, "-c", burn],
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
    mode = sys.argv[4] if len(sys.argv) > 4 else "cpu"
    burn = {"cpu": BURN, "mem": MEM_BURN}[mode]

    run_level(low, 1, burn)  # warm the interpreter/page cache
    wall_low = run_level(low, repeats, burn)    # one unit per proc
    wall_high = run_level(high, repeats, burn)  # one unit per proc
    # per-process wall at `high`-way concurrency vs `low`-way: an ideal
    # host runs both in the same time (each process has its own core)
    print(json.dumps({
        "mode": mode, "low": low, "high": high,
        "wall_low": round(wall_low, 3), "wall_high": round(wall_high, 3),
        "ceiling": round(wall_low / wall_high, 3),
    }))


if __name__ == "__main__":
    main()
