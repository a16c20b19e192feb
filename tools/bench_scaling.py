"""Scaling-efficiency evidence for the north rule: the same KG pipeline
job at two parallelism levels (local[N] vs local[4N]) on the same
synthesized input; reports throughput at both + scaling efficiency.

The sandbox has no multi-node cluster, so parallelism level stands in
for executor count (driver instruction).  Efficiency =
(T_N / T_4N) / 4 — 1.0 is perfect linear scaling.

Usage: python tools/bench_scaling.py [n_convs] [turns_per_conv]
Writes/updates BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUN_TEMPLATE = """
import sys, time, json
sys.path.insert(0, {repo!r})
from meresco_rdf_spark.session import get_spark
from meresco_rdf_spark.sources.transcripts import synthesize_transcripts
from meresco_rdf_spark.kg.pipeline import run_pipeline

cpus = {cpus}
spark = get_spark(app_name="scaling-%d" % cpus, master="local[%d]" % cpus,
                  shuffle_partitions=cpus,
                  extra_conf={{"spark.locality.wait": "0"}})
spark.sparkContext.setLogLevel("ERROR")
t = synthesize_transcripts(spark, {n_convs}, {turns}, partitions=cpus * 2)
# warm the JVM/codegen/python-worker paths so measured runs are
# steady-state compute, not JIT compile (identical warmup both levels)
run_pipeline(t.limit(2000)).triples.count()
walls = []
n_triples = 0
for _ in range({repeats}):
    t0 = time.monotonic()
    res = run_pipeline(t)
    n_triples = res.triples.count()
    walls.append(time.monotonic() - t0)
    res.mentions.unpersist(); res.canonical_map.unpersist()
wall = min(walls)  # best-of-N: local-mode scheduling noise is one-sided
print(json.dumps({{"cpus": cpus, "wall": round(wall, 2),
                   "walls": [round(w, 2) for w in walls],
                   "n_turns": {n_convs} * {turns},
                   "n_triples": n_triples,
                   "turns_per_sec": round({n_convs} * {turns} / wall, 1),
                   "triples_per_sec": round(n_triples / wall, 1)}}))
spark.stop()
"""


def run_level(cpus: int, n_convs: int, turns: int, repeats: int = 3) -> dict:
    code = RUN_TEMPLATE.format(repo=REPO, cpus=cpus, n_convs=n_convs,
                               turns=turns, repeats=repeats)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=3600)
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        sys.stderr.write("--- subprocess stdout ---\n%s\n" % out.stdout[-2000:])
        sys.stderr.write("--- subprocess stderr ---\n%s\n" % out.stderr[-4000:])
        raise RuntimeError("scaling run at local[%d] produced no result" % cpus)
    return json.loads(lines[-1])


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    turns = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    low_cpus = int(os.environ.get("SCALING_N", "8"))
    high_cpus = low_cpus * 4
    repeats = int(os.environ.get("SCALING_REPEATS", "3"))

    low = run_level(low_cpus, n_convs, turns, repeats)
    high = run_level(high_cpus, n_convs, turns, repeats)
    efficiency = round((low["wall"] / high["wall"]) / 4, 3)
    report = {
        "job": "kg_pipeline",
        "n_turns": n_convs * turns,
        "low": low,
        "high": high,
        "speedup": round(low["wall"] / high["wall"], 2),
        "scaling_efficiency": efficiency,
    }
    print(json.dumps(report))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    # raw last-run dump; the curated analysis lives in BENCH/BASELINE.md
    path = os.path.join(REPO, "BENCH", "scaling_last_run.md")
    with open(path, "w") as f:
        f.write("""# BENCH baseline — measured on this sandbox

North-rule scaling evidence (no real cluster available: parallelism level
stands in for executor count; same job, same input, N vs 4N cores).

Job: full KG pipeline (mention detection -> triple emission -> MinHash
canonicalization -> connected components -> canonical rewrite) over
%(n_turns)d synthesized transcript turns, measured after an identical
warmup run at each level.

| cores | wall (s) | turns/sec | triples/sec |
|---|---|---|---|
| local[%(lc)d] | %(lw).2f | %(lt).1f | %(ltr).1f |
| local[%(hc)d] | %(hw).2f | %(ht).1f | %(htr).1f |

- speedup %(lc)d->%(hc)d cores: **%(speedup).2fx** (ideal 4x)
- scaling efficiency: **%(eff).3f** (north-rule target >= 0.8)

Measured %(date)s. Reproduce: `python tools/bench_scaling.py %(nc)d %(tp)d`.
""" % {
            "n_turns": n_convs * turns,
            "lc": low["cpus"], "lw": low["wall"],
            "lt": low["turns_per_sec"], "ltr": low["triples_per_sec"],
            "hc": high["cpus"], "hw": high["wall"],
            "ht": high["turns_per_sec"], "htr": high["triples_per_sec"],
            "speedup": report["speedup"], "eff": efficiency,
            "date": time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime()),
            "nc": n_convs, "tp": turns,
        })


if __name__ == "__main__":
    main()
