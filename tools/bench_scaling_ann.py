"""Scaling-efficiency evidence for the similarity-search path: the same
IVF-flat ANN top-k job (narrow bucket assignment per side -> bucket
equi-join -> exact cosine re-rank -> per-query top-k window) at two
parallelism levels on the same deterministic synthetic corpus; reports
queries/sec at both + scaling efficiency.

Companion to tools/bench_scaling.py (KG pipeline) and
tools/bench_scaling_dedup.py (dedup path): the north rule's
two-cluster-size criterion applied to the third first-class op family.
Efficiency = (T_N / T_4N) / 4.

Usage: python tools/bench_scaling_ann.py [n_vecs] [n_queries]
Env: SCALING_N (low core count, default 2), SCALING_REPEATS (default 2).
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUN_TEMPLATE = """
import sys, time, json
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from meresco_rdf_spark.session import get_spark
from meresco_rdf_spark.sources.synth_vecs import synthesize_embeddings
from meresco_rdf_spark.textops.similarity import ivf_topk

cpus = {cpus}
spark = get_spark(app_name="ann-scaling-%d" % cpus,
                  master="local[%d]" % cpus, shuffle_partitions=cpus,
                  extra_conf={{"spark.locality.wait": "0"}})
spark.sparkContext.setLogLevel("ERROR")
corpus = synthesize_embeddings(spark, {n_vecs}, partitions=cpus * 2).persist()
corpus.count()  # corpus synthesis/caching excluded from the measured walls
queries = (synthesize_embeddings(spark, {n_queries})
           .withColumnRenamed("vec_id", "query_id"))
# identical warmup both levels: steady-state compute, not JIT/codegen
ivf_topk(synthesize_embeddings(spark, 20000, partitions=cpus), queries,
         k=10, n_pivots=64, probes=4, use_arrow=True,
         broadcast_queries=True).count()
walls, rows = [], 0
for _ in range({repeats}):
    t0 = time.monotonic()
    rows = ivf_topk(corpus, queries, k=10, n_pivots=64, probes=4,
                    use_arrow=True, broadcast_queries=True).count()
    walls.append(time.monotonic() - t0)
wall = min(walls)  # best-of-N: local-mode scheduling noise is one-sided
print(json.dumps({{"cpus": cpus, "wall": round(wall, 2),
                   "walls": [round(w, 2) for w in walls],
                   "n_vecs": {n_vecs}, "n_queries": {n_queries},
                   "rows": rows,
                   "queries_per_sec": round({n_queries} / wall, 1)}}))
spark.stop()
"""


def run_level(cpus: int, n_vecs: int, n_queries: int, repeats: int) -> dict:
    code = RUN_TEMPLATE.format(repo=REPO, cpus=cpus, n_vecs=n_vecs,
                               n_queries=n_queries, repeats=repeats)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=3600)
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        sys.stderr.write("--- subprocess stdout ---\n%s\n" % out.stdout[-2000:])
        sys.stderr.write("--- subprocess stderr ---\n%s\n" % out.stderr[-4000:])
        raise RuntimeError("ann scaling run at local[%d] failed" % cpus)
    return json.loads(lines[-1])


def main() -> None:
    n_vecs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    low_cpus = int(os.environ.get("SCALING_N", "2"))
    high_cpus = low_cpus * 4
    repeats = int(os.environ.get("SCALING_REPEATS", "2"))

    low = run_level(low_cpus, n_vecs, n_queries, repeats)
    high = run_level(high_cpus, n_vecs, n_queries, repeats)
    efficiency = round((low["wall"] / high["wall"]) / 4, 3)
    print(json.dumps({"metric": "ann_scaling_efficiency",
                      "value": efficiency, "unit": "ratio",
                      "low": low, "high": high,
                      "speedup": round(low["wall"] / high["wall"], 2)}))


if __name__ == "__main__":
    main()
