"""Scaling-efficiency evidence for OWL-lite entailment materialization
(operators/owl.py): the same closure over the same synthesized instance
relation at local[N] vs local[4N].

Complements tools/bench_scaling_rdfs.py: where the RDFS plan is pure
broadcast maps + dedup (no iteration), the OWL plan's cost center is
the ITERATIVE semi-naive transitive closure — (L-1) rounds of a
(pred, node)-keyed shuffle join for depth-L chains — so this script
checks that the iterative path, not just the map path, holds the
north rule's two-level criterion.

Synthetic shape: N 'part' edges arranged in disjoint chains of depth
CHAIN_LEN (closure fan-out (L-1)(L-2)/2 derived edges per chain), an
owl:inverseOf 'whole' (doubling every edge through the orbit join),
and a symmetric 'adj' slice (10% of N) — all three axiom kinds live in
the measured plan.

File-split sizing is pinned level-independently (same rationale as
bench_scaling_rdfs.py, documented in BENCH/BASELINE.md: local mode
otherwise sizes splits by defaultParallelism and the low level does
measurably less shuffle work).

Usage: python tools/bench_scaling_owl.py [n_edges]
Prints one JSON line; raw dump to BENCH/scaling_owl_last_run.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHAIN_LEN = 6  # nodes per chain; closure depth = CHAIN_LEN - 1 rounds

SYNTH_TEMPLATE = """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from meresco_rdf_spark.session import get_spark
from meresco_rdf_spark.operators.owl import (
    OWL_INVERSE_OF, OWL_SYMMETRIC, OWL_TRANSITIVE, RDF_TYPE)

n = {n_edges}
L = {chain_len}
spark = get_spark(app_name="scaling-owl-synth", master="local[32]",
                  shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
base = spark.range(0, n, 1, 64)
chain = F.floor(F.col("id") / (L - 1)).cast("long")
pos = F.col("id") % (L - 1)
node = (chain * L + pos)
part = base.select(
    F.concat(F.lit("urn:n:"), node.cast("string")).alias("subj"),
    F.lit("urn:p:part").alias("pred"),
    F.concat(F.lit("urn:n:"), (node + 1).cast("string")).alias("obj_value"),
    F.lit("uri").alias("obj_kind"),
    F.lit(None).cast("string").alias("obj_lang"))
adj = base.filter(F.col("id") % 10 == 0).select(
    F.concat(F.lit("urn:a:"), F.col("id").cast("string")).alias("subj"),
    F.lit("urn:p:adj").alias("pred"),
    F.concat(F.lit("urn:a:"), (F.col("id") + 1).cast("string"))
     .alias("obj_value"),
    F.lit("uri").alias("obj_kind"),
    F.lit(None).cast("string").alias("obj_lang"))
onto = spark.createDataFrame(
    [("urn:p:part", OWL_INVERSE_OF, "urn:p:whole", "uri", None),
     ("urn:p:part", RDF_TYPE, OWL_TRANSITIVE, "uri", None),
     ("urn:p:adj", RDF_TYPE, OWL_SYMMETRIC, "uri", None)],
    "subj string, pred string, obj_value string, obj_kind string, "
    "obj_lang string")
part.unionByName(adj).write.mode("overwrite").parquet({path!r})
onto.write.mode("overwrite").parquet({path!r} + "_onto")
spark.stop()
"""

RUN_TEMPLATE = """
import sys, time, json
sys.path.insert(0, {repo!r})
from meresco_rdf_spark.session import get_spark
from meresco_rdf_spark.operators.owl import owl_closure

cpus = {cpus}
n = {n_edges}
spark = get_spark(app_name="scaling-owl-%d" % cpus,
                  master="local[%d]" % cpus, shuffle_partitions=cpus,
                  extra_conf={{
                      "spark.locality.wait": "0",
                      # level-independent split sizing (see module doc)
                      "spark.sql.files.minPartitionNum": "1",
                      "spark.sql.files.maxPartitionBytes": "33554432",
                  }})
spark.sparkContext.setLogLevel("ERROR")
triples = spark.read.parquet({path!r})
onto = spark.read.parquet({path!r} + "_onto")

# identical warmup at each level (a slice: the closure rounds still
# run, just small)
warm = triples.limit(100_000)
owl_closure(warm, schema_triples=onto).write.format(
    "noop").mode("overwrite").save()
walls = []
for _ in range({repeats}):
    t0 = time.monotonic()
    closed = owl_closure(triples, schema_triples=onto)
    closed.write.format("noop").mode("overwrite").save()
    walls.append(time.monotonic() - t0)
wall = min(walls)
print(json.dumps({{"cpus": cpus, "wall": round(wall, 2),
                   "walls": [round(w, 2) for w in walls],
                   "n_edges": n,
                   "edges_per_sec": round(n / wall, 1)}}))
spark.stop()
"""


def synthesize(n_edges: int, path: str) -> None:
    code = SYNTH_TEMPLATE.format(repo=REPO, n_edges=n_edges, path=path,
                                 chain_len=CHAIN_LEN)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=3600)
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise RuntimeError("synthesis failed")


def run_level(cpus: int, n_edges: int, repeats: int, path: str) -> dict:
    code = RUN_TEMPLATE.format(repo=REPO, cpus=cpus, n_edges=n_edges,
                               repeats=repeats, path=path,
                               chain_len=CHAIN_LEN)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=3600)
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        sys.stderr.write("--- stdout ---\n%s\n" % out.stdout[-2000:])
        sys.stderr.write("--- stderr ---\n%s\n" % out.stderr[-4000:])
        raise RuntimeError("run at local[%d] produced no result" % cpus)
    return json.loads(lines[-1])


def main() -> None:
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    low_cpus = int(os.environ.get("SCALING_N", "2"))
    high_cpus = low_cpus * 4
    repeats = int(os.environ.get("SCALING_REPEATS", "2"))

    path = os.environ.get("SCALING_OWL_PATH", "/tmp/scaling_owl_triples")
    synthesize(n_edges, path)
    low = run_level(low_cpus, n_edges, repeats, path)
    high = run_level(high_cpus, n_edges, repeats, path)
    efficiency = round((low["wall"] / high["wall"]) / (high_cpus // low_cpus),
                       3)
    report = {
        "job": "owl_closure",
        "n_edges": n_edges,
        "chain_len": CHAIN_LEN,
        "low": low,
        "high": high,
        "speedup": round(low["wall"] / high["wall"], 2),
        "efficiency": efficiency,
    }
    line = json.dumps(report)
    print(line)
    with open(os.path.join(REPO, "BENCH", "scaling_owl_last_run.md"),
              "w") as fh:
        fh.write("# owl_closure two-level scaling (last run)\n\n```json\n"
                 + line + "\n```\n")


if __name__ == "__main__":
    main()
