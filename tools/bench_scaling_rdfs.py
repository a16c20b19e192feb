"""Scaling-efficiency evidence for RDFS entailment materialization
(operators/rdfs.py): the same closure over the same synthesized
instance+ontology relation at local[N] vs local[4N].

Complements tools/bench_scaling.py (KG pipeline) / bench_scaling_sparql
/ bench_scaling_dedup / bench_scaling_ann: the north rule's N-vs-4N
criterion measured on the inference path, whose plan is 4 broadcast-join
branches over the instance scan plus ONE dedup shuffle — rule
composition is entirely schema-side, so near-linear scaling is the
design claim this script checks.

Synthetic shape: N instance triples over 100 properties (each in a
3-level subPropertyOf chain with declared domain/range) and 60 classes
in 3-level subClassOf chains — a ~600-triple ontology against an
arbitrarily large instance relation, the realistic KB-vs-TB asymmetry.

Usage: python tools/bench_scaling_rdfs.py [n_triples]
Prints one JSON line; raw dump to BENCH/scaling_rdfs_last_run.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SYNTH_TEMPLATE = """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from meresco_rdf_spark.session import get_spark
from meresco_rdf_spark.operators.rdfs import (
    RDFS_DOMAIN, RDFS_RANGE, RDFS_SUBCLASS, RDFS_SUBPROP)

n = {n_triples}
spark = get_spark(app_name="scaling-rdfs-synth", master="local[32]",
                  shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
n_ent = max(n // 10, 1000)
base = spark.range(0, n, 1, 64)
pred_i = (F.col("id") % 100)
is_edge = F.col("id") % 3 != 0   # 2/3 uri objects, 1/3 literals
instance = base.select(
    F.concat(F.lit("urn:e:"), (F.col("id") % n_ent).cast("string"))
     .alias("subj"),
    F.concat(F.lit("urn:p:"), pred_i.cast("string")).alias("pred"),
    F.when(is_edge, F.concat(F.lit("urn:e:"),
                             ((F.col("id") * 7 + 3) % n_ent).cast("string")))
     .otherwise(F.concat(F.lit("v"), (F.col("id") % 97).cast("string")))
     .alias("obj_value"),
    F.when(is_edge, F.lit("uri")).otherwise(F.lit("literal"))
     .alias("obj_kind"),
    F.lit(None).cast("string").alias("obj_lang"),
)
# ontology: p:i sp sp:(i%10) sp sp:root; p:i dom c:(i%20); p:i rng c:(i%20+20)
# classes c:j sc csup:(j%12) sc c:root — ~3-level chains everywhere
onto_rows = []
for i in range(100):
    onto_rows.append(("urn:p:%d" % i, RDFS_SUBPROP, "urn:sp:%d" % (i % 10)))
    onto_rows.append(("urn:p:%d" % i, RDFS_DOMAIN, "urn:c:%d" % (i % 20)))
    onto_rows.append(("urn:p:%d" % i, RDFS_RANGE, "urn:c:%d" % (i % 20 + 20)))
for j in range(10):
    onto_rows.append(("urn:sp:%d" % j, RDFS_SUBPROP, "urn:sp:root"))
for c in range(40):
    onto_rows.append(("urn:c:%d" % c, RDFS_SUBCLASS, "urn:csup:%d" % (c % 12)))
for s in range(12):
    onto_rows.append(("urn:csup:%d" % s, RDFS_SUBCLASS, "urn:c:root"))
onto = spark.createDataFrame(
    [(a, p, b, "uri", None) for a, p, b in onto_rows],
    "subj string, pred string, obj_value string, obj_kind string, "
    "obj_lang string")
instance.write.mode("overwrite").parquet({path!r})
onto.write.mode("overwrite").parquet({path!r} + "_onto")
spark.stop()
"""

RUN_TEMPLATE = """
import sys, time, json
sys.path.insert(0, {repo!r})
from meresco_rdf_spark.session import get_spark
from meresco_rdf_spark.operators.rdfs import rdfs_closure

cpus = {cpus}
n = {n_triples}
spark = get_spark(app_name="scaling-rdfs-%d" % cpus,
                  master="local[%d]" % cpus, shuffle_partitions=cpus,
                  extra_conf={{
                      "spark.locality.wait": "0",
                      # pin file-split sizing level-independently: local
                      # mode sizes splits by totalBytes/defaultParallelism,
                      # so local[2] would read 4x-coarser map partitions
                      # than local[8] and do measurably LESS shuffle work
                      # (bigger map partitions dedup more map-side) — a
                      # local-mode artifact; a real cluster's
                      # maxPartitionBytes is one fixed number regardless of
                      # executor count.  minPartitionNum=1 disables the
                      # parallelism divisor; 32m splits give both levels
                      # the identical physical plan.
                      "spark.sql.files.minPartitionNum": "1",
                      "spark.sql.files.maxPartitionBytes": "33554432",
                  }})
spark.sparkContext.setLogLevel("ERROR")
triples = spark.read.parquet({path!r})
# the realistic entry point: ontology is its own KB-sized relation, so
# rule composition never scans the instance data (schema_triples=).
onto = spark.read.parquet({path!r} + "_onto")

# identical warmup at each level
rdfs_closure(triples.limit(200_000), schema_triples=onto).write.format(
    "noop").mode("overwrite").save()
walls = []
out_rows = None
for _ in range({repeats}):
    t0 = time.monotonic()
    closed = rdfs_closure(triples, schema_triples=onto)
    closed.write.format("noop").mode("overwrite").save()
    walls.append(time.monotonic() - t0)
wall = min(walls)
print(json.dumps({{"cpus": cpus, "wall": round(wall, 2),
                   "walls": [round(w, 2) for w in walls],
                   "n_triples": n,
                   "triples_per_sec": round(n / wall, 1)}}))
spark.stop()
"""


def synthesize(n_triples: int, path: str) -> None:
    code = SYNTH_TEMPLATE.format(repo=REPO, n_triples=n_triples, path=path)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=3600)
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise RuntimeError("synthesis failed")


def run_level(cpus: int, n_triples: int, repeats: int, path: str) -> dict:
    code = RUN_TEMPLATE.format(repo=REPO, cpus=cpus, n_triples=n_triples,
                               repeats=repeats, path=path)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=3600)
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        sys.stderr.write("--- stdout ---\n%s\n" % out.stdout[-2000:])
        sys.stderr.write("--- stderr ---\n%s\n" % out.stderr[-4000:])
        raise RuntimeError("run at local[%d] produced no result" % cpus)
    return json.loads(lines[-1])


def main() -> None:
    n_triples = int(sys.argv[1]) if len(sys.argv) > 1 else 24_000_000
    low_cpus = int(os.environ.get("SCALING_N", "2"))
    high_cpus = low_cpus * 4
    repeats = int(os.environ.get("SCALING_REPEATS", "2"))

    path = os.environ.get("SCALING_RDFS_PATH", "/tmp/scaling_rdfs_triples")
    synthesize(n_triples, path)
    low = run_level(low_cpus, n_triples, repeats, path)
    high = run_level(high_cpus, n_triples, repeats, path)
    efficiency = round((low["wall"] / high["wall"]) / (high_cpus // low_cpus),
                       3)
    report = {
        "job": "rdfs_closure",
        "n_triples": n_triples,
        "low": low,
        "high": high,
        "speedup": round(low["wall"] / high["wall"], 2),
        "efficiency": efficiency,
    }
    line = json.dumps(report)
    print(line)
    with open(os.path.join(REPO, "BENCH", "scaling_rdfs_last_run.md"),
              "w") as fh:
        fh.write("# rdfs_closure two-level scaling (last run)\n\n```json\n"
                 + line + "\n```\n")


if __name__ == "__main__":
    main()
