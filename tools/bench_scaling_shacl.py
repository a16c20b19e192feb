"""Scaling-efficiency evidence for SHACL validation
(operators/shacl.py::validate): the same shapes over the same
synthesized KG at local[N] vs local[4N] — the north rule's N-vs-4N
criterion measured on the data-quality gate.

Plan under test: focus resolution (pushdown-filtered type scan), ONE
subj-keyed value join, a single when-chain explode for value checks,
one partial-aggregatable groupBy + broadcast expectation relation for
cardinality, one narrow join for sh:class.  Everything is JVM-side and
partial-aggregatable, so near-linear scaling is the design claim this
script checks.

Synthetic shape (built from ``spark.range``, fully column-expression):
n triples over n/6 entities, all typed (focus = every entity); ~1/6 of
rows are names (0.8% of entities get a SECOND name -> maxCount, 1.5%
get none -> minCount zero-case), ~1/2 are knows-edges (1% point at
never-typed ghosts -> sh:class violations through the type join), the
rest id-literals under a pattern (2% violating).  Violations are a few
percent of the corpus — the realistic publish-gate mix where the scan
dominates and the report is small.

Usage: python tools/bench_scaling_shacl.py [n_triples]
Prints one JSON line; raw dump to BENCH/scaling_shacl_last_run.md.
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

n = {n_triples}
spark = get_spark(app_name="scaling-shacl-synth", master="local[32]",
                  shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
# one range per row ROLE (separate ranges avoid modular-arithmetic
# collisions that would skew the violation mix): every entity typed,
# ~1 name each (1.5% none -> minCount, 0.8% a second -> maxCount),
# 3 knows-edges (1% at never-typed ghosts -> class), 1 id-literal
# (2% pattern-violating).  Total = 6 * n_ent rows ~= n.
n_ent = max(n // 6, 1000)
ents = spark.range(0, n_ent, 1, 64)
ent = F.concat(F.lit("urn:e:"), F.col("id").cast("string"))
lit_lang = F.lit(None).cast("string").alias("obj_lang")
type_rows = ents.select(
    ent.alias("subj"),
    F.lit("http://www.w3.org/1999/02/22-rdf-syntax-ns#type").alias("pred"),
    F.lit("urn:c:Person").alias("obj_value"), F.lit("uri").alias("obj_kind"),
    lit_lang)
name_rows = (
    ents.filter(F.col("id") % 200 >= 3).select(
        ent.alias("subj"), F.lit("urn:p:name").alias("pred"),
        F.concat(F.lit("name "), F.col("id").cast("string"))
         .alias("obj_value"),
        F.lit("literal").alias("obj_kind"), lit_lang)
    .unionByName(ents.filter(F.col("id") % 125 == 7).select(
        ent.alias("subj"), F.lit("urn:p:name").alias("pred"),
        F.concat(F.lit("alias "), F.col("id").cast("string"))
         .alias("obj_value"),
        F.lit("literal").alias("obj_kind"), lit_lang)))
edges = spark.range(0, 3 * n_ent, 1, 64)
tgt = F.when(F.col("id") % 100 == 42,
             F.concat(F.lit("urn:ghost:"), (F.col("id") % 977).cast("string"))
             ).otherwise(
             F.concat(F.lit("urn:e:"), ((F.col("id") * 7 + 3) % n_ent)
                      .cast("string")))
knows_rows = edges.select(
    F.concat(F.lit("urn:e:"), (F.col("id") % n_ent).cast("string"))
     .alias("subj"),
    F.lit("urn:p:knows").alias("pred"), tgt.alias("obj_value"),
    F.lit("uri").alias("obj_kind"), lit_lang)
idv = F.when(F.col("id") % 50 == 13,
             F.concat(F.lit("Q"), F.col("id").cast("string"))).otherwise(
             F.concat(F.lit("P"), F.col("id").cast("string")))
id_rows = ents.select(
    ent.alias("subj"), F.lit("urn:p:id").alias("pred"),
    idv.alias("obj_value"), F.lit("literal").alias("obj_kind"), lit_lang)
(type_rows.unionByName(name_rows).unionByName(knows_rows)
 .unionByName(id_rows)).write.mode("overwrite").parquet({path!r})
spark.stop()
"""

RUN_TEMPLATE = """
import sys, time, json
sys.path.insert(0, {repo!r})
from meresco_rdf_spark.session import get_spark
from meresco_rdf_spark.operators.shacl import validate

cpus = {cpus}
n = {n_triples}
spark = get_spark(app_name="scaling-shacl-%d" % cpus,
                  master="local[%d]" % cpus, shuffle_partitions=cpus,
                  extra_conf={{
                      "spark.locality.wait": "0",
                      # level-independent split sizing (see
                      # bench_scaling_rdfs.py: local mode sizes splits by
                      # defaultParallelism, which deflates the low level's
                      # shuffle work and the ratio with it)
                      "spark.sql.files.minPartitionNum": "1",
                      "spark.sql.files.maxPartitionBytes": "33554432",
                  }})
spark.sparkContext.setLogLevel("ERROR")
triples = spark.read.parquet({path!r})
SHAPES = [{{"id": "urn:s:person", "target_class": "urn:c:Person",
           "properties": [
               {{"path": "urn:p:name", "min_count": 1, "max_count": 1,
                "node_kind": ("literal",)}},
               {{"path": "urn:p:knows", "node_kind": ("uri",),
                "class": "urn:c:Person"}},
               {{"path": "urn:p:id", "pattern": "^P[0-9]+$"}},
           ]}}]
# per-graph variant: the same corpus sharded into 16 named graphs (by
# subject hash), validated one graph at a time in ONE job, through a
# STRUCTURED path (inverse knows -> inbound-degree minCount).  The
# graph label rides the value join and the cardinality groupBy as one
# more key; the inverse path adds one more edge relation.
from pyspark.sql import functions as F
quads = triples.withColumn(
    "context", F.concat(F.lit("urn:g:"),
                        (F.abs(F.hash("subj")) % 16).cast("string")))
PG_SHAPES = [{{"id": "urn:s:popular", "target_class": "urn:c:Person",
              "properties": [
                  {{"path": "^urn:p:knows",
                   "path_expr": ("inv", ("iri", "urn:p:knows")),
                   "min_count": 1}},
              ]}}]
# identical warmup at each level
validate(triples.limit(200_000), SHAPES).write.format("noop").mode(
    "overwrite").save()
validate(quads.limit(200_000), PG_SHAPES, per_graph=True).write.format(
    "noop").mode("overwrite").save()
walls, walls_pg = [], []
for _ in range({repeats}):
    t0 = time.monotonic()
    report = validate(triples, SHAPES)
    report.write.format("noop").mode("overwrite").save()
    walls.append(time.monotonic() - t0)
    t0 = time.monotonic()
    validate(quads, PG_SHAPES, per_graph=True).write.format("noop").mode(
        "overwrite").save()
    walls_pg.append(time.monotonic() - t0)
wall = min(walls)
wall_pg = min(walls_pg)
n_viol = validate(triples, SHAPES).count()
n_viol_pg = validate(quads, PG_SHAPES, per_graph=True).count()
print(json.dumps({{"cpus": cpus, "wall": round(wall, 2),
                   "walls": [round(w, 2) for w in walls],
                   "wall_pg": round(wall_pg, 2),
                   "walls_pg": [round(w, 2) for w in walls_pg],
                   "n_triples": n, "n_violations": n_viol,
                   "n_violations_pg": n_viol_pg,
                   "triples_per_sec": round(n / wall, 1),
                   "triples_per_sec_pg": round(n / wall_pg, 1)}}))
spark.stop()
"""


def _run(code: str, what: str) -> str:
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=3600)
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise RuntimeError("%s failed" % what)
    return out.stdout


def main() -> None:
    n_triples = int(sys.argv[1]) if len(sys.argv) > 1 else 24_000_000
    low_cpus = int(os.environ.get("SCALING_N", "2"))
    high_cpus = low_cpus * 4
    repeats = int(os.environ.get("SCALING_REPEATS", "2"))
    path = os.environ.get("SCALING_SHACL_PATH", "/tmp/scaling_shacl_triples")

    _run(SYNTH_TEMPLATE.format(repo=REPO, n_triples=n_triples, path=path),
         "synthesis")
    levels = {}
    for cpus in (low_cpus, high_cpus):
        out = _run(RUN_TEMPLATE.format(repo=REPO, cpus=cpus,
                                       n_triples=n_triples, repeats=repeats,
                                       path=path),
                   "run at local[%d]" % cpus)
        lines = [l for l in out.splitlines() if l.startswith("{")]
        levels[cpus] = json.loads(lines[-1])
    low, high = levels[low_cpus], levels[high_cpus]
    efficiency = round(
        (low["wall"] / high["wall"]) / (high_cpus // low_cpus), 3)
    efficiency_pg = round(
        (low["wall_pg"] / high["wall_pg"]) / (high_cpus // low_cpus), 3)
    report = {
        "job": "shacl_validate",
        "n_triples": n_triples,
        "low": low,
        "high": high,
        "speedup": round(low["wall"] / high["wall"], 2),
        "efficiency": efficiency,
        "speedup_pergraph_paths": round(low["wall_pg"] / high["wall_pg"], 2),
        "efficiency_pergraph_paths": efficiency_pg,
    }
    print(json.dumps(report))
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling_shacl_last_run.md"),
              "w") as f:
        f.write("# SHACL validation scaling (last run)\n\n```json\n%s\n```\n"
                % json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
