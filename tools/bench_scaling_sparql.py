"""Scaling-efficiency evidence for the SPARQL query path: the same
parsed-and-compiled SPARQL query (BGP self-join + GROUP BY aggregate)
over the same synthesized triples relation at local[N] vs local[4N].

Complements tools/bench_scaling.py (KG pipeline), bench_scaling_dedup.py
and bench_scaling_ann.py: the north rule's N-vs-4N criterion measured on
the query front-end, whose plan is a pure Catalyst join+agg (two pruned
scans of the triples relation, one term-identity shuffle join, one
partial+final hash aggregation).

The triples relation is synthesized deterministically ONCE to parquet
(untimed, full parallelism); both levels then read the same files, so
the measured wall is the query alone — scan + decompress + term-identity
shuffle join + partial/final hash agg.

Usage: python tools/bench_scaling_sparql.py [n_triples]
Prints one JSON line; raw dump to BENCH/scaling_sparql_last_run.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

QUERY = """
    SELECT ?y (COUNT(?x) AS ?n) WHERE {
        ?x <urn:p:0> ?y .
        ?y <urn:p:1> ?z .
    } GROUP BY ?y
"""

SYNTH_TEMPLATE = """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from meresco_rdf_spark.session import get_spark

n = {n_triples}
spark = get_spark(app_name="scaling-sparql-synth", master="local[32]",
                  shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
# deterministic synthetic triples relation: 5 predicates; p:0/p:1 edges
# form a 2-hop joinable entity graph, p:2.. are literal attributes
n_ent = max(n // 10, 1000)
base = spark.range(0, n, 1, 64)
pred_i = (F.col("id") % 5)
is_edge = pred_i <= 1
triples = base.select(
    F.concat(F.lit("urn:e:"), (F.col("id") % n_ent).cast("string"))
     .alias("subj"),
    F.concat(F.lit("urn:p:"), pred_i.cast("string")).alias("pred"),
    F.when(is_edge, F.concat(F.lit("urn:e:"),
                             ((F.col("id") * 7 + 3) % n_ent).cast("string")))
     .otherwise(F.concat(F.lit("v"), (F.col("id") % 97).cast("string")))
     .alias("obj_value"),
    F.when(is_edge, F.lit("uri")).otherwise(F.lit("literal"))
     .alias("obj_kind"),
    F.when(~is_edge & (F.col("id") % 3 == 0), F.lit("en"))
     .otherwise(F.lit(None).cast("string")).alias("obj_lang"),
)
triples.write.mode("overwrite").parquet({path!r})
spark.stop()
"""

RUN_TEMPLATE = """
import sys, time, json
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from meresco_rdf_spark.session import get_spark
from meresco_rdf_spark.sparql import sparql_select

cpus = {cpus}
n = {n_triples}
spark = get_spark(app_name="scaling-sparql-%d" % cpus,
                  master="local[%d]" % cpus, shuffle_partitions=cpus,
                  extra_conf={{"spark.locality.wait": "0"}})
spark.sparkContext.setLogLevel("ERROR")
triples = spark.read.parquet({path!r})

query = {query!r}
# identical warmup at each level: codegen + python-free JVM paths
sparql_select(triples.limit(200_000), query).write.format(
    "noop").mode("overwrite").save()
walls = []
for _ in range({repeats}):
    t0 = time.monotonic()
    sparql_select(triples, query).write.format("noop").mode(
        "overwrite").save()
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
                               query=QUERY, repeats=repeats, path=path)
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

    path = os.environ.get("SCALING_SPARQL_PATH",
                          "/tmp/scaling_sparql_triples")
    synthesize(n_triples, path)
    low = run_level(low_cpus, n_triples, repeats, path)
    high = run_level(high_cpus, n_triples, repeats, path)
    efficiency = round((low["wall"] / high["wall"]) / 4, 3)
    report = {
        "job": "sparql_bgp_aggregate",
        "n_triples": n_triples,
        "low": low,
        "high": high,
        "speedup": round(low["wall"] / high["wall"], 2),
        "scaling_efficiency": efficiency,
    }
    print(json.dumps(report))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH",
                           "scaling_sparql_last_run.md"), "w") as f:
        f.write("# SPARQL query-path scaling (raw last run)\n\n```json\n"
                + json.dumps(report, indent=2) + "\n```\n")


if __name__ == "__main__":
    main()
