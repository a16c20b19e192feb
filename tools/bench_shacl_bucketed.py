"""SHACL plain-validate over a SUBJECT-BUCKETED table: the
bucket-colocation experiment from the round-3 review.

The stage forensics (tools/forensics_shacl.py) attribute the plain
path's scaling loss to its corpus-sized exchanges: the subj-keyed value
join and the per-(focus, path) cardinality groupBy together shuffle
~580 MB at 24M rows, and that exchange is the memory-bus-bound half of
the job.  Both operations key on the subject — exactly the snapshot
layout (`kg/snapshots.py` buckets by subj).  Writing the corpus as a
Spark bucketed+sorted table (`bucketBy(32, "subj")`) lets Catalyst
prove the scan is already hash-partitioned on the join/group key, so
BOTH exchanges (and the SMJ sorts) disappear from the plan — no change
to ``validate`` itself, the elision is pure table layout.

Measures wall at local[N] / local[4N] over (a) plain parquet and
(b) the bucketed table, ASSERTS the bucketed plan has strictly fewer
hash exchanges than the plain plan (exit nonzero otherwise), records
both counts, and prints both efficiencies.

Usage: python tools/bench_shacl_bucketed.py [n_triples]
Env: SCALING_N (default 2).  Writes BENCH/shacl_bucketed_last_run.md.
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
from meresco_rdf_spark.session import get_spark
from meresco_rdf_spark.operators.shacl import validate

cpus = {cpus}
spark = get_spark(app_name="shacl-bucketed-%d" % cpus,
                  master="local[%d]" % cpus, shuffle_partitions=32,
                  extra_conf={{
                      "spark.locality.wait": "0",
                      "spark.sql.files.minPartitionNum": "1",
                      "spark.sql.files.maxPartitionBytes": "33554432",
                      "spark.sql.warehouse.dir": {warehouse!r},
                      # one bucket file = one task: the bucketed scan's
                      # parallelism is the bucket count (32) at BOTH
                      # levels, level-independent like the split pinning
                      "spark.sql.sources.bucketing.enabled": "true",
                      "spark.sql.sources.bucketing.autoBucketedScan.enabled":
                          "true",
                  }})
spark.sparkContext.setLogLevel("ERROR")
SHAPES = [{{"id": "urn:s:person", "target_class": "urn:c:Person",
           "properties": [
               {{"path": "urn:p:name", "min_count": 1, "max_count": 1,
                "node_kind": ("literal",)}},
               {{"path": "urn:p:knows", "node_kind": ("uri",),
                "class": "urn:c:Person"}},
               {{"path": "urn:p:id", "pattern": "^P[0-9]+$"}},
           ]}}]
results = {{"cpus": cpus}}
spark.sql(
    "CREATE TABLE shacl_bucketed "
    "(subj STRING, pred STRING, obj_value STRING, obj_kind STRING, "
    "obj_lang STRING) USING PARQUET "
    "CLUSTERED BY (subj) SORTED BY (subj) INTO 32 BUCKETS "
    "LOCATION '%s/shacl_bucketed'" % {warehouse!r})
for label, rel in (("plain", spark.read.parquet({path!r})),
                   ("bucketed", spark.table("shacl_bucketed"))):
    validate(rel.limit(200_000), SHAPES).write.format("noop").mode(
        "overwrite").save()
    walls = []
    for _ in range({repeats}):
        t0 = time.monotonic()
        validate(rel, SHAPES).write.format("noop").mode("overwrite").save()
        walls.append(round(time.monotonic() - t0, 2))
    results[label] = {{"wall": min(walls), "walls": walls}}
# plan evidence: bucket layout elides exchanges/sorts vs plain
for label, rel in (("plain", spark.read.parquet({path!r})),
                   ("bucketed", spark.table("shacl_bucketed"))):
    plan = (validate(rel, SHAPES)
            ._jdf.queryExecution().executedPlan().toString())
    results["%s_exchanges" % label] = plan.count(
        "Exchange hashpartitioning")
    results["%s_sorts" % label] = plan.count("Sort [")
results["n_violations"] = validate(
    spark.table("shacl_bucketed"), SHAPES).count()
print(json.dumps(results))
spark.stop()
"""

BUCKET_TEMPLATE = """
import sys
sys.path.insert(0, {repo!r})
from meresco_rdf_spark.session import get_spark
spark = get_spark(app_name="shacl-bucket-write", master="local[32]",
                  shuffle_partitions=32,
                  extra_conf={{"spark.sql.warehouse.dir": {warehouse!r}}})
spark.sparkContext.setLogLevel("ERROR")
spark.sql("DROP TABLE IF EXISTS shacl_bucketed")
from pyspark.sql import functions as F
# repartition first: ONE file per bucket, so the per-bucket sort
# metadata is trusted at read time (multi-file buckets forfeit it)
(spark.read.parquet({path!r})
 .repartition(32, F.col("subj"))
 .write.bucketBy(32, "subj").sortBy("subj")
 .saveAsTable("shacl_bucketed"))
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
    low = int(os.environ.get("SCALING_N", "2"))
    repeats = int(os.environ.get("SCALING_REPEATS", "2"))
    path = os.environ.get("SCALING_SHACL_PATH", "/tmp/scaling_shacl_triples")
    warehouse = "/tmp/shacl_bucketed_warehouse"

    sys.path.insert(0, os.path.join(REPO, "tools"))
    if not os.path.exists(path):
        from bench_scaling_shacl import SYNTH_TEMPLATE

        subprocess.run(
            [sys.executable, "-c",
             SYNTH_TEMPLATE.format(repo=REPO, n_triples=n_triples,
                                   path=path)],
            check=True, timeout=3600)
    import shutil

    shutil.rmtree(warehouse, ignore_errors=True)
    _run(BUCKET_TEMPLATE.format(repo=REPO, path=path, warehouse=warehouse),
         "bucketed write")
    levels = {}
    for cpus in (low, low * 4):
        out = _run(RUN_TEMPLATE.format(repo=REPO, cpus=cpus, path=path,
                                       warehouse=warehouse, repeats=repeats),
                   "run at local[%d]" % cpus)
        lines = [ln for ln in out.splitlines() if ln.startswith("{")]
        levels[cpus] = json.loads(lines[-1])
    lo, hi = levels[low], levels[low * 4]
    if hi["bucketed_exchanges"] >= hi["plain_exchanges"]:
        raise AssertionError(
            "bucket layout elided no exchanges (plain %d, bucketed %d) "
            "— the experiment's premise does not hold on this build"
            % (hi["plain_exchanges"], hi["bucketed_exchanges"]))
    report = {
        "n_triples": n_triples,
        "exchanges_plain_vs_bucketed": [hi["plain_exchanges"], hi["bucketed_exchanges"]],
        "sorts_plain_vs_bucketed": [hi["plain_sorts"], hi["bucketed_sorts"]],
        "plain": {"low_wall": lo["plain"]["wall"],
                  "high_wall": hi["plain"]["wall"],
                  "efficiency": round(
                      lo["plain"]["wall"] / hi["plain"]["wall"] / 4, 3)},
        "bucketed": {"low_wall": lo["bucketed"]["wall"],
                     "high_wall": hi["bucketed"]["wall"],
                     "efficiency": round(
                         lo["bucketed"]["wall"] / hi["bucketed"]["wall"] / 4,
                         3)},
        "raw": levels,
    }
    print(json.dumps(report))
    with open(os.path.join(REPO, "BENCH", "shacl_bucketed_last_run.md"),
              "w") as f:
        f.write("# SHACL validate over subject-bucketed table (last run)"
                "\n\n```json\n%s\n```\n" % json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
