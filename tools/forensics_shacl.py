"""Stage-level forensics for the plain SHACL validate scaling number
(BENCH/BASELINE.md "SHACL-validation scaling"): the RDFS playbook —
run the SAME job at local[N] and local[4N] with the Spark UI on, dump
every completed stage's wall/task-time/shuffle bytes, and attribute the
efficiency loss to a named stage instead of accepting a roofline story.

Usage: python tools/forensics_shacl.py [n_triples]
Env: SCALING_N (default 2).  Writes BENCH/forensics_shacl_last_run.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUN_TEMPLATE = """
import sys, time, json, urllib.request
sys.path.insert(0, {repo!r})
from meresco_rdf_spark.session import get_spark
from meresco_rdf_spark.operators.shacl import validate

cpus = {cpus}
spark = get_spark(app_name="forensics-shacl-%d" % cpus,
                  master="local[%d]" % cpus,
                  shuffle_partitions={shufpart},
                  extra_conf={{
                      "spark.locality.wait": "0",
                      "spark.ui.enabled": "true",
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
validate(triples.limit(200_000), SHAPES).write.format("noop").mode(
    "overwrite").save()
sc = spark.sparkContext
ui = sc.uiWebUrl
app_id = sc.applicationId
with urllib.request.urlopen(
        "%s/api/v1/applications/%s/stages?status=complete"
        % (ui, app_id)) as r:
    before = {{s["stageId"] for s in json.load(r)}}
t0 = time.monotonic()
validate(triples, SHAPES).write.format("noop").mode("overwrite").save()
wall = time.monotonic() - t0
with urllib.request.urlopen(
        "%s/api/v1/applications/%s/stages?status=complete"
        % (ui, app_id)) as r:
    stages = [s for s in json.load(r) if s["stageId"] not in before]
out = []
for s in sorted(stages, key=lambda s: s["stageId"]):
    out.append({{
        "stage": s["stageId"],
        "name": s["name"].split("\\n")[0][:60],
        "tasks": s["numCompleteTasks"],
        "task_time_s": round(s["executorRunTime"] / 1000.0, 2),
        "input_mb": round(s["inputBytes"] / 1e6, 1),
        "sh_read_mb": round(s["shuffleReadBytes"] / 1e6, 1),
        "sh_write_mb": round(s["shuffleWriteBytes"] / 1e6, 1),
    }})
print(json.dumps({{"cpus": cpus, "wall": round(wall, 2), "stages": out}}))
spark.stop()
"""


def _run(code: str, what: str) -> dict:
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=3600)
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise RuntimeError("%s failed" % what)
    lines = [line for line in out.stdout.splitlines()
             if line.startswith("{")]
    return json.loads(lines[-1])


def main() -> None:
    n_triples = int(sys.argv[1]) if len(sys.argv) > 1 else 24_000_000
    low = int(os.environ.get("SCALING_N", "2"))
    path = os.environ.get("SCALING_SHACL_PATH", "/tmp/scaling_shacl_triples")
    if not os.path.exists(path):
        from bench_scaling_shacl import SYNTH_TEMPLATE

        subprocess.run(
            [sys.executable, "-c",
             SYNTH_TEMPLATE.format(repo=REPO, n_triples=n_triples,
                                   path=path)],
            check=True, timeout=3600)
    shufpart = int(os.environ.get("SCALING_SHUFFLE", str(low * 4)))
    levels = {c: _run(RUN_TEMPLATE.format(repo=REPO, cpus=c, path=path,
                                          shufpart=shufpart),
                      "local[%d]" % c) for c in (low, low * 4)}
    lo, hi = levels[low], levels[low * 4]
    eff = round((lo["wall"] / hi["wall"]) / 4, 3)
    report = {"n_triples": n_triples, "efficiency": eff,
              "shuffle_partitions": shufpart,
              "low": lo, "high": hi}
    md = ["# SHACL plain-validate stage forensics (last run)", "",
          "efficiency %.3f (local[%d] %.2fs -> local[%d] %.2fs)"
          % (eff, low, lo["wall"], low * 4, hi["wall"]), ""]
    for label, lv in (("local[%d]" % low, lo), ("local[%d]" % (low * 4), hi)):
        md.append("## %s" % label)
        md.append("")
        md.append("| stage | name | tasks | task-time (s) | input MB |"
                  " shuffle-read MB | shuffle-write MB |")
        md.append("|---|---|---|---|---|---|---|")
        for s in lv["stages"]:
            md.append("| %d | %s | %d | %.2f | %.1f | %.1f | %.1f |"
                      % (s["stage"], s["name"], s["tasks"],
                         s["task_time_s"], s["input_mb"],
                         s["sh_read_mb"], s["sh_write_mb"]))
        md.append("")
    with open(os.path.join(REPO, "BENCH", "forensics_shacl_last_run.md"),
              "w") as f:
        f.write("\n".join(md) + "\n\n```json\n%s\n```\n"
                % json.dumps(report, indent=2))
    print(json.dumps(report))


if __name__ == "__main__":
    sys.path.insert(0, os.path.join(REPO, "tools"))
    main()
