"""Per-stage shuffle-bytes evidence for the scaling analysis.

Runs the full KG pipeline once and dumps every completed stage's input /
output / shuffle-read / shuffle-write bytes and executor time from the
Spark UI REST API — the numbers that back BENCH/BASELINE.md's claim that
no stage's shuffle volume scales with anything but the (tiny)
surface/candidate relations.

Usage: python tools/stage_metrics.py [n_convs] [turns_per_conv] [cpus]
       [--partitioned]
``--partitioned`` materializes the input pre-hashed by conv_id first
(standing in for reading an Iceberg ``bucket(N, conv_id)`` table) and
runs extraction with ``assume_conv_partitioned=True`` — demonstrating
the elision of the pipeline's only O(input) exchange.
Prints a markdown table + one JSON line.
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, ".")


def fetch_stages(ui_url: str, app_id: str) -> list[dict]:
    url = "%s/api/v1/applications/%s/stages?status=complete" % (ui_url, app_id)
    with urllib.request.urlopen(url) as resp:
        return json.load(resp)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    partitioned = "--partitioned" in sys.argv
    n_convs = int(args[0]) if len(args) > 0 else 600_000
    turns = int(args[1]) if len(args) > 1 else 10
    cpus = int(args[2]) if len(args) > 2 else 8

    from meresco_rdf_spark.kg.pipeline import run_pipeline
    from meresco_rdf_spark.session import get_spark
    from meresco_rdf_spark.sources.transcripts import synthesize_transcripts

    spark = get_spark(app_name="stage-metrics", master="local[%d]" % cpus,
                      shuffle_partitions=cpus,
                      extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    t = synthesize_transcripts(spark, n_convs, turns, partitions=cpus * 2)
    if partitioned:
        # materialize conv-hashed parquet FIRST (= exactly the on-disk
        # state of an Iceberg bucket(N, conv_id) table), then measure the
        # pipeline reading it; the pre-hash shuffle happens at write
        # time, the way a bucketed table write does
        import tempfile

        bucketed = tempfile.mkdtemp(prefix="bucketed_in_") + "/t"
        t.repartition(cpus, "conv_id").write.parquet(bucketed)
        t = spark.read.parquet(bucketed)

    # drive the pipeline phase-by-phase under labeled job groups so the
    # REST stages can be attributed (run_pipeline itself eagerly fills
    # the mention/canon caches, so phase boundaries are already jobs)
    from meresco_rdf_spark.kg.canonicalize import canonical_surface_map
    from meresco_rdf_spark.kg.extract import detect_mentions, pipeline_triples
    from pyspark.sql import functions as F

    t0 = time.monotonic()
    sc.setJobGroup("extract", "mention detection (Arrow mapInPandas)")
    mentions = detect_mentions(
        t, assume_conv_partitioned=partitioned).persist()
    mentions.count()
    sc.setJobGroup("canonicalize", "MinHash-LSH + connected components")
    canon = canonical_surface_map(
        mentions.select("surface_key").dropDuplicates(["surface_key"])).persist()
    canon.count()
    sc.setJobGroup("emit", "fused canonical triple emission")
    n_triples = pipeline_triples(mentions, canon).count()
    sc.setJobGroup("", "")
    wall = time.monotonic() - t0

    ui = sc.uiWebUrl
    app_id = sc.applicationId
    stages = fetch_stages(ui, app_id)
    with urllib.request.urlopen(
            "%s/api/v1/applications/%s/jobs" % (ui, app_id)) as resp:
        jobs = json.load(resp)
    group_of_stage = {}
    for j in jobs:
        for sid in j.get("stageIds", []):
            group_of_stage[sid] = j.get("jobGroup") or "-"

    rows = []
    for s in stages:
        rows.append({
            "stage": s["stageId"],
            "phase": group_of_stage.get(s["stageId"], "-"),
            "tasks": s["numCompleteTasks"],
            "input_mb": round(s.get("inputBytes", 0) / 1e6, 1),
            "shuffle_read_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 1),
            "shuffle_write_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
            "exec_sec": round(s.get("executorRunTime", 0) / 1e3, 1),
        })
    rows.sort(key=lambda r: -(r["shuffle_write_mb"] + r["shuffle_read_mb"]))

    total_sw = sum(r["shuffle_write_mb"] for r in rows)
    total_sr = sum(r["shuffle_read_mb"] for r in rows)
    total_in = max((r["input_mb"] for r in rows), default=0)

    print("| stage | phase | tasks | input MB | shuf read MB | shuf write MB | exec s |")
    print("|---|---|---|---|---|---|---|")
    for r in rows[:12]:
        print("| %(stage)d | %(phase)s | %(tasks)d | %(input_mb).1f | "
              "%(shuffle_read_mb).1f | %(shuffle_write_mb).1f | %(exec_sec).1f |" % r)
    print()
    print(json.dumps({
        "n_turns": n_convs * turns,
        "n_triples": n_triples,
        "wall_sec": round(wall, 1),
        "cpus": cpus,
        "n_stages": len(rows),
        "total_shuffle_write_mb": round(total_sw, 1),
        "total_shuffle_read_mb": round(total_sr, 1),
        "largest_stage_input_mb": round(total_in, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
