"""Scaling-efficiency evidence for the training-data text operators
(textops/boilerplate.py + textops/tfidf.py): the same
strip-boilerplate -> TF-IDF-top-k job over the same synthesized
multi-line corpus at local[N] vs local[4N].

Complements tools/bench_scaling.py (KG pipeline) and the rdfs/owl/
sparql/shacl/dedup/ann scaling scripts: the north rule's N-vs-4N
criterion measured on the text-prep path, whose plan is one broadcast
boilerplate strip + one explode + two partial aggregations + a
vocabulary-sized join + a WindowGroupLimit top-k — no corpus-sized
barrier anywhere, so near-linear scaling is the design claim.

Synthetic shape: ``n_docs`` documents of ~5 lines x 12 deterministic
hash-picked words over a 50-word vocabulary, every doc wrapped with a
per-source header/footer (1000 sources) so detection has real work and
the strip really removes lines.

Usage: python tools/bench_scaling_text.py [n_docs]
Prints one JSON line; raw dump to BENCH/scaling_text_last_run.md.
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

n = {n_docs}
spark = get_spark(app_name="scaling-text-synth", master="local[32]",
                  shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
vocab = ["w%d" % i for i in range(50)]
varr = F.array(*[F.lit(w) for w in vocab])
base = spark.range(0, n, 1, 64)

def line(row_id, salt):
    return F.concat_ws(" ", F.transform(
        F.sequence(F.lit(1), F.lit(12)),
        lambda i: F.element_at(
            varr, (F.pmod(F.xxhash64(row_id, F.lit(salt), i),
                          F.lit(50)) + 1).cast("int"))))

src = F.concat(F.lit("src"), (F.col("id") % 1000).cast("string"))
docs = base.select(
    F.col("id").alias("doc_id"), src.alias("source"),
    F.concat_ws(chr(10),
                F.concat(F.lit("HEADER "), src),
                line(F.col("id"), 1), line(F.col("id"), 2),
                line(F.col("id"), 3), line(F.col("id"), 4),
                line(F.col("id"), 5),
                F.concat(F.lit("footer "), src)).alias("text"))
docs.write.mode("overwrite").parquet({path!r})
spark.stop()
"""

RUN_TEMPLATE = """
import sys, time, json
sys.path.insert(0, {repo!r})
from meresco_rdf_spark.session import get_spark
from meresco_rdf_spark.textops.boilerplate import strip_boilerplate
from meresco_rdf_spark.textops.tfidf import tfidf_topk

cpus = {cpus}
n = {n_docs}
spark = get_spark(app_name="scaling-text-%d" % cpus,
                  master="local[%d]" % cpus, shuffle_partitions=cpus,
                  extra_conf={{
                      "spark.locality.wait": "0",
                      # level-independent split sizing (see
                      # bench_scaling_rdfs.py for the local-mode artifact
                      # this pins away)
                      "spark.sql.files.minPartitionNum": "1",
                      "spark.sql.files.maxPartitionBytes": "33554432",
                  }})
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet({path!r})

def job(frame):
    clean = strip_boilerplate(frame, min_docs=2, max_doc_pct=50)
    tfidf_topk(clean, k=5).write.format("noop").mode("overwrite").save()

job(docs.limit(50_000))  # identical warmup at each level
walls = []
for _ in range({repeats}):
    t0 = time.monotonic()
    job(docs)
    walls.append(time.monotonic() - t0)
wall = min(walls)
print(json.dumps({{"cpus": cpus, "wall": round(wall, 2),
                   "walls": [round(w, 2) for w in walls],
                   "n_docs": n,
                   "docs_per_sec": round(n / wall, 1)}}))
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
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    low_cpus = int(os.environ.get("SCALING_N", "2"))
    high_cpus = low_cpus * 4
    repeats = int(os.environ.get("SCALING_REPEATS", "2"))
    path = os.environ.get("SCALING_TEXT_PATH", "/tmp/scaling_text_docs")

    _run(SYNTH_TEMPLATE.format(repo=REPO, n_docs=n_docs, path=path),
         "synthesis")
    levels = {}
    for cpus in (low_cpus, high_cpus):
        out = _run(RUN_TEMPLATE.format(repo=REPO, cpus=cpus, n_docs=n_docs,
                                       repeats=repeats, path=path),
                   "run at local[%d]" % cpus)
        lines = [l for l in out.splitlines() if l.startswith("{")]
        levels[cpus] = json.loads(lines[-1])
    low, high = levels[low_cpus], levels[high_cpus]
    report = {
        "job": "strip_boilerplate+tfidf_topk",
        "n_docs": n_docs,
        "low": low,
        "high": high,
        "speedup": round(low["wall"] / high["wall"], 2),
        "efficiency": round((low["wall"] / high["wall"])
                            / (high_cpus // low_cpus), 3),
    }
    line = json.dumps(report)
    print(line)
    with open(os.path.join(REPO, "BENCH", "scaling_text_last_run.md"),
              "w") as fh:
        fh.write("# text-prep two-level scaling (last run)\n\n```json\n"
                 + line + "\n```\n")


if __name__ == "__main__":
    main()
