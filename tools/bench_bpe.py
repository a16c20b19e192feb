"""Price train_bpe's per-merge driver round-trip, and the Arrow apply
path against the fold path — the numbers behind textops/bpe.py's cost
model ("never train on the raw corpus; train on a bounded sample via
``train_on=``, apply corpus-wide").

Measures, on the deterministic synthetic doc corpus:
1. merges/sec for train_bpe at two corpus sizes (each merge is one
   driver-synchronized aggregation job, so merges/sec should drop
   roughly with corpus scan time — that ratio IS the argument for
   ``train_on=`` sampling);
2. the same training driven through a ``train_on=`` sample of the
   larger corpus (the production recipe: sample-train cost is the
   SMALL corpus's, merge list applies corpus-wide);
3. apply_bpe wall at a mid-size merge count, fold vs arrow strategy,
   over the larger corpus (parity of results is pinned by pytest and
   the text_bpe_arrow driver oracle; this is the TIME comparison).

Usage: python tools/bench_bpe.py [n_docs_small] [n_docs_large] [merges]
Prints one JSON line; raw dump to BENCH/bpe_last_run.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 30_000
    n_large = int(sys.argv[2]) if len(sys.argv) > 2 else 300_000
    n_merges = int(sys.argv[3]) if len(sys.argv) > 3 else 24

    from meresco_rdf_spark.session import get_spark
    from meresco_rdf_spark.sources.synth_docs import synthesize_documents
    from meresco_rdf_spark.textops.bpe import apply_bpe, train_bpe

    spark = get_spark(app_name="bench-bpe", master="local[8]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    report = {"n_merges": n_merges}
    corpora = {}
    for label, n in (("small", n_small), ("large", n_large)):
        docs = synthesize_documents(spark, n).localCheckpoint(eager=True)
        corpora[label] = docs
        t0 = time.monotonic()
        merges = train_bpe(docs, n_merges, min_count=2)
        wall = time.monotonic() - t0
        report["train_%s" % label] = {
            "n_docs": n, "wall_s": round(wall, 2),
            "merges": len(merges),
            "merges_per_sec": round(len(merges) / wall, 2)}

    # production recipe: train on a hash-sampled slice of the large
    # corpus, apply corpus-wide
    from pyspark.sql import functions as F

    sample = corpora["large"].filter(
        F.abs(F.hash("doc_id")) % 10 == 0).localCheckpoint(eager=True)
    t0 = time.monotonic()
    merges = train_bpe(corpora["large"], n_merges, min_count=2,
                       train_on=sample)
    wall = time.monotonic() - t0
    report["train_on_sample"] = {
        "sample_docs": sample.count(), "wall_s": round(wall, 2),
        "merges_per_sec": round(len(merges) / wall, 2)}

    for strategy in ("fold", "arrow"):
        t0 = time.monotonic()
        (apply_bpe(corpora["large"], merges, strategy=strategy)
         .write.format("noop").mode("overwrite").save())
        report["apply_%s_wall_s" % strategy] = round(
            time.monotonic() - t0, 2)

    print(json.dumps(report))
    with open(os.path.join(REPO, "BENCH", "bpe_last_run.md"), "w") as f:
        f.write("# BPE train/apply pricing (last run)\n\n```json\n%s\n```\n"
                % json.dumps(report, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
