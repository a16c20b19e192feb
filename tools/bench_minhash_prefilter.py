"""A/B evidence for the verify-phase participant prefilter in
``minhash_dedup_pairs``: semi-joining the inverted index down to docs
that appear in some banded candidate pair before the count-based
Jaccard verify join (``textops/dedup.py``, ``verify_prefilter=``).

Both arms run in ONE session on the SAME deterministic corpus
(sources/synth_docs.py), warmup first, best-of-N walls, arms
interleaved so drift hits both equally.  Also reports the measured
candidate-participation fraction.

MEASURED RESULT (2026-08-17, recorded in BENCH/BASELINE.md): a WASH at
600k docs / local[8] / 37%% participation (28.5s on vs 28.1s off,
-1.3%%) and a 31%% REGRESSION at 60k docs — AQE broadcasts the
candidate side of both verify joins, so the inverted index is already
map-side-filtered and never shuffled; the semi-join just repeats that
work.  Hence ``verify_prefilter`` defaults to False and is reserved
for the regime where the candidate set exceeds broadcast range.

Usage: python tools/bench_minhash_prefilter.py [n_docs] [cpus]
Env: PREFILTER_REPEATS (default 2).  Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    repeats = int(os.environ.get("PREFILTER_REPEATS", "2"))

    from pyspark.sql import functions as F
    from meresco_rdf_spark.session import get_spark
    from meresco_rdf_spark.sources.synth_docs import synthesize_documents
    from meresco_rdf_spark.textops.dedup import minhash_dedup_pairs

    spark = get_spark(app_name="minhash-prefilter-ab",
                      master="local[%d]" % cpus, shuffle_partitions=cpus,
                      extra_conf={"spark.locality.wait": "0"})
    spark.sparkContext.setLogLevel("ERROR")
    docs = synthesize_documents(spark, n_docs, partitions=cpus * 2)

    def run(prefilter: bool) -> tuple[float, int]:
        t0 = time.monotonic()
        n = minhash_dedup_pairs(docs, threshold=0.5, hash_fn="xx",
                                verify_prefilter=prefilter).count()
        wall = time.monotonic() - t0
        spark.catalog.clearCache()  # drop the eager persists between arms
        return wall, n

    run(True)  # warmup: JIT/codegen, not measured
    spark.catalog.clearCache()

    walls = {True: [], False: []}
    pairs = {}
    for _ in range(repeats):
        for arm in (False, True):  # interleaved: drift hits both arms
            w, n = run(arm)
            walls[arm].append(round(w, 2))
            pairs[arm] = n

    assert pairs[True] == pairs[False], \
        "prefilter changed the answer: %r" % (pairs,)

    # participation: docs in >=1 banded candidate pair / corpus size
    cand = minhash_dedup_pairs(docs, threshold=-1.0, hash_fn="xx",
                               verify_prefilter=True)
    participants = (cand.select(F.col("a").alias("id"))
                    .unionByName(cand.select(F.col("b").alias("id")))
                    .dropDuplicates(["id"]).count())
    spark.catalog.clearCache()

    on, off = min(walls[True]), min(walls[False])
    print(json.dumps({
        "metric": "minhash_verify_prefilter_speedup",
        "value": round(off / on, 3), "unit": "ratio",
        "wall_prefilter_on": on, "wall_prefilter_off": off,
        "walls_on": walls[True], "walls_off": walls[False],
        "pct_faster": round(100.0 * (off - on) / off, 1),
        "n_docs": n_docs, "cpus": cpus, "pairs": pairs[True],
        "participation": round(participants / n_docs, 3),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
