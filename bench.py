"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS].  Prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The headline set covers the pipeline (KG construction over synthesized
transcripts scaled with sf) and the heaviest operators (label resolution,
BGP join, dedup, similarity, sessionization, pricing summary).  Each
query is forced end-to-end with a noop write (full materialization, no
driver collect).  Extra keys: turns/sec + triples/sec for the pipeline
(the north-star throughput metric) — reported under "extras".
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def force(df) -> int:
    """Materialize every row; returns row count (cheap second action —
    counted plans reuse shuffle outputs)."""
    df.write.format("noop").mode("overwrite").save()
    return -1


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.1

    from meresco_rdf_spark import entry_queries as eq
    from meresco_rdf_spark.kg.pipeline import run_pipeline
    from meresco_rdf_spark.session import get_spark
    from meresco_rdf_spark.sources.transcripts import synthesize_transcripts

    spark = get_spark(app_name="bench", master="local[%d]" % cpus,
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    def timed(name, thunk):
        t0 = time.monotonic()
        thunk()
        timings[name] = round(time.monotonic() - t0, 3)

    # --- KG pipeline (the north-star workload), sized by sf ---
    # 600k turns at sf0.1: large enough that fixed costs (python worker
    # spin-up, CC barrier stages) amortize and the number reflects
    # steady-state throughput
    n_convs = max(200, int(600_000 * sf))
    turns_per_conv = 10
    transcripts = synthesize_transcripts(spark, n_convs, turns_per_conv)
    n_turns = n_convs * turns_per_conv

    result = {}

    def run_kg():
        res = run_pipeline(transcripts)
        result["triples"] = res.triples.count()

    timed("kg_pipeline", run_kg)
    extras["kg_turns"] = n_turns
    extras["kg_triples"] = result["triples"]
    extras["kg_turns_per_sec"] = round(n_turns / timings["kg_pipeline"], 1)
    extras["kg_triples_per_sec"] = round(
        result["triples"] / timings["kg_pipeline"], 1)

    # --- operator headliners over the sf tables ---
    heads = [
        "graph_find_labels", "graph_bgp", "graph_in_degree",
        "dedup_minhash", "text_simhash", "dedup_ngram_jaccard",
        "embed_cosine_topk", "similarity_lsh_topk", "similarity_ivf_topk",
        "events_sessions", "events_asof_signup", "events_quantiles",
        "pricing_summary", "pricing_pivot", "pricing_cube",
    ]
    for name in heads:
        fn = eq.QUERIES[name]
        timed(name, lambda fn=fn: force(fn(spark, sf_dir)))

    # fast-path minhash at bench scale uses xxhash64 (not the md5 oracle
    # variant): measure it separately for the honest scale number
    from meresco_rdf_spark.textops.dedup import minhash_dedup_pairs

    timed("dedup_minhash_xx", lambda: force(minhash_dedup_pairs(
        spark.read.parquet("%s/documents.parquet" % sf_dir),
        k=16, bands=8, threshold=0.6, hash_fn="xx")))

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        "extras": extras,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
