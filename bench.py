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

    from pyspark.sql import functions as F

    from meresco_rdf_spark import entry_queries as eq
    from meresco_rdf_spark.kg.pipeline import run_pipeline
    from meresco_rdf_spark.session import get_spark
    from meresco_rdf_spark.sources.transcripts import synthesize_transcripts

    spark = get_spark(app_name="bench", master="local[%d]" % cpus,
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    # Ambient-load stamps (round-4 verdict #6): the shared host injects a
    # documented 10-20% noise band; recording os.getloadavg() at start and
    # end lets the next reader separate host noise from plan regressions
    # mechanically instead of re-deriving it from cross-round forensics.
    extras["load_avg_start"] = [round(x, 2) for x in os.getloadavg()]

    # --- session warmup (NOT timed per-query; reported separately) ---
    # The first job on a cold JVM pays one-time costs that have nothing to
    # do with any operator: spawning $cpus Python workers (each importing
    # pandas/pyarrow), whole-stage-codegen compilation, JIT, and the first
    # page-cache read of the input tables.  Measured ~20s at local[32] on
    # a cold host — larger than most queries.  Warm them up once so the
    # per-query numbers measure operator cost, comparably across hosts
    # (the scaling harness tools/bench_scaling.py already does identical
    # warmup per parallelism level for the same reason).
    t_w = time.monotonic()
    warm = spark.range(0, cpus * 4, 1, cpus)

    def _touch(its):
        for pdf in its:
            yield pdf

    warm.mapInPandas(_touch, schema="id long").groupBy(
        (F.col("id") % 4).alias("k")).count().write.format(
        "noop").mode("overwrite").save()
    for table in ("documents", "embeddings", "events", "lineitem",
                  "customer", "supplier", "nation", "region"):
        spark.read.parquet("%s/%s.parquet" % (sf_dir, table)).write.format(
            "noop").mode("overwrite").save()
    extras["warmup_sec"] = round(time.monotonic() - t_w, 3)

    # Best-of-N repeats per query (identical plan each repeat; reported =
    # min).  The first execution of any given plan pays one-time codegen
    # compilation + JIT that the generic session warmup above cannot reach
    # (codegen is cached per plan shape), plus whatever CPU-steal burst a
    # shared host injects — measured 3-4x swings on identical plans.  The
    # min over repeats is the reproducible operator cost; same methodology
    # as tools/bench_scaling.py (best-of-N per parallelism level).
    repeats = int(os.environ.get("SPARK_GRAFT_REPEATS", "2"))

    def timed(name, thunk):
        best = None
        for _ in range(repeats):
            t0 = time.monotonic()
            thunk()
            wall = time.monotonic() - t0
            best = wall if best is None else min(best, wall)
        timings[name] = round(best, 3)

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
        # unpersist so the next repeat measures the full pipeline, not
        # a cache read
        res.mentions.unpersist()
        res.canonical_map.unpersist()

    timed("kg_pipeline", run_kg)
    extras["kg_turns"] = n_turns
    extras["kg_triples"] = result["triples"]
    extras["kg_turns_per_sec"] = round(n_turns / timings["kg_pipeline"], 1)
    extras["kg_triples_per_sec"] = round(
        result["triples"] / timings["kg_pipeline"], 1)

    # --- operator headliners over the sf tables ---
    heads = [
        "graph_find_labels", "graph_bgp", "graph_in_degree",
        "sparql_select_bgp_stats",
        "dedup_minhash", "dedup_clusters", "text_simhash",
        "dedup_ngram_jaccard", "text_decontaminate",
        "embed_cosine_topk", "similarity_lsh_topk", "similarity_ivf_topk",
        "similarity_ivf_arrow",
        "events_sessions", "events_asof_signup", "events_quantiles",
        "pricing_summary", "pricing_pivot", "pricing_cube",
        "rdfs_entailment", "sparql_update_graphs", "kg_sameas_smush",
        "similarity_ivf_kmeans", "owl_entailment",
        "kg_shacl_paths", "kg_shacl_graphs", "sparql_path_mixed",
        "text_tfidf", "text_boilerplate", "text_chunks",
        "graph_shortest_paths", "graph_hits", "kg_graph_hashes",
        "kg_shacl_closed",
        "text_collocations", "graph_walks", "kg_void",
        "rdfs_graphs_entailment", "sample_weighted",
        # round 4: Arrow BPE apply, stdlib real PNG decode, negated-set
        # path atoms (kg_publish_pipeline is deliberately absent: it is
        # a fixture-scale composition capstone dominated by snapshot
        # control-plane latency, not a throughput query)
        "text_bpe_arrow", "multimodal_decode", "sparql_path_negated",
        # round 5: the training-data capstone (fuzzy-dedup -> quality
        # gate -> decontaminate -> split + token budgets as one query)
        # and the bucket-locality diagnostic join
        "data_prep_pipeline", "kg_edge_cut",
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

    extras["load_avg_end"] = [round(x, 2) for x in os.getloadavg()]
    extras["repeats_per_query"] = repeats

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
