"""Measured recall of the approximate ANN strategies vs the exact
cosine top-k, on the real embeddings table — evidence that the
bucketed scale paths trade recall for candidate pruning in a
quantified way, not by assumption.

Usage: python tools/ann_recall.py [sf_dir] [k] [n_queries]
Prints one JSON line with recall@k and the candidate fraction
(candidates examined / corpus size — the pruning win) per strategy.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    n_queries = int(sys.argv[3]) if len(sys.argv) > 3 else 100

    from pyspark.sql import functions as F

    from meresco_rdf_spark.session import get_spark
    from meresco_rdf_spark.textops.similarity import (
        cosine_topk,
        hyperplane_signature,
        ivf_bucket,
        ivf_topk,
        lsh_topk,
    )

    spark = get_spark(app_name="ann-recall", master="local[8]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet("%s/embeddings.parquet" % sf_dir).cache()
    n_corpus = emb.count()
    queries = emb.filter(F.col("vec_id") < n_queries).withColumnRenamed(
        "vec_id", "query_id")

    def topk_set(df):
        return {(r.query_id, r.neighbor_id) for r in df.collect()}

    exact = topk_set(cosine_topk(emb, queries, k=k))

    # the driver-query parameterizations, plus the IVF probes sweep
    # (recall must degrade gracefully toward exact at probes=n_pivots)
    strategies = {
        "lsh": lsh_topk(emb, queries, k=k, n_planes=8, bands=4, dim=64),
    }
    for probes in (2, 4, 8):
        strategies["ivf_p%d" % probes] = ivf_topk(
            emb, queries, k=k, n_pivots=8, probes=probes, dim=64)

    # candidate fractions, computed from the bucketing directly
    sig = hyperplane_signature(F.col("embedding"), 8, 64)
    bands = emb.select(
        F.col("vec_id"),
        *[F.substring(sig, b * 2 + 1, 2).alias("b%d" % b) for b in range(4)])
    lsh_cand = 0
    for b in range(4):
        sizes = bands.groupBy("b%d" % b).count().collect()
        lsh_cand += sum(r["count"] * r["count"] for r in sizes)
    lsh_frac = lsh_cand / (4 * n_corpus * n_corpus)

    buckets = emb.select(ivf_bucket(F.col("embedding"), 8, 64).alias("bk"))
    sizes = {r.bk: r["count"] for r in buckets.groupBy("bk").count().collect()}
    # each query probes its 2 best lists; upper-bound with the 2 largest
    top2 = sorted(sizes.values(), reverse=True)[:2]
    ivf_frac = sum(top2) / n_corpus

    out = {"k": k, "n_queries": n_queries, "n_corpus": n_corpus,
           "exact_pairs": len(exact)}
    for name, df in strategies.items():
        approx = topk_set(df)
        out["%s_recall" % name] = round(len(approx & exact) / len(exact), 4)
    out["lsh_candidate_fraction"] = round(lsh_frac, 4)
    out["ivf_candidate_fraction_ub"] = round(ivf_frac, 4)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
