"""Measured recall of the ANN scale configs (Arrow path, many pivots)
vs exact cosine top-k, on the clustered synthetic corpus — the
complement to tools/ann_recall.py (which measures the small
driver-query parameterizations on the real sf embeddings table).

Pivots here are data-independent (sha1-derived, untrained), so recall
quantifies what the storage-free quantizer actually buys at a given
candidate fraction — no k-means flattery.

Usage: python tools/ann_recall_scale.py [n_vecs] [n_queries] [k]
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")


def main() -> None:
    n_vecs = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    from pyspark.sql import functions as F

    from meresco_rdf_spark.session import get_spark
    from meresco_rdf_spark.sources.synth_vecs import synthesize_embeddings
    from meresco_rdf_spark.textops.similarity import (
        cosine_topk,
        ivf_topk,
        lsh_topk,
    )

    spark = get_spark(app_name="ann-recall-scale", master="local[8]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    emb = synthesize_embeddings(spark, n_vecs, dim=64, n_clusters=256).cache()
    emb.count()
    queries = (synthesize_embeddings(spark, n_queries * 7, dim=64,
                                     n_clusters=256)
               .filter(F.col("vec_id") % 7 == 0)
               .withColumnRenamed("vec_id", "query_id"))

    def topk_set(df):
        return {(r.query_id, r.neighbor_id) for r in df.collect()}

    exact = topk_set(cosine_topk(emb, queries, k=k))

    out = {"metric": "ann_recall_scale", "n_vecs": n_vecs,
           "n_queries": n_queries, "k": k, "strategies": {}}
    configs = [("ivf64_p%d" % p,
                lambda p=p: ivf_topk(emb, queries, k=k, n_pivots=64,
                                     probes=p, dim=64, use_arrow=True),
                p / 64.0)
               for p in (4, 8, 16)]
    configs.append(("lsh16_b4",
                    lambda: lsh_topk(emb, queries, k=k, n_planes=16,
                                     dim=64, bands=4, use_arrow=True),
                    2 ** -4))
    for name, build, cand_frac in configs:
        got = topk_set(build())
        recall = len(got & exact) / max(len(exact), 1)
        out["strategies"][name] = {"recall": round(recall, 3),
                                   "cand_frac_approx": round(cand_frac, 4)}

    # trained vs untrained coarse quantizer, metric held fixed (exact
    # integer L2; probes=n_pivots is exhaustive so it IS the truth set):
    # n_iter=0 keeps the init centroids (first n_pivots data vectors),
    # n_iter=3 is Lloyd-trained — the delta is what training buys at the
    # same probe budget.
    from meresco_rdf_spark.textops.kmeans import ivf_kmeans_topk

    exact_l2 = topk_set(ivf_kmeans_topk(emb, queries, k=k, n_pivots=64,
                                        n_iter=3, probes=64))
    for n_iter in (0, 3):
        for p in (4, 8):
            got = topk_set(ivf_kmeans_topk(emb, queries, k=k, n_pivots=64,
                                           n_iter=n_iter, probes=p))
            recall = len(got & exact_l2) / max(len(exact_l2), 1)
            out["strategies"]["kmeans64_i%d_p%d" % (n_iter, p)] = {
                "recall": round(recall, 3),
                "cand_frac_approx": round(p / 64.0, 4)}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
