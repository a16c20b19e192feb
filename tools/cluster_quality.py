"""Measured end-to-end quality of the cluster-dedup DECISION against
planted ground truth.

`sources/synth_docs.py` plants the truth: doc_id's group head
(floor(id/10)*10) is the expected canonical for every exact-dup
(lanes 0-1) and near-dup (lane 2) document; every other document is its
own canonical.  This script runs `minhash_dedup_clusters` over that
corpus and reports:

- canonical accuracy: fraction of documents whose assigned canonical_id
  equals the planted one;
- pairwise B-cubed precision / recall of the induced clustering vs the
  planted clustering (the standard coreference-quality decomposition).

Usage: python tools/cluster_quality.py [n_docs] [cpus]
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from pyspark.sql import functions as F

    from meresco_rdf_spark.session import get_spark
    from meresco_rdf_spark.sources.synth_docs import synthesize_documents
    from meresco_rdf_spark.textops.dedup import minhash_dedup_clusters

    spark = get_spark(app_name="cluster-quality", master="local[%d]" % cpus,
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    docs = synthesize_documents(spark, n_docs, partitions=cpus * 2)
    got = minhash_dedup_clusters(docs, threshold=0.5, hash_fn="xx")

    # planted truth, derived with the SAME lane expressions the generator
    # documents (doc -> expected canonical = its group head for dup lanes)
    lane = F.pmod(F.xxhash64("doc_id", F.lit("dup")), F.lit(10))
    is_dup = (F.col("doc_id") % 10 != 0) & (lane <= 2)
    truth = docs.select(
        "doc_id",
        F.when(is_dup, (F.floor(F.col("doc_id") / 10) * 10).cast("long"))
        .otherwise(F.col("doc_id")).alias("expected_canonical"))

    j = got.join(truth, "doc_id")
    agg = j.agg(
        F.count("*").alias("n"),
        F.sum((F.col("canonical_id") == F.col("expected_canonical"))
              .cast("long")).alias("n_correct")).first()

    # B-cubed over clusters: per doc, precision = |true-cluster inter
    # got-cluster| / |got-cluster|, recall = same / |true-cluster|
    sizes_got = j.groupBy("canonical_id").agg(
        F.count("*").alias("sz_got"))
    sizes_true = j.groupBy("expected_canonical").agg(
        F.count("*").alias("sz_true"))
    inter = j.groupBy("canonical_id", "expected_canonical").agg(
        F.count("*").alias("sz_inter"))
    b3 = (
        j.join(inter, ["canonical_id", "expected_canonical"])
        .join(sizes_got, "canonical_id")
        .join(sizes_true, "expected_canonical")
        .agg(F.avg(F.col("sz_inter") / F.col("sz_got")).alias("b3_precision"),
             F.avg(F.col("sz_inter") / F.col("sz_true")).alias("b3_recall"))
        .first())

    print(json.dumps({
        "metric": "cluster_dedup_quality", "n_docs": agg.n,
        "canonical_accuracy": round(agg.n_correct / agg.n, 6),
        "b3_precision": round(b3.b3_precision, 6),
        "b3_recall": round(b3.b3_recall, 6)}))
    spark.stop()


if __name__ == "__main__":
    main()
