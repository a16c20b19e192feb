"""Measured near-dup quality: the bucketed approximate strategies vs
exact n-gram Jaccard ground truth on the real documents table.

- ground truth: ``ngram_jaccard_pairs`` (lossless prefix filtering —
  exact Jaccard over all candidate pairs) at the given threshold;
- MinHash-LSH: banding prunes candidates, then exact-Jaccard verify —
  so precision is 1.0 by construction and the number that needs
  MEASURING is recall (pairs the banding never surfaces);
- SimHash: a different similarity (fingerprint Hamming distance), so
  both precision and recall vs the Jaccard truth are reported — it is
  a complement, not a substitute, and the numbers show where.

Usage: python tools/dedup_quality.py [sf_dir] [threshold]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    threshold = float(sys.argv[2]) if len(sys.argv) > 2 else 0.6

    from meresco_rdf_spark.session import get_spark
    from meresco_rdf_spark.textops.dedup import (
        minhash_dedup_pairs,
        ngram_jaccard_pairs,
        simhash_dup_pairs,
    )

    spark = get_spark(app_name="dedup-quality", master="local[8]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet("%s/documents.parquet" % sf_dir).cache()
    n_docs = docs.count()

    def pairs(df):
        return {(r.a, r.b) for r in df.select("a", "b").collect()}

    truth = pairs(ngram_jaccard_pairs(docs, threshold=threshold))
    out = {"n_docs": n_docs, "threshold": threshold,
           "true_pairs": len(truth)}

    for bands, k in ((8, 16), (4, 16)):
        mh = pairs(minhash_dedup_pairs(
            docs, k=k, bands=bands, threshold=threshold, hash_fn="xx"))
        tp = len(mh & truth)
        out["minhash_b%d_recall" % bands] = round(tp / len(truth), 4)
        # verify step enforces exact Jaccard >= threshold: precision 1.0
        out["minhash_b%d_precision" % bands] = (
            round(tp / len(mh), 4) if mh else 1.0)

    # SimHash bit-width sweep: wider fingerprints separate sharply
    # (32-bit Hamming<=3 is far too loose on short template-y docs)
    for n_bits, mh, bands in ((32, 3, 4), (64, 3, 4), (128, 3, 4)):
        sh = pairs(simhash_dup_pairs(
            docs, n_bits=n_bits, max_hamming=mh, bands=bands))
        key = "simhash%d" % n_bits
        out["%s_pairs" % key] = len(sh)
        out["%s_precision_vs_jaccard" % key] = (
            round(len(sh & truth) / len(sh), 4) if sh else None)
        out["%s_recall_vs_jaccard" % key] = round(
            len(sh & truth) / len(truth), 4)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
