"""A/B: MinHash signature computation strategies, measured not guessed.

Arm A (current): ``F.array_min(F.transform(shingles, xxhash64(., i)))``
x k over the cached shingle ARRAY — narrow (no shuffle), but Catalyst
evaluates higher-order functions interpreted (no whole-stage codegen),
so it's k interpreted traversals per doc.

Arm B (candidate): ``groupBy(id).agg(min(xxhash64(shingle, i)) x k)``
over the already-exploded inverted index — one extra exchange of
O(docs x k x hash-bytes) AFTER map-side partial min (each partition
collapses a doc to one row), but every hash + min runs inside
whole-stage codegen.

Both arms band the signatures identically and count the banded
relation, and assert identical banded fingerprints (same min over the
same string expression => same signature).

Usage: python tools/bench_minhash_sig.py [n_docs] [cpus]
Env: REPEATS (default 2).  Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F


def banded_from_sig(sig, k, bands):
    rows = k // bands
    return sig.select(
        "id",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band_id"),
                F.concat_ws("|", *[F.col("sig")[b * rows + r]
                                   for r in range(rows)]).alias("band_key"))
            for b in range(bands)
        ])).alias("band"),
    ).select("id", "band.band_id", "band.band_key")


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    repeats = int(os.environ.get("REPEATS", "2"))

    from meresco_rdf_spark.session import get_spark
    from meresco_rdf_spark.sources.synth_docs import synthesize_documents
    from meresco_rdf_spark.textops.dedup import (_perm_hash_xx,
                                                 word_shingles_arrow)

    k, bands, n = 16, 8, 3
    spark = get_spark(app_name="minhash-sig-ab", master="local[%d]" % cpus,
                      shuffle_partitions=cpus,
                      extra_conf={"spark.locality.wait": "0"})
    spark.sparkContext.setLogLevel("ERROR")
    docs = synthesize_documents(spark, n_docs, partitions=cpus * 2)
    sh = docs.select(
        F.col("doc_id").alias("id"),
        word_shingles_arrow(F.col("text"), n).alias("shingles")).persist()
    sh.count()  # shingling cost excluded from both arms

    def arm_a():
        def perm_min(i):
            return F.coalesce(
                F.array_min(F.transform(F.col("shingles"),
                                        lambda x: _perm_hash_xx(x, i))),
                F.lit("~"))
        sig = sh.withColumn("sig", F.array(*[perm_min(i) for i in range(k)]))
        return banded_from_sig(sig, k, bands)

    def arm_b():
        inv = sh.select("id", F.explode("shingles").alias("shingle"))
        agg = inv.groupBy("id").agg(*[
            F.min(_perm_hash_xx(F.col("shingle"), i)).alias("h%d" % i)
            for i in range(k)])
        sig = agg.select(
            "id", F.array(*[F.coalesce(F.col("h%d" % i), F.lit("~"))
                            for i in range(k)]).alias("sig"))
        return banded_from_sig(sig, k, bands)

    # identical output check (order-insensitive)
    mismatch = arm_a().exceptAll(arm_b()).count() + \
        arm_b().exceptAll(arm_a()).count()
    assert mismatch == 0, "arms disagree: %d rows" % mismatch

    def force(df):
        # checksum over EVERY output column: a bare count() lets Catalyst
        # prune the hash/min expressions away and measures only the scan
        return df.agg(F.bit_xor(F.xxhash64("id", "band_id", "band_key"))
                      ).collect()[0][0]

    walls = {}
    for name, build in [("transform_narrow", arm_a), ("agg_codegen", arm_b)]:
        force(build())  # warmup per arm
        times = []
        for _ in range(repeats):
            t0 = time.monotonic()
            force(build())
            times.append(round(time.monotonic() - t0, 2))
        walls[name] = {"wall": min(times), "walls": times}
    print(json.dumps({"metric": "minhash_sig_ab", "n_docs": n_docs,
                      "cpus": cpus, "k": k, **walls,
                      "speedup_b_over_a": round(
                          walls["transform_narrow"]["wall"]
                          / walls["agg_codegen"]["wall"], 2)}))
    spark.stop()


if __name__ == "__main__":
    main()
