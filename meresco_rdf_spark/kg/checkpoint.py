"""Per-partition checkpoint manifest: lineage + metrics + resume.

North_star requirement: "resumable from per-partition checkpoints carrying
lineage and triple-count metrics".  The resume unit is a **conversation
bucket** — ``pmod(xxhash64(conv_id), n_buckets)`` — because every pipeline
stage up to canonicalization is conv-local and mention/bnode ids are
deterministic (kg/extract.py), so re-running a bucket is idempotent.

The manifest is itself a tiny parquet table, one row per completed bucket:

    bucket int, status string, n_turns long, n_mentions long,
    n_triples long, input_fingerprint string, run_id string, ts timestamp

``input_fingerprint`` is an order-insensitive xxhash of the bucket's input
rows — lineage: a resume with changed input invalidates the bucket instead
of silently skipping it.  The driver-side logic reads ONLY the manifest
(a few KB) — no driver iteration over data.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

MANIFEST_SCHEMA = (
    "bucket int, status string, n_turns long, n_mentions long, "
    "n_triples long, input_fingerprint string, run_id string, ts double, "
    "n_buckets int"
)


def bucket_of(conv_id_col, n_buckets: int):
    return F.pmod(F.xxhash64(conv_id_col), F.lit(n_buckets)).cast("int")


def input_fingerprints(transcripts: DataFrame, n_buckets: int) -> DataFrame:
    """(bucket, n_turns, input_fingerprint): order-insensitive row-hash sum
    per bucket — one agg over the input, no collect of data rows."""
    hashed = transcripts.select(
        bucket_of(F.col("conv_id"), n_buckets).alias("bucket"),
        F.xxhash64(
            F.col("conv_id"), F.col("turn_idx"), F.col("role"),
            F.col("text"), F.col("tool"), F.col("ts")).alias("h"))
    # decimal(38,0) accumulator: order-insensitive and overflow-proof under
    # ANSI mode (a plain long sum of xxhash64 values overflows)
    return hashed.groupBy("bucket").agg(
        F.count("*").alias("n_turns"),
        F.sum(F.col("h").cast("decimal(38,0)")).cast("string")
        .alias("input_fingerprint"))


def read_manifest(spark: SparkSession, manifest_path: str) -> DataFrame:
    if not os.path.exists(manifest_path):
        return spark.createDataFrame([], MANIFEST_SCHEMA)
    return spark.read.schema(MANIFEST_SCHEMA).parquet(manifest_path)


def check_bucket_scheme(spark: SparkSession, manifest_path: str,
                        n_buckets: int) -> None:
    """Refuse to resume against a manifest written with a different
    ``n_buckets``: the bucket function changes, so every prior
    bucket->conversation assignment (and every raw_triples subtree) is
    invalid — silently mixing schemes resurrects or drops rows."""
    manifest = read_manifest(spark, manifest_path)
    schemes = [r.n_buckets for r in
               manifest.select("n_buckets").dropDuplicates().collect()
               if r.n_buckets is not None]
    if any(s != n_buckets for s in schemes):
        raise ValueError(
            "manifest at %s was written with n_buckets=%s; resume with the "
            "same value or clear the output directory" % (manifest_path, schemes))


def pending_buckets(spark: SparkSession, transcripts: DataFrame,
                    manifest_path: str, n_buckets: int) -> list[int]:
    """Buckets not yet completed with an unchanged input fingerprint.
    Driver-side result is a list of bucket ids (size n_buckets max).
    Per bucket, only the LATEST manifest row counts (re-runs append)."""
    fp = input_fingerprints(transcripts, n_buckets)
    latest = (
        read_manifest(spark, manifest_path)
        .groupBy("bucket")
        .agg(F.max_by(F.struct("input_fingerprint", "status"), "ts").alias("m"))
    )
    done = (
        latest.filter(F.col("m.status") == "done")
        .select("bucket", F.col("m.input_fingerprint").alias("done_fp"))
    )
    pending = (
        fp.join(done, "bucket", "left")
        .filter(
            F.col("done_fp").isNull()
            | (F.col("done_fp") != F.col("input_fingerprint")))
        .select("bucket")
    )
    return sorted(r.bucket for r in pending.collect())


def record_done(spark: SparkSession, manifest_path: str, bucket: int,
                n_turns: int, n_mentions: int, n_triples: int,
                input_fingerprint: str, run_id: str,
                n_buckets: int) -> None:
    row = [(bucket, "done", n_turns, n_mentions, n_triples,
            input_fingerprint, run_id, time.time(), n_buckets)]
    spark.createDataFrame(row, MANIFEST_SCHEMA).write.mode("append").parquet(
        manifest_path)


def drop_stale_buckets(spark: SparkSession, out_dir: str,
                       manifest_path: str, live_buckets: set[int],
                       run_id: str,
                       roots: tuple[str, ...] = ("raw_triples",
                                                 "label_counts")) -> list[int]:
    """Delete per-bucket checkpoint subtrees (raw triples AND label
    counts) for buckets absent from the CURRENT input (every conversation
    deleted, or never existed) and tombstone them in the manifest.
    Without this, a fully-deleted bucket's parquet survives and its rows
    resurrect in the global phase — breaking the 'changed input
    invalidates the bucket' lineage contract."""
    import shutil

    raw_root = os.path.join(out_dir, roots[0])
    if not os.path.isdir(raw_root):
        return []
    stale = []
    for name in os.listdir(raw_root):
        if not name.startswith("bucket="):
            continue
        bucket = int(name.split("=", 1)[1])
        if bucket not in live_buckets:
            for root in roots:
                sub = os.path.join(out_dir, root, name)
                if os.path.isdir(sub):
                    shutil.rmtree(sub)
            stale.append(bucket)
    if stale:
        rows = [(b, "deleted", 0, 0, 0, "", run_id, time.time(), None)
                for b in stale]
        spark.createDataFrame(rows, MANIFEST_SCHEMA).write.mode(
            "append").parquet(manifest_path)
    return sorted(stale)
