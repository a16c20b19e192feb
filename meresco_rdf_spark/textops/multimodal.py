"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video travel as ``binary`` columns beside a typed metadata
struct; all heavy per-item work (decode, resize, feature-extract,
frame-sample) runs as Arrow-batched ``mapInPandas`` stages so payload
bytes never round-trip through Python row objects.

The decode kernels themselves are STUBS: the codec libraries (PIL,
ffmpeg, torchaudio, ...) are not in this container.  Each stub either
raises ``NotImplementedError`` (real-decode mode) or produces a
deterministic fake (test mode) — the Spark-side contract (schemas,
partitioning, UDF signatures, Arrow batch shapes) is real and tested,
so dropping in a real codec is a one-function change.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", StringType(), False),
    StructField("kind", StringType(), False),      # image | audio | video
    StructField("mime", StringType(), True),
    StructField("payload", BinaryType(), True),    # opaque encoded bytes
    StructField("width", IntegerType(), True),     # image/video
    StructField("height", IntegerType(), True),
    StructField("duration_ms", IntegerType(), True),  # audio/video
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", StringType(), False),
    StructField("kind", StringType(), False),
    StructField("n_bytes", IntegerType(), True),
    StructField("feature", ArrayType(FloatType()), True),
])


def decode_image(payload: bytes):  # pragma: no cover - real-codec path
    """Real decode entry point — requires an image codec library."""
    raise NotImplementedError(
        "image decoding requires a codec library not present in this "
        "environment; use fake_feature for deterministic test features")


def fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in feature: sha256-derived floats in [0, 1).
    Replaces the decode+embed kernel in tests; same signature and shape.
    Hashes the payload's LOWERCASE HEX (not the raw bytes): ANSI-SQL
    oracles only ship VARCHAR hash functions, and this choice makes the
    stub reproducible bit-for-bit in DuckDB (`sha256(hex)`) while staying
    just as deterministic."""
    if payload is None:
        return [0.0] * dim
    digest = hashlib.sha256(payload.hex().encode("ascii")).digest()
    return [digest[i % len(digest)] / 255.0 for i in range(dim)]


def extract_features(media: DataFrame, dim: int = 8,
                     use_fake: bool = True) -> DataFrame:
    """Per-item feature extraction over Arrow batches.

    Scale: narrow mapInPandas — payloads stay in Arrow buffers between
    JVM and Python; batch size is bounded by
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` so executor memory
    holds O(batch x payload), not O(partition)."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                if use_fake:
                    feats.append(fake_feature(payload, dim))
                else:
                    feats.append(decode_image(payload))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                "feature": feats,
            })

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def synthesize_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes) for tests
    and plumbing benchmarks."""
    df = spark.range(n)
    payload = F.unhex(F.sha2(F.concat(F.lit("media-%d-" % seed), F.col("id")), 256))
    return df.select(
        F.concat(F.lit("m"), F.col("id")).alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int")).alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        payload.alias("payload"),
        F.lit(64).alias("width"), F.lit(64).alias("height"),
        F.lit(1000).alias("duration_ms"),
    )
