"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video travel as ``binary`` columns beside a typed metadata
struct; all heavy per-item work (decode, resize, feature-extract,
frame-sample) runs as Arrow-batched ``mapInPandas`` stages so payload
bytes never round-trip through Python row objects.

Image decode probes for a real codec at runtime (Pillow first, then
OpenCV — ``_image_codec``); when neither is importable (this container
ships neither), real-decode mode raises ``NotImplementedError`` with a
clear message and the deterministic fake remains the test-mode kernel.
The Spark-side contract (schemas, partitioning, UDF signatures, Arrow
batch shapes) is identical in all three modes and tested in all of
them — ``extract_features`` also accepts an injected ``codec`` callable
so the real-decode plumbing is exercised end-to-end even codec-less
(tests inject a stand-in decoder; on a cluster with Pillow installed
the probe finds it with zero code change).
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


def _image_codec():
    """Probe for an image codec library.  Returns ``(name, decode)`` —
    ``decode(payload: bytes) -> float32 ndarray (H, W, 3) in [0, 1]`` —
    or ``None`` when neither Pillow nor OpenCV is importable.  Runs on
    the worker (the probe result must reflect the EXECUTOR environment,
    not the driver's)."""
    try:  # pragma: no cover - codec libs absent in this container
        import io

        import numpy as np
        from PIL import Image

        def decode_pil(payload: bytes):
            img = Image.open(io.BytesIO(payload)).convert("RGB")
            return np.asarray(img, dtype=np.float32) / 255.0

        return ("pillow", decode_pil)
    except ImportError:
        pass
    try:  # pragma: no cover - codec libs absent in this container
        import cv2
        import numpy as np

        def decode_cv2(payload: bytes):
            arr = cv2.imdecode(np.frombuffer(payload, dtype=np.uint8),
                               cv2.IMREAD_COLOR)
            if arr is None:
                raise ValueError("undecodable image payload")
            return arr[:, :, ::-1].astype("float32") / 255.0  # BGR -> RGB

        return ("opencv", decode_cv2)
    except ImportError:
        return None


def decode_image(payload: bytes):
    """Real decode entry point: Pillow or OpenCV when available, a clear
    ``NotImplementedError`` otherwise."""
    codec = _image_codec()
    if codec is None:
        raise NotImplementedError(
            "image decoding requires Pillow or OpenCV, neither of which "
            "is importable in this environment; use fake_feature for "
            "deterministic test features")
    return codec[1](payload)


def pooled_feature(pixels, dim: int = 8) -> list[float]:
    """Decode-side feature kernel: mean grayscale intensity over ``dim``
    horizontal bands of the image — a deterministic, shape-robust
    embedding stand-in (swap in a model forward pass on a cluster that
    has one).  ``pixels``: float array (H, W, 3) in [0, 1]."""
    import numpy as np

    gray = np.asarray(pixels, dtype=np.float32).mean(axis=2)  # (H, W)
    bands = np.array_split(gray, dim, axis=0)
    return [float(b.mean()) if b.size else 0.0 for b in bands]


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
                     use_fake: bool = True,
                     codec=None) -> DataFrame:
    """Per-item feature extraction over Arrow batches.

    Modes: ``use_fake=True`` (default) hashes payloads into
    deterministic features (oracle-checkable, codec-less);
    ``use_fake=False`` decodes with the probed codec (Pillow/OpenCV) —
    or with ``codec`` (``bytes -> (H, W, 3) float array``) when given,
    which both injects real decoders without touching this module and
    lets tests drive the real-decode branch in codec-less containers
    (the callable ships to executors inside the closure).

    Scale: narrow mapInPandas — payloads stay in Arrow buffers between
    JVM and Python; batch size is bounded by
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` so executor memory
    holds O(batch x payload), not O(partition)."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        decode = codec
        if not use_fake and decode is None:
            found = _image_codec()   # probe on the WORKER
            if found is None:
                raise NotImplementedError(
                    "real-decode mode needs Pillow or OpenCV on the "
                    "executors (or an injected codec)")
            decode = found[1]
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                if use_fake:
                    feats.append(fake_feature(payload, dim))
                elif payload is None:
                    feats.append([0.0] * dim)
                else:
                    feats.append(pooled_feature(decode(payload), dim))
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
