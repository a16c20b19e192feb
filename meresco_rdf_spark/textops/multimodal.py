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


RESIZE_SCHEMA = StructType([
    StructField("media_id", StringType(), False),
    StructField("kind", StringType(), False),
    StructField("out_width", IntegerType(), False),
    StructField("out_height", IntegerType(), False),
    StructField("n_bytes", IntegerType(), False),
    StructField("digest", StringType(), True),     # md5 of the RGB hex
    StructField("payload", BinaryType(), True),    # raw RGB bytes
])

FRAME_SCHEMA = StructType([
    StructField("media_id", StringType(), False),
    StructField("frame_idx", IntegerType(), False),
    StructField("ts_ms", IntegerType(), False),
    StructField("digest", StringType(), True),
])


def resize_pixels(pixels, out_h: int, out_w: int):
    """Real resize kernel: nearest-neighbor resampling of an (H, W, 3)
    array — pure numpy index sampling, codec-independent (a decoded
    array in, a decoded array out), so the real branch is testable
    end-to-end with an injected decoder even in codec-less containers."""
    import numpy as np

    px = np.asarray(pixels)
    h, w = px.shape[0], px.shape[1]
    rows = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
    cols = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
    return px[rows][:, cols]


def _fake_hex_stream(payload: bytes, n_bytes: int, salt: str) -> str:
    """Deterministic pseudo-content: concat sha256 digests of the
    payload's lowercase hex + ':<salt>:<i>' until ``n_bytes`` are
    covered.  Pure VARCHAR arithmetic — reproducible bit-for-bit in an
    ANSI-SQL oracle (same reasoning as ``fake_feature``)."""
    h = payload.hex()
    chunks = []
    for i in range((n_bytes + 31) // 32):
        chunks.append(hashlib.sha256(
            ("%s:%s:%d" % (h, salt, i)).encode("ascii")).hexdigest())
    return "".join(chunks)[:n_bytes * 2]


def resize_images(media: DataFrame, out_w: int = 8, out_h: int = 8,
                  use_fake: bool = True, codec=None) -> DataFrame:
    """Distributed image resize over Arrow batches (image rows only).

    Real mode decodes with the probed/injected codec and resamples with
    ``resize_pixels`` (nearest-neighbor); fake mode synthesizes the
    ``out_h x out_w x 3`` RGB bytes from the sha256 hex stream of the
    payload, so plumbing, schema, row counts, sizes, and digests are all
    oracle-checkable without a codec.  ``digest`` = md5 of the RGB hex —
    the comparison handle (raw bytes ride along for downstream stages
    but comparisons never ship blobs)."""

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        decode = codec
        if not use_fake and decode is None:
            found = _image_codec()
            if found is None:
                raise NotImplementedError(
                    "real-resize mode needs Pillow or OpenCV on the "
                    "executors (or an injected codec)")
            decode = found[1]
        n = out_h * out_w * 3
        for pdf in batches:
            out = {k: [] for k in ("media_id", "kind", "out_width",
                                   "out_height", "n_bytes", "digest",
                                   "payload")}
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"],
                                          pdf["payload"]):
                if kind != "image" or payload is None:
                    continue
                if use_fake:
                    hx = _fake_hex_stream(bytes(payload), n, "resize")
                else:
                    px = resize_pixels(decode(bytes(payload)),
                                       out_h, out_w)
                    raw = (np.clip(np.asarray(px, dtype=np.float64), 0, 1)
                           * 255).astype(np.uint8)
                    hx = raw.tobytes().hex()
                out["media_id"].append(mid)
                out["kind"].append(kind)
                out["out_width"].append(out_w)
                out["out_height"].append(out_h)
                out["n_bytes"].append(n)
                out["digest"].append(
                    hashlib.md5(hx.encode("ascii")).hexdigest())
                out["payload"].append(bytes.fromhex(hx))
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=RESIZE_SCHEMA)


def sample_frames(media: DataFrame, n_frames: int = 4,
                  use_fake: bool = True, extractor=None) -> DataFrame:
    """Frame sampling over video rows: ``n_frames`` evenly spaced
    timestamps per item (``ts_ms = i * duration_ms / n_frames``), one
    output row per frame — a mapInPandas fan-out, no explode shuffle.

    Real mode calls ``extractor(payload, ts_ms) -> (H, W, 3) array``
    (a video codec seam — none ships in this container, so the probe
    mirror raises ``NotImplementedError`` unless injected); fake mode
    derives each frame's digest from the payload hex + frame index,
    keeping counts, spacing, and digests oracle-checkable."""

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        if not use_fake and extractor is None:
            raise NotImplementedError(
                "real frame sampling needs a video codec on the "
                "executors (inject an extractor callable)")
        for pdf in batches:
            out = {k: [] for k in ("media_id", "frame_idx", "ts_ms",
                                   "digest")}
            for mid, kind, payload, dur in zip(
                    pdf["media_id"], pdf["kind"], pdf["payload"],
                    pdf["duration_ms"]):
                if kind != "video" or payload is None:
                    continue
                dur = int(dur) if dur is not None else 0
                for i in range(n_frames):
                    ts = (i * dur) // n_frames
                    if use_fake:
                        hx = _fake_hex_stream(bytes(payload), 32,
                                              "frame:%d" % i)
                    else:
                        px = extractor(bytes(payload), ts)
                        raw = (np.clip(np.asarray(px, dtype=np.float64),
                                       0, 1) * 255).astype(np.uint8)
                        hx = raw.tobytes().hex()
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["ts_ms"].append(ts)
                    out["digest"].append(
                        hashlib.md5(hx.encode("ascii")).hexdigest())
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


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
