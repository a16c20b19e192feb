"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video travel as ``binary`` columns beside a typed metadata
struct; all heavy per-item work (decode, resize, feature-extract,
frame-sample) runs as Arrow-batched ``mapInPandas`` stages so payload
bytes never round-trip through Python row objects.

Image decode probes for a real codec at runtime (Pillow first, then
OpenCV, then the always-available pure-stdlib PNG decoder
``decode_png`` — ``_image_codec``).  The stdlib branch makes REAL
decode executable even in containers shipping neither library (this
one); it covers 8-bit grey/RGB/(+alpha) non-interlaced PNG, and any
payload outside that subset still raises ``NotImplementedError`` with
a clear message.  The deterministic fake remains the default
test-mode kernel for oracle-checkable plumbing runs.
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


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(payload: bytes):
    """Pure-stdlib PNG decoder (zlib inflate + per-row filter
    reconstruction, PNG spec §9): 8-bit greyscale / greyscale+alpha /
    RGB / RGBA, non-interlaced.  Returns float32 (H, W, 3) in [0, 1]
    (grey broadcast to RGB, alpha dropped) — the same contract as the
    Pillow/OpenCV decoders, so the REAL decode branch is executable in
    containers that ship neither.  Raises ``NotImplementedError`` for
    non-PNG payloads and for PNG variants outside this subset (palette,
    16-bit, interlaced), ``ValueError`` for corrupt PNG streams."""
    import struct
    import zlib

    import numpy as np

    if not isinstance(payload, (bytes, bytearray)) \
            or not bytes(payload[:8]) == _PNG_MAGIC:
        raise NotImplementedError(
            "stdlib codec decodes PNG only (payload lacks the PNG "
            "signature); other image formats require Pillow or OpenCV")
    data = bytes(payload)
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack(">I", data[pos:pos + 4]), \
            data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated PNG chunk %r" % ctype)
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + body + crc
    if ihdr is None or not idat:
        raise ValueError("PNG stream missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or color not in (0, 2, 4, 6):
        raise NotImplementedError(
            "stdlib PNG codec supports 8-bit grey/RGB/(+alpha) only "
            "(depth=%d colorType=%d); install Pillow or OpenCV for "
            "palette/16-bit images" % (depth, color))
    if interlace != 0:
        raise NotImplementedError(
            "stdlib PNG codec does not support Adam7 interlacing; "
            "install Pillow or OpenCV")
    if comp != 0 or filt != 0:
        raise ValueError("nonstandard PNG compression/filter method")
    nchan = {0: 1, 2: 3, 4: 2, 6: 4}[color]
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        raise ValueError("corrupt PNG IDAT stream: %s" % e)
    stride = w * nchan
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel data size mismatch")
    prev = bytearray(stride)
    rows = []
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)])
        if ftype == 1:      # Sub
            for i in range(nchan, stride):
                line[i] = (line[i] + line[i - nchan]) & 0xFF
        elif ftype == 2:    # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:    # Average
            for i in range(stride):
                left = line[i - nchan] if i >= nchan else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:    # Paeth
            for i in range(stride):
                left = line[i - nchan] if i >= nchan else 0
                ul = prev[i - nchan] if i >= nchan else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif ftype != 0:    # None
            raise ValueError("invalid PNG filter type %d" % ftype)
        prev = line
        rows.append(line)
    px = np.frombuffer(b"".join(bytes(r) for r in rows),
                       dtype=np.uint8).reshape(h, w, nchan)
    if color in (0, 4):     # grey (+alpha) -> RGB
        px = np.repeat(px[:, :, :1], 3, axis=2)
    elif color == 6:        # drop alpha
        px = px[:, :, :3]
    return px.astype(np.float32) / 255.0


def encode_png(pixels, filter_per_row=None) -> bytes:
    """Pure-stdlib PNG writer for deterministic test/bench payloads:
    8-bit RGB, non-interlaced.  ``pixels``: (H, W, 3) uint8-compatible
    array; ``filter_per_row(y) -> 0..4`` selects each row's filter type
    (default 0), letting tests exercise every reconstruction branch of
    ``decode_png``."""
    import struct
    import zlib

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w = px.shape[0], px.shape[1]
    stride = w * 3

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))

    raw = bytearray()
    prev = bytearray(stride)
    for y in range(h):
        line = bytearray(px[y].tobytes())
        ftype = filter_per_row(y) if filter_per_row else 0
        enc = bytearray(line)
        if ftype == 1:
            for i in range(stride - 1, 2, -1):
                enc[i] = (line[i] - line[i - 3]) & 0xFF
        elif ftype == 2:
            for i in range(stride):
                enc[i] = (line[i] - prev[i]) & 0xFF
        elif ftype == 3:
            for i in range(stride):
                left = line[i - 3] if i >= 3 else 0
                enc[i] = (line[i] - ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:
            for i in range(stride):
                left = line[i - 3] if i >= 3 else 0
                ul = prev[i - 3] if i >= 3 else 0
                enc[i] = (line[i] - _paeth(left, prev[i], ul)) & 0xFF
        elif ftype != 0:
            raise ValueError("invalid filter type %d" % ftype)
        raw.append(ftype)
        raw.extend(enc)
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (_PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw), 9))
            + chunk(b"IEND", b""))


def _image_codec():
    """Probe for an image codec library.  Returns ``(name, decode)`` —
    ``decode(payload: bytes) -> float32 ndarray (H, W, 3) in [0, 1]``.
    Pillow, then OpenCV, then the always-available stdlib PNG decoder
    (``decode_png`` — PNG-only, so non-PNG payloads still gate loudly
    with ``NotImplementedError``).  Runs on the worker (the probe result
    must reflect the EXECUTOR environment, not the driver's)."""
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
        pass
    return ("stdlib-png", decode_png)


def decode_image(payload: bytes):
    """Real decode entry point: Pillow or OpenCV when available, the
    stdlib PNG decoder otherwise (non-PNG payloads then raise a clear
    ``NotImplementedError``)."""
    codec = _image_codec()
    if codec is None:  # pragma: no cover - stdlib probe always succeeds
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
            # probe on the WORKER; never None — the stdlib PNG decoder
            # is the always-available last resort (non-PNG payloads
            # gate inside it)
            decode = _image_codec()[1]
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
            # worker-side probe; never None (stdlib PNG last resort)
            decode = _image_codec()[1]
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


def synthesize_png_media(spark, n: int = 64, size: int = 16,
                         seed: int = 0) -> DataFrame:
    """Deterministic REAL-PNG media table: item ``m``'s pixel
    ``(y, x, c) = (3x + 5y + 7m + 11c + seed) % 256`` — a closed form
    an ANSI-SQL oracle can re-derive — encoded worker-side by
    ``encode_png`` with the row filter cycling through all five PNG
    filter types (``y % 5``), so downstream real-decode stages exercise
    every reconstruction branch.  Payload generation is a mapInPandas
    over ``spark.range``: embarrassingly parallel, no driver loop."""

    def gen(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        y, x, c = np.meshgrid(np.arange(size), np.arange(size),
                              np.arange(3), indexing="ij")
        base = 3 * x + 5 * y + 11 * c + seed
        for pdf in batches:
            rows = {k: [] for k in ("media_id", "kind", "mime", "payload",
                                    "width", "height", "duration_ms")}
            for m in pdf["id"]:
                px = ((base + 7 * int(m)) % 256).astype(np.uint8)
                rows["media_id"].append("png%d" % int(m))
                rows["kind"].append("image")
                rows["mime"].append("image/png")
                rows["payload"].append(
                    encode_png(px, filter_per_row=lambda yy: yy % 5))
                rows["width"].append(size)
                rows["height"].append(size)
                rows["duration_ms"].append(None)
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


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
