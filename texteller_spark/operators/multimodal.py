"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The actual codec work (JPEG decode, audio resample, video frame extraction)
needs native libraries that are NOT in this container — those kernels are
STUBBED behind ``_decode_stub`` (a deterministic fake so plumbing is
testable end-to-end) and raise ``NotImplementedError`` when
``require_real=True``.  Everything Spark-side is real: schemas, batch
iteration, partition behavior, and output shapes are exactly what a
production decode stage uses — swap the stub body for PIL/ffmpeg on a
cluster with the libs installed.
"""

from __future__ import annotations

import io
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # real image codec, used by the require_real path when present
    from PIL import Image as _PILImage

    _HAVE_PIL = True
except ImportError:  # container has no codec libs — deterministic stubs only
    _HAVE_PIL = False

__all__ = [
    "MEDIA_SCHEMA",
    "attach_media",
    "decode_features",
    "sample_frames",
    "resize_media",
]

#: media sidecar: opaque payload + typed metadata (never inspected by Spark)
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("byte_entropy", T.DoubleType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)

_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), False),
    ]
)


def attach_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Derive a deterministic media sidecar from a text table (test fixture:
    payload = utf-8 bytes; at production the payload is the WARC media
    record). Demonstrates the schema + join-key discipline only."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        (F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                      (F.col(id_col) % 3 + 1).cast("int"))).alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )


def _decode_real_image(payload: bytes) -> np.ndarray:
    """Real image decode (PIL): pixels → the same 8-bin intensity histogram
    feature contract as the stub, computed over decoded grayscale pixels
    instead of raw container bytes."""
    img = _PILImage.open(io.BytesIO(payload)).convert("L")
    arr = np.asarray(img, dtype=np.uint8).ravel()
    hist = np.bincount(arr >> 5, minlength=8).astype(np.float64)
    return (hist / max(hist.sum(), 1.0)).astype(np.float32)


def _decode_stub(payload: bytes, kind: str, require_real: bool) -> np.ndarray:
    """Media decode. ``require_real=True`` uses the actual codec when the
    library is importable (PIL for images — import-gated so the path
    activates automatically on a container that ships it) and raises for
    codecs genuinely absent; the default is the deterministic fake (8-bin
    byte histogram, L1-normalized) that keeps plumbing testable here."""
    if require_real:
        if kind == "image" and _HAVE_PIL:
            return _decode_real_image(payload or b"")
        raise NotImplementedError(
            "real media decode for this kind requires PIL/librosa/ffmpeg — "
            "not available in this container; deploy with the codec libs"
        )
    arr = np.frombuffer(payload or b"\x00", dtype=np.uint8)
    hist = np.bincount(arr >> 5, minlength=8).astype(np.float64)
    return (hist / max(hist.sum(), 1.0)).astype(np.float32)


def decode_features(df: DataFrame, require_real: bool = False) -> DataFrame:
    """media table → per-item feature vectors, Arrow-batched (mapInPandas).

    The batch shape is the production contract: iterator of pandas frames,
    one output row per input row, fixed feature dim.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_stub(p, k, require_real)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            ent = [
                float(-(f[f > 0] * np.log2(f[f > 0])).sum()) for f in
                (np.asarray(x, dtype=np.float64) for x in feats)
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p or b"") for p in pdf["payload"]],
                    "byte_entropy": ent,
                    "feature": feats,
                }
            )

    return df.mapInPandas(run, schema=_FEATURE_SCHEMA)


def _resize_stub(payload: bytes, w: int, h: int, require_real: bool) -> bytes:
    """Image resize. ``require_real=True`` + PIL → actual bicubic resize to
    (w, h), re-encoded PNG (the reference resizes to ≤448²,
    transforms.py:89-97). Default: deterministic fake — stride-subsample the
    payload to exactly ``w*h`` bytes (pad with zeros when shorter), so the
    output size contract (fixed target dims) is real and testable."""
    if require_real:
        if _HAVE_PIL:
            img = _PILImage.open(io.BytesIO(payload or b""))
            out = io.BytesIO()
            img.resize((w, h), _PILImage.BICUBIC).save(out, format="PNG")
            return out.getvalue()
        raise NotImplementedError(
            "real image resize requires PIL/cv2 — not available in this "
            "container; deploy with the codec libs"
        )
    p = payload or b"\x00"
    n = w * h
    if len(p) >= n:
        stride = len(p) // n
        return p[:: stride][:n]
    return p + b"\x00" * (n - len(p))


def resize_media(
    df: DataFrame, width: int = 448, height: int = 448, require_real: bool = False
) -> DataFrame:
    """media table → payloads resized to fixed target dims (the analog of
    the reference's 448×448 inference transform), Arrow-batched
    ``mapInPandas``; ``width``/``height`` metadata updated to the target.
    Only ``kind='image'`` rows are transformed; others pass through
    untouched (same schema in and out, so stages compose)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            is_img = out["kind"] == "image"
            out.loc[is_img, "payload"] = [
                _resize_stub(p, width, height, require_real)
                for p in out.loc[is_img, "payload"]
            ]
            out.loc[is_img, "width"] = width
            out.loc[is_img, "height"] = height
            out["width"] = out["width"].astype("Int32")
            out["height"] = out["height"].astype("Int32")
            yield out

    return df.mapInPandas(run, schema=MEDIA_SCHEMA)


def sample_frames(df: DataFrame, every_bytes: int = 256, max_frames: int = 8) -> DataFrame:
    """Video frame-sampling analog: emit ≤ ``max_frames`` payload slices per
    item (1:N mapInPandas fan-out — the UDTF-shaped batch contract)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                p = payload or b""
                for i in range(min(max_frames, max(1, len(p) // every_bytes))):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["frame"].append(p[i * every_bytes : (i + 1) * every_bytes])
            yield pd.DataFrame(out)

    return df.filter(F.col("kind") == "video").mapInPandas(run, schema=_FRAME_SCHEMA)
