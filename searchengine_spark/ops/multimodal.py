"""Multimodal (image/audio/video) columns as opaque ``binary`` payloads
with typed metadata — the Spark-side plumbing (schema, partitioning,
Arrow batch shape, UDF signatures) is real and tested, and the resize
kernel is a real pure-numpy bilinear resample. The EXTERNAL codec
entry point (``decode_real_image``) is an OPTIONAL dependency: a
working PIL grayscale decode when pillow is installed, absent (None)
otherwise — so in this container (no PIL/ffmpeg-class libraries) the
deterministic synthetic raster format stands in and the optional path
is unreachable unless a non-synthetic payload is fed in.

Synthetic payload format (deterministic per (seed, media_id)):
``IMG1`` magic + width·height unsigned bytes row-major (grayscale), so
"decoding" is a byte reinterpretation — byte-exact across engines and
parallelism levels.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAGIC = b"IMG1"

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("channels", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                ]
            ),
        ),
    ]
)


def synth_payload(media_id: int, seed: int = 42, width: int = 32,
                  height: int = 32) -> bytes:
    """Deterministic pseudo-image: sha256-seeded byte raster."""
    out = bytearray(MAGIC)
    counter = 0
    need = width * height
    while len(out) - len(MAGIC) < need:
        h = hashlib.sha256(f"{seed}:{media_id}:{counter}".encode()).digest()
        out.extend(h)
        counter += 1
    return bytes(out[: len(MAGIC) + need])


def media_df(spark: SparkSession, n: int, seed: int = 42,
             partitions: int | None = None) -> DataFrame:
    """Distributed deterministic media table (spark.range → mapInPandas,
    same generator-scales-out property as corpus.pages_df)."""

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                kind = ("image", "audio", "video")[i % 3]
                rows.append(
                    {
                        "media_id": i,
                        "kind": kind,
                        "payload": synth_payload(i, seed),
                        "meta": {
                            "width": 32,
                            "height": 32,
                            "channels": 1,
                            "sample_rate": 16000 if kind == "audio" else 0,
                            "n_frames": 8 if kind == "video" else 1,
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(n, numPartitions=partitions).mapInPandas(gen, MEDIA_SCHEMA)


def _decode_raster(payload: bytes, width: int, height: int) -> np.ndarray:
    if bytes(payload[:4]) != MAGIC:
        raise ValueError("not a synthetic IMG1 payload")
    arr = np.frombuffer(bytes(payload[4:4 + width * height]), dtype=np.uint8)
    return arr.reshape(height, width)


# Real-codec path — OPTIONAL dependency: when PIL is importable the
# decoder below is a working grayscale decode; when it isn't (this
# container), ``decode_real_image`` is None and only a non-synthetic
# payload can reach the clear ImportError in ``_decode_payload`` —
# the synthetic-IMG1 pipeline never touches the optional path.
try:  # pragma: no cover - PIL absent in the build container
    from PIL import Image as _PILImage

    def decode_real_image(payload: bytes) -> "np.ndarray":
        """Decode a real image payload to a grayscale uint8 raster."""
        import io

        return np.asarray(_PILImage.open(io.BytesIO(payload)).convert("L"))
except ImportError:
    decode_real_image = None


def _decode_payload(payload: bytes, meta) -> "np.ndarray":
    """Dispatch: synthetic IMG1 rasters decode inline; anything else
    goes to the optional real codec."""
    if bytes(payload[:4]) == MAGIC:
        return _decode_raster(payload, meta["width"], meta["height"])
    if decode_real_image is None:
        raise ImportError(
            "payload is not synthetic IMG1 and no image codec is "
            "installed (pip install pillow to enable real decode)"
        )
    return decode_real_image(bytes(payload))


FEATURE_DIM = 8

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def extract_features(media: DataFrame, batch_limit: int = 1024) -> DataFrame:
    """mapInPandas feature extraction: mean/std + 6-bin histogram per
    payload → fixed FEATURE_DIM vector. Arrow-batched; numpy per batch."""

    def run(batches):
        for pdf in batches:
            feats = []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                arr = _decode_payload(payload, meta).astype(np.float64)
                hist, _ = np.histogram(arr, bins=6, range=(0, 256))
                v = [float(arr.mean()), float(arr.std())] + (
                    hist / arr.size
                ).tolist()
                feats.append(v)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": feats,
                }
            )

    return media.mapInPandas(run, FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every: int = 2) -> DataFrame:
    """Video frame sampling: keep every ``every``-th frame index from
    meta.n_frames — pure column math (the payload slice per frame would
    be a byte-range read at real scale; indices are the contract)."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every))
            ).alias("frame_idx"),
        )
    )


def bilinear_resize(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Pure-numpy bilinear resample of a 2-D uint8 raster (align_corners
    convention: output corners map onto input corners). Vectorized —
    no Python loop over pixels."""
    in_h, in_w = arr.shape
    a = arr.astype(np.float64)
    ys = (
        np.linspace(0.0, in_h - 1.0, out_h)
        if out_h > 1
        else np.zeros(1)
    )
    xs = (
        np.linspace(0.0, in_w - 1.0, out_w)
        if out_w > 1
        else np.zeros(1)
    )
    y0 = np.floor(ys).astype(np.int64)
    x0 = np.floor(xs).astype(np.int64)
    y1 = np.minimum(y0 + 1, in_h - 1)
    x1 = np.minimum(x0 + 1, in_w - 1)
    wy = (ys - y0)[:, None]
    wx = (xs - x0)[None, :]
    top = a[y0[:, None], x0[None, :]] * (1 - wx) + a[y0[:, None], x1[None, :]] * wx
    bot = a[y1[:, None], x0[None, :]] * (1 - wx) + a[y1[:, None], x1[None, :]] * wx
    out = top * (1 - wy) + bot * wy
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def resize_image(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize every IMG1 raster to (width, height) with the numpy
    bilinear kernel — Arrow-batched mapInPandas; output payloads keep
    the IMG1 container so downstream feature extraction runs unchanged.
    (A real-codec corpus would swap ``_decode_raster``/``bilinear_resize``
    for PIL calls inside the same batch loop.)"""

    def run(batches):
        for pdf in batches:
            payloads = []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                arr = _decode_raster(payload, meta["width"], meta["height"])
                out = bilinear_resize(arr, width, height)
                payloads.append(MAGIC + out.tobytes())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": payloads,
                    "width": np.int32(width),
                    "height": np.int32(height),
                }
            )

    return media.mapInPandas(run, RESIZED_SCHEMA)
