"""Multimodal (image/audio/video) columns as opaque binaries + typed
metadata, with decode / feature-extract / resize / frame-sample as Arrow
mapInPandas kernels.

The Spark-side plumbing — schemas, batch shapes, partitioning, UDF
signatures — is REAL and tested; the actual media codecs are stubbed
behind an import-try (PIL / soundfile are not in this container): with
libraries present, ``_decode_real`` paths take over; without, a
deterministic synthetic codec (self-describing header + seeded pixel
generator) exercises the identical dataflow. Swapping the codec does not
change any plan shape.

Design for 100 TB: blobs stay in executor memory only within one Arrow
batch (``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds peak);
nothing ever collects to the driver; feature extraction is map-only;
frame sampling explodes map-side so downstream shuffles carry features,
not frames.
"""

from __future__ import annotations

import math
import struct as _struct
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_SCHEMA",
    "synthesize_media",
    "decode_dims",
    "image_features",
    "resize_images",
    "sample_frames",
]

_MAGIC = b"FIMG"  # deterministic fake-image container

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("blob", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("channels", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                    T.StructField("format", T.StringType(), True),
                ]
            ),
            False,
        ),
    ]
)


# ------------------------------------------------------------ fake codec
# Pixel stream: pix[k] = (doc_id*PIX_A + k*PIX_B) mod 256 over the flat
# C-order index k of (frames, h, w, channels). A Weyl-style sequence —
# deterministic, parallelism-independent, AND closed-form reproducible in
# plain SQL (generate_series), so feature aggregates over the decoded
# pixels admit an exact relational oracle.
PIX_A = 2654435761  # Knuth multiplicative constant
PIX_B = 40503


def _encode_fake(doc_id: int, w: int, h: int, c: int, n_frames: int) -> bytes:
    """Self-describing deterministic container: header + zlib'd pixel
    stream. Stands in for JPEG/PNG/MP4 bytes with REAL structure so decode
    paths must actually parse."""
    k = np.arange(n_frames * h * w * c, dtype=np.int64)
    pix = ((doc_id * PIX_A + k * PIX_B) % 256).astype(np.uint8)
    pix = pix.reshape(n_frames, h, w, c)
    header = _MAGIC + _struct.pack("<IIII", w, h, c, n_frames)
    return header + zlib.compress(pix.tobytes(), 1)


def _decode_fake(blob: bytes) -> np.ndarray:
    if blob[:4] != _MAGIC:
        raise ValueError("not a FIMG container")
    w, h, c, n = _struct.unpack("<IIII", blob[4:20])
    pix = np.frombuffer(zlib.decompress(blob[20:]), dtype=np.uint8)
    return pix.reshape(n, h, w, c)


def _decode(blob: bytes) -> np.ndarray:
    """Decode → (frames, H, W, C) uint8. Real-codec path is stubbed."""
    if blob[:4] == _MAGIC:
        return _decode_fake(blob)
    try:  # real path: only if the imaging stack exists in the runtime
        import io

        from PIL import Image  # noqa: F401

        img = Image.open(io.BytesIO(blob))
        arr = np.asarray(img)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        return arr[None, ...]
    except ImportError as e:  # pragma: no cover - container has no PIL
        raise NotImplementedError(
            "real image decode needs PIL; container provides the FIMG stub"
        ) from e


def synthesize_media(
    docs: DataFrame, *, media_type: str = "image", n_frames: int = 1
) -> DataFrame:
    """documents → deterministic media table (doc_id, media_type, blob,
    meta). Dimensions derive from doc_id, so the table is reproducible at
    any parallelism."""

    def gen(iterator):
        for pdf in iterator:
            rows = []
            for doc_id in pdf["doc_id"].tolist():
                w = 8 + (doc_id % 5) * 4
                h = 8 + (doc_id % 3) * 4
                c = 3
                nf = n_frames if media_type == "video" else 1
                rows.append(
                    {
                        "doc_id": doc_id,
                        "media_type": media_type,
                        "blob": _encode_fake(doc_id, w, h, c, nf),
                        "meta": {
                            "width": w,
                            "height": h,
                            "channels": c,
                            "n_frames": nf,
                            "format": "fimg",
                        },
                    }
                )
            yield pd.DataFrame(rows, columns=["doc_id", "media_type", "blob", "meta"])

    return docs.select("doc_id").mapInPandas(gen, schema=MEDIA_SCHEMA)


# ---------------------------------------------------------------- kernels
def decode_dims(media: DataFrame) -> DataFrame:
    """Parse blob headers → actual dims; cross-checks the meta column
    (schema-on-read validation of opaque binaries)."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
            T.StructField("channels", T.IntegerType(), False),
            T.StructField("n_frames", T.IntegerType(), False),
        ]
    )

    def fn(iterator):
        for pdf in iterator:
            out = []
            for doc_id, blob in zip(pdf["doc_id"].tolist(), pdf["blob"]):
                arr = _decode(bytes(blob))
                n, h, w, c = arr.shape
                out.append((doc_id, w, h, c, n))
            yield pd.DataFrame(
                out, columns=["doc_id", "width", "height", "channels", "n_frames"]
            )

    return media.select("doc_id", "blob").mapInPandas(fn, schema=schema)


def image_features(media: DataFrame) -> DataFrame:
    """Per-channel mean/std features as FLAT scalar columns
    (mean_c0..2, std_c0..2) — scalar schema so results sort/hash cleanly
    downstream (array columns break order-insensitive comparators).

    Exactness contract: aggregates go through integer pixel sums
    (sum, sum-of-squares are exact int64), then ONE fixed float64 op
    sequence — mean = s/n; std = sqrt(max(ss/n - mean², 0)) — the same
    sequence a SQL engine evaluates, so values are bit-reproducible."""
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType(), False)]
        + [
            T.StructField(f"{k}_c{c}", T.DoubleType(), False)
            for k in ("mean", "std")
            for c in range(3)
        ]
    )

    def fn(iterator):
        for pdf in iterator:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"].tolist(), pdf["blob"]):
                arr = _decode(bytes(blob))
                c = arr.shape[-1]
                flat = arr.reshape(-1, c).astype(np.int64)
                n = flat.shape[0]
                s = flat.sum(axis=0)
                ss = (flat * flat).sum(axis=0)
                row = {"doc_id": doc_id}
                for ch in range(3):
                    if ch < c:
                        mean = float(s[ch]) / n
                        var = float(ss[ch]) / n - mean * mean
                        std = math.sqrt(max(var, 0.0))
                    else:
                        mean = std = 0.0
                    row[f"mean_c{ch}"] = mean
                    row[f"std_c{ch}"] = std
                rows.append(row)
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return media.select("doc_id", "blob").mapInPandas(fn, schema=schema)


def resize_images(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize (pure numpy — deterministic, codec-free) →
    re-encoded FIMG blobs with updated meta."""

    def fn(iterator):
        for pdf in iterator:
            rows = []
            for doc_id, mt, blob in zip(
                pdf["doc_id"].tolist(), pdf["media_type"].tolist(), pdf["blob"]
            ):
                arr = _decode(bytes(blob))
                n, h, w, c = arr.shape
                yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
                xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
                res = arr[:, yi[:, None], xi[None, :], :]
                header = _MAGIC + _struct.pack("<IIII", out_w, out_h, c, n)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "media_type": mt,
                        "blob": header + zlib.compress(res.tobytes(), 1),
                        "meta": {
                            "width": out_w,
                            "height": out_h,
                            "channels": c,
                            "n_frames": n,
                            "format": "fimg",
                        },
                    }
                )
            yield pd.DataFrame(rows, columns=["doc_id", "media_type", "blob", "meta"])

    return media.mapInPandas(fn, schema=MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Video frame sampling: explode every n-th frame to its own row
    map-side (downstream shuffles carry per-frame features, not videos)."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame_mean", T.DoubleType(), False),
        ]
    )

    def fn(iterator):
        for pdf in iterator:
            ids, fidx, fmean = [], [], []
            for doc_id, blob in zip(pdf["doc_id"].tolist(), pdf["blob"]):
                arr = _decode(bytes(blob))
                for i in range(0, arr.shape[0], every_n):
                    ids.append(doc_id)
                    fidx.append(i)
                    fmean.append(float(arr[i].mean()))
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": fidx, "frame_mean": fmean}
            )

    return media.select("doc_id", "blob").mapInPandas(fn, schema=schema)
