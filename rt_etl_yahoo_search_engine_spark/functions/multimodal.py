"""Multimodal (image / audio / video) columns for a training-data pipeline.

Media are opaque ``binary`` payload columns with typed metadata columns
riding alongside (width/height/n_frames/sample_rate/...) — the layout a
100 TB multimodal corpus would use: metadata prunes at the parquet scan,
payloads are only deserialized inside Arrow-batched Python stages
(`mapInPandas`), and nothing ever shuffles a payload except the explicit
frame-explode operator.

Real codec decode (JPEG/PNG via PIL, audio via soundfile, video via av) is
NOT available in this container; those imports are gated and raise
``NotImplementedError`` with a clear message.  A **deterministic fake
decoder** (payload bytes -> uint8 pixel/sample array) stands in so the
Spark-side plumbing — schema, partitioning, UDF signatures, Arrow batch
shapes, flatMap row explosion — is real and fully tested.  Swap
``fake_decode_*`` for the real codec on a cluster that has the libs; every
DataFrame-level contract stays identical.

The synthetic media table is derived deterministically from ``doc_id``
with CLOSED-FORM payload bytes and metadata —
``byte[i] = (doc_id*7919 + i*104729 + 12345) mod 256`` — so tests and the
driver's DuckDB oracle can recompute not just sizes/offsets but every
decoded pixel/sample value exactly (the feature entries are fully
hash-gated, not rows-only; see __spark_entry__ media_*_features oracles).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_samples", T.IntegerType(), True),
    ]
)

# closed-form metadata (shared by synth, tests, and the SQL oracle):
#   media_type: doc_id % 3 -> 0=image, 1=audio, 2=video
#   image: width  = 8 + (doc_id % 5) * 4,  height = 8 + (doc_id % 7) * 2
#          payload = width * height bytes (1 channel)
#   audio: sample_rate = 8000, n_samples = 256 + (doc_id % 50) * 16
#          payload = n_samples bytes (8-bit PCM)
#   video: width = height = 8, n_frames = 4 + doc_id % 13
#          payload = n_frames * 64 bytes (1-channel frames)
VIDEO_FRAME_W = 8
VIDEO_FRAME_H = 8
VIDEO_FRAME_BYTES = VIDEO_FRAME_W * VIDEO_FRAME_H

META_SQL = {
    "media_type": (
        "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'"
        " ELSE 'video' END"
    ),
    "payload_len": (
        "CASE doc_id % 3"
        " WHEN 0 THEN (8 + (doc_id % 5) * 4) * (8 + (doc_id % 7) * 2)"
        " WHEN 1 THEN 256 + (doc_id % 50) * 16"
        f" ELSE (4 + doc_id % 13) * {VIDEO_FRAME_BYTES} END"
    ),
    "n_frames": f"CASE WHEN doc_id % 3 = 2 THEN 4 + doc_id % 13 ELSE NULL END",
}


def _meta_for(doc_id: int) -> dict:
    m = doc_id % 3
    if m == 0:
        w, h = 8 + (doc_id % 5) * 4, 8 + (doc_id % 7) * 2
        return {
            "media_type": "image", "width": w, "height": h,
            "n_frames": None, "sample_rate": None, "n_samples": None,
            "payload_len": w * h,
        }
    if m == 1:
        ns = 256 + (doc_id % 50) * 16
        return {
            "media_type": "audio", "width": None, "height": None,
            "n_frames": None, "sample_rate": 8000, "n_samples": ns,
            "payload_len": ns,
        }
    nf = 4 + doc_id % 13
    return {
        "media_type": "video", "width": VIDEO_FRAME_W, "height": VIDEO_FRAME_H,
        "n_frames": nf, "sample_rate": None, "n_samples": None,
        "payload_len": nf * VIDEO_FRAME_BYTES,
    }


# Affine byte stream: b odd -> full 256-cycle; closed form in (doc_id, i)
# lets DuckDB recompute every decoded pixel/sample for the feature oracles.
PAYLOAD_A, PAYLOAD_B, PAYLOAD_C = 7919, 104729, 12345
PAYLOAD_SQL = (
    f"(doc_id * {PAYLOAD_A} + i * {PAYLOAD_B} + {PAYLOAD_C}) % 256"
)


def payload_bytes(doc_id: int) -> bytes:
    """Deterministic payload for doc_id: byte[i] = (A*doc_id+B*i+C) % 256."""
    meta = _meta_for(doc_id)
    i = np.arange(meta["payload_len"], dtype=np.int64)
    return (
        ((doc_id * PAYLOAD_A + i * PAYLOAD_B + PAYLOAD_C) % 256)
        .astype(np.uint8)
        .tobytes()
    )


def _synth_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = {k.name: [] for k in MEDIA_SCHEMA.fields}
        for doc_id in pdf["doc_id"]:
            d = int(doc_id)
            meta = _meta_for(d)
            rows["doc_id"].append(d)
            rows["media_type"].append(meta["media_type"])
            rows["payload"].append(payload_bytes(d))
            for k in ("width", "height", "n_frames", "sample_rate", "n_samples"):
                rows[k].append(meta[k])
        yield pd.DataFrame(rows)


def synth_media_df(docs: DataFrame) -> DataFrame:
    """Deterministic media table from a docs table carrying doc_id.

    Generation is distributed (mapInPandas over the doc_id column only —
    no other column is ever moved) and reproducible row-by-row."""
    return docs.select("doc_id").mapInPandas(_synth_batch, schema=MEDIA_SCHEMA)


# --- decode: real (stubbed) and fake (deterministic) -------------------------


def decode_image(payload: bytes) -> "np.ndarray":
    """REAL image decode — requires PIL, which this container lacks."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:  # pragma: no cover - always taken in sandbox
        raise NotImplementedError(
            "real image decode needs PIL/Pillow (not in this container); "
            "use fake_decode_image for the deterministic test path"
        ) from e
    import io

    from PIL import Image
    return np.asarray(Image.open(io.BytesIO(payload)))  # pragma: no cover


def fake_decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in decode: payload bytes ARE the pixels
    (1 channel, row-major).  Same signature shape as a real decoder."""
    px = np.frombuffer(payload, dtype=np.uint8)
    return px.reshape(height, width)


def fake_decode_audio(payload: bytes) -> np.ndarray:
    """Deterministic stand-in: payload bytes as centered int16 samples."""
    return np.frombuffer(payload, dtype=np.uint8).astype(np.int16) - 128


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize — pure numpy index mapping (REAL, no stub)."""
    h, w = img.shape[:2]
    rows = (np.arange(out_h) * h) // out_h
    cols = (np.arange(out_w) * w) // out_w
    return img[rows][:, cols]


# --- feature extraction (Arrow-batched) --------------------------------------

IMAGE_FEATURES_SCHEMA = (
    "doc_id long, n_bytes int, px_mean double, px_std double, px_min int, "
    "px_max int, hist array<int>, thumb_mean double"
)


def image_features(media: DataFrame, thumb: int = 4) -> DataFrame:
    """Per-image stats + 16-bin histogram + mean of a nearest-neighbor
    thumbnail.  Decode is the deterministic fake; everything downstream of
    decode (batching, numpy feature math, output schema) is production
    shape."""

    def batch(frames: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in frames:
            out = {
                "doc_id": [], "n_bytes": [], "px_mean": [], "px_std": [],
                "px_min": [], "px_max": [], "hist": [], "thumb_mean": [],
            }
            for doc_id, payload, w, h in zip(
                pdf["doc_id"], pdf["payload"], pdf["width"], pdf["height"]
            ):
                img = fake_decode_image(payload, int(w), int(h))
                px = img.ravel()
                out["doc_id"].append(int(doc_id))
                out["n_bytes"].append(len(payload))
                out["px_mean"].append(float(px.mean()))
                out["px_std"].append(float(px.std()))
                out["px_min"].append(int(px.min()))
                out["px_max"].append(int(px.max()))
                out["hist"].append(
                    np.bincount(px >> 4, minlength=16).astype("int32").tolist()
                )
                out["thumb_mean"].append(
                    float(resize_nearest(img, thumb, thumb).mean())
                )
            yield pd.DataFrame(out)

    return (
        media.filter(F.col("media_type") == "image")
        .select("doc_id", "payload", "width", "height")
        .mapInPandas(batch, schema=IMAGE_FEATURES_SCHEMA)
    )


AUDIO_FEATURES_SCHEMA = (
    "doc_id long, n_samples int, rms double, zero_crossings int, peak int"
)


def audio_features(media: DataFrame) -> DataFrame:
    """Per-clip RMS / zero-crossing-rate / peak over fake-decoded samples."""

    def batch(frames: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in frames:
            out = {"doc_id": [], "n_samples": [], "rms": [],
                   "zero_crossings": [], "peak": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                s = fake_decode_audio(payload)
                out["doc_id"].append(int(doc_id))
                out["n_samples"].append(len(s))
                out["rms"].append(float(np.sqrt(np.mean(s.astype(np.float64) ** 2))))
                out["zero_crossings"].append(
                    int(np.count_nonzero(np.signbit(s[1:]) != np.signbit(s[:-1])))
                )
                out["peak"].append(int(np.abs(s).max()))
            yield pd.DataFrame(out)

    return (
        media.filter(F.col("media_type") == "audio")
        .select("doc_id", "payload")
        .mapInPandas(batch, schema=AUDIO_FEATURES_SCHEMA)
    )


FRAMES_SCHEMA = (
    "doc_id long, frame_idx int, frame_off int, frame_len int, frame binary"
)


def sample_frames(media: DataFrame, every: int = 2) -> DataFrame:
    """Video frame sampling: 1-row-in / 0..N-rows-out flatMap keeping every
    `every`-th frame as its own binary (REAL slicing, no codec involved —
    frames are fixed-size planes per the metadata contract)."""

    def batch(frames: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in frames:
            out = {"doc_id": [], "frame_idx": [], "frame_off": [],
                   "frame_len": [], "frame": []}
            for doc_id, payload, nf in zip(
                pdf["doc_id"], pdf["payload"], pdf["n_frames"]
            ):
                for i in range(0, int(nf), every):
                    off = i * VIDEO_FRAME_BYTES
                    out["doc_id"].append(int(doc_id))
                    out["frame_idx"].append(i)
                    out["frame_off"].append(off)
                    out["frame_len"].append(VIDEO_FRAME_BYTES)
                    out["frame"].append(bytes(payload[off : off + VIDEO_FRAME_BYTES]))
            yield pd.DataFrame(out)

    return (
        media.filter(F.col("media_type") == "video")
        .select("doc_id", "payload", "n_frames")
        .mapInPandas(batch, schema=FRAMES_SCHEMA)
    )


def media_meta_stats(media: DataFrame) -> DataFrame:
    """Per-type corpus stats straight off the typed metadata + payload —
    the scan-side (JVM, codegen) half of the multimodal story: no Python,
    no payload deserialization, octet_length only."""
    return media.groupBy("media_type").agg(
        F.count("*").alias("n"),
        F.sum(F.octet_length("payload")).alias("total_bytes"),
        F.round(F.avg(F.octet_length("payload")), 6).alias("avg_bytes"),
    )
