"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, processed by Arrow-batched pandas UDFs.

The Spark-side plumbing — schemas, partition-preserving mapInPandas,
UDF signatures, deterministic batch shapes — is real and tested; the
actual media decoding is STUBBED (`decoder="stub"`) because no codec
libraries exist in this environment. Swapping in PIL/ffmpeg is a
one-function change per modality (the ``_decode_*`` hooks below), with
no change to any Spark plan.

Scale notes: media bytes dominate row width, so every operator here
(a) never shuffles the binary column, (b) prunes to the metadata columns
whenever the payload isn't needed, and (c) processes payloads
partition-locally in Arrow batches.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# media table: (id, kind, payload, meta) — meta is typed per modality
MEDIA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

IMAGE_FEATURES = (
    "media_id long, n_bytes long, sha256 string, "
    "mean_luma double, feature array<float>"
)

FRAME_SAMPLE = "media_id long, frame_idx int, frame_sha256 string, n_bytes long"


def _decode_image_stub(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB decoder: deterministic fake pixel array from the payload
    bytes (replace with PIL.Image.open for real decoding). Returns a
    (height, width) uint8 luma plane."""
    h = hashlib.sha256(payload).digest()
    rng = np.random.default_rng(int.from_bytes(h[:8], "big"))
    return rng.integers(0, 256, size=(max(height, 1), max(width, 1)), dtype=np.uint8)


def _decode_audio_stub(payload: bytes, sample_rate: int) -> np.ndarray:
    """STUB decoder: deterministic fake PCM from payload bytes (replace
    with soundfile/ffmpeg). float32 mono in [-1, 1], 1s max."""
    h = hashlib.sha256(payload).digest()
    rng = np.random.default_rng(int.from_bytes(h[:8], "big"))
    n = min(max(sample_rate, 1), 48000)
    return (rng.random(n, dtype=np.float32) * 2.0 - 1.0)


def image_features(media: DataFrame, feature_dim: int = 16) -> DataFrame:
    """image rows -> (media_id, n_bytes, sha256, mean_luma, feature).

    Decode + feature-extract inside one mapInPandas pass; the feature is
    a deterministic pooled histogram of the (stub-)decoded plane —
    swapping in a real embedding model changes only the batch body.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nb, shas, lumas, feats = [], [], [], [], []
            for mid, payload, w, h in zip(
                pdf["media_id"], pdf["payload"], pdf["width"], pdf["height"]
            ):
                raw = bytes(payload)
                plane = _decode_image_stub(raw, int(w or 1), int(h or 1))
                hist, _ = np.histogram(plane, bins=feature_dim, range=(0, 256))
                feat = (hist / max(plane.size, 1)).astype(np.float32)
                ids.append(mid)
                nb.append(len(raw))
                shas.append(hashlib.sha256(raw).hexdigest())
                lumas.append(round(float(plane.mean()), 6))
                feats.append(feat.tolist())
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "n_bytes": nb,
                    "sha256": shas,
                    "mean_luma": lumas,
                    "feature": feats,
                }
            )

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "payload", "width", "height")
        .mapInPandas(extract, schema=IMAGE_FEATURES)
    )


def resize_images(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Decode -> nearest-neighbour resize -> re-encode (stub: raw luma
    bytes). Shows the binary-in/binary-out UDF shape; payload size after
    resize is exactly out_w*out_h."""

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payloads = []
            for payload, w, h in zip(pdf["payload"], pdf["width"], pdf["height"]):
                plane = _decode_image_stub(bytes(payload), int(w or 1), int(h or 1))
                yi = (np.arange(out_h) * plane.shape[0] // out_h).astype(np.int64)
                xi = (np.arange(out_w) * plane.shape[1] // out_w).astype(np.int64)
                out_payloads.append(plane[np.ix_(yi, xi)].tobytes())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": out_payloads,
                    "width": out_w,
                    "height": out_h,
                }
            )

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "payload", "width", "height")
        .mapInPandas(
            do_resize,
            schema="media_id long, payload binary, width int, height int",
        )
    )


def audio_stats(media: DataFrame) -> DataFrame:
    """audio rows -> (media_id, n_samples, rms) via the stub PCM decode."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ns, rms = [], [], []
            for mid, payload, sr in zip(
                pdf["media_id"], pdf["payload"], pdf["sample_rate"]
            ):
                pcm = _decode_audio_stub(bytes(payload), int(sr or 16000))
                ids.append(mid)
                ns.append(len(pcm))
                rms.append(round(float(np.sqrt(np.mean(pcm**2))), 6))
            yield pd.DataFrame({"media_id": ids, "n_samples": ns, "rms": rms})

    return (
        media.filter(F.col("kind") == "audio")
        .select("media_id", "payload", "sample_rate")
        .mapInPandas(stats, schema="media_id long, n_samples long, rms double")
    )


def sample_video_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """video rows -> one row per sampled frame (media_id, frame_idx,
    frame_sha256, n_bytes). Frame extraction is stubbed as deterministic
    slices of the payload; a real implementation calls ffmpeg per batch.
    """

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, shas, nb = [], [], [], []
            for mid, payload, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                raw = bytes(payload)
                n_frames = max(int(dur or 0) // every_ms, 1)
                for i in range(n_frames):
                    lo = (i * len(raw)) // n_frames
                    hi = ((i + 1) * len(raw)) // n_frames
                    chunk = raw[lo:hi]
                    ids.append(mid)
                    idxs.append(i)
                    shas.append(hashlib.sha256(chunk).hexdigest())
                    nb.append(len(chunk))
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_sha256": shas, "n_bytes": nb}
            )

    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", "payload", "duration_ms")
        .mapInPandas(sample, schema=FRAME_SAMPLE)
    )


def generate_media(spark, n: int, partitions: int = 4) -> DataFrame:
    """Deterministic synthetic media table (seed per id) covering all
    three modalities — payloads are opaque bytes, as in production."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                rng = np.random.default_rng(42 + i)
                kind = ("image", "audio", "video")[i % 3]
                payload = rng.integers(0, 256, size=64 + (i % 200), dtype=np.uint8).tobytes()
                rows.append(
                    (
                        i,
                        kind,
                        payload,
                        32 + i % 16 if kind == "image" else None,
                        24 + i % 8 if kind == "image" else None,
                        16000 if kind == "audio" else None,
                        3000 + (i % 5) * 1000 if kind == "video" else None,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "payload", "width", "height",
                    "sample_rate", "duration_ms",
                ],
            )

    return spark.range(0, n, numPartitions=partitions).mapInPandas(gen, schema=MEDIA)
