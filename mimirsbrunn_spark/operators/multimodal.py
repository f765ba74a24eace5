"""Multimodal columns: image/audio/video as opaque ``binary`` + typed metadata.

The decode step is STUBBED (image/audio libraries are not in this container):
``decode_image``/``decode_audio`` raise NotImplementedError unless
``fake=True``, in which case a deterministic fake decoder produces stable
feature vectors from the bytes — so the Spark-side plumbing (schemas,
Arrow batch shape, mapInPandas signatures, partitioning) is real and tested
end-to-end, and swapping in PIL/ffmpeg later only replaces the kernel.

All UDFs are Arrow-batched (mapInPandas); batches are capped by
spark.sql.execution.arrow.maxRecordsPerBatch so a partition of large blobs
never materializes at once.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)

IMAGE_FEATURES_SCHEMA = "media_id long, feat array<float>, decoded_w int, decoded_h int"
FRAME_SAMPLE_SCHEMA = "media_id long, frame_idx int, frame binary"


def _fake_decode(payload: bytes, out_dim: int = 8) -> np.ndarray:
    """Deterministic stand-in for a real decoder: histogram of byte values
    folded into out_dim buckets, L1-normalized. Stable across runs/machines."""
    if payload is None or len(payload) == 0:
        return np.zeros(out_dim, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr % out_dim, minlength=out_dim).astype(np.float64)
    return (hist / hist.sum()).astype(np.float32)


def image_features(media: DataFrame, fake: bool = False, out_dim: int = 8) -> DataFrame:
    """binary images → feature vectors. Real decoder: PIL/torchvision kernel
    drops into ``_decode``; this container ships neither, so ``fake=True``
    runs the deterministic stand-in (plumbing identical)."""

    def batches(it):
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "real image decode requires PIL/torchvision (not in this "
                    "container); pass fake=True for the deterministic stub"
                )
            feats = [_fake_decode(p, out_dim) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feat": feats,
                    "decoded_w": pdf["width"].fillna(0).astype("int32"),
                    "decoded_h": pdf["height"].fillna(0).astype("int32"),
                }
            )

    return media.filter(F.col("kind") == "image").select(
        "media_id", "payload", "width", "height"
    ).mapInPandas(batches, schema=IMAGE_FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000, fake: bool = False) -> DataFrame:
    """video binary → sampled frames (one output row per frame). Fake mode
    slices the payload deterministically at byte offsets proportional to the
    sample times — exercising the 1-to-N mapInPandas shape for real."""

    def batches(it):
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "real frame sampling requires ffmpeg/av (not in this "
                    "container); pass fake=True for the deterministic stub"
                )
            out_ids, out_idx, out_frames = [], [], []
            for mid, payload, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"].fillna(0)
            ):
                n = max(int(dur) // every_ms, 1)
                p = payload or b""
                for i in range(n):
                    lo = (len(p) * i) // n
                    hi = (len(p) * (i + 1)) // n
                    out_ids.append(mid)
                    out_idx.append(i)
                    out_frames.append(p[lo:hi])
            yield pd.DataFrame(
                {"media_id": out_ids, "frame_idx": out_idx, "frame": out_frames}
            )

    return media.filter(F.col("kind") == "video").select(
        "media_id", "payload", "duration_ms"
    ).mapInPandas(batches, schema=FRAME_SAMPLE_SCHEMA)


def synth_media(spark, n: int = 64, seed: int = 7) -> DataFrame:
    """Deterministic fake media table for tests (no external data)."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        kind = ["image", "video", "audio"][i % 3]
        size = int(rng.integers(16, 512))
        payload = rng.integers(0, 256, size=size, dtype=np.int64).astype(np.uint8).tobytes()
        rows.append(
            (
                i,
                kind,
                payload,
                {"image": "image/png", "video": "video/mp4", "audio": "audio/wav"}[kind],
                int(rng.integers(8, 64)),
                int(rng.integers(8, 64)),
                int(rng.integers(500, 5000)),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
