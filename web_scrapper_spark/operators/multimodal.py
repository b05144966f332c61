"""Multimodal (image/audio/video) column plumbing (task brief).

Media payloads are opaque ``binary`` columns + typed metadata structs —
the same shape the pages table uses for ``html``. The Spark-side
plumbing here is real and tested: schemas, Arrow batch flow through
``mapInPandas``, partition-preserving transforms. The codec layer is
STUBBED (this container ships no image/audio libraries): decoding
dispatches to a pluggable decoder, with

- ``NotImplementedError`` when no decoder is registered (the honest
  production default — plug Pillow/torchaudio/pyav on a real cluster),
- a deterministic fake decoder used by tests and fixtures, which
  derives pixel/sample data from md5 of the payload so every stage
  downstream of decode is fully exercised.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator, Optional

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int, codec:string>"
)

IMAGE_FEATURES_SCHEMA = (
    "media_id long, width int, height int, mean_luma double, "
    "feature array<float>"
)

FRAME_SAMPLE_SCHEMA = "media_id long, frame_idx int, frame_payload binary"

# decoder registry: kind → callable(payload bytes, meta dict) → np.ndarray
_DECODERS: dict = {}


def register_decoder(kind: str, fn: Callable) -> None:
    _DECODERS[kind] = fn


def clear_decoders() -> None:
    _DECODERS.clear()


def deterministic_fake_decoder(payload: bytes, meta: dict) -> np.ndarray:
    """Fake decode: md5-seeded uint8 grid of the declared dimensions.
    Deterministic per payload so tests are exact."""
    width = int(meta.get("width") or 8)
    height = int(meta.get("height") or 8)
    seed = int.from_bytes(hashlib.md5(payload or b"").digest()[:4], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(height, width), dtype=np.uint8)


def _decode(decoders: dict, kind: str, payload: bytes, meta: dict) -> np.ndarray:
    decoder = decoders.get(kind)
    if decoder is None:
        raise NotImplementedError(
            f"no decoder registered for media kind {kind!r}: install a codec "
            "library (e.g. Pillow) and register_decoder(kind, fn)"
        )
    return decoder(payload, meta)


def image_features_df(media: DataFrame, resize_to: int = 4) -> DataFrame:
    """decode → resize (area-mean pooling) → feature vector, one Arrow
    pass. The feature is the resized grid flattened + mean luma — the
    hook where a real embedding model would slot in.

    The decoder registry is snapshotted at plan-build time and shipped
    in the UDF closure (executor worker processes import this module
    fresh, so driver-side registry state is not otherwise visible)."""
    decoders = dict(_DECODERS)

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for media_id, kind, payload, meta in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"], pdf["meta"]
            ):
                meta = dict(meta) if meta is not None else {}
                grid = _decode(decoders, kind, payload, meta).astype(np.float64)
                h, w = grid.shape
                bh, bw = max(h // resize_to, 1), max(w // resize_to, 1)
                resized = grid[: bh * resize_to, : bw * resize_to].reshape(
                    resize_to, bh, resize_to, bw
                ).mean(axis=(1, 3))
                rows.append(
                    {
                        "media_id": media_id,
                        "width": w,
                        "height": h,
                        "mean_luma": float(grid.mean()),
                        "feature": resized.flatten().astype(np.float32).tolist(),
                    }
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "mean_luma", "feature"]
            )

    return media.select("media_id", "kind", "payload", "meta").mapInPandas(
        run, schema=IMAGE_FEATURES_SCHEMA
    )


def frame_sample_df(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Video frame sampling plumbing: 1 media row → N frame rows
    (UDTF shape). Frames are sliced from the payload deterministically;
    a real decoder would demux instead."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for media_id, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                meta = dict(meta) if meta is not None else {}
                n_frames = int(meta.get("n_frames") or 0)
                payload = payload or b""
                chunk = max(len(payload) // max(n_frames, 1), 1)
                for idx in range(0, n_frames, every_n):
                    rows.append(
                        {
                            "media_id": media_id,
                            "frame_idx": idx,
                            "frame_payload": payload[idx * chunk : (idx + 1) * chunk],
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "frame_payload"]
            )

    return media.select("media_id", "payload", "meta").mapInPandas(
        run, schema=FRAME_SAMPLE_SCHEMA
    )


def synthetic_media_rows(n: int = 32, kind: str = "image") -> list:
    """Deterministic media fixture rows (payload = md5 chain bytes).
    Pure function — shared by the Spark fixture and the driver-oracle
    builder so both sides see identical payload/meta definitions."""
    rows = []
    for i in range(n):
        payload = hashlib.md5(f"media{i}".encode()).digest() * 8
        rows.append(
            (
                i,
                kind,
                payload,
                {
                    "width": 8 + (i % 5),
                    "height": 8 + (i % 3),
                    "sample_rate": None,
                    "n_frames": 4 + i % 3 if kind == "video" else None,
                    "codec": "fake",
                },
            )
        )
    return rows


def synthetic_media_df(spark, n: int = 32, kind: str = "image") -> DataFrame:
    return spark.createDataFrame(synthetic_media_rows(n, kind), MEDIA_SCHEMA)
