"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque `binary` columns with a typed metadata
struct; the Spark-side plumbing — schema, partition-size control,
Arrow batch shape, UDF signatures — is real and tested. The actual
codec work (JPEG decode, resampling, frame extraction) requires
libraries not present in this container and is STUBBED behind
`_decode_image`/`_decode_audio` which raise NotImplementedError unless
`deterministic_fake=True`, in which case a seeded arithmetic "decode"
produces stable pseudo-features so the distributed plumbing can be
exercised end-to-end.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, mime string, width int, height int, "
    "duration_ms int, payload binary"
)


def attach_media(df: DataFrame, payload_col: str, kind: str, mime: str,
                 id_col: str | None = None) -> DataFrame:
    """Wrap an existing binary column into the canonical media shape.
    Pass `id_col` for a stable, data-derived media_id (reproducible
    across runs/partitionings); default is a per-run synthetic id."""
    return df.select(
        (F.col(id_col).cast("long") if id_col
         else F.monotonically_increasing_id()).alias("media_id"),
        F.lit(kind).alias("kind"),
        F.lit(mime).alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
        F.col(payload_col).alias("payload"),
        *[c for c in df.columns if c != payload_col],
    )


def _decode_image(payload: bytes, deterministic_fake: bool):
    if not deterministic_fake:
        raise NotImplementedError(
            "image decode requires PIL/opencv (not in this container); "
            "pass deterministic_fake=True for the seeded stand-in")
    # seeded fake: 8x8 grayscale derived from payload bytes
    arr = np.frombuffer(payload[:64].ljust(64, b"\0"), dtype=np.uint8)
    return arr.reshape(8, 8).astype(np.float32) / 255.0


def _decode_audio(payload: bytes, deterministic_fake: bool):
    if not deterministic_fake:
        raise NotImplementedError(
            "audio decode requires soundfile/ffmpeg (not in this container); "
            "pass deterministic_fake=True for the seeded stand-in")
    arr = np.frombuffer(payload[:256].ljust(256, b"\0"), dtype=np.uint8)
    return (arr.astype(np.float32) - 128.0) / 128.0


def image_features(media: DataFrame, deterministic_fake: bool = False) -> DataFrame:
    """Decode + feature-extract per image: mean/std intensity + an 8-dim
    row-mean embedding. Arrow-batched mapInPandas; the batch shape
    (many rows per python call, numpy inside) is the production path —
    only the decoder body is stubbed."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, means, stds, embs = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                img = _decode_image(bytes(payload), deterministic_fake)
                ids.append(mid)
                means.append(float(img.mean()))
                stds.append(float(img.std()))
                embs.append(img.mean(axis=1).tolist())
            yield pd.DataFrame({
                "media_id": ids, "mean_intensity": means,
                "std_intensity": stds, "embedding": embs,
            })

    return media.where(F.col("kind") == "image").mapInPandas(
        run, "media_id long, mean_intensity double, std_intensity double, "
             "embedding array<double>")


def resize_images(media: DataFrame, width: int, height: int,
                  deterministic_fake: bool = False) -> DataFrame:
    """Resize stub: decodes, 'resizes' (fake: tiles/crops the 8x8 fake
    decode), re-encodes to raw bytes. Shows the binary-in/binary-out
    UDF shape used for real thumbnailing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payloads = []
            for payload in pdf["payload"]:
                img = _decode_image(bytes(payload), deterministic_fake)
                reps = (height // 8 + 1, width // 8 + 1)
                resized = np.tile(img, reps)[:height, :width]
                out_payloads.append(bytearray((resized * 255).astype(np.uint8).tobytes()))
            out = pdf.copy()
            out["payload"] = out_payloads
            out["width"] = width
            out["height"] = height
            yield out

    return media.where(F.col("kind") == "image").mapInPandas(run, MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000,
                  deterministic_fake: bool = False) -> DataFrame:
    """Video frame sampling stub: one output row per sampled frame
    (media_id, frame_idx, ts_ms, frame_payload); the explode shape of
    real frame extraction."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                if not deterministic_fake:
                    raise NotImplementedError("video decode not available")
                dur = int(dur) if dur is not None and not pd.isna(dur) else 3000
                for i, ts in enumerate(range(0, dur, every_ms)):
                    frame = bytes(payload[:32].ljust(32, b"\0")) + ts.to_bytes(4, "little")
                    rows.append((int(mid), i, ts, bytearray(frame)))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "ts_ms", "frame_payload"])

    return media.where(F.col("kind") == "video").mapInPandas(
        run, "media_id long, frame_idx int, ts_ms int, frame_payload binary")
