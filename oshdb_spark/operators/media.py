"""Multimodal column plumbing: image/audio/video as opaque binary +
typed metadata, processed via ``mapInPandas``.

The image/audio codec libraries are not available in this container,
so the decode step is STUBBED (deterministic fake pixels seeded from
the payload digest, or ``NotImplementedError`` in strict mode) — but
everything Spark-side is real and tested: schema, Arrow batch shape,
partition-preserving UDF signatures, and the metadata columns a
100 TB multimodal pipeline would filter and partition on.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_ref string, media_type string, payload binary, width int, height int"
)

FEATURE_SCHEMA = (
    "media_ref string, media_type string, width int, height int, "
    "n_bytes long, mean_intensity double, feature array<float>"
)

STRICT_DECODE = False  # flip to raise NotImplementedError instead of faking


def _fake_decode(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in for a real image decode: pixels seeded
    from the payload digest. Replace with PIL/libvips when available."""
    if STRICT_DECODE:
        raise NotImplementedError("real media decode requires codec libs")
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(max(height, 1), max(width, 1)), dtype=np.uint8)


def synth_media(docs: DataFrame) -> DataFrame:
    """Derive a deterministic media table from doc rows (payload =
    utf-8 of the doc text head; dims from doc_id)."""
    return docs.select(
        F.concat(F.lit("m://"), F.col("doc_id").cast("string")).alias("media_ref"),
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("media_type"),
        F.encode(F.substring(F.col("text"), 1, 64), "utf-8").alias("payload"),
        ((F.col("doc_id") % 16) + 1).cast("int").alias("width"),
        ((F.col("doc_id") % 8) + 1).cast("int").alias("height"),
    )


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Decode (stubbed) + feature-extract per Arrow batch. The batch
    shape, schema and partitioning are the real thing; only the codec
    call is fake."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            feats, means, nbytes = [], [], []
            for payload, w, h in zip(pdf["payload"], pdf["width"], pdf["height"]):
                img = _fake_decode(bytes(payload), int(w), int(h))
                means.append(float(img.mean()))
                nbytes.append(len(payload))
                hist, _ = np.histogram(img, bins=dim, range=(0, 256))
                total = hist.sum() or 1
                feats.append((hist / total).astype(np.float32).tolist())
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "media_type": pdf["media_type"],
                    "width": pdf["width"].astype("int32"),
                    "height": pdf["height"].astype("int32"),
                    "n_bytes": pd.Series(nbytes, dtype="int64"),
                    "mean_intensity": means,
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


RESIZE_SCHEMA = (
    "media_ref string, media_type string, width int, height int, "
    "out_w int, out_h int, payload binary"
)


def resize_images(media: DataFrame, out_w: int = 4, out_h: int = 4) -> DataFrame:
    """Resize (stubbed decode + real nearest-neighbour resample + real
    re-encode of the pixel buffer): the Spark-side contract — schema,
    Arrow batching, binary output column — is what a libvips-backed
    version would keep byte-for-byte."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            payloads = []
            for payload, w, h in zip(pdf["payload"], pdf["width"], pdf["height"]):
                img = _fake_decode(bytes(payload), int(w), int(h))
                ys = (np.arange(out_h) * img.shape[0]) // out_h
                xs = (np.arange(out_w) * img.shape[1]) // out_w
                payloads.append(img[np.ix_(ys, xs)].tobytes())
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "media_type": pdf["media_type"],
                    "width": pdf["width"].astype("int32"),
                    "height": pdf["height"].astype("int32"),
                    "out_w": np.full(len(pdf), out_w, dtype=np.int32),
                    "out_h": np.full(len(pdf), out_h, dtype=np.int32),
                    "payload": payloads,
                }
            )

    return media.mapInPandas(run, RESIZE_SCHEMA)


FRAME_SCHEMA = "media_ref string, frame_idx int, frame_mean double"


def sample_frames(media: DataFrame, n_frames: int = 3) -> DataFrame:
    """Frame sampling for video media: 1 -> N rows per video with
    deterministic per-frame stand-in decodes (payload digest + frame
    index seeded). The fan-out shape (mapInPandas emitting multiple
    rows per input) is exactly the real codec version's."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vids = pdf[pdf["media_type"] == "video/mp4"]
            if vids.empty:
                continue
            refs, idxs, means = [], [], []
            for ref, payload, w, h in zip(
                vids["media_ref"], vids["payload"], vids["width"], vids["height"]
            ):
                for i in range(n_frames):
                    frame = _fake_decode(
                        bytes(payload) + i.to_bytes(4, "big"), int(w), int(h)
                    )
                    refs.append(ref)
                    idxs.append(i)
                    means.append(float(frame.mean()))
            yield pd.DataFrame(
                {
                    "media_ref": refs,
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_mean": means,
                }
            )

    return media.mapInPandas(run, FRAME_SCHEMA)
