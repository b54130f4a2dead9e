"""Multimodal columns [EXT]: images/audio/video as opaque ``binary``
payloads with typed metadata, processed via Arrow-batched ``mapInPandas``
(SURVEY.md §2.2).

Mirrors the reference's artifact model — a media file plus two JSON
sidecars keyed by path (convert.sh:53-65: .mkv ↔ .json ↔
_packets.json.gz) — as one row: payload + metadata struct, joined on
path.

The *decode* step (ffprobe/ffmpeg in the reference, convert.sh:58,73-97;
image/audio codecs here) needs external libraries this container doesn't
ship, so decoding is STUBBED: ``decoder="fake"`` produces deterministic
per-payload features (documented below), ``decoder="real"`` raises
NotImplementedError at the first batch. Everything Spark-side — schema,
Arrow batch shapes, partitioning, UDF signatures — is real and tested.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("path", T.StringType()),
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def synthesize_media_df(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table derived from the documents fixture:
    payload = utf-8 text bytes, metadata from doc stats. Stands in for a
    real binary ingest so the plumbing is exercised end-to-end."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.format_string("media/%s/doc_%d.bin", "source", "doc_id").alias("path"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.col("text").cast("binary").alias("payload"),
        F.struct(
            (F.col("n_chars") % 1920).cast("int").alias("width"),
            (F.col("n_chars") % 1080).cast("int").alias("height"),
            (F.col("n_chars") * 40).cast("long").alias("duration_ms"),
            F.lit("fake").alias("codec"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a real decoder: sha256 → FEATURE_DIM
    floats in [0,1). Stable across processes/partitions."""
    h = hashlib.sha256(payload or b"").digest()
    raw = np.frombuffer((h * ((FEATURE_DIM * 4) // len(h) + 1))[: FEATURE_DIM * 4], dtype=np.uint32)
    return (raw % 10_000).astype(np.float32) / 10_000.0


def extract_features(media: DataFrame, decoder: str = "fake") -> DataFrame:
    """Decode payloads → fixed-dim feature vectors via mapInPandas.

    Arrow batches stream through Python once; no collect, no shuffle —
    the operator scales with input partitions. ``decoder="real"`` is the
    integration point for an actual image/audio library."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "real media decoding requires codec libraries not present "
                    "in this environment; use decoder='fake'"
                )
            feats = [
                _fake_decode(bytes(p) if p is not None else b"")
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: len(p) if p is not None else 0
                    ),
                    "features": [f.tolist() for f in feats],
                }
            )

    return media.mapInPandas(gen, schema=FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame offset
    (duration_ms / every_ms rows). The actual pixel decode is stubbed
    behind the same fake-decoder contract."""
    return (
        media.filter(F.col("media_type") == "video")
        .select(
            "media_id",
            "path",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_offset_ms"),
        )
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)


def resize_images(
    media: DataFrame, width: int, height: int, decoder: str = "fake"
) -> DataFrame:
    """Image-resize plumbing over mapInPandas: images are re-encoded to
    (width, height); non-image rows pass through untouched. The pixel
    transform is stubbed (``fake``: payload truncated/padded to
    width*height//64 bytes, deterministically) — the Spark contract
    (schema preservation, Arrow batching, partition-parallel, no
    shuffle) is the real, tested part; ``decoder="real"`` is the
    integration point for an actual image library."""

    target_bytes = max(width * height // 64, 1)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "real image resizing requires codec libraries not "
                    "present in this environment; use decoder='fake'"
                )
            out = pdf.copy()
            is_img = out["media_type"] == "image"

            def fake_resize(p: bytes | None) -> bytes:
                b = bytes(p) if p is not None else b""
                return (b * (target_bytes // max(len(b), 1) + 1))[:target_bytes]

            out.loc[is_img, "payload"] = out.loc[is_img, "payload"].map(fake_resize)
            out["meta"] = [
                {**m, "width": width, "height": height} if i else m
                for m, i in zip(out["meta"], is_img)
            ]
            yield out[["media_id", "media_type", "payload", "meta"]]

    return media.select(
        "media_id", "media_type", "payload", "meta"
    ).mapInPandas(gen, schema=RESIZED_SCHEMA)
