"""Multimodal plumbing: schema, Arrow batch shapes, deterministic fake
decode, frame sampling, and the real-decoder stub contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tw_etl_spark.catalog import read_table
from tw_etl_spark.operators.multimodal import (
    FEATURE_DIM,
    extract_features,
    sample_frames,
    synthesize_media_df,
)
from tests.conftest import SF_SMOKE


def test_media_schema_and_features(spark):
    docs = read_table(spark, SF_SMOKE, "documents")
    media = synthesize_media_df(docs)
    feats = extract_features(media)
    rows = feats.orderBy("media_id").limit(5).collect()
    assert len(rows) == 5
    for r in rows:
        assert len(r.features) == FEATURE_DIM
        assert all(0.0 <= v < 1.0 for v in r.features)
        assert r.n_bytes > 0


def test_fake_decode_deterministic(spark):
    docs = read_table(spark, SF_SMOKE, "documents")
    media = synthesize_media_df(docs)
    a = {r.media_id: tuple(r.features) for r in extract_features(media).collect()}
    b = {r.media_id: tuple(r.features) for r in extract_features(media.repartition(7)).collect()}
    assert a == b  # partitioning must not change results


def test_frame_sampling_counts(spark):
    docs = read_table(spark, SF_SMOKE, "documents")
    media = synthesize_media_df(docs)
    frames = sample_frames(media, every_ms=1000)
    one = media.filter(F.col("media_type") == "video").first()
    expect = (one.meta.duration_ms - 1) // 1000 + 1
    got = frames.filter(F.col("media_id") == one.media_id).count()
    assert got == expect


def test_real_decoder_is_stubbed(spark):
    docs = read_table(spark, SF_SMOKE, "documents")
    media = synthesize_media_df(docs)
    with pytest.raises(Exception, match="NotImplementedError|real media decoding"):
        extract_features(media, decoder="real").collect()


def test_resize_images_plumbing(spark):
    from tw_etl_spark.operators.multimodal import resize_images, synthesize_media_df

    docs = read_table(spark, SF_SMOKE, "documents")
    media = synthesize_media_df(docs)
    out = resize_images(media, 64, 64).toPandas()
    src = media.toPandas()
    # row-preserving, schema-preserving
    assert len(out) == len(src)
    imgs = out[out["media_type"] == "image"]
    others = out[out["media_type"] != "image"]
    # every image re-dimensioned and re-encoded to the target byte budget
    assert (imgs["meta"].map(lambda m: (m["width"], m["height"])) == (64, 64)).all()
    assert imgs["payload"].map(len).eq(64 * 64 // 64).all()
    # non-images untouched
    merged = others.merge(
        src[["media_id", "payload"]], on="media_id", suffixes=("", "_src")
    )
    assert merged.apply(lambda r: bytes(r.payload) == bytes(r.payload_src), axis=1).all()
