"""Multimodal plumbing and the real byte-level decode tier: schema,
Arrow batch shapes, deterministic fake decode, frame sampling, PPM/BMP/
WAV codec round-trips, real feature extraction / resize / probe."""

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


def test_real_decoder_rejects_opaque_payloads(spark):
    # synthesize_media_df payloads are raw text bytes — not a supported
    # container; the real tier must refuse, not silently hash-fake.
    docs = read_table(spark, SF_SMOKE, "documents")
    media = synthesize_media_df(docs)
    with pytest.raises(Exception, match="PPM/BMP/WAV"):
        extract_features(media, decoder="real").collect()


# ---------------------------------------------------------------- codecs
# Pure byte-level, no Spark session needed.


def test_codec_roundtrips():
    import numpy as np

    from tw_etl_spark.operators import codecs

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (13, 9, 3), dtype=np.uint8)
    assert (codecs.decode_ppm(codecs.encode_ppm(img)) == img).all()
    assert (codecs.decode_bmp(codecs.encode_bmp(img)) == img).all()

    samples = rng.integers(-(2**15), 2**15, (1000, 2), dtype=np.int16)
    rate, back = codecs.decode_wav(codecs.encode_wav(16000, samples))
    assert rate == 16000 and (back == samples).all()

    assert codecs.sniff(codecs.encode_ppm(img)) == "ppm"
    assert codecs.sniff(codecs.encode_bmp(img)) == "bmp"
    assert codecs.sniff(codecs.encode_wav(8000, samples)) == "wav"
    assert codecs.sniff(b"plain text") is None


def test_codec_resize_and_probe():
    import numpy as np

    from tw_etl_spark.operators import codecs

    # resize: exact block-replication case is checkable bit-for-bit
    img = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
    up = codecs.resize_nearest(img, 4, 4)
    assert up.shape == (4, 4, 3)
    assert (up[0, 0] == img[0, 0]).all() and (up[3, 3] == img[1, 1]).all()

    p = codecs.probe(codecs.encode_bmp(np.zeros((6, 8, 3), dtype=np.uint8)))
    assert (p["codec"], p["width"], p["height"]) == ("bmp", 8, 6)
    samples = np.zeros(8000, dtype=np.int16)
    p = codecs.probe(codecs.encode_wav(8000, samples))
    assert (p["codec"], p["sample_rate"], p["duration_ms"]) == ("wav", 8000, 1000)


def test_real_decode_end_to_end(spark):
    """decoder='real' runs true byte-level decodes over Spark: features
    are content-derived (uniform image ⇒ uniform thumbnail), stable
    under repartitioning."""
    from tw_etl_spark.operators.multimodal import synthesize_real_media_df

    docs = read_table(spark, SF_SMOKE, "documents").limit(60)
    media = synthesize_real_media_df(docs)
    feats = extract_features(media, decoder="real")
    rows = feats.collect()
    assert len(rows) == 60
    for r in rows:
        assert len(r.features) == FEATURE_DIM
        assert all(0.0 <= v <= 1.0 for v in r.features)
    again = {
        r.media_id: tuple(r.features)
        for r in extract_features(media.repartition(7), decoder="real").collect()
    }
    assert again == {r.media_id: tuple(r.features) for r in rows}


def test_real_resize_and_probe_end_to_end(spark):
    from tw_etl_spark.operators import codecs
    from tw_etl_spark.operators.multimodal import (
        probe_media,
        resize_images,
        synthesize_real_media_df,
    )

    docs = read_table(spark, SF_SMOKE, "documents").limit(45)
    media = synthesize_real_media_df(docs)

    resized = resize_images(media, 16, 12, decoder="real").toPandas()
    imgs = resized[resized["media_type"] == "image"]
    assert len(imgs) > 0
    for _, r in imgs.iterrows():
        b = bytes(r.payload)
        kind = codecs.sniff(b)
        decoded = codecs.decode_ppm(b) if kind == "ppm" else codecs.decode_bmp(b)
        assert decoded.shape == (12, 16, 3)  # true pixel dims, not metadata
        assert (r.meta["width"], r.meta["height"]) == (16, 12)

    probed = probe_media(media).toPandas().set_index("media_id")
    src = media.toPandas().set_index("media_id")
    for mid, r in probed.iterrows():
        meta = src.loc[mid, "meta"]
        assert r.codec == meta["codec"]
        if r.codec in ("ppm", "bmp"):
            assert (r.width, r.height) == (meta["width"], meta["height"])
        else:
            assert r.duration_ms == meta["duration_ms"]


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


def test_m1_oracle_handles_empty_and_null_text(spark, tmp_path):
    """The Spark synthesizer substitutes b'\\x00' for empty/NULL text
    (multimodal.py: raw = text.encode() or b'\\x00'); the m1/io3 DuckDB
    oracles must mirror that fallback instead of dividing by a zero
    octet_length. Crafted fixture: one NULL-text and one empty-text doc
    in each codec parity class, plus a normal row."""
    import os
    import shutil as _sh

    from tw_etl_spark.catalog import TABLES, table_path
    from tw_etl_spark.queries import REGISTRY, all_queries
    from tests.oracle_utils import check_query

    all_queries()  # populate REGISTRY

    d = str(tmp_path / "sfx")
    os.makedirs(d)
    for t in TABLES:
        _sh.copy(table_path(SF_SMOKE, t), table_path(d, t))
    docs = spark.createDataFrame(
        [
            (0, "s", None),  # even -> ppm, NULL text
            (1, "s", None),  # odd -> wav, NULL text
            (2, "s", ""),  # even -> ppm, empty text
            (3, "s", ""),  # odd -> wav, empty text
            (4, "s", "hello world"),
        ],
        "doc_id long, source string, text string",
    )
    os.remove(table_path(d, "documents"))
    docs.toPandas().to_parquet(table_path(d, "documents"))
    check_query(spark, REGISTRY["m1_media_sidecar_probe"], d)


def test_codec_roundtrips_property():
    """Hypothesis: every (h, w) uint8 image round-trips PPM and BMP
    bit-exactly; every PCM16 sample block round-trips WAV."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from tw_etl_spark.operators import codecs

    @settings(max_examples=40, deadline=None)
    @given(
        h=st.integers(1, 24),
        w=st.integers(1, 24),
        seed=st.integers(0, 2**31 - 1),
    )
    def img_case(h, w, seed):
        img = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert (codecs.decode_ppm(codecs.encode_ppm(img)) == img).all()
        assert (codecs.decode_bmp(codecs.encode_bmp(img)) == img).all()
        p = codecs.probe(codecs.encode_bmp(img))
        assert (p["width"], p["height"]) == (w, h)

    @settings(max_examples=40, deadline=None)
    @given(
        n=st.integers(1, 500),
        ch=st.integers(1, 2),
        rate=st.sampled_from([8000, 16000, 44100]),
        seed=st.integers(0, 2**31 - 1),
    )
    def wav_case(n, ch, rate, seed):
        s = np.random.default_rng(seed).integers(
            -(2**15), 2**15, (n, ch), dtype=np.int16
        )
        r, back = codecs.decode_wav(codecs.encode_wav(rate, s))
        assert r == rate and (back == s).all()

    img_case()
    wav_case()


def test_decode_wav_malformed_fmt_raises_valueerror():
    """A RIFF with a data chunk but unusable fmt fields must raise a
    clean ValueError, not TypeError/ZeroDivisionError from the
    trailing-byte modulo."""
    import struct

    import pytest

    from tw_etl_spark.operators.codecs import decode_wav

    def riff(chunks: bytes) -> bytes:
        return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) % 2 else b"")

    data = chunk(b"data", b"\x01\x00" * 8)
    # no fmt chunk at all
    with pytest.raises(ValueError):
        decode_wav(riff(data))
    # fmt present but truncated (too short for the bits field)
    with pytest.raises(ValueError):
        decode_wav(riff(chunk(b"fmt ", struct.pack("<HHI", 1, 1, 8000)) + data))
    # fmt with zero channels
    fmt0 = struct.pack("<HHIIHH", 1, 0, 8000, 16000, 2, 16)
    with pytest.raises(ValueError):
        decode_wav(riff(chunk(b"fmt ", fmt0) + data))


def test_perceptual_neardup_crafted_images(spark):
    """Crafted near-identical images (dd11's operator): a base PPM, a
    copy with ONE pixel nudged (tiny Hamming), and a structurally
    different image (inverted gradient). The near pair must surface
    with small hamming; the different image must not pair with the
    base at the threshold."""
    import numpy as np

    from tw_etl_spark.operators.codecs import encode_ppm
    from tw_etl_spark.operators.multimodal import (
        ahash_media,
        perceptual_neardup_pairs,
    )

    # 16x16 horizontal gradient: left dark, right bright
    base = np.tile(
        np.linspace(0, 255, 16).astype(np.uint8)[None, :, None], (16, 1, 3)
    )
    near = base.copy()
    near[0, 0] = 255  # one pixel flipped bright
    far = base[:, ::-1]  # mirrored gradient: bright left, dark right

    rows = [
        (0, encode_ppm(base)),
        (1, encode_ppm(near)),
        (2, encode_ppm(far)),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")

    hashes = {r.media_id: r.ahash for r in ahash_media(media).collect()}
    assert hashes[0] != hashes[2]  # structure is visible to the hash

    got = {
        (r.id_a, r.id_b): r.hamming
        for r in perceptual_neardup_pairs(media, max_hamming=7).collect()
    }
    assert (0, 1) in got and got[(0, 1)] <= 2   # near-identical found
    assert (0, 2) not in got                     # mirrored image rejected


def test_perceptual_pair_exchange_carries_ids_only(spark):
    """dd11's shuffle discipline (the dd3p rule at the multimodal tier):
    the candidate-pair distinct must exchange (id_a, id_b) alone —
    never payloads, never band arrays."""
    from tw_etl_spark.catalog import read_table
    from tw_etl_spark.operators.multimodal import (
        perceptual_neardup_pairs,
        synthesize_image_df,
    )
    from tw_etl_spark.plans.inspect import explain_str
    from tests.conftest import SF_SMOKE

    docs = read_table(spark, SF_SMOKE, "documents")
    plan = explain_str(perceptual_neardup_pairs(synthesize_image_df(docs)))
    pair_exchanges = [
        b
        for b in plan.split("\n\n")
        if ") Exchange" in b and "hashpartitioning(id_a" in b
    ]
    assert pair_exchanges, "expected a hashpartitioning(id_a, id_b) exchange"
    for block in pair_exchanges:
        assert "payload" not in block and "bands" not in block, block


def test_audio_fingerprint_crafted_clips(spark):
    """Crafted near-identical audio (dd12's operator): a base clip with
    a distinctive loud-quiet energy shape, a copy with a handful of
    samples nudged (tiny Hamming), and a clip with the inverted energy
    shape. The near pair must surface with small hamming; the inverted
    clip must not pair with the base at the threshold."""
    import numpy as np

    from tw_etl_spark.operators.codecs import encode_wav
    from tw_etl_spark.operators.multimodal import (
        audio_fingerprint,
        audio_neardup_pairs,
    )

    n = 1024
    loud_first = np.where(np.arange(n) < n // 2, 12000, 100).astype(np.int16)
    near = loud_first.copy()
    near[5:10] = 11000  # nudge a few samples, same energy shape
    quiet_first = loud_first[::-1].copy()  # inverted energy profile

    rows = [
        (0, encode_wav(8000, loud_first)),
        (1, encode_wav(8000, near)),
        (2, encode_wav(8000, quiet_first)),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")

    fps = {r.media_id: r.ahash for r in audio_fingerprint(media).collect()}
    assert fps[0] != fps[2]  # the energy structure is visible

    got = {
        (r.id_a, r.id_b): r.hamming
        for r in audio_neardup_pairs(media, max_hamming=7).collect()
    }
    assert (0, 1) in got and got[(0, 1)] <= 2
    assert (0, 2) not in got


def test_audio_pair_exchange_carries_ids_only(spark):
    """dd12 inherits the dd3p shuffle discipline through
    banded_hamming_pairs: the candidate-pair distinct exchanges
    (id_a, id_b) alone — never payloads, never band arrays."""
    from tw_etl_spark.catalog import read_table
    from tw_etl_spark.operators.multimodal import (
        audio_neardup_pairs,
        synthesize_audio_df,
    )
    from tw_etl_spark.plans.inspect import explain_str
    from tests.conftest import SF_SMOKE

    docs = read_table(spark, SF_SMOKE, "documents")
    plan = explain_str(audio_neardup_pairs(synthesize_audio_df(docs)))
    pair_exchanges = [
        b
        for b in plan.split("\n\n")
        if ") Exchange" in b and "hashpartitioning(id_a" in b
    ]
    assert pair_exchanges, "expected a hashpartitioning(id_a, id_b) exchange"
    for block in pair_exchanges:
        assert "payload" not in block and "bands" not in block, block


def test_decode_ppm_stream_roundtrip_and_errors():
    """decode_ppm_stream: a 3-frame concatenated clip round-trips
    frame-exact; truncation and junk between frames fail loud."""
    import numpy as np
    import pytest

    from tw_etl_spark.operators.codecs import decode_ppm_stream, encode_ppm

    frames = [
        (np.arange(2 * 3 * 3, dtype=np.uint8).reshape(3, 2, 3) + 10 * f)
        for f in range(3)
    ]
    payload = b"".join(encode_ppm(f) for f in frames)
    got = decode_ppm_stream(payload)
    assert len(got) == 3
    for a, b in zip(frames, got):
        assert (a == b).all()
    with pytest.raises(ValueError):
        decode_ppm_stream(payload[:-1])  # truncated last raster
    with pytest.raises(ValueError):
        decode_ppm_stream(payload + b"JUNK")  # trailing garbage
    with pytest.raises(ValueError):
        decode_ppm_stream(b"")  # empty stream


def test_video_neardup_crafted_clips(spark):
    """Crafted near-identical videos (dd13's operator): a base 3-frame
    clip with a left-dark/right-bright gradient, a copy with one pixel
    nudged in one frame (tiny Hamming), and a mirrored-gradient clip.
    The near pair surfaces small; the mirrored clip does not pair."""
    import numpy as np

    from tw_etl_spark.operators.codecs import encode_ppm
    from tw_etl_spark.operators.multimodal import (
        video_fingerprint,
        video_neardup_pairs,
    )

    base_frame = np.tile(
        np.linspace(0, 255, 16).astype(np.uint8)[None, :, None], (16, 1, 3)
    )
    base = [base_frame + 0, base_frame + 0, base_frame + 0]
    near = [f.copy() for f in base]
    near[1][0, 0] = 255
    far = [f[:, ::-1] for f in base]

    def clip(frames):
        return b"".join(encode_ppm(f) for f in frames)

    media = spark.createDataFrame(
        [(0, clip(base)), (1, clip(near)), (2, clip(far))],
        "media_id long, payload binary",
    )
    fps = {r.media_id: r.ahash for r in video_fingerprint(media).collect()}
    assert fps[0] != fps[2]
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in video_neardup_pairs(media, max_hamming=7).collect()
    }
    assert (0, 1) in got and got[(0, 1)] <= 2
    assert (0, 2) not in got
