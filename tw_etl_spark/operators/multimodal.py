"""Multimodal columns [EXT]: images/audio/video as opaque ``binary``
payloads with typed metadata, processed via Arrow-batched ``mapInPandas``
(SURVEY.md §2.2).

Mirrors the reference's artifact model — a media file plus two JSON
sidecars keyed by path (convert.sh:53-65: .mkv ↔ .json ↔
_packets.json.gz) — as one row: payload + metadata struct, joined on
path.

The *decode* step mirrors the reference's ffprobe/ffmpeg stage
(convert.sh:58,73-97) at two tiers:

- ``decoder="real"`` — an actual byte-level decode via the
  dependency-free codecs in :mod:`tw_etl_spark.operators.codecs`
  (PPM/BMP images, PCM16 WAV audio): content-derived features, true
  nearest-neighbor pixel resize, ffprobe-style metadata probe.
  Unsupported containers (e.g. real video codecs) raise ``ValueError``
  naming the payload — honest, not silently fake.
- ``decoder="fake"`` — deterministic hash-derived features for plumbing
  tests and for payloads in formats the real tier doesn't cover.

Everything Spark-side — schema, Arrow batch shapes, partitioning, UDF
signatures — is identical between tiers.
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


def synthesize_real_media_df(docs: DataFrame) -> DataFrame:
    """Genuine decodable media derived deterministically from documents:
    doc_id % 3 picks PPM image / WAV clip / BMP image, pixels and
    samples seeded from doc_id. Unlike :func:`synthesize_media_df`
    (opaque text bytes), every payload here parses with
    :mod:`operators.codecs` — so ``decoder="real"`` paths run true
    byte-level decodes end-to-end in tests. Built per Arrow batch on
    executors; no driver data, no shuffle."""
    from tw_etl_spark.operators import codecs

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, source in zip(pdf["doc_id"], pdf["source"]):
                rng = np.random.default_rng(int(doc_id))
                kind = int(doc_id) % 3
                if kind == 0:  # PPM image
                    w, h = 8 + int(doc_id) % 9, 6 + int(doc_id) % 7
                    payload = codecs.encode_ppm(
                        rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
                    )
                    meta = {"width": w, "height": h, "duration_ms": None, "codec": "ppm"}
                    mt = "image"
                elif kind == 1:  # WAV clip
                    rate, n = 8000, 800 + int(doc_id) % 400
                    samples = (
                        np.sin(np.arange(n) * (0.01 + (int(doc_id) % 50) / 1000.0))
                        * 12000
                    ).astype(np.int16)
                    payload = codecs.encode_wav(rate, samples)
                    meta = {
                        "width": None,
                        "height": None,
                        "duration_ms": int(n * 1000 / rate),
                        "codec": "wav",
                    }
                    mt = "audio"
                else:  # BMP image
                    w, h = 5 + int(doc_id) % 11, 4 + int(doc_id) % 5
                    payload = codecs.encode_bmp(
                        rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
                    )
                    meta = {"width": w, "height": h, "duration_ms": None, "codec": "bmp"}
                    mt = "image"
                rows.append(
                    {
                        "media_id": int(doc_id),
                        "path": f"media/{source}/doc_{int(doc_id)}.{meta['codec']}",
                        "media_type": mt,
                        "payload": payload,
                        "meta": meta,
                    }
                )
            yield pd.DataFrame(rows)

    return docs.select("doc_id", "source").mapInPandas(gen, schema=MEDIA_SCHEMA)


def synthesize_sidecar_media_df(docs: DataFrame) -> DataFrame:
    """Genuine decodable media whose BYTES are a pure function of the
    document row — unlike :func:`synthesize_real_media_df` (numpy RNG
    pixels), every byte here is reconstructible by any engine, which is
    what puts the decode tier under a cross-engine hash oracle (m1).

    Construction (mirrors the reference's file ↔ .json ↔
    _packets.json.gz sidecar triple, convert.sh:53-65 — one media
    payload per source row, metadata recoverable from the bytes):

    - even doc_id → P6 PPM, width 4 + doc_id%5, height 3 + doc_id%4,
      raster = the doc's UTF-8 text bytes cycled to w*h*3;
    - odd doc_id → PCM16 mono WAV @8000 Hz, n = 100 + doc_id%50
      frames, data = the text bytes cycled to 2n (pairs read as
      little-endian int16 samples).
    """
    from tw_etl_spark.operators import codecs

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, source, text in zip(
                pdf["doc_id"], pdf["source"], pdf["text"]
            ):
                doc_id = int(doc_id)
                raw = (text or "").encode("utf-8") or b"\x00"
                if doc_id % 2 == 0:
                    w, h = 4 + doc_id % 5, 3 + doc_id % 4
                    need = w * h * 3
                    body = (raw * (need // len(raw) + 1))[:need]
                    payload = b"P6\n%d %d\n255\n" % (w, h) + body
                    meta = {"width": w, "height": h, "duration_ms": None, "codec": "ppm"}
                    mt = "image"
                else:
                    rate, n = 8000, 100 + doc_id % 50
                    need = 2 * n
                    data = (raw * (need // len(raw) + 1))[:need]
                    payload = codecs.encode_wav(
                        rate, np.frombuffer(data, dtype="<i2")
                    )
                    meta = {
                        "width": None,
                        "height": None,
                        "duration_ms": int(n * 1000 / rate),
                        "codec": "wav",
                    }
                    mt = "audio"
                rows.append(
                    {
                        "media_id": doc_id,
                        "path": f"media/{source}/doc_{doc_id}.{meta['codec']}",
                        "media_type": mt,
                        "payload": payload,
                        "meta": meta,
                    }
                )
            yield pd.DataFrame(rows)

    return docs.select("doc_id", "source", "text").mapInPandas(
        gen, schema=MEDIA_SCHEMA
    )


def synthesize_image_df(docs: DataFrame) -> DataFrame:
    """Deterministic PPM image per documents row — the
    :func:`synthesize_sidecar_media_df` image construction (width
    4 + doc_id%5, height 3 + doc_id%4, raster = UTF-8 text bytes cycled
    to w*h*3) applied to EVERY doc, so duplicate/near-duplicate texts
    yield duplicate/near-duplicate images: the planted structure the
    perceptual-hash dedup tier (dd11) detects. Every byte is a pure
    function of the row — engine-reconstructible, hash-oracle-able."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, source, text in zip(
                pdf["doc_id"], pdf["source"], pdf["text"]
            ):
                doc_id = int(doc_id)
                raw = (text or "").encode("utf-8") or b"\x00"
                w, h = 4 + doc_id % 5, 3 + doc_id % 4
                need = w * h * 3
                body = (raw * (need // len(raw) + 1))[:need]
                rows.append(
                    {
                        "media_id": doc_id,
                        "path": f"media/{source}/doc_{doc_id}.ppm",
                        "media_type": "image",
                        "payload": b"P6\n%d %d\n255\n" % (w, h) + body,
                        "meta": {
                            "width": w,
                            "height": h,
                            "duration_ms": None,
                            "codec": "ppm",
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return docs.select("doc_id", "source", "text").mapInPandas(
        gen, schema=MEDIA_SCHEMA
    )


AHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("ahash", T.StringType()),
        T.StructField("bands", T.ArrayType(T.IntegerType())),
    ]
)


def ahash_media(media: DataFrame, grid: int = 8) -> DataFrame:
    """Perceptual average-hash (aHash) over genuinely DECODED image
    payloads — the standard multimodal near-dup fingerprint (same family
    as pHash/dHash; public technique): grid² grayscale samples, one bit
    per cell = cell >= mean.

    All INTEGER math so the hash is engine-reconstructible (dd11's
    DuckDB oracle replays it in hex-string space like m1):

    - cell (y, x) samples source pixel (y*h//grid, x*w//grid)
      (nearest-neighbor index arithmetic, the codecs.resize_nearest
      rule) and scores g = r + g + b (0..765 — an integer luminance);
    - bit_i = (grid² * g_i >= Σ g) — the mean comparison cleared of
      division;
    - bits pack little-endian into grid²/8 8-bit bands (``bands``) and
      a hex string (``ahash``).

    Arrow-batched mapInPandas, no shuffle; output is one ~40-byte row
    per image (ids + 8 small ints — payloads never leave the scan)."""
    from tw_etl_spark.operators import codecs

    n_bits = grid * grid
    assert n_bits % 8 == 0, grid

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hexes, bands_out = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(p)
                kind = codecs.sniff(b)
                if kind == "ppm":
                    img = codecs.decode_ppm(b)
                elif kind == "bmp":
                    img = codecs.decode_bmp(b)
                else:
                    raise ValueError(
                        f"ahash_media supports PPM/BMP payloads; got {b[:8]!r}"
                    )
                g = img.astype(np.int64).sum(axis=2)
                h, w = g.shape
                rows = (np.arange(grid) * h) // grid
                cols = (np.arange(grid) * w) // grid
                cells = g[rows][:, cols].ravel()
                total = int(cells.sum())
                bits = (n_bits * cells >= total).astype(np.int64)
                bvals = [
                    int(sum(int(bits[8 * k + j]) << j for j in range(8)))
                    for k in range(n_bits // 8)
                ]
                ids.append(int(mid))
                hexes.append("".join(f"{v:02x}" for v in bvals))
                bands_out.append(bvals)
            yield pd.DataFrame(
                {"media_id": ids, "ahash": hexes, "bands": bands_out}
            )

    return media.select("media_id", "payload").mapInPandas(
        gen, schema=AHASH_SCHEMA
    )


def perceptual_neardup_pairs(
    media: DataFrame, max_hamming: int = 7, grid: int = 8
) -> DataFrame:
    """Image near-dup pairs by perceptual-hash banding — the dd4p
    SimHash discipline applied to the multimodal tier: ``grid²/8``
    8-bit bands; a pair is a candidate iff SOME band matches (pigeonhole
    guarantees full recall for hamming <= n_bands - 1, so the default
    max_hamming=7 with 8 bands misses nothing); candidates verify by
    exact Hamming distance over the band ints (bit_count of xor — a
    JVM-side array fold).

    Scale shape: ONE decode pass emits the ~40-byte/image hash table
    (localCheckpointed — ids + 8 ints, never payloads), the band join
    shuffles (band, value, id) triples only, and the candidate-pair
    distinct carries ids alone; the per-side band arrays rejoin after
    the distinct (the dd3p never-shuffle-signatures-through-the-pair-
    explosion rule)."""
    ah = ahash_media(media, grid).localCheckpoint()
    return banded_hamming_pairs(ah, max_hamming)


def banded_hamming_pairs(ah: DataFrame, max_hamming: int) -> DataFrame:
    """Band-bucket candidate join + exact Hamming verify over any
    (media_id, bands) fingerprint table — the shared back half of the
    perceptual image tier (dd11) and the audio fingerprint tier (dd12).
    Full recall for hamming <= n_bands - 1 by pigeonhole; the pair
    exchange carries ids only, fingerprints rejoin after the distinct."""
    bands = ah.select(
        "media_id", F.posexplode("bands").alias("band", "v")
    )
    a = bands.select(F.col("media_id").alias("id_a"), "band", "v")
    b = bands.select(F.col("media_id").alias("id_b"), "band", "v")
    pairs = (
        a.join(b, ["band", "v"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    x = ah.select(F.col("media_id").alias("id_a"), F.col("bands").alias("ba"))
    y = ah.select(F.col("media_id").alias("id_b"), F.col("bands").alias("bb"))
    ham = pairs.join(x, "id_a").join(y, "id_b").select(
        "id_a",
        "id_b",
        F.aggregate(
            F.zip_with(
                "ba", "bb", lambda p, q: F.bit_count(p.bitwiseXOR(q))
            ),
            F.lit(0),
            lambda acc, t: acc + t,
        )
        .cast("long")
        .alias("hamming"),
    )
    return ham.filter(F.col("hamming") <= max_hamming)


PROBE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("codec", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)


def probe_media(media: DataFrame) -> DataFrame:
    """ffprobe analog as a DataFrame op: codec + true dimensions /
    duration parsed from payload bytes (reference: convert.sh:44-48
    pipes ffprobe JSON for exactly these fields). Arrow-batched,
    partition-parallel, no shuffle."""
    from tw_etl_spark.operators import codecs

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            probed = [
                codecs.probe(bytes(p) if p is not None else None)
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "codec": [p["codec"] for p in probed],
                    "width": pd.array([p["width"] for p in probed], dtype="Int32"),
                    "height": pd.array([p["height"] for p in probed], dtype="Int32"),
                    "sample_rate": pd.array(
                        [p["sample_rate"] for p in probed], dtype="Int32"
                    ),
                    "duration_ms": pd.array(
                        [p["duration_ms"] for p in probed], dtype="Int64"
                    ),
                }
            )

    return media.select("media_id", "payload").mapInPandas(gen, schema=PROBE_SCHEMA)


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a real decoder: sha256 → FEATURE_DIM
    floats in [0,1). Stable across processes/partitions."""
    h = hashlib.sha256(payload or b"").digest()
    raw = np.frombuffer((h * ((FEATURE_DIM * 4) // len(h) + 1))[: FEATURE_DIM * 4], dtype=np.uint32)
    return (raw % 10_000).astype(np.float32) / 10_000.0


def _real_decode(payload: bytes) -> np.ndarray:
    """Content-derived FEATURE_DIM features from a genuinely decoded
    payload: 4×4 grayscale thumbnail for images, 16-window RMS energy
    for audio. Raises on formats the codec tier doesn't cover."""
    from tw_etl_spark.operators import codecs

    kind = codecs.sniff(payload)
    if kind == "ppm":
        return codecs.image_features(codecs.decode_ppm(payload))
    if kind == "bmp":
        return codecs.image_features(codecs.decode_bmp(payload))
    if kind == "wav":
        _, samples = codecs.decode_wav(payload)
        return codecs.audio_features(samples)
    raise ValueError(
        f"decoder='real' supports PPM/BMP/WAV payloads; got "
        f"{payload[:8]!r} — use decoder='fake' for opaque payloads"
    )


def extract_features(media: DataFrame, decoder: str = "fake") -> DataFrame:
    """Decode payloads → fixed-dim feature vectors via mapInPandas.

    Arrow batches stream through Python once; no collect, no shuffle —
    the operator scales with input partitions. ``decoder="real"``
    byte-decodes PPM/BMP/WAV via :mod:`operators.codecs`."""

    decode = _real_decode if decoder == "real" else _fake_decode

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode(bytes(p) if p is not None else b"")
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
    """Image-resize over mapInPandas: image rows are re-encoded to
    (width, height); non-image rows pass through untouched. The Spark
    contract (schema preservation, Arrow batching, partition-parallel,
    no shuffle) is identical between tiers:

    - ``decoder="real"`` — decode PPM/BMP pixels, nearest-neighbor
      resize, re-encode in the same container, update meta to the true
      output dimensions (raises on undecodable image payloads).
    - ``decoder="fake"`` — payload truncated/padded to
      width*height//64 bytes, deterministically.
    """

    target_bytes = max(width * height // 64, 1)

    def real_resize(p: bytes | None) -> bytes:
        from tw_etl_spark.operators import codecs

        b = bytes(p) if p is not None else b""
        kind = codecs.sniff(b)
        if kind == "ppm":
            return codecs.encode_ppm(codecs.resize_nearest(codecs.decode_ppm(b), width, height))
        if kind == "bmp":
            return codecs.encode_bmp(codecs.resize_nearest(codecs.decode_bmp(b), width, height))
        raise ValueError(
            f"decoder='real' resize supports PPM/BMP images; got {b[:8]!r}"
        )

    def fake_resize(p: bytes | None) -> bytes:
        b = bytes(p) if p is not None else b""
        return (b * (target_bytes // max(len(b), 1) + 1))[:target_bytes]

    do_resize = real_resize if decoder == "real" else fake_resize
    out_codec = {"real": None, "fake": "fake"}[decoder]  # real keeps container name

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from tw_etl_spark.operators import codecs

        for pdf in batches:
            out = pdf.copy()
            is_img = out["media_type"] == "image"
            out.loc[is_img, "payload"] = out.loc[is_img, "payload"].map(do_resize)
            out["meta"] = [
                {
                    **m,
                    "width": width,
                    "height": height,
                    "codec": (codecs.sniff(bytes(p)) or m["codec"]) if out_codec is None else m["codec"],
                }
                if i
                else m
                for m, i, p in zip(out["meta"], is_img, out["payload"])
            ]
            yield out[["media_id", "media_type", "payload", "meta"]]

    return media.select(
        "media_id", "media_type", "payload", "meta"
    ).mapInPandas(gen, schema=RESIZED_SCHEMA)


def synthesize_audio_df(docs: DataFrame) -> DataFrame:
    """Deterministic PCM16 WAV per documents row — the
    :func:`synthesize_sidecar_media_df` audio construction (8000 Hz
    mono, n = 100 + doc_id%50 frames, data = UTF-8 text bytes cycled to
    2n, pairs read as little-endian int16) applied to EVERY doc, so
    duplicate/near-duplicate texts yield duplicate/near-duplicate
    waveforms: the planted structure the audio-fingerprint dedup tier
    (dd12) detects. Every byte is a pure function of the row —
    engine-reconstructible, hash-oracle-able."""
    from tw_etl_spark.operators import codecs

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, source, text in zip(
                pdf["doc_id"], pdf["source"], pdf["text"]
            ):
                doc_id = int(doc_id)
                raw = (text or "").encode("utf-8") or b"\x00"
                rate, n = 8000, 100 + doc_id % 50
                need = 2 * n
                data = (raw * (need // len(raw) + 1))[:need]
                rows.append(
                    {
                        "media_id": doc_id,
                        "path": f"media/{source}/doc_{doc_id}.wav",
                        "media_type": "audio",
                        "payload": codecs.encode_wav(
                            rate, np.frombuffer(data, dtype="<i2")
                        ),
                        "meta": {
                            "width": None,
                            "height": None,
                            "duration_ms": int(n * 1000 / rate),
                            "codec": "wav",
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return docs.select("doc_id", "source", "text").mapInPandas(
        gen, schema=MEDIA_SCHEMA
    )


def audio_fingerprint(media: DataFrame, windows: int = 64) -> DataFrame:
    """Energy-profile audio fingerprint over genuinely DECODED WAV
    payloads — the acoustic-fingerprint shape (Chromaprint-family
    energy-band thresholding; public technique) reduced to pure integer
    math so any engine can replay it:

    - sample i (mono int16) belongs to window w = (windows*i) // n
      (monotone floor partition — every window nonempty when
      n >= windows);
    - window energy e_w = Σ |sample| (exact BIGINT — mean absolute
      amplitude, the L1 energy profile);
    - bit_w = (windows * e_w >= Σ e) — the louder-than-mean test
      cleared of division (the ahash rule);
    - bits pack little-endian into windows/8 8-bit bands (the
      :func:`banded_hamming_pairs` fingerprint contract).

    Arrow-batched mapInPandas, no shuffle; one ~40-byte row per clip —
    payloads never leave the scan."""
    from tw_etl_spark.operators import codecs

    n_bits = windows
    assert n_bits % 8 == 0, windows

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hexes, bands_out = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                _, samples = codecs.decode_wav(bytes(p))
                a = np.abs(samples.ravel().astype(np.int64))
                n = len(a)
                e = np.zeros(windows, dtype=np.int64)
                if n:
                    np.add.at(e, (windows * np.arange(n)) // n, a)
                total = int(e.sum())
                bits = (windows * e >= total).astype(np.int64)
                bvals = [
                    int(sum(int(bits[8 * k + j]) << j for j in range(8)))
                    for k in range(n_bits // 8)
                ]
                ids.append(int(mid))
                hexes.append("".join(f"{v:02x}" for v in bvals))
                bands_out.append(bvals)
            yield pd.DataFrame(
                {"media_id": ids, "ahash": hexes, "bands": bands_out}
            )

    return media.select("media_id", "payload").mapInPandas(
        gen, schema=AHASH_SCHEMA
    )


def audio_neardup_pairs(
    media: DataFrame, max_hamming: int = 7, windows: int = 64
) -> DataFrame:
    """Audio near-dup pairs: :func:`audio_fingerprint` through the
    shared band-bucket + exact-Hamming verify (the dd11 scale shape —
    one decode pass, ids-only pair exchange, full recall for
    hamming <= windows/8 - 1)."""
    fp = audio_fingerprint(media, windows).localCheckpoint()
    return banded_hamming_pairs(fp, max_hamming)


def synthesize_video_df(docs: DataFrame) -> DataFrame:
    """Deterministic video per documents row — a dependency-free
    container of concatenated P6 PPM frames (decoded by
    ``codecs.decode_ppm_stream``): n = 3 + doc_id%4 frames at the m1
    image geometry (w = 4 + doc_id%5, h = 3 + doc_id%4), frame f's
    raster = the UTF-8 text bytes cycled, read from byte offset f — a
    one-byte temporal pan, so near-dup texts yield near-dup frame
    sequences. Every byte is a pure function of the row —
    engine-reconstructible, hash-oracle-able (dd13)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, source, text in zip(
                pdf["doc_id"], pdf["source"], pdf["text"]
            ):
                doc_id = int(doc_id)
                raw = (text or "").encode("utf-8") or b"\x00"
                w, h = 4 + doc_id % 5, 3 + doc_id % 4
                n_frames = 3 + doc_id % 4
                need = w * h * 3
                payload = b""
                for f in range(n_frames):
                    body = (raw * ((need + f) // len(raw) + 1))[f : f + need]
                    payload += b"P6\n%d %d\n255\n" % (w, h) + body
                rows.append(
                    {
                        "media_id": doc_id,
                        "path": f"media/{source}/doc_{doc_id}.ppms",
                        "media_type": "video",
                        "payload": payload,
                        "meta": {
                            "width": w,
                            "height": h,
                            "duration_ms": n_frames * 40,  # 25 fps
                            "codec": "ppmseq",
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return docs.select("doc_id", "source", "text").mapInPandas(
        gen, schema=MEDIA_SCHEMA
    )


def video_fingerprint(media: DataFrame, grid: int = 8) -> DataFrame:
    """Perceptual video fingerprint over genuinely DECODED frame
    sequences: integer-sum the frames pixel-wise (the temporal-mean
    image, division-free — frames share one geometry per clip, enforced
    loudly), then average-hash the summed luminance with the dd11 grid
    rule (bit = grid² · cell ≥ Σ cells). All BIGINT math, so the hash
    is engine-reconstructible; same output contract as ``ahash_media``
    (the :func:`banded_hamming_pairs` fingerprint schema). One decode
    pass, ~40 bytes out per clip, payloads never shuffle."""
    from tw_etl_spark.operators import codecs

    n_bits = grid * grid
    assert n_bits % 8 == 0, grid

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hexes, bands_out = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                frames = codecs.decode_ppm_stream(bytes(p))
                if len({f.shape for f in frames}) != 1:
                    raise ValueError(
                        f"video {mid}: mixed frame geometries "
                        f"{sorted({f.shape for f in frames})}"
                    )
                summed = np.zeros(frames[0].shape[:2], dtype=np.int64)
                for fr in frames:
                    summed += fr.astype(np.int64).sum(axis=2)
                h, w = summed.shape
                rows_ = (np.arange(grid) * h) // grid
                cols = (np.arange(grid) * w) // grid
                cells = summed[rows_][:, cols].ravel()
                total = int(cells.sum())
                bits = (n_bits * cells >= total).astype(np.int64)
                bvals = [
                    int(sum(int(bits[8 * k + j]) << j for j in range(8)))
                    for k in range(n_bits // 8)
                ]
                ids.append(int(mid))
                hexes.append("".join(f"{v:02x}" for v in bvals))
                bands_out.append(bvals)
            yield pd.DataFrame(
                {"media_id": ids, "ahash": hexes, "bands": bands_out}
            )

    return media.select("media_id", "payload").mapInPandas(
        gen, schema=AHASH_SCHEMA
    )


def video_neardup_pairs(
    media: DataFrame, max_hamming: int = 7, grid: int = 8
) -> DataFrame:
    """Video near-dup pairs: :func:`video_fingerprint` through the
    shared band-bucket + exact-Hamming verify (the dd11/dd12 scale
    shape — one decode pass, ids-only pair exchange)."""
    fp = video_fingerprint(media, grid).localCheckpoint()
    return banded_hamming_pairs(fp, max_hamming)
