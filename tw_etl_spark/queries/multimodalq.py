"""Driver-scored multimodal query: the binary-payload decode tier under
the cross-engine hash oracle.

The reference's richest data-model feature is the sidecar triple — a
media file plus two JSON metadata sidecars keyed by path
(convert.sh:53-65: .mkv ↔ .json ↔ _packets.json.gz), produced by
ffprobe-ing the bytes. m1 reproduces that shape end to end with real
byte-level codecs: synthesize PPM/WAV payloads whose every byte is a
pure function of the ``documents`` row, ffprobe-analog them
(operators/codecs.probe via mapInPandas), nearest-neighbor-resize the
images (decode → resize → re-encode), and emit md5 fingerprints of the
original and transformed bytes plus the probed metadata.

The DuckDB oracle rebuilds the IDENTICAL bytes in hex-string space —
PPM header + text bytes cycled to w*h*3, RIFF/WAVE header with
little-endian chunk sizes + text bytes cycled to 2n — and replays the
resize as pure index arithmetic (out pixel (y,x) reads src pixel
(y*h//5, x*w//6), 6 hex chars per RGB pixel). A hash match therefore
pins the codec encode/decode/resize byte-for-byte across engines, not
just the plumbing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tw_etl_spark.catalog import read_table as _t
from tw_etl_spark.queries import register

# Byte-swap an 8-hex-digit (u32) big-endian string to little-endian.
_LE32 = (
    "substr({h}, 7, 2) || substr({h}, 5, 2) || substr({h}, 3, 2) || substr({h}, 1, 2)"
)


def _le32(expr: str) -> str:
    h = f"upper(lpad(to_hex({expr}), 8, '0'))"
    return _LE32.format(h=h)


_M1_ORACLE = f"""
WITH base AS (
    SELECT doc_id,
           doc_id % 2 = 0            AS is_img,
           4 + doc_id % 5            AS w,
           3 + doc_id % 4            AS h,
           100 + doc_id % 50         AS n,
           -- mirror the Spark synthesizer's empty/NULL-text fallback
           -- (multimodal.py: raw = text.encode() or b'\\x00'): one 0x00 byte
           coalesce(nullif(hex(encode(coalesce(text, ''))), ''), '00') AS th,
           greatest(octet_length(encode(coalesce(text, ''))), 1)       AS tlen
    FROM documents
), built AS (
    SELECT *,
           CASE WHEN is_img THEN 3 * w * h ELSE 2 * n END AS need,
           -- text bytes cycled to `need` (hex space: 2 chars per byte)
           substr(
               repeat(th, CAST(CASE WHEN is_img THEN 3 * w * h ELSE 2 * n END
                               // tlen + 1 AS INT)),
               1, 2 * CASE WHEN is_img THEN 3 * w * h ELSE 2 * n END
           ) AS body_hex,
           CASE WHEN is_img THEN
               hex(encode('P6' || chr(10) || CAST(w AS VARCHAR) || ' '
                          || CAST(h AS VARCHAR) || chr(10) || '255' || chr(10)))
           ELSE
               '52494646' || {_le32('36 + 2 * n')} || '57415645'
               || '666D7420' || '10000000'
               || '0100' || '0100' || '401F0000' || '803E0000' || '0200' || '1000'
               || '64617461' || {_le32('2 * n')}
           END AS head_hex
    FROM base
), resized AS (
    -- nearest-neighbor 6x5: out (y,x) reads src (y*h//5, x*w//6);
    -- one RGB pixel = 3 raster bytes = 6 hex chars.
    SELECT b.doc_id,
           hex(encode('P6' || chr(10) || '6 5' || chr(10) || '255' || chr(10)))
           || string_agg(
                  substr(b.body_hex,
                         6 * (((gy.y * b.h) // 5) * b.w + (gx.x * b.w) // 6) + 1,
                         6),
                  '' ORDER BY gy.y, gx.x
              ) AS resized_hex
    FROM built b,
         generate_series(0, 4) AS gy(y),
         generate_series(0, 5) AS gx(x)
    WHERE b.is_img
    GROUP BY b.doc_id
)
SELECT b.doc_id                                            AS media_id,
       CASE WHEN b.is_img THEN 'ppm' ELSE 'wav' END        AS codec,
       CAST(CASE WHEN b.is_img THEN b.w END AS BIGINT)     AS width,
       CAST(CASE WHEN b.is_img THEN b.h END AS BIGINT)     AS height,
       CAST(CASE WHEN b.is_img THEN NULL ELSE 8000 END AS BIGINT) AS sample_rate,
       CAST(CASE WHEN b.is_img THEN NULL
                 ELSE (b.n * 1000) // 8000 END AS BIGINT)  AS duration_ms,
       md5(b.head_hex || b.body_hex)                       AS payload_md5,
       md5(coalesce(r.resized_hex, b.head_hex || b.body_hex)) AS resized_md5
FROM built b
LEFT JOIN resized r ON r.doc_id = b.doc_id
ORDER BY media_id
"""


@register(
    "m1_media_sidecar_probe",
    oracle=_M1_ORACLE,
    doc="Multimodal decode tier under the hash oracle: deterministic "
    "PPM/WAV payloads synthesized per documents row (bytes = pure "
    "function of doc_id + text), ffprobe-analog byte probe "
    "(codec/width/height/sample_rate/duration), real decode -> 6x5 "
    "nearest-neighbor resize -> re-encode for images, md5 fingerprints "
    "of original and resized bytes. The oracle reconstructs the exact "
    "bytes in hex-string space and replays the resize as index "
    "arithmetic, so a hash match pins every codec byte cross-engine. "
    "Reference: the media ↔ .json ↔ _packets.json.gz sidecar triple "
    "and its ffprobe fields (convert.sh:53-65).",
    tags=("multimodal", "codec", "ext"),
)
def m1(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tw_etl_spark.operators.multimodal import (
        probe_media,
        resize_images,
        synthesize_sidecar_media_df,
    )

    docs = _t(spark, sf_dir, "documents")
    media = synthesize_sidecar_media_df(docs)
    probed = probe_media(media).select(
        "media_id",
        "codec",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        F.col("sample_rate").cast("long").alias("sample_rate"),
        F.col("duration_ms").cast("long").alias("duration_ms"),
    )
    fp = media.select("media_id", F.md5(F.hex("payload")).alias("payload_md5"))
    rs = resize_images(media, 6, 5, decoder="real").select(
        "media_id", F.md5(F.hex("payload")).alias("resized_md5")
    )
    return (
        probed.join(fp, "media_id")
        .join(rs, "media_id")
        .orderBy("media_id")
    )


def _dd11_oracle(max_hamming: int = 7) -> str:
    """Parameterized so the dedup fuzz grammar (testing/dedupgen.py
    'phash' kind) can draw thresholds; dd11 registers the default."""
    return f"""
WITH base AS (
    SELECT doc_id,
           4 + doc_id % 5 AS w,
           3 + doc_id % 4 AS h,
           coalesce(nullif(hex(encode(coalesce(text, ''))), ''), '00') AS th,
           greatest(octet_length(encode(coalesce(text, ''))), 1)       AS tlen
    FROM documents
), built AS (
    SELECT doc_id, w, h,
           substr(repeat(th, CAST(3 * w * h // tlen + 1 AS INT)),
                  1, 6 * w * h) AS body_hex
    FROM base
), cells AS (
    -- grid cell (y, x) samples source pixel (y*h//8, x*w//8); one RGB
    -- pixel = 6 hex chars; g = r + g + b (integer luminance 0..765)
    SELECT b.doc_id,
           gy.y * 8 + gx.x AS i,
           (('0x' || substr(b.body_hex,
                 6 * (((gy.y * b.h) // 8) * b.w + (gx.x * b.w) // 8) + 1,
                 2))::BIGINT
          + ('0x' || substr(b.body_hex,
                 6 * (((gy.y * b.h) // 8) * b.w + (gx.x * b.w) // 8) + 3,
                 2))::BIGINT
          + ('0x' || substr(b.body_hex,
                 6 * (((gy.y * b.h) // 8) * b.w + (gx.x * b.w) // 8) + 5,
                 2))::BIGINT) AS g
    FROM built b, generate_series(0, 7) AS gy(y), generate_series(0, 7) AS gx(x)
), tot AS (
    SELECT doc_id, sum(g)::BIGINT AS total FROM cells GROUP BY doc_id
), bits AS (
    SELECT c.doc_id, c.i,
           CASE WHEN 64 * c.g >= t.total THEN 1 ELSE 0 END AS bit
    FROM cells c JOIN tot t USING (doc_id)
), bands AS (
    SELECT doc_id, i // 8 AS band,
           sum(bit * (1 << (i % 8)))::BIGINT AS v
    FROM bits GROUP BY doc_id, i // 8
), pairs AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bands a
    JOIN bands b ON a.band = b.band AND a.v = b.v AND a.doc_id < b.doc_id
), ham AS (
    SELECT p.id_a, p.id_b,
           sum(bit_count(xor(x.v, y.v)))::BIGINT AS hamming
    FROM pairs p
    JOIN bands x ON x.doc_id = p.id_a
    JOIN bands y ON y.doc_id = p.id_b AND y.band = x.band
    GROUP BY p.id_a, p.id_b
)
SELECT id_a, id_b, hamming
FROM ham WHERE hamming <= {max_hamming}
ORDER BY id_a, id_b
"""


@register(
    "dd11_perceptual_image_neardup",
    oracle=_dd11_oracle(7),
    doc="Multimodal near-dup dedup (VERDICT r9 #4): perceptual "
    "average-hash over genuinely DECODED image payloads — deterministic "
    "PPM per documents row (the m1 byte construction for every doc, so "
    "near-dup texts plant near-dup images), 8x8 integer-luminance grid "
    "via nearest-neighbor index arithmetic, bit = cell >= mean "
    "(division-free), 8 bands x 8 bits, band-bucket candidate join "
    "(full recall for hamming <= 7 by pigeonhole), exact Hamming "
    "verify via bit_count(xor) folds. The oracle rebuilds the bytes in "
    "hex-string space and replays the whole hash pipeline, so a match "
    "pins decode + downsample + threshold + banding + verify "
    "cross-engine. Scale: one decode pass emits ~40 bytes/image; the "
    "pair exchange carries ids only.",
    tags=("multimodal", "dedup", "neardup", "ext"),
)
def dd11(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tw_etl_spark.operators.multimodal import (
        perceptual_neardup_pairs,
        synthesize_image_df,
    )

    docs = _t(spark, sf_dir, "documents")
    media = synthesize_image_df(docs)
    return (
        perceptual_neardup_pairs(media, max_hamming=7)
        .select("id_a", "id_b", "hamming")
        .orderBy("id_a", "id_b")
    )


_IO3_ORACLE = f"""
WITH base AS (
    SELECT doc_id,
           doc_id % 2 = 0            AS is_img,
           4 + doc_id % 5            AS w,
           3 + doc_id % 4            AS h,
           100 + doc_id % 50         AS n,
           -- mirror the Spark synthesizer's empty/NULL-text fallback
           -- (multimodal.py: raw = text.encode() or b'\\x00'): one 0x00 byte
           coalesce(nullif(hex(encode(coalesce(text, ''))), ''), '00') AS th,
           greatest(octet_length(encode(coalesce(text, ''))), 1)       AS tlen
    FROM documents
), built AS (
    SELECT *,
           substr(
               repeat(th, CAST(CASE WHEN is_img THEN 3 * w * h ELSE 2 * n END
                               // tlen + 1 AS INT)),
               1, 2 * CASE WHEN is_img THEN 3 * w * h ELSE 2 * n END
           ) AS body_hex,
           CASE WHEN is_img THEN
               hex(encode('P6' || chr(10) || CAST(w AS VARCHAR) || ' '
                          || CAST(h AS VARCHAR) || chr(10) || '255' || chr(10)))
           ELSE
               '52494646' || {_le32('36 + 2 * n')} || '57415645'
               || '666D7420' || '10000000'
               || '0100' || '0100' || '401F0000' || '803E0000' || '0200' || '1000'
               || '64617461' || {_le32('2 * n')}
           END AS head_hex,
           CASE WHEN is_img THEN 'ppm' ELSE 'wav' END AS codec
    FROM base
)
SELECT doc_id                                  AS media_id,
       codec,
       CAST(2 AS BIGINT)                       AS n_parts,
       md5(head_hex || body_hex)               AS payload_md5,
       md5(hex(encode('{{"media_id": ' || CAST(doc_id AS VARCHAR)
                      || ', "codec": "' || codec || '"}}'))) AS sidecar_md5
FROM built
ORDER BY media_id
"""


@register(
    "io3_tar_shard_roundtrip",
    oracle=_IO3_ORACLE,
    doc="WebDataset tar-shard ingest surface, driver-scored end to end: "
    "deterministic PPM/WAV payloads (the m1 byte construction) plus a "
    "deterministic JSON sidecar per sample are written into 4 tar "
    "shards ON EXECUTORS (foreachPartition, one shard per hash "
    "partition of media_id), read back through sources/shards."
    "read_tar_shards (binaryFile -> untar in mapInPandas), grouped "
    "into samples on (shard, key), and fingerprinted. A hash match "
    "proves the tar write/read/group path preserved every byte of "
    "every member. Reference: the file <-> .json sidecar pairing, "
    "convert.sh:53-65, at shard-file granularity.",
    tags=("io", "multimodal", "shards", "ext"),
)
def _io3_registered(spark: SparkSession, sf_dir: str) -> DataFrame:
    return io3(spark, sf_dir)


def _write_sidecar_shards(spark: SparkSession, sf_dir: str, name: str) -> str:
    """Shared write half of io3/io4: synthesize the sidecar media
    table, pack (payload + JSON sidecar) members into 4 tar shards on
    executors, return the shard root."""
    import hashlib
    import os
    import shutil
    import tempfile

    from tw_etl_spark.operators.multimodal import synthesize_sidecar_media_df
    from tw_etl_spark.sources.shards import write_tar_shards

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    # Shard root must satisfy write_tar_shards' shared-filesystem
    # contract (visible to executors and the read-back). Local mode:
    # the local tempdir qualifies. Cluster: point TW_ETL_SCRATCH_DIR at
    # shared storage; the post-write count below fails loudly if the
    # shards didn't land where the reader looks.
    scratch = os.environ.get("TW_ETL_SCRATCH_DIR") or tempfile.gettempdir()
    root = os.path.join(scratch, f"tw_etl_spark_{name}_{tag}")
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)

    docs = _t(spark, sf_dir, "documents")
    media = synthesize_sidecar_media_df(docs).select(
        "media_id", F.col("meta.codec").alias("codec"), "payload"
    )
    key = F.lpad(F.col("media_id").cast("string"), 8, "0")
    sidecar = F.concat(
        F.lit('{"media_id": '),
        F.col("media_id").cast("string"),
        F.lit(', "codec": "'),
        F.col("codec"),
        F.lit('"}'),
    ).cast("binary")
    members = media.select(
        key.alias("key"),
        F.concat(key, F.lit("."), F.col("codec")).alias("member"),
        F.col("payload"),
    ).unionByName(
        media.select(
            key.alias("key"),
            F.concat(key, F.lit(".json")).alias("member"),
            sidecar.alias("payload"),
        )
    )
    write_tar_shards(members, root, n_shards=4)
    n_found = len([f for f in os.listdir(root) if f.endswith(".tar")])
    if n_found == 0:
        raise RuntimeError(
            f"no tar shards visible under {root!r} after write_tar_shards: "
            "the shard root must be shared storage visible to executors "
            "and the reader (set TW_ETL_SCRATCH_DIR on a cluster — "
            "executor-local /tmp scatters shards across worker disks)"
        )

    return root


def _fingerprint_samples(samples: DataFrame) -> DataFrame:
    """Shared fingerprint half of io3/io4 over grouped sample rows."""
    media_ext = F.filter(F.map_keys("parts"), lambda x: x != "json")[0]
    return samples.select(
        F.col("key").cast("long").alias("media_id"),
        media_ext.alias("codec"),
        "n_parts",
        F.md5(F.hex(F.element_at("parts", media_ext))).alias("payload_md5"),
        F.md5(F.hex(F.element_at("parts", F.lit("json")))).alias("sidecar_md5"),
    ).orderBy("media_id")


def io3(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tw_etl_spark.sources.shards import group_samples, read_tar_shards

    root = _write_sidecar_shards(spark, sf_dir, "io3")
    return _fingerprint_samples(group_samples(read_tar_shards(spark, root)))


def _dd12_oracle(max_hamming: int = 7) -> str:
    """Parameterized for the dedup fuzz grammar ('afp' kind); dd12
    registers the default. Replays WAV synthesis (n = 100 + doc_id%50
    little-endian int16 samples from cycled text bytes), the L1 energy
    profile over 64 floor-partition windows, the louder-than-mean bit
    rule, banding, and the Hamming verify — all in hex-string/BIGINT
    space."""
    return f"""
WITH base AS (
    SELECT doc_id,
           100 + doc_id % 50 AS n,
           coalesce(nullif(hex(encode(coalesce(text, ''))), ''), '00') AS th,
           greatest(octet_length(encode(coalesce(text, ''))), 1)       AS tlen
    FROM documents
), built AS (
    SELECT doc_id, n,
           substr(repeat(th, CAST(2 * n // tlen + 1 AS INT)),
                  1, 4 * n) AS data_hex
    FROM base
), samp AS (
    -- sample i = little-endian int16 at hex chars [4i+1, 4i+4]
    SELECT b.doc_id, b.n, s.i,
           ('0x' || substr(b.data_hex, 4 * s.i + 1, 2))::BIGINT
         + 256 * ('0x' || substr(b.data_hex, 4 * s.i + 3, 2))::BIGINT AS uval
    FROM built b, generate_series(0, 148) AS s(i)
    WHERE s.i < b.n
), en AS (
    -- window w = (64*i) // n; L1 energy = sum |signed sample|
    SELECT doc_id, (64 * i) // n AS w,
           sum(abs(CASE WHEN uval >= 32768 THEN uval - 65536
                        ELSE uval END))::BIGINT AS e
    FROM samp GROUP BY doc_id, (64 * i) // n
), tot AS (
    SELECT doc_id, sum(e)::BIGINT AS total FROM en GROUP BY doc_id
), bits AS (
    SELECT en.doc_id, en.w,
           CASE WHEN 64 * en.e >= t.total THEN 1 ELSE 0 END AS bit
    FROM en JOIN tot t USING (doc_id)
), bands AS (
    SELECT doc_id, w // 8 AS band,
           sum(bit * (1 << (w % 8)))::BIGINT AS v
    FROM bits GROUP BY doc_id, w // 8
), pairs AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bands a
    JOIN bands b ON a.band = b.band AND a.v = b.v AND a.doc_id < b.doc_id
), ham AS (
    SELECT p.id_a, p.id_b,
           sum(bit_count(xor(x.v, y.v)))::BIGINT AS hamming
    FROM pairs p
    JOIN bands x ON x.doc_id = p.id_a
    JOIN bands y ON y.doc_id = p.id_b AND y.band = x.band
    GROUP BY p.id_a, p.id_b
)
SELECT id_a, id_b, hamming
FROM ham WHERE hamming <= {max_hamming}
ORDER BY id_a, id_b
"""


@register(
    "dd12_audio_fingerprint_neardup",
    oracle=_dd12_oracle(7),
    doc="Audio near-dup dedup — the multimodal dedup cell dd11 opened, "
    "closed for the audio modality: deterministic PCM16 WAV per "
    "documents row (the m1 sidecar byte construction for every doc, so "
    "near-dup texts plant near-dup waveforms), genuine RIFF decode, L1 "
    "energy profile over 64 floor-partition windows, bit = window "
    "louder than mean (division-free), 8 bands x 8 bits through the "
    "shared band-bucket + exact-Hamming verify (full recall for "
    "hamming <= 7 by pigeonhole). The oracle rebuilds the samples in "
    "hex-string space — signed int16 reconstruction included — and "
    "replays the whole fingerprint, pinning decode + windowing + "
    "threshold + banding cross-engine. Scale: one decode pass emits "
    "~40 bytes/clip; the pair exchange carries ids only.",
    tags=("multimodal", "audio", "dedup", "neardup", "ext"),
)
def dd12(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tw_etl_spark.operators.multimodal import (
        audio_neardup_pairs,
        synthesize_audio_df,
    )

    docs = _t(spark, sf_dir, "documents")
    media = synthesize_audio_df(docs)
    return (
        audio_neardup_pairs(media, max_hamming=7)
        .select("id_a", "id_b", "hamming")
        .orderBy("id_a", "id_b")
    )


def _dd13_oracle(max_hamming: int = 7) -> str:
    """Parameterized for the dedup fuzz grammar ('vfp' kind); dd13
    registers the default. Replays the concatenated-PPM video synthesis
    (frame f's raster = text bytes cycled from offset f), the
    temporal-sum luminance grid, the dd11 bit rule, banding, and the
    Hamming verify — all in hex-string/BIGINT space."""
    off = (
        "2 * fr.f + 6 * (((gy.y * b.h) // 8) * b.w + (gx.x * b.w) // 8)"
    )
    return f"""
WITH base AS (
    SELECT doc_id,
           4 + doc_id % 5 AS w,
           3 + doc_id % 4 AS h,
           3 + doc_id % 4 AS nf,
           coalesce(nullif(hex(encode(coalesce(text, ''))), ''), '00') AS th,
           greatest(octet_length(encode(coalesce(text, ''))), 1)       AS tlen
    FROM documents
), built AS (
    SELECT doc_id, w, h, nf,
           repeat(th, CAST((3 * w * h + nf) // tlen + 1 AS INT)) AS big_hex
    FROM base
), cells AS (
    -- grid cell (y, x) samples source pixel (y*h//8, x*w//8) of every
    -- frame; frame f's byte j sits at hex offset 2*(f + j); the cell
    -- luminance SUMS r+g+b across frames (the temporal-mean image,
    -- division-free)
    SELECT b.doc_id,
           gy.y * 8 + gx.x AS i,
           sum(  ('0x' || substr(b.big_hex, {off} + 1, 2))::BIGINT
               + ('0x' || substr(b.big_hex, {off} + 3, 2))::BIGINT
               + ('0x' || substr(b.big_hex, {off} + 5, 2))::BIGINT
           )::BIGINT AS g
    FROM built b,
         generate_series(0, 7) AS gy(y),
         generate_series(0, 7) AS gx(x),
         generate_series(0, 6) AS fr(f)
    WHERE fr.f < b.nf
    GROUP BY b.doc_id, gy.y * 8 + gx.x
), tot AS (
    SELECT doc_id, sum(g)::BIGINT AS total FROM cells GROUP BY doc_id
), bits AS (
    SELECT c.doc_id, c.i,
           CASE WHEN 64 * c.g >= t.total THEN 1 ELSE 0 END AS bit
    FROM cells c JOIN tot t USING (doc_id)
), bands AS (
    SELECT doc_id, i // 8 AS band,
           sum(bit * (1 << (i % 8)))::BIGINT AS v
    FROM bits GROUP BY doc_id, i // 8
), pairs AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bands a
    JOIN bands b ON a.band = b.band AND a.v = b.v AND a.doc_id < b.doc_id
), ham AS (
    SELECT p.id_a, p.id_b,
           sum(bit_count(xor(x.v, y.v)))::BIGINT AS hamming
    FROM pairs p
    JOIN bands x ON x.doc_id = p.id_a
    JOIN bands y ON y.doc_id = p.id_b AND y.band = x.band
    GROUP BY p.id_a, p.id_b
)
SELECT id_a, id_b, hamming
FROM ham WHERE hamming <= {max_hamming}
ORDER BY id_a, id_b
"""


@register(
    "dd13_video_fingerprint_neardup",
    oracle=_dd13_oracle(7),
    doc="Video near-dup dedup — completes the modality triple beside "
    "dd11 (image) and dd12 (audio): deterministic concatenated-PPM "
    "video per documents row (frame f pans the text raster by one "
    "byte), genuine frame-stream decode (codecs.decode_ppm_stream), "
    "temporal-sum luminance grid (the division-free mean frame), the "
    "dd11 bit rule, and the shared band-bucket + exact-Hamming verify. "
    "The oracle rebuilds every frame's bytes in hex-string space and "
    "replays the whole pipeline. Scale: one decode pass emits ~40 "
    "bytes/clip regardless of frame count; the pair exchange carries "
    "ids only.",
    tags=("multimodal", "video", "dedup", "neardup", "ext"),
)
def dd13(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tw_etl_spark.operators.multimodal import (
        synthesize_video_df,
        video_neardup_pairs,
    )

    docs = _t(spark, sf_dir, "documents")
    media = synthesize_video_df(docs)
    return (
        video_neardup_pairs(media, max_hamming=7)
        .select("id_a", "id_b", "hamming")
        .orderBy("id_a", "id_b")
    )


@register(
    "io4_tarshard_datasource_roundtrip",
    oracle=_IO3_ORACLE,
    doc="The WebDataset shard surface as a FIRST-CLASS Spark 4 Python "
    "DataSource (sources/pyds.TarShardDataSource — "
    "spark.read.format('tarshard').load(root)): same executor-side "
    "shard write as io3, read back through the registered connector "
    "(one input partition PER SHARD — connector-level parallelism and "
    "locality, no single-task untar), grouped and fingerprinted "
    "identically. The oracle is io3's byte-reconstruction SQL "
    "verbatim, so a hash match proves the connector's "
    "partition/read/schema contract preserves every byte exactly like "
    "the mapInPandas tier it mirrors.",
    tags=("io", "multimodal", "shards", "datasource", "ext"),
)
def io4(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tw_etl_spark.sources.pyds import register_tarshard
    from tw_etl_spark.sources.shards import group_samples

    root = _write_sidecar_shards(spark, sf_dir, "io4")
    register_tarshard(spark)
    members = spark.read.format("tarshard").load(root)
    return _fingerprint_samples(group_samples(members))
