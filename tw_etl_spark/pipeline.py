"""ETL pipeline facade: the reference's acquire→transform→load shape
rebuilt on the engine (SURVEY.md §7 phase 6).

Stage map (reference → here):
- R14 config→catalog rows        manager.py:124-132   build_stream_catalog
- R15 union+cleanse streamlists  manager.py:134-158   cleanse_streamlists
- R16 per-key defaults           manager.py:29-33     apply_defaults
- R17 blocklist anti-join        manager.py:449-452   filter_blocklist
- R2  filename → columns         convert.sh:38-42     sources.readers.parse_recording_filename
- R7  per-stream param lookup    convert.sh:78-84     lookup_with_default
- R6  conditional branch         convert.sh:73,77     transcode_args
- R5  external binary per row    convert.sh:73-97     external_transform (mapInPandas + subprocess)
- R8  size-reduction metric      convert.sh:101-106   compression_metric
- R11 filename encryption        s3-sync.sh:27-37     encrypt_name / decrypt_name
- R12 tiered routing             s3-sync.sh:54-67     tiered_routing + partitioned sink
- R9  atomic multi-file commit   convert.sh:108-117   Spark FileOutputCommitter (free)
- R10 run-once lock              convert.sh:17-24     streaming trigger(availableNow) checkpoint (free)
"""

from __future__ import annotations

import subprocess
from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CATALOG_SCHEMA = T.StructType(
    [
        T.StructField("stream_id", T.StringType(), False),
        T.StructField("qid", T.StringType()),
        T.StructField("qlist", T.StringType()),
        T.StructField("retries", T.IntegerType()),
    ]
)


def build_stream_catalog(spark: SparkSession, config: dict) -> DataFrame:
    """R14: config mapping {format_group: {qid, qlist, retries, streams:[...]}}
    → one catalog row per member stream (the cross product the reference
    builds imperatively)."""
    rows = []
    for group in config.get("streams", {}).values():
        for sid in group.get("streams", []):
            rows.append(
                (
                    sid.lower(),
                    group.get("qid", "best"),
                    group.get("qlist", "best"),
                    int(group.get("retries", 3)),
                )
            )
    return spark.createDataFrame(rows, CATALOG_SCHEMA)


def cleanse_streamlists(lists: list[DataFrame], col: str = "stream_id") -> DataFrame:
    """R15: union N raw stream lists; strip '#' comment prefixes, trim,
    drop empties and duplicates."""
    out = lists[0]
    for df in lists[1:]:
        out = out.unionByName(df)
    cleaned = out.select(
        F.lower(F.trim(F.regexp_replace(F.col(col), r"^#", ""))).alias(col)
    )
    return cleaned.filter(F.col(col) != "").dropDuplicates([col])


def apply_defaults(df: DataFrame, defaults: dict[str, object]) -> DataFrame:
    """R16: fill missing per-key settings with configured defaults."""
    return df.withColumns(
        {c: F.coalesce(F.col(c), F.lit(v)) for c, v in defaults.items()}
    )


def filter_blocklist(df: DataFrame, blocklist: DataFrame, key: str) -> DataFrame:
    """R17: drop rows present in the blocklist (broadcast anti-join —
    blocklists are tiny)."""
    return df.join(F.broadcast(blocklist), key, "left_anti")


def lookup_with_default(
    df: DataFrame, dim: DataFrame, key: str, value_col: str, default
) -> DataFrame:
    """R7: per-key parameter lookup with fallback (broadcast left join +
    coalesce)."""
    joined = df.join(F.broadcast(dim), key, "left")
    return joined.withColumn(value_col, F.coalesce(F.col(value_col), F.lit(default)))


def transcode_args(quality: Column, fps: Column) -> Column:
    """R6: the audio/video conditional branch as an expression."""
    return F.when(
        quality == "audio_only", F.lit("-vn -c:a libopus -b:a 24k")
    ).otherwise(F.format_string("-c:v libx265 -r %s -vf scale=-2:720", fps))


def compression_metric(old_size: Column, new_size: Column) -> Column:
    """R8: size-reduction %% at scale 3 (convert.sh:101-106 bc scale=3)."""
    return F.round(100 * (1 - new_size / old_size), 3)


def encrypt_name(name: Column, key: str) -> Column:
    """R11: deterministic filename encryption → lowercase hex string.
    AES-ECB (deterministic, like the reference's fixed-key openssl enc)
    + hex — reversible via decrypt_name."""
    return F.lower(F.hex(F.aes_encrypt(name.cast("binary"), F.lit(key), F.lit("ECB"))))


def decrypt_name(hexname: Column, key: str) -> Column:
    return F.aes_decrypt(F.unhex(F.upper(hexname)), F.lit(key), F.lit("ECB")).cast(
        "string"
    )


STORAGE_CLASS_BY_SUFFIX = {  # s3-sync.sh:57-67
    "mkv": "DEEP_ARCHIVE",
    "json": "STANDARD_IA",
    "json.gz": "DEEP_ARCHIVE",
}


def tiered_routing(suffix: Column) -> Column:
    """R12: artifact-type → storage tier."""
    expr = F.lit("STANDARD")
    for sfx, cls in STORAGE_CLASS_BY_SUFFIX.items():
        expr = F.when(suffix == sfx, cls).otherwise(expr)
    return expr


S3A_STORAGE_CLASS_CONF = "fs.s3a.create.storage.class"


def tiered_sink_plan(base_uri: str, suffixes: list[str]) -> list[dict]:
    """R12's S3 deployment contract, made assertable (VERDICT r12 #7):
    the reference syncs each artifact suffix with its own
    ``--storage-class`` (s3-sync.sh:57-67) under the hashed key prefix
    ``tw/`` (s3-sync.sh:40-52). The Spark-side equivalent writes each
    suffix slice SEQUENTIALLY with ``fs.s3a.create.storage.class``
    pinned per write — S3A creates the objects directly in the tier,
    no lifecycle-transition lag — into ``<base>/tw/suffix=<sfx>/``.
    One plan entry per suffix: the destination path (scheme
    preserved, so an ``s3a://`` base stays an object-store write) and
    the exact Hadoop conf the writer must carry. The routing values
    are the same mapping :func:`tiered_routing` evaluates row-wise,
    asserted equal in tests/test_pipeline.py so the deploy plan can
    never drift from the query-tier routing column."""
    base = base_uri.rstrip("/")
    return [
        {
            "suffix": sfx,
            "storage_class": STORAGE_CLASS_BY_SUFFIX.get(sfx, "STANDARD"),
            "path": f"{base}/tw/suffix={sfx}",
            "hadoop_conf": {
                S3A_STORAGE_CLASS_CONF: STORAGE_CLASS_BY_SUFFIX.get(
                    sfx, "STANDARD"
                )
            },
        }
        for sfx in suffixes
    ]


TRANSFORM_SCHEMA_SUFFIX = [
    T.StructField("out_size", T.LongType()),
    T.StructField("tool_rc", T.IntegerType()),
]


def external_transform(
    df: DataFrame,
    payload_col: str,
    command: list[str],
) -> DataFrame:
    """R5: run an external binary over each row's payload, streaming
    Arrow batches through one subprocess call per row (the ffmpeg
    pattern; convert.sh:73-97). The binary is injected — tests use a stub
    exactly like the reference stubs streamlink
    (stream_manager/test/video-download.sh:6-22).

    Partition-parallel; each executor core runs its own subprocesses, so
    external-tool throughput scales with cores like the reference's
    one-process-per-download model (manager.py:339-345) scaled with
    asyncio tasks.
    """
    out_schema = T.StructType(df.schema.fields + TRANSFORM_SCHEMA_SUFFIX)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sizes, rcs = [], []
            for payload in pdf[payload_col]:
                data = (
                    bytes(payload)
                    if isinstance(payload, (bytes, bytearray))
                    else str(payload).encode()
                )
                proc = subprocess.run(
                    command, input=data, stdout=subprocess.PIPE, check=False
                )
                sizes.append(len(proc.stdout))
                rcs.append(proc.returncode)
            pdf = pdf.copy()
            pdf["out_size"] = pd.Series(sizes, index=pdf.index, dtype="int64")
            pdf["tool_rc"] = pd.Series(rcs, index=pdf.index, dtype="int32")
            yield pdf

    return df.mapInPandas(gen, schema=out_schema)
