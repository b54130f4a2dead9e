"""Tar-shard ingestion (WebDataset layout) for multimodal corpora.

The de-facto packaging for 100 TB-scale multimodal training data is
the WebDataset convention (public: github.com/webdataset/webdataset):
samples live in plain ``.tar`` shards, one file per modality, grouped
by basename — ``000123.jpg`` + ``000123.json`` + ``000123.txt`` form
one sample. It is the shard-file analog of the reference's sidecar
triple (convert.sh:53-65: media file ↔ ``.json`` ↔
``_packets.json.gz`` keyed by path).

Scale shape: shards list through Spark's ``binaryFile`` source and
untar INSIDE ``mapInPandas`` — partition-parallel across shards, the
payload bytes never leave the map stage until the caller asks for a
shuffle. Sample grouping is one hash shuffle on (shard, key), which is
the minimum possible: members of a sample can sit anywhere in the tar.
Reading a tar requires scanning it sequentially (tar has no index), so
the unit of parallelism is the shard — exactly why the convention
keeps shards at ~100 MB-1 GB.
"""

from __future__ import annotations

import io
import os
import tarfile
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEMBER_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.StringType()),
        T.StructField("member", T.StringType()),
        T.StructField("key", T.StringType()),
        T.StructField("ext", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def _split_key(name: str) -> tuple[str, str]:
    """WebDataset key rule: basename up to the FIRST dot is the sample
    key; everything after it is the (possibly dotted) extension."""
    base = os.path.basename(name)
    if "." in base:
        key, ext = base.split(".", 1)
    else:
        key, ext = base, ""
    return key, ext


CORRUPT_EXT = "_corrupt_shard"


def read_tar_shards(spark, path: str, mode: str = "failfast") -> DataFrame:
    """One row per tar member across every shard under ``path``:
    (shard, member, key, ext, payload, n_bytes).

    ``mode="failfast"`` (default) raises on an unreadable shard, naming
    it. ``mode="permissive"`` instead emits ONE marker row per corrupt
    shard (ext = ``CORRUPT_EXT``, null member/key/payload) and keeps
    going — at 100 TB a single truncated shard must not kill the job,
    but it must stay countable: filter on the marker ext to quarantine
    or alert (the posture of Spark's own PERMISSIVE JSON mode)."""
    import pandas as pd

    if mode not in ("failfast", "permissive"):
        raise ValueError(f"mode must be failfast|permissive, got {mode!r}")
    files = spark.read.format("binaryFile").load(path)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for shard_path, content in zip(pdf["path"], pdf["content"]):
                try:
                    with tarfile.open(fileobj=io.BytesIO(bytes(content))) as tf:
                        for m in tf:
                            if not m.isfile():
                                continue
                            payload = tf.extractfile(m).read()
                            key, ext = _split_key(m.name)
                            rows.append(
                                {
                                    "shard": shard_path,
                                    "member": m.name,
                                    "key": key,
                                    "ext": ext,
                                    "payload": payload,
                                    "n_bytes": len(payload),
                                }
                            )
                except (tarfile.TarError, EOFError, OSError) as exc:
                    if mode == "failfast":
                        raise ValueError(
                            f"corrupt tar shard {shard_path}: {exc}"
                        ) from exc
                    rows.append(
                        {
                            "shard": shard_path,
                            "member": None,
                            "key": None,
                            "ext": CORRUPT_EXT,
                            "payload": None,
                            "n_bytes": 0,
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in MEMBER_SCHEMA.fields])

    return files.select("path", "content").mapInPandas(gen, schema=MEMBER_SCHEMA)


def group_samples(members: DataFrame) -> DataFrame:
    """Member rows → one row per sample: (shard, key, parts) where
    ``parts`` maps extension → payload. One hash shuffle on
    (shard, key). A sample carrying the SAME extension twice is
    malformed under the WebDataset convention; Spark's default
    duplicate-map-key policy (EXCEPTION) makes that fail loudly here
    rather than silently picking a winner."""
    return (
        members.groupBy("shard", "key")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("ext"), F.col("payload")))
            ).alias("parts"),
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.sum("n_bytes").cast("bigint").alias("n_bytes"),
        )
    )


def write_tar_shards(
    members: DataFrame,
    out_dir: str,
    n_shards: int,
    key_col: str = "key",
    member_col: str = "member",
    payload_col: str = "payload",
) -> None:
    """Write member rows into ``n_shards`` tar shards ON EXECUTORS —
    the resharding half of the WebDataset contract. Samples stay whole:
    members hash-partition on ``key_col``, so every member of a sample
    lands in the same shard. One shard per partition, members sorted
    by name inside each shard (deterministic bytes given deterministic
    partitioning). The driver never sees a payload.

    CONTRACT: ``out_dir`` must be a filesystem path visible to every
    executor AND to whoever reads the shards back — shared storage on a
    real cluster (NFS/Lustre/fuse-mounted object store; WebDataset
    shards are plain files by design), any local dir in local mode.
    Executors open the path with plain ``tarfile``, so an
    executor-local ``/tmp`` on a multi-node cluster would scatter
    shards across worker disks where a driver-side read misses them —
    callers should verify the expected shard count after writing (io3
    does)."""
    rows = members.select(
        F.col(key_col).alias("_k"),
        F.col(member_col).alias("_m"),
        F.col(payload_col).alias("_p"),
    ).repartition(n_shards, F.pmod(F.xxhash64("_k"), F.lit(n_shards)))

    def write_part(it) -> None:
        from pyspark import TaskContext

        pairs = [(r["_m"], bytes(r["_p"])) for r in it]
        if not pairs:
            return
        pid = TaskContext.get().partitionId()
        write_tar_shard(sorted(pairs), os.path.join(out_dir, f"shard-{pid:04d}.tar"))

    rows.foreachPartition(write_part)


def write_tar_shard(rows: list[tuple[str, bytes]], out_path: str) -> None:
    """Fixture/test utility: write (member_name, payload) pairs into one
    tar shard, deterministic member order and zeroed mtimes."""
    with tarfile.open(out_path, "w") as tf:
        for name, payload in rows:
            info = tarfile.TarInfo(name=name)
            info.size = len(payload)
            info.mtime = 0
            tf.addfile(info, io.BytesIO(payload))
SHARD_MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("batch_id", T.LongType()),
        T.StructField("shard_id", T.IntegerType()),
        T.StructField("n_members", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("members_fp", T.LongType()),
    ]
)


def write_shard_payloads(
    members: DataFrame,
    out_root: str,
    n_shards: int,
    batch_id: int,
    key_col: str = "key",
    member_col: str = "member",
    payload_col: str = "payload",
) -> None:
    """OBJECT-STORE-SAFE shard write (VERDICT r13 #4) — the 100 TB
    route :func:`write_tar_shards` cannot take: that writer opens tar
    files with plain POSIX ``tarfile`` on executors and the tarshard
    connector's exactly-once commit needs hard links, so both are
    loudly POSIX-only (``sources/pyds._require_posix_root``), while a
    real multimodal corpus lives on S3/GCS. This writer keeps the
    WebDataset CONTRACT — samples stay whole (members hash-assign to
    shards by ``key_col``, so every member of a sample lands in the
    same shard) — but stores shard contents as PARQUET through the
    Hadoop FileSystem layer, which works on any URI-shaped root
    (s3a://, gs://, file:/, hdfs://):

        out_root/payloads/batch_id=N/shard_id=K/  one row per member
        out_root/manifest/batch_id=N/             one row per shard

    Exactly-once on an object store WITHOUT a rename-based or
    hard-link commit: shard assignment is a deterministic pure
    function of the key (pmod(xxhash64(key), n_shards)), the manifest
    is a deterministic aggregate of the payload rows, and BOTH writes
    are dynamic partition OVERWRITES keyed by ``batch_id`` — a crashed
    or replayed batch rewrites exactly its own partitions to identical
    bytes and can never touch another batch's (the st11/ivf_append
    idempotency pattern; crash-replay unit-pinned). The manifest's
    ``members_fp`` is an ORDER-INDEPENDENT integer fold (sum of md5
    prefixes over member name + payload md5), so an audit re-derives
    it from the payload rows and compares exactly
    (:func:`audit_shard_manifest`), replacing the POSIX writer's
    count-the-files verification.
    """
    fp = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("member"), F.md5(F.col("payload")))),
                1,
                12,
            ),
            16,
            10,
        )
        .cast("long")
    )
    rows = members.select(
        F.lit(int(batch_id)).cast("long").alias("batch_id"),
        F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_shards))
        .cast("int")
        .alias("shard_id"),
        F.col(member_col).alias("member"),
        F.col(key_col).alias("key"),
        F.col(payload_col).alias("payload"),
        F.length(F.col(payload_col)).cast("long").alias("n_bytes"),
    )
    (
        rows.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id", "shard_id")
        .parquet(os.path.join(out_root, "payloads"))
    )
    manifest = rows.groupBy("batch_id", "shard_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.sum("n_bytes").cast("long").alias("n_bytes"),
        F.sum(fp).cast("long").alias("members_fp"),
    )
    (
        manifest.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(os.path.join(out_root, "manifest"))
    )


def read_shard_payloads(
    spark, out_root: str, batch_id: int | None = None
) -> DataFrame:
    """Read back an object-store shard root written by
    :func:`write_shard_payloads`: (batch_id, shard_id, member, key,
    payload, n_bytes) — partition pruning applies when ``batch_id``
    is given (one day's shards read without listing history)."""
    df = spark.read.parquet(os.path.join(out_root, "payloads"))
    if batch_id is not None:
        df = df.filter(F.col("batch_id") == int(batch_id))
    return df.select(
        "batch_id", "shard_id", "member", "key", "payload", "n_bytes"
    )


def audit_shard_manifest(spark, out_root: str) -> DataFrame:
    """Write-audit for the object-store shard layout (the R13 audit
    posture): re-derive every shard's (n_members, n_bytes, members_fp)
    from the payload rows and anti-join against the stored manifest.
    Returns the mismatching shards — empty means every shard's stored
    manifest exactly matches its payload partition (a torn write, a
    lost partition, or a non-deterministic replay all surface here)."""
    fp = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("member"), F.md5(F.col("payload")))),
                1,
                12,
            ),
            16,
            10,
        )
        .cast("long")
    )
    derived = (
        spark.read.parquet(os.path.join(out_root, "payloads"))
        .groupBy("batch_id", "shard_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.sum(F.length("payload")).cast("long").alias("n_bytes"),
            F.sum(fp).cast("long").alias("members_fp"),
        )
    )
    stored = spark.read.parquet(os.path.join(out_root, "manifest")).select(
        "batch_id", "shard_id", "n_members", "n_bytes", "members_fp"
    )
    cols = ["batch_id", "shard_id", "n_members", "n_bytes", "members_fp"]
    return derived.select(cols).exceptAll(stored.select(cols)).unionByName(
        stored.select(cols).exceptAll(derived.select(cols))
    )
