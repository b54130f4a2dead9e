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
