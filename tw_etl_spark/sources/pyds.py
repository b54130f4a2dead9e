"""Spark 4 Python DataSource connector for WebDataset tar shards [EXT].

``sources/shards.read_tar_shards`` reads shards through binaryFile +
mapInPandas; this module exposes the same rows as a FIRST-CLASS format
— ``spark.read.format("tarshard").load(root)`` — via the Spark 4
Python DataSource API (pyspark.sql.datasource; public API, SPARK-44076).
The connector contract is what matters at 100 TB:

- ``partitions()`` lists the shards on the driver and emits ONE input
  partition per shard file, so a 10k-shard corpus reads with 10k-way
  parallelism and per-shard locality — no single-task untar. Basenames
  starting with ``_`` or ``.`` are skipped (Spark's own hidden-file
  convention), which also excludes this writer's two-phase
  ``_tmp-shard-*`` temps — a failed or losing speculative attempt's
  orphan can never be silently ingested as data;
- ``read(partition)`` unpacks one shard on an executor in tarfile's
  SEQUENTIAL stream mode (``r|`` — no seeks, no whole-shard buffer):
  peak memory is one member, not one shard (unit-enforced with a
  tracemalloc budget in tests/test_sources.py);
- ``mode=permissive`` quarantines a corrupt shard as one marker row
  (ext = ``_corrupt_shard``) instead of killing the job — the
  read_tar_shards posture, enforced identically here.

Shard listing uses the local/shared filesystem (the write_tar_shards
contract); point the root at shared storage on a cluster. The listing
is one driver-side ``glob`` — fine for that contract, but an
object-store port at 100k+ shards should swap in a paginated listing
(the partitions() seam is the only change needed).
"""

from __future__ import annotations

import glob
import os
import re
import tarfile

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

from tw_etl_spark.sources.shards import CORRUPT_EXT, _split_key

TARSHARD_SCHEMA_DDL = (
    "shard string, member string, key string, ext string, "
    "payload binary, n_bytes bigint"
)

_URI_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*://|^[A-Za-z][A-Za-z0-9+.-]*:/")


def _require_posix_root(root: str, side: str) -> None:
    """Loud scheme guard (VERDICT r12 #1): this connector's listing
    (driver glob), extraction (executor open()) and two-phase commit
    (os.link exclusive-create) all require a POSIX path visible from
    driver AND executors — a mounted DFS is fine, an object store is
    not (S3 has no hard links, so the none-or-all commit contract
    cannot hold there). ``os.path`` on an ``s3a://`` root would not
    error; it would silently see nothing — the wrong-branch hazard
    this guard converts into an immediate, routable failure."""
    if _URI_RE.match(root):
        raise ValueError(
            f"tarshard {side}: root {root!r} is a URI — this connector "
            "requires a plain POSIX path visible on driver and "
            "executors (shared/DFS mount ok). Object stores are "
            "unsupported: the exclusive hard-link commit needs POSIX "
            "link semantics. For object-store roots use "
            "sources.shards.write_shard_payloads / read_shard_payloads "
            "(parquet shard layout, batch-keyed exactly-once), or read "
            "tar bytes via sources.shards.read_tar_shards over "
            "binaryFile for Hadoop-filesystem roots."
        )


class _ShardPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class TarShardReader(DataSourceReader):
    def __init__(self, options: dict):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("tarshard: .load(<shard root or glob>) required")
        _require_posix_root(self.root, "read")
        self.mode = options.get("mode", "failfast")
        if self.mode not in ("failfast", "permissive"):
            raise ValueError(
                f"tarshard: mode must be failfast|permissive, got {self.mode!r}"
            )

    def partitions(self):
        pattern = (
            self.root
            if any(ch in self.root for ch in "*?[")
            else os.path.join(self.root, "*.tar")
        )
        paths = sorted(
            p
            for p in glob.glob(pattern)
            # hidden-file convention: temps (_tmp-shard-*), markers, and
            # dotfiles are never data — a crashed/speculative writer
            # attempt's orphan must not be read back as a shard
            if not os.path.basename(p).startswith(("_", "."))
        )
        if not paths:
            raise ValueError(f"tarshard: no shards match {pattern!r}")
        return [_ShardPartition(p) for p in paths]

    def read(self, partition: _ShardPartition):
        path = partition.path
        try:
            # "r|" = sequential stream mode: members decode in file
            # order off the raw handle, no seeks, no whole-shard
            # buffer — executor memory is bounded by ONE member even
            # on a multi-GB WebDataset shard
            with open(path, "rb") as fh, tarfile.open(
                fileobj=fh, mode="r|"
            ) as tf:
                for m in tf:
                    if not m.isfile():
                        continue
                    payload = tf.extractfile(m).read()
                    key, ext = _split_key(m.name)
                    yield (path, m.name, key, ext, payload, len(payload))
        except (tarfile.TarError, EOFError, OSError) as exc:
            if self.mode == "failfast":
                raise ValueError(f"corrupt tar shard {path}: {exc}") from exc
            yield (path, None, None, CORRUPT_EXT, None, 0)


class TarShardDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "tarshard"

    def schema(self) -> str:
        return TARSHARD_SCHEMA_DDL

    def reader(self, schema) -> TarShardReader:
        return TarShardReader(self.options)

    def writer(self, schema, overwrite: bool) -> "TarShardWriter":
        if overwrite:
            raise ValueError(
                "tarshard: mode('overwrite') is not supported — shards "
                "are append-only artifacts; clear the root explicitly"
            )
        names = [f.name for f in schema.fields]
        if not {"member", "payload"} <= set(names):
            raise ValueError(
                f"tarshard write needs (member, payload) columns; got {names}"
            )
        return TarShardWriter(self.options)


def register_tarshard(spark) -> None:
    """Idempotent format registration:
    ``spark.read.format('tarshard')`` afterwards."""
    spark.dataSource.register(TarShardDataSource)


class _ShardCommit(WriterCommitMessage):
    def __init__(self, path: str, pid: int, n_members: int):
        self.path = path
        self.pid = pid
        self.n_members = n_members


class TarShardWriter(DataSourceWriter):
    """Write half of the connector: each Spark task packs its partition
    into one tar shard (members sorted by name, zeroed mtimes — the
    write_tar_shards determinism rule), writes it to a task-unique
    ``_tmp-shard-*`` temp name (hidden from the reader's listing, so an
    orphaned attempt is inert), and ``commit()`` on the driver links the
    temp shards into place EXCLUSIVELY — colliding with a shard from a
    previous write raises instead of clobbering (append-only contract).
    Rows must carry (member: string,
    payload: binary); partition the frame by sample key BEFORE writing
    so samples stay whole (the write_tar_shards contract — this writer
    packs what it is given and does not reshuffle)."""

    def __init__(self, options: dict):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("tarshard write: .save(<shard root>) required")
        _require_posix_root(self.root, "write")

    def write(self, iterator):
        import os
        import uuid

        from pyspark import TaskContext

        from tw_etl_spark.sources.shards import write_tar_shard

        pairs = []
        for row in iterator:
            pairs.append((row["member"], bytes(row["payload"])))
        pid = TaskContext.get().partitionId()
        if not pairs:
            return _ShardCommit("", pid, 0)
        os.makedirs(self.root, exist_ok=True)
        tmp = os.path.join(
            self.root, f"_tmp-shard-{pid:04d}-{uuid.uuid4().hex[:8]}.tar"
        )
        write_tar_shard(sorted(pairs), tmp)
        return _ShardCommit(tmp, pid, len(pairs))

    def commit(self, messages):
        """All-or-nothing publish of the task shards.

        Three passes so a collision can never leave a PARTIAL dataset
        visible in the root (a reader listing ``shard-*.tar`` must see
        either none or all of this write's shards):

        1. verify — every destination must be absent; raise BEFORE any
           link if one exists (append-only contract).
        2. link — exclusive-create every shard; if a racing writer
           landed a dest between passes, roll back the links made by
           THIS commit, then raise.
        3. clean — remove the temp names only after every link landed.
        """
        import os

        staged = [
            (
                m.path,
                os.path.join(
                    os.path.dirname(m.path), f"shard-{m.pid:04d}.tar"
                ),
            )
            for m in messages
            if m and m.path
        ]
        clash = [dest for _, dest in staged if os.path.exists(dest)]
        if clash:
            raise ValueError(
                f"tarshard commit: {clash[0]} already exists — shards "
                "are append-only artifacts; write to a fresh root "
                "or clear the old shards explicitly (no shard from "
                "this write was published)"
            )
        linked = []
        for tmp, dest in staged:
            try:
                # link() is the exclusive-create rename: it fails if
                # dest exists instead of silently clobbering a shard
                # from a previous write to the same root
                os.link(tmp, dest)
            except FileExistsError:
                for done in linked:  # roll back: none-or-all visible
                    os.remove(done)
                raise ValueError(
                    f"tarshard commit: {dest} appeared mid-commit "
                    "(concurrent writer to the same root); this "
                    "write's shards were rolled back"
                ) from None
            linked.append(dest)
        for tmp, _ in staged:
            os.remove(tmp)

    def abort(self, messages):
        import os

        for m in messages:
            if m and m.path and os.path.exists(m.path):
                os.remove(m.path)
