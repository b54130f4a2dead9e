"""Object-store posture of the persisted-index artifact layer
(VERDICT r12 #1): existence probes must be scheme-aware (Hadoop
FileSystem API, not os.path), optional stream tables must read with
pinned schemas (an artifact dir holding only _temporary is a legal
crash state), and the POSIX-only tarshard commit must refuse URI roots
loudly instead of silently seeing nothing."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from tw_etl_spark.catalog import read_table
from tw_etl_spark.sources.fsutil import fs_exists, fs_scheme


def test_fs_exists_plain_and_file_uri(spark):
    d = tempfile.mkdtemp(prefix="fsutil_")
    try:
        assert fs_exists(spark, d)
        assert fs_exists(spark, "file:" + d)
        assert not fs_exists(spark, os.path.join(d, "nope"))
        assert not fs_exists(spark, "file:" + os.path.join(d, "nope"))
        # the os.path probe this replaces is scheme-blind: it reports
        # False for an EXISTING file: URI — the silent wrong-branch
        # hazard fs_exists closes
        assert not os.path.isdir("file:" + d)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_fs_scheme_resolution(spark):
    assert fs_scheme(spark, "/tmp/x") == "file"
    assert fs_scheme(spark, "file:/tmp/x") == "file"


def test_persisted_topk_sees_stream_index_under_file_uri(spark):
    """A POPULATED stream index must never be silently ignored because
    the root was spelled as a URI: query through 'file:' + root and
    assert the stream-appended candidates surface (before the
    fs_exists fix, os.path.isdir('file:/...') returned False and the
    query answered from the base lists alone — wrong, silently)."""
    from tw_etl_spark.operators.similarity import (
        ann_ivf_persisted_topk,
        write_ivf_index,
    )
    from tw_etl_spark.streaming.sinks import ivf_append_writer

    v = read_table(spark, SF_SMOKE, "embeddings")
    old = v.filter(F.col("vec_id") % 3 != 0)
    new = v.filter(F.col("vec_id") % 3 == 0).select("vec_id", "embedding")
    q = v.filter(F.col("vec_id") < 5)

    d = tempfile.mkdtemp(prefix="ivf_uri_")
    try:
        root = os.path.join(d, "idx")
        write_ivf_index(old, root, n_lists=16)
        ivf_append_writer(spark, root)(new, 0)

        via_posix = {
            tuple(r)
            for r in ann_ivf_persisted_topk(
                q, root, nprobe=2, k=3, stream_appends=True
            ).collect()
        }
        via_uri = {
            tuple(r)
            for r in ann_ivf_persisted_topk(
                q, "file:" + root, nprobe=2, k=3, stream_appends=True
            ).collect()
        }
        assert via_uri == via_posix
        # the streamed rows genuinely changed the answer (the base-only
        # result differs), so a silently-ignored stream index could not
        # have passed the equality above
        base_only = {
            tuple(r)
            for r in ann_ivf_persisted_topk(
                q, root, nprobe=2, k=3, stream_appends=False
            ).collect()
        }
        assert via_posix != base_only
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_stream_lists_crash_state_reads_as_empty(spark):
    """A stream_lists dir holding only _temporary (crash mid-FIRST
    micro-batch, before any data file committed) is a legal state: the
    pinned read schema (ADVICE r12) turns what schema inference would
    raise on into an empty scan, so query/stats/recluster all behave
    as if no stream rows exist yet."""
    from tw_etl_spark.operators.similarity import (
        ann_ivf_persisted_topk,
        ivf_index_stats,
        recluster_ivf_index,
        write_ivf_index,
    )

    v = read_table(spark, SF_SMOKE, "embeddings")
    old = v.filter(F.col("vec_id") % 3 != 0)
    q = v.filter(F.col("vec_id") < 5)

    d = tempfile.mkdtemp(prefix="ivf_crash_")
    try:
        root = os.path.join(d, "idx")
        write_ivf_index(old, root, n_lists=16)
        os.makedirs(os.path.join(root, "stream_lists", "_temporary"))

        want = {
            tuple(r)
            for r in ann_ivf_persisted_topk(q, root, nprobe=2, k=3).collect()
        }
        got = {
            tuple(r)
            for r in ann_ivf_persisted_topk(
                q, root, nprobe=2, k=3, stream_appends=True
            ).collect()
        }
        assert got == want

        st = ivf_index_stats(spark, root, stream_appends=True).collect()[0]
        st_base = ivf_index_stats(spark, root).collect()[0]
        assert st == st_base

        out = os.path.join(d, "re")
        recluster_ivf_index(spark, root, out, n_lists=16, stream_appends=True)
        n = spark.read.parquet(os.path.join(out, "lists")).count()
        assert n == old.count()
    finally:
        shutil.rmtree(d, ignore_errors=True)


@pytest.mark.parametrize("bad", ["s3a://bucket/shards", "hdfs://nn/shards"])
def test_tarshard_uri_roots_rejected_loudly(spark, bad):
    """The tarshard connector's listing/extract/hard-link-commit are
    POSIX-only by contract; an object-store root must fail at plan
    time with routing, not silently match zero shards (read) or
    half-publish (write)."""
    from tw_etl_spark.sources.pyds import register_tarshard

    register_tarshard(spark)
    with pytest.raises(Exception, match="POSIX"):
        spark.read.format("tarshard").load(bad).collect()
    df = spark.createDataFrame(
        [("a.txt", bytearray(b"x"))], "member string, payload binary"
    )
    with pytest.raises(Exception, match="POSIX"):
        df.write.format("tarshard").mode("append").save(bad)
