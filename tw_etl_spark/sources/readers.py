"""Sources & sinks (SURVEY.md §2.2 scans block).

Readers cover the reference's ingest surface generalized to Spark:
parquet (all driver tables), JSON incl. gzipped JSONL sidecars
(ffprobe/packet metadata, convert.sh:58,63-65 — Spark's JSON reader is
codec-transparent), CSV/text logs (convert.sh:12-15), and
directory-listing facts via ``input_file_name()`` + the ``_metadata``
hidden column (R1: size-ordered scans; manager.py:369 empty-file gate).

The sink side: Hive-partitioned parquet writes (R12's tiered routing →
``partitionBy``), with rename-based atomic task commit supplied by
Spark's FileOutputCommitter (R9 for free).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def with_file_metadata(df: DataFrame) -> DataFrame:
    """Attach source-file facts: path, size, modification time.

    The `_metadata` struct is populated by the file sources themselves —
    zero extra I/O (unlike a driver-side directory listing)."""
    return df.select(
        "*",
        F.input_file_name().alias("file_path"),
        F.col("_metadata.file_size").alias("file_size"),
        F.col("_metadata.file_modification_time").alias("file_mtime"),
    )


def read_json(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """JSON / JSONL reader; gzip handled transparently by extension."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)  # no inference pass in production
    return reader.json(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    header: bool = True,
) -> DataFrame:
    reader = spark.read.option("header", header)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


LOG_LINE_RE = r"^(\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}[+-]\d{2}:?\d{2}|\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}) (.*)$"


def read_log_lines(spark: SparkSession, path: str) -> DataFrame:
    """Timestamped append-log reader (reference convert.sh:12-15 format:
    '<ISO-seconds> <message>') → (log_ts, message)."""
    raw = spark.read.text(path)
    return raw.select(
        F.to_timestamp(F.regexp_extract("value", LOG_LINE_RE, 1)).alias("log_ts"),
        F.regexp_extract("value", LOG_LINE_RE, 2).alias("message"),
    )


def parse_recording_filename(df: DataFrame, path_col: str = "file_path") -> DataFrame:
    """R2: '{stream}_{qid}_{ISO-datetime}_{retry}.mkv' → columns
    (convert.sh:38-42; filename built at manager.py:271)."""
    base = F.element_at(F.split(F.col(path_col), "/"), -1)
    rx = r"^(.+)_(audio_only|[0-9]+p[0-9]*)_(\d{4}-\d{2}-\d{2}T[0-9:.]+)_(\d+)\.mkv$"
    return df.withColumns(
        {
            "stream_id": F.regexp_extract(base, rx, 1),
            "quality": F.regexp_extract(base, rx, 2),
            "recorded_at": F.try_to_timestamp(F.nullif(F.regexp_extract(base, rx, 3), F.lit(""))),
            # try_cast: non-matching rows yield '' and ANSI mode (Spark 4
            # default) makes a plain cast throw
            "retry_id": F.regexp_extract(base, rx, 4).try_cast("int"),
        }
    )


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> None:
    """Hive-partitioned parquet sink. Partition values become directory
    facts (the reference's filename-encoded facts, properly modeled);
    readers get partition pruning on these columns for free."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_audited(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | None = None,
    mode: str = "overwrite",
    checksum_col: str | None = None,
) -> dict[str, int | bool]:
    """Write-audit pattern (reference R13: head-object after upload,
    s3-sync.sh:50-51): write parquet, then RE-READ the committed files
    and verify row count — and, if ``checksum_col`` is given, an
    order-insensitive xxhash64-XOR checksum over that column — against
    the source plan. Returns the audit facts instead of asserting, so
    callers choose their failure policy. The audit is one extra scan of
    the written data (cheap: it reads the sink, not the 100 TB input —
    the input plan re-evaluates only for its count/checksum, which
    Spark serves from the same shuffle outputs in warm sessions).
    """
    spark = df.sparkSession
    w = df.write.mode(mode)
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(path)

    def facts(frame: DataFrame) -> tuple[int, int]:
        aggs = [F.count(F.lit(1)).alias("n")]
        if checksum_col:
            aggs.append(
                F.bit_xor(F.xxhash64(F.col(checksum_col).cast("string"))).alias("ck")
            )
        row = frame.agg(*aggs).first()
        return int(row[0]), (int(row[1]) if checksum_col and row[1] is not None else 0)

    want_n, want_ck = facts(df)
    got_n, got_ck = facts(spark.read.parquet(path))
    return {
        "rows_written": got_n,
        "rows_expected": want_n,
        "count_ok": got_n == want_n,
        "checksum_ok": (got_ck == want_ck) if checksum_col else True,
    }


def read_orc(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """ORC reader — same columnar scan contract as parquet (predicate
    pushdown + column pruning via the vectorized ORC source)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Hive-partitioned ORC sink (interop with ORC-based warehouses)."""
    w = df.write.mode(mode)
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.orc(path)


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Avro reader, two tiers. Preferred: Spark's vectorized
    ``spark-avro`` connector (external package). When that jar is not
    deployed — this environment cannot install packages — fall back to
    the pure-Python spec decoder (`sources/avro_fallback.py`): files
    listed by the ``binaryFile`` source, containers decoded inside
    ``mapInPandas``, partition-parallel. The fallback trades
    within-file split granularity for zero dependencies; both tiers
    return the same rows (round-trip + known-answer tests in
    tests/test_sources.py)."""
    try:
        return spark.read.format("avro").load(path)
    except Exception as exc:
        # Reroute ONLY the missing-connector case to the fallback; any
        # other failure (bad path, permissions, analysis error while the
        # connector IS deployed) must surface unchanged — the two tiers
        # differ in logical-type mapping, so a silent reroute would
        # change semantics across environments.
        msg = str(exc)
        missing_connector = (
            "FAILED_TO_LOAD_DATA_SOURCE" in msg
            or "Failed to find data source: avro" in msg
            or "ClassNotFound" in msg
        )
        if not missing_connector:
            raise
        from tw_etl_spark.sources.avro_fallback import read_avro_fallback

        return read_avro_fallback(spark, path)


def _dir_bytes(spark: SparkSession, path: str) -> int:
    """Recursive byte size of a directory via the Hadoop FileSystem API —
    works on HDFS/S3A/local alike (no driver-side os.walk assumption)."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(hconf)
    return fs.getContentSummary(p).getLength()


def compact_parquet(
    df: DataFrame,
    path: str,
    target_file_mb: int = 256,
    sample_rows: int = 10_000,
    mode: str = "overwrite",
    persist_input: bool = True,
) -> dict[str, int]:
    """Small-files compaction sink: write ``df`` as parquet files sized
    near ``target_file_mb``.

    The small-files problem is the classic 100 TB sink failure: a
    1000-executor job writing per-task files produces millions of KB
    files that throttle every downstream scan (footer reads + task
    scheduling dominate). This sink sizes output deterministically:

    1. write a bounded ``sample_rows`` slice to a sizing scratch dir and
       measure true parquet-encoded bytes/row (encoders + compression
       make a-priori row-size guesses wrong by 10x);
    2. rows_per_file = target_bytes / bytes_per_row, file count =
       ceil(total_rows / rows_per_file);
    3. one round-robin repartition to the file count, with
       ``maxRecordsPerFile`` as the hard per-file bound.

    The input plan is evaluated three times (sizing sample, count,
    final write); ``persist_input`` (default) caches ``df``
    MEMORY_AND_DISK across the three so an expensive upstream plan runs
    once — pass False when ``df`` is larger than cluster storage and
    recomputation is the cheaper trade. ``path`` must NOT be a source
    of ``df`` itself: Spark refuses to overwrite a path that the plan
    is concurrently reading, so in-place compaction needs a scratch
    target + rename (or a table format with atomic replace).
    Returns the sizing facts for observability.
    """
    spark = df.sparkSession
    if persist_input:
        df = df.persist()
    try:
        scratch = path.rstrip("/") + "__sizing"
        sample = df.limit(sample_rows)
        sample.write.mode("overwrite").parquet(scratch)
        n_sample = spark.read.parquet(scratch).count()
        sample_bytes = _dir_bytes(spark, scratch)

        bytes_per_row = max(sample_bytes / max(n_sample, 1), 1.0)
        target_bytes = target_file_mb * 1024 * 1024
        rows_per_file = max(int(target_bytes / bytes_per_row), 1)
        total_rows = df.count()
        n_files = max(-(-total_rows // rows_per_file), 1)  # ceil

        (
            df.repartition(n_files)
            .write.mode(mode)
            .option("maxRecordsPerFile", rows_per_file)
            .parquet(path)
        )
    finally:
        if persist_input:
            df.unpersist()
    # drop the sizing scratch
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(scratch)
    p.getFileSystem(hconf).delete(p, True)
    return {
        "rows": total_rows,
        "bytes_per_row": int(bytes_per_row),
        "rows_per_file": rows_per_file,
        "n_files": int(n_files),
    }


def overwrite_partitions(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
) -> None:
    """Dynamic partition overwrite: replace ONLY the partitions present
    in ``df``, leaving sibling partitions untouched.

    This is the idempotent-backfill primitive at 100 TB: re-running one
    day/hour of a pipeline rewrites that day's directories and nothing
    else (static overwrite mode would truncate the whole table first).
    Scoped via ``partitionOverwriteMode=dynamic`` on this write only —
    no session-global config mutation."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(path)
    )
