"""Streaming window operators: tumbling / sliding / session aggregation
with watermarks (SURVEY.md §2.2 streaming block).

Each helper works on BOTH batch and streaming DataFrames — the same
declarative plan runs in either mode, which is what makes the
stream-vs-batch equivalence harness (tests/test_streaming.py) possible:
run the identical function over a file-source stream and over the batch
table, compare results.

Watermark semantics (100 TB / unbounded-stream posture): the watermark
bounds state size — closed windows are evicted, rows older than the
watermark are dropped. Equivalence with batch therefore holds exactly
when no row is later than the watermark; the harness tests both the
exact case and the late-drop case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.column import Column


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    group_cols: list[str],
    aggs: list[Column],
    watermark: str | None = None,
) -> DataFrame:
    """Non-overlapping event-time windows, e.g. hourly rollups (E1)."""
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return df.groupBy(F.window(ts_col, duration).alias("win"), *group_cols).agg(*aggs)


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    group_cols: list[str],
    aggs: list[Column],
    watermark: str | None = None,
) -> DataFrame:
    """Overlapping windows (each row lands in duration/slide windows)."""
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return df.groupBy(
        F.window(ts_col, duration, slide).alias("win"), *group_cols
    ).agg(*aggs)


def session_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    group_cols: list[str],
    aggs: list[Column],
    watermark: str | None = None,
) -> DataFrame:
    """Gap-based session windows — the streaming form of E3's
    sessionization (30-min inactivity closes a session; mirrors the
    reference's ad-gap segmentation of packet time series,
    convert.sh:60-62)."""
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return df.groupBy(
        F.session_window(ts_col, gap).alias("win"), *group_cols
    ).agg(*aggs)


def run_stream_to_memory(
    stream_df: DataFrame, query_name: str, output_mode: str = "complete"
):
    """Drive a streaming DataFrame to completion against the in-memory
    sink (synchronous, for tests). Returns the result as a batch DF."""
    (res,) = run_streams_to_memory([(stream_df, query_name, output_mode)])
    return res


def run_streams_to_memory(
    jobs: list[tuple[DataFrame, str, str]]
) -> list[DataFrame]:
    """Drive several independent streaming DataFrames to completion
    CONCURRENTLY against memory sinks: start every query first, then
    await each — wall time is the slowest stream, not the sum. Each job
    is (stream_df, query_name, output_mode); returns the sink contents
    in job order."""
    started = []
    try:
        for df, name, mode in jobs:
            started.append(
                (
                    df.writeStream.outputMode(mode)
                    .format("memory")
                    .queryName(name)
                    .trigger(availableNow=True)
                    .start(),
                    df.sparkSession,
                    name,
                )
            )
    except Exception:
        # A later start() failing (e.g. duplicate query name) must not
        # leak the already-running queries into the session.
        for q, _, _ in started:
            try:
                q.stop()
            except Exception:
                pass
        raise
    for q, _, _ in started:
        q.awaitTermination()
    return [s.sql(f"SELECT * FROM {name}") for _, s, name in started]
