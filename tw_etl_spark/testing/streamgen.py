"""Seeded streaming-scenario generator: stream-vs-batch equivalence
fuzzing for the windowed aggregation operators.

The fixed streaming equivalence tests (tests/test_streaming.py) replay
ONE corpus (the events fixture) through three window shapes.  This
module generates *families* of scenarios from an integer seed:

- a synthetic event corpus with genuine session structure (per-user
  bursts), skewed key cardinalities, exact-duplicate rows, and integer
  ``value`` (cents) so every SUM is exact — float fold order can never
  explain a diff;
- a window config drawn from tumbling / sliding / session kinds with
  non-round durations, random slide/gap, and random grouping keys;
- a random arrival order: the corpus is split into shuffled parquet
  files with pinned mtimes (file-source batch order follows mtime) and
  replayed with a small maxFilesPerTrigger, so the stream sees heavily
  out-of-order micro-batches.

The invariant under test: with a watermark far beyond the corpus span,
`streaming(availableNow) == batch` EXACTLY for the same declarative
plan (tw_etl_spark/streaming/windows.py helpers run in both modes).
Any diff is a real operator/state-management bug, not tolerance noise.

Determinism: scenario and corpus are pure functions of the seed.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BASE_TS_US = int(pd.Timestamp("2026-01-05T00:00:00").value // 1000)  # µs

TUMBLING_DURATIONS = ["17 minutes", "1 hour", "3 hours"]
SLIDING_PAIRS = [("2 hours", "45 minutes"), ("1 hour", "20 minutes"), ("90 minutes", "30 minutes")]
SESSION_GAPS = ["7 minutes", "30 minutes", "2 hours"]
GROUPINGS = [[], ["event_type"], ["user_id"], ["event_type", "user_id"]]


@dataclass
class StreamScenario:
    seed: int
    kind: str  # tumbling | sliding | session
    params: tuple[str, ...]  # (duration,) | (duration, slide) | (gap,)
    group_cols: list[str]
    agg_names: list[str]  # subset of n / sv / mn / mx
    n_rows: int
    n_files: int
    max_files_per_trigger: int


def make_scenario(seed: int) -> StreamScenario:
    rng = np.random.default_rng(seed)
    kind = ["tumbling", "sliding", "session"][int(rng.integers(3))]
    if kind == "tumbling":
        params = (TUMBLING_DURATIONS[int(rng.integers(len(TUMBLING_DURATIONS)))],)
    elif kind == "sliding":
        params = SLIDING_PAIRS[int(rng.integers(len(SLIDING_PAIRS)))]
    else:
        params = (SESSION_GAPS[int(rng.integers(len(SESSION_GAPS)))],)
    group_cols = GROUPINGS[int(rng.integers(len(GROUPINGS)))]
    if kind == "session" and not group_cols:
        # Spark rejects global (ungrouped) session-window aggregation in
        # streaming ("Global aggregation with session window ... is not
        # supported") — session scenarios are always keyed
        group_cols = GROUPINGS[1 + int(rng.integers(len(GROUPINGS) - 1))]
    agg_pool = ["n", "sv", "mn", "mx"]
    k = int(rng.integers(2, 5))
    agg_names = [agg_pool[i] for i in sorted(rng.choice(4, size=k, replace=False))]
    return StreamScenario(
        seed=seed,
        kind=kind,
        params=params,
        group_cols=group_cols,
        agg_names=agg_names,
        n_rows=int(rng.integers(1000, 4000)),
        n_files=int(rng.integers(4, 11)),
        max_files_per_trigger=int(rng.integers(1, 4)),
    )


def gen_corpus(scenario: StreamScenario) -> pd.DataFrame:
    """Synthetic events with session structure: per-user bursts whose
    inter-event gaps straddle typical session-gap boundaries."""
    rng = np.random.default_rng(scenario.seed + 1_000_003)
    n = scenario.n_rows
    n_users = int(rng.integers(3, 40))
    types = [f"t{i}" for i in range(int(rng.integers(2, 7)))]

    rows_user = rng.integers(0, n_users, size=n)
    rows_type = rng.integers(0, len(types), size=n)
    # per-user burst structure: cumulative mixture of short intra-burst
    # gaps (0-20 min) and long inter-burst gaps (1-8 h)
    intra = rng.integers(0, 20 * 60, size=n)
    is_break = rng.random(size=n) < 0.05
    inter = rng.integers(3600, 8 * 3600, size=n) * is_break
    # offsets accumulate per user so each user's timeline is ordered
    offsets = np.zeros(n, dtype=np.int64)
    per_user_clock = np.zeros(n_users, dtype=np.int64)
    for i in range(n):
        u = rows_user[i]
        per_user_clock[u] += intra[i] + inter[i]
        offsets[i] = per_user_clock[u]
    ts_us = BASE_TS_US + offsets * 1_000_000
    pdf = pd.DataFrame(
        {
            # datetime64[us], NOT [ns]: the session reads parquet
            # TIMESTAMP(NANOS) as BIGINT (legacy.parquet.nanosAsLong),
            # so a ns-typed write would break the event-time column
            "ts": pd.to_datetime(ts_us, unit="us").astype("datetime64[us]"),
            "user_id": rows_user.astype(np.int64),
            "event_type": [types[i] for i in rows_type],
            # integer cents: SUM is exact, fold order can't matter
            "value": rng.integers(0, 10_000, size=n).astype(np.int64),
        }
    )
    # exact duplicates (~2%): duplicate handling must match batch
    n_dup = max(1, n // 50)
    dup_idx = rng.integers(0, n, size=n_dup)
    pdf = pd.concat([pdf, pdf.iloc[dup_idx]], ignore_index=True)
    return pdf


def write_replay(scenario: StreamScenario, pdf: pd.DataFrame, out_dir: str) -> None:
    """Split the corpus into shuffled parquet files and pin mtimes so
    the file source replays them in a random (non-time) arrival order."""
    rng = np.random.default_rng(scenario.seed + 2_000_003)
    assign = rng.integers(0, scenario.n_files, size=len(pdf))
    os.makedirs(out_dir, exist_ok=True)
    arrival = rng.permutation(scenario.n_files)
    t0 = time.time() - 3600
    for f in range(scenario.n_files):
        part = pdf[assign == f]
        path = os.path.join(out_dir, f"part-{f:03d}.parquet")
        part.to_parquet(path, index=False)
        mt = t0 + int(arrival[f]) * 60
        os.utime(path, (mt, mt))


def _aggs(names: list[str]):
    all_aggs = {
        "n": F.count(F.lit(1)).alias("n"),
        "sv": F.sum("value").alias("sv"),
        "mn": F.min("value").alias("mn"),
        "mx": F.max("value").alias("mx"),
    }
    return [all_aggs[a] for a in names]


def build_plan(df: DataFrame, scenario: StreamScenario, watermark: str | None) -> DataFrame:
    from tw_etl_spark.streaming.windows import session_agg, sliding_agg, tumbling_agg

    aggs = _aggs(scenario.agg_names)
    if scenario.kind == "tumbling":
        return tumbling_agg(df, "ts", scenario.params[0], scenario.group_cols, aggs, watermark)
    if scenario.kind == "sliding":
        dur, slide = scenario.params
        return sliding_agg(df, "ts", dur, slide, scenario.group_cols, aggs, watermark)
    return session_agg(df, "ts", scenario.params[0], scenario.group_cols, aggs, watermark)


def run_scenario(spark: SparkSession, scenario: StreamScenario, replay_dir: str) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Run the scenario streaming (availableNow over the replay dir)
    and batch (plain read of the same files); return canonicalized
    (stream_result, batch_result) pandas frames."""
    from tw_etl_spark.streaming.windows import run_stream_to_memory

    batch_df = spark.read.parquet(replay_dir)
    stream_df = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", scenario.max_files_per_trigger)
        .parquet(replay_dir)
    )
    got = run_stream_to_memory(
        build_plan(stream_df, scenario, watermark="365 days"),
        f"stream_fuzz_{scenario.seed}",
    )
    want = build_plan(batch_df, scenario, watermark=None)
    return canon(got), canon(want)


def run_scenario_restart(
    spark: SparkSession, scenario: StreamScenario, work_dir: str
) -> tuple[dict, dict]:
    """Two-phase checkpointed replay: reveal half the replay files, run
    the scenario to completion (availableNow, update-mode foreachBatch
    into a driver-side dict), then reveal the rest and RESTART from the
    same checkpoint.  The restarted run must resume from committed
    state — not reprocess phase A — and the final dict must equal the
    batch aggregate over the full corpus.

    Returns (streamed_state, batch_state) keyed by
    (window_start, *group_cols) with the agg tuple as value.
    """
    import glob

    pdf = gen_corpus(scenario)
    staging = os.path.join(work_dir, "staging")
    replay = os.path.join(work_dir, "replay")
    ckpt = os.path.join(work_dir, "ckpt")
    os.makedirs(replay, exist_ok=True)
    write_replay(scenario, pdf, staging)
    files = sorted(glob.glob(os.path.join(staging, "*.parquet")))
    split = max(1, len(files) // 2)

    state: dict = {}
    group_cols = scenario.group_cols
    agg_names = scenario.agg_names
    # session windows can MERGE as events arrive, so Spark only allows
    # complete/append output for them — use complete (each batch is the
    # full snapshot, dict rebuilt); tumbling/sliding use update (each
    # batch carries only changed rows, dict converges)
    mode = "complete" if scenario.kind == "session" else "update"

    def apply_updates(bdf: DataFrame, _bid: int) -> None:
        rows = bdf.collect()
        if mode == "complete":
            state.clear()
        for r in rows:
            key = (r.win.start, *[r[c] for c in group_cols])
            state[key] = tuple(r[a] for a in agg_names)

    def run_phase() -> None:
        batch_schema = spark.read.parquet(staging).schema
        stream_df = (
            spark.readStream.schema(batch_schema)
            .option("maxFilesPerTrigger", scenario.max_files_per_trigger)
            .parquet(replay)
        )
        q = (
            build_plan(stream_df, scenario, watermark="365 days")
            .writeStream.outputMode(mode)
            .option("checkpointLocation", ckpt)
            .foreachBatch(apply_updates)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    for f in files[:split]:
        os.link(f, os.path.join(replay, os.path.basename(f)))
    run_phase()
    for f in files[split:]:
        os.link(f, os.path.join(replay, os.path.basename(f)))
    run_phase()

    want_df = build_plan(spark.read.parquet(staging), scenario, watermark=None)
    want = {
        (r.win.start, *[r[c] for c in group_cols]): tuple(r[a] for a in agg_names)
        for r in want_df.collect()
    }
    return state, want


def run_scenario_latedrop(
    spark: SparkSession, scenario: StreamScenario, replay_dir: str, watermark: str
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Run the scenario with a TIGHT watermark in append mode (only
    finalized windows are emitted; rows later than the watermark are
    dropped) and return (stream_result, batch_result).

    Which rows drop depends on micro-batch boundaries, so no exact
    golden exists — the caller asserts the CONTAINMENT property
    instead: every finalized (window, key) appears at most once, exists
    in batch, and its aggregates are subset-consistent (count/sum no
    greater, min no smaller, max no larger).  Only meaningful for
    tumbling/sliding kinds: session-window boundaries are
    data-dependent, so dropping a row can produce split sessions that
    legitimately don't exist in batch.
    """
    from tw_etl_spark.streaming.windows import run_stream_to_memory

    batch_df = spark.read.parquet(replay_dir)
    stream_df = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", scenario.max_files_per_trigger)
        .parquet(replay_dir)
    )
    got = run_stream_to_memory(
        build_plan(stream_df, scenario, watermark=watermark),
        f"stream_latedrop_{scenario.seed}",
        output_mode="append",
    )
    want = build_plan(batch_df, scenario, watermark=None)
    return canon(got), canon(want)


def canon(df: DataFrame) -> pd.DataFrame:
    pdf = df.toPandas()
    if "win" in pdf.columns:
        pdf["win_start"] = pdf["win"].map(lambda w: w["start"])
        pdf["win_end"] = pdf["win"].map(lambda w: w["end"])
        pdf = pdf.drop(columns=["win"])
    cols = sorted(pdf.columns)
    return pdf[cols].sort_values(by=cols).reset_index(drop=True)
