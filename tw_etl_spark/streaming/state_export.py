"""State snapshot export / query (R24 + the ``GET /state`` twin).

The reference persists its whole keyed state as a JSON document on
every transition (dual file write + HTTP PUT, /root/reference/
stream_manager/src/stream_manager/state.py:25-38) and serves it back
live via ``GET /state`` (manager.py:196-198). Under Spark the durable
twin is the streaming checkpoint's state store — written by the engine,
not by operator code — so the reference's two read paths map to:

- **snapshot export** (``state.py`` file shape): read the checkpointed
  state store with Spark's state data source and write it out as JSON;
- **live query** (``GET /state``): the same read, returned as a dict,
  pluggable into :class:`~tw_etl_spark.streaming.http_bridge.
  HttpPushBridge` as its ``state_reader``.

The state data source reads committed micro-batch state, so a snapshot
taken while a query runs reflects the last committed batch — exactly
the durability point the reference's write-ahead JSON gave it.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession


def read_machine_state(
    spark: SparkSession,
    checkpoint_dir: str,
    operator_id: int = 0,
    state_var_name: str | None = None,
) -> DataFrame:
    """Committed per-key retry-machine state from a streaming
    checkpoint, flattened to (stream_id, active, retry_id,
    poll_attempt, retries).

    Uses the state data source (``format("statestore")``) — a plain
    batch read over the checkpoint, runnable while the stream is live
    (the reference reads its JSON snapshot the same way,
    state.py:59-81).

    ``state_var_name`` targets transformWithStateInPandas checkpoints,
    whose state lives in named slots rather than the single
    ``value.groupState`` struct: pass the slot name (e.g. ``"retry"``)
    and it is forwarded as the source's ``stateVarName`` option, whose
    value schema is already flat. The default (None) reads the
    applyInPandasWithState layout this repo's machine writes."""
    reader = (
        spark.read.format("statestore")
        # path is the checkpoint ROOT (the source resolves commits/ and
        # state/ under it itself) — pointing at ck/state makes it see an
        # empty commit log and raise STDS_COMMITTED_BATCH_UNAVAILABLE.
        .option("path", checkpoint_dir)
        .option("operatorId", operator_id)
    )
    if state_var_name is not None:
        return (
            reader.option("stateVarName", state_var_name)
            .load()
            .select("key.*", "value.*")
        )
    df = reader.load()
    # applyInPandasWithState checkpoints the user state under
    # value.groupState; flatten to (stream_id, <state fields>).
    return df.select("key.*", "value.groupState.*")


def state_snapshot(
    spark: SparkSession, checkpoint_dir: str, operator_id: int = 0
) -> dict[str, dict[str, Any]]:
    """``GET /state`` shape: {stream_id: state fields}. Driver-side
    collect — per-key state is bounded by live keys, the same bound the
    reference accepts for its whole-state JSON document."""
    rows = read_machine_state(spark, checkpoint_dir, operator_id).collect()
    out: dict[str, dict[str, Any]] = {}
    for r in rows:
        d = r.asDict()
        out[str(d.pop("stream_id"))] = d
    return out


def export_state_json(
    spark: SparkSession,
    checkpoint_dir: str,
    out_path: str,
    operator_id: int = 0,
) -> int:
    """R24 snapshot export: dump committed keyed state to one JSON
    document at ``out_path`` (the reference's ``write_state`` file
    shape: a single object keyed by stream id, state.py:25-38).
    Returns the number of keys exported."""
    snap = state_snapshot(spark, checkpoint_dir, operator_id)
    tmp = out_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(snap, f, indent=1, sort_keys=True)
    os.replace(tmp, out_path)  # atomic like the reference's mv commit
    return len(snap)
