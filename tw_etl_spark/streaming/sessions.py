"""Keyed-state sessionization over ``applyInPandasWithState``.

The batch engine sessionizes with ``session_window`` (queries/core.py
e3); the streaming engine cannot always — session_window streaming
requires append mode + watermark, and a pipeline that needs CUSTOM
per-session logic (counters, payload folds, emission policy) needs
arbitrary keyed state. This module is that operator: a per-key fold
that maintains the open session in state and emits a session row the
moment a gap closes it.

Emission contract — ONLY CLOSED sessions are emitted; each key's
trailing open session stays in state. Provided each key's events
arrive in event-time order ACROSS batches (within a batch the fold
sorts), the output is deterministic however the source splits
micro-batches: a session spanning two batches is held open, not
emitted twice, and a lag-window SQL sessionization minus each key's
final session is the exact same set. The contract does NOT cover
cross-batch late data — the fold keeps no watermark, so a later batch
carrying an event older than the open session's last timestamp (or
belonging to an already-emitted session) splits or re-emits sessions.
Pair it with an upstream ``withWatermark`` + ordered source (or a
single-batch ``availableNow`` drain, as st2 uses) when the input can
be out of order. The trade is that the tail session of a terminating
stream is never flushed — the standard unbounded-stream posture,
where "the stream ended" is not an event.

State is O(1) per key (three scalars), the per-batch fold is
vectorized pandas (shift/cumsum, no Python row loop), and keys shard
across executors by the groupBy hash — nothing here is driver-sized at
100 TB. Reference semantics: the 30-minute ad-gap segmentation of
packet time series (convert.sh:60-62) generalized to keyed state
(manager.py:281-441's per-stream fold is the same shape with a
different transition function).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

SESSION_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

SESSION_STATE = T.StructType(
    [
        T.StructField("open_start", T.TimestampType()),
        T.StructField("open_last", T.TimestampType()),
        T.StructField("open_n", T.LongType()),
    ]
)


def _make_fold(gap_minutes: int):
    gap = pd.Timedelta(minutes=gap_minutes)

    def _fold(key, pdfs: Iterator[pd.DataFrame], group_state) -> Iterator[pd.DataFrame]:
        if group_state.exists:
            open_start, open_last, open_n = group_state.get
        else:
            open_start = open_last = None
            open_n = 0
        if open_start is not None:
            open_start, open_last = pd.Timestamp(open_start), pd.Timestamp(open_last)

        parts = [p for p in pdfs if len(p)]
        out_rows: list[tuple] = []
        if parts:
            ts = (
                pd.concat(parts, ignore_index=True)["ts"]
                .sort_values(kind="mergesort")
                .reset_index(drop=True)
            )
            # Strictly-greater gap rule: ts > prev + gap opens a new
            # session — identical to e3's oracle boundary (an event at
            # exactly prev + gap continues the session).
            prev = ts.shift()
            new_flag = prev.isna() | (ts > prev + gap)
            if open_start is not None:
                # First incoming row either continues the open session
                # from state or closes it (emitting) and opens its own.
                new_flag.iloc[0] = bool(ts.iloc[0] > open_last + gap)
                if new_flag.iloc[0]:
                    out_rows.append((key[0], open_start, int(open_n)))
                    open_start = None
            sid = new_flag.cumsum()
            grouped = ts.groupby(sid)
            starts = grouped.min()
            counts = grouped.size()
            lasts = grouped.max()
            sids = list(starts.index)
            for i, s in enumerate(sids):
                g_start, g_n, g_last = starts[s], int(counts[s]), lasts[s]
                if i == 0 and open_start is not None:
                    g_start, g_n = open_start, g_n + int(open_n)
                if i < len(sids) - 1:
                    out_rows.append((key[0], g_start, g_n))
                else:
                    open_start, open_last, open_n = g_start, g_last, g_n

        group_state.update((open_start, open_last, int(open_n)))
        yield pd.DataFrame(out_rows, columns=["user_id", "session_start", "n_events"])

    return _fold


def sessionize_closed(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Keyed-state sessionization: one row per CLOSED session
    (user_id, session_start, n_events). ``events`` needs ``user_id``
    and ``ts`` columns; works on streaming input (arbitrary keyed state,
    state = the open session per user)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _make_fold(gap_minutes),
        outputStructType=SESSION_OUTPUT,
        stateStructType=SESSION_STATE,
        outputMode="append",
        timeoutConf="NoTimeout",
    )
