"""Per-key stateful retry machine — the relational port of the
reference's ``try_stream`` state machine (R19).

Reference semantics ported (citations into /root/reference/):
- dedupe of concurrent starts per key      stream_manager/src/stream_manager/manager.py:287-289
- state row created on start, retry loop   manager.py:295-309, 311-320
- empty output + poll attempt ⇒ stop       manager.py:367-386 (poll_attempt branch)
- empty output + push attempt ⇒ retry      manager.py:378-384
- retry cap ⇒ exhaustion cleanup/promote   manager.py:398-427
- state persisted at every transition      manager.py:309,321,348,365 → here: Spark
  state store checkpointing (free)

The transition function is pure Python (table-driven-testable); the
Spark integration wraps it in ``applyInPandasWithState`` so each key's
state lives in the checkpointed state store, with the groupBy hash
partition guaranteeing one state owner per key — replacing the
reference's per-key asyncio.Lock (manager.py:44,292) with partitioning.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

# Events
ONLINE = "online"  # poll hit or push signal (manager.py:163-176, 445-458)
DOWNLOAD_DONE = "download_done"  # recording attempt finished

# Actions (one output row per input event)
START = "start"
DEDUP_SKIP = "dedup_skip"
RETRY = "retry"
CONTINUE = "continue"
STOP_EMPTY_POLL = "stop_empty_poll"
EXHAUSTED_COMPLETE = "exhausted_complete"


@dataclass
class RetryState:
    active: bool = False
    retry_id: int = 0
    poll_attempt: bool = False
    retries: int = 3


def step(state: RetryState, event: dict) -> tuple[RetryState, str]:
    """One transition. Returns (new_state, action)."""
    kind = event["event"]
    if kind == ONLINE:
        if state.active:
            return state, DEDUP_SKIP  # manager.py:287-289
        return (
            RetryState(
                active=True,
                retry_id=1,
                poll_attempt=bool(event.get("poll_attempt", False)),
                retries=int(event.get("retries", 3)),
            ),
            START,
        )
    if kind == DOWNLOAD_DONE:
        if not state.active:
            return state, DEDUP_SKIP  # stray completion for an idle key
        empty = int(event.get("size", 0)) <= 0
        if empty and state.poll_attempt:
            return RetryState(retries=state.retries), STOP_EMPTY_POLL
        nxt = state.retry_id + 1
        if nxt > state.retries:
            return RetryState(retries=state.retries), EXHAUSTED_COMPLETE
        return (
            RetryState(True, nxt, state.poll_attempt, state.retries),
            RETRY if empty else CONTINUE,
        )
    return state, DEDUP_SKIP


def apply_events(state: RetryState, events: Iterable[dict]) -> tuple[RetryState, list[str]]:
    actions = []
    for ev in events:
        state, action = step(state, ev)
        actions.append(action)
    return state, actions


EVENT_SCHEMA = T.StructType(
    [
        T.StructField("stream_id", T.StringType()),
        T.StructField("event", T.StringType()),
        T.StructField("size", T.LongType()),
        T.StructField("poll_attempt", T.BooleanType()),
        T.StructField("retries", T.IntegerType()),
        T.StructField("seq", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("stream_id", T.StringType()),
        T.StructField("action", T.StringType()),
        T.StructField("retry_id", T.IntegerType()),
        T.StructField("seq", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("active", T.BooleanType()),
        T.StructField("retry_id", T.IntegerType()),
        T.StructField("poll_attempt", T.BooleanType()),
        T.StructField("retries", T.IntegerType()),
        # event-time watchdog deadline (epoch ms); null in
        # processing-time / no-timeout modes
        T.StructField("deadline_ms", T.LongType()),
    ]
)


TIMEOUT_SEQ = -1  # seq marker on timeout-generated actions


def _make_machine(timeout_ms: int | None, event_time: bool):
    def _machine(
        key, pdfs: Iterator[pd.DataFrame], group_state
    ) -> Iterator[pd.DataFrame]:
        if group_state.exists:
            active, retry_id, poll_attempt, retries, deadline_ms = group_state.get
            state = RetryState(active, retry_id, poll_attempt, retries)
        else:
            state, deadline_ms = RetryState(), None
        rows = []
        if timeout_ms is not None and getattr(group_state, "hasTimedOut", False):
            # Watchdog semantics the reference left as a TODO
            # (manager.py:250-266 healthcheck): a key stuck in an active
            # attempt past the deadline is treated as a dead download —
            # same transition as an empty download_done result.
            if state.active:
                state, action = step(
                    state,
                    {
                        "event": DOWNLOAD_DONE,
                        "size": 0,
                        "poll_attempt": state.poll_attempt,
                    },
                )
                rows.append((key[0], action, state.retry_id, TIMEOUT_SEQ))
                if event_time and deadline_ms is not None:
                    # Re-arm one period past the MISSED deadline (not
                    # past "now") so the fire schedule stays a pure
                    # function of event time: deadlines are
                    # last_event_ts + k*T, k = 1, 2, ...
                    deadline_ms = int(deadline_ms) + timeout_ms
        for pdf in pdfs:
            pdf = pdf.sort_values("seq")
            if event_time and len(pdf) and pdf["ts"].notna().any():
                deadline_ms = (
                    int(pdf["ts"].max().value // 1_000_000) + timeout_ms
                )
            for ev in pdf.to_dict("records"):
                state, action = step(state, ev)
                rows.append((key[0], action, state.retry_id, ev["seq"]))
        group_state.update(
            (
                state.active,
                state.retry_id,
                state.poll_attempt,
                state.retries,
                int(deadline_ms) if (event_time and deadline_ms is not None) else None,
            )
        )
        if timeout_ms is not None and state.active:
            if event_time:
                if deadline_ms is None:
                    # An active key whose events all carry null ts has no
                    # event-time position yet: it carries no deadline (a
                    # timer would need a timestamp we don't have). The
                    # first non-null ts arms it.
                    pass
                else:
                    # Spark rejects timestamps at or below the watermark;
                    # clamping only affects WHEN an already-late deadline
                    # fires (next batch), never whether it fires.
                    wm = group_state.getCurrentWatermarkMs()
                    group_state.setTimeoutTimestamp(max(int(deadline_ms), wm + 1))
            else:
                group_state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(rows, columns=["stream_id", "action", "retry_id", "seq"])

    return _machine


def retry_machine_stream(
    events: DataFrame,
    timeout_ms: int | None = None,
    event_time: bool = False,
    watermark: str | None = None,
) -> DataFrame:
    """Wire the retry machine over a (streaming) events DataFrame with
    EVENT_SCHEMA. State is checkpointed per stream_id; ordering within a
    micro-batch follows the ``seq`` column (cross-batch ordering is the
    source's responsibility, as in any log-replay design).

    With ``timeout_ms`` and ``event_time=False``, an active key that
    sees no event within the deadline takes the empty-download
    transition (processing-time watchdog). Watchdog mode requires a
    continuous trigger (``processingTime``): ``availableNow`` never
    terminates under ProcessingTimeTimeout because the engine keeps
    scheduling state-cleanup batches.

    With ``event_time=True`` (requires ``watermark``, e.g. "1 minute",
    applied to the ``ts`` column), the watchdog is DETERMINISTIC in
    event time: an active key fires exactly when the watermark passes
    its current deadline — ``last event ts + timeout_ms`` at first,
    re-armed one period past the missed deadline after each fire, so
    deadlines sit at ``last_ts + k*timeout_ms`` independent of wall
    clock or scheduling (the oracle-checkable form of the reference's
    healthcheck TODO, manager.py:250-266). The engine fires at most one
    pending timer per key per batch, so HOW MANY deadlines a stuck key
    burns through depends only on the watermark trajectory: a
    single-batch ``availableNow`` drain fires each stuck key exactly
    once iff ``last_ts + timeout_ms < max(ts) - watermark_delay``
    (STRICTLY less, in whole milliseconds — a deadline exactly equal to
    the final watermark does not fire; pinned by
    tests/test_streaming.py::test_machine_event_time_timeout and
    ::test_event_time_fire_boundary).
    Works under ``availableNow``: timers due at the final watermark
    fire in the engine's state-cleanup batch, then the query
    terminates — unlike ProcessingTimeTimeout, which never lets
    availableNow terminate.
    """
    if event_time:
        if watermark is None:
            raise ValueError("event_time watchdog requires a watermark on ts")
        events = events.withWatermark("ts", watermark)
    return events.groupBy("stream_id").applyInPandasWithState(
        _make_machine(timeout_ms, event_time),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            "EventTimeTimeout"
            if (timeout_ms is not None and event_time)
            else "ProcessingTimeTimeout"
            if timeout_ms is not None
            else "NoTimeout"
        ),
    )


# ---------------------------------------------------------------------------
# Funnel machine (st6): the e6 ordered view->click->purchase funnel as
# keyed streaming state — first view, first click STRICTLY after it,
# first purchase strictly after that click, per user.

FUNNEL_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
    ]
)

FUNNEL_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("stage", T.StringType()),
        T.StructField("gap_ms", T.LongType()),
    ]
)

# epoch MICROSECONDS of each reached stage; 0 = not reached (event
# timestamps are all past epoch, so 0 is a safe sentinel)
FUNNEL_STATE_SCHEMA = T.StructType(
    [
        T.StructField("t1_us", T.LongType()),
        T.StructField("t2_us", T.LongType()),
        T.StructField("t3_us", T.LongType()),
    ]
)


def funnel_step(
    t1: int, t2: int, t3: int, ts_us: int, event_type: str
) -> tuple[int, int, int, str | None, int | None]:
    """Pure funnel transition (table-testable like ``step``): advance on
    one event, returning (t1, t2, t3, stage_emitted, gap_ms). All guards
    are STRICT comparisons, so same-timestamp ties resolve identically
    regardless of within-batch sort order — a click at exactly the first
    view's timestamp never advances (matching e6's relational
    ``e.ts > v.t1``)."""
    if event_type == "view" and t1 == 0:
        return ts_us, t2, t3, "1_view", None
    if event_type == "click" and t1 > 0 and t2 == 0 and ts_us > t1:
        return t1, ts_us, t3, "2_click", (ts_us - t1) // 1000
    if event_type == "purchase" and t2 > 0 and t3 == 0 and ts_us > t2:
        return t1, t2, ts_us, "3_purchase", (ts_us - t2) // 1000
    return t1, t2, t3, None, None


def funnel_machine_stream(events: DataFrame) -> DataFrame:
    """Wire the funnel over a streaming (user_id, ts, event_type) frame
    via ``applyInPandasWithState``: per-user stage timestamps live in
    the checkpointed state store; one output row per stage ADVANCE with
    the exact integer inter-stage gap in ms.

    Within a micro-batch events replay in (ts, event_type) order;
    cross-batch ordering is the source's responsibility (same log-replay
    contract as ``retry_machine_stream``) — a source that delivers each
    key's events in event-time order across batches (e.g. time-split
    files) yields output identical to the single-batch drain, unit-
    tested in tests/test_streaming.py. Null-ts events are dropped
    (e6's ``WHERE ts IS NOT NULL``)."""

    def _machine(
        key, pdfs: Iterator[pd.DataFrame], group_state
    ) -> Iterator[pd.DataFrame]:
        t1, t2, t3 = group_state.get if group_state.exists else (0, 0, 0)
        recs: list[tuple[int, str]] = []
        for pdf in pdfs:
            pdf = pdf[pdf["ts"].notna()]
            recs.extend(
                (int(ts.value) // 1000, str(et))
                for ts, et in zip(pdf["ts"], pdf["event_type"])
            )
        recs.sort()
        rows = []
        for ts_us, et in recs:
            t1, t2, t3, stage, gap = funnel_step(t1, t2, t3, ts_us, et)
            if stage is not None:
                rows.append((key[0], stage, gap))
        group_state.update((t1, t2, t3))
        yield pd.DataFrame(rows, columns=["user_id", "stage", "gap_ms"])

    return events.groupBy("user_id").applyInPandasWithState(
        _machine,
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


# ---------------------------------------------------------------------------
# On transformWithStateInPandas (Spark 4.x StatefulProcessor API):
# ``applyInPandasWithState`` above is the one supported wiring of this
# machine. A TWS variant (StatefulProcessor with named state slots and
# first-class processing-time timers) existed through round 5 but had
# never executed anywhere: the TWS python worker speaks a
# protobuf-based state-server protocol (pyspark.sql.streaming.proto
# imports google.protobuf at query start) and the target environment
# ships no python protobuf, so the code was permanently dead. It was
# deleted rather than shipped unverified. Porting is mechanical when a
# protobuf-equipped environment exists: the pure transition function
# ``step`` is the whole machine — handleInputRows replays events
# through it, handleExpiredTimer feeds the synthetic empty-download
# event the watchdog branch of ``_make_machine`` uses today.
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# Retention machine (st7): e7's first-activity-day cohorts as keyed
# streaming state — the cohort day latches on first activity and a
# per-user day-offset bitmap dedups repeat activity, so each (user,
# active day) emits exactly once no matter how events split across
# micro-batches.

RETENTION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("cohort_day", T.LongType()),  # epoch days (UTC)
        T.StructField("day_offset", T.LongType()),
    ]
)

# cohort epoch day (-1 = user unseen) + a 256-day offset bitmap in four
# longs: constant per-user state at any stream length inside the
# horizon. Past the horizon the machine fails LOUD (a retention table
# past 256 days wants the batch tier e7, not silent skew).
RETENTION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("cohort_day", T.LongType()),
        T.StructField("m0", T.LongType()),
        T.StructField("m1", T.LongType()),
        T.StructField("m2", T.LongType()),
        T.StructField("m3", T.LongType()),
    ]
)

RETENTION_HORIZON_DAYS = 256


def retention_step(
    cohort: int, masks: list[int], day: int
) -> tuple[int, list[int], int | None]:
    """Pure retention transition (table-testable like ``funnel_step``):
    one activity day in, (cohort, masks, emitted_offset | None) out.
    First activity latches the cohort and emits offset 0; a repeat day
    emits nothing; a new day emits its offset once. Days BEFORE the
    latched cohort violate the event-time-order source contract the
    machine documents — raise rather than silently re-cohort away from
    the batch (e7) answer."""
    if cohort < 0:
        cohort = day
    off = day - cohort
    if off < 0:
        raise ValueError(
            f"activity day {day} precedes latched cohort {cohort}: "
            "source broke the event-time-order contract"
        )
    if off >= RETENTION_HORIZON_DAYS:
        raise ValueError(
            f"day offset {off} beyond the {RETENTION_HORIZON_DAYS}-day "
            "state horizon — use the batch retention tier (e7)"
        )
    w, b = divmod(off, 64)
    if (masks[w] >> b) & 1:
        return cohort, masks, None
    masks = list(masks)
    masks[w] |= 1 << b
    return cohort, masks, off


def retention_machine_stream(events: DataFrame) -> DataFrame:
    """Wire the retention machine over a streaming (user_id, ts, ...)
    frame via ``applyInPandasWithState``: per-user (cohort, bitmap)
    state in the checkpointed store; one output row per NEW (user,
    active day) carrying the cohort epoch day and the day offset —
    ids+small-ints only, the e7 aggregation runs downstream on the
    emissions. Within a micro-batch days replay in event-time order;
    cross-batch ordering is the source's contract (the
    ``funnel_machine_stream`` log-replay rule — split-independence for
    time-ordered sources is unit-tested). Null-ts events drop (e7's
    ``WHERE ts IS NOT NULL``)."""

    def _machine(
        key, pdfs: Iterator[pd.DataFrame], group_state
    ) -> Iterator[pd.DataFrame]:
        if group_state.exists:
            cohort, m0, m1, m2, m3 = group_state.get
        else:
            cohort, m0, m1, m2, m3 = -1, 0, 0, 0, 0
        masks = [m0, m1, m2, m3]
        days: list[int] = []
        for pdf in pdfs:
            pdf = pdf[pdf["ts"].notna()]
            days.extend(
                int(ts.value) // 86_400_000_000_000 for ts in pdf["ts"]
            )
        days.sort()
        rows = []
        for day in days:
            cohort, masks, off = retention_step(cohort, masks, day)
            if off is not None:
                rows.append((key[0], cohort, off))
        group_state.update((cohort, *masks))
        yield pd.DataFrame(
            rows, columns=["user_id", "cohort_day", "day_offset"]
        )

    return events.groupBy("user_id").applyInPandasWithState(
        _machine,
        outputStructType=RETENTION_OUTPUT_SCHEMA,
        stateStructType=RETENTION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )
