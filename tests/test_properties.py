"""Property-based tests (hypothesis) for the pure-python cores:
the R19 transition function and the IVF/quantization numpy kernels."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from tw_etl_spark.streaming.state_machine import (
    CONTINUE,
    DEDUP_SKIP,
    EXHAUSTED_COMPLETE,
    RETRY,
    START,
    STOP_EMPTY_POLL,
    RetryState,
    apply_events,
    step,
)

events_strategy = st.lists(
    st.fixed_dictionaries(
        {
            "event": st.sampled_from(["online", "download_done", "noise"]),
            "size": st.integers(min_value=-1, max_value=10),
            "poll_attempt": st.booleans(),
            "retries": st.integers(min_value=1, max_value=5),
        }
    ),
    max_size=40,
)


@given(events_strategy)
@settings(max_examples=300, deadline=None)
def test_machine_invariants(events):
    state = RetryState()
    for ev in events:
        prev = state
        state, action = step(state, ev)
        # retry_id never exceeds the retry budget
        assert state.retry_id <= state.retries
        # active implies a started attempt
        if state.active:
            assert state.retry_id >= 1
        # terminal actions always deactivate
        if action in (STOP_EMPTY_POLL, EXHAUSTED_COMPLETE):
            assert not state.active
        # a start activates with retry 1
        if action == START:
            assert state.active and state.retry_id == 1
        # retries/continues strictly advance the attempt counter
        if action in (RETRY, CONTINUE):
            assert state.retry_id == prev.retry_id + 1
        # skips never mutate state
        if action == DEDUP_SKIP:
            assert state == prev


@given(events_strategy)
@settings(max_examples=100, deadline=None)
def test_apply_events_matches_fold(events):
    st1, actions = apply_events(RetryState(), events)
    st2 = RetryState()
    acc = []
    for ev in events:
        st2, a = step(st2, ev)
        acc.append(a)
    assert st1 == st2 and actions == acc


@given(
    st.integers(min_value=1, max_value=6),  # retries
    st.booleans(),  # poll
)
@settings(max_examples=50, deadline=None)
def test_exhaustion_is_reachable_and_bounded(retries, poll):
    """Pushing empty downloads at an active push-attempt key exhausts it
    after exactly `retries` attempts; poll attempts stop immediately."""
    state, action = step(RetryState(), {"event": "online", "poll_attempt": poll, "retries": retries})
    assert action == START
    n = 0
    while state.active:
        state, action = step(state, {"event": "download_done", "size": 0})
        n += 1
        assert n <= retries  # bounded
    if poll:
        assert action == STOP_EMPTY_POLL and n == 1
    else:
        assert action == EXHAUSTED_COMPLETE and n == retries
