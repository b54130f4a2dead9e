"""Seeded stream-vs-batch equivalence fuzzing
(tw_etl_spark/testing/streamgen.py): random corpora (session-structured
bursts, duplicates, integer values), random window configs
(tumbling/sliding/session, non-round durations, random grouping), and
random out-of-order arrival (shuffled files, pinned mtimes, small
maxFilesPerTrigger).  With the watermark beyond the corpus span the
streaming result must equal the batch result EXACTLY — integer sums
mean no tolerance is needed, so any diff is a real state-management or
window-assignment bug.

CI pins a small seed range (streaming queries cost seconds each);
tools/stream_fuzz_sweep.py runs the wider offline sweep.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest

from tw_etl_spark.testing import streamgen

# explicit list (not a range): seeds 0-5 happen to draw mostly session
# scenarios, so 9 and 11 are included to cover sliding and tumbling
CI_SEEDS = [0, 1, 2, 3, 9, 11]


@pytest.mark.parametrize("seed", CI_SEEDS)
def test_stream_equals_batch_fuzz(spark, seed):
    scenario = streamgen.make_scenario(seed)
    pdf = streamgen.gen_corpus(scenario)
    d = tempfile.mkdtemp(prefix=f"stream_fuzz_{seed}_")
    try:
        streamgen.write_replay(scenario, pdf, d)
        got, want = streamgen.run_scenario(spark, scenario, d)
        assert got.columns.tolist() == want.columns.tolist(), scenario
        assert len(got) == len(want), (scenario, len(got), len(want))
        assert got.equals(want), (
            f"{scenario}: stream != batch\n"
            f"stream:\n{got.head(10)}\nbatch:\n{want.head(10)}"
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


# one seed per window kind (session / sliding / tumbling)
RESTART_SEEDS = [0, 1, 11]


@pytest.mark.parametrize("seed", RESTART_SEEDS)
def test_restart_from_checkpoint_converges_to_batch(spark, seed):
    """Kill-and-resume equivalence: run half the corpus, restart from
    the checkpoint with the rest revealed, and require the update-mode
    state to converge to the batch aggregate exactly.  Catches both
    reprocessing (phase-A rows double-counted after restart) and state
    loss (phase-A-only windows missing)."""
    scenario = streamgen.make_scenario(seed)
    d = tempfile.mkdtemp(prefix=f"stream_restart_{seed}_")
    try:
        got, want = streamgen.run_scenario_restart(spark, scenario, d)
        assert got == want, (
            f"{scenario}: restart state diverges from batch "
            f"({len(got)} vs {len(want)} keys)"
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


# tumbling/sliding only: session boundaries are data-dependent, so a
# dropped row can split a session into windows that legitimately don't
# exist in batch
LATEDROP_SEEDS = [1, 9, 11]


@pytest.mark.parametrize("seed", LATEDROP_SEEDS)
def test_watermark_latedrop_containment(spark, seed):
    """With a tight watermark and shuffled arrival, finalized append-
    mode windows must be CONTAINED in the batch result: no duplicate
    emissions, no invented windows, and subset-consistent aggregates
    (count/sum never exceed batch, min/max within batch bounds)."""
    scenario = streamgen.make_scenario(seed)
    assert scenario.kind in ("tumbling", "sliding")
    pdf = streamgen.gen_corpus(scenario)
    d = tempfile.mkdtemp(prefix=f"stream_late_{seed}_")
    try:
        streamgen.write_replay(scenario, pdf, d)
        got, want = streamgen.run_scenario_latedrop(spark, scenario, d, "10 minutes")
        # non-vacuity: the pinned seeds finalize thousands of windows
        # (and fewer than batch — drops + unfinalized tail windows)
        assert 0 < len(got) <= len(want), (len(got), len(want))
        keys = [c for c in ["win_start", "win_end"] + scenario.group_cols if c in want.columns]
        gk = got.set_index(keys)
        wk = want.set_index(keys)
        assert gk.index.is_unique, "duplicate finalized window emission"
        missing = gk.index.difference(wk.index)
        assert missing.empty, f"windows emitted that batch doesn't have: {missing[:5]}"
        joined = gk.join(wk, lsuffix="_s", rsuffix="_b")
        for a in scenario.agg_names:
            s, b = joined[f"{a}_s"], joined[f"{a}_b"]
            if a in ("n", "sv"):
                assert (s <= b).all(), f"{a}: stream exceeds batch"
                assert (s > 0).all() if a == "n" else True
            elif a == "mn":
                assert (s >= b).all(), "min below batch min"
            elif a == "mx":
                assert (s <= b).all(), "max above batch max"
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_scenarios_cover_all_kinds():
    kinds = {streamgen.make_scenario(s).kind for s in CI_SEEDS}
    assert kinds == {"tumbling", "sliding", "session"}, kinds


def test_corpus_is_deterministic():
    s = streamgen.make_scenario(3)
    a, b = streamgen.gen_corpus(s), streamgen.gen_corpus(s)
    assert a.equals(b)
