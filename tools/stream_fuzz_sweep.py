"""Wide offline sweep of the seeded stream-vs-batch equivalence fuzz
(tw_etl_spark.testing.streamgen): N scenarios, each a random corpus /
window config / arrival order, streaming(availableNow) compared exactly
against batch.  Writes tools/stream_fuzz_sweep.json.

Run: PYTHONPATH=. python tools/stream_fuzz_sweep.py [N_SEEDS]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tw_etl_spark.session import get_spark
from tw_etl_spark.testing import streamgen

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "stream_fuzz_sweep.json")


def main() -> int:
    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    spark = get_spark(app_name="stream-fuzz-sweep")
    t0 = time.perf_counter()
    failures: list[dict] = []
    kinds: dict[str, int] = {}
    for seed in range(n_seeds):
        scenario = streamgen.make_scenario(seed)
        kinds[scenario.kind] = kinds.get(scenario.kind, 0) + 1
        d = tempfile.mkdtemp(prefix=f"stream_fuzz_{seed}_")
        try:
            pdf = streamgen.gen_corpus(scenario)
            streamgen.write_replay(scenario, pdf, d)
            got, want = streamgen.run_scenario(spark, scenario, d)
            assert len(got) == len(want), f"rows {len(got)} vs {len(want)}"
            assert got.equals(want), "value mismatch"
        except Exception as exc:  # noqa: BLE001 — sweep must finish
            failures.append(
                {
                    "seed": seed,
                    "kind": scenario.kind,
                    "params": list(scenario.params),
                    "group_cols": scenario.group_cols,
                    "err": f"{type(exc).__name__}: {exc}"[:500],
                }
            )
            print(f"FAIL seed={seed} {scenario}", flush=True)
        finally:
            shutil.rmtree(d, ignore_errors=True)
        if seed and seed % 10 == 0:
            print(f"... {seed}/{n_seeds} ({len(failures)} failures)", flush=True)
    wall = round(time.perf_counter() - t0, 1)
    out = {
        "n_seeds": n_seeds,
        "kinds": kinds,
        "n_failures": len(failures),
        "failures": failures[:50],
        "wall_s": wall,
    }
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(f"{n_seeds} scenarios, {len(failures)} failures, {wall}s -> {OUT}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
