"""Deep corpus-level dedup fuzz sweep: N seeded generated corpora +
parameter draws (tw_etl_spark.testing.dedupgen) run through the Spark
operator AND the parameterized DuckDB template, strict-compared.

CI pins seeds 0..23 in tests/test_differential_fuzz.py; this tool is
the deeper offline sweep run before a round's close.  Writes
tools/dedup_fuzz_sweep.json.

Run: PYTHONPATH=. python tools/dedup_fuzz_sweep.py [N_SEEDS]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.oracle_utils import assert_frames_match
from tw_etl_spark.session import get_spark
from tw_etl_spark.testing import dedupgen

OUT = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "dedup_fuzz_sweep.json"
)


def main() -> int:
    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    spark = get_spark(app_name="dedup-fuzz-sweep")
    t0 = time.perf_counter()
    failures: list[dict] = []
    kinds: dict[str, int] = {}
    for seed in range(n_seeds):
        case = dedupgen.generate(seed)
        kinds[case.kind] = kinds.get(case.kind, 0) + 1
        try:
            oracle_pdf = dedupgen.run_duckdb(case)
            spark_pdf = dedupgen.run_spark(spark, case).toPandas()
            assert_frames_match(
                spark_pdf, oracle_pdf, f"dedup-seed{seed}:{case.kind}"
            )
        except Exception as exc:  # noqa: BLE001 — sweep must finish
            failures.append(
                {
                    "seed": seed,
                    "kind": case.kind,
                    "params": case.params,
                    "err": f"{type(exc).__name__}: {exc}"[:800],
                }
            )
        if (seed + 1) % 25 == 0:
            print(
                f"{seed + 1}/{n_seeds} ({len(failures)} failures)",
                flush=True,
            )
    wall = time.perf_counter() - t0
    out = {
        "n_seeds": n_seeds,
        "kinds": kinds,
        "n_failures": len(failures),
        "failures": failures[:20],
        "wall_s": round(wall, 1),
    }
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "failures"}))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
