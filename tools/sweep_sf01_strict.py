"""Full-registry sf0.1 sweep under the STRICT oracle harness: run every
oracle-bearing registered query Spark vs DuckDB on the sf0.1 tables
and record per-side wall times — so the COVERAGE.md sf0.1 claim is a
measured artifact, and the DuckDB replay cost of the heavy twin
oracles (dd3p's band join, dd8p's recursive CTE) stays visible as the
data scales.

Compare tiers (VERDICT r11 #2): the IN-ENGINE canonical hash runs
first — each engine reduces its own result to (row count, hash sum)
and only two scalars reach the harness, so the compare itself is
scale-free. Non-scalar schemas fall back to the pandas compare, and an
in-engine MISMATCH is re-adjudicated by the pandas compare (the
authoritative driver-mirroring tier) before a failure is declared —
the fast path can never false-fail. Each row records which tier
decided it ("compare": inengine | pandas | pandas-adjudicated).

Run: PYTHONPATH=. python tools/sweep_sf01_strict.py 2>/dev/null
Writes tools/sweep_sf01_strict.json; prints failures and the slowest
oracle replays.
"""

from __future__ import annotations

import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.oracle_utils import strict_compare
from tw_etl_spark.queries import all_queries
from tw_etl_spark.session import get_spark

SF_DIR = os.environ.get("SWEEP_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "sweep_sf01_strict.json")


def main() -> int:
    spark = get_spark(app_name="sweep-sf01-strict")
    results: dict[str, dict] = {}
    # ONLY=<comma names>: re-run a subset and merge into the existing
    # artifact (e.g. a late registration) instead of the full sweep.
    only = os.environ.get("ONLY")
    if only:
        if not os.path.exists(OUT):
            # ADVICE r11: without a prior full-sweep artifact to merge
            # into, a subset rerun would WRITE an artifact containing
            # only the subset — masquerading as a full-sweep result.
            print(
                f"ONLY={only} set but {OUT} is absent — run the full "
                "sweep first; refusing to write a subset-only artifact.",
                file=sys.stderr,
            )
            return 2
        with open(OUT) as f:
            results = json.load(f)["results"]
    failures = []
    for name, spec in all_queries().items():
        if spec.oracle is None:
            continue
        if only and name not in only.split(","):
            continue
        try:
            row = strict_compare(spark, spec, SF_DIR)
        except Exception as exc:  # noqa: BLE001 — sweep must finish
            row = {"ok": False, "err": f"{type(exc).__name__}: {exc}"[:500]}
            failures.append(name)
            traceback.print_exc(limit=2)
        results[name] = row
        status = "ok" if row.get("ok") else "FAIL"
        print(
            f"{status:4s} {name:40s} spark={row.get('spark_s', '-'):>8} "
            f"oracle={row.get('oracle_s', '-'):>8} "
            f"rows={row.get('rows', '-')} {row.get('compare', '')}",
            flush=True,
        )
    failures = [n for n, r in results.items() if not r.get("ok")]
    payload = {"sf_dir": SF_DIR, "strict": True, "results": results,
               "n": len(results), "failures": failures}
    with open(OUT, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"\n{len(results) - len(failures)}/{len(results)} strict-green at {SF_DIR}")
    if failures:
        print("FAILURES:", failures)
    slow = sorted(
        ((r.get("oracle_s") or 0, n) for n, r in results.items()), reverse=True
    )[:8]
    print("slowest oracle replays:", [(n, s) for s, n in slow])
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
