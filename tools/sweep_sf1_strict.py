"""Driver-window sf1 sweep under the STRICT oracle harness (VERDICT
r10 #7): every DRIVER_WINDOW query runs Spark vs DuckDB on the
generated sf1 tables (tools/make_sf1.py) through the exact harness the
sf0.1 sweep uses — exact stringified values, dtype-kind schema gate —
so scale-sensitive divergence (the round-9 rounding-bug class) is
caught one decade above the driver's own gate.

Run: PYTHONPATH=. python tools/sweep_sf1_strict.py 2>/dev/null
Writes tools/sweep_sf1_strict.json; prints failures and the slowest
oracle replays.
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.oracle_utils import assert_frames_match, run_oracle
from tw_etl_spark.queries import DRIVER_WINDOW, all_queries
from tw_etl_spark.session import get_spark

SF_DIR = os.environ.get("SF1_DIR", "/root/repo/.scale/sf1")
OUT = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "sweep_sf1_strict.json"
)

# Oracle replays that are INFEASIBLE at sf1 on this box — the DuckDB
# side, not the Spark side. Recorded as an explicit skip with the
# Spark wall time (the query still runs end to end), never as a green
# row. The sf0.1 strict sweep remains the full-oracle gate for these.
ORACLE_INFEASIBLE_SF1 = {
    "x1_training_data_pipeline": (
        "DuckDB replay contains the quadratic exact-Jaccard "
        "shared-token self-join (the dd2/x1/x2 family COVERAGE.md "
        "documents at ~93 s for sf0.1); at sf1 it spilled past the "
        "box's 79 GB free disk and aborted (IOException: No space "
        "left on device). Spark side completes in ~9 s; x1 stays "
        "strict-green at sf0.001/0.01/0.1."
    ),
}


def main() -> int:
    # the strict compare COLLECTS both sides; dd3p's sf1 pair set alone
    # serializes past the default 1g maxResultSize — a harness collect
    # limit (the pairs are produced distributed; they only materialize
    # here for the cross-engine diff), not a plan signal
    spark = get_spark(
        app_name="sweep-sf1-strict",
        extra_conf={"spark.driver.maxResultSize": "8g"},
    )
    reg = all_queries()
    results: dict[str, dict] = {}
    # ONLY=<comma names>: re-run a subset and merge into the existing
    # artifact (e.g. after fixing one query) instead of repeating the
    # ~1 h full sweep.
    only = os.environ.get("ONLY")
    names = only.split(",") if only else list(DRIVER_WINDOW)
    if only and os.path.exists(OUT):
        with open(OUT) as f:
            results = json.load(f)["results"]
    failures = []
    for name in names:
        spec = reg[name]
        row: dict = {}
        try:
            t0 = time.perf_counter()
            spark_pdf = spec.spark(spark, SF_DIR).toPandas()
            row["spark_s"] = round(time.perf_counter() - t0, 3)
            row["rows"] = len(spark_pdf)
            if name in ORACLE_INFEASIBLE_SF1:
                row["ok"] = None
                row["skipped_oracle"] = ORACLE_INFEASIBLE_SF1[name]
            else:
                t0 = time.perf_counter()
                oracle_pdf = run_oracle(spec.oracle, SF_DIR)
                row["oracle_s"] = round(time.perf_counter() - t0, 3)
                assert_frames_match(spark_pdf, oracle_pdf, name)
                row["ok"] = True
        except Exception as exc:  # noqa: BLE001 — sweep must finish
            row["ok"] = False
            row["err"] = f"{type(exc).__name__}: {exc}"[:500]
            failures.append(name)
            traceback.print_exc(limit=2)
        results[name] = row
        status = (
            "ok" if row.get("ok")
            else ("skip" if row.get("ok") is None else "FAIL")
        )
        print(
            f"{status:4s} {name:40s} spark={row.get('spark_s', '-'):>8} "
            f"oracle={row.get('oracle_s', '-'):>8} rows={row.get('rows', '-')}",
            flush=True,
        )
    failures = [n for n, r in results.items() if r.get("ok") is False]
    skipped = {
        n: r["skipped_oracle"]
        for n, r in results.items()
        if r.get("ok") is None
    }
    payload = {"sf_dir": SF_DIR, "strict": True, "window_only": True,
               "results": results, "n": len(results), "failures": failures,
               "oracle_skipped": skipped}
    with open(OUT, "w") as f:
        json.dump(payload, f, indent=1)
    n_ok = sum(1 for r in results.values() if r.get("ok"))
    print(
        f"\n{n_ok} strict-green + {len(skipped)} oracle-infeasible-skip "
        f"+ {len(failures)} FAIL / {len(results)} at {SF_DIR}"
    )
    if skipped:
        print("ORACLE SKIPPED (Spark side ran; reason recorded):",
              list(skipped))
    if failures:
        print("FAILURES:", failures)
    slow = sorted(
        ((r.get("oracle_s") or 0, n) for n, r in results.items()), reverse=True
    )[:8]
    print("slowest oracle replays:", [(n, s) for s, n in slow])
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
