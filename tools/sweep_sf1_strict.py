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

from tests.oracle_utils import strict_compare
from tw_etl_spark.queries import DRIVER_WINDOW, all_queries
from tw_etl_spark.session import get_spark

SF_DIR = os.environ.get("SF1_DIR", "/root/repo/.scale/sf1")
OUT = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "sweep_sf1_strict.json"
)

# Oracle replays INFEASIBLE at sf1 on this box would be recorded here
# as explicit skips. Round 12 emptied the set: x1's oracle now uses a
# prefix-filtered (PPJoin) candidate join instead of the quadratic
# shared-token self-join that used to exhaust the disk (VERDICT r11
# #3), and the in-engine hash compare removed the harness-side collect
# that needed maxResultSize=8g for dd3p (VERDICT r11 #2).
ORACLE_INFEASIBLE_SF1: dict[str, str] = {}

# Beyond-the-window sf1 rows (VERDICT r13 #5): the scale-sensitive
# dedup/text families where a round-9-class divergence (rounding,
# overflow, engine-format drift) would hide below sf1, plus every
# round-14 rotated-OUT query — rotation must never shrink the sf1
# evidence for a family that already had it.
SF1_EXTRAS: tuple[str, ...] = (
    # scale-sensitive families never sf1-swept before
    "dd2_jaccard_neardup_pairs",
    "dd4p_simhash_portable",
    "dd5_embedding_neardup_pairs",
    "dd6_neardup_components",
    "dd7_neardup_survivors",
    "t13_lm_perplexity",
    "t14_top_bigram_fraction",
    "x5_benchmark_decontaminate",
    # round-14 rotated-out window members (keep their sf1 coverage)
    "q1_pricing_summary",
    "q3_topk_revenue",
    "e3_sessionization",
    "d2_exact_dedup",
    "v1_cosine_top_pairs",
    "dd13_video_fingerprint_neardup",
    "dd14_delta_dedup",
    "dd15_delta_survivor_index",
    "dd17_delta_semantic_dedup",
    "v7p_ann_ivf_persisted",
    "st3_watermark_late_drop",
    "st12_stream_lsh_index_maintain",
    "x11_bloom_decontaminate",
    "x14_importance_resample",
    "t8_tfidf_top_terms",
    # round-15 rotated-out window member (keeps its sf1 coverage)
    "v12_retrieval_eval",
)


def main() -> int:
    spark = get_spark(app_name="sweep-sf1-strict")
    reg = all_queries()
    results: dict[str, dict] = {}
    # ONLY=<comma names>: re-run a subset and merge into the existing
    # artifact (e.g. after fixing one query) instead of repeating the
    # ~1 h full sweep.
    only = os.environ.get("ONLY")
    names = (
        only.split(",")
        if only
        else list(DRIVER_WINDOW) + [n for n in SF1_EXTRAS if n not in DRIVER_WINDOW]
    )
    if only:
        # refuse a subset run with no prior artifact: merging into
        # nothing would write a subset-only file that masquerades as a
        # full-sweep result (same guard as sweep_sf01_strict)
        if not os.path.exists(OUT):
            raise SystemExit(
                f"ONLY={only} set but {OUT} is absent — run the full "
                "sweep first; a subset rerun must merge, not replace"
            )
        with open(OUT) as f:
            results = json.load(f)["results"]
    failures = []
    for name in names:
        spec = reg[name]
        try:
            if name in ORACLE_INFEASIBLE_SF1:
                t0 = time.perf_counter()
                n = spec.spark(spark, SF_DIR).count()
                row = {
                    "ok": None,
                    "rows": n,
                    "spark_s": round(time.perf_counter() - t0, 3),
                    "skipped_oracle": ORACLE_INFEASIBLE_SF1[name],
                }
            else:
                row = strict_compare(spark, spec, SF_DIR)
        except Exception as exc:  # noqa: BLE001 — sweep must finish
            row = {"ok": False, "err": f"{type(exc).__name__}: {exc}"[:500]}
            failures.append(name)
            traceback.print_exc(limit=2)
        results[name] = row
        status = (
            "ok" if row.get("ok")
            else ("skip" if row.get("ok") is None else "FAIL")
        )
        print(
            f"{status:4s} {name:40s} spark={row.get('spark_s', '-'):>8} "
            f"oracle={row.get('oracle_s', '-'):>8} "
            f"rows={row.get('rows', '-')} {row.get('compare', '')}",
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
