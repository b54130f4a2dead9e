"""Cold-plan cost gate: first-execution time of EVERY registered query
in a fresh SparkSession.

Round 5's lesson (t7, then t14): Catalyst expression-tree size is a
scale axis of its own — a query can be fast warm yet stall for tens of
seconds on its first execution because one generated codegen unit is
huge. The headline bench reports best-of-N (warm) and the sf1 sweep
medians after a warmup run, so neither reddens on a cold-compile
blowup. This tool times exactly the cold path: plan build + codegen +
first execution, one fresh plan per query, in one fresh session.

At tiny SF the data cost is ~0, so the measured time IS the fixed
cold cost; the ceiling is generous (seconds, not ms) because only
pathological codegen — not normal variance — should trip it.

Run: PYTHONPATH=. python tools/cold_check.py 2>/dev/null
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.001),
     COLD_CEILING_S (default 20).
Writes tools/cold_check_results.json; exits 1 if any query exceeds the
ceiling (the pytest wrapper in tests/test_cold_compile.py reddens on
that).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tw_etl_spark.queries import all_queries
from tw_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
CEILING_S = float(os.environ.get("COLD_CEILING_S", "20"))
# Probe-normalization: wall-clock ceilings are meaningless on a box
# whose throughput halves under concurrent load (observed: the bench
# calibration probes swing 1.3-20x between quiet and loaded runs). We
# run the SAME fixed-work spark probe bench.py uses, compare it to the
# quiet-box reference value recorded across rounds (~33-54 ms in
# BENCH_r0*.json), and stretch every ceiling by the measured slowdown.
# The gate still catches what it exists for — a codegen blowup is
# 5-30x over ceiling, far past any load factor — but a loaded box can
# no longer flip a 7 s query over a 20 s bar.
REF_SPARK_PROBE_MS = float(os.environ.get("COLD_REF_PROBE_MS", "45"))
# The st* rows run REAL streaming queries to completion inside the
# callable (scratch write + N query startups + state-store init) — a
# fixed per-query-machinery cost that doubles under a loaded box, not
# a codegen-size signal. They get a higher ceiling so the gate keeps
# reddening on what it exists to catch (expression-tree blowups)
# without flapping on streaming startup variance.
STREAMING_CEILING_S = float(os.environ.get("COLD_STREAMING_CEILING_S", "60"))
# Same machinery class, batch shape: chained multi-batch pipelines that
# stage artifacts to scratch between steps (dd18: index write + two
# read->delta->append->write cycles = 8+ independent Spark jobs, each
# paying first-execution codegen; v8p/v9: k-means train + index write +
# append + read-back query, 5+ jobs). Their cold time measures
# job-launch machinery x chain length, not any one expression tree.
MACHINERY = {
    "dd18_delta_dedup_persisted",
    "v8p_ann_ivf_delta",
    "v9_ivf_skew_audit",
    "v10_ivf_recluster",
    # dd20: seed index write + two stream-writer batches (3 writes
    # each) + compaction rewrite + day-3 delta = 10+ independent jobs
    "dd20_lsh_index_compaction",
}


def _load_factor(spark) -> tuple[float, float]:
    """Measure the fixed-work spark probe (identical to bench.py's
    calibration) and return (probe_ms, ceiling multiplier >= 1)."""
    from pyspark.sql import functions as F

    probe = spark.range(0, 800_000_000, numPartitions=32).select(
        F.sum((F.col("id") % 7).cast("double")).alias("s")
    )
    probe.toPandas()  # warm-up: JIT + codegen, not part of the signal
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        probe.toPandas()
        best = min(best, time.perf_counter() - t0)
    probe_ms = best * 1000
    return round(probe_ms, 1), max(1.0, probe_ms / REF_SPARK_PROBE_MS)


def _prewarm_ml(spark) -> None:
    """Fit a trivial KMeans once so pyspark.ml's own JVM codegen/JIT
    (shared library machinery, not any query's expression tree) is warm
    before timing. dd8's first-run cost was dominated by this fit
    infrastructure — library warm-up is load noise for this gate, whose
    target is OUR plan/codegen size."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.linalg import Vectors

    tiny = spark.createDataFrame(
        [(Vectors.dense([float(i), float(i % 3)]),) for i in range(8)], ["_f"]
    )
    KMeans(k=2, seed=1, featuresCol="_f", maxIter=2).fit(tiny).transform(tiny).count()


def main() -> int:
    spark = get_spark(app_name="tw-etl-spark-cold-check")
    probe_ms, load = _load_factor(spark)
    _prewarm_ml(spark)
    results: dict[str, float] = {}
    ceilings: dict[str, float] = {}
    errors: dict[str, str] = {}
    base: dict[str, float] = {}
    for name, spec in all_queries().items():
        base[name] = (
            STREAMING_CEILING_S
            if "streaming" in spec.tags or name in MACHINERY
            else CEILING_S
        )
        t0 = time.perf_counter()
        try:
            spec.spark(spark, SF_DIR).toPandas()
        except Exception as exc:
            errors[name] = str(exc)[:200]
            continue
        results[name] = round(time.perf_counter() - t0, 3)
    # the probe was measured ONCE before a ~6 min loop; if box load
    # rose mid-loop, ceilings computed from the stale factor flap on
    # queries sitting a few % under their bar. Re-probe at the end and
    # stretch by the WORST of the two measurements — a codegen blowup
    # (the gate's actual target) is 5-30x over ceiling and unaffected.
    probe2_ms, load2 = _load_factor(spark)
    probe_ms = max(probe_ms, probe2_ms)
    load = max(load, load2)
    for name in base:
        ceilings[name] = base[name] * load

    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "cold_check_results.json"
    )
    with open(out, "w") as fh:
        json.dump(
            {
                "sf_dir": SF_DIR,
                "ceiling_s": CEILING_S,
                "streaming_ceiling_s": STREAMING_CEILING_S,
                "spark_probe_ms": probe_ms,
                "ref_probe_ms": REF_SPARK_PROBE_MS,
                "load_factor": round(load, 2),
                "cold_s": results,
                "errors": errors,
            },
            fh,
            indent=1,
            sort_keys=True,
        )

    over = {n: s for n, s in results.items() if s > ceilings[n]}
    print(f"probe {probe_ms:.1f} ms vs ref {REF_SPARK_PROBE_MS:.0f} -> load x{load:.2f}")
    for n, s in sorted(results.items(), key=lambda kv: -kv[1])[:10]:
        print(f"{n:40s} {s:7.2f} s{'  <-- OVER CEILING' if s > ceilings[n] else ''}")
    print(
        f"\n{len(results)} queries, {len(errors)} errors, {len(over)} over"
        f" {CEILING_S * load:.0f}s (base {CEILING_S:.0f}s x load {load:.2f})"
    )
    if errors:
        for n, e in errors.items():
            print(f"ERROR {n}: {e}")
    return 1 if (over or errors) else 0


if __name__ == "__main__":
    sys.exit(main())
