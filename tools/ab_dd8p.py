"""dd8p A/B: the module's current kmeans_dists_expr (AB_MODE=new; after
the r15 fix this is the hybrid — per-centroid trees with parsed-literal
centroids) vs the round-13 per-centroid/per-element form (AB_MODE=old)
— VERDICT r14 #1 ("exonerate or revert"). Fresh JVM per invocation, driver heavy-tier protocol (bench
session conf, 1 warm full-callable pass, best-of-N rebuild+execute),
fixed-work numpy probe before and after the timed runs so the reading
is load-attributable.

Usage: AB_MODE=old|new [AB_SF_DIR=...] [AB_RUNS=3] \
           PYTHONPATH=. python tools/ab_dd8p.py 2>/dev/null
Prints one JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Column
from pyspark.sql import functions as F


def _probe_ms() -> float:
    import numpy as np

    rng = np.random.default_rng(0)
    a = rng.random((1024, 1024))
    b = rng.random((1024, 1024))
    a @ b
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        a @ b
        best = min(best, time.perf_counter() - t0)
    return round(best * 1000, 1)


def kmeans_dists_expr_r13(cents: list[list[float]], u_col="u") -> Column:
    """The pre-round-14 form: k sibling zip_with/aggregate trees with
    per-element literals (verbatim from commit 292f5f1~1)."""
    u = F.col(u_col) if isinstance(u_col, str) else u_col
    return F.array(
        *[
            F.aggregate(
                F.zip_with(
                    u,
                    F.array(*[F.lit(float(x)) for x in c]),
                    lambda x, y: (x - y) * (x - y),
                ),
                F.lit(0.0),
                lambda acc, t: acc + t,
            )
            for c in cents
        ]
    )


def _jvm_cpu_s() -> float:
    """Cumulative CPU seconds of every java child of this process —
    steal-independent work metric: host CPU steal stretches walls but
    not consumed cycles, so old-vs-new CPU deltas stay comparable on a
    stolen box (r14's measurement failure mode)."""
    import glob

    me = os.getpid()
    total = 0.0
    hz = os.sysconf("SC_CLK_TCK")
    for stat in glob.glob("/proc/[0-9]*/stat"):
        try:
            parts = open(stat).read().rsplit(") ", 1)
            name = parts[0].split(" (", 1)[1]
            fields = parts[1].split()
            ppid = int(fields[1])
            if ppid == me and "java" in name:
                total += (int(fields[11]) + int(fields[12])) / hz
        except (OSError, IndexError, ValueError):
            continue
    return total


def main() -> None:
    mode = os.environ["AB_MODE"]
    sf_dir = os.environ.get("AB_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("AB_RUNS", "3"))

    import tw_etl_spark.operators.dedup as dedup_mod

    if mode == "old":
        dedup_mod.kmeans_dists_expr = kmeans_dists_expr_r13

    from tw_etl_spark.queries import all_queries
    from tw_etl_spark.session import get_spark

    spark = get_spark(
        app_name=f"ab-dd8p-{mode}",
        extra_conf={
            "spark.sql.shuffle.partitions": "16",
            "spark.sql.adaptive.enabled": "false",
        },
    )
    fn = all_queries()["dd8p_semantic_dedup_relational"].spark
    probe_before = _probe_ms()
    t0 = time.perf_counter()
    rows = fn(spark, sf_dir).toPandas()  # warm pass
    warm_s = time.perf_counter() - t0
    samples = []
    cpu_samples = []
    for _ in range(runs):
        c0 = _jvm_cpu_s()
        t0 = time.perf_counter()
        fn(spark, sf_dir).toPandas()
        samples.append(round(time.perf_counter() - t0, 3))
        cpu_samples.append(round(_jvm_cpu_s() - c0, 2))
    probe_after = _probe_ms()
    print(
        json.dumps(
            {
                "mode": mode,
                "sf_dir": sf_dir,
                "warm_s": round(warm_s, 3),
                "samples_s": samples,
                "best_s": min(samples),
                "cpu_samples_s": cpu_samples,
                "cpu_best_s": min(cpu_samples) if cpu_samples else None,
                "n_rows": len(rows),
                "probe_before_ms": probe_before,
                "probe_after_ms": probe_after,
            }
        )
    )


if __name__ == "__main__":
    main()
