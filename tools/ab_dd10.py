"""dd10 A/B: the round-14 localCheckpoint of the span explode vs no
checkpoint (the pre-r14 double-explode shape) — VERDICT r14 #1 ("dd10
must beat its own pre-fix sf1 ratio, else revert the checkpoint").
Fresh JVM per invocation, heavy-tier protocol, fixed-work probes and a
steal-independent JVM CPU metric.

Usage: AB_MODE=ckpt|nockpt [AB_SF_DIR=...] [AB_RUNS=3] \
           PYTHONPATH=. python tools/ab_dd10.py 2>/dev/null
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.ab_dd8p import _jvm_cpu_s, _probe_ms  # noqa: E402


def main() -> None:
    mode = os.environ["AB_MODE"]
    sf_dir = os.environ.get("AB_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("AB_RUNS", "3"))

    if mode == "nockpt":
        from pyspark.sql import DataFrame

        DataFrame.localCheckpoint = lambda self, eager=True: self

    from tw_etl_spark.queries import all_queries
    from tw_etl_spark.session import get_spark

    spark = get_spark(
        app_name=f"ab-dd10-{mode}",
        extra_conf={
            "spark.sql.shuffle.partitions": "16",
            "spark.sql.adaptive.enabled": "false",
        },
    )
    fn = all_queries()["dd10_span_dedup_rewrite"].spark
    probe_before = _probe_ms()
    t0 = time.perf_counter()
    rows = fn(spark, sf_dir).toPandas()
    warm_s = time.perf_counter() - t0
    samples, cpu_samples = [], []
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
                "cpu_best_s": min(cpu_samples),
                "n_rows": len(rows),
                "probe_before_ms": probe_before,
                "probe_after_ms": probe_after,
            }
        )
    )


if __name__ == "__main__":
    main()
