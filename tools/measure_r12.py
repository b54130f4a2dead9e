"""Round-12 10x measurements (sf0.01 -> sf0.1, warm best-of-3, whole
callable) for SCALE.md: the two round-11 delta cells VERDICT r11 #5
flagged as unmeasured (dd16, dd17) plus the round-12 persisted-layout
cells (dd18, dd15 bucketed rewrite, st1's reshaped drains, v8p
ANN index append). Run on a
QUIET box: PYTHONPATH=. python tools/measure_r12.py 2>/dev/null"""
import sys
import time

sys.path.insert(0, ".")

from tw_etl_spark.queries import all_queries
from tw_etl_spark.session import get_spark

NAMES = [
    "v10_ivf_recluster",
    "st12_stream_lsh_index_maintain",
    "v9_ivf_skew_audit",
    "dd19_delta_duplicate_spans",
    "st11_stream_ann_index_append",
    "v8p_ann_ivf_delta",
    "dd16_delta_embedding_neardup",
    "dd17_delta_semantic_dedup",
    "dd18_delta_dedup_persisted",
    "dd15_delta_survivor_index",
    "st1_stream_hourly_rollup",
]
spark = get_spark(app_name="measure-r12")
reg = all_queries()
for name in NAMES:
    row = {}
    for sf in ("sf0.01", "sf0.1"):
        d = f"/root/testdata/{sf}"
        fn = reg[name].spark
        fn(spark, d).toPandas()  # warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, d).toPandas()
            best = min(best, time.perf_counter() - t0)
        row[sf] = best
    print(f"{name}: sf0.01={row['sf0.01']:.2f}s sf0.1={row['sf0.1']:.2f}s "
          f"ratio={row['sf0.1']/row['sf0.01']:.1f}x", flush=True)
