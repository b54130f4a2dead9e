"""Round-11 10x measurements (sf0.01 -> sf0.1, warm best-of-3, whole
callable) for SCALE.md. Run on a QUIET box:
PYTHONPATH=. python tools/measure_r11.py 2>/dev/null"""
import sys
import time

sys.path.insert(0, ".")

from tw_etl_spark.queries import all_queries
from tw_etl_spark.session import get_spark

NAMES = [
    "dd14_delta_dedup",
    "dd15_delta_survivor_index",
    "st10_stream_cdc_scd2_apply",
    "g2_pagerank_conserving",
    "st5_stream_neardup_dedup",
    "st9_stream_scd2_enrich",
]
spark = get_spark(app_name="measure-r11")
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
