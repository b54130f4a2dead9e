"""Round-13 10x measurements (sf0.01 -> sf0.1, warm best-of-3, whole
callable) for SCALE.md: the new compaction cell (dd20) plus the three
engine ANN tiers after the fan-out exchange fixes (v3/v4/v6 callables
— ids-only candidate exchanges, explicit AQE-coalesce-exempt widths).
Run on a QUIET box: PYTHONPATH=. python tools/measure_r13.py 2>/dev/null"""
import sys
import time

sys.path.insert(0, ".")

from tw_etl_spark.queries import all_queries
from tw_etl_spark.session import get_spark

NAMES = [
    "dd20_lsh_index_compaction",
    "v3_ann_lsh",
    "v4_ann_ivf",
    "v6_ann_ivfpq",
]
spark = get_spark(app_name="measure-r13")
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
    print(
        f"{name:30s} sf0.01={row['sf0.01']:7.2f}s sf0.1={row['sf0.1']:7.2f}s "
        f"growth={row['sf0.1'] / row['sf0.01']:.1f}x",
        flush=True,
    )
