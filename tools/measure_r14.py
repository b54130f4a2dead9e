"""Round-14 10x measurements (sf0.01 -> sf0.1, warm best-of-3, whole
callable) for SCALE.md: the two new retrieval cells (t19 batch BM25,
v13 three-tier eval) plus the rewritten LSH pipelines (dd3p grouped
pairs, dd14 grouped delta) so their sf0.01->sf0.1 growth rows replace
the pre-rewrite ones. (The sf1 evidence for the rewrites is the
heavy-tier artifact tools/heavy_sf1.json, measured separately by
tools/heavy_sf1_bench.py.)
Run on a QUIET box: PYTHONPATH=. python tools/measure_r14.py 2>/dev/null"""
import sys
import time

sys.path.insert(0, ".")

from tw_etl_spark.queries import all_queries
from tw_etl_spark.session import get_spark

NAMES = [
    "t19_bm25_multiquery",
    "v13_retrieval_tiers_eval",
    "dd3p_minhash_lsh_portable",
    "dd14_delta_dedup",
]
spark = get_spark(app_name="measure-r14")
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
