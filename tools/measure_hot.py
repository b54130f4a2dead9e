"""Round-14 optimization round: warm per-query timings for the
compute-dominated candidate set at sf0.1 (bench.py session config:
shuffle.partitions=16, AQE off), 1 warm pass + best/median of 3, with
per-query job counts for floor attribution.

Usage: PYTHONPATH=. python tools/measure_hot.py [name ...] 2>/dev/null
Run on a QUIET box; compare best-of-3 across code versions.
"""
import json
import statistics
import sys
import time

sys.path.insert(0, ".")

from tw_etl_spark.queries import all_queries
from tw_etl_spark.session import get_spark

DEFAULT = [
    "v3p_ann_lsh_portable", "v4p_ann_ivf_portable", "v5p_knn_quantized_portable",
    "v6p_ann_ivfpq_portable", "x13_quantile_quality_gate", "x11_bloom_decontaminate",
    "dd4p_simhash_portable", "u3_grouped_map_zscore", "t15_quality_classifier",
    "dd2_jaccard_neardup_pairs", "dd9_duplicate_spans", "dd14_delta_dedup",
    "dd15_delta_survivor_index", "dd17_delta_semantic_dedup", "w20_window_gauntlet",
    "t11_gopher_quality", "t8_tfidf_top_terms", "a12_kmv_set_algebra",
    "a13_histogram_quantiles", "a40_agg_stats", "x10_scd2_merge",
    "f20_datetime_case_math", "x2_leakage_aware_split", "v13_retrieval_tiers_eval",
    "t19_bm25_multiquery", "x12_dsir_weights", "x5_benchmark_decontaminate",
    "t13_lm_perplexity", "t14_top_bigram_fraction", "dd16_delta_embedding_neardup",
]

names = sys.argv[1:] or DEFAULT
sf_dir = "/root/testdata/sf0.1"
spark = get_spark(
    app_name="measure-hot",
    extra_conf={
        "spark.sql.shuffle.partitions": "16",
        "spark.sql.adaptive.enabled": "false",
    },
)
sc = spark.sparkContext
reg = all_queries()
out = {}
for name in names:
    if name not in reg:
        print(json.dumps({"name": name, "err": "unknown"}), flush=True)
        continue
    fn = reg[name].spark
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    build_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    df.toPandas()
    cold_s = time.perf_counter() - t0
    group = f"hot-{name}"
    sc.setJobGroup(group, group)
    df.toPandas()
    n_jobs = len(sc.statusTracker().getJobIdsForGroup(group))
    sc.setJobGroup(None, None)
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        df.toPandas()
        samples.append(time.perf_counter() - t0)
    row = {
        "build_s": round(build_s, 3),
        "cold_s": round(cold_s, 3),
        "warm_best_s": round(min(samples), 3),
        "warm_median_s": round(statistics.median(samples), 3),
        "n_jobs": n_jobs,
    }
    out[name] = row
    print(json.dumps({"name": name, **row}), flush=True)
print(json.dumps({"total_warm_best_s": round(sum(r["warm_best_s"] for r in out.values()), 3)}))
