"""Dump .explain('formatted') for a list of queries to plans/r15/.

Usage: PYTHONPATH=. python tools/plan_dump.py <suffix> [name ...]
Writes plans/r15/<name>_<suffix>.txt. Default name list = the round-14
optimization candidate set."""
import sys
import io

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
    "t19_bm25_multiquery", "dd3p_minhash_lsh_portable", "dd8p_semantic_dedup_relational",
    "dd10_span_dedup_rewrite", "t17_bpe_encode", "g1_pagerank_purchase_graph",
]

suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
names = sys.argv[2:] or DEFAULT
sf_dir = "/root/testdata/sf0.1"
spark = get_spark(app_name="plan-dump")
reg = all_queries()
for name in names:
    try:
        df = reg[name].spark(spark, sf_dir)
        buf = io.StringIO()
        _stdout = sys.stdout
        sys.stdout = buf
        df.explain("formatted")
        sys.stdout = _stdout
        with open(f"plans/r15/{name}_{suffix}.txt", "w") as f:
            f.write(buf.getvalue())
        print("dumped", name, flush=True)
    except Exception as e:
        print("ERR", name, repr(e)[:200], flush=True)
