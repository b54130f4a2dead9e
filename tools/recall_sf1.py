"""sf1 ANN recall sweep (VERDICT r12 #6): the recall gates in
tests/test_similarity.py run at sf0.1's 2000x64 embeddings; re-measure
recall@10 for every ANN tier on the sf1 table (20000x64, 10x corpus)
to catch parameter collapse at scale — the round-7 pattern where the
8-plane LSH setting fell off a cliff as the corpus grew while the
4-plane/16-table setting held.

Run: PYTHONPATH=. python tools/recall_sf1.py 2>/dev/null
Writes tools/recall_sf1.json; exits 1 if any tier collapses below its
floor (floors are COLLAPSE tripwires, deliberately looser than the
sf0.1 unit's contract gates — absolute recall naturally drifts down as
the corpus densifies around each query).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tw_etl_spark.catalog import read_table
from tw_etl_spark.operators.similarity import (
    ann_ivf_topk,
    ann_ivfpq_topk,
    ann_lsh_topk,
    cosine_topk,
    cosine_topk_quantized,
)
from tw_etl_spark.session import get_spark

SF1_DIR = os.environ.get("SF1_DIR", "/root/repo/.scale/sf1")
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "recall_sf1.json")
K = 10

# (name, build_fn, collapse floor)
TIERS = [
    ("lsh_4x16", lambda v: ann_lsh_topk(v, v, k=K, num_planes=4, num_tables=16), 0.5),
    ("ivf_16_np4", lambda v: ann_ivf_topk(v, v, k=K, n_lists=16, nprobe=4), 0.3),
    ("ivf_16_np8", lambda v: ann_ivf_topk(v, v, k=K, n_lists=16, nprobe=8), 0.5),
    # 10x corpus wants sqrt-scaled lists: same probe FRACTION, smaller
    # cells — the parameter point a real deploy would move to
    ("ivf_64_np16", lambda v: ann_ivf_topk(v, v, k=K, n_lists=64, nprobe=16), 0.3),
    ("int8_rerank4", lambda v: cosine_topk_quantized(v, v, k=K, rerank_factor=4), 0.85),
    ("ivfpq_16_np4", lambda v: ann_ivfpq_topk(v, v, k=K, n_lists=16, nprobe=4), 0.25),
]


def main() -> int:
    import time

    spark = get_spark(app_name="recall-sf1")
    v = read_table(spark, SF1_DIR, "embeddings")
    n_vecs = v.count()

    t0 = time.perf_counter()
    exact_set = {
        (r.query_id, r.neighbor_id) for r in cosine_topk(v, v, k=K).collect()
    }
    exact_s = round(time.perf_counter() - t0, 1)
    assert exact_set

    rows = {}
    failures = []
    for name, fn, floor in TIERS:
        t0 = time.perf_counter()
        got = {(r.query_id, r.neighbor_id) for r in fn(v).collect()}
        recall = round(len(exact_set & got) / len(exact_set), 4)
        rows[name] = {
            "recall_at_10": recall,
            "floor": floor,
            "wall_s": round(time.perf_counter() - t0, 1),
            "ok": recall >= floor,
        }
        if recall < floor:
            failures.append(name)
        print(f"{name:16s} recall@10={recall:.4f} floor={floor} "
              f"{rows[name]['wall_s']}s", flush=True)

    art = {
        "sf_dir": SF1_DIR,
        "n_vectors": n_vecs,
        "k": K,
        "exact_truth_wall_s": exact_s,
        "tiers": rows,
        "failures": failures,
    }
    with open(OUT, "w") as fh:
        json.dump(art, fh, indent=1)
    print("WROTE", OUT, "failures:", failures, flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
