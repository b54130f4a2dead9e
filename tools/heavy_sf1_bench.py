"""Heavy-tier sf1 bench (VERDICT r13 #2): the compute-dominated
queries measured Spark vs DuckDB at sf1 by ONE protocol — median of
HEAVY_SF1_ROUNDS strict-harness runs (each run executes BOTH engines
through tests.oracle_utils.strict_compare, so the timings come with a
hash-verified correctness bit attached), on a quiet box.

Also emits the dd20 DECOMPOSITION the r13 verdict asked for: the
lifecycle fixture (seed write + two stream batches + day-3 delta)
timed separately from the compaction FOLD itself, plus a WRITE-PARITY
DuckDB fold baseline (DuckDB reads the same live index dirs and writes
the same band-partitioned parquet via COPY ... PARTITION_BY) — the
r13 ratio compared Spark parquet writes against a write-free SQL
replay, which is the asymmetry this row removes.

Run: PYTHONPATH=. python tools/heavy_sf1_bench.py 2>/dev/null
Writes tools/heavy_sf1.json.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.oracle_utils import strict_compare
from tw_etl_spark.queries import all_queries
from tw_etl_spark.session import get_spark

SF1_DIR = os.environ.get("SF1_DIR", "/root/repo/.scale/sf1")
ROUNDS = int(os.environ.get("HEAVY_SF1_ROUNDS", "3"))
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "heavy_sf1.json")

HEAVY = [
    "dd3p_minhash_lsh_portable",
    "dd8p_semantic_dedup_relational",
    "g1_pagerank_purchase_graph",
    "dd10_span_dedup_rewrite",
    "t17_bpe_encode",
    "dd20_lsh_index_compaction",
]
# Optional subset (comma-separated names) for targeted re-measurement;
# subset runs write to heavy_sf1_partial.json so the canonical
# whole-list artifact is never clobbered with missing rows.
if os.environ.get("HEAVY_SF1_QUERIES"):
    HEAVY = [q for q in os.environ["HEAVY_SF1_QUERIES"].split(",") if q]
    OUT = OUT.replace("heavy_sf1.json", "heavy_sf1_partial.json")


def dd20_decomposition(spark) -> dict:
    """Time dd20's lifecycle stages separately, and the fold with a
    write-parity DuckDB baseline."""
    from pyspark.sql import functions as F

    from tw_etl_spark.catalog import read_table
    from tw_etl_spark.operators.dedup import (
        compact_banded_index,
        lsh_delta_pairs_prebanded,
        minhash_signatures_portable,
        read_banded_index,
        write_banded_index,
    )
    from tw_etl_spark.streaming.sinks import lsh_index_stream_writer

    d = read_table(spark, SF1_DIR, "documents")
    root = "/tmp/heavy_sf1_dd20"
    shutil.rmtree(root, ignore_errors=True)
    live = os.path.join(root, "live")

    t0 = time.perf_counter()
    write_banded_index(
        minhash_signatures_portable(
            d.filter(F.col("doc_id") % 4 == 0), num_hashes=16
        ),
        live,
        num_hashes=16,
        bands=4,
    )
    t1 = time.perf_counter()
    writer = lsh_index_stream_writer(
        spark, live, num_hashes=16, bands=4, threshold=0.9
    )
    for day in (1, 2):
        writer(
            d.filter(F.col("doc_id") % 4 == day).select("doc_id", "text"),
            day - 1,
        )
    t2 = time.perf_counter()

    # the FOLD, best of ROUNDS (fresh out dir each time — the fold
    # overwrites, so repeat runs are honest rewrites of the same data)
    fold_s = []
    for i in range(ROUNDS):
        comp = os.path.join(root, f"compacted{i}")
        f0 = time.perf_counter()
        compact_banded_index(spark, live, comp)
        fold_s.append(time.perf_counter() - f0)
    comp = os.path.join(root, "compacted0")

    t3 = time.perf_counter()
    banded, sigs = read_banded_index(spark, comp)
    pairs, _s, _b = lsh_delta_pairs_prebanded(
        d.filter(F.col("doc_id") % 4 == 3),
        banded,
        sigs,
        num_hashes=16,
        bands=4,
        threshold=0.9,
    )
    n_pairs = pairs.count()
    t4 = time.perf_counter()

    # write-parity DuckDB fold: read the SAME live dirs, write the
    # same compacted layout (banded partitioned by band + sigs)
    import duckdb

    duck_fold_s = []
    for i in range(ROUNDS):
        dout = os.path.join(root, f"duck_compacted{i}")
        os.makedirs(dout, exist_ok=True)
        con = duckdb.connect()
        f0 = time.perf_counter()
        con.execute(
            f"""
            COPY (
              SELECT doc, bucket, band
              FROM read_parquet('{live}/banded/*/*.parquet',
                                hive_partitioning=1)
              UNION ALL
              SELECT doc, bucket, band
              FROM read_parquet('{live}/stream_banded/*/*/*.parquet',
                                hive_partitioning=1)
            ) TO '{dout}/banded' (FORMAT PARQUET, PARTITION_BY (band),
                                  OVERWRITE_OR_IGNORE 1)
            """
        )
        con.execute(
            f"""
            COPY (
              SELECT doc_id, signature
              FROM read_parquet('{live}/sigs/*.parquet')
              UNION ALL
              SELECT doc_id, signature
              FROM read_parquet('{live}/stream_sigs/*/*.parquet',
                                hive_partitioning=1)
            ) TO '{dout}/sigs' (FORMAT PARQUET, OVERWRITE_OR_IGNORE 1)
            """
        )
        duck_fold_s.append(time.perf_counter() - f0)
        con.close()

    shutil.rmtree(root, ignore_errors=True)
    return {
        "seed_write_s": round(t1 - t0, 2),
        "two_stream_batches_s": round(t2 - t1, 2),
        "fold_spark_s": [round(x, 3) for x in fold_s],
        "fold_spark_best_s": round(min(fold_s), 3),
        "fold_duckdb_write_parity_s": [round(x, 3) for x in duck_fold_s],
        "fold_duckdb_best_s": round(min(duck_fold_s), 3),
        "day3_delta_s": round(t4 - t3, 2),
        "day3_pairs": n_pairs,
    }


def main() -> None:
    spark = get_spark(app_name="heavy-sf1-bench")
    reg = all_queries()
    rows: dict[str, dict] = {}
    for name in HEAVY:
        spark_s, oracle_s = [], []
        for _ in range(ROUNDS):
            r = strict_compare(spark, reg[name], SF1_DIR)
            assert r["ok"], (name, r)
            spark_s.append(r["spark_s"])
            oracle_s.append(r["oracle_s"])
        s_med = statistics.median(spark_s)
        o_med = statistics.median(oracle_s)
        rows[name] = {
            "spark_s": [round(x, 3) for x in spark_s],
            "oracle_s": [round(x, 3) for x in oracle_s],
            "spark_median_s": round(s_med, 3),
            "oracle_median_s": round(o_med, 3),
            "ratio": round(s_med / o_med, 3),
            "rows": r["rows"],
        }
        print(name, rows[name]["spark_median_s"], "vs", rows[name]["oracle_median_s"], "=", rows[name]["ratio"], flush=True)

    dd20 = dd20_decomposition(spark)
    print("dd20 decomposition:", dd20, flush=True)

    art = {
        "sf_dir": SF1_DIR,
        "rounds": ROUNDS,
        "protocol": "median of strict_compare rounds; both engines per "
        "round; hash-verified each run",
        "queries": rows,
        "dd20_decomposition": dd20,
    }
    with open(OUT, "w") as f:
        json.dump(art, f, indent=1)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
