"""Check named queries against their oracles at one or more scales.

Run: PYTHONPATH=. python tools/check_queries.py st5_stream_neardup_dedup \
         st9_stream_scd2_enrich --sf sf0.001 sf0.01
Defaults to sf0.001 + sf0.01. Exit 1 on any mismatch.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.oracle_utils import assert_frames_match, run_oracle
from tw_etl_spark.queries import all_queries
from tw_etl_spark.session import get_spark


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", nargs="*", default=["sf0.001", "sf0.01"])
    args = ap.parse_args()
    spark = get_spark(app_name="check-queries")
    reg = all_queries()
    bad = 0
    for sf in args.sf:
        sf_dir = f"/root/testdata/{sf}"
        for name in args.names:
            spec = reg[name]
            try:
                t0 = time.perf_counter()
                got = spec.spark(spark, sf_dir).toPandas()
                t1 = time.perf_counter()
                if spec.oracle is None:
                    print(f"ok?  {name} @ {sf}: rows={len(got)} "
                          f"(no oracle) {t1 - t0:.2f}s", flush=True)
                    continue
                want = run_oracle(spec.oracle, sf_dir)
                assert_frames_match(got, want, name)
                print(f"ok   {name} @ {sf}: rows={len(got)} "
                      f"spark={t1 - t0:.2f}s", flush=True)
            except Exception:
                bad += 1
                print(f"FAIL {name} @ {sf}", flush=True)
                traceback.print_exc(limit=4)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
