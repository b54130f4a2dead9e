"""Run the full DRIVER_WINDOW (the driver's 50-query gate) against the
strict oracle harness at one sf. Run:
PYTHONPATH=. python tools/check_window.py [sf_dir]"""
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.oracle_utils import assert_frames_match, run_oracle
from tw_etl_spark.queries import DRIVER_WINDOW, all_queries
from tw_etl_spark.session import get_spark

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
spark = get_spark(app_name="window-check")
reg = all_queries()
bad = []
for name in DRIVER_WINDOW:
    spec = reg[name]
    try:
        t0 = time.perf_counter()
        got = spec.spark(spark, sf_dir).toPandas()
        want = run_oracle(spec.oracle, sf_dir)
        assert_frames_match(got, want, name)
        print(f"ok   {name} rows={len(got)} {time.perf_counter()-t0:.2f}s",
              flush=True)
    except Exception:
        bad.append(name)
        print(f"FAIL {name}", flush=True)
        traceback.print_exc(limit=3)
print(f"WINDOW RESULT: {len(DRIVER_WINDOW)-len(bad)}/{len(DRIVER_WINDOW)}",
      "FAILURES:", bad, flush=True)
sys.exit(1 if bad else 0)
