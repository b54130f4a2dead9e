"""Deep differential-fuzz sweep: run N seeded generated queries
(tw_etl_spark.testing.relgen) three ways — Spark SQL, Spark DataFrame
API, DuckDB — and strict-compare under tests/oracle_utils.

CI pins a fixed seed range in tests/test_differential_fuzz.py; this
tool is the deeper offline sweep (hundreds/thousands of seeds) run
before each round's close.  Writes tools/fuzz_sweep.json.

Run: PYTHONPATH=. python tools/fuzz_sweep.py [N_SEEDS] [SF_DIR]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.oracle_utils import assert_frames_match, run_oracle
from tw_etl_spark.session import get_spark
from tw_etl_spark.testing import relgen

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fuzz_sweep.json")


def main() -> int:
    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="fuzz-sweep")
    relgen.register_views(spark, sf_dir)
    t0 = time.perf_counter()
    failures: list[dict] = []
    shapes: dict[str, int] = {}
    for seed in range(n_seeds):
        q = relgen.generate(seed)
        shapes[q.shape] = shapes.get(q.shape, 0) + 1
        try:
            oracle_pdf = run_oracle(q.sql, sf_dir)
            sql_pdf = spark.sql(q.sql).toPandas()
            assert_frames_match(sql_pdf, oracle_pdf, f"seed{seed}:sql")
            df = relgen.run_spark_dataframe(spark, q, sf_dir)
            if df is not None:
                assert_frames_match(df.toPandas(), oracle_pdf, f"seed{seed}:df")
        except Exception as exc:  # noqa: BLE001 — sweep must finish
            failures.append(
                {"seed": seed, "shape": q.shape, "sql": q.sql,
                 "err": f"{type(exc).__name__}: {exc}"[:800]}
            )
            print(f"FAIL seed={seed} {q.shape}\n  {q.sql}\n  {exc}", flush=True)
        if seed and seed % 50 == 0:
            print(f"... {seed}/{n_seeds} ({len(failures)} failures)", flush=True)
    wall = round(time.perf_counter() - t0, 1)
    out = {
        "sf_dir": sf_dir,
        "n_seeds": n_seeds,
        "shapes": shapes,
        "n_failures": len(failures),
        "failures": failures[:50],
        "wall_s": wall,
    }
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(f"{n_seeds} seeds, {len(failures)} failures, {wall}s -> {OUT}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
