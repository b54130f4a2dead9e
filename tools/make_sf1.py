"""Generate a join-consistent sf1 dataset (10x sf0.1) for the scale
bench, using DuckDB replication with per-replica key offsets.

Why: four headline queries (w1, d2, e2, e3) sit on Spark's fixed
per-job floor at sf0.1 (wall time flat across 100x data growth —
bench.py docstring) and therefore measure scheduling overhead, not
plans, against sub-30 ms DuckDB times. The honest way to retire the
">2x at sf0.1" rows is to show the SAME plans under the SAME oracle at
a scale where compute dominates. sf1 is that scale on this box.

Replication scheme (OFFSET = replica * 10_000_000, far above any base
key, so replicas never collide):

- orders/lineitem/customer/part/supplier: every key column gets the
  same per-replica offset, so q3/q5 joins hold within each replica and
  never match across replicas — 10x facts, 10x join fan-in.
- dims nation/region are NOT scaled (dimension tables don't grow with
  fact volume; c_nationkey et al. stay in-range by construction).
- events: event_id/user_id offset, ts untouched — 10x events per hour
  (e1), 10x users with identical per-user history shape (e3).
- documents: doc_id offset; text of replica i>0 gets a short suffix so
  the distinct-hash count (d2) scales with the corpus like a real one.
- embeddings: vec_id offset, vectors as-is.

Output: $OUT (default /root/repo/.scale/sf1)/*.parquet — gitignored;
~10 min of DuckDB work, ~1 GB on disk.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = os.environ.get("OUT", "/root/repo/.scale/sf1")
REPLICAS = int(os.environ.get("REPLICAS", "10"))
OFFSET = 10_000_000

# table -> columns that take the per-replica offset
KEYED = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_ONLY = ["region", "nation"]


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    for t in COPY_ONLY:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{OUT}/{t}.parquet' (FORMAT PARQUET)"
        )
        print("copied", t)
    for t, keys in KEYED.items():
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
            ).fetchall()
        ]
        sel = []
        for c in cols:
            if c in keys:
                sel.append(f"{c} + r.i * {OFFSET} AS {c}")
            elif t == "documents" and c == "text":
                sel.append(
                    "CASE WHEN r.i = 0 THEN text "
                    "ELSE text || ' r' || CAST(r.i AS VARCHAR) END AS text"
                )
            else:
                sel.append(c)
        con.execute(
            f"COPY (SELECT {', '.join(sel)} "
            f"FROM read_parquet('{SRC}/{t}.parquet'), "
            f"(SELECT unnest(range({REPLICAS})) AS i) r "
            f"ORDER BY r.i) TO '{OUT}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{OUT}/{t}.parquet')"
        ).fetchone()[0]
        print("replicated", t, n)


if __name__ == "__main__":
    sys.exit(main())
