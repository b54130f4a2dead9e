"""Profile e2 JSON-extract variants at sf1 (throwaway experiment tool).

The sf1 differential bench showed e2 at 10.6x DuckDB — the only
headline query where the fixed-floor argument failed at scale. This
times candidate physical plans for the same semantics on the sf1
events table.

Run: PYTHONPATH=. python tools/profile_e2.py 2>/dev/null
"""
from __future__ import annotations

import statistics
import time

from pyspark.sql import functions as F

from tw_etl_spark.session import get_spark

SF1 = "/root/repo/.scale/sf1"
RUNS = 5

spark = get_spark(
    app_name="profile-e2",
    extra_conf={
        "spark.sql.shuffle.partitions": "32",
        "spark.sql.adaptive.enabled": "false",
    },
)

e = spark.read.parquet(f"{SF1}/events.parquet")


def bench(name, df):
    df.toPandas()  # warm
    ts = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        df.toPandas()
        ts.append(time.perf_counter() - t0)
    print(f"{name:28s} median {statistics.median(ts)*1000:7.1f} ms  min {min(ts)*1000:7.1f} ms")


# v0: current — get_json_object
bench(
    "v0_get_json_object",
    e.groupBy("event_type").agg(
        F.round(F.avg(F.get_json_object("props", "$.k").cast("double")), 6).alias("avg_k"),
        F.count(F.lit(1)).alias("n"),
    ).orderBy("event_type"),
)

# v1: from_json with explicit schema (single-field struct)
bench(
    "v1_from_json_schema",
    e.groupBy("event_type").agg(
        F.round(F.avg(F.from_json("props", "k DOUBLE")["k"]), 6).alias("avg_k"),
        F.count(F.lit(1)).alias("n"),
    ).orderBy("event_type"),
)

# v2: Spark 4 variant type: parse_json + variant_get
bench(
    "v2_variant",
    e.groupBy("event_type").agg(
        F.round(
            F.avg(F.try_variant_get(F.parse_json("props"), "$.k", "double")), 6
        ).alias("avg_k"),
        F.count(F.lit(1)).alias("n"),
    ).orderBy("event_type"),
)

# v3: scan-only control — how much is parquet string decode + agg?
bench(
    "v3_no_json_control",
    e.groupBy("event_type").agg(
        F.round(F.avg(F.length("props").cast("double")), 6).alias("avg_k"),
        F.count(F.lit(1)).alias("n"),
    ).orderBy("event_type"),
)

import duckdb

con = duckdb.connect()
con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF1}/events.parquet')")
sql = """
SELECT event_type,
       round(avg(CAST(json_extract_string(props, '$.k') AS DOUBLE)), 6) AS avg_k,
       count(*) AS n
FROM events GROUP BY event_type ORDER BY event_type
"""
con.execute(sql).df()
ts = []
for _ in range(RUNS):
    t0 = time.perf_counter()
    con.execute(sql).df()
    ts.append(time.perf_counter() - t0)
print(f"{'duckdb_oracle':28s} median {statistics.median(ts)*1000:7.1f} ms  min {min(ts)*1000:7.1f} ms")
