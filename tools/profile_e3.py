"""Profile e3 sessionization variants at sf1 (throwaway experiment tool).

The sf1 differential bench showed e3 at 2.42x DuckDB. Candidates for
the same semantics (30-min-gap session count + event count per user):

- v0: current — lag window (user_id, ts, event_id) + groupBy
- v1: lag window without the event_id tiebreak (result-invariant:
  equal-ts events can never open a session regardless of order)
- v2: batch session_window groupBy, then per-user rollup
- duckdb: the oracle itself

Run: PYTHONPATH=. python tools/profile_e3.py 2>/dev/null
"""
from __future__ import annotations

import os
import statistics
import sys
import time

from pyspark.sql import Window
from pyspark.sql import functions as F

from tw_etl_spark.session import get_spark

SF1 = "/root/repo/.scale/sf1"
RUNS = 5

if not os.path.isdir(SF1):
    sys.exit(f"{SF1} missing — generate with tools/make_sf1.py first")

spark = get_spark(app_name="profile-e3")
e = spark.read.parquet(f"{SF1}/events.parquet")


def bench(name, df):
    df.toPandas()  # warm
    ts = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        df.toPandas()
        ts.append(time.perf_counter() - t0)
    print(
        f"{name:24s} median {statistics.median(ts)*1000:7.1f} ms"
        f"  min {min(ts)*1000:7.1f} ms"
    )


def v0():
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    new_sess = F.when(
        F.col("prev_ts").isNull()
        | (F.col("ts") > F.col("prev_ts") + F.expr("INTERVAL 30 MINUTE")),
        1,
    ).otherwise(0)
    return (
        e.withColumn("prev_ts", F.lag("ts").over(w))
        .groupBy("user_id")
        .agg(
            F.sum(new_sess).alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )


def v1():
    w = Window.partitionBy("user_id").orderBy("ts")
    new_sess = F.when(
        F.col("prev_ts").isNull()
        | (F.col("ts") > F.col("prev_ts") + F.expr("INTERVAL 30 MINUTE")),
        1,
    ).otherwise(0)
    return (
        e.select("user_id", "ts")
        .withColumn("prev_ts", F.lag("ts").over(w))
        .groupBy("user_id")
        .agg(
            F.sum(new_sess).alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )


def v2():
    sess = e.groupBy("user_id", F.session_window("ts", "30 minutes")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return (
        sess.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("cnt").alias("n_events"),
        )
        .orderBy("user_id")
    )


bench("v0_current", v0())
bench("v1_no_tiebreak", v1())
bench("v2_session_window", v2())

import pandas as pd

a, b, c = v0().toPandas(), v1().toPandas(), v2().toPandas()
print("v1==v0:", a.equals(b), " v2==v0:", a.astype(str).equals(c.astype(str)))

import duckdb

con = duckdb.connect()
con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF1}/events.parquet')")
sql = """
WITH gaps AS (
    SELECT user_id, ts,
           lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
    FROM events
)
SELECT user_id,
       CAST(sum(CASE WHEN prev_ts IS NULL
                  OR ts > prev_ts + INTERVAL 30 MINUTE THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
       count(*) AS n_events
FROM gaps GROUP BY user_id ORDER BY user_id
"""
con.execute(sql).df()
ts = []
for _ in range(RUNS):
    t0 = time.perf_counter()
    con.execute(sql).df()
    ts.append(time.perf_counter() - t0)
print(f"{'duckdb_oracle':24s} median {statistics.median(ts)*1000:7.1f} ms  min {min(ts)*1000:7.1f} ms")
