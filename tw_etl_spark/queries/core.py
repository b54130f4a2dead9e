"""The eleven headline oracle queries from SURVEY.md §2.3.

Q1/Q3/Q5/Q6 — relational core (scan, filter, joins, hash agg, top-k).
W1 — window ranking.  E1/E2/E3 — time-series rollup, JSON extraction,
sessionization.  D1/D2 — text explode + exact dedup.  V1 — vector
cosine top-k pairs.

Spark side is DataFrame-API-first so Catalyst sees a declarative plan
(predicate pushdown, broadcast selection, partial aggregation,
TakeOrderedAndProject all come free). Oracle side is ANSI SQL for
DuckDB over the same parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tw_etl_spark.catalog import read_table as _t  # noqa: F401
from tw_etl_spark.queries import register


# --------------------------------------------------------------------------
# Q1 — pricing summary: filter + 8-aggregate hash agg + sort on lineitem.
# Capability: SURVEY §2.2 aggregations (partial+final hash agg is automatic;
# at 100 TB this is a map-side-combined single shuffle on 2 low-card keys).
# --------------------------------------------------------------------------
@register(
    "q1_pricing_summary",
    oracle="""
    SELECT
        l_returnflag,
        l_linestatus,
        round(sum(l_quantity), 2)                                          AS sum_qty,
        round(sum(l_extendedprice), 2)                                     AS sum_base_price,
        round(sum(l_extendedprice * (1 - l_discount)), 2)                  AS sum_disc_price,
        round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)    AS sum_charge,
        (CASE WHEN (sum(l_quantity)::BIGINT) < 0 THEN -(((abs(sum(l_quantity)::BIGINT)::BIGINT * 1000000) // ((count(*))::BIGINT)) + CASE WHEN 2 * ((abs(sum(l_quantity)::BIGINT)::BIGINT * 1000000) % ((count(*))::BIGINT)) >= ((count(*))::BIGINT) THEN 1 ELSE 0 END) ELSE (((abs(sum(l_quantity)::BIGINT)::BIGINT * 1000000) // ((count(*))::BIGINT)) + CASE WHEN 2 * ((abs(sum(l_quantity)::BIGINT)::BIGINT * 1000000) % ((count(*))::BIGINT)) >= ((count(*))::BIGINT) THEN 1 ELSE 0 END) END / 1000000.0) AS avg_qty,
        round(avg(l_extendedprice), 6)                                     AS avg_price,
        round(avg(l_discount), 6)                                          AS avg_disc,
        count(*)                                                           AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="TPC-H-style Q1; hash aggregate with 8 aggregates.",
    tags=("agg", "filter", "sort"),
)
def q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# Q3 — top-k revenue: 3-way join + agg + ORDER BY ... LIMIT 10.
# customer is the small side → broadcast; Spark plans TakeOrderedAndProject
# for the limit (no global sort materialization).
# --------------------------------------------------------------------------
@register(
    "q3_topk_revenue",
    oracle="""
    SELECT
        l_orderkey,
        round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        o_orderdate,
        o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    doc="3-way join + agg + deterministic top-10.",
    tags=("join", "agg", "topk"),
)
def q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    l = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    # customer is SF-PROPORTIONAL, not a bounded dim: no forced
    # broadcast hint — the scan has known file-size stats, so Catalyst
    # broadcasts it statically while it fits autoBroadcastJoinThreshold
    # (64m) and AQE keeps the runtime call at true scale.
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


# --------------------------------------------------------------------------
# Q5 — nation revenue: 6-way join incl. composite key + agg.
# region/nation/supplier/customer are dims → broadcast chain; only the
# orders⋈lineitem fact-fact join shuffles. At 100 TB that one shuffle is
# on l_orderkey; AQE handles skew.
# --------------------------------------------------------------------------
@register(
    "q5_nation_revenue",
    oracle="""
    SELECT
        n_name,
        round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    doc="6-way join with composite key (l_suppkey,s_nationkey=c_nationkey).",
    tags=("join", "agg"),
)
def q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    # customer/supplier are SF-proportional (region/nation are bounded):
    # no forced hints — scan-size stats + the 64m threshold broadcast
    # them statically at every measured SF, and AQE decides at true
    # scale instead of a pinned executor-OOM.
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


# --------------------------------------------------------------------------
# Q6 — filter-only agg with BETWEEN: the predicate-pushdown canary.
# All three predicates reach the parquet scan (check plans.assert_pushdown).
# --------------------------------------------------------------------------
@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="Filter-only aggregate; BETWEEN + range predicates pushed to scan.",
    tags=("filter", "agg"),
)
def q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            )
        )
    )


# --------------------------------------------------------------------------
# W1 — per-customer top-3 orders by totalprice: window rank() + filter.
# rank() (not row_number) keeps ties deterministic across engines.
# --------------------------------------------------------------------------
@register(
    "w1_top3_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rnk
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rnk
        FROM orders
    )
    WHERE rnk <= 3
    """,
    doc="Window ranking + filter (per-group top-k).",
    tags=("window", "topk"),
)
def w1(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"))
    return (
        # cast: DuckDB rank() yields BIGINT; align widths for the schema gate
        o.withColumn("rnk", F.rank().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rnk")
    )


# --------------------------------------------------------------------------
# E1 — hourly tumbling rollup over the events time-series.
# Batch form of the streaming tumbling-window agg (SURVEY §2.2 streaming).
# --------------------------------------------------------------------------
@register(
    "e1_hourly_rollup",
    oracle="""
    SELECT
        date_trunc('hour', ts)       AS hour,
        event_type,
        count(*)                     AS n_events,
        round(sum(value), 2)         AS sum_value,
        count(DISTINCT user_id)      AS n_users
    FROM events
    GROUP BY 1, 2
    ORDER BY hour, event_type
    """,
    doc="date_trunc tumbling rollup with count/sum/countDistinct.",
    tags=("agg", "time"),
)
def e1(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("hour", "event_type")
    )


# --------------------------------------------------------------------------
# E2 — JSON path extraction + aggregate (the ffprobe-sidecar capability,
# reference convert.sh:44-48 jq '.streams[1].height' → get_json_object).
# --------------------------------------------------------------------------
@register(
    "e2_json_extract_avg",
    oracle="""
    SELECT
        event_type,
        round(avg(CAST(json_extract_string(props, '$.k') AS DOUBLE)), 6) AS avg_k,
        count(*) AS n
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="single-field from_json extract over a JSON string column + avg.",
    tags=("json", "agg"),
)
def e2(spark: SparkSession, sf_dir: str) -> DataFrame:
    # from_json with a single-field explicit schema beats get_json_object
    # ~1.8x at sf1 (round-5 e2 profiling: 31 ms vs 56 ms median) — the
    # Jackson parse stops after the requested field instead of re-walking
    # the document per extraction, and the plan stays whole-stage codegen.
    # Verified value-identical to get_json_object on the fixtures.
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.round(F.avg(F.from_json("props", "k DOUBLE")["k"]), 6).alias("avg_k"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# E3 — sessionization: lag over (user, ts), 30-min gap rule, sessions/user.
# The batch form of session_window; the gap rule mirrors the reference's
# packet-time-series gap semantics (convert.sh:60-62, ad segments).
# --------------------------------------------------------------------------
@register(
    "e3_sessionization",
    oracle="""
    WITH gaps AS (
        SELECT
            user_id,
            ts,
            lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events
        WHERE ts IS NOT NULL
    )
    SELECT
        user_id,
        CAST(sum(CASE WHEN prev_ts IS NULL
                   OR ts > prev_ts + INTERVAL 30 MINUTE THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
        count(*) AS n_events
    FROM gaps
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="30-minute-gap sessionization via batch session_window, "
    "session count per user.",
    tags=("window", "time"),
)
def e3(spark: SparkSession, sf_dir: str) -> DataFrame:
    # session_window beats the lag-window formulation 1.46x at sf1
    # (tools/profile_e3.py: 50 ms vs 74 ms median) — one sort-based
    # session agg instead of a window sort + separate hash agg, same
    # single user_id exchange. Boundary semantics are exact: Spark
    # merges an event at precisely prev_ts + gap into the open session
    # (inclusive end), matching the oracle's strict
    # `ts > prev_ts + INTERVAL 30 MINUTE` new-session rule — verified
    # at the microsecond boundary in tests/test_relational.py.
    # NULL event times are dropped EXPLICITLY on both sides (an event
    # with no event time cannot be sessionized): session_window would
    # silently drop them anyway, while the oracle's lag form would
    # count them — the filter + the oracle's IS NOT NULL make the
    # chosen semantics visible and pinned
    # (tests/test_relational.py::test_e3_null_event_time_dropped).
    e = _t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
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


# --------------------------------------------------------------------------
# D1 — word count: split + explode + agg + deterministic top-20.
# --------------------------------------------------------------------------
@register(
    "d1_word_count",
    oracle="""
    SELECT word, count(*) AS cnt
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
    WHERE word <> ''
    GROUP BY word
    ORDER BY cnt DESC, word
    LIMIT 20
    """,
    doc="split+explode word count, top-20 with lexical tiebreak.",
    tags=("text", "agg", "topk"),
)
def d1(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "word")
        .limit(20)
    )


# --------------------------------------------------------------------------
# D2 — exact dedup: md5 content hash, distinct vs total.
# The exact-dedup primitive from SURVEY §2.2 [EXT]; at 100 TB this is one
# shuffle on the 128-bit hash (not the full text) — see operators.dedup.
# --------------------------------------------------------------------------
@register(
    "d2_exact_dedup",
    oracle="""
    SELECT
        count(DISTINCT md5(text)) AS n_distinct,
        count(*)                  AS n_total
    FROM documents
    """,
    doc="Exact dedup via content hash (engine: xxhash64+crc32 pair; "
    "oracle: md5 — identical distinct-count).",
    tags=("dedup", "hash"),
)
def d2(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The oracle counts DISTINCT md5(text); any collision-free hash gives
    # the same count. Engine-side we hash with (xxhash64, crc32) — 96
    # independent bits, collision odds ~n^2/2^97 — which is 1.47x faster
    # than md5 at sf1 (36 ms vs 53 ms, tools profile) because xxhash64 is
    # a non-cryptographic single-pass hash codegen'd in the JVM. The
    # isNotNull guards reproduce md5's NULL semantics (countDistinct
    # drops rows where every hash column is NULL).
    d = _t(spark, sf_dir, "documents")
    not_null = F.col("text").isNotNull()
    return d.agg(
        F.countDistinct(
            F.when(not_null, F.xxhash64("text")),
            F.when(not_null, F.crc32(F.col("text").cast("binary"))),
        ).alias("n_distinct"),
        F.count(F.lit(1)).alias("n_total"),
    )


# --------------------------------------------------------------------------
# V1 — top-10 cosine-similarity pairs. Semantically a theta self-join on
# vec_id < vec_id + exact cosine + global top-k (what the oracle SQL runs);
# physically executed as an Arrow-batched blocked matmul against a
# broadcast normalized corpus (operators.similarity.cosine_topk_pairs) —
# no N×N row materialization, no shuffle, measured ~100× faster than the
# interpreted higher-order-function theta join at 2k×64d.
# --------------------------------------------------------------------------
@register(
    "v1_cosine_top_pairs",
    oracle="""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings)
    SELECT
        a.vec_id AS id_a,
        b.vec_id AS id_b,
        round(
            list_dot_product(a.emb, b.emb)
            / (sqrt(list_dot_product(a.emb, a.emb)) * sqrt(list_dot_product(b.emb, b.emb))),
            6
        ) AS cos_sim
    FROM v a JOIN v b ON a.vec_id < b.vec_id
    ORDER BY cos_sim DESC, id_a, id_b
    LIMIT 10
    """,
    doc="Theta self-join + exact cosine + global top-10 pairs.",
    tags=("vector", "join", "topk"),
)
def v1(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tw_etl_spark.operators.similarity import cosine_topk_pairs

    v = _t(spark, sf_dir, "embeddings")
    return cosine_topk_pairs(v, id_col="vec_id", vec_col="embedding", k=10)


@register(
    "e4_multigrain_rollup",
    oracle="""
    SELECT 'hour' AS grain, date_trunc('hour', ts) AS bucket,
           count(*) AS n, round(sum(value), 2) AS sv
    FROM events GROUP BY 2
    UNION ALL
    SELECT 'day' AS grain, date_trunc('day', ts) AS bucket,
           count(*) AS n, round(sum(value), 2) AS sv
    FROM events GROUP BY 2
    ORDER BY grain, bucket
    """,
    doc="Cascading hour->day rollup: the day level re-aggregates the "
    "hourly partials instead of re-scanning the base table — one base "
    "scan total regardless of grain count (hypertable rollup pattern).",
    tags=("agg", "time", "rollup"),
)
def e4(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tw_etl_spark.operators.rollup import cascading_rollup

    e = _t(spark, sf_dir, "events")
    r = cascading_rollup(
        e,
        "ts",
        [],
        [
            ("n", F.count(F.lit(1)), F.sum("n")),
            ("sv", F.sum("value"), F.sum("sv")),
        ],
        grains=["hour", "day"],
    )
    return r.select(
        "grain", "bucket", "n", F.round("sv", 2).alias("sv")
    ).orderBy("grain", "bucket")


@register(
    "e5_gap_fill_locf",
    oracle="""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS h,
               count(*) AS n, sum(value) AS s
        FROM events GROUP BY 1, 2
    ),
    bounds AS (
        SELECT event_type, min(h) AS mn, max(h) AS mx FROM hourly GROUP BY 1
    ),
    spine AS (
        SELECT event_type,
               unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h
        FROM bounds
    ),
    j AS (
        SELECT sp.event_type, sp.h,
               coalesce(hy.n, 0) AS n_events, hy.s AS s
        FROM spine sp LEFT JOIN hourly hy
          ON sp.event_type = hy.event_type AND sp.h = hy.h
    )
    SELECT event_type, h,
           CAST(n_events AS BIGINT) AS n_events,
           round(last_value(s IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
               AS sum_locf
    FROM j ORDER BY event_type, h
    """,
    doc="Time-spine gap filling with last-observation-carried-forward "
    "(the hypertable/time_bucket_gapfill + locf capability): per "
    "event_type, generate the full hourly spine between that type's "
    "first and last hour (sequence + explode), left-join the hourly "
    "rollup, fill missing hours with count 0 and the carried-forward "
    "running sum. Spine generation is per-group sequence() — no "
    "driver-side loop; the locf is one window over the spine, which is "
    "orders of magnitude smaller than the raw events.",
    tags=("events", "timeseries", "gapfill"),
)
def e5(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
    spine = (
        hourly.groupBy("event_type")
        .agg(F.min("h").alias("mn"), F.max("h").alias("mx"))
        .select(
            "event_type",
            F.explode(
                F.sequence("mn", "mx", F.expr("INTERVAL 1 HOUR"))
            ).alias("h"),
        )
    )
    j = spine.join(hourly, ["event_type", "h"], "left").select(
        "event_type",
        "h",
        F.coalesce("n", F.lit(0)).cast("bigint").alias("n_events"),
        "s",
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "event_type",
        "h",
        "n_events",
        F.round(F.last("s", ignorenulls=True).over(w), 2).alias("sum_locf"),
    ).orderBy("event_type", "h")


# --------------------------------------------------------------------------
# E6 — ordered funnel: first view -> first click strictly after it ->
# first purchase strictly after that, per user; stage reach counts and
# average inter-stage gaps. Classic product-analytics funnel. The stage
# tables (one row per user) are DATA-SIZED — they grow with the corpus,
# so they must never be force-broadcast (at 100 TB that is a
# billions-row broadcast, an executor OOM). Instead every stage
# aggregates AND joins on user_id: the stage-1 agg's hash exchange is
# reused by the stage-2 join and its agg (and so on down the chain), so
# the whole funnel costs one user_id exchange per event-type slice and
# AQE is free to downgrade a join to broadcast only when runtime stats
# prove the side small.
# Gap arithmetic: per-user gaps quantized to integer MILLISECONDS first
# (exact `div` on both engines — summed microseconds would overflow the
# |num|*10^d < 2^53 exact-rounding guard at sf1), then one exact-integer
# average (functions/rounding.py).
# --------------------------------------------------------------------------
def _e6_oracle() -> str:
    from tw_etl_spark.functions.rounding import sql_round_ratio

    gap2 = sql_round_ratio(
        "sum((epoch_us(t2) - epoch_us(t1)) // 1000)", "count(*) * 1000", 3
    )
    gap3 = sql_round_ratio(
        "sum((epoch_us(t3) - epoch_us(t2)) // 1000)", "count(*) * 1000", 3
    )
    return f"""
    WITH e AS (
        SELECT user_id, ts, event_type FROM events WHERE ts IS NOT NULL
    ), v AS (
        SELECT user_id, min(ts) AS t1 FROM e
        WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
        SELECT e.user_id, any_value(v.t1) AS t1, min(e.ts) AS t2
        FROM e JOIN v USING (user_id)
        WHERE e.event_type = 'click' AND e.ts > v.t1
        GROUP BY e.user_id
    ), p AS (
        SELECT e.user_id, any_value(c.t2) AS t2, min(e.ts) AS t3
        FROM e JOIN c USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts > c.t2
        GROUP BY e.user_id
    )
    SELECT '1_view' AS stage, count(*)::BIGINT AS n_users,
           CAST(NULL AS DOUBLE) AS avg_gap_s
    FROM v
    UNION ALL
    SELECT '2_click', count(*)::BIGINT, {gap2} FROM c
    UNION ALL
    SELECT '3_purchase', count(*)::BIGINT, {gap3} FROM p
    ORDER BY stage
    """


@register(
    "e6_funnel",
    oracle=_e6_oracle(),
    doc="Ordered view->click->purchase funnel: per-user first-event "
    "chaining with strictly-after semantics, stage reach counts, and "
    "exact-integer average inter-stage gaps in seconds (ms-quantized "
    "per user, one division — the round-9 rounding discipline).",
    tags=("events", "funnel", "agg", "join"),
)
def e6(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tw_etl_spark.functions.rounding import exact_round_ratio

    e = (
        _t(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select("user_id", "ts", "event_type")
    )
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.any_value(F.col("t1")).alias("t1"), F.min("ts").alias("t2"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.any_value(F.col("t2")).alias("t2"), F.min("ts").alias("t3"))
    )

    def gap_ms(a: str, b: str):
        return F.expr(f"(unix_micros({b}) - unix_micros({a})) div 1000")

    s1 = v.agg(F.count(F.lit(1)).cast("long").alias("n_users")).select(
        F.lit("1_view").alias("stage"),
        "n_users",
        F.lit(None).cast("double").alias("avg_gap_s"),
    )
    s2 = c.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum(gap_ms("t1", "t2")).alias("gms"),
    ).select(
        F.lit("2_click").alias("stage"),
        "n_users",
        exact_round_ratio(
            F.col("gms"), F.col("n_users") * 1000, 3
        ).alias("avg_gap_s"),
    )
    s3 = p.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum(gap_ms("t2", "t3")).alias("gms"),
    ).select(
        F.lit("3_purchase").alias("stage"),
        "n_users",
        exact_round_ratio(
            F.col("gms"), F.col("n_users") * 1000, 3
        ).alias("avg_gap_s"),
    )
    return s1.unionByName(s2).unionByName(s3).orderBy("stage")


# --------------------------------------------------------------------------
# E7 — retention cohorts: users bucketed by first-activity day, activity
# counted per (cohort_day, day_offset) with retention as an exact
# fraction of cohort size. Output is days x days rows — tiny at any data
# scale; the only data-sized work is the per-user distinct-day pass (one
# shuffle on user_id for the cohort min, one on (user,day) distinct that
# AQE coalesces with it).
# --------------------------------------------------------------------------
def _e7_oracle() -> str:
    from tw_etl_spark.functions.rounding import sql_round_ratio

    ret = sql_round_ratio("n_active", "n_cohort", 6)
    return f"""
    WITH act AS (
        SELECT DISTINCT user_id, date_trunc('day', ts) AS day
        FROM events WHERE ts IS NOT NULL
    ), first AS (
        SELECT user_id, min(day) AS cohort_day FROM act GROUP BY user_id
    ), sizes AS (
        SELECT cohort_day, count(*)::BIGINT AS n_cohort
        FROM first GROUP BY cohort_day
    ), g AS (
        SELECT f.cohort_day,
               date_diff('day', f.cohort_day, a.day)::BIGINT AS day_offset,
               count(*)::BIGINT AS n_active
        FROM act a JOIN first f USING (user_id)
        GROUP BY f.cohort_day, 2
    )
    SELECT g.cohort_day, g.day_offset, g.n_active, {ret} AS retention
    FROM g JOIN sizes USING (cohort_day)
    ORDER BY cohort_day, day_offset
    """


@register(
    "e7_retention_cohorts",
    oracle=_e7_oracle(),
    doc="Retention cohort table: first-activity-day cohorts x day "
    "offset, distinct active users and the exact retention fraction "
    "of cohort size (integer-ratio rounding).",
    tags=("events", "retention", "agg", "join"),
)
def e7(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tw_etl_spark.functions.rounding import exact_round_ratio

    act = (
        _t(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select("user_id", F.date_trunc("day", "ts").alias("day"))
        .distinct()
    )
    first = act.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    sizes = first.groupBy("cohort_day").agg(
        F.count(F.lit(1)).cast("long").alias("n_cohort")
    )
    g = (
        act.join(first, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(F.col("day"), F.col("cohort_day"))
            .cast("long")
            .alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
    )
    return (
        g.join(F.broadcast(sizes), "cohort_day")
        .select(
            "cohort_day",
            "day_offset",
            "n_active",
            exact_round_ratio(F.col("n_active"), F.col("n_cohort"), 6).alias(
                "retention"
            ),
        )
        .orderBy("cohort_day", "day_offset")
    )
