"""Relational-core operator coverage (SURVEY.md §2.2): joins of every
flavor, rollup/cube/grouping-sets, window frames, set operations, and
the scalar function families. Each query exercises one operator family
and is oracle-verified against DuckDB.

Dialect-compat rules applied throughout (see queries/__init__ docstring):
integer widths aligned to BIGINT where the engines differ (rank/ntile/
grouping/length/floor), arrays serialized with array_join for stable
hashing, regex patterns restricted to the RE2 ∩ Java-regex subset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tw_etl_spark.catalog import read_table as _t
from tw_etl_spark.operators.joins import asof_join
from tw_etl_spark.queries import register


# --------------------------------------------------------------------------
# Joins
# --------------------------------------------------------------------------
@register(
    "j1_left_outer_default_fill",
    oracle="""
    SELECT
        c_custkey,
        c_name,
        CAST(count(o_orderkey) AS BIGINT)        AS n_orders,
        round(coalesce(sum(o_totalprice), 0), 2) AS total_spent
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    ORDER BY c_custkey
    """,
    doc="Left outer join + coalesce default-fill (reference R7/R16 pattern).",
    tags=("join", "outer"),
)
def j1(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias(
                "total_spent"
            ),
        )
        .orderBy("c_custkey")
    )


@register(
    "j2_anti_join_blocklist",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    ORDER BY c_custkey
    """,
    doc="Left anti join — the reference's blocklist skip (manager.py:449-452).",
    tags=("join", "anti"),
)
def j2(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "j3_semi_join_exists",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer
    WHERE EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_totalprice > 400000
    )
    ORDER BY c_custkey
    """,
    doc="Left semi join — the reference's existence probe (manager.py:171-174).",
    tags=("join", "semi"),
)
def j3(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    )


@register(
    "j4_full_outer",
    oracle="""
    WITH cn AS (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer GROUP BY 1),
         sn AS (SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier GROUP BY 1)
    SELECT
        coalesce(cn.nk, sn.nk)              AS nk,
        CAST(coalesce(n_cust, 0) AS BIGINT) AS n_cust,
        CAST(coalesce(n_supp, 0) AS BIGINT) AS n_supp
    FROM cn FULL OUTER JOIN sn ON cn.nk = sn.nk
    ORDER BY nk
    """,
    doc="Full outer join with both-side fill.",
    tags=("join", "outer"),
)
def j4(spark: SparkSession, sf_dir: str) -> DataFrame:
    cn = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    sn = (
        _t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return (
        cn.join(sn, "nk", "full_outer")
        .select(
            "nk",
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
        .orderBy("nk")
    )


@register(
    "j5_equi_range_join",
    oracle="""
    SELECT o_orderkey, CAST(count(*) AS BIGINT) AS n_shipped_30d
    FROM orders JOIN lineitem
      ON l_orderkey = o_orderkey
     AND l_shipdate >= o_orderdate
     AND l_shipdate <  o_orderdate + INTERVAL 30 DAY
    GROUP BY o_orderkey
    ORDER BY o_orderkey
    """,
    doc="Equi-join with range residual predicate (interval containment).",
    tags=("join", "range"),
)
def j5(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.join(
            o,
            (l.l_orderkey == o.o_orderkey)
            & (l.l_shipdate >= o.o_orderdate)
            & (l.l_shipdate < o.o_orderdate + F.expr("INTERVAL 30 DAY")),
        )
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n_shipped_30d"))
        .orderBy("o_orderkey")
    )


@register(
    "j6_asof_join",
    oracle="""
    WITH purchases AS (
        SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
    ),
    clicks AS (
        SELECT user_id, ts, max(value) AS click_value
        FROM events WHERE event_type = 'click' GROUP BY user_id, ts
    )
    SELECT p.user_id, p.event_id, c.click_value, c.ts AS click_ts
    FROM purchases p
    ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts
    ORDER BY p.user_id, p.event_id
    """,
    doc="As-of join (nearest click ≤ purchase ts per user) — the packet "
    "wallclock-reconstruction capability (convert.sh:60-65), via "
    "operators.joins.asof_join (union + last(ignorenulls) window).",
    tags=("join", "asof", "time"),
)
def j6(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("click_value"))
    )
    joined = asof_join(
        purchases, clicks, on="ts", by="user_id", right_payload=["click_value"]
    )
    return joined.select(
        "user_id",
        "event_id",
        F.col("click_value_asof").alias("click_value"),
        F.col("ts_asof").alias("click_ts"),
    ).orderBy("user_id", "event_id")


@register(
    "j9_interval_overlap",
    oracle="""
    SELECT o_orderkey,
           CAST(count(*) AS BIGINT)  AS n_pts,
           round(sum(l_quantity), 2) AS sum_qty
    FROM orders JOIN lineitem
      ON l_shipdate >= o_orderdate
     AND l_shipdate < o_orderdate + INTERVAL 3 DAY
    WHERE o_totalprice >= 450000
      AND l_shipdate >= TIMESTAMP '2001-06-01'
      AND l_shipdate <  TIMESTAMP '2001-07-01'
    GROUP BY o_orderkey
    ORDER BY o_orderkey
    """,
    doc="Keyless interval-overlap join via the SCALE path "
    "(operators.joins.bucketed_range_join): each [o_orderdate, +3d) "
    "interval explodes into its day buckets, equi-joins shipment "
    "points on bucket, re-checks the exact predicate, then aggregates "
    "per interval. This is the shuffle-join form of what would "
    "otherwise be a broadcast nested loop — the O(n*m) trap at 100 TB "
    "(the ad-break overlap matching of convert.sh:60-62). Both sides "
    "are selective (high-value orders, one shipment month, pushed to "
    "the scans): interval-join fan-out is candidates-per-bucket x "
    "points, so an unselective probe side is quadratic-ish cost by "
    "CONSTRUCTION at any engine — the operator under test is the "
    "bucketing, not a cross-product benchmark. DuckDB evaluates the "
    "same predicate as an IEJoin.",
    tags=("join", "range", "interval"),
)
def j9(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tw_etl_spark.operators.joins import bucketed_range_join

    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") >= 450000)
        .select(
            "o_orderkey",
            F.col("o_orderdate").alias("start"),
            (F.col("o_orderdate") + F.expr("INTERVAL 3 DAYS")).alias("end"),
        )
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("2001-06-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("2001-07-01").cast("timestamp"))
        )
        .select("l_shipdate", "l_quantity")
    )
    j = bucketed_range_join(li, o, "l_shipdate", "start", "end", bucket_seconds=86400)
    return (
        j.groupBy("o_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_pts"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .orderBy("o_orderkey")
    )


# --------------------------------------------------------------------------
# Aggregation extensions
# --------------------------------------------------------------------------
@register(
    "a1_rollup",
    oracle="""
    SELECT
        n_name,
        c_mktsegment,
        round(sum(c_acctbal), 2)                 AS total_bal,
        CAST(count(*) AS BIGINT)                 AS n_cust,
        CAST(grouping(n_name) AS BIGINT)         AS g_nation,
        CAST(grouping(c_mktsegment) AS BIGINT)   AS g_segment
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY ROLLUP (n_name, c_mktsegment)
    ORDER BY g_nation, g_segment, n_name, c_mktsegment
    """,
    doc="ROLLUP hierarchy totals with grouping() markers.",
    tags=("agg", "rollup"),
)
def a1(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .rollup("n_name", "c_mktsegment")
        .agg(
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
            F.count(F.lit(1)).alias("n_cust"),
            F.grouping("n_name").cast("bigint").alias("g_nation"),
            F.grouping("c_mktsegment").cast("bigint").alias("g_segment"),
        )
        .orderBy("g_nation", "g_segment", "n_name", "c_mktsegment")
    )


@register(
    "a2_cube",
    oracle="""
    SELECT
        lang,
        source,
        CAST(count(*) AS BIGINT)     AS n_docs,
        (CASE WHEN (sum(n_chars)) < 0 THEN -(((abs(sum(n_chars))::BIGINT * 1000000) // ((count(*))::BIGINT)) + CASE WHEN 2 * ((abs(sum(n_chars))::BIGINT * 1000000) % ((count(*))::BIGINT)) >= ((count(*))::BIGINT) THEN 1 ELSE 0 END) ELSE (((abs(sum(n_chars))::BIGINT * 1000000) // ((count(*))::BIGINT)) + CASE WHEN 2 * ((abs(sum(n_chars))::BIGINT * 1000000) % ((count(*))::BIGINT)) >= ((count(*))::BIGINT) THEN 1 ELSE 0 END) END / 1000000.0) AS avg_chars,
        CAST(grouping(lang) AS BIGINT)   AS g_lang,
        CAST(grouping(source) AS BIGINT) AS g_source
    FROM documents
    GROUP BY CUBE (lang, source)
    ORDER BY g_lang, g_source, lang, source
    """,
    doc="CUBE over documents (lang × source).",
    tags=("agg", "cube"),
)
def a2(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return (
        d.cube("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
            F.grouping("lang").cast("bigint").alias("g_lang"),
            F.grouping("source").cast("bigint").alias("g_source"),
        )
        .orderBy("g_lang", "g_source", "lang", "source")
    )


@register(
    "a3_grouping_sets",
    oracle="""
    SELECT
        lang,
        source,
        CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY GROUPING SETS ((lang), (source), ())
    ORDER BY lang, source
    """,
    doc="GROUPING SETS (per-lang, per-source, grand total) via spark.sql.",
    tags=("agg", "grouping-sets", "sql"),
)
def a3(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        """
        SELECT
            lang,
            source,
            count(*)               AS n_docs,
            CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM documents
        GROUP BY GROUPING SETS ((lang), (source), ())
        ORDER BY lang, source
        """
    )


@register(
    "a4_collect_sorted",
    oracle="""
    SELECT
        lang,
        array_to_string(list_sort(list(DISTINCT source)), ',') AS sources,
        CAST(count(DISTINCT source) AS BIGINT)                 AS n_sources
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
    doc="collect_set + array_sort serialized via array_join (deterministic).",
    tags=("agg", "collect"),
)
def a4(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return (
        d.groupBy("lang")
        .agg(
            F.array_join(F.array_sort(F.collect_set("source")), ",").alias("sources"),
            F.countDistinct("source").alias("n_sources"),
        )
        .orderBy("lang")
    )


@register(
    "a5_stats_percentiles",
    oracle="""
    SELECT
        l_returnflag,
        round(stddev_samp(l_quantity), 6)  AS sd_qty,
        round(var_samp(l_quantity), 6)     AS var_qty,
        round(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity), 6) AS median_qty,
        round(percentile_cont(0.9) WITHIN GROUP (ORDER BY l_quantity), 6) AS p90_qty,
        round(min(l_extendedprice), 2)     AS min_price,
        round(max(l_extendedprice), 2)     AS max_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="stddev/variance + exact interpolated percentiles.",
    tags=("agg", "stats"),
)
def a5(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
            F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
            F.round(F.percentile("l_quantity", F.lit(0.5)), 6).alias("median_qty"),
            F.round(F.percentile("l_quantity", F.lit(0.9)), 6).alias("p90_qty"),
            F.round(F.min("l_extendedprice"), 2).alias("min_price"),
            F.round(F.max("l_extendedprice"), 2).alias("max_price"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "a8_first_last_argminmax",
    oracle="""
    SELECT
        lang,
        arg_max(doc_id, n_chars * 1000000 + doc_id)  AS longest_doc,
        arg_min(doc_id, n_chars * 1000000 + doc_id)  AS shortest_doc,
        CAST(max(n_chars) AS BIGINT) AS max_chars,
        CAST(min(n_chars) AS BIGINT) AS min_chars
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
    doc="first/last-style selection made deterministic: max_by/min_by "
    "(arg_max/arg_min).",
    tags=("agg", "argminmax"),
)
def a8(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return (
        d.groupBy("lang")
        .agg(
            # ties on n_chars broken by doc_id so both engines agree
            F.max_by(
                "doc_id", F.col("n_chars") * 1000000 + F.col("doc_id")
            ).alias("longest_doc"),
            F.min_by(
                "doc_id", F.col("n_chars") * 1000000 + F.col("doc_id")
            ).alias("shortest_doc"),
            F.max("n_chars").alias("max_chars"),
            F.min("n_chars").alias("min_chars"),
        )
        .orderBy("lang")
    )


@register(
    "a6_approx_count_distinct",
    oracle=None,  # HLL sketch is engine-specific; error band unit-tested
    doc="approx_count_distinct (HyperLogLog++) vs exact — the 100 TB "
    "cardinality-estimation posture. Tolerance asserted in tests/test_relational.py.",
    tags=("agg", "approx"),
)
def a6(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return e.agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
        F.approx_count_distinct("event_id").alias("approx_events"),
        F.countDistinct("event_id").alias("exact_events"),
    )


@register(
    "a9_kmv_distinct",
    oracle="""
    WITH d AS (
        SELECT DISTINCT event_type, md5(user_id::VARCHAR) AS h FROM events
    ),
    r AS (
        SELECT event_type, h,
               row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
        FROM d
    ),
    g AS (
        SELECT event_type, count(*) AS nd,
               max(CASE WHEN rn = 64 THEN h END) AS hk
        FROM r GROUP BY event_type
    ),
    x AS (
        SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
        FROM events GROUP BY event_type
    )
    SELECT g.event_type,
           round(CASE WHEN nd < 64 THEN nd::DOUBLE
                      ELSE 63.0 / (('0x' || substr(hk, 1, 12))::BIGINT
                                   / 281474976710656.0) END, 4) AS est_distinct,
           nd < 64 AS n_exact_le_k,
           x.exact_distinct
    FROM g JOIN x USING (event_type)
    ORDER BY event_type
    """,
    doc="K-Minimum-Values distinct-count sketch (Bar-Yossef et al. "
    "2002) over the portable md5 hash family — the oracle-verifiable "
    "twin of a6's HLL tier: both engines pick the same k=64 smallest "
    "hashes, so the ESTIMATE itself (not just an error band) is "
    "hash-compared, alongside the exact count for reference. Same "
    "pattern as the dd3p/dd4p/dd8p portable twins; HLL stays the "
    "100 TB tier (fixed-size mergeable sketch).",
    tags=("agg", "approx", "sketch"),
)
def a9(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tw_etl_spark.operators.sketch import kmv_distinct

    e = _t(spark, sf_dir, "events")
    est = kmv_distinct(e, ["event_type"], "user_id", k=64)
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    return est.join(exact, "event_type").orderBy("event_type")


@register(
    "a7_pivot",
    oracle="""
    SELECT
        user_id,
        CAST(count(CASE WHEN event_type = 'click'    THEN 1 END) AS BIGINT) AS click,
        CAST(count(CASE WHEN event_type = 'error'    THEN 1 END) AS BIGINT) AS error,
        CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchase,
        CAST(count(CASE WHEN event_type = 'signup'   THEN 1 END) AS BIGINT) AS signup,
        CAST(count(CASE WHEN event_type = 'view'     THEN 1 END) AS BIGINT) AS view
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="Pivot (explicit value list ⇒ single-pass conditional aggregation, "
    "no extra distinct-values job).",
    tags=("agg", "pivot"),
)
def a7(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    kinds = ["click", "error", "purchase", "signup", "view"]
    return (
        e.groupBy("user_id")
        .pivot("event_type", kinds)
        .count()
        .na.fill(0, kinds)
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# Set operations
# --------------------------------------------------------------------------
@register(
    "s1_set_ops",
    oracle="""
    WITH cn AS (SELECT DISTINCT c_nationkey AS nk FROM customer),
         sn AS (SELECT DISTINCT s_nationkey AS nk FROM supplier)
    SELECT
        (SELECT count(*) FROM (SELECT nk FROM cn UNION SELECT nk FROM sn))     AS n_union,
        (SELECT count(*) FROM (SELECT nk FROM cn UNION ALL SELECT nk FROM sn)) AS n_union_all,
        (SELECT count(*) FROM (SELECT nk FROM cn INTERSECT SELECT nk FROM sn)) AS n_intersect,
        (SELECT count(*) FROM (SELECT nk FROM cn EXCEPT SELECT nk FROM sn))    AS n_except,
        (SELECT count(*) FROM (SELECT nk FROM cn INTERSECT ALL SELECT nk FROM sn)) AS n_intersect_all,
        (SELECT count(*) FROM (SELECT nk FROM cn EXCEPT ALL SELECT nk FROM sn))    AS n_except_all
    """,
    doc="union / unionAll / intersect / except cardinalities.",
    tags=("setop",),
)
def s1(spark: SparkSession, sf_dir: str) -> DataFrame:
    cn = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk")).distinct()
    sn = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk")).distinct()
    n_union = cn.union(sn).distinct().agg(F.count(F.lit(1)).alias("n_union"))
    n_union_all = cn.union(sn).agg(F.count(F.lit(1)).alias("n_union_all"))
    n_intersect = cn.intersect(sn).agg(F.count(F.lit(1)).alias("n_intersect"))
    n_except = cn.exceptAll(sn.distinct()).distinct().agg(
        F.count(F.lit(1)).alias("n_except")
    )
    n_intersect_all = cn.intersectAll(sn).agg(
        F.count(F.lit(1)).alias("n_intersect_all")
    )
    n_except_all = cn.exceptAll(sn).agg(F.count(F.lit(1)).alias("n_except_all"))
    return (
        n_union.crossJoin(n_union_all)
        .crossJoin(n_intersect)
        .crossJoin(n_except)
        .crossJoin(n_intersect_all)
        .crossJoin(n_except_all)
    )


# --------------------------------------------------------------------------
# Window frames & analytics
# --------------------------------------------------------------------------
@register(
    "w2_window_frames",
    oracle="""
    SELECT
        user_id,
        event_id,
        round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING), 2)             AS running_value,
        round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS avg3
    FROM events
    ORDER BY user_id, event_id
    """,
    doc="Running sum (cumulative frame) + sliding 3-row average — the "
    "cumulative-stream-time capability (convert.sh:64 duration_time).",
    tags=("window", "frames"),
)
def w2(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select(
            "user_id",
            "event_id",
            F.round(
                F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2
            ).alias("running_value"),
            F.round(F.avg("value").over(w.rowsBetween(-2, 0)), 6).alias("avg3"),
        )
        .orderBy("user_id", "event_id")
    )


@register(
    "w3_lag_lead_ntile",
    oracle="""
    SELECT
        user_id,
        event_id,
        lag(event_type)  OVER w AS prev_type,
        lead(event_type) OVER w AS next_type,
        ntile(4) OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS quartile
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, event_id
    """,
    doc="lag/lead neighbors + ntile quartiles with deterministic tiebreaks.",
    tags=("window", "analytic"),
)
def w3(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wv = Window.partitionBy("user_id").orderBy(F.desc("value"), "event_id")
    return (
        e.select(
            "user_id",
            "event_id",
            F.lag("event_type").over(w).alias("prev_type"),
            F.lead("event_type").over(w).alias("next_type"),
            F.ntile(4).over(wv).cast("bigint").alias("quartile"),
        )
        .orderBy("user_id", "event_id")
    )


@register(
    "w4_range_frame",
    oracle="""
    SELECT
        user_id,
        event_id,
        CAST(count(*) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts) // 1000
                            RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_last_hour,
        CAST(dense_rank() OVER (PARTITION BY user_id ORDER BY event_type) AS BIGINT) AS type_rank,
        CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS rn
    FROM events
    ORDER BY user_id, event_id
    """,
    doc="RANGE frame (value/time-based window: events in the trailing "
    "hour) + dense_rank + row_number.",
    tags=("window", "frames"),
)
def w4(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    # rangeBetween needs a numeric ordering key: MICROseconds since epoch —
    # seconds truncation diverges from the oracle's INTERVAL arithmetic on
    # sub-second boundary collisions (observed at sf0.1)
    w_range = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    w_type = Window.partitionBy("user_id").orderBy("event_type")
    w_rn = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select(
            "user_id",
            "event_id",
            F.count(F.lit(1)).over(w_range).alias("n_last_hour"),
            F.dense_rank().over(w_type).cast("bigint").alias("type_rank"),
            F.row_number().over(w_rn).cast("bigint").alias("rn"),
        )
        .orderBy("user_id", "event_id")
    )


@register(
    "s2_sort_nulls_ordering",
    oracle="""
    WITH t AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE c_acctbal END AS bal
        FROM customer
    )
    SELECT c_custkey, bal,
           CAST(row_number() OVER (ORDER BY bal DESC NULLS LAST, c_custkey) AS BIGINT)  AS rank_nulls_last,
           CAST(row_number() OVER (ORDER BY bal ASC  NULLS FIRST, c_custkey) AS BIGINT) AS rank_nulls_first
    FROM t
    ORDER BY c_custkey
    """,
    doc="Multi-key sort with explicit NULLS FIRST/LAST placement.",
    tags=("sort", "null"),
)
def s2(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    t = c.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 5 == 0, None)
        .otherwise(F.col("c_acctbal"))
        .alias("bal"),
    )
    w_last = Window.orderBy(F.desc_nulls_last("bal"), "c_custkey")
    w_first = Window.orderBy(F.asc_nulls_first("bal"), "c_custkey")
    return (
        t.select(
            "c_custkey",
            "bal",
            F.row_number().over(w_last).cast("bigint").alias("rank_nulls_last"),
            F.row_number().over(w_first).cast("bigint").alias("rank_nulls_first"),
        )
        .orderBy("c_custkey")
    )


# --------------------------------------------------------------------------
# Scalar function families
# --------------------------------------------------------------------------
@register(
    "f1_string_functions",
    oracle="""
    SELECT
        c_custkey,
        upper(substring(c_name, 1, 8))                       AS prefix,
        regexp_extract(c_name, '([0-9]+)$', 1)               AS digits,
        CAST(length(c_name) AS BIGINT)                       AS name_len,
        concat_ws('-', lower(c_mktsegment), CAST(c_nationkey AS VARCHAR)) AS seg_key,
        replace(c_name, 'Customer', 'C')                     AS short_name,
        CAST(strpos(c_name, '#') AS BIGINT)                  AS hash_pos,
        trim(concat('  ', c_mktsegment, ' '))                AS trimmed
    FROM customer
    ORDER BY c_custkey
    """,
    doc="String family: substring/upper/lower/regexp_extract/length/"
    "concat_ws/replace/instr/trim (reference R2 filename parsing).",
    tags=("scalar", "string"),
)
def f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    return (
        c.select(
            "c_custkey",
            F.upper(F.substring("c_name", 1, 8)).alias("prefix"),
            F.regexp_extract("c_name", r"([0-9]+)$", 1).alias("digits"),
            F.length("c_name").cast("bigint").alias("name_len"),
            F.concat_ws(
                "-", F.lower("c_mktsegment"), F.col("c_nationkey").cast("string")
            ).alias("seg_key"),
            F.regexp_replace("c_name", "Customer", "C").alias("short_name"),
            F.instr(F.col("c_name"), "#").cast("bigint").alias("hash_pos"),
            F.trim(F.concat(F.lit("  "), F.col("c_mktsegment"), F.lit(" "))).alias(
                "trimmed"
            ),
        )
        .orderBy("c_custkey")
    )


@register(
    "f2_datetime_functions",
    oracle="""
    SELECT
        o_orderkey,
        CAST(year(o_orderdate) AS BIGINT)   AS o_year,
        CAST(month(o_orderdate) AS BIGINT)  AS o_month,
        dayname(o_orderdate)                AS o_dayname,
        o_orderdate + INTERVAL 90 DAY       AS due_date,
        date_trunc('month', o_orderdate)    AS o_month_start,
        CAST(epoch(o_orderdate) AS BIGINT)  AS epoch_s,
        CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS days_since_95
    FROM orders
    ORDER BY o_orderkey
    """,
    doc="Date/time family: year/month/dayname/interval-add/date_trunc "
    "(ISO-8601 handling, reference manager.py:296).",
    tags=("scalar", "datetime"),
)
def f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            F.month("o_orderdate").cast("bigint").alias("o_month"),
            F.date_format("o_orderdate", "EEEE").alias("o_dayname"),
            (F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")).alias("due_date"),
            F.date_trunc("month", F.col("o_orderdate")).alias("o_month_start"),
            F.unix_timestamp("o_orderdate").alias("epoch_s"),
            F.datediff(
                F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")
            )
            .cast("bigint")
            .alias("days_since_95"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "f3_math_functions",
    oracle="""
    SELECT
        p_partkey,
        round(sqrt(p_retailprice), 6)            AS sqrt_price,
        round(pow(p_size, 2), 1)                 AS size_sq,
        CAST(floor(p_retailprice) AS DOUBLE)     AS floor_price,
        CAST(ceil(p_retailprice) AS DOUBLE)      AS ceil_price,
        abs(p_size - 25)                         AS size_dev,
        round(ln(p_retailprice), 6)              AS ln_price,
        p_size % 5                               AS size_mod,
        round(p_retailprice * 1.1 - 3, 3)        AS derived
    FROM part
    ORDER BY p_partkey
    """,
    doc="Math family: sqrt/pow/floor/ceil/abs/ln/mod/arithmetic "
    "(reference R8 size-reduction metric, bc scale=3).",
    tags=("scalar", "math"),
)
def f3(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return (
        p.select(
            "p_partkey",
            F.round(F.sqrt("p_retailprice"), 6).alias("sqrt_price"),
            F.round(F.pow("p_size", F.lit(2)), 1).alias("size_sq"),
            F.floor("p_retailprice").cast("double").alias("floor_price"),
            F.ceil("p_retailprice").cast("double").alias("ceil_price"),
            F.abs(F.col("p_size") - 25).alias("size_dev"),
            F.round(F.log("p_retailprice"), 6).alias("ln_price"),
            (F.col("p_size") % 5).alias("size_mod"),
            F.round(F.col("p_retailprice") * 1.1 - 3, 3).alias("derived"),
        )
        .orderBy("p_partkey")
    )


@register(
    "f4_map_explode",
    oracle="""
    SELECT c_custkey, 'acctbal' AS key, c_acctbal AS value FROM customer
    UNION ALL
    SELECT c_custkey, 'nationkey', CAST(c_nationkey AS DOUBLE) FROM customer
    ORDER BY c_custkey, key
    """,
    doc="create_map + explode(map) → key/value rows (parsed-props pattern).",
    tags=("scalar", "map"),
)
def f4(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    return (
        c.select(
            "c_custkey",
            F.explode(
                F.create_map(
                    F.lit("acctbal"),
                    F.col("c_acctbal"),
                    F.lit("nationkey"),
                    F.col("c_nationkey").cast("double"),
                )
            ).alias("key", "value"),
        )
        .orderBy("c_custkey", "key")
    )


@register(
    "f5_hash_functions",
    oracle="""
    SELECT
        doc_id,
        md5(text)    AS h_md5,
        sha256(text) AS h_sha256
    FROM documents
    ORDER BY doc_id
    """,
    doc="Hash family: md5 + sha2-256 (reference R11 uses openssl digests).",
    tags=("scalar", "hash"),
)
def f5(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            F.md5(F.col("text").cast("binary")).alias("h_md5"),
            F.sha2(F.col("text").cast("binary"), 256).alias("h_sha256"),
        )
        .orderBy("doc_id")
    )


@register(
    "f7_null_semantics",
    oracle="""
    WITH t AS (
        SELECT c_custkey,
               nullif(c_mktsegment, 'BUILDING') AS seg_or_null,
               CASE WHEN c_custkey % 10 = 0 THEN NULL ELSE c_acctbal END AS bal_or_null
        FROM customer
    )
    SELECT
        CAST(count(*) AS BIGINT)                   AS n_rows,
        CAST(count(seg_or_null) AS BIGINT)         AS n_seg_nonnull,
        CAST(sum(CASE WHEN seg_or_null IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_seg_null,
        CAST(sum(CASE WHEN seg_or_null IS NOT DISTINCT FROM NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_safe_eq,
        round(coalesce(sum(bal_or_null), 0), 2)    AS sum_bal_skipnull,
        round(avg(coalesce(bal_or_null, 0)), 6)    AS avg_bal_fillnull
    FROM t
    """,
    doc="NULL semantics: nullif, null-skipping aggregates, null-safe "
    "equality (eqNullSafe / IS NOT DISTINCT FROM), coalesce fill.",
    tags=("scalar", "null"),
)
def f7(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    t = c.select(
        "c_custkey",
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg_or_null"),
        F.when(F.col("c_custkey") % 10 == 0, None)
        .otherwise(F.col("c_acctbal"))
        .alias("bal_or_null"),
    )
    return t.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("seg_or_null").alias("n_seg_nonnull"),
        F.sum(F.when(F.col("seg_or_null").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_seg_null"),
        F.sum(
            F.when(F.col("seg_or_null").eqNullSafe(F.lit(None)), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_null_safe_eq"),
        F.round(F.coalesce(F.sum("bal_or_null"), F.lit(0.0)), 2).alias(
            "sum_bal_skipnull"
        ),
        F.round(F.avg(F.coalesce("bal_or_null", F.lit(0.0))), 6).alias(
            "avg_bal_fillnull"
        ),
    )


@register(
    "f8_array_functions",
    oracle="""
    WITH tok AS (
        SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
        FROM documents
    )
    SELECT
        doc_id,
        CAST(len(toks) AS BIGINT)                         AS n,
        array_to_string(toks[1:3], ',')                   AS first3,
        list_contains(toks, 'table')                      AS has_table,
        CAST(list_sum(list_transform(toks, t -> length(t))) AS BIGINT) AS total_len,
        array_to_string(list_sort(list_distinct(toks)), ',') AS sorted_distinct
    FROM tok
    ORDER BY doc_id
    """,
    doc="Array family: size/slice/contains/transform+aggregate (HOF)/"
    "distinct/sort/join.",
    tags=("scalar", "array"),
)
def f8(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda t: t != "")
    t = d.select("doc_id", toks.alias("toks"))
    return (
        t.select(
            "doc_id",
            F.size("toks").cast("bigint").alias("n"),
            F.array_join(F.slice("toks", 1, 3), ",").alias("first3"),
            F.array_contains("toks", "table").alias("has_table"),
            F.aggregate(
                F.transform("toks", lambda x: F.length(x)),
                F.lit(0),
                lambda acc, x: acc + x,
            )
            .cast("bigint")
            .alias("total_len"),
            F.array_join(F.array_sort(F.array_distinct("toks")), ",").alias(
                "sorted_distinct"
            ),
        )
        .orderBy("doc_id")
    )


@register(
    "f9_json_struct_roundtrip",
    oracle="""
    SELECT
        event_id,
        CAST(json_extract(props, '$.k') AS INTEGER)                     AS k,
        to_json(struct_pack(k := CAST(json_extract(props, '$.k') AS INTEGER))) AS rebuilt
    FROM events
    ORDER BY event_id
    """,
    doc="from_json with explicit schema + to_json re-serialization "
    "(the sidecar write-back path, R4).",
    tags=("scalar", "json"),
)
def f9(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    # Bind the parse once: referencing the from_json expression from
    # both output columns in ONE projection would evaluate it twice per
    # row (CollapseProject refuses to merge the two-step form below
    # precisely because the alias is used twice and the expression is
    # non-cheap — the DataFrame-level let_expr).
    return (
        e.select("event_id", F.from_json("props", "k INT").alias("__p"))
        .select(
            "event_id",
            F.col("__p.k").alias("k"),
            F.to_json(F.struct(F.col("__p.k").alias("k"))).alias("rebuilt"),
        )
        .orderBy("event_id")
    )


@register(
    "f6_conditional_case",
    oracle="""
    SELECT
        o_orderkey,
        CASE WHEN o_totalprice >= 300000 THEN 'high'
             WHEN o_totalprice >= 100000 THEN 'mid'
             ELSE 'low' END AS price_band,
        CASE WHEN o_orderstatus = 'F' THEN 'final' ELSE 'open' END AS status_label,
        coalesce(nullif(o_orderpriority, '3-MEDIUM'), 'default') AS prio
    FROM orders
    ORDER BY o_orderkey
    """,
    doc="CASE WHEN branching + nullif/coalesce (reference R6 audio/video branch).",
    tags=("scalar", "conditional"),
)
def f6(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            F.when(F.col("o_totalprice") >= 300000, "high")
            .when(F.col("o_totalprice") >= 100000, "mid")
            .otherwise("low")
            .alias("price_band"),
            F.when(F.col("o_orderstatus") == "F", "final")
            .otherwise("open")
            .alias("status_label"),
            F.coalesce(
                F.nullif(F.col("o_orderpriority"), F.lit("3-MEDIUM")), F.lit("default")
            ).alias("prio"),
        )
        .orderBy("o_orderkey")
    )


_J7_SQL = """
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_above
    FROM orders o
    WHERE o.o_totalprice > (
        SELECT 1.5 * avg(i.o_totalprice)
        FROM orders i WHERE i.o_custkey = o.o_custkey
    )
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
"""


@register(
    "j7_correlated_scalar_subquery",
    oracle=_J7_SQL,
    doc="Correlated scalar subquery: orders priced above 1.5x their own "
    "customer's average, by priority. Runs through spark.sql — Catalyst "
    "decorrelates the subquery into an aggregate + join (SURVEY §4.2's "
    "'subquery decorrelation' claim, exercised), so execution is one "
    "shuffle on o_custkey, not a per-row re-scan.",
    tags=("relational", "subquery", "sql"),
)
def j7(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_J7_SQL)


_J8_SQL = """
    SELECT c.c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_quiet_customers
    FROM customer c
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
    )
    AND EXISTS (SELECT 1 FROM orders o2 WHERE o2.o_custkey = c.c_custkey)
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
"""


@register(
    "j8_exists_subqueries",
    oracle=_J8_SQL,
    doc="EXISTS / NOT EXISTS subqueries via spark.sql: customers with "
    "at least one order but none above 300k, by segment. Catalyst "
    "rewrites the pair into left-semi + left-anti joins — the SQL "
    "surface over the same join machinery j2/j3 verify via the "
    "DataFrame API.",
    tags=("relational", "subquery", "sql"),
)
def j8(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_J8_SQL)


@register(
    "a11_cms_heavy_hitters",
    oracle="""
    WITH w AS (
        SELECT unnest(list_filter(string_split(text, ' '), t -> t <> ''))
                   AS v
        FROM documents
    ), sk AS (
        SELECT r.range AS r,
               ('0x' || substr(md5(r.range::VARCHAR || ':' || v), 1, 8))
                   ::BIGINT % 256 AS b,
               count(*)::BIGINT AS cnt
        FROM w CROSS JOIN range(4) r
        GROUP BY 1, 2
    ), exact AS (
        SELECT v, count(*)::BIGINT AS exact_cnt
        FROM w GROUP BY v
        ORDER BY exact_cnt DESC, v LIMIT 20
    ), cand AS (
        SELECT e.v, e.exact_cnt, r.range AS r,
               ('0x' || substr(md5(r.range::VARCHAR || ':' || e.v), 1, 8))
                   ::BIGINT % 256 AS b
        FROM exact e CROSS JOIN range(4) r
    )
    SELECT c.v AS word,
           any_value(c.exact_cnt) AS exact_cnt,
           min(coalesce(s.cnt, 0))::BIGINT AS cms_est,
           (min(coalesce(s.cnt, 0)) - any_value(c.exact_cnt))::BIGINT
               AS overcount
    FROM cand c LEFT JOIN sk s ON s.r = c.r AND s.b = c.b
    GROUP BY c.v
    ORDER BY exact_cnt DESC, word
    """,
    doc="Count-Min sketch heavy hitters (Cormode & Muthukrishnan 2005) "
    "over the portable md5 hash family: a 4x256 mergeable bucket-count "
    "sketch built in one map-side-combinable groupBy (kilobytes of "
    "state at any corpus size — the skew/heavy-hitter diagnostic for "
    "100 TB), point-queried for the exact top-20 words. The sketch "
    "CELLS, the estimates, and the one-sided overcount (est >= exact, "
    "always) are all hash-verified cross-engine — the a9/KMV pattern "
    "for counting sketches.",
    tags=("agg", "approx", "sketch", "topk"),
)
def a11(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tw_etl_spark.operators.sketch import cms_counts, cms_estimate

    d = _t(spark, sf_dir, "documents")
    words = d.select(
        F.explode(
            F.filter(F.split("text", " "), lambda t: t != "")
        ).alias("v")
    )
    sketch = cms_counts(words, "v", depth=4, width=256).localCheckpoint()
    exact = (
        words.groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), "v")
        .limit(20)
    )
    est = cms_estimate(exact, sketch, "v", depth=4, width=256)
    return (
        exact.join(est, "v")
        .select(
            F.col("v").alias("word"),
            "exact_cnt",
            "cms_est",
            (F.col("cms_est") - F.col("exact_cnt")).cast("long").alias("overcount"),
        )
        .orderBy(F.desc("exact_cnt"), "word")
    )


def _a13_oracle() -> str:
    from tw_etl_spark.functions.rounding import sql_round_ratio

    frac = sql_round_ratio("n_le", "total", 6)
    return f"""
    WITH v AS (
        SELECT value::DOUBLE AS v FROM events
        WHERE value IS NOT NULL AND NOT isnan(value::DOUBLE)
    ), stats AS (
        SELECT min(v) AS lo, max(v) AS hi, count(*)::BIGINT AS total FROM v
    ), binned AS (
        SELECT CASE WHEN s.hi = s.lo THEN 0 ELSE
                   least(63, floor((v.v - s.lo) / (s.hi - s.lo) * 64.0))
               END::BIGINT AS idx,
               count(*)::BIGINT AS cnt
        FROM v, stats s GROUP BY 1
    ), cum AS (
        SELECT idx, sum(cnt) OVER (ORDER BY idx)::BIGINT AS cum FROM binned
    ), ps AS (
        SELECT unnest([25, 50, 75, 90, 99]::BIGINT[]) AS p
    ), crossing AS (
        SELECT p, min(idx) AS idx, any_value(lo) AS lo, any_value(hi) AS hi,
               any_value(total) AS total
        FROM ps, cum, stats
        WHERE cum * 100 >= p * total
        GROUP BY p
    ), est AS (
        SELECT p, lo + (idx + 1) * (hi - lo) / 64.0 AS est, total
        FROM crossing
    ), le AS (
        SELECT e.p, e.est, e.total, count(*)::BIGINT AS n_le
        FROM v, est e WHERE v.v <= e.est
        GROUP BY e.p, e.est, e.total
    )
    SELECT p, est, n_le, {frac} AS frac_le
    FROM le ORDER BY p
    """


@register(
    "a13_histogram_quantiles",
    oracle=_a13_oracle(),
    doc="Equi-width histogram quantile estimation — the mergeable "
    "quantile sketch beside KMV (a9, cardinality) and Count-Min (a11, "
    "heavy hitters): 64 bin counts summed map-side, percentile "
    "estimate = upper edge of the first bin whose cumulative count "
    "crosses p% (exact-integer crossing test, never a float "
    "threshold). The estimates, the <=-counts, and the exact covered "
    "fraction (frac_le >= p/100 by construction) are all "
    "hash-verified; the one-bin-width error bound is unit-tested "
    "against exact percentiles.",
    tags=("agg", "approx", "sketch", "percentile"),
)
def a13(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tw_etl_spark.operators.sketch import histogram_quantiles

    e = _t(spark, sf_dir, "events")
    return histogram_quantiles(e, "value", bins=64)


@register(
    "a12_kmv_set_algebra",
    oracle="""
    WITH d AS (
        SELECT DISTINCT event_type AS s, md5(user_id::VARCHAR) AS h
        FROM events
    ), r AS (
        SELECT s, h, row_number() OVER (PARTITION BY s ORDER BY h) AS rn
        FROM d
    ), sk AS (
        SELECT s, h, rn FROM r WHERE rn <= 64
    ), per AS (
        SELECT s, count(*) AS n_sk,
               max(CASE WHEN rn = 64 THEN h END) AS hk
        FROM sk GROUP BY s
    ), est AS (
        SELECT s, CASE WHEN n_sk < 64 THEN n_sk::DOUBLE
                       ELSE 63.0 / (('0x' || substr(hk, 1, 12))::BIGINT
                                    / 281474976710656.0) END AS e
        FROM per
    ), pairs AS (
        SELECT a.s AS set_a, b.s AS set_b, a.e AS est_a, b.e AS est_b
        FROM est a JOIN est b ON a.s < b.s
    ), psk AS (
        SELECT DISTINCT set_a, set_b, h FROM (
            SELECT p.set_a, p.set_b, k.h
            FROM pairs p JOIN sk k ON k.s = p.set_a
            UNION ALL
            SELECT p.set_a, p.set_b, k.h
            FROM pairs p JOIN sk k ON k.s = p.set_b
        )
    ), ur AS (
        SELECT set_a, set_b, h,
               row_number() OVER (PARTITION BY set_a, set_b ORDER BY h) AS rn
        FROM psk
    ), un AS (
        SELECT set_a, set_b, count(*) AS n_sk,
               max(CASE WHEN rn = 64 THEN h END) AS hk
        FROM ur WHERE rn <= 64 GROUP BY set_a, set_b
    ), uest AS (
        SELECT set_a, set_b,
               CASE WHEN n_sk < 64 THEN n_sk::DOUBLE
                    ELSE 63.0 / (('0x' || substr(hk, 1, 12))::BIGINT
                                 / 281474976710656.0) END AS est_union
        FROM un
    )
    SELECT p.set_a, p.set_b,
           round(p.est_a, 4) AS est_a,
           round(p.est_b, 4) AS est_b,
           round(u.est_union, 4) AS est_union,
           round(greatest(0.0, p.est_a + p.est_b - u.est_union), 4)
               AS est_intersect,
           round(greatest(0.0, p.est_a + p.est_b - u.est_union)
                 / u.est_union, 6) AS est_jaccard
    FROM pairs p JOIN uest u USING (set_a, set_b)
    ORDER BY set_a, set_b
    """,
    doc="KMV sketch SET ALGEBRA (the Theta-sketch use case): per-pair "
    "union cardinality from the merged k-smallest hashes, intersection "
    "by inclusion-exclusion, and the Jaccard estimate — across every "
    "pair of per-event-type user sets. Sketches merge by taking the k "
    "smallest of the combined sketch rows (never re-reading data) — "
    "the defining mergeable-sketch property — and every estimate is "
    "hash-verified cross-engine (the a9 pattern applied to set "
    "operations).",
    tags=("agg", "approx", "sketch", "setop"),
)
def a12(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tw_etl_spark.operators.sketch import kmv_set_algebra

    e = _t(spark, sf_dir, "events")
    return kmv_set_algebra(e, "event_type", "user_id", k=64)


@register(
    "j80_salted_skew_join",
    oracle="""
    WITH fact AS (
        SELECT CASE WHEN l_orderkey % 10 < 8 THEN 0
                    ELSE l_suppkey % 50 END AS k,
               l_extendedprice AS price
        FROM lineitem
    ), dim AS (
        SELECT s_suppkey % 50 AS k, min(s_name) AS label
        FROM supplier GROUP BY s_suppkey % 50
    )
    SELECT f.k, d.label,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(f.price), 2) AS revenue
    FROM fact f JOIN dim d USING (k)
    GROUP BY f.k, d.label
    ORDER BY f.k
    """,
    doc="Skew-resilient salted equi-join (operators/joins.salted_join): "
    "a synthetic 80%%-hot key over lineitem joined to a 50-row dim on "
    "(key, salt) — the fact side salts by row hash, the dim side "
    "replicates via posexplode, so the hot key spreads across 8 tasks "
    "instead of one. The REWRITE is the operator under test: the "
    "oracle is the plain join (result-identity is the salting "
    "contract, also property-tested incl. left-join null rows), and "
    "the salted exchange shape is plan-asserted. This is the 100 TB "
    "lever for keys hotter than AQE's skew-partition splitting can "
    "absorb.",
    tags=("join", "skew", "salting", "ext"),
)
def j80(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tw_etl_spark.operators.joins import salted_join

    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    fact = l.select(
        F.when(F.col("l_orderkey") % 10 < 8, F.lit(0).cast("long"))
        .otherwise(F.col("l_suppkey") % 50)
        .alias("k"),
        F.col("l_extendedprice").alias("price"),
    )
    dim = s.groupBy((F.col("s_suppkey") % 50).alias("k")).agg(
        F.min("s_name").alias("label")
    )
    return (
        salted_join(fact, dim, "k", n_salts=8)
        .groupBy("k", "label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.sum("price"), 2).alias("revenue"),
        )
        .orderBy("k")
    )
