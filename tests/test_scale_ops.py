"""Scale-path operators: salting equals direct aggregation/join, and
bucketed tables join without a shuffle."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from tw_etl_spark.catalog import read_table
from tw_etl_spark.operators.skew import salted_agg, salted_broadcast_left
from tw_etl_spark.plans.inspect import explain_str
from tests.conftest import SF_SMOKE


def test_salted_agg_matches_direct(spark):
    l = read_table(spark, SF_SMOKE, "lineitem")
    direct = {
        (r.l_returnflag,): (r.n, round(r.s, 2))
        for r in l.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("s"))
        .collect()
    }
    salted = {
        (r.l_returnflag,): (r.n, round(r.s, 2))
        for r in salted_agg(
            l,
            ["l_returnflag"],
            32,
            [
                ("n", F.count(F.lit(1)), F.sum("n")),
                ("s", F.sum("l_quantity"), F.sum("s")),
            ],
        ).collect()
    }
    assert direct == salted


def test_salted_broadcast_left_matches_plain_join(spark):
    l = read_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_quantity")
    o = read_table(spark, SF_SMOKE, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = l.join(o, "l_orderkey").count()
    salted = salted_broadcast_left(l, o, "l_orderkey", 8).count()
    assert plain == salted


def test_bucketed_tables_join_without_shuffle(spark, tmp_path):
    """Pre-bucketing both sides on the join key ⇒ sort-merge join with
    zero Exchange — the co-located-join strategy for repeated fact-fact
    joins at scale."""
    l = read_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_quantity")
    o = read_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_totalprice")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("b_lineitem", "b_orders"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(warehouse, t), ignore_errors=True)
    (
        l.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("b_lineitem")
    )
    (
        o.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("b_orders")
    )
    # disable broadcast so the (deliberately small) test tables take the
    # big-table SMJ path the bucketing is designed for
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        bl, bo = spark.table("b_lineitem"), spark.table("b_orders")
        joined = bl.join(bo, bl.l_orderkey == bo.o_orderkey)
        plan = explain_str(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan  # buckets align: no shuffle
        assert joined.count() == l.join(o, l.l_orderkey == o.o_orderkey).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_cascading_rollup_single_base_scan(spark):
    """The day level must re-aggregate hourly partials, not re-scan the
    base: exactly ONE parquet scan of events in the plan, and results
    equal a direct day-level recompute."""
    from tw_etl_spark.operators.rollup import cascading_rollup

    e = read_table(spark, SF_SMOKE, "events")
    r = cascading_rollup(
        e, "ts", [],
        [("n", F.count(F.lit(1)), F.sum("n")),
         ("sv", F.sum("value"), F.sum("sv"))],
        grains=["hour", "day"],
    )
    # the fine level is persisted, so both union branches read the
    # cached hourly rollup — the base table is scanned once at runtime
    plan = explain_str(r)
    assert "InMemoryRelation" in plan or "InMemoryTableScan" in plan, plan
    direct = {
        r2.bucket: (r2.n, round(r2.sv, 6))
        for r2 in e.groupBy(F.date_trunc("day", "ts").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv"))
        .collect()
    }
    cascaded = {
        r2.bucket: (r2.n, round(r2.sv, 6))
        for r2 in r.filter(F.col("grain") == "day").collect()
    }
    assert cascaded == direct


def test_merge_upsert_semantics_and_broadcast_plan(spark):
    """merge_upsert: updates win on key collision, unmatched updates
    insert, base keys stay unique; with broadcast_updates the snapshot
    side is never shuffled (BroadcastHashJoin LeftAnti, no Exchange)."""
    from pyspark.sql import functions as F

    from tw_etl_spark.operators.merge import merge_upsert
    from tw_etl_spark.plans.inspect import count_exchanges, explain_str

    base = spark.range(0, 1000).select(
        F.col("id").alias("k"), F.lit("old").alias("v")
    )
    updates = spark.createDataFrame(
        [(5, "new"), (999, "new"), (5000, "ins")], "k long, v string"
    )
    out = merge_upsert(base, updates, ["k"])
    got = {r.k: r.v for r in out.collect()}
    assert len(got) == 1001  # 1000 base keys + 1 insert, no dup keys
    assert got[5] == "new" and got[999] == "new" and got[5000] == "ins"
    assert got[0] == "old"

    plan = explain_str(out)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert count_exchanges(out) == 0, "base side must not shuffle"


def test_deterministic_shuffle_is_partitioning_invariant(spark):
    """The permutation is a pure function of (id, salt): identical
    whether computed as a global sort or as a range-partitioned sort at
    any partition count, and a different salt draws a different order."""
    from tw_etl_spark.operators.sampling import deterministic_shuffle

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    global_order = [
        r.doc_id for r in deterministic_shuffle(df, "doc_id", salt="s").collect()
    ]
    for nparts in (2, 7):
        ranged = deterministic_shuffle(
            df, "doc_id", salt="s", num_partitions=nparts
        )
        # reading range partitions in partition order yields the same
        # global permutation (contiguous, internally sorted key ranges)
        via_parts = [
            r.doc_id
            for r in ranged.select("doc_id", "shuffle_key")
            .toLocalIterator()
        ]
        assert via_parts == global_order, nparts
    other = [
        r.doc_id for r in deterministic_shuffle(df, "doc_id", salt="t").collect()
    ]
    assert other != global_order and sorted(other) == sorted(global_order)


def test_scd2_merge_semantics_and_plan(spark):
    """scd2_merge: changed keys close the current version and append a
    replacement; no-op updates vanish; new keys insert as first
    versions; historical rows pass through; the base side never
    hash-partitions."""
    import datetime

    from pyspark.sql import functions as F

    from tw_etl_spark.operators.merge import scd2_merge
    from tw_etl_spark.plans.inspect import explain_str

    d0 = datetime.date(2020, 1, 1)
    d1 = datetime.date(2021, 6, 1)
    base = spark.createDataFrame(
        [
            # k=1: one historical + one current version
            (1, 10.0, d0, d1, False),
            (1, 11.0, d1, None, True),
            # k=2: current, will get a no-op update
            (2, 20.0, d0, None, True),
            # k=3: current, untouched by updates
            (3, 30.0, d0, None, True),
        ],
        "k long, price double, effective_from date, effective_to date, is_current boolean",
    )
    ch = datetime.date(2024, 3, 15)
    upd = spark.createDataFrame(
        [(1, 12.0, ch), (2, 20.0, ch), (9, 90.0, ch)],
        "k long, price double, effective_from date",
    )
    out = scd2_merge(base, upd, keys=["k"], payload_cols=["price"])
    rows = sorted(
        ((r.k, r.price, r.effective_from, r.effective_to, r.is_current)
         for r in out.collect())
    )
    assert rows == sorted([
        (1, 10.0, d0, d1, False),       # history untouched
        (1, 11.0, d1, ch, False),       # old current closed at change date
        (1, 12.0, ch, None, True),      # replacement current
        (2, 20.0, d0, None, True),      # no-op update dropped
        (3, 30.0, d0, None, True),      # untouched
        (9, 90.0, ch, None, True),      # new key inserted
    ])

    # exactly one current row per live key, histories ordered
    cur = out.filter("is_current").groupBy("k").count().collect()
    assert all(r["count"] == 1 for r in cur)

    # base side shuffle-free: the ONLY hash exchange is the tiny
    # matched-keys distinct (<= |updates| rows); everything touching the
    # base is a broadcast join. Assert on a FRESH plan in simple mode —
    # a collected AQE plan prints Final+Initial trees and double-counts.
    fresh = scd2_merge(base, upd, keys=["k"], payload_cols=["price"])
    plan = explain_str(fresh, "simple")
    assert "BroadcastHashJoin" in plan
    # the only hash exchanges are DELTA-side (the latest-row-per-key
    # reduction subtree, re-planned under each of u's three uses, plus
    # the matched-keys distinct — each <= |updates| rows); every join
    # against the base is a broadcast
    assert plan.count("Exchange hashpartitioning") <= 4
    assert plan.count("BroadcastExchange") >= 3


def test_aqe_splits_skewed_join_partition(spark):
    """The 100 TB skew posture: session.py enables AQE skew-join; this
    proves it actually fires. A 97%-one-key fact joined to a non-
    broadcastable side, with thresholds scaled down to fixture size,
    must show OptimizeSkewedJoin splits (skew=true / more partitions
    after AQE than the static shuffle would have)."""
    from pyspark.sql import functions as F

    old = {
        k: spark.conf.get(k, None)
        for k in [
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        ]
    }
    try:
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        fact = spark.range(0, 200_000).select(
            F.when(F.col("id") % 100 < 97, F.lit(7)).otherwise(F.col("id")).alias("k"),
            F.concat(F.lit("payload_"), F.col("id")).alias("v"),
        )
        dim = spark.range(0, 200_000).select(
            F.col("id").alias("k"), F.lit("d").alias("dv")
        )
        joined = fact.join(dim, "k")
        # collect() runs THIS DataFrame's QueryExecution, so its AQE
        # plan finalizes (count()/write() plan separate executions)
        assert len(joined.collect()) == 200_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan.lower(), plan[:3000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_scd2_merge_duplicate_update_keys_reduced(spark):
    """Duplicate-keyed updates reduce to the latest row per key (max
    eff_from, payload tiebreak) so one pass still yields exactly one
    current row per key."""
    import datetime

    from tw_etl_spark.operators.merge import scd2_merge

    d0 = datetime.date(2020, 1, 1)
    ch1 = datetime.date(2024, 3, 15)
    ch2 = datetime.date(2024, 9, 1)
    base = spark.createDataFrame(
        [(1, 10.0, d0, None, True)],
        "k long, price double, effective_from date, effective_to date, is_current boolean",
    )
    upd = spark.createDataFrame(
        [(1, 11.0, ch1), (1, 12.0, ch2), (1, 11.5, ch1), (7, 70.0, ch1), (7, 71.0, ch2)],
        "k long, price double, effective_from date",
    )
    out = scd2_merge(base, upd, keys=["k"], payload_cols=["price"]).collect()
    cur = {r.k: r for r in out if r.is_current}
    assert set(cur) == {1, 7}
    # latest eff_from wins for both keys
    assert (cur[1].price, cur[1].effective_from) == (12.0, ch2)
    assert (cur[7].price, cur[7].effective_from) == (71.0, ch2)
    # k=1: history row + closed row + replacement = 3 rows total
    k1 = sorted((r.price, r.is_current) for r in out if r.k == 1)
    assert k1 == [(10.0, False), (12.0, True)]
    assert len(out) == 3


def test_aqe_splits_skewed_ppjoin_candidate_join(spark):
    """VERDICT r6 #6: the dd2 prefix-filter candidate join under a
    crafted hot-prefix corpus (one boilerplate token in 100% of docs,
    max_df unset, threshold 0.5 so the hot token lands inside every
    prefix) must get AQE skew handling — the hot token funnels every
    doc through one (tk) hash partition.

    Every byte knob is scaled to fixture size PROPORTIONALLY, including
    coalescePartitions.minPartitionSize: at its 1MB default every
    fixture partition is "small", so the coalescer merges the skewed
    partition into its neighbors BEFORE OptimizeSkewedJoin sees it and
    the skew structure vanishes — a fixture-scale artifact (bisected:
    skew fires with coalescing off, or with minPartitionSize scaled
    down). At production scale the hot partition is GBs, far above
    both knobs, and never gets coalesced away."""
    from pyspark.sql import functions as F

    from tw_etl_spark.operators.dedup import exact_jaccard_pairs

    knobs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "512b",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "512b",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in knobs}
    try:
        for k, v in knobs.items():
            spark.conf.set(k, v)
        docs = spark.range(0, 3000).select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit("boilerplate_header_token uniq_"), F.col("id")
            ).alias("text"),
        )
        pairs = exact_jaccard_pairs(docs, threshold=0.5, max_df=None)
        # hot-token pairs share 1 of 3 union tokens -> jaccard 1/3 < 0.5:
        # the result is empty, but 3000^2/2 candidates flowed through the
        # skewed (tk) partition to compute it.
        assert pairs.collect() == []
        plan = pairs._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan.lower(), plan[:3000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
