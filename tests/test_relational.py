"""Operator-level invariants not expressible as oracle hash-matches."""

from __future__ import annotations

from pyspark.sql import functions as F

from tw_etl_spark.catalog import read_table
from tw_etl_spark.operators.joins import asof_join, bucketed_range_join, interval_join
from tw_etl_spark.queries import all_queries
from tests.conftest import SF_SMOKE


def test_approx_count_distinct_error_band(spark):
    row = all_queries()["a6_approx_count_distinct"].spark(spark, SF_SMOKE).first()
    # HLL++ default rsd = 5%; allow 3x margin
    assert abs(row.approx_users - row.exact_users) <= max(3, 0.15 * row.exact_users)
    assert abs(row.approx_events - row.exact_events) <= 0.15 * row.exact_events


def test_bucketed_range_join_matches_naive(spark):
    e = read_table(spark, SF_SMOKE, "events")
    # intervals: one per user day with [start, start+2h)
    iv = (
        e.groupBy("user_id")
        .agg(F.min("ts").alias("start"))
        .withColumn("end", F.col("start") + F.expr("INTERVAL 2 HOURS"))
        .select(F.col("user_id").alias("iv_user"), "start", "end")
    )
    pts = e.select("event_id", "ts")
    naive = interval_join(pts, iv, F.col("ts"), F.col("start"), F.col("end"))
    bucketed = bucketed_range_join(pts, iv, "ts", "start", "end", bucket_seconds=3600)
    assert naive.count() == bucketed.count()
    a = {(r.event_id, r.iv_user) for r in naive.collect()}
    b = {(r.event_id, r.iv_user) for r in bucketed.collect()}
    assert a == b


def test_asof_join_no_match_yields_null(spark):
    left = spark.createDataFrame(
        [("k", 10, "L1"), ("k", 5, "L0")], ["k", "t", "lv"]
    ).withColumn("t", F.col("t").cast("timestamp"))
    right = spark.createDataFrame([("k", 7, "R7")], ["k", "t", "rv"]).withColumn(
        "t", F.col("t").cast("timestamp")
    )
    out = {
        r.lv: r.rv_asof
        for r in asof_join(left, right, on="t", by="k", right_payload=["rv"]).collect()
    }
    assert out == {"L0": None, "L1": "R7"}  # L0 precedes the only right row


def test_asof_join_null_payload_survives(spark):
    # A matched right row whose payload is genuinely NULL must surface
    # that NULL (DuckDB ASOF LEFT JOIN semantics), not an older row's
    # non-NULL value.
    left = spark.createDataFrame(
        [("k", 10, "L@10"), ("k", 4, "L@4")], ["k", "t", "lv"]
    ).withColumn("t", F.col("t").cast("timestamp"))
    right = spark.createDataFrame(
        [("k", 3, "R3"), ("k", 8, None)], ["k", "t", "rv"]
    ).withColumn("t", F.col("t").cast("timestamp"))
    res = asof_join(left, right, on="t", by="k", right_payload=["rv"]).collect()
    out = {r.lv: (r.rv_asof, r.t_asof) for r in res}
    # L@10 matches the t=8 row -> NULL payload but non-NULL matched time
    assert out["L@10"][0] is None
    assert out["L@10"][1] is not None and out["L@10"][1].second == 8
    assert out["L@4"][0] == "R3"


def test_e3_session_window_boundary_matches_strict_gap_rule(spark):
    # e3 uses batch session_window; the oracle's new-session rule is the
    # STRICT `ts > prev_ts + INTERVAL 30 MINUTE`. Spark must therefore
    # merge an event at exactly prev_ts + 30:00 (inclusive session end)
    # and split one microsecond past it.
    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (1, base),
        (1, base + datetime.timedelta(minutes=30)),  # exact: same session
        (2, base),
        (2, base + datetime.timedelta(minutes=30, microseconds=1)),  # new
        (3, base),
        (3, base + datetime.timedelta(minutes=29, seconds=59, microseconds=999999)),
    ]
    df = spark.createDataFrame(rows, "user_id INT, ts TIMESTAMP")
    out = {
        r.user_id: r.n
        for r in df.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .count()
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert out == {1: 1, 2: 2, 3: 1}


def test_e3_null_event_time_dropped(spark):
    """e3's pinned NULL semantics: events with NULL event time are
    EXCLUDED from sessionization on both sides (explicit isNotNull in
    the query, IS NOT NULL in the oracle). session_window would drop
    them silently anyway — the no-filter variant must agree with the
    filtered one, so a future fixture gaining NULL timestamps cannot
    silently flip the green hash."""
    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (1, base),
        (1, base + datetime.timedelta(minutes=5)),
        (1, None),  # no event time: not sessionizable
        (2, None),  # user with ONLY null-ts events: absent from output
    ]
    df = spark.createDataFrame(rows, "user_id INT, ts TIMESTAMP")

    def sessions(d):
        return {
            r.user_id: (r.n_sessions, r.n_events)
            for r in d.groupBy("user_id", F.session_window("ts", "30 minutes"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n_sessions"),
                F.sum("cnt").alias("n_events"),
            )
            .collect()
        }

    filtered = sessions(df.filter(F.col("ts").isNotNull()))
    unfiltered = sessions(df)
    assert filtered == {1: (1, 2)}   # the NULL row is not counted
    assert unfiltered == filtered    # session_window drops NULLs itself


def test_e2_from_json_string_encoded_numbers_pinned(spark):
    """e2 extracts props.k via from_json('k DOUBLE'), which yields NULL
    for STRING-encoded numbers ({"k":"1.5"}) where a cast-based extract
    (and the DuckDB oracle) would parse 1.5. Pin that divergence, and
    guard the fixture: e2 stays oracle-green only while props carries k
    as a JSON number."""
    df = spark.createDataFrame(
        [('{"k":1.5}',), ('{"k":"1.5"}',), ('{"k":null}',), ("{}",)],
        ["props"],
    )
    got = [
        r.v
        for r in df.select(F.from_json("props", "k DOUBLE")["k"].alias("v")).collect()
    ]
    assert got == [1.5, None, None, None]

    events = read_table(spark, SF_SMOKE, "events")
    quoted = events.filter(F.col("props").rlike(r'"k"\s*:\s*"')).count()
    assert quoted == 0, "fixture now string-encodes props.k; e2 oracle will diverge"


def test_kmv_distinct_exact_branch_and_error(spark):
    """KMV sketch (a9's operator): groups with < k distinct values are
    EXACT (the sketch saw everything); groups far past k estimate
    within the sketch's standard error (~1/sqrt(k-2) ≈ 12.7% at k=64,
    asserted at 3 sigma)."""
    from pyspark.sql import functions as F

    from tw_etl_spark.operators.sketch import kmv_distinct

    df = spark.range(0, 20_000).select(
        F.when(F.col("id") < 30, "small").otherwise("big").alias("g"),
        # 30 distinct values in 'small'; 5000 distinct in 'big'
        F.when(F.col("id") < 30, F.col("id")).otherwise(F.col("id") % 5000).alias("v"),
    )
    got = {r.g: (r.est_distinct, r.n_exact_le_k) for r in kmv_distinct(df, ["g"], "v", k=64).collect()}
    assert got["small"] == (30.0, True)
    est, exact_flag = got["big"]
    assert not exact_flag
    assert abs(est - 5000) / 5000 < 3 * 0.127, est


def test_cms_collisions_are_one_sided(spark):
    """Force Count-Min collisions (1000 distinct values into a 4x8
    sketch) and assert the CMS contract: every estimate >= the true
    count (one-sided), collisions actually occur (some overcount > 0 —
    a sketch this small cannot be exact), and a skewed heavy hitter's
    estimate is still dominated by its own mass."""
    from pyspark.sql import functions as F

    from tw_etl_spark.operators.sketch import cms_counts, cms_estimate

    # 1000 distinct light values (1 occurrence each) + one heavy value
    # (500 occurrences)
    light = spark.range(1000).select(
        F.concat(F.lit("v"), F.col("id").cast("string")).alias("v")
    )
    heavy = spark.range(500).select(F.lit("HEAVY").alias("v"))
    occ = light.unionByName(heavy)
    sketch = cms_counts(occ, "v", depth=4, width=8).localCheckpoint()

    exact = occ.groupBy("v").agg(F.count(F.lit(1)).alias("exact_cnt"))
    est = cms_estimate(exact, sketch, "v", depth=4, width=8)
    rows = exact.join(est, "v").collect()
    assert len(rows) == 1001
    overs = [r.cms_est - r.exact_cnt for r in rows]
    assert all(o >= 0 for o in overs)          # one-sided, no exceptions
    assert any(o > 0 for o in overs)           # collisions really happen
    heavy_row = next(r for r in rows if r.v == "HEAVY")
    assert 500 <= heavy_row.cms_est            # its own mass survives


def test_funnel_ordering_semantics_crafted(spark):
    """Known-answer funnel check pinning the strictly-after chaining:
    a click BEFORE the first view does not advance the funnel (u2's
    09:00 click is ignored; its 09:45 click counts), a purchase before
    the first qualifying click never counts (u4), view-only users
    reach stage 1 only (u3), and users with no view never enter (u5)."""
    from pyspark.sql import functions as F

    from tw_etl_spark.queries import all_queries

    rows = [
        (1, "2024-01-01 10:00:00", "view"),
        (1, "2024-01-01 10:05:00", "click"),
        (1, "2024-01-01 10:20:00", "purchase"),
        (2, "2024-01-01 09:00:00", "click"),      # before first view: no
        (2, "2024-01-01 09:30:00", "view"),
        (2, "2024-01-01 09:45:00", "click"),      # counts, gap 900 s
        (3, "2024-01-01 08:00:00", "view"),       # stage 1 only
        (4, "2024-01-01 07:00:00", "purchase"),   # before click: no
        (4, "2024-01-01 07:30:00", "view"),
        (4, "2024-01-01 07:40:00", "click"),      # gap 600 s
        (5, "2024-01-01 06:00:00", "click"),      # never viewed
        (5, "2024-01-01 06:10:00", "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts_s string, event_type string"
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"), "event_type")

    import tempfile

    d = tempfile.mkdtemp(prefix="e6_crafted_")
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    # the query reads via the catalog; give it a minimal sf_dir layout
    got = {
        r.stage: (r.n_users, r.avg_gap_s)
        for r in all_queries()["e6_funnel"].spark(spark, d).collect()
    }
    assert got == {
        "1_view": (4, None),
        "2_click": (3, 600.0),   # (300 + 900 + 600) / 3
        "3_purchase": (1, 900.0),
    }


def test_histogram_quantiles_error_bound(spark):
    """The histogram estimate must bracket the true quantile from
    above by at most one bin width: true_q <= est <= true_q + w
    (upper-edge rule), and the emitted coverage fraction must be
    >= p/100 — on the real fixture, not a toy."""
    from pyspark.sql import functions as F

    from tw_etl_spark.catalog import read_table
    from tw_etl_spark.operators.sketch import histogram_quantiles
    from tests.conftest import SF_SMOKE

    e = read_table(spark, SF_SMOKE, "events").filter(F.col("value").isNotNull())
    stats = e.agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    ).collect()[0]
    width = (stats.hi - stats.lo) / 64.0
    exact = e.agg(
        *[
            F.expr(f"percentile(value, {p / 100})").alias(f"q{p}")
            for p in (25, 50, 75, 90, 99)
        ]
    ).collect()[0]
    got = {r.p: r for r in histogram_quantiles(e, "value", bins=64).collect()}
    for p in (25, 50, 75, 90, 99):
        true_q = getattr(exact, f"q{p}")
        r = got[p]
        assert true_q <= r.est + 1e-9, (p, true_q, r.est)
        assert r.est - true_q <= width + 1e-9, (p, true_q, r.est, width)
        assert r.frac_le >= p / 100


def test_kmv_set_algebra_discriminates_overlap(spark):
    """The fixture's user sets fully overlap (jaccard 1.0 rows), so
    prove the algebra on crafted sets: A=1..1000, B=501..1500 (true
    union 1500, intersection 500, J=1/3) and C=2001..2500 disjoint
    from A. KMV at k=64 has relative error ~1/sqrt(k) ~ 12.5%; assert
    a generous +/-35% band and near-zero for the disjoint pair."""
    from pyspark.sql import functions as F

    from tw_etl_spark.operators.sketch import kmv_set_algebra

    a = spark.range(1, 1001).select(F.lit("A").alias("s"), F.col("id").alias("v"))
    b = spark.range(501, 1501).select(F.lit("B").alias("s"), F.col("id").alias("v"))
    c = spark.range(2001, 2501).select(F.lit("C").alias("s"), F.col("id").alias("v"))
    df = a.unionByName(b).unionByName(c)
    got = {
        (r.set_a, r.set_b): r
        for r in kmv_set_algebra(df, "s", "v", k=64).collect()
    }
    ab = got[("A", "B")]
    assert abs(ab.est_union - 1500) / 1500 < 0.35
    assert abs(ab.est_intersect - 500) / 500 < 0.75   # differences amplify
    assert 0.05 < ab.est_jaccard < 0.75               # far from both 0 and 1
    ac = got[("A", "C")]
    assert ac.est_jaccard < 0.25                      # near-disjoint reads low
    assert ab.est_jaccard > ac.est_jaccard            # ordering preserved


def test_cms_estimate_unseen_candidate_returns_zero(spark):
    """ADVICE r9: a candidate whose bucket cells are absent from the
    sketch (value never occurred) must come back with cms_est = 0, and
    a candidate sharing SOME cells with data must take 0 from its empty
    cells (min over depth rows, absent = 0), never inflate."""
    from pyspark.sql import functions as F

    from tw_etl_spark.operators.sketch import cms_counts, cms_estimate

    occ = spark.range(3).select(
        F.concat(F.lit("seen"), F.col("id").cast("string")).alias("v")
    )
    sketch = cms_counts(occ, "v", depth=4, width=256).localCheckpoint()
    cands = spark.createDataFrame(
        [("seen0",), ("never-in-data",)], "v string"
    )
    got = {r.v: r.cms_est for r in cms_estimate(cands, sketch, "v", depth=4, width=256).collect()}
    assert set(got) == {"seen0", "never-in-data"}   # nobody vanishes
    assert got["never-in-data"] == 0                # absent cells count 0
    assert got["seen0"] >= 1                        # one-sided still holds


def test_histogram_quantiles_constant_column(spark):
    """ADVICE r9: all-equal values made the bin ratio 0/0 = NaN (an
    ANSI long-cast error); the hi == lo short-circuit must put
    everything in bin 0 with est = the constant."""
    from pyspark.sql import functions as F

    from tw_etl_spark.operators.sketch import histogram_quantiles

    df = spark.range(100).select(F.lit(42.5).alias("value"))
    rows = histogram_quantiles(df, "value", bins=64).collect()
    assert [r.p for r in rows] == [25, 50, 75, 90, 99]
    for r in rows:
        assert r.est == 42.5
        assert r.n_le == 100
        assert r.frac_le == 1.0


def test_kmeans_assign_single_centroid(spark):
    """ADVICE r9: len(cents) == 1 built sequence(1, 0) — a DESCENDING
    sequence in Spark — so the fold read past the 1-element distance
    array (ANSI ARRAY_INDEX_OUT_OF_BOUNDS). The short-circuit must
    assign everything to cluster 0."""
    from pyspark.sql import functions as F

    from tw_etl_spark.operators.dedup import kmeans_assign_expr

    df = spark.createDataFrame(
        [([1.0, 0.0],), ([0.0, 1.0],)], "u array<double>"
    )
    got = df.select(kmeans_assign_expr([[0.5, 0.5]]).alias("c")).collect()
    assert [r.c for r in got] == [0, 0]


def test_pagerank_integer_known_answer(spark):
    """Hand-computed integer PageRank on a 3-node star (center c=0,
    leaves a=1, b=2, symmetric edges): two iterations of the exact
    damping rule (15e6 + 85*S) // 100 with floor contributions."""
    from tw_etl_spark.operators.graph import pagerank_integer

    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 0), (2, 0)], "src long, dst long"
    )
    r1 = {
        r.node: r.rank_micro
        for r in pagerank_integer(edges, iterations=1).collect()
    }
    # leaves get floor(1e6/2)=500000 from c: (15e6 + 85*500000)//100
    # = 575000; c gets 1e6+1e6: (15e6 + 85*2e6)//100 = 1850000
    assert r1 == {0: 1_850_000, 1: 575_000, 2: 575_000}
    r2 = {
        r.node: r.rank_micro
        for r in pagerank_integer(edges, iterations=2).collect()
    }
    # leaves: floor(1850000/2)=925000 -> (15e6+85*925000)//100=936250
    # c: 575000+575000=1150000 -> (15e6+85*1150000)//100=1127500
    assert r2 == {0: 1_127_500, 1: 936_250, 2: 936_250}


def test_salted_join_result_identical_to_plain(spark):
    """The salting contract: inner and left salted joins return exactly
    the plain join's multiset, including left-join null rows for
    unmatched fact keys and fan-out on duplicate dim keys."""
    import pytest

    from tw_etl_spark.operators.joins import salted_join

    fact = spark.createDataFrame(
        [(0, i) for i in range(500)]  # hot key
        + [(k, 1000 + k) for k in range(1, 20)]  # cool keys
        + [(99, -1)],  # unmatched in dim
        "k long, v long",
    )
    dim = spark.createDataFrame(
        [(k, f"d{k}") for k in range(20)] + [(5, "dup5")],  # duplicate key
        "k long, label string",
    )

    def canon(df):
        return sorted(map(tuple, df.collect()))

    for how in ("inner", "left"):
        plain = canon(fact.join(dim, "k", how))
        salted = canon(salted_join(fact, dim, "k", n_salts=8, how=how))
        assert salted == plain, how
    with pytest.raises(ValueError):
        salted_join(fact, dim, "k", how="full")


def test_salted_join_map_columns_and_salt_collision(spark):
    """Salt-derivation edge cases (ADVICE r10): a map-typed fact column
    must not break the rewrite (xxhash64 rejects MapType — it is
    excluded from the salt hash), and a pre-existing '__salt' column on
    either side is rejected loudly instead of silently overwritten."""
    import pytest
    from pyspark.sql import functions as F

    from tw_etl_spark.operators.joins import salted_join

    fact = spark.createDataFrame(
        [(k % 3, k) for k in range(30)], "k long, v long"
    ).withColumn("attrs", F.create_map(F.lit("a"), F.col("v")))
    dim = spark.createDataFrame(
        [(k, f"d{k}") for k in range(3)], "k long, label string"
    )
    plain = sorted((r.k, r.v, r.label) for r in fact.join(dim, "k").collect())
    salted = sorted(
        (r.k, r.v, r.label)
        for r in salted_join(fact, dim, "k", n_salts=4).collect()
    )
    assert salted == plain

    # nested map (struct<...map...>) must be excluded too
    nested = fact.withColumn(
        "s", F.struct(F.col("attrs").alias("m"), F.col("v").alias("w"))
    )
    assert salted_join(nested, dim, "k", n_salts=4).count() == 30

    with pytest.raises(ValueError, match="__salt"):
        salted_join(fact.withColumn("__salt", F.lit(1)), dim, "k")
    with pytest.raises(ValueError, match="__salt"):
        salted_join(fact, dim.withColumn("__salt", F.lit(1)), "k")


def test_pagerank_source_nodes_keep_teleport_mass(spark):
    """Textbook teleport semantics for general digraphs: a source node
    with out-edges but NO in-edges must keep receiving (1-d)*scale each
    round instead of silently vanishing after its first distribution.
    Graph: s -> a, a <-> b (s is a pure source)."""
    from tw_etl_spark.operators.graph import pagerank_integer

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 1)], "src long, dst long"
    )
    for iters in (2, 3):
        got = {
            r.node: r.rank_micro
            for r in pagerank_integer(edges, iterations=iters).collect()
        }
        assert got[0] == 150_000, (iters, got)  # teleport mass only
        assert set(got) == {0, 1, 2}, (iters, got)


def test_pagerank_conserving_known_answer_star_plus_chain(spark):
    """Hand-checkable known answer for conserve_dangling=True: a star
    (1->2, 1->3) plus a dangling chain (3->4; 4 has no out-edges).
    Expected ranks come from an independent pure-Python replay of the
    integer recurrence (floor contribution split, floor(D/N) uniform
    dangling share, floor damping) — the operator must land on it
    bit-exactly, and iteration 1 is additionally pinned by hand below."""
    from tw_etl_spark.operators.graph import pagerank_integer

    edges = [(1, 2), (1, 3), (3, 4)]
    out = {1: [2, 3], 3: [4]}
    nodes = [1, 2, 3, 4]
    scale, d_pct, iters = 1_000_000, 85, 5

    r = {n: scale for n in nodes}
    for _ in range(iters):
        dm = sum(v for n, v in r.items() if n not in out)  # dangling mass
        share = dm // len(nodes)
        s_in = {n: 0 for n in nodes}
        for u, vs in out.items():
            for v in vs:
                s_in[v] += r[u] // len(vs)
        r = {
            n: (15 * scale + d_pct * (s_in[n] + share)) // 100
            for n in nodes
        }

    # hand pin of iteration 1 (from all-at-scale): dangling = {2, 4},
    # D = 2e6, share = 500000; node 1 gets 0 in-contribs ->
    # (15e6 + 85*500000)//100 = 575000
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        row.node: row.rank_micro
        for row in pagerank_integer(
            df, iterations=iters, conserve_dangling=True
        ).collect()
    }
    assert got == r
    got1 = {
        row.node: row.rank_micro
        for row in pagerank_integer(
            df, iterations=1, conserve_dangling=True
        ).collect()
    }
    assert got1[1] == 575_000


def test_pagerank_conserving_rank_sum_and_noop_properties(spark):
    """(a) Conservation: total rank stays within the floor-loss band
    [N*scale - iters*(E + 2N), N*scale]; without the flag the same
    dangling-heavy graph bleeds rank well below that band. (b) On a
    graph with NO dangling nodes the flag is a no-op."""
    from pyspark.sql import functions as F

    from tw_etl_spark.operators.graph import pagerank_integer

    # dangling-heavy: 6 sources each pointing at 2 of 8 sinks
    edges = [(i, 100 + (i * 2) % 8) for i in range(6)] + [
        (i, 100 + (i * 2 + 1) % 8) for i in range(6)
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    n_nodes, n_edges, scale, iters = 6 + 8, len(edges), 1_000_000, 5

    total_cons = (
        pagerank_integer(df, iterations=iters, conserve_dangling=True)
        .agg(F.sum("rank_micro"))
        .first()[0]
    )
    band_lo = n_nodes * scale - iters * (n_edges + 2 * n_nodes)
    assert band_lo <= total_cons <= n_nodes * scale, total_cons

    total_plain = (
        pagerank_integer(df, iterations=iters, conserve_dangling=False)
        .agg(F.sum("rank_micro"))
        .first()[0]
    )
    assert total_plain < band_lo  # the absorbed-mass bleed is real

    # no dangling nodes -> flag is a no-op (identical result set)
    sym = df.union(
        df.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    a = {
        (r.node, r.rank_micro)
        for r in pagerank_integer(sym, iterations=3).collect()
    }
    b = {
        (r.node, r.rank_micro)
        for r in pagerank_integer(
            sym, iterations=3, conserve_dangling=True
        ).collect()
    }
    assert a == b
