"""Plan-shape regression tests: the scale guarantees (pushdown, pruning,
broadcast) asserted on real query plans."""

from __future__ import annotations

from pyspark.sql import functions as F

from tw_etl_spark.catalog import read_table
from tw_etl_spark.plans.inspect import (
    count_exchanges,
    explain_str,
    has_broadcast_join,
    has_forced_broadcast,
    pushed_filters,
    read_schema_columns,
)
from tw_etl_spark.queries import all_queries
from tests.conftest import SF_SMOKE


def test_q6_filters_pushed_to_scan(spark):
    df = all_queries()["q6_forecast_revenue"].spark(spark, SF_SMOKE)
    pf = " ".join(pushed_filters(df))
    assert "l_shipdate" in pf and "l_discount" in pf and "l_quantity" in pf


def test_q6_column_pruning(spark):
    df = all_queries()["q6_forecast_revenue"].spark(spark, SF_SMOKE)
    cols = read_schema_columns(df)[0]
    # only the 4 referenced columns are read, not all 11
    assert set(cols) == {"l_shipdate", "l_discount", "l_quantity", "l_extendedprice"}


def test_q3_broadcasts_customer(spark):
    """Customer broadcasts by Catalyst's scan-size stats, NOT a pinned
    hint (customer is SF-proportional; the hint would be wrong at true
    scale — VERDICT r9)."""
    df = all_queries()["q3_topk_revenue"].spark(spark, SF_SMOKE)
    assert has_broadcast_join(df)
    assert not has_forced_broadcast(df)


def test_q5_single_fact_shuffle(spark):
    """Q5's only shuffle joins should be the fact-fact join + final agg;
    all dimension joins broadcast — by stats, not pinned hints (customer
    and supplier are SF-proportional)."""
    df = all_queries()["q5_nation_revenue"].spark(spark, SF_SMOKE)
    plan = explain_str(df)
    assert plan.count("BroadcastHashJoin") >= 4
    assert plan.count("SortMergeJoin") <= 1
    assert not has_forced_broadcast(df)


def test_projection_only_reads_needed_columns(spark):
    l = read_table(spark, SF_SMOKE, "lineitem")
    df = l.select("l_orderkey", "l_quantity")
    assert read_schema_columns(df) == [["l_orderkey", "l_quantity"]]


def test_topk_uses_take_ordered(spark):
    df = all_queries()["q3_topk_revenue"].spark(spark, SF_SMOKE)
    assert "TakeOrderedAndProject" in explain_str(df)


def test_whole_stage_codegen_on_agg_path(spark):
    df = all_queries()["q1_pricing_summary"].spark(spark, SF_SMOKE)
    assert "WholeStageCodegen subtrees" in explain_str(df, "codegen")


def test_v1_no_shuffle_of_pair_space(spark):
    """The broadcast-matmul similarity scan must not shuffle the N×N
    pair space — allowed exchanges are the deliberate input spread
    (N rows) and the final top-k merge, nothing else."""
    df = all_queries()["v1_cosine_top_pairs"].spark(spark, SF_SMOKE)
    assert count_exchanges(df) <= 2


def test_t8_idf_join_is_broadcast(spark):
    """TF-IDF's vocabulary (idf) and corpus-size joins must broadcast —
    the per-doc TF table is the only side allowed to shuffle."""
    df = all_queries()["t8_tfidf_top_terms"].spark(spark, SF_SMOKE)
    plan = explain_str(df)
    assert plan.count("BroadcastHashJoin") >= 1
    assert "BroadcastNestedLoopJoin" in plan  # 1-row corpus-count cross join


def test_x5_benchmark_set_is_broadcast(spark):
    """Decontamination must broadcast the benchmark n-gram hash set so
    the corpus-side membership test needs no shuffle of exploded grams."""
    df = all_queries()["x5_benchmark_decontaminate"].spark(spark, SF_SMOKE)
    plan = explain_str(df)
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_j7_subquery_is_decorrelated(spark):
    """The correlated scalar subquery must decorrelate into an
    aggregate + equi-join on o_custkey — never a per-row re-scan
    (no nested-loop / cartesian join in the physical plan)."""
    from tw_etl_spark.queries import all_queries

    df = all_queries()["j7_correlated_scalar_subquery"].spark(
        spark, "/root/testdata/sf0.001"
    )
    plan = explain_str(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "HashAggregate" in plan and "Join" in plan


def test_quality_batteries_are_narrow_maps(spark):
    """t11/t12 (Gopher + C4) must compile to shuffle-free narrow maps —
    the only acceptable 100 TB shape for per-document filters. (Their
    final orderBy exists for oracle determinism; exclude it the way a
    pipeline would by asserting on the unsorted operator itself.)"""
    from tw_etl_spark.operators.quality import c4_clean, gopher_flags

    d = read_table(spark, SF_SMOKE, "documents")
    assert count_exchanges(gopher_flags(d)) == 0
    assert count_exchanges(c4_clean(d)) == 0


def test_dd3p_pair_shuffle_never_carries_signatures(spark):
    """dd3p's shuffle discipline (same claim as dd3's docstring, here
    plan-asserted): the candidate-pair distinct shuffles ONLY
    (id_a, id_b) — on dup-heavy corpora each band bucket emits O(d^2)
    pairs, so dragging the 16x32-byte signatures (or band buckets)
    through that exchange would multiply shuffle bytes ~100x."""
    from tw_etl_spark.operators.dedup import minhash_lsh_pairs_portable

    d = read_table(spark, SF_SMOKE, "documents")
    # Parameterization unique to this test: the operator cache()s its
    # signature frame, and if another test already MATERIALIZED the
    # same (num_hashes, bands) plan this session, explain renders the
    # AQE final plan of the cached subtree and the exchange blocks
    # move. A fresh parameterization keeps the pre-execution shape.
    plan = explain_str(minhash_lsh_pairs_portable(d, num_hashes=8, bands=2))
    # formatted-explain operator details are blank-line-separated blocks
    pair_exchanges = [
        b
        for b in plan.split("\n\n")
        if ") Exchange" in b and "hashpartitioning(id_a" in b
    ]
    assert pair_exchanges, "expected a hashpartitioning(id_a, id_b) exchange"
    for block in pair_exchanges:
        assert "sig" not in block and "bucket" not in block, block


def test_t15_classifier_is_a_narrow_map(spark):
    """The hashed-linear quality classifier (t15) scores per row via an
    array fold — like the rule batteries it must compile to a
    shuffle-free narrow map (scan-speed at 100 TB). Assert on the
    unsorted projection (the query's orderBy exists for oracle
    determinism only)."""
    from pyspark.sql import functions as F

    from tw_etl_spark.operators.quality import hashed_linear_score_cols

    d = read_table(spark, SF_SMOKE, "documents")
    n_tokens, z, score, keep = hashed_linear_score_cols(F.col("text"))
    scored = d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        z.alias("z"),
        score.alias("score"),
        keep.alias("keep"),
    )
    assert count_exchanges(scored) == 0


def test_w20_shares_one_exchange_across_window_specs(spark):
    """The window gauntlet evaluates four differently-ordered window
    specs, all partitioned by user_id: one hash Exchange, re-Sorts only.
    A plan that re-exchanges per spec would shuffle events 4x at scale."""
    df = all_queries()["w20_window_gauntlet"].spark(spark, SF_SMOKE)
    plan = explain_str(df)
    # exchanges: 1 hash partition on user_id + the final orderBy's range
    # exchange for oracle determinism; nothing per-window-spec
    n_hash = plan.count("hashpartitioning")
    assert n_hash == 1, f"expected one hash exchange, got {n_hash}"
    assert plan.count("rangepartitioning") == 1  # the deterministic orderBy only


def test_probe_media_is_shuffle_free(spark):
    from tw_etl_spark.operators.multimodal import (
        probe_media,
        synthesize_real_media_df,
    )

    d = read_table(spark, SF_SMOKE, "documents")
    assert count_exchanges(probe_media(synthesize_real_media_df(d))) == 0


def test_dd9_two_shuffles_only(spark):
    """dd9's exploded gram table must shuffle exactly twice — once on
    the gram hash (both duplicate-detection window counts share that
    exchange) and once on doc for the island merge; the only other
    exchange is the deterministic orderBy's range partitioning. A
    third hash exchange means the groupBy+semi-join formulation (two
    full corpus scans) crept back."""
    spec = all_queries()["dd9_duplicate_spans"]
    plan = explain_str(spec.spark(spark, SF_SMOKE), "simple")
    n_hash = plan.count("Exchange hashpartitioning")
    assert n_hash == 2, f"expected 2 hash exchanges, got {n_hash}\n{plan[:2000]}"
    assert plan.count("Exchange rangepartitioning") == 1


def test_m1_payload_never_shuffles(spark):
    """m1's 100 TB contract: binary payloads are decoded/fingerprinted
    inside the map stage; only md5s and scalar metadata cross the
    media_id joins. No Exchange in the plan may carry the payload (or
    meta struct) column — at scale that shuffle would move the entire
    binary corpus."""
    spec = all_queries()["m1_media_sidecar_probe"]
    df = spec.spark(spark, SF_SMOKE)
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
    plan = df._jdf.queryExecution().explainString(mode.fromString("formatted"))
    exchange_blocks = [
        b
        for b in plan.split("\n\n")
        if b.strip().startswith("(") and "Exchange" in b.splitlines()[0]
    ]
    assert exchange_blocks, "expected formatted Exchange blocks"
    for b in exchange_blocks:
        inputs = next(l for l in b.splitlines() if l.startswith("Input"))
        assert "payload#" not in inputs, b[:300]
        assert "meta#" not in inputs, b[:300]


def test_e2_json_parse_is_single_field_from_json(spark):
    """e2 must parse props with an explicit single-field schema
    (from_json), not get_json_object's per-row document re-walk —
    measured 1.8x at sf1, and the gap grows linearly with rows."""
    df = all_queries()["e2_json_extract_avg"].spark(spark, SF_SMOKE)
    plan = explain_str(df)
    assert "get_json_object" not in plan
    assert "from_json" in plan


def test_e3_sessionization_single_user_exchange(spark):
    """Batch session_window sessionization: one hash exchange on
    user_id feeds both the session agg and the per-user rollup; the
    only other exchange is the deterministic orderBy's range partition."""
    df = all_queries()["e3_sessionization"].spark(spark, SF_SMOKE)
    plan = explain_str(df)
    n_hash = plan.count("hashpartitioning")
    assert n_hash == 1, f"expected one hash exchange, got {n_hash}"
    assert plan.count("rangepartitioning") == 1


def test_d2_dedup_hash_is_noncryptographic(spark):
    """d2's engine-side content hash must be the single-pass
    xxhash64/crc32 pair, not md5 (1.47x at sf1); and the two-phase
    distinct keeps hashes, never text, in the exchange."""
    df = all_queries()["d2_exact_dedup"].spark(spark, SF_SMOKE)
    plan = explain_str(df)
    assert "xxhash64" in plan
    assert "md5" not in plan


def test_j9_interval_join_pushes_filters_and_rechecks_exactly(spark):
    """j9's bucketed interval join: both selectivity predicates reach
    the parquet scans (no post-scan filter of the full tables), the
    bucket equi-join carries the EXACT range predicate as its residual
    condition, and there is no nested-loop / cartesian fallback."""
    df = all_queries()["j9_interval_overlap"].spark(spark, SF_SMOKE)
    plan = explain_str(df)
    assert "450000" in plan  # totalprice filter pushed into the orders scan
    assert "2001-06-01" in plan  # shipdate window pushed into lineitem scan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # the exact interval predicate survives as the join residual
    assert "l_shipdate" in plan and ">= start" in plan and "< end" in plan


def test_v4p_ivf_assignments_are_narrow_maps(spark):
    """v4p's shuffle discipline: both centroid assignments ride as
    literal-centroid expressions (zero exchanges on the corpus list
    assignment), and the full query's only exchanges are the list_id
    candidate join + the per-query rank window — never a shuffle of
    the k-means itself (its two collects are k-row bounded)."""
    from pyspark.sql import functions as F

    from tw_etl_spark.operators.dedup import (
        kmeans_assign_expr,
        relational_kmeans_centroids,
        unit_vectors,
    )
    from tw_etl_spark.operators.similarity import ann_ivf_portable_topk

    emb = read_table(spark, SF_SMOKE, "embeddings")
    uc = unit_vectors(emb)
    _, cents = relational_kmeans_centroids(uc, 4)
    assigned = uc.select("id", kmeans_assign_expr(cents).alias("list_id"))
    assert count_exchanges(assigned) == 0  # narrow map, scan speed

    q = emb.filter(F.col("vec_id") < 10)
    plan = explain_str(ann_ivf_portable_topk(q, emb, n_lists=4, nprobe=2, k=3))
    blocks = [b for b in plan.split("\n\n") if ") Exchange" in b]
    # the candidate join either BROADCASTS the (small) probe side — the
    # plan Catalyst picks here, ideal when |queries| << |corpus| — or
    # hash-partitions both sides on list_id when stats flip it to SMJ;
    # either way the only other exchange is the per-query rank window,
    # and the corpus is never shuffled for the k-means itself
    if "BroadcastHashJoin" in plan or "BroadcastExchange" in plan:
        shuffles = [b for b in blocks if "BroadcastExchange" not in b]
        assert len(shuffles) <= 1, f"unexpected extra shuffles:\n{plan}"
    else:
        assert len(blocks) <= 3, f"unexpected extra shuffles:\n{plan}"
        assert sum("list_id" in b for b in blocks) >= 2, (
            "non-broadcast candidate join must partition on list_id"
        )


def test_x11_bloom_count_is_narrow_and_verdict_matches_exact(spark):
    """The Bloom membership pass must be a zero-shuffle narrow map (the
    1024-long bitmap rides in the expression as literals; the n-gram
    array is filtered in place, never exploded for the count), and the
    final contaminated verdict must equal ngram_decontaminate's exact
    answer bit for bit (Bloom false positives removed by the verify
    join)."""
    from pyspark.sql import functions as F

    from tw_etl_spark.operators.dedup import bloom_decontaminate, ngram_decontaminate

    d = read_table(spark, SF_SMOKE, "documents")
    bench = d.filter(F.col("doc_id") % 97 == 0)
    corpus = d.filter(F.col("doc_id") % 97 != 0)

    out = bloom_decontaminate(corpus, bench, n=3)
    rows = {r.doc_id: (r.n_grams, r.n_bloom_hits, r.contaminated) for r in out.collect()}
    exact = {
        r.doc_id: r.contaminated
        for r in ngram_decontaminate(corpus, bench, n=3, mark_only=True)
        .select("doc_id", "contaminated")
        .collect()
    }
    assert set(rows) == set(exact)
    for doc, (n_g, n_hit, dirty) in rows.items():
        assert dirty == exact[doc], doc
        assert 0 <= n_hit <= n_g  # bloom pass is a subset of all grams
        if dirty:
            assert n_hit > 0  # no false negatives, ever

    # plan: the scored (count) projection alone must be shuffle-free
    from tw_etl_spark.operators.text import ngrams_expr, tokens_expr  # noqa: F401

    scored_only = corpus.select(
        "doc_id",
        F.size(ngrams_expr(tokens_expr(F.col("text")), 3)).alias("n_grams"),
    )
    assert count_exchanges(scored_only) == 0


def test_dd10_span_rewrite_two_data_exchanges(spark):
    """dd10's data path must shuffle exactly twice — once keyed on the
    chunk text for the keep rule (payload bounded by chunk_tokens) and
    once keyed on doc for reassembly; the rejoin to the id spine stays
    broadcast at test scale (doc-keyed SMJ at corpus scale), and the
    only other exchange is the final global orderBy range partition."""
    import re

    df = all_queries()["dd10_span_dedup_rewrite"].spark(spark, SF_SMOKE)
    plan = explain_str(df)
    hash_ex = re.findall(r"Arguments: hashpartitioning\(([^,#]+)", plan)
    keys = sorted(hash_ex)
    assert keys == ["chunk", "doc"], keys
    assert plan.count("rangepartitioning") == 1
    assert "CartesianProduct" not in plan


def test_e6_funnel_never_forces_broadcast(spark):
    """VERDICT r9: e6's per-user stage tables are DATA-SIZED (one row
    per user — billions at 100 TB), so the plan must carry NO broadcast
    hint: any broadcast at test scale is Catalyst's stats-based call,
    which flips to a shuffle join when the side outgrows the threshold.
    Every stage join AND aggregation keys on user_id, so the chain
    reuses one exchange per event-type slice — assert nothing else is
    hash-partitioned."""
    import re

    df = all_queries()["e6_funnel"].spark(spark, SF_SMOKE)
    assert not has_forced_broadcast(df)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan
    keys = set(re.findall(r"hashpartitioning\(([^,#]+)", plan))
    assert keys <= {"user_id"}, keys


def test_e7_retention_broadcasts_cohort_sizes(spark):
    """e7's retention join attaches the per-cohort size table (<= one
    row per day) by broadcast."""
    df = all_queries()["e7_retention_cohorts"].spark(spark, SF_SMOKE)
    plan = explain_str(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_sketch_tables_broadcast_in_a11_and_a13(spark):
    """The sketch point-query joins must broadcast the kilobyte-sized
    sketch/crossing tables — the corpus side never shuffles for them.
    (a11's exact top-k candidates and a13's second <=-scan are the
    only aggregations allowed to exchange.)"""
    for name in ("a11_cms_heavy_hitters", "a13_histogram_quantiles"):
        df = all_queries()[name].spark(spark, SF_SMOKE)
        plan = explain_str(df)
        assert "Broadcast" in plan, name
        assert "CartesianProduct" not in plan, name


def test_t17_bpe_encode_stage_is_narrow(spark):
    """The BPE ENCODE pass (merges already trained) must be a pure
    narrow map — zero exchanges: at 100 TB this is the stage that
    touches every byte, and it must run at scan speed."""
    from tw_etl_spark.operators.bpe import bpe_tokens_expr

    corpus = read_table(spark, SF_SMOKE, "documents")
    enc_only = corpus.select(
        "doc_id",
        F.size(
            bpe_tokens_expr(F.col("text"), [("t", "h"), ("th", "e")])
        ).alias("n_bpe"),
    )
    assert count_exchanges(enc_only) == 0


def test_x13_quantile_gate_no_data_sized_shuffle(spark):
    """The x13 global-threshold gate: every exchange in the plan is a
    histogram/stats aggregation over <= bins keys (kilobytes at any
    corpus size); the threshold reaches the data pass by broadcast, and
    no data-sized join ever sort-merges. Two scan-speed passes."""
    df = all_queries()["x13_quantile_quality_gate"].spark(spark, SF_SMOKE)
    plan = explain_str(df)
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Broadcast" in plan


def test_x14_resample_membership_is_narrow(spark):
    """importance_resample itself is a pure per-row predicate: given a
    weights table it must add ZERO exchanges — the 100 TB membership
    decision is a narrow map (the deterministic_split contract)."""
    from tw_etl_spark.operators.sampling import importance_resample

    w = read_table(spark, SF_SMOKE, "documents").select(
        "doc_id", (F.col("doc_id") % 1000).alias("w_micro")
    )
    assert count_exchanges(importance_resample(w)) == 0


def test_j80_join_keys_carry_salt(spark):
    """The salted join's keys must be (k, __salt) — otherwise the
    rewrite silently degenerates to the skewed plain join it exists to
    avoid. At fixture scale the salted dim broadcasts (fine — broadcast
    sidesteps skew entirely); with broadcast disabled the shuffle path
    must hash-partition the FACT on (k, __salt)."""
    import re

    df = all_queries()["j80_salted_skew_join"].spark(spark, SF_SMOKE)
    plan = explain_str(df)
    assert re.search(r"keys \[2\]: \[k#\d+L?, __salt", plan), plan

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan2 = explain_str(
            all_queries()["j80_salted_skew_join"].spark(spark, SF_SMOKE)
        )
        assert re.search(r"hashpartitioning\(k#\d+L?, __salt", plan2), plan2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_banded_index_scan_prunes_partitions(spark, tmp_path):
    """The persisted delta index layout (VERDICT r11 #4): banded rows
    land partitionBy(band), so a per-band probe is a PRUNED directory
    scan — PartitionFilters on band, never a full-index read — and the
    candidate-generation read touches only (doc, band, bucket), never
    the signatures (separate artifact)."""
    import re

    from pyspark.sql import functions as F

    from tw_etl_spark.operators.dedup import (
        minhash_signatures_portable,
        read_banded_index,
        write_banded_index,
    )
    from tw_etl_spark.catalog import read_table

    docs = read_table(spark, SF_SMOKE, "documents").limit(200)
    root = str(tmp_path / "idx")
    write_banded_index(
        minhash_signatures_portable(docs, num_hashes=16), root,
        num_hashes=16, bands=4,
    )
    banded, sigs = read_banded_index(spark, root)
    plan = explain_str(banded.filter(F.col("band") == 2))
    assert re.search(r"PartitionFilters: \[[^\]]*band[^\]]*= 2", plan), plan
    # schema of the banded artifact: exactly the candidate-gen columns
    assert {f.name for f in banded.schema.fields} == {"doc", "band", "bucket"}
    assert {f.name for f in sigs.schema.fields} == {"doc_id", "signature"}


def test_prebanded_delta_never_rebands_the_index(spark, tmp_path):
    """lsh_delta_pairs_prebanded's 100 TB contract: the md5 banding
    work in the candidate plan is proportional to the NEW batch only —
    the index side is a parquet scan of pre-banded rows. The plan must
    contain NO md5 computation over the index scan branch: every md5
    in the candidate plan hangs off the new batch's in-memory
    signatures (localCheckpoint), so the banded parquet scan feeds the
    join directly."""
    from pyspark.sql import functions as F

    from tw_etl_spark.operators.dedup import (
        lsh_delta_pairs_prebanded,
        minhash_signatures_portable,
        read_banded_index,
        write_banded_index,
    )
    from tw_etl_spark.catalog import read_table

    docs = read_table(spark, SF_SMOKE, "documents")
    old = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)
    root = str(tmp_path / "idx")
    write_banded_index(
        minhash_signatures_portable(old, num_hashes=16), root,
        num_hashes=16, bands=4,
    )
    banded, sigs = read_banded_index(spark, root)
    pairs, _, _ = lsh_delta_pairs_prebanded(
        new, banded, sigs, num_hashes=16, bands=4, threshold=0.5
    )
    plan = explain_str(pairs)
    # the index branch is a real parquet scan of the banded dir whose
    # ReadSchema contains the STORED bucket column — the buckets come
    # off disk, they are not an md5 Project over the signature table
    # (which is what the non-prebanded form's plan shows: its sigs
    # scan reads `signature` and computes buckets above the scan)
    scan_blocks = [
        b for b in plan.split("\n\n")
        if "Location" in b and "/banded" in b and "ReadSchema" in b
    ]
    assert scan_blocks, plan  # the index scan is really the parquet dir
    assert any("bucket" in b and "md5" not in b for b in scan_blocks), (
        scan_blocks
    )
    # and the contrast: the portable (re-banding) form reads ONLY the
    # signature column from its index and must compute buckets — its
    # index scan has no stored bucket to read
    from tw_etl_spark.operators.dedup import lsh_delta_pairs_portable

    pairs_full, _ = lsh_delta_pairs_portable(
        new, sigs, num_hashes=16, bands=4, threshold=0.5
    )
    full_plan = explain_str(pairs_full)
    full_scans = [
        b for b in full_plan.split("\n\n")
        if "Location" in b and "/sigs" in b and "ReadSchema" in b
    ]
    assert full_scans and all("bucket" not in b for b in full_scans), (
        full_scans
    )


def test_bucketed_survivor_merge_reads_index_without_exchange(spark, tmp_path):
    """The sig-bucketed survivor index (VERDICT r11 #4): the daily
    merge's full-outer join must consume the index branch straight off
    the bucket files — 'Bucketed: true' on the index scan and no
    Exchange between that scan and the join. (The delta branch still
    shuffles — it is delta-sized; the index branch is corpus-sized and
    must not.) autoBucketedScan is pinned OFF for the assertion: its
    heuristic (DisableUnnecessaryBucketedScan) opts out of bucketed
    reads it deems not worth the lost parallelism at toy file counts —
    a tiny-fixture artifact, while the claim under test is that the
    LAYOUT enables the exchange-free read; at corpus scale the
    heuristic keeps the bucketed scan precisely because the Exchange
    it avoids is the expensive one. The writer defaults n_buckets to
    the session's shuffle partitions — measured: Spark only elides the
    index-side Exchange when bucket count == the join's target
    partition count."""
    from pyspark.sql import functions as F

    from tw_etl_spark.operators.dedup import (
        merge_survivor_index_bucketed,
        write_survivor_index_bucketed,
    )

    idx = spark.createDataFrame(
        [(f"s{i % 7}", i, 1) for i in range(50)],
        "sig string, survivor long, n_members long",
    ).groupBy("sig").agg(
        F.min("survivor").alias("survivor"),
        F.count(F.lit(1)).cast("long").alias("n_members"),
    )
    write_survivor_index_bucketed(idx, "test_surv_bucketed")
    auto_key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    old_auto = spark.conf.get(auto_key)
    try:
        spark.conf.set(auto_key, "false")
        index = spark.table("test_surv_bucketed")
        delta = spark.createDataFrame(
            [("s1", 100, 2), ("zz", 9, 1)],
            "sig string, survivor long, n_members long",
        )
        merged = merge_survivor_index_bucketed(index, delta)
        plan = explain_str(merged)
        assert "Bucketed: true" in plan, plan
        # no Exchange between the bucketed scan and the join: in the
        # formatted plan tree the index branch is the lines from the
        # join down to the bucketed scan — an Exchange there means the
        # corpus-sized side re-shuffled and the layout bought nothing
        tree = plan.split("\n\n")[0]
        join_idx = next(
            i for i, ln in enumerate(tree.splitlines()) if "Join" in ln
        )
        scan_idx = next(
            i for i, ln in enumerate(tree.splitlines())
            if "test_surv_bucketed" in ln
        )
        between = tree.splitlines()[join_idx + 1 : scan_idx]
        assert not any("Exchange" in ln for ln in between), tree
        # the merged values match the plain fold exactly
        from tw_etl_spark.operators.dedup import merge_survivor_index

        a = {tuple(r) for r in merged.collect()}
        b = {tuple(r) for r in merge_survivor_index(index, delta).collect()}
        assert a == b
    finally:
        spark.conf.set(auto_key, old_auto)
        spark.sql("DROP TABLE IF EXISTS test_surv_bucketed")


def test_ivf_persisted_probe_is_partition_pruned(spark, tmp_path):
    """The persisted IVF index (v7p): nprobe must surface as parquet
    partition PRUNING on the inverted-lists scan — PartitionFilters on
    list_id with the probed subset, and the probed subset must be a
    STRICT subset of the lists (otherwise the assert is vacuous). This
    is the physical form of 'the unprobed share of the corpus is never
    opened'."""
    import re

    from pyspark.sql import functions as F

    from tw_etl_spark.catalog import read_table
    from tw_etl_spark.operators.similarity import (
        ann_ivf_persisted_topk,
        write_ivf_index,
    )

    v = read_table(spark, SF_SMOKE, "embeddings")
    root = str(tmp_path / "ivf")
    write_ivf_index(v, root, n_lists=16)
    q = v.filter(F.col("vec_id") < 5)
    out = ann_ivf_persisted_topk(q, root, nprobe=2, k=3)
    plan = explain_str(out)
    blocks = [
        b for b in plan.split("\n\n")
        if "Location" in b and "/lists" in b and "PartitionFilters" in b
    ]
    assert blocks, plan
    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", blocks[0]).group(1)
    assert "list_id" in pf, blocks[0]
    # the probed set is a strict subset: 5 queries x 2 probes <= 10 of
    # 16 lists; count the list-id literals in the filter
    probed_ids = set(re.findall(r"\b(\d+)\b", pf))
    assert 0 < len(probed_ids) < 16, pf
    # and the result is non-trivial
    assert out.count() == 15  # 5 queries x top-3


def test_ivf_append_never_scans_existing_lists_and_pruning_survives(
    spark, tmp_path
):
    """v8p's plan contract: (1) the append job's write plan reads ONLY
    the new batch — the existing inverted lists never appear as a scan
    (the 100 TB already indexed is not re-read to add a day's batch);
    (2) after the append, the persisted-index query still partition-
    prunes on list_id over the MERGED lists (old + appended files sit
    in the same probed directories)."""
    import re

    from pyspark.sql import functions as F

    from tw_etl_spark.catalog import read_table
    from tw_etl_spark.operators.dedup import (
        kmeans_assign_expr,
        unit_vectors,
    )
    from tw_etl_spark.operators.similarity import (
        ann_ivf_persisted_topk,
        append_ivf_index,
        write_ivf_index,
    )

    v = read_table(spark, SF_SMOKE, "embeddings")
    old = v.filter(F.col("vec_id") % 3 != 0)
    new = v.filter(F.col("vec_id") % 3 == 0)
    root = str(tmp_path / "ivf_delta")
    write_ivf_index(old, root, n_lists=16)

    # (1) replicate the append's assignment frame (the exact df
    # append_ivf_index writes) and assert its plan scans only the
    # embeddings table — no /lists location anywhere
    from tw_etl_spark.operators.similarity import read_ivf_centroids

    cents = read_ivf_centroids(spark, root)
    un = unit_vectors(new, "vec_id", "embedding")
    assign = un.select(
        F.col("id").alias("cand_id"),
        F.col("u").alias("cu"),
        kmeans_assign_expr(cents).alias("list_id"),
    )
    plan = explain_str(assign)
    assert "/lists" not in plan, plan
    assert "Exchange" not in plan.split("\n\n")[0], plan  # narrow map

    # (2) the real append, then the merged-index query still prunes
    append_ivf_index(new, root)
    q = v.filter(F.col("vec_id") < 5)
    out = ann_ivf_persisted_topk(q, root, nprobe=2, k=3)
    plan = explain_str(out)
    blocks = [
        b for b in plan.split("\n\n")
        if "Location" in b and "/lists" in b and "PartitionFilters" in b
    ]
    assert blocks, plan
    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", blocks[0]).group(1)
    assert "list_id" in pf, blocks[0]
    probed_ids = set(re.findall(r"\b(\d+)\b", pf))
    assert 0 < len(probed_ids) < 16, pf
    assert out.count() == 15


def test_bucketed_gram_index_merge_and_delta_without_exchange(spark):
    """The gh-bucketed gram-count index (dd19's layout tier, mirroring
    the sig-bucketed survivor index): both daily consumers — the merge
    fold and the delta-span join — must read the index branch straight
    off the bucket files ('Bucketed: true', no Exchange between the
    bucketed scan and the join), and both must produce values
    identical to their plain-index forms. autoBucketedScan pinned OFF
    for the assertion (tiny-fixture heuristic; see the survivor test)."""
    from pyspark.sql import functions as F

    from tw_etl_spark.catalog import read_table
    from tw_etl_spark.operators.dedup import (
        delta_duplicate_spans,
        gram_count_index,
        merge_gram_index,
        merge_gram_index_bucketed,
        write_gram_index_bucketed,
    )

    d = read_table(spark, SF_SMOKE, "documents")
    old = d.filter(F.col("doc_id") % 3 != 0)
    new = d.filter(F.col("doc_id") % 3 == 0)
    write_gram_index_bucketed(gram_count_index(old, n=8), "test_gram_bucketed")
    auto_key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    bcast_key = "spark.sql.autoBroadcastJoinThreshold"
    old_auto = spark.conf.get(auto_key)
    old_bcast = spark.conf.get(bcast_key)
    try:
        spark.conf.set(auto_key, "false")
        # at fixture scale Spark rightly BROADCASTS the tiny index into
        # the left join; the layout claim under test is the
        # corpus-scale SMJ path, so pin broadcast off for the assert
        spark.conf.set(bcast_key, "-1")
        index = spark.table("test_gram_bucketed")

        def assert_no_index_exchange(df):
            plan = explain_str(df)
            assert "Bucketed: true" in plan, plan
            tree = plan.split("\n\n")[0]
            lines = tree.splitlines()
            join_idx = next(
                i for i, ln in enumerate(lines) if "Join" in ln
            )
            scan_idx = next(
                i for i, ln in enumerate(lines)
                if "test_gram_bucketed" in ln
            )
            # only the INDEX branch must be Exchange-free; when the
            # index is the join's right child, the left (batch-sized)
            # branch's legitimate shuffle sits between the join line
            # and the scan line in text order — left-branch lines carry
            # the ':' continuation marker, so exclude them
            between = [
                ln
                for ln in lines[join_idx + 1 : scan_idx]
                if not ln.lstrip().startswith(":")
            ]
            assert not any("Exchange" in ln for ln in between), tree

        delta_idx = gram_count_index(new, n=8)
        merged = merge_gram_index_bucketed(index, delta_idx)
        assert_no_index_exchange(merged)
        a = {tuple(r) for r in merged.collect()}
        b = {tuple(r) for r in merge_gram_index(index, delta_idx).collect()}
        assert a == b

        spans = delta_duplicate_spans(new, index, n=8)
        assert_no_index_exchange(spans)
        got = {tuple(r) for r in spans.collect()}
        want = {
            tuple(r)
            for r in delta_duplicate_spans(
                new, gram_count_index(old, n=8), n=8
            ).collect()
        }
        assert got == want and got
    finally:
        spark.conf.set(auto_key, old_auto)
        spark.conf.set(bcast_key, old_bcast)
        spark.sql("DROP TABLE IF EXISTS test_gram_bucketed")


def test_ivf_index_stats_reads_only_list_id(spark, tmp_path):
    """v9's cost claim: the audit scan must prune to the list_id
    partition column — the vectors (cu, the wide column) never appear
    in the lists scan's ReadSchema, so the audit is metadata-cheap
    even over a 100 TB index."""
    import re

    from pyspark.sql import functions as F

    from tw_etl_spark.catalog import read_table
    from tw_etl_spark.operators.similarity import (
        ivf_index_stats,
        write_ivf_index,
    )

    v = read_table(spark, SF_SMOKE, "embeddings")
    root = str(tmp_path / "ivf_audit")
    write_ivf_index(v, root, n_lists=16)
    out = ivf_index_stats(spark, root)
    plan = explain_str(out)
    blocks = [
        b for b in plan.split("\n\n")
        if "Location" in b and "/lists" in b
    ]
    assert blocks, plan
    rs = re.search(r"ReadSchema: ([^\n]*)", blocks[0])
    # list_id is a partition column; the data-column ReadSchema must be
    # EMPTY (no cand_id, no cu vector bytes deserialized)
    assert rs and "cu" not in rs.group(1) and "cand_id" not in rs.group(1), (
        blocks[0]
    )
    row = out.collect()[0]
    assert row.n_vectors == v.count()
    assert row.n_lists <= 16


def test_ann_lsh_candidate_exchange_is_pinned_and_ids_only(spark):
    """ann_lsh_topk's round-13 scale fixes, plan-asserted:
    (1) the bucket-join exchanges are EXPLICIT-width repartitions
    (REPARTITION_BY_NUM) — a user-specified width is exempt from AQE
    coalescing, which only sees the tiny map-side bytes of a join
    whose output fans out quadratically per bucket (observed at sf1:
    2 tasks serializing a ~10 GB fan-out through one TimSort spill);
    (2) those exchanges and the pair-dedup exchange carry ids/buckets
    ONLY — vectors re-attach by id after dropDuplicates (the dd3p
    signature-reattach discipline)."""
    from tw_etl_spark.operators.similarity import ann_lsh_topk

    v = read_table(spark, SF_SMOKE, "embeddings")
    plan = explain_str(ann_lsh_topk(v, v, k=3, num_planes=4, num_tables=3))

    bucket_exchanges = [
        b
        for b in plan.split("\n\n")
        if ") Exchange" in b and "hashpartitioning(table" in b
    ]
    assert bucket_exchanges, "expected hashpartitioning(table, bucket)"
    for block in bucket_exchanges:
        assert "REPARTITION_BY_NUM" in block, block  # AQE-coalesce-exempt
        assert "vec" not in block, block  # ids only ride the fan-out

    dedup_exchanges = [
        b
        for b in plan.split("\n\n")
        if ") Exchange" in b and "hashpartitioning(q_id" in b
    ]
    assert dedup_exchanges, "expected the (q_id, c_id) pair-dedup exchange"
    for block in dedup_exchanges:
        assert "vec" not in block, block


def test_bm25_scoring_pass_is_single_scan_zero_join(spark):
    """The round-13 BM25 rewrite contract: exact BM25's information
    floor is two corpus passes — the eager 1-row stats aggregate plus
    the scoring pass this plan shows. The LAZY plan must therefore be
    ONE FileScan feeding a pure narrow map (stats ride as literals —
    the dd8p pattern) into a TakeOrderedAndProject cut: no joins, no
    explode, no aggregate exchange. A regression back to the
    all-relational form (3 scans: stats + dfreq + join branches each
    re-scan parquet) triples the dominant IO at 100 TB."""
    from tw_etl_spark.operators.text import bm25_topk

    d = read_table(spark, SF_SMOKE, "documents")
    import re

    plan = explain_str(bm25_topk(d, ["join", "broadcast", "skew"], k=10))
    # formatted mode names each scan twice (tree line + detail header);
    # count the numbered detail headers
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, plan
    assert "TakeOrderedAndProject" in plan
    for op in ("Join", "Explode", "HashAggregate"):
        assert op not in plan, op


def test_bm25_multiquery_scoring_pass_plan(spark):
    """t19's scale contract (VERDICT r13 missing #1): batch BM25 is
    still TWO corpus passes total — the eager stats aggregate plus the
    scoring pass pinned here. The lazy plan must show exactly ONE
    parquet scan, ONE Generate whose input is the MATCHED-terms array
    (array_intersect of the distinct tokens with the term set — never
    the raw token stream: fan-out <= |terms| per doc, zero for
    non-matching docs), the query table joined as a BROADCAST (never a
    shuffle join against the corpus), and a per-query WindowGroupLimit
    cut (distributed per-partition heaps). A regression to per-query
    corpus scans or a token-stream explode multiplies the dominant IO
    at 100 TB by |queries| or by avg document length respectively."""
    import re

    from tw_etl_spark.operators.text import bm25_topk_multiquery
    from tw_etl_spark.queries.text import _T19_QUERIES

    d = read_table(spark, SF_SMOKE, "documents")
    plan = explain_str(bm25_topk_multiquery(d, _T19_QUERIES, k=10))
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, plan
    assert len(re.findall(r"\(\d+\) Generate", plan)) == 1, plan
    assert "explode(transform(__bm_matched" in plan, plan
    assert "array_intersect(array_distinct(__bm_toks" in plan, plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "WindowGroupLimit" in plan
