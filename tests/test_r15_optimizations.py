"""Round-15 optimization regression tests.

The round's themes: (a) explicit storage release for localCheckpoint
loops — ``DataFrame.unpersist()`` does NOT free checkpoint blocks, so
iterative operators leaked one frame per round; (b) connected
components' convergence decided by an observed metric on the
checkpoint-materialization job instead of a second join+count job per
round; (c) large literal tables shipped as ONE parsed SQL expression
(classic-mode ``F.lit(list)`` expands to a py4j call per element) with
bit-identical values.
"""

from __future__ import annotations

import struct

from pyspark.sql import functions as F

from tw_etl_spark.operators.ckpt import free_local_checkpoint


def _storage_rdd_ids(spark) -> set[int]:
    return {
        i.id() for i in spark.sparkContext._jsc.sc().getRDDStorageInfo()
    }


def test_free_local_checkpoint_releases_blocks(spark):
    """df.unpersist() leaves checkpoint blocks in executor storage (the
    ADVICE-r14 mechanism was wrong); free_local_checkpoint reaches the
    LogicalRDD and actually drops them."""
    before = _storage_rdd_ids(spark)
    ck = spark.range(500).selectExpr("id", "id * 3 as y").localCheckpoint()
    held = _storage_rdd_ids(spark) - before
    assert held, "localCheckpoint should persist blocks"
    ck.unpersist(blocking=True)
    assert _storage_rdd_ids(spark) - before == held, (
        "DataFrame.unpersist unexpectedly freed checkpoint blocks — "
        "free_local_checkpoint may be obsolete"
    )
    assert free_local_checkpoint(ck, blocking=True)
    assert not (_storage_rdd_ids(spark) - before)


def test_free_local_checkpoint_noop_on_plain_frame(spark):
    df = spark.range(10).selectExpr("id * 2 as id")
    assert free_local_checkpoint(df) is False


def test_connected_components_no_block_buildup(spark):
    """The per-round checkpoints are released as soon as the next round
    materializes: after the call, net new persisted RDDs are exactly
    the edges table and the final labels (2), independent of rounds."""
    from tw_etl_spark.operators.dedup import connected_components

    # path graph 1-2-3-4-5-6: diameter 5 forces several propagation
    # rounds, so a leak would show as > 2 retained RDDs
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 6)], "id_a long, id_b long"
    )
    before = _storage_rdd_ids(spark)
    labels = connected_components(pairs)
    got = {(r.id, r.component) for r in labels.collect()}
    assert got == {(i, 1) for i in range(1, 7)}
    assert len(_storage_rdd_ids(spark) - before) == 2
    free_local_checkpoint(labels, blocking=True)


def test_connected_components_one_action_per_round(spark):
    """Round 15: the convergence check rides the checkpoint job as an
    observed sum(component) metric — no separate join+count action per
    round. AQE splits each action into several scheduler jobs, so the
    pin is the measured A/B envelope: this diameter-4 path graph took
    45 jobs with the old two-action rounds and 24 with the single
    -action rounds (labels identical)."""
    from tw_etl_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 5)], "id_a long, id_b long"
    )
    tracker = spark.sparkContext.statusTracker()
    n_before = len(tracker.getJobIdsForGroup(None) or [])
    labels = connected_components(pairs)
    n_after = len(tracker.getJobIdsForGroup(None) or [])
    assert n_after - n_before <= 30, (
        f"expected <= 30 jobs (measured 24 new / 45 old), "
        f"saw {n_after - n_before}"
    )
    free_local_checkpoint(labels, blocking=True)


def test_bpe_merges_frees_all_round_blocks(spark):
    """bpe_merges releases every round's checkpoint before returning —
    the merge table is plain driver data."""
    from tw_etl_spark.operators.bpe import bpe_merges

    df = spark.createDataFrame(
        [("low lower lowest",), ("low low newer newest",)], "text string"
    )
    before = _storage_rdd_ids(spark)
    merges = bpe_merges(df, rounds=4)
    assert merges.count() == 4
    assert not (_storage_rdd_ids(spark) - before)


def test_double_array_lit_bit_identical(spark):
    """The parsed-expr double literals carry exactly the same IEEE-754
    bits as the F.lit element-wise form, including signed zero,
    subnormals and values needing scientific notation."""
    from tw_etl_spark.functions.vectors import (
        double_array_lit,
        nested_double_array_lit,
    )

    vals = [0.0, -0.0, 1e-5, 1e300, 5e-324, 0.1, 1 / 3, -2.5, 1234.5678]
    df = spark.range(1)
    a = df.select(F.lit([float(v) for v in vals]).alias("x")).first().x
    b = df.select(double_array_lit(vals).alias("x")).first().x
    bits = lambda xs: [struct.pack("<d", v) for v in xs]  # noqa: E731
    assert bits(a) == bits(b)

    nest = [[v * 0.7 for v in vals], [v * -1.3 for v in vals]]
    a = df.select(
        F.lit([[float(x) for x in r] for r in nest]).alias("x")
    ).first().x
    b = df.select(nested_double_array_lit(nest).alias("x")).first().x
    assert [bits(r) for r in a] == [bits(r) for r in b]


def test_long_array_lit_used_by_weight_table(spark):
    """token_weight_milli's 1024-entry table arrives as one parsed
    literal (bigint array), and values still match the md5 formula."""
    from tw_etl_spark.operators.quality import (
        _weight_table_milli,
        token_weight_milli,
    )

    tab = _weight_table_milli(1024)
    rows = (
        spark.createDataFrame([("alpha",), ("beta",)], "tk string")
        .select(token_weight_milli(F.col("tk")).alias("w"))
        .collect()
    )
    assert all(r.w in tab for r in rows)


def test_kmeans_multi_matches_per_stage(spark):
    """relational_kmeans_centroids_multi (one seed collect + one
    union-aggregate for all stages — v6p's 18 staging jobs -> 2)
    returns bit-identical (seeds, centroids) to per-stage
    relational_kmeans_centroids calls."""
    from tw_etl_spark.catalog import read_table
    from tw_etl_spark.operators.dedup import (
        relational_kmeans_centroids,
        relational_kmeans_centroids_multi,
        unit_vectors,
    )
    from tests.conftest import SF_SMOKE

    uc = unit_vectors(
        read_table(spark, SF_SMOKE, "embeddings"), "vec_id", "embedding"
    ).localCheckpoint()
    dim = len(uc.select("u").first()[0])
    m_sub = 4
    sub_d = dim // m_sub
    specs = [(8, 0, dim)] + [(4, s * sub_d, sub_d) for s in range(m_sub)]
    multi = relational_kmeans_centroids_multi(uc, specs)
    ref = [relational_kmeans_centroids(uc, 8)]
    for s in range(m_sub):
        sub = uc.select(
            "id", F.slice(F.col("u"), s * sub_d + 1, sub_d).alias("u")
        )
        ref.append(relational_kmeans_centroids(sub, 4))
    assert multi == ref
    from tw_etl_spark.operators.ckpt import free_local_checkpoint

    free_local_checkpoint(uc, blocking=True)
