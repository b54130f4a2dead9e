"""Round-14 optimization regression tests.

The round's unifying fix: Catalyst never deduplicates lambda-bearing
subtrees (EquivalentExpressions skips NamedLambdaVariable, and all
higher-order functions are CodegenFallback), so a HOF fold referenced
by several sibling expressions is re-evaluated per reference. These
tests pin (a) value-identity of the restructured operators against
their original column forms and (b) the single-evaluation plan shape,
so a refactor cannot silently reintroduce the duplication.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from tw_etl_spark.catalog import read_table
from tw_etl_spark.plans.inspect import explain_str
from tw_etl_spark.queries import all_queries
from tests.conftest import SF_SMOKE


def test_weight_table_matches_md5_formula():
    """The literal weight table serves exactly the md5-derived values
    the DuckDB oracle computes inline."""
    from tw_etl_spark.operators.quality import _weight_table_milli

    tab = _weight_table_milli(1024)
    assert len(tab) == 1024
    for j in (0, 1, 57, 1023):
        h = int(hashlib.md5(f"w:{j}".encode()).hexdigest()[:8], 16)
        assert tab[j] == h % 2001 - 1000
    assert all(-1000 <= w <= 1000 for w in tab)


def test_hashed_linear_scored_equals_column_form(spark):
    """The single-evaluation DataFrame scorer returns row-for-row the
    same values as the original 4-column expression form."""
    from tw_etl_spark.operators.quality import (
        hashed_linear_score_cols,
        hashed_linear_scored,
    )

    d = read_table(spark, SF_SMOKE, "documents")
    n_tokens, z, score, keep = hashed_linear_score_cols(F.col("text"))
    old = d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        z.alias("z"),
        score.alias("score"),
        keep.alias("keep"),
    ).orderBy("doc_id")
    new = hashed_linear_scored(d).orderBy("doc_id")
    assert old.collect() == new.collect()


def test_t15_single_fold_in_plan(spark):
    """t15's md5 token fold is evaluated once per row (behind a
    Generate barrier), not once per output column (was 15 aggregate
    nodes in the projection before round 14)."""
    df = all_queries()["t15_quality_classifier"].spark(spark, SF_SMOKE)
    plan = explain_str(df)
    assert plan.count("aggregate(") <= 2, plan
    assert "Generate" in plan
    assert "Exchange hashpartitioning" not in plan  # still no data shuffle


def test_dd4p_single_hash_transform_in_plan(spark):
    """dd4p's md5 token-hash transform appears once (let-bound), not
    once per simhash bit vote (was 32 copies before round 14)."""
    df = all_queries()["dd4p_simhash_portable"].spark(spark, SF_SMOKE)
    plan = explain_str(df)
    assert plan.count("conv(substring(md5") == 1, plan.count(
        "conv(substring(md5"
    )


def test_x11_bloom_filter_evaluated_once(spark):
    """x11 computes the Bloom-passing gram array once; the hit count is
    size(__cand), not a second filter pass (CollapseProject must keep
    the aliased projection split)."""
    df = all_queries()["x11_bloom_decontaminate"].spark(spark, SF_SMOKE)
    plan = explain_str(df)
    # each Bloom filter body contains one getbit per hash function
    # (k=3). The plan legitimately carries bodies in the narrow-map
    # stage, the explode gate, and the final projection's re-read of
    # the aliased column; the pre-round-14 duplicated body pushed the
    # count to 15. 12 = the single-evaluation shape.
    assert plan.count("getbit") <= 12, plan.count("getbit")


def test_u3_projects_before_python_boundary(spark):
    """u3 ships only the three used columns into applyInPandas (guide
    §4.1): the parquet scan must not read ts/event_type/props."""
    from tw_etl_spark.plans.inspect import read_schema_columns

    df = all_queries()["u3_grouped_map_zscore"].spark(spark, SF_SMOKE)
    cols = read_schema_columns(df)[0]
    assert set(cols) == {"user_id", "event_id", "value"}, cols


def test_kmeans_dists_expr_accepts_column_and_matches(spark):
    """The generalized kmeans_dists_expr (one transform over a nested
    literal) returns the same distances as an explicit per-centroid
    fold, and accepts a Column (the v6p subspace-slice form)."""
    from tw_etl_spark.operators.dedup import kmeans_dists_expr, unit_vectors

    cents = [[0.1] * 4, [0.9, 0.0, 0.0, 0.0]]
    df = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]), (2, [0.5, 0.5, 0.5, 0.5])],
        "vec_id long, embedding array<double>",
    )
    u = unit_vectors(df)
    got = u.select(kmeans_dists_expr(cents).alias("d")).collect()
    ref = u.select(
        F.array(
            *[
                F.aggregate(
                    F.zip_with(
                        F.col("u"),
                        F.array(*[F.lit(float(x)) for x in c]),
                        lambda x, y: (x - y) * (x - y),
                    ),
                    F.lit(0.0),
                    lambda acc, t: acc + t,
                )
                for c in cents
            ]
        ).alias("d")
    ).collect()
    assert got == ref
    # Column form: distances on a slice
    sliced = u.select(
        kmeans_dists_expr([[0.1, 0.2]], F.slice(F.col("u"), 1, 2)).alias("d")
    ).collect()
    assert len(sliced[0]["d"]) == 1


def test_bpe_merges_checkpoint_roundtrip(spark):
    """bpe_merges (now eager-localCheckpoint per round) still learns the
    classic merge sequence on a known corpus."""
    from tw_etl_spark.operators.bpe import bpe_merges

    df = spark.createDataFrame(
        [("low low low lower lowest",)], "text string"
    )
    merges = bpe_merges(df, rounds=2).collect()
    assert [(m.lhs, m.rhs) for m in merges] == [("l", "o"), ("lo", "w")]
