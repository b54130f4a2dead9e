"""Weighted-sampling invariants: the A-ES exactly-n weighted sample
(one pass, no RNG state) — selection determinism, equal-weight
reduction, dominant-weight inclusion, loud weight guard, and the
single-scan TakeOrderedAndProject plan contract."""

from __future__ import annotations


def test_weighted_sample_topn_invariants(spark):
    """A-ES weighted sample: exact n, deterministic across runs and
    partitionings, equal weights reduce to ranking by the uniform
    alone, and a dominant weight is always selected."""
    from pyspark.sql import functions as F

    from tw_etl_spark.operators.sampling import weighted_sample_topn

    rows = [(i, 10 + (i % 7)) for i in range(200)]
    d = spark.createDataFrame(rows, ["doc_id", "w"])
    out = weighted_sample_topn(d, 20).toPandas()
    assert len(out) == 20 and list(out["rank"]) == list(range(1, 21))
    # deterministic and partitioning-independent
    again = weighted_sample_topn(d.repartition(13), 20).toPandas()
    assert out.values.tolist() == again.values.tolist()
    # equal weights: selection == top-n by the uniform key alone
    eq = spark.createDataFrame([(i, 5) for i in range(200)], ["doc_id", "w"])
    got = set(weighted_sample_topn(eq, 20).toPandas()["doc_id"])
    by_u = (
        weighted_sample_topn(eq, 200)
        .orderBy(F.desc("u_micro"), "doc_id")
        .limit(20)
        .toPandas()
    )
    assert got == set(by_u["doc_id"])
    # a dominant weight wins rank 1: ln(u)/w -> 0- as w -> inf
    dom = spark.createDataFrame(
        [(i, 10) for i in range(100)] + [(999, 10**12)], ["doc_id", "w"]
    )
    top = weighted_sample_topn(dom, 5).toPandas()
    assert int(top.loc[0, "doc_id"]) == 999


def test_weighted_sample_rejects_nonpositive_weights(spark):
    import pytest

    from tw_etl_spark.operators.sampling import weighted_sample_topn

    d = spark.createDataFrame([(1, 4), (2, 0)], ["doc_id", "w"])
    with pytest.raises(Exception, match="must be > 0"):
        weighted_sample_topn(d, 2).collect()


def test_weighted_sample_plan_single_scan_take_ordered(spark):
    """The 100 TB contract: one scan, narrow map, TakeOrderedAndProject
    — no shuffle, no join, no second pass."""
    import re

    from pyspark.sql import functions as F

    from tests.conftest import SF_SMOKE
    from tw_etl_spark.catalog import read_table
    from tw_etl_spark.operators.sampling import weighted_sample_topn
    from tw_etl_spark.plans.inspect import explain_str

    d = read_table(spark, SF_SMOKE, "documents").select(
        "doc_id", F.col("n_chars").cast("long").alias("w")
    )
    plan = explain_str(weighted_sample_topn(d, 50))
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, plan
    assert "TakeOrderedAndProject" in plan
    for op in ("Join", "Exchange hashpartitioning", "HashAggregate"):
        assert op not in plan, op
