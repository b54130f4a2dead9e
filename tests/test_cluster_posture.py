"""Partition-count invariance under the cluster posture.

CLUSTER_CONF ships `spark.sql.shuffle.partitions: 8192` for ~100 TB
stages (session.py). Any operator that accidentally depends on the
local width-32 layout — a per-partition fold without a merge, an
unordered limit, a non-commutative agg — produces different results
the day the same code runs on the real cluster. Re-running
representative queries (one per shuffle-shape family: agg, window,
session_window, distinct, sort, jaccard-components) at 8192 and
comparing against the width-32 answer pins that down locally. AQE
coalesces the empty partitions, so the wide runs stay cheap.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from tw_etl_spark.queries import all_queries

_QUERIES = [
    "q1_pricing_summary",  # hash agg
    "w1_top3_orders_per_customer",  # window + per-group top-k
    "e3_sessionization",  # session_window
    "d2_exact_dedup",  # two-phase distinct
    "s10_setops_null_semantics",  # set ops + global sort fingerprint
    "dd7_neardup_survivors",  # jaccard pairs -> components -> anti-join
    "j50_range_asof_join",  # asof union-window + bucketed interval join
    "io2_columnar_roundtrip",  # ORC/z-order write-read-join roundtrip
]


@pytest.mark.parametrize("name", _QUERIES)
def test_result_invariant_under_cluster_shuffle_width(spark, name):
    spec = all_queries()[name]
    narrow = spec.spark(spark, SF_SMOKE).collect()
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8192")
    try:
        wide = spec.spark(spark, SF_SMOKE).collect()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert sorted(map(tuple, narrow)) == sorted(map(tuple, wide)), name


def test_streaming_state_invariant_under_shuffle_width(spark):
    """Streaming STATE partitioning is fixed from
    spark.sql.shuffle.partitions at the query's first batch — the
    keyed-state gauntlet must produce identical results when state
    shards 16x wider (256 here, not 8192: each state partition opens a
    real state-store instance per stateful operator, so the cluster
    width would turn a smoke test into thousands of store opens for
    zero extra signal)."""
    spec = all_queries()["st2_stream_stateful_gauntlet"]
    narrow = spec.spark(spark, SF_SMOKE).collect()
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "256")
    try:
        wide = spec.spark(spark, SF_SMOKE).collect()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert sorted(map(tuple, narrow)) == sorted(map(tuple, wide))
