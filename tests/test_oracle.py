"""t2 differential correctness: every registered oracle query, Spark vs
DuckDB, on sf0.001 (fast) — the driver re-runs the same contract at
sf0.01."""

from __future__ import annotations

import pytest

from tw_etl_spark.queries import all_queries
from tests.conftest import SF_SMOKE
from tests.oracle_utils import check_query

SPECS = [s for s in all_queries().values() if s.oracle is not None]


@pytest.mark.parametrize("spec", SPECS, ids=[s.name for s in SPECS])
def test_oracle_match(spark, spec):
    pdf = check_query(spark, spec, SF_SMOKE)
    assert pdf is not None
