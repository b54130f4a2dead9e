"""Analysis-only smoke over the FULL query registry.

Round 4 lesson: an environment drift (PySpark 4.1.2 reading the
fixtures' ``timestamp[us] isAdjustedToUTC=false`` as TIMESTAMP_NTZ)
broke query *analysis* — ``unix_micros`` rejected the new type — and
the first signal was a red driver round. Building every registered
query and forcing ``df.schema`` catches any such drift locally in
under a minute: Catalyst resolves the whole plan (types, function
signatures, column references) without executing a single task.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from tw_etl_spark.queries import all_queries

_SPECS = all_queries()


@pytest.mark.parametrize("name", list(_SPECS))
def test_query_analyzes(spark, name):
    df = _SPECS[name].spark(spark, SF_SMOKE)
    # Forcing .schema runs analysis (resolution + type-checking) only.
    assert len(df.schema.fields) > 0, name
