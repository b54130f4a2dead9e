from __future__ import annotations

import pytest

from tw_etl_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_T2 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tw-etl-spark-tests")
    yield s
