"""Regression guard: the catalog must work on a STOCK SparkSession.

The correctness driver runs ``queries()`` on its own vanilla session —
none of the confs set by ``tw_etl_spark.session.get_spark`` apply. Round 1
lost 12 correctness rows because ``events.parquet`` stores
TIMESTAMP(NANOS) and only the factory session carried
``spark.sql.legacy.parquet.nanosAsLong``. ``catalog.read_table`` now sets
that conf at runtime; this test proves it from a genuinely stock session.

A stock session can't be simulated inside the shared test JVM (builder
confs leak into every ``newSession()``'s SQLConf defaults), so this
spawns a fresh interpreter. ~25 s, but it guards the single most
expensive failure mode the driver has.
"""

from __future__ import annotations

import subprocess
import sys
import textwrap

from tests.conftest import SF_SMOKE

_SCRIPT = textwrap.dedent(
    """
    from pyspark.sql import SparkSession
    spark = SparkSession.builder.master("local[4]").appName("stock").getOrCreate()
    from tw_etl_spark.catalog import read_table
    df = read_table(spark, {sf_dir!r}, "events")
    assert df.schema["ts"].dataType.typeName() == "timestamp", df.schema
    n = df.count()
    assert n > 0, n
    # An events-reading registered query end-to-end, like the driver runs it.
    from tw_etl_spark.queries import all_queries
    q = all_queries()["e1_hourly_rollup"]
    assert q.spark(spark, {sf_dir!r}).count() > 0
    print("STOCK_OK", n)
    """
)


def test_events_read_on_stock_session():
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT.format(sf_dir=SF_SMOKE)],
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "STOCK_OK" in proc.stdout
