"""Table catalog: load the driver's synthetic parquet tables.

Tables and schemas are documented in /root/repo/FIXTURES.md §A. All
reads go through ``spark.read.parquet`` so Catalyst gets predicate
pushdown + column pruning for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# Columns persisted as parquet TIMESTAMP(NANOS); Spark reads them as
# epoch-nano longs (spark.sql.legacy.parquet.nanosAsLong) — normalize to
# microsecond TimestampType, truncating like DuckDB does.
_NANO_TS_COLUMNS = {"events": ["ts"]}


# Resolved-DataFrame memo: re-listing files + reading parquet footers on
# every query call costs ~40 ms each. Caching the *plan* (schema +
# file index) is catalog-metadata caching — the data itself is still
# scanned from parquet on every execution. Keyed on applicationId (a
# fresh UUID per SparkContext) rather than id(spark): a stopped session's
# id() can be reused by a new session, which would hand out DataFrames
# bound to a dead JVM context.
_PLAN_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def _session_token(spark: SparkSession) -> str:
    try:
        return spark.sparkContext.applicationId
    except Exception:  # stopped context — don't cache against it
        return f"dead-{id(spark)}"


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic table with timestamp normalization applied.

    Self-sufficient on a *stock* SparkSession: the fixture's
    ``events.parquet`` stores ``ts`` as parquet TIMESTAMP(NANOS), which
    Spark 4 rejects outright unless ``spark.sql.legacy.parquet.nanosAsLong``
    is set. That conf is runtime-settable, so set it here (idempotent)
    instead of relying on the session factory — callers may hand us any
    session they built themselves.
    """
    key = (_session_token(spark), sf_dir, name)
    cached = _PLAN_CACHE.get(key)
    if cached is not None:
        return cached
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Fixtures store timestamp[us] with isAdjustedToUTC=false; Spark 4.1+
    # infers that as TIMESTAMP_NTZ, which breaks unix_micros(), range
    # frames, and withWatermark (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE).
    # The engine's timestamp semantics are TIMESTAMP (LTZ) in a UTC
    # session — identical wall-clock values, so every oracle hash holds.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    # Catalog timestamp semantics are UTC (matches the DuckDB oracle's
    # UTC-naive timestamps) regardless of the host/session timezone.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(table_path(sf_dir, name))
    for col in _NANO_TS_COLUMNS.get(name, []):
        if isinstance(df.schema[col].dataType, T.LongType):
            # Integer DIV: epoch-nanos (~1.7e18) exceed double's 53-bit
            # mantissa, so a float divide would corrupt the low digits.
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} DIV 1000")))
    # Belt-and-braces: normalize any NTZ column that slipped past the
    # reader conf (e.g. a pre-resolved plan or a future reader change).
    for field in df.schema.fields:
        if isinstance(field.dataType, T.TimestampNTZType):
            df = df.withColumn(field.name, F.col(field.name).cast(T.TimestampType()))
    _PLAN_CACHE[key] = df
    return df


def load_tables(
    spark: SparkSession,
    sf_dir: str = DEFAULT_SF_DIR,
    register_views: bool = False,
) -> dict[str, DataFrame]:
    """Load every synthetic table as a DataFrame.

    With ``register_views=True`` each table is also registered as a
    temp view so ``spark.sql`` queries can reference it by name.
    """
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = read_table(spark, sf_dir, name)
        if register_views:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out
