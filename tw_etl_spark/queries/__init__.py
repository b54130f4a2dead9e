"""Oracle-verified query registry (the t2 correctness contract).

Every implemented operator from SURVEY.md §2 that is SQL-expressible
registers here with BOTH a Spark implementation and an equivalent
DuckDB oracle SQL string. The driver (and tests/test_oracle.py) run
both sides on the same parquet tables and hash-compare canonicalized
results, so:

- every computed column is aliased IDENTICALLY on both sides;
- floating aggregates are rounded on both sides (same digits) so that
  partial-aggregation order differences between engines can't flip
  the hash;
- every ORDER BY ... LIMIT k carries a full deterministic tiebreak.

Non-SQL-expressible operators (streaming, approximate ops) register
with ``oracle=None`` and are covered by equivalence/unit tests instead.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    spark: SparkQuery
    oracle: str | None  # DuckDB SQL over pre-registered table views
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None,
    doc: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator: register a (spark_fn, oracle_sql) pair under ``name``."""

    def deco(fn: SparkQuery) -> SparkQuery:
        REGISTRY[name] = QuerySpec(name=name, spark=fn, oracle=oracle, doc=doc, tags=tags)
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    """Import every query module and return the populated registry."""
    # Imports are side-effectful (decorators populate REGISTRY).
    from tw_etl_spark.queries import core  # noqa: F401
    from tw_etl_spark.queries import relational  # noqa: F401
    from tw_etl_spark.queries import text  # noqa: F401
    from tw_etl_spark.queries import dedup  # noqa: F401
    from tw_etl_spark.queries import similarity  # noqa: F401
    from tw_etl_spark.queries import etl  # noqa: F401
    from tw_etl_spark.queries import udfs  # noqa: F401

    return dict(REGISTRY)
