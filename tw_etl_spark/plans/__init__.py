"""Physical-plan inspection: assert that Catalyst produced the plan we
designed for — filters pushed to the scan, columns pruned, small sides
broadcast, no surprise shuffles. These assertions are the 100 TB
regression guard: a plan that silently loses pushdown is correct at
sf0.01 and catastrophic at scale."""

from tw_etl_spark.plans.inspect import (  # noqa: F401
    explain_str,
    pushed_filters,
    read_schema_columns,
    count_exchanges,
    has_broadcast_join,
)
