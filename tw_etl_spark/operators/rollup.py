"""Cascading multi-granularity time rollups (hypertable-style).

The reference's packet time-series (convert.sh:60-65) and the events
table both want rollups at several granularities. Recomputing each
granularity from the base table re-scans everything per grain; at
100 TB that multiplies the dominant cost (the scan) by the number of
grains. A cascading rollup scans the base ONCE at the finest grain and
derives every coarser grain by re-aggregating the previous grain's
partial aggregates — valid for any algebraic aggregate expressed as
(fine partial, merge), the same contract as operators.skew.salted_agg.

Scale shape: the fine rollup is one scan + one shuffle on (bucket,
keys); each coarser grain shuffles only the previous rollup's rows
(a ~grain-ratio reduction per step, e.g. 24x from hour to day).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# coarse → fine must truncate consistently; supported ladder
_GRAIN_ORDER = ["minute", "hour", "day", "week", "month", "quarter", "year"]


def cascading_rollup(
    df: DataFrame,
    ts_col: str,
    keys: list[str],
    partials: list[tuple[str, Column, Column]],
    grains: list[str] = ("hour", "day"),
    materialize: bool = True,
) -> DataFrame:
    """Rollup ``df`` at every granularity in ``grains`` (finest first),
    each coarser level computed from the previous level's partials.

    ``partials`` rows are (name, fine_agg_expr, merge_expr) where
    ``merge_expr`` re-aggregates columns named ``name`` — e.g.::

        cascading_rollup(events, "ts", [], [
            ("n",  F.count(F.lit(1)), F.sum("n")),
            ("sv", F.sum("value"),    F.sum("sv")),
        ], grains=["hour", "day"])

    Returns the union of all levels with columns
    (grain: string, bucket: timestamp, *keys, *names), finest first.

    ``materialize`` persists the finest level (MEMORY_AND_DISK): a
    DataFrame referenced from several union branches is otherwise
    recomputed per branch — i.e. the base would be re-scanned per grain,
    exactly what this operator exists to avoid. The hourly rollup of a
    100 TB table is orders of magnitude smaller than the base, so
    caching it is the cheap side of the trade; at scale you'd typically
    write it to a silver table instead (same shape, durable).
    """
    order = [g for g in _GRAIN_ORDER if g in grains]
    if len(order) != len(grains):
        raise ValueError(f"unsupported grain in {grains}; pick from {_GRAIN_ORDER}")

    fine = order[0]
    level = df.groupBy(
        F.date_trunc(fine, F.col(ts_col)).alias("bucket"), *keys
    ).agg(*[expr.alias(name) for name, expr, _ in partials])
    if materialize and len(order) > 1:
        level = level.persist()
    out = level.select(F.lit(fine).alias("grain"), "bucket", *keys,
                       *[name for name, _, _ in partials])
    for g in order[1:]:
        level = level.groupBy(
            F.date_trunc(g, F.col("bucket")).alias("bucket"), *keys
        ).agg(*[merge.alias(name) for name, _, merge in partials])
        out = out.unionByName(
            level.select(F.lit(g).alias("grain"), "bucket", *keys,
                         *[name for name, _, _ in partials])
        )
    return out
