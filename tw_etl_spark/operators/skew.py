"""Skew mitigation operators (SURVEY.md §2.2 / SCALE.md).

AQE's skew-join splitting handles join-side skew automatically; these
helpers cover the two cases AQE does not:

- ``salted_agg``: two-phase aggregation for heavily skewed group keys
  (one hot key would otherwise pin a single reducer). Phase 1 aggregates
  on (key, salt) — spreading the hot key over ``salt_buckets`` reducers —
  phase 2 merges the partials. Works for any algebraic aggregate
  (sum/count/min/max and combinations like avg = sum/count).
- ``salted_broadcast_left``: replicate-and-salt pattern for joining a
  skewed fact against a dimension too big to broadcast whole but small
  enough to replicate ``salt_buckets`` ways.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    salt_buckets: int,
    partials: list[tuple[str, Column, Column]],
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``partials`` is a list of (name, phase1_agg_expr, phase2_merge_expr)
    where phase2 merges columns named ``name`` — e.g.::

        salted_agg(df, ["k"], 32, [
            ("n", F.count(F.lit(1)), F.sum("n")),
            ("s", F.sum("v"),        F.sum("s")),
        ])

    The result equals a direct ``groupBy(keys)`` (oracle-verified in
    tests); the difference is purely physical: the first shuffle spreads
    each key over ``salt_buckets`` partitions.
    """
    salted = df.withColumn(
        "__salt", (F.rand(seed=7) * salt_buckets).cast("int")
    )
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(name) for name, expr, _ in partials]
    )
    return phase1.groupBy(*keys).agg(
        *[merge.alias(name) for name, _, merge in partials]
    )


def salted_broadcast_left(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int,
) -> DataFrame:
    """Join a skewed fact to a dimension by salting the fact key and
    exploding the dimension across all salt values — every (key, salt)
    partition gets its dimension rows without a fact-side skew pileup."""
    fact_s = fact.withColumn("__salt", (F.rand(seed=7) * salt_buckets).cast("int"))
    dim_s = dim.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))),
    )
    return fact_s.join(dim_s, [key, "__salt"]).drop("__salt")
