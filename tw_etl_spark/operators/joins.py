"""Composite join operators Spark lacks natively: as-of and interval joins.

Reference capability: reconstructing absolute wallclock time from packet
``pts_time`` series and detecting ad-gap segments
(/root/reference/convert.sh:56-65) — i.e. nearest-≤-timestamp lookup and
interval-overlap matching, generalized here to relational form.

Both operators are pure DataFrame compositions (no UDFs): one shuffle on
the ``by`` key, window functions after. That is the 100 TB shape — the
union+last(ignorenulls) as-of trick costs exactly one hash partition of
(left ∪ right) instead of a per-key merge in Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | str,
    right_payload: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: for every left row, the most recent right row with
    ``right.on <= left.on`` within the same ``by`` group (inclusive, i.e.
    DuckDB's ``ASOF LEFT JOIN ... ON l.by = r.by AND l.on >= r.on``).

    ``right`` must be unique per (by, on) — pre-aggregate if not, else
    which peer wins is nondeterministic.

    Implementation: tag sides, union, and take ``last(struct(on,
    *payload), ignorenulls=True)`` over a window ordered by (on, tag)
    with the right side sorting first at equal timestamps. The payload
    travels as ONE struct per right row, so a matched right row whose
    payload value is genuinely NULL surfaces that NULL (DuckDB ASOF
    semantics) instead of an older row's value. Single shuffle on
    ``by``; streams through sorted partitions (no per-key buffering).
    """
    from pyspark.sql import types as T

    by = [by] if isinstance(by, str) else list(by)
    left_cols = left.columns
    out_payload = {c: f"{c}{suffix}" for c in right_payload + [on]}

    asof_type = T.StructType(
        [T.StructField(out_payload[c], right.schema[c].dataType) for c in right_payload]
        + [T.StructField(out_payload[on], right.schema[on].dataType)]
    )
    l_tagged = left.select(
        *[F.col(c) for c in left_cols],
        F.lit(None).cast(asof_type).alias("__asof"),
        F.lit(1).alias("__tag"),
    )
    r_tagged = right.select(
        *[F.col(c) for c in by],
        F.col(on),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols if c not in by + [on]],
        F.struct(
            *[F.col(c).alias(out_payload[c]) for c in right_payload],
            F.col(on).alias(out_payload[on]),
        ).alias("__asof"),
        F.lit(0).alias("__tag"),
    ).select(*[F.col(c) for c in l_tagged.columns])  # align column order

    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on), F.col("__tag"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = l_tagged.unionByName(r_tagged)
    matched = unioned.withColumn("__asof", F.last("__asof", ignorenulls=True).over(w))
    return (
        matched.filter(F.col("__tag") == 1)
        .select(
            *[F.col(c) for c in left_cols],
            *[F.col(f"__asof.{out_payload[c]}").alias(out_payload[c]) for c in right_payload + [on]],
        )
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_point: Column,
    right_start: Column,
    right_end: Column,
    by: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join left rows whose point column falls inside [start, end).

    With ``by`` keys this is an equi-join + range filter (sort-merge on
    the keys — fine at scale). Without keys it degenerates to a broadcast
    nested loop: acceptable only when one side is small; for the
    large-large keyless case bucketize time first (see
    ``bucketed_range_join``).
    """
    cond = (left_point >= right_start) & (left_point < right_end)
    if by:
        for k in by:
            cond = (left[k] == right[k]) & cond
    return left.join(right, cond, how)


def bucketed_range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_start: str,
    right_end: str,
    bucket_seconds: int,
) -> DataFrame:
    """Scale path for keyless interval joins: explode each right interval
    into the time buckets it covers, equi-join on bucket, then re-check
    the exact predicate. Turns an O(n·m) nested loop into a shuffle join
    whose fan-out is interval_length/bucket_seconds."""
    b = F.lit(bucket_seconds)
    l_b = left.withColumn(
        "__bucket", (F.unix_timestamp(F.col(left_point)) / b).cast("long")
    )
    r_b = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                (F.unix_timestamp(F.col(right_start)) / b).cast("long"),
                (F.unix_timestamp(F.col(right_end)) / b).cast("long"),
            )
        ),
    )
    joined = l_b.join(r_b, "__bucket").filter(
        (F.col(left_point) >= F.col(right_start))
        & (F.col(left_point) < F.col(right_end))
    )
    return joined.drop("__bucket")


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resilient equi-join — the classic salting rewrite for the
    key distribution AQE's skew handling can't fix: ONE key carrying an
    arbitrarily large fraction of a 100 TB fact table still lands in
    one task under plain hash partitioning (AQE splits skewed
    PARTITIONS of the already-shuffled side, but a join key hotter than
    a whole executor's memory wants the rewrite at plan-build time).

    The fact side gains a salt in [0, n_salts) (xxhash64 of the row's
    HASHABLE columns — any assignment yields the identical result set,
    a hash keeps it deterministic for a fixed input; map-typed columns
    are excluded because xxhash64 rejects them, and an all-map frame
    falls back to a per-row id); the dim side replicates each row
    n_salts times via posexplode; the join runs on (key, salt), so
    the hot key's rows spread across n_salts tasks at the cost of a
    ×n_salts dim replication — the standard trade (dim is the small
    side by contract).

    Result-identical to ``fact.join(dim, on, how)`` for 'inner' and
    'left' (property-tested); 'right'/'full' would double-count
    unmatched dim rows across salts and are rejected loudly. A
    pre-existing ``__salt`` column on either side is rejected loudly
    too — silently overwriting it would corrupt the caller's data.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports inner/left; {how!r} would duplicate "
            "unmatched dim rows across salts"
        )
    for side, df in (("fact", fact), ("dim", dim)):
        if "__salt" in df.columns:
            raise ValueError(
                f"salted_join: {side} side already has a '__salt' "
                "column — rename it; the rewrite reserves that name"
            )

    def _hashable(dt) -> bool:
        # xxhash64 rejects MapType anywhere in the type tree
        from pyspark.sql.types import ArrayType, MapType, StructType

        if isinstance(dt, MapType):
            return False
        if isinstance(dt, ArrayType):
            return _hashable(dt.elementType)
        if isinstance(dt, StructType):
            return all(_hashable(f.dataType) for f in dt.fields)
        return True

    hash_cols = [f.name for f in fact.schema.fields if _hashable(f.dataType)]
    salt_src = (
        F.xxhash64(*hash_cols)
        if hash_cols
        else F.monotonically_increasing_id()
    )
    salted_fact = fact.withColumn(
        "__salt", F.pmod(salt_src, F.lit(n_salts)).cast("int")
    )
    salted_dim = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>"))
    )
    return salted_fact.join(salted_dim, [on, "__salt"], how).drop("__salt")
