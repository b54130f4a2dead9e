"""Merge / upsert (SCD-1) operator.

The reference's load stage is pure append (`s3-sync.sh:40-52` moves
artifacts into the bucket once); a general engine also needs the
update path: fold a batch of changed rows into a snapshot so that
changed keys take the new values and new keys are inserted.

Scale design (100 TB snapshot, MB..GB update batch): the classic
full-outer-join formulation shuffles BOTH sides on the key — the 100 TB
snapshot pays a full shuffle to absorb a tiny delta. Instead we use the
anti-join + union form:

    merged = (base ANTI JOIN updates ON keys) UNION ALL updates

With the update side broadcast (the common CDC case), the anti join is
a map-side BroadcastHashJoin — the snapshot streams through the scan
stage untouched by any Exchange, and the delta is appended. Partition
layout of the base is preserved, so a downstream
``write.partitionBy(...)`` rewrites only what changed when paired with
dynamic partition overwrite.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    broadcast_updates: bool = True,
) -> DataFrame:
    """SCD-1 merge: rows in ``updates`` win on key collision, unmatched
    update rows are inserted, unmatched base rows pass through.

    Both inputs must share a schema. ``broadcast_updates`` keeps the
    base-side scan shuffle-free (BroadcastHashJoin anti join); disable
    it when the delta is itself large, in which case Catalyst plans a
    shuffled SMJ anti join.
    """
    if base.columns != updates.columns:
        updates = updates.select(*base.columns)
    probe = updates.select(*keys).dropDuplicates(list(keys))
    if broadcast_updates:
        probe = F.broadcast(probe)
    kept = base.join(probe, on=list(keys), how="left_anti")
    return kept.unionByName(updates)


def scd2_merge(
    base: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    payload_cols: Sequence[str],
    eff_from: str = "effective_from",
    eff_to: str = "effective_to",
    current_col: str = "is_current",
    broadcast_updates: bool = True,
) -> DataFrame:
    """SCD-2 merge: history-preserving upsert. ``base`` carries
    (keys, payload, eff_from, eff_to, current_col); ``updates`` carries
    (keys, payload, eff_from = the change timestamp).

    Semantics per update row:
    - key exists with a *different* payload → the current version is
      closed (``eff_to`` = change ts, ``current_col`` = false) AND a new
      current version is appended;
    - key exists with an *equal* payload → no-op (dropped);
    - new key → inserted as the first current version.
    Historical (non-current) base rows always pass through untouched.

    The merge applies AT MOST ONE update row per key per pass (the
    SCD-2 invariant is one current row per key; two versions from one
    batch would need an intra-batch ordering this operator does not
    model). Duplicate-keyed updates are therefore reduced up front to
    the latest row per key — max ``eff_from``, payload-lexicographic
    tiebreak, deterministic. Callers with genuinely ordered multi-row
    histories per key should apply the merge once per change batch.

    Scale shape (100 TB base, bounded delta): the base streams through
    exactly two shuffle-free scans — a broadcast LEFT join against the
    delta (which emits pass-throughs, and for changed keys *both* the
    closed row and its replacement via one array+explode, no second
    pass), and a broadcast LEFT SEMI join that reduces matched keys to
    a tiny set so new-key detection is a delta-vs-delta anti join.
    Nothing ever hash-partitions the base.
    """
    keys = list(keys)
    payload_cols = list(payload_cols)
    base_cols = base.columns

    cur = base.filter(F.col(current_col))
    hist = base.filter(~F.col(current_col))

    u = updates.select(
        *keys,
        *[F.col(c).alias(f"__u_{c}") for c in payload_cols],
        F.col(eff_from).alias("__u_from"),
    )
    # one update per key per pass: keep the latest (max eff_from,
    # payload tiebreak — struct comparison is lexicographic, so this is
    # deterministic and a no-op for already-unique deltas). Delta-side
    # shuffle only; the base never sees it.
    u = (
        u.groupBy(*keys)
        .agg(
            F.max(
                F.struct(
                    F.col("__u_from"),
                    *[F.col(f"__u_{c}") for c in payload_cols],
                )
            ).alias("__m")
        )
        .select(*keys, "__m.*")
    )
    ub = F.broadcast(u) if broadcast_updates else u

    j = cur.join(ub, on=keys, how="left")
    payload_changed = F.lit(False)
    for c in payload_cols:
        payload_changed = payload_changed | ~F.col(c).eqNullSafe(F.col(f"__u_{c}"))
    is_change = F.col("__u_from").isNotNull() & payload_changed

    def _ver(field: str, closed: bool):
        if field == eff_to:
            return (F.col("__u_from") if closed else F.lit(None).cast(
                base.schema[eff_to].dataType
            )).alias(field)
        if field == current_col:
            return F.lit(not closed).alias(field)
        if not closed and field in payload_cols:
            return F.col(f"__u_{field}").alias(field)
        if not closed and field == eff_from:
            return F.col("__u_from").alias(field)
        return F.col(field).alias(field)

    closed_struct = F.struct(*[_ver(c, closed=True) for c in base_cols])
    new_struct = F.struct(*[_ver(c, closed=False) for c in base_cols])
    pass_struct = F.struct(*[F.col(c).alias(c) for c in base_cols])
    # one pass over the joined base emits pass-throughs AND (for changed
    # keys) both the closed row and its replacement — a single base scan
    # instead of two filtered branches
    cur_rows = (
        j.select(
            F.explode(
                F.when(is_change, F.array(closed_struct, new_struct)).otherwise(
                    F.array(pass_struct)
                )
            ).alias("r")
        )
        .select("r.*")
    )

    # new keys: shrink matched keys to <= |updates| rows via broadcast
    # semi join (base side shuffle-free), then anti join delta-vs-delta.
    # u is key-unique after the latest-row reduction, so no distinct on
    # the probe side; the matched-keys distinct stays (cur may carry a
    # key many times only in malformed bases, but it bounds the
    # broadcast regardless).
    matched_keys = (
        cur.join(F.broadcast(u.select(*keys)), keys, "left_semi")
        .select(*keys)
        .distinct()
    )
    inserts = (
        u.join(F.broadcast(matched_keys), keys, "left_anti")
        .select(
            *keys,
            *[F.col(f"__u_{c}").alias(c) for c in payload_cols],
            F.col("__u_from").alias(eff_from),
            F.lit(None).cast(base.schema[eff_to].dataType).alias(eff_to),
            F.lit(True).alias(current_col),
        )
        .select(*base_cols)
    )
    return cur_rows.unionByName(hist).unionByName(inserts)
