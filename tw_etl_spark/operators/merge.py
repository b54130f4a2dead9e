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
