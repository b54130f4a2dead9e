"""Explicit storage management for ``localCheckpoint`` loops.

Iterative operators (BPE merge rounds, PageRank, k-means) checkpoint a
small frame per round to truncate lineage. ``DataFrame.unpersist()``
does NOT free those blocks — it only drops CacheManager entries, and a
checkpointed frame holds its data as persisted RDD blocks underneath a
``LogicalRDD`` plan node (verified empirically: ``getRDDStorageInfo``
is unchanged by ``df.unpersist``). Without explicit release, executor
storage grows by one frame per round until the ContextCleaner happens
to GC the dropped Python reference (ADVICE r14).

``free_local_checkpoint`` releases the blocks deterministically by
unpersisting the underlying RDD through the plan node. Classic py4j
mode only; degrades to a no-op (ContextCleaner behavior) if the plan
shape is unexpected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def free_local_checkpoint(df: DataFrame, blocking: bool = False) -> bool:
    """Free the storage blocks of a ``localCheckpoint()``-ed DataFrame.

    Returns True when blocks were released. Safe to call on any frame:
    only acts when the analyzed plan is the ``LogicalRDD`` a checkpoint
    produces. NEVER call this while the checkpointed data may still be
    needed — unlike a cache drop, a truncated-lineage frame cannot be
    recomputed.
    """
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() != "LogicalRDD":
            return False
        plan.rdd().unpersist(blocking)
        return True
    except Exception:  # Connect mode / plan shape drift: leave to GC
        return False
