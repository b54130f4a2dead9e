"""Exactly-once foreachBatch sinks.

Structured Streaming's foreachBatch contract is AT-LEAST-ONCE: after a
crash between the user function and the checkpoint commit, the next
run REPLAYS the same (batch_id, data). A plain ``mode("append")``
write inside foreachBatch therefore duplicates the replayed batch —
the classic first streaming-sink bug, and the reason the reference
moves finished downloads through rename-into-place staging dirs
(convert.sh:53-57: work happens in CONVERT_PENDING, the artifact
appears in CONVERT_OUT atomically).

``idempotent_parquet_writer`` is the Spark-native equivalent: each
micro-batch lands in its own ``batch_id=N`` partition with dynamic
partition OVERWRITE, so a replay overwrites its own previous (possibly
partial) output instead of appending next to it. Readers see
exactly-once data at ``out_dir`` regardless of how many times any
batch ran. O(1) state, no sink-side dedup table, scales with the
partition count like any parquet write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def idempotent_parquet_writer(out_dir: str):
    """Return a foreachBatch function writing each micro-batch to
    ``out_dir/batch_id=N`` with partition-overwrite semantics (replay
    of batch N overwrites batch N's partition, never duplicates).

    Use: ``df.writeStream.foreachBatch(idempotent_parquet_writer(d))``.
    Read back with ``spark.read.parquet(d)`` — ``batch_id`` surfaces as
    a partition column; drop it if the consumer doesn't care.
    """

    def write(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_dir)
        )

    return write
