"""Sequence packing: bin-pack documents into fixed token budgets.

Training pipelines write fixed-length sequences; concatenating documents
into packs of ≤ budget tokens (instead of one doc + padding per
sequence) is the standard packing step. Exact bin packing is NP-hard
and inherently sequential, so at scale it is done per-partition: docs
are hash-bucketed, each bucket is packed independently with
first-fit-decreasing (deterministic: sorted by token count desc then
id), and pack ids are namespaced by bucket. Waste is bounded by the
per-bucket FFD guarantee (≤ 11/9 OPT + 1 bins per bucket); buckets add
at most one underfull pack each.

Spark shape: one shuffle (hash on bucket), then Arrow-batched pandas
per bucket — no driver-side data, no global sort. applyInPandas is the
right tool because packing is genuinely per-group imperative logic.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def pack_sequences(
    df: DataFrame,
    id_col: str,
    count_col: str,
    budget: int,
    num_buckets: int = 32,
    bucket_hash: str = "xxhash64",
) -> DataFrame:
    """Assign each row a pack id such that per-pack token counts stay
    ≤ ``budget`` (a single row larger than the budget gets a pack of its
    own). Returns (id_col, n_tok, pack_id, bucket). Deterministic: the
    same inputs always produce the same packing — first-fit-decreasing
    within each hash bucket, rows ordered (count desc, id asc).

    ``bucket_hash="md5"`` buckets by the portable md5-prefix hash
    instead of xxhash64, making the WHOLE assignment replayable by the
    DuckDB oracle (x3p: a recursive CTE simulates the per-bucket FFD
    fold state — remaining-room list — step by step). xxhash64 stays
    the default (cheaper, engine tier)."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("n_tok", T.LongType()),
            T.StructField("pack_id", T.StringType()),
            T.StructField("bucket", T.IntegerType()),
        ]
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        bucket = int(pdf["__bucket"].iloc[0])
        pdf = pdf.sort_values(["__n", id_col], ascending=[False, True])
        remaining: list[int] = []  # room left per open pack
        assign = []
        for n in pdf["__n"].to_numpy():
            n = int(n)
            placed = None
            if n <= budget:
                for i, room in enumerate(remaining):
                    if n <= room:
                        placed = i
                        remaining[i] = room - n
                        break
            if placed is None:
                remaining.append(max(budget - n, 0))
                placed = len(remaining) - 1
            assign.append(placed)
        return pd.DataFrame(
            {
                id_col: pdf[id_col].to_numpy(),
                "n_tok": pdf["__n"].to_numpy(),
                "pack_id": [f"{bucket}_{a}" for a in assign],
                "bucket": bucket,
            }
        )

    prepared = df.select(
        F.col(id_col),
        F.col(count_col).cast("bigint").alias("__n"),
        (
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_buckets))
            if bucket_hash == "xxhash64"
            else F.conv(
                F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
            ).cast("long")
            % num_buckets
        )
        .cast("int")
        .alias("__bucket"),
    )
    return prepared.groupBy("__bucket").applyInPandas(pack, schema=out_schema)
