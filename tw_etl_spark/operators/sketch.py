"""Portable cardinality sketches [EXT].

``approx_count_distinct`` (a6) runs on Spark's HLL++ — the right
100 TB tier (fixed-size sketch, mergeable map-side), but its bit
layout has no DuckDB twin, so it verifies by error band only. This
module adds the PORTABLE sketch tier: a K-Minimum-Values estimator
(Bar-Yossef et al. 2002, "Counting distinct elements in a data
stream") over the md5 hash family. KMV is deterministic given the
hash: both engines pick the same k smallest hashes, so the ESTIMATE
ITSELF sits under the cross-engine hash oracle (a7) — the same
verification pattern as the dd3p/dd4p/dd8p portable twins.

Estimator: hash every distinct value to u in (0,1) (first 12 md5 hex
chars / 16^12); with d >= k distinct values the k-th smallest hash
u_k estimates d as (k-1)/u_k; with d < k the sketch holds every
value and the count is exact.

Scale shape: one distinct on (group, 16-byte hash) — the same
shuffle exact countDistinct pays — then a per-group top-k on the
hash (partial-aggregated TakeOrdered shape via window row_number at
small group counts). The 100 TB path for global cardinality stays
HLL; KMV is the verification tier and the per-group estimator where
the oracle contract matters more than sketch size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# 16^12 — the hash-fraction denominator; 48 bits stays exact in a double.
_KMV_DENOM = float(16**12)


def kmv_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-group KMV distinct-count estimate.

    Returns one row per group: (group_cols..., est_distinct,
    n_exact_le_k) where ``est_distinct`` is exact when the group's
    distinct count is < k (the sketch saw everything) and the KMV
    estimate (k-1)/u_k otherwise, rounded to 4 decimals.
    """
    h = F.md5(F.col(value_col).cast("string")).alias("__h")
    d = df.select(*group_cols, h).distinct()
    w = Window.partitionBy(*group_cols).orderBy("__h")
    ranked = d.withColumn("__rn", F.row_number().over(w))
    u_k = F.conv(F.substring(F.max(F.when(F.col("__rn") == k, F.col("__h"))), 1, 12), 16, 10).cast(
        "double"
    ) / F.lit(_KMV_DENOM)
    nd = F.count(F.lit(1))
    return ranked.groupBy(*group_cols).agg(
        F.round(
            F.when(nd < k, nd.cast("double")).otherwise(F.lit(float(k - 1)) / u_k),
            4,
        ).alias("est_distinct"),
        (nd < k).alias("n_exact_le_k"),
    )


def _cms_bucket(value: "F.Column", row: "F.Column", width: int) -> "F.Column":
    """Count-Min bucket for (row, value) over the portable md5 family:
    first 8 hex chars of md5("<row>:<value>") as uint32, mod width —
    reconstructible verbatim in the DuckDB oracle."""
    h = F.md5(F.concat(row.cast("string"), F.lit(":"), value))
    return F.pmod(F.conv(F.substring(h, 1, 8), 16, 10).cast("long"), F.lit(width))


def cms_counts(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Build a Count-Min sketch (Cormode & Muthukrishnan 2005) over
    ``value_col`` occurrences: returns the (r, b, cnt) bucket-count
    table — depth*width rows regardless of data size.

    Scale shape: one narrow map fans each occurrence out to its
    ``depth`` (row, bucket) cells, then ONE map-side-combinable groupBy
    collapses to depth*width rows — the sketch is mergeable across
    shards by construction (cell-wise sum), which is the whole point at
    100 TB: heavy-hitter candidates can be estimated from a kilobyte of
    state instead of a full word-count shuffle."""
    return (
        df.select(F.col(value_col).cast("string").alias("v"))
        .select(
            "v",
            F.explode(F.array(*[F.lit(r) for r in range(depth)])).alias("r"),
        )
        .select("r", _cms_bucket(F.col("v"), F.col("r"), width).alias("b"))
        .groupBy("r", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def cms_estimate(
    candidates: DataFrame,
    sketch: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-query the sketch for each candidate value: the estimate is
    min over the depth rows of the candidate's bucket count (one-sided:
    estimate >= true count, always). The sketch table (depth*width
    rows) broadcasts.

    A candidate hashing to a bucket cell ABSENT from the sketch table
    (count 0 — the value never occurred) must contribute 0 to the min,
    not drop the row: left-join + coalesce keeps the min-over-depth-rows
    CMS definition exact and guarantees every candidate one output row
    (cms_est = 0 for values the sketch never saw)."""
    cand = candidates.select(
        F.col(value_col).cast("string").alias("v"),
        F.explode(F.array(*[F.lit(r) for r in range(depth)])).alias("r"),
    ).select("v", "r", _cms_bucket(F.col("v"), F.col("r"), width).alias("b"))
    return (
        cand.join(F.broadcast(sketch), ["r", "b"], "left")
        .groupBy("v")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("cms_est"))
    )


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    bins: int = 64,
    percentiles: tuple[int, ...] = (25, 50, 75, 90, 99),
) -> DataFrame:
    """Equi-width histogram quantile estimation — the mergeable
    quantile path beside a6/a9 (cardinality) and a11 (heavy hitters):
    bin counts sum across shards, so at 100 TB each shard ships
    ``bins`` longs instead of sorting anything. The estimate for
    percentile p is the UPPER EDGE of the first bin where the
    cumulative count crosses p% — guaranteed >= the true quantile and
    within one bin width of it (unit-tested); the crossing test is
    exact integer arithmetic (100*cum >= p*total), never a float
    threshold.

    Returns one row per percentile: (p, est, n_le, frac_le) where
    n_le counts values <= est (second scan) and frac_le is the exact
    fraction — frac_le >= p/100 by construction, both hash-pinned.

    Determinism: bin index and edges use single IEEE double ops in a
    fixed order ((v-lo)/(hi-lo)*bins, floor, clamp) — exactly rounded
    the same on any engine; the oracle replays them verbatim.
    """
    from tw_etl_spark.functions.rounding import exact_round_ratio

    v = df.select(F.col(value_col).cast("double").alias("v")).filter(
        F.col("v").isNotNull() & ~F.isnan("v")
    )
    stats = v.agg(
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
        F.count(F.lit(1)).cast("long").alias("total"),
    )
    # hi == lo (all values equal) would make the bin ratio 0/0 = NaN,
    # which errors on the long cast under ANSI mode — short-circuit to
    # bin 0 (everything in one bin; est = hi, exactly right).
    binned = (
        v.crossJoin(F.broadcast(stats))
        .select(
            F.when(F.col("hi") == F.col("lo"), F.lit(0))
            .otherwise(
                F.least(
                    F.lit(bins - 1),
                    F.floor(
                        (F.col("v") - F.col("lo"))
                        / (F.col("hi") - F.col("lo"))
                        * F.lit(float(bins))
                    ),
                )
            )
            .cast("long")
            .alias("idx")
        )
        .groupBy("idx")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    from pyspark.sql.window import Window

    cum = binned.withColumn(
        "cum", F.sum("cnt").over(Window.orderBy("idx"))
    )
    ps = df.sparkSession.createDataFrame(
        [(p,) for p in percentiles], "p long"
    )
    crossing = (
        ps.join(F.broadcast(cum.crossJoin(F.broadcast(stats))))
        .filter(F.col("cum") * 100 >= F.col("p") * F.col("total"))
        .groupBy("p")
        .agg(
            F.min("idx").alias("idx"),
            F.any_value("lo").alias("lo"),
            F.any_value("hi").alias("hi"),
            F.any_value("total").alias("total"),
        )
        .select(
            "p",
            (
                F.col("lo")
                + (F.col("idx") + 1)
                * (F.col("hi") - F.col("lo"))
                / F.lit(float(bins))
            ).alias("est"),
            "total",
        )
    )
    n_le = (
        v.crossJoin(F.broadcast(crossing))
        .filter(F.col("v") <= F.col("est"))
        .groupBy("p", "est", "total")
        .agg(F.count(F.lit(1)).cast("long").alias("n_le"))
    )
    return n_le.select(
        "p",
        "est",
        "n_le",
        exact_round_ratio(F.col("n_le"), F.col("total"), 6).alias("frac_le"),
    ).orderBy("p")


def kmv_set_algebra(
    df: DataFrame,
    set_col: str,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """KMV sketch SET ALGEBRA (the Theta-sketch use case): for every
    unordered pair of sets (distinct ``set_col`` values), estimate
    |A ∪ B| from the k smallest hashes of the combined distinct
    values, derive |A ∩ B| by inclusion-exclusion from the per-set KMV
    estimates, and emit the Jaccard estimate — all deterministic given
    the md5 hash family, so every number sits under the cross-engine
    hash oracle.

    Scale shape: ONE distinct over (set, 16-byte hash) feeds
    everything; per-set sketches come from a per-set top-k window, the
    pair union from a pair-exploded top-k window over ≤ 2k surviving
    hashes per set (each set contributes only its own sketch rows, so
    the pair stage is sketch-sized, never data-sized — exactly how
    mergeable sketches behave on a cluster).
    """
    h = F.md5(F.col(value_col).cast("string")).alias("h")
    d = df.select(F.col(set_col).alias("s"), h).distinct()
    w = Window.partitionBy("s").orderBy("h")
    sk = d.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )  # per-set sketch: its k smallest hashes (all of them if fewer)
    per = sk.groupBy("s").agg(
        F.count(F.lit(1)).alias("n_sk"),
        F.max(F.when(F.col("rn") == k, F.col("h"))).alias("hk"),
    )

    def est(n_sk, hk):
        u = F.conv(F.substring(hk, 1, 12), 16, 10).cast("double") / F.lit(
            _KMV_DENOM
        )
        return F.when(n_sk < k, n_sk.cast("double")).otherwise(
            F.lit(float(k - 1)) / u
        )

    a = per.select(
        F.col("s").alias("set_a"), est(F.col("n_sk"), F.col("hk")).alias("est_a")
    )
    b = per.select(
        F.col("s").alias("set_b"), est(F.col("n_sk"), F.col("hk")).alias("est_b")
    )
    pairs = a.join(b, F.col("set_a") < F.col("set_b"))

    # union sketch: k smallest of the two sets' sketch rows combined —
    # attach each side's sketch rows to the pair skeleton separately
    # (≤ 2k rows per pair; never a k x k product)
    keys = pairs.select("set_a", "set_b")
    ra = keys.join(sk.select(F.col("s").alias("set_a"), "h"), "set_a")
    rb = keys.join(sk.select(F.col("s").alias("set_b"), "h"), "set_b")
    psk = (
        ra.select("set_a", "set_b", "h")
        .unionByName(rb.select("set_a", "set_b", "h"))
        .distinct()
    )
    wp = Window.partitionBy("set_a", "set_b").orderBy("h")
    un = (
        psk.withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") <= k)
        .groupBy("set_a", "set_b")
        .agg(
            F.count(F.lit(1)).alias("n_sk"),
            F.max(F.when(F.col("rn") == k, F.col("h"))).alias("hk"),
        )
        .select(
            "set_a",
            "set_b",
            est(F.col("n_sk"), F.col("hk")).alias("est_union"),
        )
    )
    out = pairs.join(un, ["set_a", "set_b"])
    inter = F.greatest(
        F.lit(0.0), F.col("est_a") + F.col("est_b") - F.col("est_union")
    )
    return out.select(
        "set_a",
        "set_b",
        F.round("est_a", 4).alias("est_a"),
        F.round("est_b", 4).alias("est_b"),
        F.round("est_union", 4).alias("est_union"),
        F.round(inter, 4).alias("est_intersect"),
        F.round(inter / F.col("est_union"), 6).alias("est_jaccard"),
    ).orderBy("set_a", "set_b")
