"""Iterative graph algorithms as DataFrame joins [EXT].

PageRank in exact integer arithmetic: the rank vector lives in
micro-units (BIGINT), each iteration distributes floor(rank/out_degree)
along edges and applies damping as an integer ratio — no float ever
enters the fold, so the fixed-iteration result is bit-identical on any
engine (the DuckDB oracle replays the iterations as unrolled CTEs, the
``connected_components`` discipline applied to rank propagation).

Scale shape: one hash-partitioned join (edges ⋈ ranks on src) plus one
groupBy(dst) per iteration — the standard distributed PageRank step;
``localCheckpoint`` truncates lineage per round exactly like
``dedup.connected_components`` (without it the plan doubles per
iteration and the DRIVER becomes the bottleneck). Edges are
repartitioned by src once and reused, so every iteration's join
reuses the same exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tw_etl_spark.functions.rounding import floor_div
from tw_etl_spark.operators.ckpt import free_local_checkpoint


def pagerank_integer(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    damping_pct: int = 85,
    scale: int = 1_000_000,
    conserve_dangling: bool = False,
) -> DataFrame:
    """Fixed-iteration integer PageRank over a directed edge list
    (Page et al. 1999; the "rank sums to N" convention, started from
    ``scale`` micro-units per source node).

    Per iteration, node v receives
    ``(100 - damping_pct)/100 * scale + damping_pct/100 * Σ_{u→v}
    floor(rank_u / out_degree_u)`` — every division a floor over
    non-negative BIGINTs, so the result is engine-exact. Nodes
    appearing only as destinations absorb rank without redistributing
    it (dangling semantics documented; symmetrize the edge list for
    conservation). Overflow bound: ranks stay below
    ``n_nodes * scale``, so ``damping_pct * Σ contribs`` needs
    ``n_nodes * scale * 100 < 2^63`` — ~9e16 nodes at micro-scale,
    never binding.

    ``conserve_dangling=True`` (VERDICT r10 #5) switches to the
    textbook dangling-mass treatment: EVERY node (sources and
    destination-only) starts at ``scale``, and each iteration folds
    the dangling nodes' aggregate rank back in uniformly —
    ``share = floor(Σ_{u dangling} rank_u / n_nodes)`` added to every
    node's contribution sum before damping. The dangling aggregate is
    ONE 1-row reduction per iteration broadcast back via crossJoin
    (the repo's 1-row-aggregate pattern — constant bytes, no
    data-sized exchange added); integer-exact, so the unrolled-CTE
    oracle replays it verbatim (g2). Rank mass is conserved up to the
    floor losses (each division drops < 1 micro-unit per operand —
    bounded per iteration by #edges + 2 * n_nodes micro-units,
    property-tested); on a graph with no dangling nodes the flag is a
    no-op (identical result, property-tested).

    Returns (node, rank_micro) for every node receiving rank after
    the final iteration (with conservation: every node, period).
    """
    if conserve_dangling:
        return _pagerank_conserving(
            edges, src, dst, iterations, damping_pct, scale
        )
    e = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .distinct()
        .repartition("s")
        .localCheckpoint()
    )
    deg = e.groupBy("s").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    # out-degree rides WITH the rank row so each iteration joins ranks
    # to edges once — no second join against a degree table per round
    ranks = deg.select(
        F.col("s").alias("node"),
        F.lit(scale).cast("long").alias("r"),
        "deg",
    ).localCheckpoint()
    base = F.lit((100 - damping_pct) * scale).cast("long")
    nodes = deg.withColumnRenamed("s", "node")
    for _ in range(iterations):
        contribs = (
            e.join(ranks.withColumnRenamed("node", "s"), "s")
            .select(
                F.col("d").alias("node"),
                floor_div(F.col("r"), F.col("deg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("s_in"))
        )
        # every SOURCE node keeps receiving the teleport mass even with
        # zero in-contributions (textbook PageRank; a bare groupBy over
        # contributions would silently drop no-in-edge nodes after
        # round 1). Destination-only nodes still absorb rank without
        # redistributing it (the documented dangling semantics).
        new_r = (
            nodes.join(contribs, "node", "full")
            .select(
                "node",
                floor_div(
                    base
                    + F.lit(damping_pct).cast("long")
                    * F.coalesce("s_in", F.lit(0)),
                    F.lit(100),
                ).alias("r"),
                F.coalesce("deg", F.lit(1)).alias("deg"),
            )
        )
        prev = ranks
        ranks = new_r.localCheckpoint()
        # round r materialized => round r-1's blocks are dead; storage
        # stays one rank-table wide however many iterations run
        free_local_checkpoint(prev)
    return ranks.select("node", F.col("r").alias("rank_micro"))


def _pagerank_conserving(
    edges: DataFrame,
    src: str,
    dst: str,
    iterations: int,
    damping_pct: int,
    scale: int,
) -> DataFrame:
    """conserve_dangling=True body: all-nodes anchor table (out-degree
    NULL marks a dangling node), per-iteration 1-row dangling-mass
    aggregate folded into every node's contribution sum."""
    e = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .distinct()
        .repartition("s")
        .localCheckpoint()
    )
    deg = e.groupBy("s").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    nodes = (
        e.select(F.col("s").alias("node"))
        .union(e.select(F.col("d").alias("node")))
        .distinct()
        .join(deg.withColumnRenamed("s", "node"), "node", "left")
        .localCheckpoint()
    )  # (node, deg) — deg NULL <=> dangling
    n_nodes = nodes.count()  # one scalar; the uniform-share denominator
    base = F.lit((100 - damping_pct) * scale).cast("long")
    ranks = nodes.select(
        "node", F.lit(scale).cast("long").alias("r"), "deg"
    ).localCheckpoint()
    for _ in range(iterations):
        contribs = (
            e.join(
                ranks.filter(F.col("deg").isNotNull()).withColumnRenamed(
                    "node", "s"
                ),
                "s",
            )
            .select(
                F.col("d").alias("node"),
                floor_div(F.col("r"), F.col("deg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("s_in"))
        )
        dang = ranks.filter(F.col("deg").isNull()).agg(
            F.coalesce(F.sum("r"), F.lit(0)).cast("long").alias("__dm")
        )
        share = floor_div(F.col("__dm"), F.lit(n_nodes))
        new_r = (
            ranks.select("node", "deg")
            .join(contribs, "node", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                floor_div(
                    base
                    + F.lit(damping_pct).cast("long")
                    * (F.coalesce("s_in", F.lit(0)) + share),
                    F.lit(100),
                ).alias("r"),
                "deg",
            )
        )
        prev = ranks
        ranks = new_r.localCheckpoint()
        free_local_checkpoint(prev)
    return ranks.select("node", F.col("r").alias("rank_micro"))
