"""Iterative graph-analytics queries [EXT]: fixed-iteration PageRank
in exact integer arithmetic over a purchase graph derived from the
driver tables — the iterative-join family beside the dedup tier's
connected components, with the whole iteration under the hash oracle
(unrolled-CTE replay, the BPE-training discipline applied to rank
propagation)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tw_etl_spark.catalog import read_table as _t
from tw_etl_spark.queries import register

_G1_ITERS = 5


def _g1_oracle(iters: int = _G1_ITERS) -> str:
    """Unrolled integer-PageRank replay: rank in micro-units, each
    round distributes floor(rank/out_degree) and damps by the exact
    integer ratio (15e6 + 85*S) // 100 — all operands non-negative, so
    DuckDB's truncating // IS floor."""
    parts = [
        """
    WITH e0 AS (
        SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_quantity > 45
    ), edges AS (
        SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0
    ), deg AS (
        SELECT src, count(*)::BIGINT AS deg FROM edges GROUP BY src
    ), r0 AS (
        SELECT src AS node, 1000000::BIGINT AS r FROM deg
    )"""
    ]
    for k in range(1, iters + 1):
        parts.append(f""",
    c{k} AS (
        SELECT e.dst AS node, sum(rr.r // d.deg)::BIGINT AS s_in
        FROM edges e
        JOIN r{k - 1} rr ON rr.node = e.src
        JOIN deg d ON d.src = e.src
        GROUP BY e.dst
    ), r{k} AS (
        -- anchored on deg so no-in-contribution source nodes keep the
        -- teleport mass (mirrors pagerank_integer; in the symmetrized
        -- graph every node is a source, so the anchor is complete)
        SELECT d.src AS node,
               ((15000000 + 85 * coalesce(c.s_in, 0)) // 100)::BIGINT AS r
        FROM deg d LEFT JOIN c{k} c ON c.node = d.src
    )""")
    parts.append(f"""
    SELECT node, r AS rank_micro FROM r{iters} ORDER BY node
    """)
    return "".join(parts)


@register(
    "g1_pagerank_purchase_graph",
    oracle=_g1_oracle(),
    doc="Fixed-iteration integer PageRank (Page et al. 1999) over the "
    "symmetrized customer-supplier purchase graph (distinct "
    "(cust, supp) pairs from lineitem x orders, quantity > 45): rank "
    "in BIGINT micro-units, floor(rank/out_degree) contributions, "
    "damping as the exact integer ratio (15e6 + 85*S)//100 — no float "
    "in the fold, so five iterations land bit-identically on any "
    "engine and the oracle replays them as unrolled CTEs. Scale: one "
    "src-partitioned edges⋈ranks join + one groupBy(dst) per "
    "iteration (the standard distributed PageRank step), lineage "
    "truncated per round via localCheckpoint (the "
    "connected_components discipline).",
    tags=("graph", "iterative", "pagerank", "ext"),
)
def g1(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tw_etl_spark.operators.graph import pagerank_integer

    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    o = _t(spark, sf_dir, "orders")
    e0 = (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    edges = e0.union(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    return (
        pagerank_integer(edges, iterations=_G1_ITERS)
        .orderBy("node")
    )


def _g2_oracle(iters: int = _G1_ITERS) -> str:
    """Unrolled replay of the CONSERVING variant: all-nodes anchor
    (deg NULL = dangling supplier in the unsymmetrized purchase graph),
    every node starts at scale, and each round folds
    floor(dangling_mass / n_nodes) into every node's contribution sum
    before damping. All operands non-negative BIGINTs, so DuckDB's
    truncating // is floor and the replay is bit-exact."""
    parts = [
        """
    WITH edges AS (
        SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_quantity > 45
    ), deg AS (
        SELECT src, count(*)::BIGINT AS deg FROM edges GROUP BY src
    ), nd AS (
        SELECT n.node, d.deg
        FROM (SELECT DISTINCT node FROM (
                  SELECT src AS node FROM edges
                  UNION ALL SELECT dst FROM edges)) n
        LEFT JOIN deg d ON d.src = n.node
    ), nn AS (SELECT count(*)::BIGINT AS n FROM nd),
    r0 AS (SELECT node, 1000000::BIGINT AS r, deg FROM nd)"""
    ]
    for k in range(1, iters + 1):
        parts.append(f""",
    d{k} AS (
        SELECT coalesce(sum(r), 0)::BIGINT AS dm
        FROM r{k - 1} WHERE deg IS NULL
    ),
    c{k} AS (
        SELECT e.dst AS node, sum(rr.r // rr.deg)::BIGINT AS s_in
        FROM edges e JOIN r{k - 1} rr ON rr.node = e.src
        GROUP BY e.dst
    ), r{k} AS (
        SELECT nd.node,
               ((15000000 + 85 * (coalesce(c.s_in, 0)
                                  + (SELECT dm FROM d{k})
                                    // (SELECT n FROM nn)))
                // 100)::BIGINT AS r,
               nd.deg
        FROM nd LEFT JOIN c{k} c ON c.node = nd.node
    )""")
    parts.append(f"""
    SELECT node, r AS rank_micro FROM r{iters} ORDER BY node
    """)
    return "".join(parts)


@register(
    "g2_pagerank_conserving",
    oracle=_g2_oracle(),
    doc="Conserved-dangling integer PageRank (VERDICT r10 #5) over the "
    "UNSYMMETRIZED purchase graph — customers point at suppliers, so "
    "every supplier is a dangling node and the variant matters: each "
    "iteration folds the dangling nodes' aggregate rank back in "
    "uniformly (share = floor(dangling_mass / n_nodes), ONE 1-row "
    "broadcast aggregate per round — no data-sized exchange added to "
    "g1's per-round join + groupBy shape). Integer-exact end to end; "
    "the oracle replays every round, including the dangling aggregate, "
    "as unrolled CTEs. Rank-sum conservation up to floor losses and "
    "the no-dangling no-op property are unit-tested "
    "(tests/test_relational.py).",
    tags=("graph", "iterative", "pagerank", "dangling", "ext"),
)
def g2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tw_etl_spark.operators.graph import pagerank_integer

    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    o = _t(spark, sf_dir, "orders")
    edges = (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    return pagerank_integer(
        edges, iterations=_G1_ITERS, conserve_dangling=True
    ).orderBy("node")
