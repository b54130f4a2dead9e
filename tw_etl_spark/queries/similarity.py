"""Similarity-search queries [EXT]: exact KNN (oracle-verified) and
LSH-bucketed approximate nearest neighbors (recall unit-tested)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tw_etl_spark.catalog import read_table as _t
from tw_etl_spark.operators.similarity import ann_ivf_topk, ann_lsh_topk, cosine_topk
from tw_etl_spark.queries import register


_LLOYD_MEAN = """(CASE WHEN (sum(round(u[g.range + 1] * 1e9)::BIGINT)::BIGINT) < 0 THEN -(((abs(sum(round(u[g.range + 1] * 1e9)::BIGINT)::BIGINT)::BIGINT * 1) // ((count(*))::BIGINT)) + CASE WHEN 2 * ((abs(sum(round(u[g.range + 1] * 1e9)::BIGINT)::BIGINT)::BIGINT * 1) % ((count(*))::BIGINT)) >= ((count(*))::BIGINT) THEN 1 ELSE 0 END) ELSE (((abs(sum(round(u[g.range + 1] * 1e9)::BIGINT)::BIGINT)::BIGINT * 1) // ((count(*))::BIGINT)) + CASE WHEN 2 * ((abs(sum(round(u[g.range + 1] * 1e9)::BIGINT)::BIGINT)::BIGINT * 1) % ((count(*))::BIGINT)) >= ((count(*))::BIGINT) THEN 1 ELSE 0 END) END / 1.0) / 1e9"""


def _ivf_lifecycle_ctes(n_lists: int, train_pred: str = "") -> str:
    """The shared DuckDB replay of the IVF index LIFECYCLE — one
    source of truth for the intricate scaled-integer k-means chain
    (dd8p's recipe: smallest-id seeds, one exact Lloyd step) used by
    v4p, v7p, v8p, v9, and st11's oracles: quantizer trained on the
    ``train_pred`` rows (empty = whole corpus), then the FULL corpus
    assigned against the trained centroids (``clist``). Callers append
    a tail over ``d2``/``clist`` (``_ivf_rank_tail`` for the
    probe-and-rank queries, the per-list aggregate for v9's audit) —
    so a fix to the replay can never drift between the copies."""
    seeds_where = f"WHERE {train_pred} " if train_pred else ""
    d1_where = f"\n            WHERE n.{train_pred}" if train_pred else ""
    return f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    unitv AS (
        SELECT vec_id,
               list_transform(
                   e, x -> x / greatest(sqrt(list_dot_product(e, e)), 1e-12)
               ) AS u
        FROM v
    ),
    seeds AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS j, u AS c
        FROM unitv {seeds_where}ORDER BY vec_id LIMIT {n_lists}
    ),
    d1 AS (
        SELECT vec_id, u, j, list_dot_product(dv, dv) AS dist
        FROM (
            SELECT n.vec_id, n.u, s.j,
                   list_transform(range(64), i -> n.u[i + 1] - s.c[i + 1]) AS dv
            FROM unitv n CROSS JOIN seeds s{d1_where}
        )
    ),
    a1 AS (
        SELECT vec_id, u, j AS c1
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY vec_id ORDER BY dist, j
            ) AS rn FROM d1
        ) WHERE rn = 1
    ),
    m AS (
        SELECT c1, g.range AS i,
               {_LLOYD_MEAN} AS mv
        FROM a1 CROSS JOIN range(64) g
        GROUP BY c1, g.range
    ),
    cents2 AS (
        SELECT row_number() OVER (ORDER BY c1) - 1 AS j, c
        FROM (SELECT c1, list(mv ORDER BY i) AS c FROM m GROUP BY c1)
    ),
    d2 AS (
        SELECT vec_id, u, j, list_dot_product(dv, dv) AS dist
        FROM (
            SELECT n.vec_id, n.u, s.j,
                   list_transform(range(64), i -> n.u[i + 1] - s.c[i + 1]) AS dv
            FROM unitv n CROSS JOIN cents2 s
        )
    ),
    clist AS (
        SELECT vec_id AS cand_id, u AS cu, j AS list_id
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY vec_id ORDER BY dist, j
            ) AS rn FROM d2
        ) WHERE rn = 1
    ),"""


def _ivf_rank_tail(query_pred: str, nprobe: int, k: int) -> str:
    """The probe-and-rank tail shared by v4p/v7p/v8p/st11: nprobe
    nearest lists per query, candidate join, round-6/id-tiebroken
    exact top-k re-rank."""
    return f"""
    qprobe AS (
        SELECT vec_id AS query_id, u AS qu, j AS list_id
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY vec_id ORDER BY dist, j
            ) AS rn FROM d2 WHERE {query_pred}
        ) WHERE rn <= {nprobe}
    ),
    cand AS (
        SELECT query_id, cand_id,
               round(list_dot_product(qu, cu), 6) + 0.0 AS sim
        FROM qprobe q JOIN clist c
          ON q.list_id = c.list_id AND c.cand_id <> q.query_id
    )
    SELECT query_id, cand_id, sim, rank FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY sim DESC, cand_id
        ) AS rank
        FROM cand
    ) WHERE rank <= {k}
    ORDER BY query_id, rank
    """



@register(
    "v2_knn_exact",
    oracle="""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    q AS (SELECT * FROM v WHERE vec_id < 20),
    sims AS (
        SELECT q.vec_id AS qid, c.vec_id AS nid,
               list_dot_product(q.e, c.e)
               / (sqrt(list_dot_product(q.e, q.e)) * sqrt(list_dot_product(c.e, c.e))) AS s
        FROM q JOIN v c ON q.vec_id <> c.vec_id
    ),
    ranked AS (
        SELECT qid, nid, s,
               row_number() OVER (PARTITION BY qid ORDER BY s DESC, nid) AS rn
        FROM sims
    )
    SELECT qid AS query_id, nid AS neighbor_id,
           CAST(rn AS BIGINT) AS rank, round(s, 6) AS cos_sim
    FROM ranked WHERE rn <= 3
    ORDER BY query_id, rank
    """,
    doc="Exact per-query top-3 cosine neighbors (20 queries vs full corpus) "
    "via broadcast-matmul brute force — the ANN correctness baseline.",
    tags=("vector", "knn", "ext"),
)
def v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = _t(spark, sf_dir, "embeddings")
    q = v.filter(F.col("vec_id") < 20)
    return (
        cosine_topk(q, v, k=3)
        .withColumn("cos_sim", F.round("cos_sim", 6))
        .orderBy("query_id", "rank")
    )


@register(
    "v3_ann_lsh",
    oracle=None,  # approximate; recall vs exact asserted in tests/test_similarity.py
    doc="Random-hyperplane LSH ANN (8 tables × 8 planes), exact re-rank of "
    "bucket-collision candidates. Shuffle-based (no broadcast) — the path "
    "for corpora too large for memory.",
    tags=("vector", "ann", "ext"),
)
def v3(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = _t(spark, sf_dir, "embeddings")
    q = v.filter(F.col("vec_id") < 20)
    return ann_lsh_topk(q, v, k=3).orderBy("query_id", "rank")


@register(
    "v3p_ann_lsh_portable",
    oracle="""
    WITH planes AS (
        SELECT p.range AS p,
               list_transform(range(64), i ->
                   (((('0x' || substr(md5('h:' || p.range::VARCHAR || ':'
                        || i::VARCHAR), 1, 8))::BIGINT) % 2001) - 1000) / 1000.0
               ) AS w
        FROM range(6) p
    ),
    v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    u AS (
        SELECT vec_id,
               list_transform(
                   e, x -> x / greatest(sqrt(list_dot_product(e, e)), 1e-12)
               ) AS u
        FROM v
    ),
    b AS (
        SELECT vec_id, u,
               sum(CASE WHEN list_dot_product(u, w) >= 0
                        THEN 1::BIGINT << p ELSE 0 END) AS bucket
        FROM u CROSS JOIN planes
        GROUP BY vec_id, u
    ),
    cand AS (
        SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
               round(list_dot_product(q.u, c.u), 6) AS sim
        FROM b q JOIN b c ON q.bucket = c.bucket AND c.vec_id <> q.vec_id
        WHERE q.vec_id < 20
    )
    SELECT query_id, cand_id, sim, rank FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY sim DESC, cand_id
        ) AS rank
        FROM cand
    ) WHERE rank <= 3
    ORDER BY query_id, rank
    """,
    doc="Random-hyperplane LSH ANN over DETERMINISTIC md5-derived "
    "hyperplanes (6 planes, single table): planes, sign buckets, "
    "candidate sets, and the round-6/id-tiebroken top-3 re-rank are "
    "all reconstructed by the DuckDB oracle, so the APPROXIMATE "
    "RESULT ITSELF hash-matches cross-engine — the portable-twin "
    "pattern (dd3p/dd4p/dd8p/a9/t6p) applied to ANN. Same shuffle "
    "shape as v3 (both sides shuffle on bucket, nothing broadcast); "
    "the engine tier's multi-table OR-amplification stays the recall "
    "path.",
    tags=("vector", "ann", "ext"),
)
def v3p(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tw_etl_spark.operators.similarity import ann_lsh_portable_topk

    v = _t(spark, sf_dir, "embeddings")
    q = v.filter(F.col("vec_id") < 20)
    return ann_lsh_portable_topk(q, v, planes=6, k=3).orderBy("query_id", "rank")


@register(
    "v4p_ann_ivf_portable",
    oracle=_ivf_lifecycle_ctes(8)
    + _ivf_rank_tail("vec_id < 20", nprobe=2, k=3),
    doc="IVF ANN under the FULL hash oracle — the portable twin of v4, "
    "closing the last recall-only-gated ANN family: dd8p's relational "
    "k-means (smallest-id seeds + one Lloyd step with exact "
    "scaled-integer means) is the coarse quantizer; inverted-list "
    "assignment, nprobe=2 probe lists, the list_id candidate join, and "
    "the round-6/id-tiebroken top-3 exact re-rank are all replayed by "
    "the DuckDB oracle, so the APPROXIMATE RESULT ITSELF "
    "hash-matches cross-engine. Same plan shape as v4: narrow-map "
    "assignments (centroid literals in the expression), candidate join "
    "hash-partitioned on list_id, volume |corpus|*nprobe/n_lists.",
    tags=("vector", "ann", "ext"),
)
def v4p(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tw_etl_spark.operators.similarity import ann_ivf_portable_topk

    v = _t(spark, sf_dir, "embeddings")
    q = v.filter(F.col("vec_id") < 20)
    return ann_ivf_portable_topk(q, v, n_lists=8, nprobe=2, k=3).orderBy(
        "query_id", "rank"
    )


@register(
    "v4_ann_ivf",
    oracle=None,  # approximate; recall vs exact asserted in tests/test_similarity.py
    doc="IVF-partitioned ANN (k-means coarse quantizer over a bounded "
    "sample; corpus in one inverted list each; queries probe nprobe "
    "lists; exact re-rank). The FAISS-style scale path: candidate volume "
    "is |corpus|·nprobe/n_lists, join hash-partitioned on list_id.",
    tags=("vector", "ann", "ext"),
)
def v4(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = _t(spark, sf_dir, "embeddings")
    q = v.filter(F.col("vec_id") < 20)
    return ann_ivf_topk(q, v, k=3, n_lists=16, nprobe=4).orderBy("query_id", "rank")


@register(
    "v7p_ann_ivf_persisted",
    oracle=_ivf_lifecycle_ctes(16)
    + _ivf_rank_tail("vec_id < 5", nprobe=2, k=3),
    doc="IVF ANN against a PERSISTED index artifact (the similarity "
    "family's round-12 sibling of dd18's banded layout): "
    "operators/similarity.write_ivf_index stores the relational-kmeans "
    "centroids beside the inverted lists written partitionBy(list_id); "
    "ann_ivf_persisted_topk assigns the query batch its nprobe nearest "
    "lists as a narrow map, collects the probed list-id set (bounded "
    "by n_lists, never data-sized) and pushes it as a literal "
    "IN-filter — nprobe becomes parquet PARTITION PRUNING, so the "
    "unprobed share of a 100 TB corpus is never opened "
    "(plan-asserted in tests/test_plans.py). Values identical to v4p's "
    "contract (round-6 sim, id tiebreak); the oracle replays the whole "
    "thing: 16-list k-means, assignment, 5-query/2-probe sets, exact "
    "re-rank — a hash match proves the write -> read -> prune -> rank "
    "roundtrip loses nothing.",
    tags=("vector", "ann", "index", "ext"),
)
def v7p(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from tw_etl_spark.operators.similarity import (
        ann_ivf_persisted_topk,
        write_ivf_index,
    )
    from tw_etl_spark.queries.dedup import _delta_scratch

    v = _t(spark, sf_dir, "embeddings")
    root = _delta_scratch(spark, sf_dir, "v7p")
    shutil.rmtree(root, ignore_errors=True)
    write_ivf_index(v, root, n_lists=16)
    q = v.filter(F.col("vec_id") < 5)
    return ann_ivf_persisted_topk(q, root, nprobe=2, k=3).orderBy(
        "query_id", "rank"
    )


@register(
    "v8p_ann_ivf_delta",
    oracle=_ivf_lifecycle_ctes(16, "vec_id % 3 <> 0")
    + _ivf_rank_tail("vec_id < 5", nprobe=2, k=3),
    doc="INCREMENTAL IVF index maintenance — the delta-dedup pattern "
    "(fixed durable index, O(|new|) daily cost) applied to ANN, closing "
    "the similarity family's last batch-rebuild dependency: "
    "write_ivf_index trains the quantizer on the OLD corpus "
    "(vec_id % 3 != 0) and persists centroids + partitionBy(list_id) "
    "lists; operators/similarity.append_ivf_index assigns the NEW batch "
    "(vec_id % 3 == 0) to the FIXED persisted centroids as a "
    "shuffle-free narrow map and appends its partitions — no retrain, "
    "no rewrite, not one old list file reopened (plan- and file-level "
    "asserted in tests). ann_ivf_persisted_topk then queries the merged "
    "index with nprobe partition pruning exactly as v7p. The oracle "
    "replays the whole lifecycle: old-only k-means, full-corpus "
    "assignment, 5-query/2-probe sets, round-6/id-tiebroken top-3 — a "
    "hash match proves train -> write -> append -> prune -> rank loses "
    "nothing across the batch boundary.",
    tags=("vector", "ann", "index", "delta", "ext"),
)
def v8p(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from tw_etl_spark.operators.similarity import (
        ann_ivf_persisted_topk,
        append_ivf_index,
        write_ivf_index,
    )
    from tw_etl_spark.queries.dedup import _delta_scratch

    v = _t(spark, sf_dir, "embeddings")
    root = _delta_scratch(spark, sf_dir, "v8p")
    shutil.rmtree(root, ignore_errors=True)
    write_ivf_index(v.filter(F.col("vec_id") % 3 != 0), root, n_lists=16)
    append_ivf_index(v.filter(F.col("vec_id") % 3 == 0), root)
    q = v.filter(F.col("vec_id") < 5)
    return ann_ivf_persisted_topk(q, root, nprobe=2, k=3).orderBy(
        "query_id", "rank"
    )


@register(
    "v9_ivf_skew_audit",
    oracle=_ivf_lifecycle_ctes(16, "vec_id % 3 <> 0")
    + """
    per AS (
        SELECT list_id, count(*)::BIGINT AS n FROM clist GROUP BY list_id
    )
    SELECT count(*)::BIGINT                          AS n_lists,
           sum(n)::BIGINT                            AS n_vectors,
           min(n)::BIGINT                            AS min_list,
           max(n)::BIGINT                            AS max_list,
           round(max(n) * count(*) / sum(n), 6)      AS imbalance,
           max(n) * count(*) > 3.0 * sum(n)          AS recluster
    FROM per
    """,
    doc="IVF index OBSERVABILITY — the operational close of the "
    "persisted-index family: after v8p/st11 appends against FIXED "
    "old-trained centroids, list sizes drift with the data "
    "distribution, degrading probe cost (one hot list dominates "
    "candidate volume) and recall (nprobe lists cover less mass). "
    "operators/similarity.ivf_index_stats reads ONLY the list_id "
    "partition column of the persisted lists (column pruning — the "
    "vectors are never deserialized) and emits the one-row balance "
    "audit: non-empty list count, vector count, min/max list sizes, "
    "imbalance = max_list/(n_vectors/n_lists) (~1.0 when balanced), "
    "and the recluster flag at threshold 3.0 — the retrain trigger a "
    "production pipeline schedules on. Oracle replays the whole "
    "lifecycle (old-only k-means, full-corpus assignment, per-list "
    "counts, the aggregate) so the audit itself is cross-engine-"
    "pinned.",
    tags=("vector", "ann", "index", "ops", "ext"),
)
def v9(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from tw_etl_spark.operators.similarity import (
        append_ivf_index,
        ivf_index_stats,
        write_ivf_index,
    )
    from tw_etl_spark.queries.dedup import _delta_scratch

    v = _t(spark, sf_dir, "embeddings")
    root = _delta_scratch(spark, sf_dir, "v9")
    shutil.rmtree(root, ignore_errors=True)
    write_ivf_index(v.filter(F.col("vec_id") % 3 != 0), root, n_lists=16)
    append_ivf_index(v.filter(F.col("vec_id") % 3 == 0), root)
    return ivf_index_stats(spark, root, imbalance_threshold=3.0)


@register(
    "v10_ivf_recluster",
    oracle=_ivf_lifecycle_ctes(16)
    + _ivf_rank_tail("vec_id < 5", nprobe=2, k=3),
    doc="IVF index RECLUSTER — the action v9's audit flag triggers, "
    "closing the index lifecycle (write -> append -> audit -> "
    "recluster): operators/similarity.recluster_ivf_index retrains the "
    "quantizer on the FULL indexed corpus read straight out of the "
    "persisted lists (the source table is not consulted — stored unit "
    "vectors round-trip bit-identically via assume_unit, which skips "
    "the re-normalization whose 1-ulp norm error would decouple the "
    "rebuild) and writes a fresh balanced artifact at a NEW root "
    "(never in place — live readers unaffected until the caller swaps)."
    " The query builds write(old % 3 != 0) + append(new), reclusters, "
    "and probes the rebuilt index; the oracle is v7p's train-on-ALL "
    "lifecycle replay — a hash match proves "
    "recluster(write(old) + append(new)) == write(old ∪ new) exactly.",
    tags=("vector", "ann", "index", "ops", "ext"),
)
def v10(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from tw_etl_spark.operators.similarity import (
        ann_ivf_persisted_topk,
        append_ivf_index,
        recluster_ivf_index,
        write_ivf_index,
    )
    from tw_etl_spark.queries.dedup import _delta_scratch

    v = _t(spark, sf_dir, "embeddings")
    root = _delta_scratch(spark, sf_dir, "v10")
    shutil.rmtree(root, ignore_errors=True)
    import os

    live = os.path.join(root, "live")
    rebuilt = os.path.join(root, "rebuilt")
    write_ivf_index(v.filter(F.col("vec_id") % 3 != 0), live, n_lists=16)
    append_ivf_index(v.filter(F.col("vec_id") % 3 == 0), live)
    recluster_ivf_index(spark, live, rebuilt, n_lists=16)
    return ann_ivf_persisted_topk(
        v.filter(F.col("vec_id") < 5), rebuilt, nprobe=2, k=3
    ).orderBy("query_id", "rank")


@register(
    "v5p_knn_quantized_portable",
    oracle="""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    u AS (
        SELECT vec_id,
               list_transform(
                   e, x -> x / greatest(sqrt(list_dot_product(e, e)), 1e-12)
               ) AS u
        FROM v
    ),
    q8 AS (
        SELECT vec_id, u,
               list_transform(u, x -> round(x * 127.0)::BIGINT) AS q
        FROM u
    ),
    -- integer coarse scores: exact, order-independent on any engine
    -- (|q| <= 127, dim 64 -> |dot| <= 1,032,256, double-exact too)
    coarse AS (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               a.u AS qu, b.u AS cu,
               list_dot_product(
                   list_transform(a.q, x -> x::DOUBLE),
                   list_transform(b.q, x -> x::DOUBLE)
               )::BIGINT AS coarse
        FROM q8 a JOIN q8 b ON b.vec_id <> a.vec_id
        WHERE a.vec_id < 20
    ),
    cut AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY coarse DESC, neighbor_id
            ) AS cutrank
            FROM coarse
        ) WHERE cutrank <= 12
    )
    SELECT query_id, neighbor_id, rank, cos_sim FROM (
        SELECT query_id, neighbor_id,
               round(list_dot_product(qu, cu), 6) + 0.0 AS cos_sim,
               row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY round(list_dot_product(qu, cu), 6) + 0.0 DESC,
                            neighbor_id
               ) AS rank
        FROM cut
    ) WHERE rank <= 3
    ORDER BY query_id, rank
    """,
    doc="Int8-quantized KNN under the FULL hash oracle — the portable "
    "twin of v5: round(u*127) quantization, INTEGER coarse dot "
    "products (exact, fold-order-immune by construction — the same "
    "order-independence discipline as t15/dd8p applied to the "
    "candidate cut), k*rerank_factor=12 id-tiebroken cut, exact "
    "round-6 float re-rank to top-3. Quantizer and cut rule match the "
    "engine tier (similarity.cosine_topk_quantized), which remains "
    "the scale path (broadcast int8 matmul, 4x shuffle/memory cut).",
    tags=("vector", "knn", "quantized", "ext"),
)
def v5p(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tw_etl_spark.operators.similarity import cosine_topk_quantized_portable

    v = _t(spark, sf_dir, "embeddings")
    q = v.filter(F.col("vec_id") < 20)
    return cosine_topk_quantized_portable(q, v, k=3, rerank_factor=4).orderBy(
        "query_id", "rank"
    )


@register(
    "v5_knn_quantized",
    oracle=None,  # int8 candidate cut is approximate; recall unit-tested
    doc="Top-k with an int8-quantized candidate pass (4x smaller "
    "broadcast, integer matmul) and exact float re-rank of the "
    "k*rerank_factor survivors. The shuffle/memory lever for vector "
    "search at 100 TB (SURVEY hard-part f).",
    tags=("vector", "knn", "quantized", "ext"),
)
def v5(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tw_etl_spark.operators.similarity import cosine_topk_quantized

    v = _t(spark, sf_dir, "embeddings")
    q = v.filter(F.col("vec_id") < 20)
    return (
        cosine_topk_quantized(q, v, k=3, rerank_factor=4)
        .withColumn("cos_sim", F.round("cos_sim", 6))
        .orderBy("query_id", "rank")
    )


@register(
    "v6p_ann_ivfpq_portable",
    oracle="""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    unitv AS (
        SELECT vec_id,
               list_transform(
                   e, x -> x / greatest(sqrt(list_dot_product(e, e)), 1e-12)
               ) AS u
        FROM v
    ),
    seeds AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS j, u AS c
        FROM unitv ORDER BY vec_id LIMIT 8
    ),
    d1 AS (
        SELECT vec_id, u, j, list_dot_product(dv, dv) AS dist
        FROM (
            SELECT n.vec_id, n.u, s.j,
                   list_transform(range(64), i -> n.u[i + 1] - s.c[i + 1]) AS dv
            FROM unitv n CROSS JOIN seeds s
        )
    ),
    a1 AS (
        SELECT vec_id, u, j AS c1
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY vec_id ORDER BY dist, j
            ) AS rn FROM d1
        ) WHERE rn = 1
    ),
    m AS (
        SELECT c1, g.range AS i,
               (CASE WHEN (sum(round(u[g.range + 1] * 1e9)::BIGINT)::BIGINT) < 0 THEN -(((abs(sum(round(u[g.range + 1] * 1e9)::BIGINT)::BIGINT)::BIGINT * 1) // ((count(*))::BIGINT)) + CASE WHEN 2 * ((abs(sum(round(u[g.range + 1] * 1e9)::BIGINT)::BIGINT)::BIGINT * 1) % ((count(*))::BIGINT)) >= ((count(*))::BIGINT) THEN 1 ELSE 0 END) ELSE (((abs(sum(round(u[g.range + 1] * 1e9)::BIGINT)::BIGINT)::BIGINT * 1) // ((count(*))::BIGINT)) + CASE WHEN 2 * ((abs(sum(round(u[g.range + 1] * 1e9)::BIGINT)::BIGINT)::BIGINT * 1) % ((count(*))::BIGINT)) >= ((count(*))::BIGINT) THEN 1 ELSE 0 END) END / 1.0) / 1e9 AS mv
        FROM a1 CROSS JOIN range(64) g
        GROUP BY c1, g.range
    ),
    cents2 AS (
        SELECT row_number() OVER (ORDER BY c1) - 1 AS j, c
        FROM (SELECT c1, list(mv ORDER BY i) AS c FROM m GROUP BY c1)
    ),
    d2 AS (
        SELECT vec_id, u, j, list_dot_product(dv, dv) AS dist
        FROM (
            SELECT n.vec_id, n.u, s.j,
                   list_transform(range(64), i -> n.u[i + 1] - s.c[i + 1]) AS dv
            FROM unitv n CROSS JOIN cents2 s
        )
    ),
    clist AS (
        SELECT vec_id AS cand_id, u AS cu, j AS list_id
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY vec_id ORDER BY dist, j
            ) AS rn FROM d2
        ) WHERE rn = 1
    ),
    qprobe AS (
        SELECT vec_id AS query_id, u AS qu, j AS list_id
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY vec_id ORDER BY dist, j
            ) AS rn FROM d2 WHERE vec_id < 20
        ) WHERE rn <= 2
    ),
    psub AS (
        SELECT vec_id, s.range AS s,
               list_slice(u, s.range * 8 + 1, s.range * 8 + 8) AS us
        FROM unitv CROSS JOIN range(8) s
    ),
    pseeds AS (
        SELECT s, us AS c,
               row_number() OVER (PARTITION BY s ORDER BY vec_id) - 1 AS j
        FROM psub
        QUALIFY row_number() OVER (PARTITION BY s ORDER BY vec_id) <= 4
    ),
    pd1 AS (
        SELECT vec_id, s, us, j, list_dot_product(dv, dv) AS dist
        FROM (
            SELECT n.vec_id, n.s, n.us, p.j,
                   list_transform(range(8), i -> n.us[i + 1] - p.c[i + 1]) AS dv
            FROM psub n JOIN pseeds p ON p.s = n.s
        )
    ),
    pa1 AS (
        SELECT vec_id, s, us, j AS c1
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY vec_id, s ORDER BY dist, j
            ) AS rn FROM pd1
        ) WHERE rn = 1
    ),
    pm AS (
        SELECT s, c1, g.range AS i,
               (CASE WHEN (sum(round(us[g.range + 1] * 1e9)::BIGINT)::BIGINT) < 0 THEN -(((abs(sum(round(us[g.range + 1] * 1e9)::BIGINT)::BIGINT)::BIGINT * 1) // ((count(*))::BIGINT)) + CASE WHEN 2 * ((abs(sum(round(us[g.range + 1] * 1e9)::BIGINT)::BIGINT)::BIGINT * 1) % ((count(*))::BIGINT)) >= ((count(*))::BIGINT) THEN 1 ELSE 0 END) ELSE (((abs(sum(round(us[g.range + 1] * 1e9)::BIGINT)::BIGINT)::BIGINT * 1) // ((count(*))::BIGINT)) + CASE WHEN 2 * ((abs(sum(round(us[g.range + 1] * 1e9)::BIGINT)::BIGINT)::BIGINT * 1) % ((count(*))::BIGINT)) >= ((count(*))::BIGINT) THEN 1 ELSE 0 END) END / 1.0) / 1e9 AS mv
        FROM pa1 CROSS JOIN range(8) g
        GROUP BY s, c1, g.range
    ),
    pcents AS (
        SELECT s, row_number() OVER (PARTITION BY s ORDER BY c1) - 1 AS j, c
        FROM (SELECT s, c1, list(mv ORDER BY i) AS c FROM pm GROUP BY s, c1)
    ),
    pd2 AS (
        SELECT vec_id, s, j, list_dot_product(dv, dv) AS dist
        FROM (
            SELECT n.vec_id, n.s, p.j,
                   list_transform(range(8), i -> n.us[i + 1] - p.c[i + 1]) AS dv
            FROM psub n JOIN pcents p ON p.s = n.s
        )
    ),
    pcodes AS (
        SELECT vec_id, s, j AS code
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY vec_id, s ORDER BY dist, j
            ) AS rn FROM pd2
        ) WHERE rn = 1
    ),
    pairs AS (
        SELECT q.query_id, c.cand_id, q.qu
        FROM qprobe q JOIN clist c
          ON q.list_id = c.list_id AND c.cand_id <> q.query_id
    ),
    partials AS (
        SELECT p.query_id, p.cand_id, cs.s,
               list_dot_product(
                   list_slice(p.qu, cs.s * 8 + 1, cs.s * 8 + 8), pc.c
               ) AS part
        FROM pairs p
        JOIN pcodes cs ON cs.vec_id = p.cand_id
        JOIN pcents pc ON pc.s = cs.s AND pc.j = cs.code
    ),
    adcs AS (
        -- subspace-order fold with a 0.0 seed, mirroring the Spark
        -- side's aggregate() bit for bit
        SELECT query_id, cand_id,
               list_reduce(list_prepend(0.0, list(part ORDER BY s)),
                           (a, b) -> a + b) AS adc
        FROM partials GROUP BY query_id, cand_id
    ),
    cut AS (
        SELECT query_id, cand_id
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY adc DESC, cand_id
            ) AS rn FROM adcs
        ) WHERE rn <= 12
    )
    SELECT query_id, neighbor_id, rank, cos_sim FROM (
        SELECT t.query_id, t.cand_id AS neighbor_id,
               round(list_dot_product(uq.u, uc2.u), 6) + 0.0 AS cos_sim,
               row_number() OVER (
                   PARTITION BY t.query_id
                   ORDER BY round(list_dot_product(uq.u, uc2.u), 6) + 0.0
                            DESC, t.cand_id
               ) AS rank
        FROM cut t
        JOIN unitv uq ON uq.vec_id = t.query_id
        JOIN unitv uc2 ON uc2.vec_id = t.cand_id
    ) WHERE rank <= 3
    ORDER BY query_id, rank
    """,
    doc="IVF-PQ ANN under the FULL hash oracle — the portable twin of "
    "v6, completing the ANN family set (v3p LSH, v4p IVF, v5p int8, "
    "v6p IVF-PQ): coarse IVF exactly as v4p; per-subspace PQ codebooks "
    "(8 subspaces x 4 codewords) each trained by the same relational "
    "k-means (smallest-id seeds + one exact scaled-integer Lloyd "
    "step); corpus rows encode to nearest codewords; ADC candidate "
    "scores fold dot(query_subvector, codeword[code]) in subspace "
    "order with a 0.0 seed on both engines; id-tiebroken cut of 12, "
    "exact round-6 re-rank to top-3. The engine tier (v6: uint8 codes "
    "in the shuffle, 64x volume cut, numpy ADC) remains the scale "
    "path.",
    tags=("vector", "ann", "pq", "ext"),
)
def v6p(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tw_etl_spark.operators.similarity import ann_ivfpq_portable_topk

    v = _t(spark, sf_dir, "embeddings")
    q = v.filter(F.col("vec_id") < 20)
    return ann_ivfpq_portable_topk(
        q, v, n_lists=8, nprobe=2, m_sub=8, k_codes=4, k=3, rerank_factor=4
    ).orderBy("query_id", "rank")


@register(
    "v6_ann_ivfpq",
    oracle=None,  # approximate; recall-vs-IVF-ceiling asserted in tests
    doc="IVF-PQ ANN: inverted-list pruning + product-quantized candidate "
    "scoring (8 uint8 codes per corpus row in the candidate shuffle — "
    "64x less shuffle volume than the full 64-dim float vector) + ADC "
    "table-lookup scoring + exact re-rank of the top survivors. At the "
    "default settings the end recall equals the plain-IVF ceiling.",
    tags=("vector", "ann", "pq", "ext"),
)
def v6(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tw_etl_spark.operators.similarity import ann_ivfpq_topk

    v = _t(spark, sf_dir, "embeddings")
    q = v.filter(F.col("vec_id") < 20)
    return ann_ivfpq_topk(q, v, k=3, n_lists=16, nprobe=4).orderBy("query_id", "rank")


def _hybrid_rrf_oracle(k_lex: int, k_dense: int, k0: int, k: int) -> str:
    """DuckDB replay of v11's hybrid retrieval. The lexical list is the
    parameterized t18 BM25 replay verbatim (single source of truth —
    the dd19 lesson); the dense list is v2's cosine replay for the one
    query vector, re-ranked by the ROUND-6 similarity with id
    tie-break (exactly what the Spark side does, making the deep-list
    ranking ulp-robust); fusion sums per-list micro-rounded
    ``1e6 / (k0 + rank)`` contributions as BIGINTs.
    """
    from tw_etl_spark.queries.text import _BM25_TERMS, _bm25_oracle

    lex_sql = _bm25_oracle(_BM25_TERMS, k=k_lex)
    return f"""
    WITH lex AS (
      SELECT doc_id AS id, rank FROM ({lex_sql})
    ),
    v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    q AS (SELECT * FROM v WHERE vec_id = 0),
    sims AS (
      SELECT c.vec_id AS nid,
             round(list_dot_product(q.e, c.e)
                   / (sqrt(list_dot_product(q.e, q.e))
                      * sqrt(list_dot_product(c.e, c.e))), 6) AS s
      FROM q JOIN v c ON c.vec_id <> q.vec_id
    ),
    dense AS (
      SELECT id, rank FROM (
        SELECT nid AS id,
               row_number() OVER (ORDER BY s DESC, nid) AS rank
        FROM sims
      ) WHERE rank <= {k_dense}
    ),
    u AS (
      SELECT id, rank FROM lex UNION ALL SELECT id, rank FROM dense
    ),
    agg AS (
      SELECT id, count(*)::BIGINT AS n_lists,
             sum(round(1e6 / ({k0}.0 + rank), 0)::BIGINT)::BIGINT
               AS rrf_micro
      FROM u GROUP BY id
    ),
    ranked AS (
      SELECT id AS doc_id,
             row_number() OVER (ORDER BY rrf_micro DESC, id) AS rank,
             n_lists, rrf_micro, rrf_micro / 1e6 AS rrf
      FROM agg
    )
    SELECT doc_id, rank, n_lists, rrf_micro, rrf
    FROM ranked WHERE rank <= {k} ORDER BY rank
    """


@register(
    "v11_hybrid_rrf",
    oracle=_hybrid_rrf_oracle(k_lex=50, k_dense=50, k0=60, k=10),
    doc="Hybrid retrieval via reciprocal-rank fusion (Cormack, Clarke & "
    "Buettcher, SIGIR 2009): the BM25 lexical top-50 (t18's retriever) "
    "fused with the embedding-cosine dense top-50 for one query vector "
    "(v2's exact tier) into a single top-10 — the standard two-tower "
    "retrieval pattern of a curation/RAG pipeline, fused on RANKS so "
    "the incomparable score scales never meet. Per-list contributions "
    "1e6/(60+rank) are micro-rounded integers before the per-id sum, "
    "and the dense list is re-ranked by ROUND-6 similarity with id "
    "tie-break, so the fused ranking is both summation-order-free and "
    "ulp-robust — fully hash-oracled. Scale shape: the retrievers "
    "bound everything — fusion itself touches sum-of-k rows (~100) "
    "regardless of corpus size; items present in only one list get "
    "RRF's native missing-list semantics (no outer join).",
    tags=("vector", "text", "retrieval", "ext"),
)
def v11(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from tw_etl_spark.operators.similarity import rrf_fuse
    from tw_etl_spark.operators.text import bm25_topk
    from tw_etl_spark.queries.text import _BM25_TERMS

    d = _t(spark, sf_dir, "documents")
    v = _t(spark, sf_dir, "embeddings")
    lex = bm25_topk(d, list(_BM25_TERMS), k=50).select("doc_id", "rank")
    q = v.filter(F.col("vec_id") == 0)
    # all candidates for the one query (cos_sim > -1.5 drops the
    # -inf-marked self row), then the ulp-robust round-6 re-rank
    cand = cosine_topk(q, v, k=1 << 20).filter(F.col("cos_sim") > -1.5)
    w = Window.orderBy(F.desc(F.round("cos_sim", 6)), F.col("neighbor_id"))
    dense = (
        cand.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 50)
        .select(F.col("neighbor_id").alias("doc_id"), "rank")
    )
    return rrf_fuse([lex, dense], id_col="doc_id", k0=60, k=10).orderBy("rank")


def _retrieval_eval_oracle(n_queries: int, k: int) -> str:
    """DuckDB replay of v12: v2's cosine CTE (proven arithmetic) ->
    round-6 re-rank -> label relevance -> integer nDCG/recall via the
    SAME weight table the Spark plan embeds (one builder, two
    engines)."""
    from tw_etl_spark.operators.similarity import ndcg_weights

    w_micro, cum = ndcg_weights(k)
    w_values = ", ".join(f"({r}, {w})" for r, w in enumerate(w_micro, start=1))
    cum_values = ", ".join(f"({j}, {c})" for j, c in enumerate(cum))
    return f"""
    WITH v AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings
    ),
    q AS (SELECT * FROM v WHERE vec_id < {n_queries}),
    sims AS (
      SELECT q.vec_id AS qid, q.label AS qlabel,
             c.vec_id AS nid, c.label AS nlabel,
             round(list_dot_product(q.e, c.e)
                   / (sqrt(list_dot_product(q.e, q.e))
                      * sqrt(list_dot_product(c.e, c.e))), 6) AS s
      FROM q JOIN v c ON c.vec_id <> q.vec_id
    ),
    ranked AS (
      SELECT qid, (nlabel = qlabel)::BIGINT AS rel,
             row_number() OVER (PARTITION BY qid ORDER BY s DESC, nid)
               AS rank
      FROM sims
    ),
    w(rank, wm) AS (VALUES {w_values}),
    cum(j, c) AS (VALUES {cum_values}),
    perq AS (
      SELECT qid, sum(rel)::BIGINT AS n_rel_at_k,
             sum(rel * wm)::BIGINT AS dcg_micro
      FROM ranked JOIN w USING (rank)
      WHERE rank <= {k}
      GROUP BY qid
    ),
    totals AS (
      SELECT q.vec_id AS qid, (lc.cnt - 1)::BIGINT AS n_rel
      FROM q JOIN (SELECT label, count(*) AS cnt FROM v GROUP BY label) lc
        ON q.label = lc.label
    )
    SELECT t.qid AS query_id, t.n_rel,
           coalesce(p.n_rel_at_k, 0)::BIGINT AS n_rel_at_k,
           coalesce(p.dcg_micro, 0)::BIGINT AS dcg_micro,
           cum.c::BIGINT AS idcg_micro,
           CASE WHEN cum.c > 0 THEN coalesce(p.dcg_micro, 0) / cum.c
                ELSE 0.0 END AS ndcg,
           CASE WHEN t.n_rel > 0 THEN coalesce(p.n_rel_at_k, 0) / t.n_rel
                ELSE 0.0 END AS recall_at_k
    FROM totals t
    LEFT JOIN perq p USING (qid)
    JOIN cum ON cum.j = least(t.n_rel, {k})
    ORDER BY query_id
    """


@register(
    "v12_retrieval_eval",
    oracle=_retrieval_eval_oracle(n_queries=20, k=10),
    doc="Retrieval evaluation — per-query nDCG@10 and recall@10 "
    "(Järvelin & Kekäläinen 2002) of the exact dense retriever "
    "against label ground truth: the evaluation half of the "
    "retrieval family (v1-v7/t18/v11 are retrievers; this is the "
    "harness that scores any of them). Rank discounts 1/log2(r+1) "
    "ride as integer MICRO-unit plan literals from ONE builder "
    "shared with the oracle's VALUES tables, so dcg/idcg are pure "
    "BIGINT sums — cross-engine hash-exact; the only doubles are "
    "the two final single divisions. The candidate ranking reuses "
    "v11's ulp-robust round-6 re-rank. Scale shape: metric cost is "
    "k rows per query plus a broadcast totals join — independent of "
    "corpus size; the retriever under test bounds everything.",
    tags=("vector", "retrieval", "eval", "ext"),
)
def v12(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from tw_etl_spark.operators.similarity import retrieval_eval

    v = _t(spark, sf_dir, "embeddings")
    q = v.filter(F.col("vec_id") < 20)
    labels = v.select(F.col("vec_id").alias("neighbor_id"), F.col("label").alias("nlabel"))
    qlabels = q.select(F.col("vec_id").alias("query_id"), F.col("label").alias("qlabel"))

    cand = cosine_topk(q, v, k=1 << 20).filter(F.col("cos_sim") > -1.5)
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("cos_sim", 6)), F.col("neighbor_id")
    )
    retrieved = (
        cand.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 10)
        .join(F.broadcast(labels), "neighbor_id")
        .join(F.broadcast(qlabels), "query_id")
        .select(
            "query_id",
            "rank",
            (F.col("nlabel") == F.col("qlabel")).cast("long").alias("rel"),
        )
    )
    label_counts = v.groupBy("label").agg(F.count(F.lit(1)).alias("cnt"))
    totals = (
        q.select(F.col("vec_id").alias("query_id"), "label")
        .join(F.broadcast(label_counts), "label")
        .select("query_id", (F.col("cnt") - 1).cast("long").alias("n_rel"))
    )
    return retrieval_eval(retrieved, totals, k=10).orderBy("query_id")


def _mmr_oracle(
    n_queries: int = 5, n_cand: int = 20, k: int = 8,
    lam: tuple[int, int] = (7, 10),
) -> str:
    """DuckDB replay of v14: the greedy MMR trajectory unrolled as k
    CTE blocks (select argmax -> recompute penalties -> select next),
    all in INTEGER micro units with ascending-id tie-breaks — the same
    no-recursion unrolling discipline as x3p's fold replay. Relevance
    and pair similarities use the proven v11/v12 cosine bridge
    (list_dot_product / norm product, micro-rounded). Every CTE is
    MATERIALIZED: each unrolled step references its predecessor twice
    (NOT EXISTS + penalty join), so DuckDB's default CTE inlining
    re-evaluates the whole cosine chain 2^k times (471 s at sf0.001);
    materialization makes the replay linear (0.1 s), rows identical."""
    p_num, q_den = lam
    pen_w = q_den - p_num
    steps = []
    prev = "sel1"
    for t in range(2, k + 1):
        steps.append(f"""
    r{t} AS MATERIALIZED (
      SELECT c.* FROM cand c
      WHERE NOT EXISTS (
        SELECT 1 FROM {prev} s WHERE s.qid = c.qid AND s.nid = c.nid
      )
    ),
    p{t} AS MATERIALIZED (
      SELECT r.qid, r.nid, r.rel_micro, max(cs.sim_micro) AS pen
      FROM r{t} r
      JOIN {prev} s ON s.qid = r.qid
      JOIN cs ON cs.qid = r.qid AND cs.ia = r.nid AND cs.ib = s.nid
      GROUP BY 1, 2, 3
    ),
    s{t} AS MATERIALIZED (
      SELECT qid, nid, rel_micro, pen,
             ({p_num} * rel_micro - {pen_w} * pen)::BIGINT AS score
      FROM (
        SELECT qid, nid, rel_micro, pen,
               row_number() OVER (
                 PARTITION BY qid
                 ORDER BY ({p_num} * rel_micro - {pen_w} * pen) DESC, nid
               ) AS rn
        FROM p{t}
      ) WHERE rn = 1
    ),
    sel{t} AS MATERIALIZED (
      SELECT * FROM {prev}
      UNION ALL
      SELECT qid, nid, {t}::BIGINT AS pick, rel_micro, pen, score FROM s{t}
    )""")
        prev = f"sel{t}"
    steps_sql = ",".join(steps)
    return f"""
    WITH v AS MATERIALIZED (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ),
    q AS MATERIALIZED (SELECT * FROM v WHERE vec_id < {n_queries}),
    simsq AS MATERIALIZED (
      SELECT q.vec_id AS qid, c.vec_id AS nid,
             round((list_dot_product(q.e, c.e)
                    / (sqrt(list_dot_product(q.e, q.e))
                       * sqrt(list_dot_product(c.e, c.e)))) * 1e6,
                   0)::BIGINT AS rel_micro
      FROM q JOIN v c ON c.vec_id <> q.vec_id
    ),
    cand AS MATERIALIZED (
      SELECT qid, nid, rel_micro FROM (
        SELECT qid, nid, rel_micro,
               row_number() OVER (
                 PARTITION BY qid ORDER BY rel_micro DESC, nid
               ) AS rn
        FROM simsq
      ) WHERE rn <= {n_cand}
    ),
    cs AS MATERIALIZED (
      SELECT a.qid, a.nid AS ia, b.nid AS ib,
             round((list_dot_product(va.e, vb.e)
                    / (sqrt(list_dot_product(va.e, va.e))
                       * sqrt(list_dot_product(vb.e, vb.e)))) * 1e6,
                   0)::BIGINT AS sim_micro
      FROM cand a
      JOIN cand b ON a.qid = b.qid AND a.nid <> b.nid
      JOIN v va ON va.vec_id = a.nid
      JOIN v vb ON vb.vec_id = b.nid
    ),
    sel1 AS MATERIALIZED (
      SELECT qid, nid, 1::BIGINT AS pick, rel_micro, 0::BIGINT AS pen,
             ({p_num} * rel_micro)::BIGINT AS score
      FROM (
        SELECT qid, nid, rel_micro,
               row_number() OVER (
                 PARTITION BY qid ORDER BY rel_micro DESC, nid
               ) AS rn
        FROM cand
      ) WHERE rn = 1
    ),{steps_sql}
    SELECT qid AS query_id, pick, nid AS doc_id, rel_micro,
           pen AS penalty_micro, score AS mmr_score
    FROM {prev} ORDER BY query_id, pick
    """


@register(
    "v14_mmr_diversified_topk",
    oracle=_mmr_oracle(n_queries=5, n_cand=20, k=8, lam=(7, 10)),
    doc="Maximal Marginal Relevance diversified top-k (Carbonell & "
    "Goldstein, SIGIR 1998): greedy re-ranking of each query's dense "
    "top-20 into 8 picks maximizing 0.7*rel - 0.3*max-sim-to-selected "
    "— the redundancy control a retrieval pipeline runs after any "
    "retriever so a near-dup-heavy corpus doesn't return k copies of "
    "one page. The whole greedy trajectory is INTEGER-exact: micro "
    "relevance/pair-similarity inputs (the proven v11/v12 cosine "
    "bridge), rational lambda as 7*rel - 3*pen, ascending-id "
    "tie-breaks — so every pick, penalty, and score hash-matches the "
    "oracle's unrolled 8-step relational replay. Scale shape: "
    "candidates are retriever outputs (20 rows/query), so selection "
    "is a cogrouped applyInPandas over n + n^2 bounded rows per "
    "query — cost independent of corpus size; the one corpus-sized "
    "stage is the dense candidate pass itself.",
    tags=("vector", "retrieval", "mmr", "ext"),
)
def v14(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from tw_etl_spark.functions.vectors import cosine_similarity_expr
    from tw_etl_spark.operators.similarity import mmr_diversify_topk

    n_queries, n_cand = 5, 20
    v = _t(spark, sf_dir, "embeddings")
    q = v.filter(F.col("vec_id") < n_queries)
    a = q.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe"))
    b = v.select(F.col("vec_id").alias("doc_id"), F.col("embedding").alias("ce"))
    rel = F.round(
        cosine_similarity_expr(F.col("qe"), F.col("ce")) * 1e6, 0
    ).cast("long")
    simsq = (
        a.join(b, F.col("query_id") != F.col("doc_id"))
        .select("query_id", "doc_id", rel.alias("rel_micro"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("rel_micro"), "doc_id")
    cand = (
        simsq.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n_cand)
        .drop("rn")
    )
    ca = cand.select("query_id", F.col("doc_id").alias("ia")).alias("ca")
    cb = cand.select("query_id", F.col("doc_id").alias("ib")).alias("cb")
    ea = v.select(F.col("vec_id").alias("ia"), F.col("embedding").alias("ea"))
    eb = v.select(F.col("vec_id").alias("ib"), F.col("embedding").alias("eb"))
    ps = F.round(
        cosine_similarity_expr(F.col("ea"), F.col("eb")) * 1e6, 0
    ).cast("long")
    sims = (
        ca.join(
            cb,
            (F.col("ca.query_id") == F.col("cb.query_id"))
            & (F.col("ca.ia") != F.col("cb.ib")),
        )
        .select(F.col("ca.query_id").alias("query_id"), "ia", "ib")
        .join(F.broadcast(ea), "ia")
        .join(F.broadcast(eb), "ib")
        .select("query_id", "ia", "ib", ps.alias("sim_micro"))
    )
    return mmr_diversify_topk(cand, sims, k=8, lam=(7, 10)).orderBy(
        "query_id", "pick"
    )


def _retrieval_tiers_oracle(k: int = 10, k0: int = 60) -> str:
    """DuckDB replay of v13: the t19 BM25-multiquery replay verbatim as
    the lexical lists (single source of truth — the dd19 lesson), v2's
    cosine CTE re-ranked round-6 as the dense lists, their per-query
    RRF fusion as the hybrid lists, then ONE shared eval block applied
    to all three tiers (labels LEFT-joined so unlabeled docs — sf0.1
    has 5000 documents vs 2000 embeddings — count as non-relevant on
    both engines)."""
    from tw_etl_spark.operators.similarity import ndcg_weights
    from tw_etl_spark.queries.text import _T19_QUERIES, _bm25_multi_oracle

    qids = sorted(_T19_QUERIES)
    lex_sql = _bm25_multi_oracle(_T19_QUERIES, k=k)
    w_micro, cum = ndcg_weights(k)
    w_values = ", ".join(f"({r}, {w})" for r, w in enumerate(w_micro, start=1))
    cum_values = ", ".join(f"({j}, {c})" for j, c in enumerate(cum))

    def eval_cte(name: str, lists: str) -> str:
        return f"""{name} AS (
      SELECT t.query_id, t.n_rel,
             coalesce(p.n_rel_at_k, 0)::BIGINT AS n_rel_at_k,
             coalesce(p.dcg_micro, 0)::BIGINT AS dcg_micro,
             cum.c::BIGINT AS idcg_micro,
             CASE WHEN cum.c > 0 THEN coalesce(p.dcg_micro, 0) / cum.c
                  ELSE 0.0 END AS ndcg,
             CASE WHEN t.n_rel > 0 THEN coalesce(p.n_rel_at_k, 0) / t.n_rel
                  ELSE 0.0 END AS recall_at_k
      FROM totals t
      LEFT JOIN (
        SELECT r.query_id,
               sum(r.rel)::BIGINT AS n_rel_at_k,
               sum(r.rel * w.wm)::BIGINT AS dcg_micro
        FROM (
          SELECT l.query_id, l.rank,
                 coalesce(((lb.label = ql.qlabel)
                           AND (l.id <> l.query_id))::BIGINT, 0) AS rel
          FROM {lists} l
          LEFT JOIN labels lb USING (id)
          JOIN qlabels ql USING (query_id)
        ) r JOIN w ON w.rank = r.rank
        WHERE r.rank <= {k}
        GROUP BY r.query_id
      ) p USING (query_id)
      JOIN cum ON cum.j = least(t.n_rel, {k})
    )"""

    return f"""
    WITH lex AS (
      SELECT query_id, doc_id AS id, rank FROM ({lex_sql})
    ),
    v AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings
    ),
    q AS (SELECT * FROM v WHERE vec_id IN ({', '.join(map(str, qids))})),
    sims AS (
      SELECT q.vec_id AS qid, c.vec_id AS nid,
             round(list_dot_product(q.e, c.e)
                   / (sqrt(list_dot_product(q.e, q.e))
                      * sqrt(list_dot_product(c.e, c.e))), 6) AS s
      FROM q JOIN v c ON c.vec_id <> q.vec_id
    ),
    dense AS (
      SELECT qid AS query_id, nid AS id, rank FROM (
        SELECT qid, nid,
               row_number() OVER (PARTITION BY qid ORDER BY s DESC, nid)
                 AS rank
        FROM sims
      ) WHERE rank <= {k}
    ),
    fused AS (
      SELECT query_id, id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY rrf_micro DESC, id) AS rank
      FROM (
        SELECT query_id, id,
               sum(round(1e6 / ({k0}.0 + rank), 0)::BIGINT)::BIGINT
                 AS rrf_micro
        FROM (SELECT * FROM lex UNION ALL SELECT * FROM dense) u
        GROUP BY query_id, id
      ) agg
    ),
    hyb AS (SELECT query_id, id, rank FROM fused WHERE rank <= {k}),
    labels AS (SELECT vec_id AS id, label FROM v),
    qlabels AS (SELECT vec_id AS query_id, label AS qlabel FROM q),
    w(rank, wm) AS (VALUES {w_values}),
    cum(j, c) AS (VALUES {cum_values}),
    totals AS (
      SELECT q.vec_id AS query_id, (lc.cnt - 1)::BIGINT AS n_rel
      FROM q JOIN (SELECT label, count(*) AS cnt FROM v GROUP BY label) lc
        ON q.label = lc.label
    ),
    {eval_cte('eval_dense', 'dense')},
    {eval_cte('eval_lex', 'lex')},
    {eval_cte('eval_hyb', 'hyb')}
    SELECT * FROM (
      SELECT 'dense' AS tier, * FROM eval_dense
      UNION ALL SELECT 'lexical' AS tier, * FROM eval_lex
      UNION ALL SELECT 'hybrid' AS tier, * FROM eval_hyb
    ) ORDER BY tier, query_id
    """


@register(
    "v13_retrieval_tiers_eval",
    oracle=_retrieval_tiers_oracle(k=10, k0=60),
    doc="The end-to-end retrieval harness (VERDICT r13 #7): ONE labeled "
    "eval scoring all three retriever tiers — dense (exact cosine, "
    "round-6 re-rank), lexical (t19's batch BM25 over the same query "
    "ids' term sets), and hybrid (their per-query RRF fusion) — so a "
    "regression in ANY retriever moves a measured nDCG@10/recall@10 "
    "number, not just a hash. Relevance = embedding-label match "
    "(self excluded); documents without an embedding row (sf0.1: 5000 "
    "docs vs 2000 vectors) LEFT-join to rel=0 identically on both "
    "engines. All metric arithmetic is the shared integer micro-unit "
    "weight table (one builder, two engines). Scale shape: retriever "
    "outputs bound everything downstream — fusion and eval touch "
    "k rows per query per tier, corpus-independent; the retrievers "
    "themselves are the proven t19/v2 plans.",
    tags=("vector", "text", "retrieval", "eval", "ext"),
)
def v13(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from tw_etl_spark.operators.similarity import retrieval_eval, rrf_fuse
    from tw_etl_spark.operators.text import bm25_topk_multiquery
    from tw_etl_spark.queries.text import _T19_QUERIES

    k = 10
    qids = sorted(_T19_QUERIES)
    d = _t(spark, sf_dir, "documents")
    v = _t(spark, sf_dir, "embeddings")
    q = v.filter(F.col("vec_id").isin(qids))

    # lexical: t19's batch retriever, same query ids
    lex = bm25_topk_multiquery(d, _T19_QUERIES, k=k).select(
        "query_id", "doc_id", "rank"
    )
    # dense: exact cosine, ulp-robust round-6 re-rank (the v12 pattern)
    cand = cosine_topk(q, v, k=1 << 20).filter(F.col("cos_sim") > -1.5)
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("cos_sim", 6)), F.col("neighbor_id")
    )
    dense = (
        cand.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("neighbor_id").alias("doc_id"), "rank")
    )
    # hybrid: per-query reciprocal-rank fusion of the two lists
    hyb = rrf_fuse(
        [lex, dense], id_col="doc_id", k0=60, k=k, query_col="query_id"
    ).select("query_id", "doc_id", "rank")

    labels = v.select(F.col("vec_id").alias("doc_id"), F.col("label").alias("nlabel"))
    qlabels = q.select(F.col("vec_id").alias("query_id"), F.col("label").alias("qlabel"))
    label_counts = v.groupBy("label").agg(F.count(F.lit(1)).alias("cnt"))
    totals = (
        q.select(F.col("vec_id").alias("query_id"), "label")
        .join(F.broadcast(label_counts), "label")
        .select("query_id", (F.col("cnt") - 1).cast("long").alias("n_rel"))
    )

    def with_rel(lists: DataFrame) -> DataFrame:
        # unlabeled docs (no embedding row) are non-relevant, self never
        # counts — identical LEFT-join semantics to the oracle
        return (
            lists.join(F.broadcast(labels), "doc_id", "left")
            .join(F.broadcast(qlabels), "query_id")
            .select(
                "query_id",
                "rank",
                F.coalesce(
                    (
                        (F.col("nlabel") == F.col("qlabel"))
                        & (F.col("doc_id") != F.col("query_id"))
                    ).cast("long"),
                    F.lit(0).cast("long"),
                ).alias("rel"),
            )
        )

    parts = [
        retrieval_eval(with_rel(lists), totals, k=k).select(
            F.lit(tier).alias("tier"), "*"
        )
        for tier, lists in (("dense", dense), ("lexical", lex), ("hybrid", hyb))
    ]
    out = parts[0]
    for p_ in parts[1:]:
        out = out.unionByName(p_)
    return out.orderBy("tier", "query_id")
