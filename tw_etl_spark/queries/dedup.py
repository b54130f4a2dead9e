"""Deduplication queries [EXT]: exact, n-gram Jaccard, MinHash-LSH,
SimHash, embedding-cosine near-dup (SURVEY.md §2.2).

dd2/dd5 are oracle-verified exactly; dd3/dd4 are engine-specific
xxhash64/crc32 signatures (the 100 TB scale tier — no SQL twin; the
driver records rows-only and tests/test_dedup.py proves recall against
the exact-Jaccard ground truth). dd3p/dd4p are their PORTABLE md5-family
twins: identical banding/vote logic with every value reconstructible in
DuckDB SQL, putting the MinHash-LSH and SimHash pipelines themselves
under the cross-engine hash oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tw_etl_spark.catalog import read_table as _t
from tw_etl_spark.operators.dedup import (
    connected_components,
    dedup_by_components,
    exact_dedup,
    exact_jaccard_components,
    exact_jaccard_pairs,
    minhash_lsh_pairs,
    minhash_lsh_pairs_portable,
    simhash_expr,
    simhash_portable_expr,
)
from tw_etl_spark.operators.similarity import cosine_threshold_pairs
from tw_etl_spark.functions.rounding import sql_round_ratio
from tw_etl_spark.queries import register
from tw_etl_spark.testing.dedupgen import delta_span_sql, minhash_sql

_TOKS = "list_filter(string_split(text, ' '), t -> t <> '')"


def _delta_scratch(spark: SparkSession, sf_dir: str, name: str) -> str:
    """Scratch dir for a delta query's persisted index artifact.

    Keyed by (sf_dir, Spark applicationId) so two concurrent runs over
    the same sf_dir can never race on one path (ADVICE r11: the old
    md5(sf_dir)-only key let one run overwrite the parquet dir while
    another was reading it). The applicationId component also scopes
    the dir's lifetime to the session — the session's own temp sweep /
    OS tempdir policy reclaims it, and a rerun in the same session
    reuses (mode=overwrite) rather than leaks.
    """
    import hashlib
    import os
    import tempfile

    tag = hashlib.md5(
        (os.path.abspath(sf_dir) + "|" + spark.sparkContext.applicationId)
        .encode()
    ).hexdigest()[:12]
    return os.path.join(tempfile.gettempdir(), f"tw_etl_spark_{name}_{tag}")


@register(
    "dd1_exact_dedup_keep_first",
    oracle="""
    WITH keep AS (
        SELECT md5(text) AS h, min(doc_id) AS doc_id
        FROM documents GROUP BY md5(text)
    )
    SELECT d.doc_id, d.lang, d.n_chars
    FROM documents d JOIN keep k ON d.doc_id = k.doc_id
    ORDER BY d.doc_id
    """,
    doc="Exact dedup, keep-first-id survivor set (hash-only shuffle).",
    tags=("dedup", "ext"),
)
def dd1(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return (
        exact_dedup(d, content_col="text", id_col="doc_id")
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    )


def _jaccard_tiers_cte(t: float = 0.95) -> str:
    """The WITH-body fragment computing ``jpairs(id_a, id_b, jaccard)``
    — exact token-set Jaccard >= t pairs via the scale-safe three-tier
    decomposition (see :func:`_jaccard_pairs_full_oracle` for the tier
    proof). Shared by dd2 (full listing) and dd6/dd7 (components over
    the same pairs), replacing the naive shared-token self-join that
    was quadratic in documents-per-token (~38 B intermediate rows at
    sf1) in ALL THREE oracles."""
    jr_b = sql_round_ratio("c.i", "c.u", 6)
    jr_c = sql_round_ratio("v.sh", "(v.na + v.nb - v.sh)", 6)
    return f"""
    tok AS (
        SELECT doc_id, list_sort(list_distinct({_TOKS})) AS st FROM documents
    ),
    b2 AS (SELECT doc_id AS doc, st, len(st) AS n FROM tok),
    setkey AS (
        SELECT doc, n, md5(array_to_string(st, chr(1))) AS sk FROM b2
    ),
    grp AS (SELECT sk, min(doc) AS rep FROM setkey GROUP BY sk),
    pairs_a AS (
        SELECT a.doc AS id_a, b.doc AS id_b, 1.0 AS jaccard
        FROM setkey a JOIN setkey b ON a.sk = b.sk AND a.doc < b.doc
        WHERE a.n > 0
    ),
    rsets AS (
        SELECT g.rep AS doc, b.st, b.n FROM grp g JOIN b2 b ON b.doc = g.rep
    ),
    delk AS (
        SELECT doc, n,
               md5(array_to_string(
                   list_concat(st[1:j - 1], st[j + 1:len(st)]), chr(1)
               )) AS k
        FROM (SELECT doc, n, st, unnest(generate_series(1, n)) AS j FROM rsets)
    ),
    contain AS (
        SELECT f.doc AS rs, d.doc AS rl, f.n AS i, d.n AS u
        FROM (
            SELECT s.doc, s.n, s.sk AS k
            FROM setkey s JOIN grp g ON g.rep = s.doc
        ) f
        JOIN delk d ON f.k = d.k
    ),
    pairs_b AS (
        SELECT least(x.doc, y.doc) AS id_a, greatest(x.doc, y.doc) AS id_b,
               {jr_b} AS jaccard
        FROM contain c
        JOIN setkey xr ON xr.doc = c.rs
        JOIN setkey x ON x.sk = xr.sk
        JOIN setkey yr ON yr.doc = c.rl
        JOIN setkey y ON y.sk = yr.sk
        WHERE {jr_b} >= {t}
    ),
    rex AS (
        SELECT b.doc, unnest(b.st) AS tk FROM rsets b WHERE b.n >= 38
    ),
    df_rank AS (SELECT tk, count(*) AS df FROM rex GROUP BY tk),
    ranked AS (
        SELECT e.doc, e.tk,
               row_number() OVER (
                   PARTITION BY e.doc ORDER BY d.df, e.tk
               ) AS rn
        FROM rex e JOIN df_rank d USING (tk)
    ),
    pre AS (
        SELECT r.doc, r.tk
        FROM ranked r JOIN rsets s ON s.doc = r.doc
        WHERE r.rn <= s.n - ceil({t} * s.n) + 1
    ),
    cand AS (
        SELECT c.id_a, c.id_b
        FROM (
            SELECT a.doc AS id_a, b.doc AS id_b
            FROM pre a JOIN pre b ON a.tk = b.tk AND a.doc < b.doc
            GROUP BY 1, 2
        ) c
        JOIN rsets sa ON sa.doc = c.id_a
        JOIN rsets sb ON sb.doc = c.id_b
        WHERE least(sa.n, sb.n) >= ceil({t} * greatest(sa.n, sb.n))
    ),
    ver AS (
        SELECT c.id_a AS rs, c.id_b AS rl,
               sa.n AS na, sb.n AS nb, count(*) AS sh
        FROM cand c
        JOIN rex a ON a.doc = c.id_a
        JOIN rex b ON b.doc = c.id_b AND b.tk = a.tk
        JOIN rsets sa ON sa.doc = c.id_a
        JOIN rsets sb ON sb.doc = c.id_b
        GROUP BY 1, 2, 3, 4
    ),
    pairs_c AS (
        SELECT least(x.doc, y.doc) AS id_a, greatest(x.doc, y.doc) AS id_b,
               {jr_c} AS jaccard
        FROM (
            SELECT * FROM ver v
            WHERE (v.na + v.nb - 2 * v.sh) >= 2 AND {jr_c} >= {t}
        ) v
        JOIN setkey xr ON xr.doc = v.rs
        JOIN setkey x ON x.sk = xr.sk
        JOIN setkey yr ON yr.doc = v.rl
        JOIN setkey y ON y.sk = yr.sk
    ),
    jpairs AS MATERIALIZED (
        SELECT * FROM pairs_a
        UNION ALL SELECT * FROM pairs_b
        UNION ALL SELECT * FROM pairs_c
    )"""


def _jaccard_pairs_full_oracle(t: float = 0.95) -> str:
    """Scale-safe DuckDB replay of dd2 (round 14): the r13 oracle was a
    naive shared-token self-join — quadratic in documents-per-token,
    ~38 BILLION intermediate rows on the sf1 fixture (40-token
    vocabulary, every token hot) — which made dd2 the one family
    UNCHECKABLE at sf1. This is x1's exact three-tier decomposition
    (VERDICT r11 #3) lifted from component-equivalent star edges to the
    FULL pair listing dd2's contract requires. J = i/u >= t with
    round-6 slack forces exactly one of:

    (A) u-i = 0 — identical token sets: group by canonical set key,
        expand every within-group pair, J = 1.0;
    (B) u-i = 1 — one set is the other minus one element: join full
        keys against 1-DELETION keys over one representative per
        distinct set (J is a pure function of the two sets), J = i/u
        via the exact integer HALF_UP form, expand both groups;
    (C) u-i >= 2 — then i >= 38, so BOTH sets hold >= 38 distinct
        tokens: PPJoin prefix-filtered candidates (lossless under any
        global token order) + length gate + exact shared-count verify,
        over the n >= 38 representatives only, EXCLUDING u-i <= 1
        (tiers A/B own those pairs).

    Identical output to the naive join for arbitrary corpora (tier
    union is exhaustive and disjoint), verified row-for-row against
    the r13 oracle at sf0.001/0.01/0.1 in DuckDB and hash-green vs
    Spark at all four scales including sf1."""
    return f"""
    WITH {_jaccard_tiers_cte(t)}
    SELECT id_a, id_b, jaccard FROM jpairs ORDER BY id_a, id_b
    """


@register(
    "dd2_jaccard_neardup_pairs",
    oracle=_jaccard_pairs_full_oracle(0.95),
    doc="Exact token-set Jaccard near-dup pairs (>=0.95). The exact "
    "baseline the MinHash path is validated against. The oracle is "
    "the x1 three-tier decomposition lifted to full pairs (round 14) "
    "so the family is checkable at sf1.",
    tags=("dedup", "jaccard", "ext"),
)
def dd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return exact_jaccard_pairs(d, threshold=0.95).orderBy("id_a", "id_b")


@register(
    "dd3_minhash_lsh_pairs",
    oracle=None,  # xxhash64 signatures have no DuckDB twin; recall unit-tested
    doc="MinHash-LSH near-dup candidates (64 hashes, 16 bands, est-J ≥ 0.9). "
    "Linear shuffle (k longs/doc); recall vs exact Jaccard in tests/test_dedup.py.",
    tags=("dedup", "minhash", "ext"),
)
def dd3(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return minhash_lsh_pairs(d, threshold=0.9).orderBy("id_a", "id_b")


@register(
    "dd4_simhash",
    oracle=None,  # crc32-based signature, Spark-side only
    doc="32-bit SimHash per document (per-bit majority vote). Identical "
    "token sets ⇒ identical simhash (asserted in tests).",
    tags=("dedup", "simhash", "ext"),
)
def dd4(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return (
        d.select("doc_id", simhash_expr(F.col("text")).alias("simhash"))
        .orderBy("doc_id")
    )


@register(
    "dd3p_minhash_lsh_portable",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, list_distinct({_TOKS}) AS toks FROM documents
    ),
    ex AS (SELECT doc_id AS doc, unnest(toks) AS tk FROM tok),
    sig AS (
        SELECT doc, r.range AS i, min(md5(r.range::VARCHAR || ':' || tk)) AS h
        FROM ex CROSS JOIN range(16) r
        GROUP BY doc, r.range
    ),
    sigarr AS (SELECT doc, list(h ORDER BY i) AS sig FROM sig GROUP BY doc),
    banded AS (
        SELECT doc, g.range AS band,
               md5(array_to_string(
                   list_slice(sig, g.range * 4 + 1, g.range * 4 + 4), ',')) AS bucket
        FROM sigarr CROSS JOIN range(4) g
    ),
    cand AS (
        SELECT DISTINCT a.doc AS id_a, b.doc AS id_b
        FROM banded a
        JOIN banded b ON a.band = b.band AND a.bucket = b.bucket AND a.doc < b.doc
    )
    SELECT c.id_a, c.id_b,
           round(length(list_filter(range(16),
                                    i -> sa.sig[i + 1] = sb.sig[i + 1])) / 16.0,
                 6) AS est_jaccard
    FROM cand c
    JOIN sigarr sa ON sa.doc = c.id_a
    JOIN sigarr sb ON sb.doc = c.id_b
    WHERE length(list_filter(range(16),
                             i -> sa.sig[i + 1] = sb.sig[i + 1])) / 16.0 >= 0.9
    ORDER BY id_a, id_b
    """,
    doc="MinHash-LSH over the PORTABLE md5 seed-hash family (16 hashes, "
    "4 bands of 4, est-J >= 0.9): signature mins, band buckets, "
    "candidate pairs, and the agreement estimate are all reconstructed "
    "verbatim by the DuckDB oracle, so the entire LSH pipeline — not "
    "just its recall — sits under the cross-engine hash oracle. The "
    "xxhash64 family (dd3) remains the scale tier; same plan shape.",
    tags=("dedup", "minhash", "ext"),
)
def dd3p(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return minhash_lsh_pairs_portable(
        d, num_hashes=16, bands=4, threshold=0.9
    ).orderBy("id_a", "id_b")


@register(
    "dd4p_simhash_portable",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, list_distinct({_TOKS}) AS toks FROM documents
    ),
    ex AS (SELECT doc_id AS doc, unnest(toks) AS tk FROM tok),
    hashes AS (
        SELECT doc, ('0x' || substr(md5(tk), 1, 8))::BIGINT AS h FROM ex
    ),
    votes AS (
        SELECT doc, g.range AS b,
               sum(CASE WHEN (h >> g.range) & 1 = 1 THEN 1 ELSE -1 END) AS v
        FROM hashes CROSS JOIN range(32) g
        GROUP BY doc, g.range
    ),
    sh AS (
        SELECT doc, sum(CASE WHEN v > 0 THEN 1::BIGINT << b ELSE 0 END) AS simhash
        FROM votes GROUP BY doc
    )
    SELECT d.doc_id, coalesce(sh.simhash, 0)::BIGINT AS simhash
    FROM documents d LEFT JOIN sh ON sh.doc = d.doc_id
    ORDER BY d.doc_id
    """,
    doc="32-bit SimHash over the PORTABLE hash family (first 8 md5 hex "
    "chars as uint32): the oracle reconstructs every per-bit majority "
    "vote, pinning the signature VALUES cross-engine (dd4's crc32 "
    "variant pins only invariants). Token-less docs carry simhash 0 "
    "on both sides.",
    tags=("dedup", "simhash", "ext"),
)
def dd4p(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id", simhash_portable_expr(F.col("text")).alias("simhash")
        ).orderBy("doc_id")
    )


@register(
    "dd5_embedding_neardup_pairs",
    oracle="""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(
               list_dot_product(a.e, b.e)
               / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))),
           6) AS cos_sim
    FROM v a JOIN v b ON a.vec_id < b.vec_id
    WHERE round(
              list_dot_product(a.e, b.e)
              / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))),
          6) >= 0.45
    ORDER BY id_a, id_b
    """,
    doc="Embedding-cosine near-dup pairs (rounded cosine ≥ 0.45) via the "
    "broadcast-matmul threshold scan.",
    tags=("dedup", "vector", "ext"),
)
def dd5(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = _t(spark, sf_dir, "embeddings")
    return cosine_threshold_pairs(v, threshold=0.45).orderBy("id_a", "id_b")


# Shared DuckDB fragment: exact-Jaccard near-dup pairs at >= 0.95
# (identical to dd2's result) as a CTE prelude.
_PAIRS_CTE = f"""
    {_jaccard_tiers_cte(0.95)},
    pairs AS (SELECT id_a, id_b FROM jpairs),
    und AS MATERIALIZED (
        SELECT id_a AS a, id_b AS b FROM pairs
        UNION SELECT id_b, id_a FROM pairs
    )
"""


def _comp_cte(rounds: int = 10) -> str:
    """Connected components as a single non-recursive CTE chain: fixed
    ``rounds`` of min-label propagation (one edge join) + pointer
    jumping (label-of-label), hash-to-min style.

    The previous oracle was a recursive transitive-closure CTE —
    quadratic in component size, and measurably unable to finish on
    sf0.1's dup-heavy fixture (near-clique components of hundreds of
    docs). This form is linear in |edges| per round, and the combined
    propagate+jump step spreads the component minimum multiplicatively,
    so 10 rounds converge for any component of diameter well past 2^10.
    Non-convergence cannot go unnoticed: the Spark side iterates to a
    measured fixpoint, so an unconverged oracle hash-mismatches.

    Every CTE here is MATERIALIZED: DuckDB inlines plain CTEs per
    reference, which re-evaluates the whole upstream chain (and
    re-opens the parquet) once per round — 10 rounds of that exhausts
    file handles before it exhausts time."""
    parts = [
        "nodes AS MATERIALIZED (SELECT DISTINCT a AS id FROM und)",
        "lbl0 AS MATERIALIZED (SELECT id, id AS lbl FROM nodes)",
    ]
    for i in range(1, rounds + 1):
        prev = f"lbl{i - 1}"
        parts.append(
            f"""p{i} AS MATERIALIZED (
        SELECT n.id, least(n.lbl, coalesce(min(m.lbl), n.lbl)) AS lbl
        FROM {prev} n
        LEFT JOIN und e ON e.a = n.id
        LEFT JOIN {prev} m ON m.id = e.b
        GROUP BY n.id, n.lbl
    )"""
        )
        parts.append(
            f"""lbl{i} AS MATERIALIZED (
        SELECT r.id, least(r.lbl, j.lbl) AS lbl
        FROM p{i} r JOIN p{i} j ON j.id = r.lbl
    )"""
        )
    parts.append(f"comp AS (SELECT id, lbl AS component FROM lbl{rounds})")
    return ",\n    ".join(parts)


@register(
    "dd6_neardup_components",
    oracle=f"""
    WITH {_PAIRS_CTE},
    {_comp_cte()}
    SELECT id AS doc_id, component FROM comp ORDER BY doc_id
    """,
    doc="Union-find over exact-Jaccard near-dup pairs via iterative "
    "min-label joins (no graph library, no driver-side graph): "
    "(doc_id, component=min reachable id). Oracle = DuckDB fixed-round "
    "label propagation (linear per round; completes at sf0.1 where the "
    "old transitive-closure CTE could not).",
    tags=("dedup", "components", "ext"),
)
def dd6(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return (
        exact_jaccard_components(d, threshold=0.95)
        .select(F.col("id").alias("doc_id"), "component")
        .orderBy("doc_id")
    )


@register(
    "dd7_neardup_survivors",
    oracle=f"""
    WITH {_PAIRS_CTE},
    {_comp_cte()}
    SELECT d.doc_id, d.lang, d.n_chars
    FROM documents d
    WHERE d.doc_id NOT IN (SELECT id FROM comp WHERE id <> component)
    ORDER BY d.doc_id
    """,
    doc="Full near-dedup: keep one document (min id) per Jaccard>=0.95 "
    "component; untouched singletons pass through. The end-to-end "
    "training-data dedup pipeline (pairs -> components -> anti-join).",
    tags=("dedup", "components", "ext"),
)
def dd7(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    labels = exact_jaccard_components(d, threshold=0.95)
    return (
        dedup_by_components(d, labels=labels)
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    )


@register(
    "x2_leakage_aware_split",
    oracle=f"""
    WITH {_PAIRS_CTE},
    {_comp_cte()},
    comp_all AS (
        SELECT d.doc_id, d.lang,
               coalesce(c.component, d.doc_id) AS component
        FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
    ),
    labeled AS (
        SELECT doc_id, lang,
               CAST(concat('0x', substr(md5(CAST(component AS VARCHAR)), 1, 8)) AS BIGINT)
               % 10000 AS bucket
        FROM comp_all
    )
    SELECT CASE WHEN bucket < 8000 THEN 'train'
                WHEN bucket < 9000 THEN 'val'
                ELSE 'test' END AS split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
    FROM labeled GROUP BY 1 ORDER BY split
    """,
    doc="Deterministic leakage-aware 80/10/10 split: hash the near-dup "
    "component representative (not the row id) so every member of a "
    "Jaccard>=0.95 cluster shares a split; membership is a pure function "
    "of md5, reproducible across engines/runs/cluster sizes (no "
    "randomSplit nondeterminism).",
    tags=("pipeline", "split", "ext"),
)
def x2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tw_etl_spark.operators.sampling import component_split

    d = _t(spark, sf_dir, "documents")
    labels = exact_jaccard_components(d, threshold=0.95)
    s = component_split(
        d, None, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}, labels=labels
    )
    return (
        s.groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct("lang").cast("bigint").alias("n_langs"),
        )
        .orderBy("split")
    )


@register(
    "dd8_semantic_dedup",
    oracle=None,  # k-means step has no SQL twin; invariants in tests/test_dedup.py
    doc="SemDeDup-style semantic dedup (arXiv:2303.09540): k-means over "
    "L2-normalized embeddings (k=8, fixed seed), within-cluster cosine "
    "pairs >= 0.4, keep the min-id representative per component. "
    "Returns (n_in, n_survivors, n_removed).",
    tags=("dedup", "semantic", "ext"),
)
def dd8(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tw_etl_spark.operators.dedup import semantic_dedup

    e = _t(spark, sf_dir, "embeddings")
    surv = semantic_dedup(e, id_col="vec_id", vec_col="embedding", k=8, threshold=0.4)
    n_in = e.agg(F.count(F.lit(1)).cast("bigint").alias("n_in"))
    n_s = surv.agg(F.count(F.lit(1)).cast("bigint").alias("n_survivors"))
    return n_in.crossJoin(n_s).select(
        "n_in",
        "n_survivors",
        (F.col("n_in") - F.col("n_survivors")).alias("n_removed"),
    )


@register(
    "dd9_duplicate_spans",
    oracle="""
    WITH toks AS (
        SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tk
        FROM documents
    ), posed AS (
        -- DuckDB 1.0 generate_series can't take lateral column bounds;
        -- unnest(range(...)) can.
        SELECT doc_id, tk, len(tk) AS n_tok,
               unnest(range(1, len(tk) - 6)) AS pos
        FROM toks WHERE len(tk) >= 8
    ), grams AS (
        SELECT doc_id, pos, n_tok,
               array_to_string(list_slice(tk, pos, pos + 7), ' ') AS g
        FROM posed
    ), dup AS (
        SELECT g FROM grams GROUP BY g HAVING count(DISTINCT doc_id) > 1
    ), hits AS (
        SELECT doc_id, pos, n_tok FROM grams WHERE g IN (SELECT g FROM dup)
    ), marked AS (
        SELECT doc_id, pos, n_tok,
               CASE WHEN lag(pos) OVER w IS NULL
                         OR pos > lag(pos) OVER w + 8 THEN 1 ELSE 0 END AS brk
        FROM hits
        WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ), islands AS (
        SELECT doc_id, pos, n_tok,
               sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                              ROWS UNBOUNDED PRECEDING) AS island
        FROM marked
    ), spans AS (
        SELECT doc_id, any_value(n_tok) AS n_tok,
               max(pos) + 8 - min(pos) AS span_toks
        FROM islands GROUP BY doc_id, island
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT)        AS n_dup_spans,
           CAST(sum(span_toks) AS BIGINT)  AS dup_tokens,
           (CASE WHEN (sum(span_toks)::BIGINT) < 0 THEN -(((abs(sum(span_toks)::BIGINT)::BIGINT * 1000000) // ((any_value(n_tok))::BIGINT)) + CASE WHEN 2 * ((abs(sum(span_toks)::BIGINT)::BIGINT * 1000000) % ((any_value(n_tok))::BIGINT)) >= ((any_value(n_tok))::BIGINT) THEN 1 ELSE 0 END) ELSE (((abs(sum(span_toks)::BIGINT)::BIGINT * 1000000) // ((any_value(n_tok))::BIGINT)) + CASE WHEN 2 * ((abs(sum(span_toks)::BIGINT)::BIGINT * 1000000) % ((any_value(n_tok))::BIGINT)) >= ((any_value(n_tok))::BIGINT) THEN 1 ELSE 0 END) END / 1000000.0) AS dup_frac
    FROM spans GROUP BY doc_id ORDER BY doc_id
    """,
    doc="Cross-document duplicated-span detection (exact-substring "
    "dedup signal, Lee et al. 2022): token positions whose 8-gram "
    "recurs in another document, merged into maximal spans per doc "
    "(overlap-or-adjacency islands via lag + running sum). Output per "
    "affected doc: span count, covered tokens, covered fraction. "
    "Fully relational both sides; the Spark shuffle key is the 8-byte "
    "xxhash64 of the gram, hash-gated against the fixture by this "
    "oracle (the t14 pattern).",
    tags=("dedup", "spans", "text", "ext"),
)
def dd9(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tw_etl_spark.operators.dedup import duplicate_spans

    d = _t(spark, sf_dir, "documents")
    return duplicate_spans(d, id_col="doc_id", text_col="text", n=8).orderBy(
        "doc_id"
    )


@register(
    "dd8p_semantic_dedup_relational",
    oracle="""
    WITH RECURSIVE v AS (
        SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ),
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
        -- scaled-integer Lloyd mean: quantize to nano-units, sum
        -- exactly (order-independent), divide once — mirrors the Spark
        -- side bit for bit regardless of scan/partition order
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
    a2 AS (
        SELECT vec_id, u, j AS cluster
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY vec_id ORDER BY dist, j
            ) AS rn FROM d2
        ) WHERE rn = 1
    ),
    pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM a2 a JOIN a2 b
          ON a.cluster = b.cluster AND a.vec_id < b.vec_id
        WHERE round(list_dot_product(a.u, b.u), 6) >= 0.4
    ),
    edges AS (
        SELECT id_a AS a, id_b AS b FROM pairs
        UNION SELECT id_b, id_a FROM pairs
    ),
    reach(n, l) AS (
        SELECT vec_id, vec_id FROM a2
        UNION
        SELECT e.b, r.l FROM reach r JOIN edges e ON e.a = r.n
    ),
    lab AS (SELECT n, min(l) AS comp FROM reach GROUP BY n)
    SELECT a2.vec_id AS id, a2.cluster, (lab.comp = a2.vec_id) AS survived
    FROM a2 JOIN lab ON lab.n = a2.vec_id
    ORDER BY id
    """,
    doc="SemDeDup under the FULL hash oracle: the relational twin of "
    "dd8 (semantic_dedup_relational) — unit-normalize, k=8 fixed seed "
    "centroids (smallest ids), nearest-centroid assignment with "
    "deterministic tie-break, ONE Lloyd update (means via exact "
    "scaled-integer accumulation — order-independent on both engines), "
    "reassignment, "
    "within-cluster cosine pairs >= 0.4, min-label components -> "
    "survivor flag. The oracle replays every step including the "
    "component labeling (recursive CTE), so clustering, assignment "
    "arithmetic, and survivor semantics are all byte-pinned. dd8 (MLlib "
    "KMeans, maxIter=20) remains the production tier; same shuffle "
    "shape (narrow-map assignments, k-row aggs, cluster-equi pair "
    "join).",
    tags=("dedup", "semantic", "embedding", "ext"),
)
def dd8p(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tw_etl_spark.operators.dedup import semantic_dedup_relational

    e = _t(spark, sf_dir, "embeddings")
    return semantic_dedup_relational(e, k=8, threshold=0.4).orderBy("id")


@register(
    "dd10_span_dedup_rewrite",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, {_TOKS} AS tk FROM documents
    ), posed AS (
        SELECT doc_id, tk,
               unnest(range((len(tk) + 9) // 10)) AS idx
        FROM tok WHERE len(tk) > 0
    ), chunks AS (
        SELECT doc_id, idx,
               array_to_string(
                   list_slice(tk, idx * 10 + 1, idx * 10 + 10), ' '
               ) AS chunk
        FROM posed
    ), flags AS (
        SELECT doc_id, idx, chunk,
               row_number() OVER (
                   PARTITION BY chunk ORDER BY doc_id, idx
               ) = 1 AS keep
        FROM chunks
    ), agg AS (
        SELECT doc_id,
               string_agg(chunk, ' ' ORDER BY idx)
                   FILTER (WHERE keep) AS clean_text,
               count(*) FILTER (WHERE keep) AS n_kept,
               count(*) FILTER (WHERE NOT keep) AS n_dropped
        FROM flags GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(a.clean_text, '') AS clean_text,
           coalesce(a.n_kept, 0)::BIGINT AS n_kept,
           coalesce(a.n_dropped, 0)::BIGINT AS n_dropped
    FROM documents d LEFT JOIN agg a USING (doc_id)
    ORDER BY d.doc_id
    """,
    doc="C4-style duplicated-span REMOVAL (Raffel et al. 2020 §2.2): "
    "the corpus rewritten with every repeated 10-token chunk dropped "
    "except its first occurrence by (doc_id, chunk_idx) — dd9 reports "
    "spans, dd10 produces the cleaned text. One chunk-keyed exchange "
    "for the keep rule, one doc-keyed exchange for reassembly; the "
    "oracle replays the chunking, the survivor rule, and the rejoined "
    "text verbatim.",
    tags=("dedup", "spans", "text", "rewrite", "ext"),
)
def dd10(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tw_etl_spark.operators.dedup import span_dedup_rewrite

    d = _t(spark, sf_dir, "documents")
    return span_dedup_rewrite(
        d, id_col="doc_id", text_col="text", chunk_tokens=10
    ).orderBy("doc_id")


@register(
    "dd14_delta_dedup",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, list_distinct({_TOKS}) AS toks FROM documents
    ),
    ex AS (SELECT doc_id AS doc, unnest(toks) AS tk FROM tok),
    sig AS (
        SELECT doc, r.range AS i, min(md5(r.range::VARCHAR || ':' || tk)) AS h
        FROM ex CROSS JOIN range(16) r
        GROUP BY doc, r.range
    ),
    sigarr AS (SELECT doc, list(h ORDER BY i) AS sig FROM sig GROUP BY doc),
    banded AS (
        SELECT doc, g.range AS band,
               md5(array_to_string(
                   list_slice(sig, g.range * 4 + 1, g.range * 4 + 4), ',')) AS bucket
        FROM sigarr CROSS JOIN range(4) g
    ),
    cand AS (
        SELECT DISTINCT a.doc AS id_a, b.doc AS id_b
        FROM banded a
        JOIN banded b ON a.band = b.band AND a.bucket = b.bucket AND a.doc < b.doc
    )
    SELECT c.id_a, c.id_b,
           round(length(list_filter(range(16),
                                    i -> sa.sig[i + 1] = sb.sig[i + 1])) / 16.0,
                 6) AS est_jaccard
    FROM cand c
    JOIN sigarr sa ON sa.doc = c.id_a
    JOIN sigarr sb ON sb.doc = c.id_b
    WHERE length(list_filter(range(16),
                             i -> sa.sig[i + 1] = sb.sig[i + 1])) / 16.0 >= 0.9
      AND (c.id_a % 3 = 0 OR c.id_b % 3 = 0)
    ORDER BY id_a, id_b
    """,
    doc="INCREMENTAL (delta) dedup — the 100 TB production shape "
    "(VERDICT r10 #4): the corpus splits into an already-indexed batch "
    "(doc_id % 3 != 0) and today's 'crawl' (doc_id % 3 == 0); the old "
    "batch's dd3p signature table is PERSISTED to parquet (the durable "
    "index artifact), and the new batch dedups against index + itself "
    "via operators/dedup.lsh_delta_pairs_portable — banding joins "
    "new-vs-(new ∪ index) only, so index×index pairs are structurally "
    "impossible and the old corpus is never re-deduped. Because LSH "
    "candidacy is a pure function of the two signatures, the delta "
    "output equals EXACTLY the full-corpus dd3p pairs that touch a new "
    "doc — which is what the oracle replays (full re-dedup on the "
    "union, filtered to new-touching pairs); the disjoint old-old "
    "remainder is pinned by the identity property test. Reference "
    "analog: the resume-from-snapshot posture of stream_manager "
    "state.py:59-81 (finished work is never re-fetched).",
    tags=("dedup", "minhash", "delta", "ext"),
)
def dd14(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tw_etl_spark.operators.dedup import (
        lsh_delta_pairs_portable,
        minhash_signatures_portable,
    )

    d = _t(spark, sf_dir, "documents")
    old = d.filter(F.col("doc_id") % 3 != 0)
    new = d.filter(F.col("doc_id") % 3 == 0)

    # the index is a durable artifact: write it, read it back — the
    # delta job consumes parquet, not a live plan over the old corpus
    idx_path = _delta_scratch(spark, sf_dir, "dd14")
    minhash_signatures_portable(old, num_hashes=16).write.mode(
        "overwrite"
    ).parquet(idx_path)
    index = spark.read.parquet(idx_path)

    delta_pairs, _updated = lsh_delta_pairs_portable(
        new, index, num_hashes=16, bands=4, threshold=0.9
    )
    return delta_pairs.orderBy("id_a", "id_b")


@register(
    "dd18_delta_dedup_persisted",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, list_distinct({_TOKS}) AS toks FROM documents
    ),
    ex AS (SELECT doc_id AS doc, unnest(toks) AS tk FROM tok),
    sig AS (
        SELECT doc, r.range AS i, min(md5(r.range::VARCHAR || ':' || tk)) AS h
        FROM ex CROSS JOIN range(16) r
        GROUP BY doc, r.range
    ),
    sigarr AS (SELECT doc, list(h ORDER BY i) AS sig FROM sig GROUP BY doc),
    banded AS (
        SELECT doc, g.range AS band,
               md5(array_to_string(
                   list_slice(sig, g.range * 4 + 1, g.range * 4 + 4), ',')) AS bucket
        FROM sigarr CROSS JOIN range(4) g
    ),
    cand AS (
        SELECT DISTINCT a.doc AS id_a, b.doc AS id_b
        FROM banded a
        JOIN banded b ON a.band = b.band AND a.bucket = b.bucket AND a.doc < b.doc
    )
    SELECT c.id_a, c.id_b,
           round(length(list_filter(range(16),
                                    i -> sa.sig[i + 1] = sb.sig[i + 1])) / 16.0,
                 6) AS est_jaccard
    FROM cand c
    JOIN sigarr sa ON sa.doc = c.id_a
    JOIN sigarr sb ON sb.doc = c.id_b
    WHERE length(list_filter(range(16),
                             i -> sa.sig[i + 1] = sb.sig[i + 1])) / 16.0 >= 0.9
      AND (c.id_a % 3 <> 0 OR c.id_b % 3 <> 0)
    ORDER BY id_a, id_b
    """,
    doc="CHAINED delta dedup over the PERSISTED pre-banded index "
    "layout (VERDICT r11 #4): batch 0 (doc_id %% 3 == 0) seeds the "
    "index via operators/dedup.write_banded_index — banded rows "
    "partitionBy(band) plus the signature table, both append-friendly "
    "— then batches 1 and 2 each read the index back from parquet, "
    "run lsh_delta_pairs_prebanded (only the NEW batch is md5-banded; "
    "the historical corpus is a pruned columnar scan, never "
    "recomputed), materialize their delta pairs, and APPEND their "
    "banded rows + signatures to the index. The returned table is the "
    "union of both days' delta pairs; the oracle replays the "
    "full-corpus dd3p pipeline filtered to pairs touching batch 1 or "
    "2 — a hash match proves the persisted chain (write -> read -> "
    "delta -> append -> read -> delta) lands on exactly the "
    "whole-corpus answer, the identity a 100 TB daily job relies on. "
    "Partition pruning on the banded scan is plan-asserted in "
    "tests/test_plans.py.",
    tags=("dedup", "minhash", "delta", "ext"),
)
def dd18(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil

    from tw_etl_spark.operators.dedup import (
        lsh_delta_pairs_prebanded,
        minhash_signatures_portable,
        read_banded_index,
        write_banded_index,
    )

    d = _t(spark, sf_dir, "documents")
    root = _delta_scratch(spark, sf_dir, "dd18")
    shutil.rmtree(root, ignore_errors=True)

    seed = d.filter(F.col("doc_id") % 3 == 0)
    write_banded_index(
        minhash_signatures_portable(seed, num_hashes=16),
        root, num_hashes=16, bands=4,
    )
    for day in (1, 2):
        banded, sigs = read_banded_index(spark, root)
        pairs, new_sigs, new_banded = lsh_delta_pairs_prebanded(
            d.filter(F.col("doc_id") % 3 == day),
            banded, sigs, num_hashes=16, bands=4, threshold=0.9,
        )
        # materialize the day's pairs BEFORE appending: the pairs plan
        # reads the index parquet the append is about to extend
        pairs.write.mode("overwrite").parquet(
            os.path.join(root, f"delta{day}")
        )
        new_banded.write.mode("append").partitionBy("band").parquet(
            os.path.join(root, "banded")
        )
        new_sigs.write.mode("append").parquet(os.path.join(root, "sigs"))

    return (
        spark.read.parquet(os.path.join(root, "delta1"))
        .unionByName(spark.read.parquet(os.path.join(root, "delta2")))
        .orderBy("id_a", "id_b")
    )


@register(
    "dd20_lsh_index_compaction",
    oracle=minhash_sql(
        16, 4, 0.9, new_pred="c.id_a % 4 = 3 OR c.id_b % 4 = 3"
    ),
    doc="COMPACTION of a stream-maintained banded index — the "
    "lifecycle close on the LSH side, mirroring v10's recluster on "
    "the IVF side (VERDICT r12 #2): lsh_index_stream_writer "
    "accumulates one stream partition directory per micro-batch "
    "forever, so week two of a daily pipeline reads an ever-growing "
    "listing. Lifecycle under the hash oracle: seed (doc_id % 4 == 0) "
    "persists via write_banded_index; days 1 and 2 land through the "
    "stream writer's exactly-once foreachBatch function (stream_banded"
    "/stream_sigs, batch-id-partitioned); compact_banded_index folds "
    "seed ∪ streamed batches into a FRESH seed-layout root (never in "
    "place — readers of the live index are unaffected until the root "
    "swap); day 3 then delta-dedups against the COMPACTED index via "
    "lsh_delta_pairs_prebanded. The oracle replays the full-corpus "
    "dd3p pipeline filtered to day-3-touching pairs, so a hash match "
    "proves compact(seed + streamed) answers EXACTLY like "
    "write_banded_index(full corpus) — banded rows and signatures are "
    "immutable facts keyed by doc, so compaction is one columnar "
    "read + partitioned write, zero md5 recompute. Full row-set "
    "identity (not just the day-3 view) is unit-pinned in "
    "tests/test_dedup.py.",
    tags=("dedup", "minhash", "delta", "index", "compaction", "ext"),
)
def dd20(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil

    from tw_etl_spark.operators.dedup import (
        compact_banded_index,
        lsh_delta_pairs_prebanded,
        minhash_signatures_portable,
        read_banded_index,
        write_banded_index,
    )
    from tw_etl_spark.streaming.sinks import lsh_index_stream_writer

    d = _t(spark, sf_dir, "documents")
    root = _delta_scratch(spark, sf_dir, "dd20")
    shutil.rmtree(root, ignore_errors=True)
    live = os.path.join(root, "live")

    write_banded_index(
        minhash_signatures_portable(
            d.filter(F.col("doc_id") % 4 == 0), num_hashes=16
        ),
        live, num_hashes=16, bands=4,
    )
    # the stream writer IS the foreachBatch function Structured
    # Streaming would call — invoking it per day batch exercises the
    # exact exactly-once append path st12 drives through the engine
    writer = lsh_index_stream_writer(
        spark, live, num_hashes=16, bands=4, threshold=0.9
    )
    for day in (1, 2):
        writer(
            d.filter(F.col("doc_id") % 4 == day).select("doc_id", "text"),
            day - 1,
        )

    compacted = os.path.join(root, "compacted")
    compact_banded_index(spark, live, compacted)

    banded, sigs = read_banded_index(spark, compacted)
    pairs, _sigs, _banded = lsh_delta_pairs_prebanded(
        d.filter(F.col("doc_id") % 4 == 3),
        banded, sigs, num_hashes=16, bands=4, threshold=0.9,
    )
    return pairs.orderBy("id_a", "id_b")


@register(
    "dd19_delta_duplicate_spans",
    # ONE parameterized source of truth for this replay (ADVICE r12):
    # the dedup fuzz harness sweeps the same oracle via
    # testing.dedupgen.delta_span_sql across 13 corpus kinds — an
    # inlined copy here could silently drift from the swept form.
    oracle=delta_span_sql(n=8, delta_mod=3),
    doc="INCREMENTAL duplicated-span detection — the exact-substring "
    "cell of the delta-dedup family (token LSH dd14, exact signature "
    "dd15, embedding cosine dd16, clustered SemDeDup dd17, and now "
    "the Lee et al. span signal dd19): the old corpus (doc_id % 3 != "
    "0) persists ONLY as its 8-gram-hash occurrence counts "
    "(operators/dedup.gram_count_index — mergeable across batches by "
    "integer sum, merge_gram_index), and the daily batch's positions "
    "are judged duplicated via cnt_old + n_all_new > n_own — the full "
    "re-scan criterion on the union reconstructed without "
    "re-tokenizing history. The oracle replays dd9 on the union "
    "restricted to new docs, so a hash match proves the delta output "
    "EQUALS the full re-scan's new-doc rows; the gram explode, both "
    "window counts, and the index join all key on gh (one exchange).",
    tags=("dedup", "spans", "text", "delta", "ext"),
)
def dd19(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tw_etl_spark.operators.dedup import (
        delta_duplicate_spans,
        gram_count_index,
    )

    d = _t(spark, sf_dir, "documents")
    idx_path = _delta_scratch(spark, sf_dir, "dd19")
    gram_count_index(
        d.filter(F.col("doc_id") % 3 != 0), id_col="doc_id",
        text_col="text", n=8,
    ).write.mode("overwrite").parquet(idx_path)
    index = spark.read.parquet(idx_path)
    return delta_duplicate_spans(
        d.filter(F.col("doc_id") % 3 == 0), index,
        id_col="doc_id", text_col="text", n=8,
    ).orderBy("doc_id")


@register(
    "dd15_delta_survivor_index",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, list_distinct({_TOKS}) AS toks FROM documents
    ), ex AS (
        SELECT doc_id AS doc, unnest(toks) AS tk FROM tok
    ), hashes AS (
        SELECT doc, ('0x' || substr(md5(tk), 1, 8))::BIGINT AS h FROM ex
    ), votes AS (
        SELECT doc, g.range AS b,
               sum(CASE WHEN (h >> g.range) & 1 = 1 THEN 1 ELSE -1 END) AS v
        FROM hashes CROSS JOIN range(32) g
        GROUP BY doc, g.range
    ), sh AS (
        SELECT doc, sum(CASE WHEN v > 0 THEN 1::BIGINT << b ELSE 0 END) AS s
        FROM votes GROUP BY doc
    ), sigs AS (
        SELECT d.doc_id, coalesce(sh.s, 0)::BIGINT AS sig
        FROM documents d LEFT JOIN sh ON sh.doc = d.doc_id
    )
    SELECT sig, min(doc_id) AS survivor,
           count(*)::BIGINT AS n_members
    FROM sigs GROUP BY sig HAVING count(*) >= 2
    ORDER BY sig
    """,
    doc="INCREMENTAL survivor-index maintenance, exact-signature tier "
    "(dd14's LSH sibling; the durable artifact behind st5's streaming "
    "form): the old batch's per-SimHash-signature survivor table "
    "(sig -> min doc_id, member count) persists as a sig-BUCKETED "
    "parquet table (operators/dedup.write_survivor_index_bucketed — "
    "the sig shuffle is paid once at write); the new batch's survivor "
    "table folds in via merge_survivor_index_bucketed, whose "
    "full-outer join reads the index branch straight off the bucket "
    "files with no Exchange (plan-asserted) — min-id survivorship and "
    "additive counts are associative+commutative (property-tested), so "
    "a daily delta job folds forever and lands on exactly the "
    "full-corpus recompute. The oracle IS that full recompute (st5's "
    "relational form verbatim); a hash match proves batch-wise "
    "incremental == whole-corpus, the same identity a 100 TB corpus "
    "relies on to never re-dedup history.",
    tags=("dedup", "simhash", "delta", "ext"),
)
def dd15(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tw_etl_spark.operators.dedup import (
        merge_survivor_index_bucketed,
        write_survivor_index_bucketed,
    )

    d = _t(spark, sf_dir, "documents")

    def survivors(df: DataFrame) -> DataFrame:
        return (
            df.select(
                "doc_id", simhash_portable_expr(F.col("text")).alias("sig")
            )
            .groupBy("sig")
            .agg(
                F.min("doc_id").alias("survivor"),
                F.count(F.lit(1)).cast("long").alias("n_members"),
            )
        )

    # the index persists BUCKETED by sig (VERDICT r11 #4): the write
    # pays the sig shuffle once; the daily merge below joins the index
    # branch straight off the bucket files, no Exchange over history
    # (plan-asserted in tests/test_plans.py)
    import os

    table = "dd15_surv_" + os.path.basename(
        _delta_scratch(spark, sf_dir, "dd15")
    ).rsplit("_", 1)[-1]
    write_survivor_index_bucketed(
        survivors(d.filter(F.col("doc_id") % 3 != 0)), table
    )
    index = spark.table(table)

    merged = merge_survivor_index_bucketed(
        index, survivors(d.filter(F.col("doc_id") % 3 == 0))
    )
    return merged.filter(F.col("n_members") >= 2).orderBy("sig")


@register(
    "dd16_delta_embedding_neardup",
    oracle="""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(
               list_dot_product(a.e, b.e)
               / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))),
           6) AS cos_sim
    FROM v a JOIN v b ON a.vec_id < b.vec_id
    WHERE round(
              list_dot_product(a.e, b.e)
              / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))),
          6) >= 0.45
      AND (a.vec_id % 3 = 0 OR b.vec_id % 3 = 0)
    ORDER BY id_a, id_b
    """,
    doc="INCREMENTAL embedding-cosine near-dup (the third delta-dedup "
    "cell beside dd14's token-LSH and dd15's exact-signature tiers — "
    "the full representation triple now has a delta form): the old "
    "batch's embeddings (vec_id % 3 != 0) persist as a parquet index; "
    "the new batch scans new-vs-(new ∪ index) only via "
    "operators/similarity.cosine_delta_pairs — a daily batch costs "
    "|new|·|all| dot products instead of the |all|² re-scan, and "
    "index×index pairs are structurally impossible. The pair criterion "
    "is a pure function of the two vectors, so the delta output equals "
    "EXACTLY the full re-scan's new-touching pairs — which is what the "
    "oracle replays (dd5's relational form filtered to new-touching); "
    "the identity property pins the disjoint remainder.",
    tags=("dedup", "vector", "delta", "ext"),
)
def dd16(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tw_etl_spark.operators.similarity import cosine_delta_pairs

    v = _t(spark, sf_dir, "embeddings")
    idx_path = _delta_scratch(spark, sf_dir, "dd16")
    v.filter(F.col("vec_id") % 3 != 0).select(
        "vec_id", "embedding"
    ).write.mode("overwrite").parquet(idx_path)
    index = spark.read.parquet(idx_path)

    return cosine_delta_pairs(
        v.filter(F.col("vec_id") % 3 == 0), index, threshold=0.45
    ).orderBy("id_a", "id_b")


@register(
    "dd17_delta_semantic_dedup",
    oracle="""
    WITH v AS (
        SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ),
    unitv AS (
        SELECT vec_id,
               list_transform(
                   e, x -> x / greatest(sqrt(list_dot_product(e, e)), 1e-12)
               ) AS u
        FROM v
    ),
    -- the INDEX: centroids trained on the OLD corpus only (dd8p's
    -- recipe verbatim: seed on the 8 smallest old ids, assign old,
    -- one exact scaled-integer Lloyd update) — training never sees
    -- the new batch
    seeds AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS j, u AS c
        FROM unitv WHERE vec_id % 3 <> 0 ORDER BY vec_id LIMIT 8
    ),
    d1 AS (
        SELECT vec_id, u, j, list_dot_product(dv, dv) AS dist
        FROM (
            SELECT n.vec_id, n.u, s.j,
                   list_transform(range(64), i -> n.u[i + 1] - s.c[i + 1]) AS dv
            FROM unitv n CROSS JOIN seeds s
            WHERE n.vec_id % 3 <> 0
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
    -- ALL vectors assign against the FIXED index centroids (old rows
    -- land on their index assignments, new rows on delta assignments —
    -- both pure functions of cents2)
    d2 AS (
        SELECT vec_id, u, j, list_dot_product(dv, dv) AS dist
        FROM (
            SELECT n.vec_id, n.u, s.j,
                   list_transform(range(64), i -> n.u[i + 1] - s.c[i + 1]) AS dv
            FROM unitv n CROSS JOIN cents2 s
        )
    ),
    a2 AS (
        SELECT vec_id, u, j AS cluster
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY vec_id ORDER BY dist, j
            ) AS rn FROM d2
        ) WHERE rn = 1
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_dot_product(a.u, b.u), 6) AS cos_sim
    FROM a2 a JOIN a2 b
      ON a.cluster = b.cluster AND a.vec_id < b.vec_id
    WHERE round(list_dot_product(a.u, b.u), 6) >= 0.4
      AND (a.vec_id % 3 = 0 OR b.vec_id % 3 = 0)
    ORDER BY id_a, id_b
    """,
    doc="INCREMENTAL SemDeDup (the delta-dedup family's clustered "
    "cell, completing dd14/dd15/dd16): the index is dd8p's relational "
    "k-means trained on the OLD corpus only (fixed centroids = the "
    "durable artifact; dd14/dd16 demonstrate the parquet persistence "
    "step); the new batch assigns against those FIXED centroids (a "
    "shuffle-free narrow map — centroids ride as literals) and the "
    "within-cluster scan is NEW-vs-ALL per cluster "
    "(operators/dedup.within_cluster_delta_pairs: |new_c|·|all_c| "
    "blocked-matmul work, index×index pairs structurally impossible). "
    "Because assignment and the pair criterion are pure functions of "
    "(centroids, two vectors), the delta output equals EXACTLY the "
    "fixed-centroid full scan's new-touching pairs — the oracle "
    "replays index training on the old slice, assignment of all, and "
    "the filtered pair scan; the identity property pins the disjoint "
    "old-old remainder.",
    tags=("dedup", "semantic", "embedding", "delta", "ext"),
)
def dd17(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tw_etl_spark.operators.dedup import (
        kmeans_assign_expr,
        relational_kmeans_centroids,
        unit_vectors,
        within_cluster_delta_pairs,
    )

    e = _t(spark, sf_dir, "embeddings")
    unit_all = unit_vectors(e)
    old_unit = unit_vectors(e.filter(F.col("vec_id") % 3 != 0))
    _seeds, cents2 = relational_kmeans_centroids(old_unit, 8)
    a = unit_all.select(
        "id",
        "u",
        kmeans_assign_expr(cents2).alias("cluster"),
        (F.col("id") % 3 == 0).alias("__new"),
    )
    return within_cluster_delta_pairs(
        a, "id", "u", "cluster", "__new", threshold=0.4
    ).orderBy("id_a", "id_b")
