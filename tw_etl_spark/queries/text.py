"""Text-analysis queries [EXT] over the documents table: token stats,
language-ID, quality scoring, fingerprinting, n-grams, rolling hash.

All but the rolling hash are oracle-verified (DuckDB list lambdas mirror
the Spark higher-order functions exactly — same integer counts, same
division order, so doubles match bit-for-bit before rounding).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tw_etl_spark.catalog import read_table as _t
from tw_etl_spark.operators.text import (
    LANG_PROFILES,
    bpe_token_count_expr,
    fingerprint_expr,
    token_count_expr,
    lang_id_expr,
    quality_score_expr,
    rolling_hash_expr,
    tokens_expr,
)
from tw_etl_spark.queries import register

# DuckDB fragment: cleaned token list of `text`
_TOKS = "list_filter(string_split(text, ' '), t -> t <> '')"

from tw_etl_spark.functions.rounding import sql_round_ratio  # noqa: E402

# t15's exact 6-digit z (see functions/rounding.py for why float
# round() cannot be used on integer ratios)
_Z6 = sql_round_ratio("a.s", "a.n_tokens * 1000", 6)


@register(
    "t1_token_stats",
    oracle=f"""
    SELECT
        doc_id,
        CAST(len({_TOKS}) AS BIGINT)                                  AS n_tokens,
        CAST(len(list_distinct({_TOKS})) AS BIGINT)                   AS n_distinct_tokens,
        CAST(len(regexp_extract_all(text, '[a-z]+|[A-Z]+|[0-9]+')) AS BIGINT) AS n_bpe_tokens
    FROM documents
    ORDER BY doc_id
    """,
    doc="Token counting: whitespace + distinct + BPE-ish regex tokens.",
    tags=("text", "ext"),
)
def t1(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    toks = tokens_expr(F.col("text"))
    return (
        d.select(
            "doc_id",
            F.size(toks).cast("bigint").alias("n_tokens"),
            F.size(F.array_distinct(toks)).cast("bigint").alias("n_distinct_tokens"),
            bpe_token_count_expr(F.col("text")).alias("n_bpe_tokens"),
        )
        .orderBy("doc_id")
    )


def _lang_score_sql(profile: list[str]) -> str:
    lits = ", ".join(f"'{w}'" for w in profile)
    return (
        f"len(list_filter({_TOKS}, t -> list_contains([{lits}], t)))"
        f" / greatest(len({_TOKS}), 1)"
    )


_SCORES = {lang: _lang_score_sql(prof) for lang, prof in LANG_PROFILES.items()}
_BEST = "greatest(" + ", ".join(f"s_{lang}" for lang in LANG_PROFILES) + ")"
_CASE = (
    "CASE "
    + " ".join(f"WHEN s_{lang} = {_BEST} THEN '{lang}'" for lang in LANG_PROFILES)
    + " ELSE 'und' END"
)


@register(
    "t2_lang_id",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, lang,
               {", ".join(f"{sql} AS s_{lang}" for lang, sql in _SCORES.items())}
        FROM documents
    )
    SELECT lang, {_CASE} AS lang_pred, CAST(count(*) AS BIGINT) AS n_docs
    FROM scored
    GROUP BY lang, lang_pred
    ORDER BY lang, lang_pred
    """,
    doc="Language-ID heuristic: per-language marker-token density argmax, "
    "confusion counts vs the labeled lang column.",
    tags=("text", "ext", "langid"),
)
def t2(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    toks = tokens_expr(F.col("text"))
    return (
        d.select("lang", lang_id_expr(toks).alias("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang", "lang_pred")
    )


@register(
    "t3_quality_score",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, n_chars,
               CAST(len({_TOKS}) AS DOUBLE)                AS n_tok,
               CAST(len(list_distinct({_TOKS})) AS DOUBLE) AS n_dis
        FROM documents
    )
    SELECT doc_id,
           round(
               0.4 * (n_dis / greatest(n_tok, 1.0))
             + 0.3 * least(n_tok / 80.0, 1.0)
             + 0.3 * least((CAST(n_chars AS DOUBLE) / greatest(n_tok, 1.0)) / 6.0, 1.0),
           6) AS q_score
    FROM t
    ORDER BY doc_id
    """,
    doc="Composite quality score: lexical diversity + length saturation + "
    "mean token length (cleanse-filter primitive).",
    tags=("text", "ext", "quality"),
)
def t3(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            quality_score_expr(F.col("text"), F.col("n_chars")).alias("q_score"),
        )
        .orderBy("doc_id")
    )


@register(
    "t4_fingerprint_clusters",
    oracle=f"""
    WITH fp AS (
        SELECT doc_id,
               md5(array_to_string(list_sort(list_distinct({_TOKS})), ' ')) AS fingerprint
        FROM documents
    )
    SELECT fingerprint,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS keep_id
    FROM fp
    GROUP BY fingerprint
    HAVING count(*) > 1
    ORDER BY fingerprint
    """,
    doc="Key-collision fingerprint (sorted distinct token set → md5): "
    "near-dup clusters with >1 member.",
    tags=("text", "dedup", "ext"),
)
def t4(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return (
        d.select("doc_id", fingerprint_expr(F.col("text")).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("keep_id"),
        )
        .filter(F.col("n_docs") > 1)
        .orderBy("fingerprint")
    )


@register(
    "t5_top_bigrams",
    oracle=f"""
    WITH toks AS (SELECT {_TOKS} AS t FROM documents),
    bg AS (
        SELECT unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS bigram
        FROM toks
        WHERE len(t) >= 2
    )
    SELECT bigram, CAST(count(*) AS BIGINT) AS cnt
    FROM bg
    GROUP BY bigram
    ORDER BY cnt DESC, bigram
    LIMIT 20
    """,
    doc="N-gram generation via higher-order functions + top-20 bigrams.",
    tags=("text", "ngram", "ext"),
)
def t5(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    toks = tokens_expr(F.col("text"))
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size(F.col("t")) - 1),
        lambda i: F.concat_ws(
            " ", F.element_at(F.col("t"), i), F.element_at(F.col("t"), i + 1)
        ),
    )
    return (
        d.select(toks.alias("t"))
        .filter(F.size("t") >= 2)
        .select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "bigram")
        .limit(20)
    )


@register(
    "t6_rolling_hash",
    oracle=None,  # crc32 has no DuckDB twin; determinism unit-tested instead
    doc="Token-level polynomial rolling hash (Rabin-Karp style document "
    "fingerprint). Driver records rows-only; tests/test_text.py pins values.",
    tags=("text", "hash", "ext"),
)
def t6(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return (
        d.select("doc_id", rolling_hash_expr(F.col("text")).alias("rhash"))
        .orderBy("doc_id")
    )


@register(
    "t6p_rolling_hash_portable",
    oracle=f"""
    SELECT doc_id,
           list_reduce(
               list_prepend(0::BIGINT,
                   list_transform({_TOKS},
                       t -> ('0x' || substr(md5(t), 1, 8))::BIGINT)),
               (a, b) -> (a * 31 + b) % 1000000007
           ) AS rhash
    FROM documents
    ORDER BY doc_id
    """,
    doc="Rabin-Karp document fingerprint over the PORTABLE hash family "
    "(md5-prefix uint32 per token): the DuckDB oracle replays the exact "
    "fold via list_reduce, pinning every hash VALUE cross-engine — the "
    "same portable-twin pattern as dd3p/dd4p/a9. t6 (crc32) stays the "
    "cheaper engine tier.",
    tags=("text", "hash", "ext"),
)
def t6p(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tw_etl_spark.operators.text import rolling_hash_portable_expr

    d = _t(spark, sf_dir, "documents")
    return (
        d.select("doc_id", rolling_hash_portable_expr(F.col("text")).alias("rhash"))
        .orderBy("doc_id")
    )


@register(
    "t7_repetition_filter",
    oracle=f"""
    WITH t AS (SELECT doc_id, lang, {_TOKS} AS toks FROM documents),
    tri AS (
        SELECT doc_id, lang,
               CASE WHEN len(toks) >= 3 THEN
                   list_transform(generate_series(1, len(toks) - 2),
                       i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
               ELSE [] END AS tg
        FROM t
    ),
    scored AS (
        SELECT doc_id, lang,
               CASE WHEN len(tg) > 0
                    THEN 1.0 - len(list_distinct(tg)) / CAST(len(tg) AS DOUBLE)
                    ELSE 0.0 END AS rep
        FROM tri
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (rep > 0.2) AS BIGINT) AS n_repetitive,
           round(avg(rep), 6) AS avg_rep
    FROM scored GROUP BY lang ORDER BY lang
    """,
    doc="Repeated-trigram quality rule (corpus-curation style): per-doc "
    "1 - distinct/total trigram ratio, rolled up per language with a "
    ">0.2 repetitive-doc count. Entirely JVM-side higher-order "
    "functions; the trigram construction never leaves the scan stage.",
    tags=("text", "quality", "ext"),
)
def t7(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tw_etl_spark.operators.text import repetition_ratio_expr

    d = _t(spark, sf_dir, "documents")
    scored = d.select("lang", repetition_ratio_expr(F.col("text")).alias("rep"))
    return (
        scored.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.count_if(F.col("rep") > 0.2).cast("bigint").alias("n_repetitive"),
            F.round(F.avg("rep"), 6).alias("avg_rep"),
        )
        .orderBy("lang")
    )


_STOPWORDS = ["the", "a"]


@register(
    "t8_tfidf_top_terms",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest({_TOKS}) AS tk FROM documents
    ), kept AS (
        SELECT doc_id, tk FROM toks
        WHERE tk NOT IN ({", ".join(f"'{w}'" for w in _STOPWORDS)})
    ), tf AS (
        SELECT doc_id, tk, CAST(count(*) AS DOUBLE) AS tf
        FROM kept GROUP BY doc_id, tk
    ), dfreq AS (
        SELECT tk, CAST(count(DISTINCT doc_id) AS DOUBLE) AS dfq
        FROM kept GROUP BY tk
    ), n AS (
        SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents
    ), scored AS (
        SELECT doc_id, tf.tk,
               tf * (ln((n_docs + 1) / (dfq + 1)) + 1) AS tfidf
        FROM tf JOIN dfreq USING (tk) CROSS JOIN n
    )
    SELECT doc_id, tk, round(tfidf, 6) AS tfidf, rnk
    FROM (
        SELECT doc_id, tk, tfidf,
               rank() OVER (PARTITION BY doc_id
                            ORDER BY tfidf DESC, tk) AS rnk
        FROM scored
    )
    WHERE rnk <= 3
    ORDER BY doc_id, rnk, tk
    """,
    doc="TF-IDF (smooth-idf, sklearn formula) with stopword removal; "
    "top-3 terms per document. One wide shuffle; idf table and corpus "
    "size join back broadcast.",
    tags=("text", "ext", "tfidf"),
)
def t8(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from tw_etl_spark.operators.text import tf_idf

    d = _t(spark, sf_dir, "documents")
    scored = tf_idf(d, stopwords=_STOPWORDS)
    w = Window.partitionBy("doc").orderBy(F.desc("tfidf"), F.asc("tk"))
    return (
        scored.withColumn("rnk", F.rank().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 3)
        .select(
            F.col("doc").alias("doc_id"),
            "tk",
            F.round("tfidf", 6).alias("tfidf"),
            "rnk",
        )
        .orderBy("doc_id", "rnk", "tk")
    )


@register(
    "x3_sequence_packing",
    oracle=None,  # per-group imperative assignment; invariants unit-tested
    doc="First-fit-decreasing sequence packing of documents into "
    "256-token packs, hash-bucketed for parallelism (one shuffle + "
    "Arrow-batched per-bucket packing). Summary: packs, docs, fill "
    "rate. Invariants (completeness, budget, determinism, FFD waste "
    "bound) in tests/test_text.py.",
    tags=("pipeline", "packing", "ext"),
)
def x3(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tw_etl_spark.operators.packing import pack_sequences

    budget = 256
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", token_count_expr(F.col("text")).alias("n_tok")
    )
    packed = pack_sequences(d, "doc_id", "n_tok", budget)
    return (
        packed.groupBy("pack_id")
        .agg(F.sum("n_tok").alias("tok"), F.count(F.lit(1)).alias("docs"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_packs"),
            F.sum("docs").cast("bigint").alias("n_docs"),
            F.round(F.avg(F.col("tok") / budget), 4).alias("avg_fill"),
        )
    )


@register(
    "x3p_sequence_packing_portable",
    oracle=f"""
    WITH RECURSIVE base AS (
        SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS n,
               (('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 32) AS bucket
        FROM documents
    ),
    ordered AS (
        SELECT doc_id, n, bucket,
               row_number() OVER (PARTITION BY bucket ORDER BY n DESC, doc_id) AS rn
        FROM base
    ),
    counts AS (SELECT bucket, max(rn) AS mx FROM ordered GROUP BY bucket),
    sim(bucket, step, rem, assigns) AS (
        SELECT bucket, 0, []::BIGINT[], []::BIGINT[] FROM counts
        UNION ALL
        SELECT s.bucket, s.step + 1,
               CASE WHEN d.n > 256 THEN list_append(s.rem, 0::BIGINT)
                    WHEN fit.fi IS NULL THEN list_append(s.rem, 256 - d.n)
                    ELSE list_transform(range(len(s.rem)),
                            q -> CASE WHEN q = fit.fi THEN s.rem[q + 1] - d.n
                                      ELSE s.rem[q + 1] END)
               END,
               list_append(s.assigns,
                   CASE WHEN d.n > 256 OR fit.fi IS NULL
                        THEN len(s.rem)::BIGINT ELSE fit.fi END)
        FROM sim s
        JOIN counts c ON c.bucket = s.bucket AND s.step < c.mx
        JOIN ordered d ON d.bucket = s.bucket AND d.rn = s.step + 1
        CROSS JOIN LATERAL (
            SELECT list_filter(
                       list_transform(range(len(s.rem)),
                           q -> CASE WHEN s.rem[q + 1] >= d.n THEN q END),
                       x -> x IS NOT NULL)[1] AS fi
        ) fit
    ),
    final AS (
        SELECT s.bucket, s.assigns FROM sim s
        JOIN counts c ON c.bucket = s.bucket AND s.step = c.mx
    )
    SELECT o.doc_id, o.n AS n_tok,
           o.bucket::INT AS bucket,
           o.bucket::VARCHAR || '_' || f.assigns[o.rn]::VARCHAR AS pack_id
    FROM ordered o JOIN final f ON f.bucket = o.bucket
    ORDER BY o.doc_id
    """,
    doc="First-fit-decreasing sequence packing under the FULL hash "
    "oracle: portable md5-prefix bucketing, and a recursive CTE that "
    "replays the per-bucket FFD fold — the remaining-room list evolves "
    "step by step exactly as the Arrow-batched packer's loop — so "
    "every (doc -> pack) ASSIGNMENT is cross-engine-pinned, not just "
    "the packing invariants. Recursion depth = max docs per bucket "
    "(docs/32). x3 (xxhash64 buckets, summary stats) stays the engine "
    "tier.",
    tags=("pipeline", "packing", "ext"),
)
def x3p(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tw_etl_spark.operators.packing import pack_sequences

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", token_count_expr(F.col("text")).alias("n_tok")
    )
    return pack_sequences(
        d, "doc_id", "n_tok", budget=256, num_buckets=32, bucket_hash="md5"
    ).orderBy("doc_id")


@register(
    "t9_token_entropy",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, lang, {_TOKS} AS toks,
               CAST(len({_TOKS}) AS DOUBLE) AS n
        FROM documents
    ),
    scored AS (
        SELECT doc_id, lang,
               CASE WHEN n > 0 THEN
                   -list_sum(list_transform(list_distinct(toks),
                       d -> (len(list_filter(toks, t -> t = d)) / n)
                            * ln(len(list_filter(toks, t -> t = d)) / n)))
               ELSE 0.0 END AS ent
        FROM t
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (ent < 1.0) AS BIGINT) AS n_low_entropy,
           round(avg(ent), 6) AS avg_entropy
    FROM scored GROUP BY lang ORDER BY lang
    """,
    doc="Shannon entropy of per-doc token distribution, rolled up per "
    "language with a low-entropy (<1 nat) degenerate-doc count. "
    "Complements t7: catches 'a b a b a b' loops that have zero "
    "repeated trigrams.",
    tags=("text", "quality", "ext"),
)
def t9(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tw_etl_spark.operators.text import token_entropy_expr

    d = _t(spark, sf_dir, "documents")
    scored = d.select("lang", token_entropy_expr(F.col("text")).alias("ent"))
    return (
        scored.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.count_if(F.col("ent") < 1.0).cast("bigint").alias("n_low_entropy"),
            F.round(F.avg("ent"), 6).alias("avg_entropy"),
        )
        .orderBy("lang")
    )


# Inject deterministic synthetic PII into a slice of docs so the
# redaction path actually fires on the fixture corpus (both engines
# apply the identical injection, so the oracle still binds).
_PII_INJECT_SQL = (
    "CASE WHEN doc_id % 10 = 0 THEN text || ' contact user' || doc_id"
    " || '@example.com or 555-867-530' || (doc_id % 10) || ' at 10.0.0.'"
    " || (doc_id % 256) ELSE text END"
)


@register(
    "t10_pii_redaction",
    oracle=f"""
    WITH injected AS (
        SELECT doc_id, lang, {_PII_INJECT_SQL} AS text FROM documents
    ),
    red AS (
        SELECT doc_id, lang, text,
               regexp_replace(regexp_replace(regexp_replace(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', '<EMAIL>', 'g'),
                   '\\b\\d{{3}}[-. ]\\d{{3}}[-. ]\\d{{4}}\\b', '<PHONE>', 'g'),
                   '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b', '<IP>', 'g')
               AS redacted
        FROM injected
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (redacted <> text) AS BIGINT) AS n_redacted,
           CAST(sum(len(text) - len(redacted)) AS BIGINT) AS chars_removed
    FROM red GROUP BY lang ORDER BY lang
    """,
    doc="PII scrub: chained regexp_replace of emails/phones/IPv4 with "
    "typed placeholders over a deterministically PII-injected corpus "
    "slice; per-language redaction counts. Map-only, fused into the "
    "scan stage.",
    tags=("text", "pii", "ext"),
)
def t10(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tw_etl_spark.operators.text import redact_pii_expr

    d = _t(spark, sf_dir, "documents")
    injected = d.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 10 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com or 555-867-530"),
                (F.col("doc_id") % 10).cast("string"),
                F.lit(" at 10.0.0."),
                (F.col("doc_id") % 256).cast("string"),
            ),
        ).otherwise(F.col("text")),
    )
    red = injected.select(
        "lang",
        "text",
        redact_pii_expr(F.col("text")).alias("redacted"),
    )
    return (
        red.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.count_if(F.col("redacted") != F.col("text")).cast("bigint").alias("n_redacted"),
            F.sum(F.length("text") - F.length("redacted")).cast("bigint").alias("chars_removed"),
        )
        .orderBy("lang")
    )


# DuckDB fragments shared by the quality-battery oracles
_QLINES = (
    "list_filter(list_transform(string_split(text, chr(10)), l -> trim(l)), "
    "l -> l <> '')"
)


@register(
    "t11_gopher_quality",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               {_TOKS} AS toks,
               {_QLINES} AS lines,
               text
        FROM documents
    ), m AS (
        SELECT doc_id,
               CAST(len(toks) AS DOUBLE) AS n_words,
               GREATEST(CAST(len(toks) AS DOUBLE), 1.0) AS safe_words,
               GREATEST(CAST(len(lines) AS DOUBLE), 1.0) AS n_lines,
               CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE) AS sum_len,
               CAST(len(regexp_extract_all(text, '(#|\\.\\.\\.|…)')) AS DOUBLE) AS n_sym,
               CAST(len(list_filter(lines, l -> regexp_matches(l, '^[-*•]'))) AS DOUBLE) AS n_bullet,
               CAST(len(list_filter(lines, l -> regexp_matches(l, '(\\.\\.\\.|…)$'))) AS DOUBLE) AS n_ellipsis,
               CAST(len(list_filter(toks, t -> regexp_matches(t, '[A-Za-z]'))) AS DOUBLE) AS n_alpha,
               len(list_intersect(list_transform(list_distinct(toks), t -> lower(t)),
                   ['the','be','to','of','and','that','have','with'])) AS n_stop,
               CAST(len(list_distinct(lines)) AS DOUBLE) AS n_distinct_lines
        FROM t
    )
    SELECT doc_id,
           CAST(n_words AS BIGINT)                          AS g_n_words,
           (CASE WHEN (sum_len) < 0 THEN -(((abs(sum_len)::BIGINT * 1000000) // ((safe_words)::BIGINT)) + CASE WHEN 2 * ((abs(sum_len)::BIGINT * 1000000) % ((safe_words)::BIGINT)) >= ((safe_words)::BIGINT) THEN 1 ELSE 0 END) ELSE (((abs(sum_len)::BIGINT * 1000000) // ((safe_words)::BIGINT)) + CASE WHEN 2 * ((abs(sum_len)::BIGINT * 1000000) % ((safe_words)::BIGINT)) >= ((safe_words)::BIGINT) THEN 1 ELSE 0 END) END / 1000000.0) AS g_mean_word_len,
           (n_words >= 50 AND n_words <= 100000)            AS g_word_count_ok,
           (sum_len / safe_words >= 3.0 AND sum_len / safe_words <= 10.0) AS g_word_len_ok,
           (n_sym / safe_words <= 0.1)                      AS g_symbol_ok,
           (n_bullet / n_lines <= 0.9)                      AS g_bullet_ok,
           (n_ellipsis / n_lines <= 0.3)                    AS g_ellipsis_ok,
           (n_alpha / safe_words >= 0.8)                    AS g_alpha_ok,
           (n_stop >= 2)                                    AS g_stopword_ok,
           (1.0 - n_distinct_lines / n_lines <= 0.3)        AS g_dup_line_ok,
           ((n_words >= 50 AND n_words <= 100000)
            AND (sum_len / safe_words >= 3.0 AND sum_len / safe_words <= 10.0)
            AND (n_sym / safe_words <= 0.1)
            AND (n_bullet / n_lines <= 0.9)
            AND (n_ellipsis / n_lines <= 0.3)
            AND (n_alpha / safe_words >= 0.8)
            AND (n_stop >= 2)
            AND (1.0 - n_distinct_lines / n_lines <= 0.3))  AS gopher_keep
    FROM m
    ORDER BY doc_id
    """,
    doc="Gopher quality-rule battery (Rae et al. 2021 table A1) as "
    "per-document boolean flags + conjunction keep — expression-only "
    "narrow map, no shuffle.",
    tags=("text", "quality", "ext"),
)
def t11(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tw_etl_spark.operators.quality import gopher_flags

    d = _t(spark, sf_dir, "documents")
    return gopher_flags(d).select(
        "doc_id",
        "g_n_words",
        "g_mean_word_len",
        "g_word_count_ok",
        "g_word_len_ok",
        "g_symbol_ok",
        "g_bullet_ok",
        "g_ellipsis_ok",
        "g_alpha_ok",
        "g_stopword_ok",
        "g_dup_line_ok",
        "gopher_keep",
    ).orderBy("doc_id")


@register(
    "t12_c4_clean",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, text, {_QLINES} AS lines FROM documents
    ), k AS (
        SELECT doc_id, text,
               list_filter(lines, l ->
                   regexp_matches(l, '[.!?"'']$')
                   AND len(list_filter(string_split(l, ' '), w -> w <> '')) >= 5
               ) AS kept
        FROM t
    )
    SELECT doc_id,
           COALESCE(list_aggregate(kept, 'string_agg', chr(10)), '') AS c4_text,
           CAST(len(kept) AS BIGINT)                   AS c4_n_lines,
           (len(kept) >= 3
            AND NOT contains(text, '{{')
            AND NOT contains(lower(text), 'lorem ipsum')) AS c4_keep
    FROM k
    ORDER BY doc_id
    """,
    doc="C4-style line cleanup (Raffel et al. 2020 §2.2): terminal-"
    "punctuation + min-word lines kept, short/code/lorem docs dropped.",
    tags=("text", "quality", "ext"),
)
def t12(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tw_etl_spark.operators.quality import c4_clean

    d = _t(spark, sf_dir, "documents")
    return c4_clean(d).select(
        "doc_id", "c4_text", "c4_n_lines", "c4_keep"
    ).orderBy("doc_id")


@register(
    "t13_lm_perplexity",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest({_TOKS}) AS token FROM documents
    ), counts AS (
        SELECT token, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY token
    ), top AS (
        SELECT token, c FROM counts ORDER BY c DESC, token LIMIT 50000
    ), consts AS (
        SELECT CAST(sum(c) AS DOUBLE) AS total, CAST(count(*) AS DOUBLE) AS v
        FROM top
    ), model AS (
        SELECT token, ln((c + 0.5) / (total + 0.5 * (v + 1))) AS logprob
        FROM top, consts
    )
    SELECT t.doc_id,
           round(avg(COALESCE(m.logprob,
               (SELECT ln(0.5 / (total + 0.5 * (v + 1))) FROM consts))), 6)
               AS avg_logprob,
           CAST(count(*) AS BIGINT) AS n_tokens
    FROM toks t LEFT JOIN model m USING (token)
    GROUP BY t.doc_id
    ORDER BY t.doc_id
    """,
    doc="CCNet-style unigram LM quality signal (Wenzek et al. 2020): "
    "train add-k-smoothed token logprobs from the corpus (one explode + "
    "count agg, vocab-capped), score each document by mean token "
    "logprob via a broadcast model join. The model never shuffles; the "
    "only shuffle is the per-document mean.",
    tags=("text", "quality", "lm", "ext"),
)
def t13(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tw_etl_spark.operators.text import lm_score, unigram_lm

    d = _t(spark, sf_dir, "documents")
    model, oov = unigram_lm(d)
    return lm_score(d, model, oov).orderBy("doc_id")


@register(
    "t14_top_bigram_fraction",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    bg AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(toks)),
                      i -> toks[i] || ' ' || toks[i+1])) AS bigram
        FROM t WHERE len(toks) >= 2
    ),
    mx AS (
        SELECT doc_id, max(c) AS top_cnt
        FROM (SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY 1, 2)
        GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(COALESCE(mx.top_cnt, 0) AS BIGINT) AS top_cnt,
           least((CASE WHEN (COALESCE(mx.top_cnt, 0) * 2) < 0 THEN -(((abs(COALESCE(mx.top_cnt, 0) * 2)::BIGINT * 1000000) // ((greatest(len(t.toks), 1))::BIGINT)) + CASE WHEN 2 * ((abs(COALESCE(mx.top_cnt, 0) * 2)::BIGINT * 1000000) % ((greatest(len(t.toks), 1))::BIGINT)) >= ((greatest(len(t.toks), 1))::BIGINT) THEN 1 ELSE 0 END) ELSE (((abs(COALESCE(mx.top_cnt, 0) * 2)::BIGINT * 1000000) // ((greatest(len(t.toks), 1))::BIGINT)) + CASE WHEN 2 * ((abs(COALESCE(mx.top_cnt, 0) * 2)::BIGINT * 1000000) % ((greatest(len(t.toks), 1))::BIGINT)) >= ((greatest(len(t.toks), 1))::BIGINT) THEN 1 ELSE 0 END) END / 1000000.0), 1.0) AS top_frac
    FROM t LEFT JOIN mx USING (doc_id)
    ORDER BY t.doc_id
    """,
    doc="Gopher top-bigram-fraction rule: tokens covered by the most "
    "frequent bigram per document. Spark side is relational data flow "
    "(explode bigrams → groupBy count → per-doc max — "
    "operators.quality.top_bigram_stats); the equivalent narrow-map "
    "expression form exists (top_bigram_*_expr) but its sorted-array "
    "fold carries a ~12 s codegen cost at sf1, so the whole-table "
    "scorer uses the plan-shaped form.",
    tags=("text", "quality", "ext"),
)
def t14(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tw_etl_spark.operators.quality import top_bigram_stats

    d = _t(spark, sf_dir, "documents")
    return top_bigram_stats(d).orderBy("doc_id")


@register(
    "t15_quality_classifier",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest({_TOKS}) AS tk FROM documents
    ), feats AS (
        SELECT doc_id,
               (('0x' || substr(md5('w:' ||
                     (('0x' || substr(md5(tk), 1, 4))::BIGINT % 1024)::VARCHAR
                   ), 1, 8))::BIGINT % 2001 - 1000) AS w_milli
        FROM toks
    ), agg AS (
        -- exact integer accumulation: order-independent sum, and the
        -- 6-digit rounding happens in INTEGER space (see
        -- functions/rounding.py) — z = s/(1000n) lands on exact
        -- decimal halves where float round() diverges cross-engine
        SELECT doc_id,
               sum(w_milli)::BIGINT AS s,
               CAST(count(*) AS BIGINT) AS n_tokens
        FROM feats GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(a.n_tokens, 0) AS n_tokens,
           coalesce({_Z6}, 0.0) + 0.0 AS z,
           round(1 / (1 + exp(-coalesce(a.s::DOUBLE
                 / (1000.0 * a.n_tokens), 0.0))), 6) + 0.0 AS score,
           coalesce({_Z6}, 0.0) >= 0 AS keep
    FROM documents d LEFT JOIN agg a USING (doc_id)
    ORDER BY d.doc_id
    """,
    doc="Model-based quality filter (the fasttext-style classifier gate "
    "of CCNet/LLaMA pipelines, Wenzek et al. 2020): hashing-trick "
    "features (md5-prefix bucket mod 1024) through a deterministic "
    "md5-derived weight table, mean-pooled, sigmoid-scored. The weight "
    "table is engine-reconstructible, so the full scorer is under the "
    "hash oracle. Spark side is a pure per-row array fold — zero "
    "shuffle, zero Python, runs at scan speed (plan-asserted in "
    "tests/test_plans.py).",
    tags=("text", "quality", "classifier", "ext"),
)
def t15(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round 14: the DataFrame form evaluates the md5 token fold once
    # per row (the 4-column form re-ran it 3x — see
    # operators/quality.py:hashed_linear_scored). Values identical.
    from tw_etl_spark.operators.quality import hashed_linear_scored

    d = _t(spark, sf_dir, "documents")
    return hashed_linear_scored(d).orderBy("doc_id")


def _bpe_training_ctes(rounds: int = 6) -> str:
    """The shared unrolled-CTE DuckDB replay of bpe_merges training:
    chained (pair-count argmax -> sentinel-string replace) rounds over
    the distinct word-frequency table; see operators/bpe.py for the
    representation argument. Emits a WITH chain defining b1..bN (each
    round's winning pair) and e0..eN (the vocab after each merge)."""
    head = f"""
    WITH w0 AS (
        SELECT w, count(*)::BIGINT AS f
        FROM (SELECT unnest({_TOKS}) AS w FROM documents)
        WHERE NOT contains(w, chr(2)) AND NOT contains(w, chr(3))
        GROUP BY w
    ),
    e0 AS (
        SELECT f, regexp_replace(w, '(.)', chr(2) || '\\1' || chr(3), 'g') AS enc
        FROM w0
    )"""
    parts = [head]
    for r in range(1, rounds + 1):
        prev = f"e{r - 1}"
        parts.append(f""",
    b{r} AS (
        SELECT pr.l AS l, pr.r AS r, sum(f)::BIGINT AS c
        FROM (
            SELECT f, unnest(list_transform(range(1, len(s)),
                                 i -> {{'l': s[i], 'r': s[i + 1]}})) AS pr
            FROM (SELECT f, string_split(substr(enc, 2, length(enc) - 2),
                                         chr(3) || chr(2)) AS s
                  FROM {prev})
        )
        GROUP BY 1, 2 ORDER BY c DESC, l, r LIMIT 1
    ),
    e{r} AS (
        SELECT f, replace(enc,
                          chr(2) || b.l || chr(3) || chr(2) || b.r || chr(3),
                          chr(2) || b.l || b.r || chr(3)) AS enc
        FROM {prev}, b{r} b
    )""")
    return "".join(parts)


def _bpe_oracle(rounds: int = 6) -> str:
    """t16: the learned merge table itself."""
    sel = "\n    UNION ALL ".join(
        f"SELECT {r} AS merge_round, l AS lhs, r AS rhs, c AS pair_count FROM b{r}"
        for r in range(1, rounds + 1)
    )
    return _bpe_training_ctes(rounds) + f"\n    {sel}\n    ORDER BY merge_round\n    "


def _bpe_encode_oracle(rounds: int = 6) -> str:
    """t17: train (same CTE chain as t16), then ENCODE every document —
    the same R-deep replace cascade the Spark side runs, applied to the
    sentinel-encoded document strings, then split back into tokens."""
    parts = [_bpe_training_ctes(rounds)]
    parts.append(f""",
    d0 AS (
        -- coalesce: DuckDB's array_to_string([]) is NULL where Spark's
        -- array_join([]) is '' — an empty/no-word document must encode
        -- to the empty string on both engines
        SELECT doc_id,
               coalesce(array_to_string(
                 list_transform(
                   list_filter({_TOKS},
                               w -> NOT contains(w, chr(2))
                                    AND NOT contains(w, chr(3))),
                   w -> regexp_replace(w, '(.)',
                                       chr(2) || '\\1' || chr(3), 'g')),
                 ' '), '') AS enc
        FROM documents
    )""")
    for r in range(1, rounds + 1):
        parts.append(f""",
    d{r} AS (
        SELECT doc_id,
               replace(enc,
                       chr(2) || b.l || chr(3) || chr(2) || b.r || chr(3),
                       chr(2) || b.l || b.r || chr(3)) AS enc
        FROM d{r - 1}, b{r} b
    )""")
    parts.append(f""",
    tok AS (
        SELECT doc_id,
               flatten(list_transform(
                 list_filter(string_split(enc, ' '), w -> w <> ''),
                 w -> string_split(substr(w, 2, length(w) - 2),
                                   chr(3) || chr(2)))) AS toks
        FROM d{rounds}
    )
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_filter(toks, t -> length(t) > 1)) AS BIGINT)
               AS n_merged,
           md5(coalesce(array_to_string(toks, ' '), '')) AS tokens_fp
    FROM tok
    ORDER BY doc_id
    """)
    return "".join(parts)


@register(
    "t16_bpe_merges",
    oracle=_bpe_oracle(6),
    doc="BPE merge training (Sennrich et al. 2016) under the FULL hash "
    "oracle — the tokenizer-training step of an LLM data pipeline as a "
    "relational iteration: the corpus collapses to its distinct "
    "word-frequency table, symbol sequences live as sentinel-delimited "
    "strings so each merge is ONE left-to-right string replace "
    "(identical non-overlapping semantics in Spark and DuckDB — 'aaa' "
    "merging (a,a) -> [aa, a]), and each round is a pair-count "
    "aggregation + 1-row argmax (count desc, then lexicographic "
    "tie-break) + a narrow-map vocabulary rewrite. The oracle unrolls "
    "the same six rounds as chained CTEs and must land on the "
    "identical merge table — pinning an ITERATIVE training algorithm, "
    "not just a one-shot query. Scale: rounds touch |vocab| rows, not "
    "the corpus; production trainers keep incremental pair deltas, "
    "this recount form is the verification twin.",
    tags=("text", "bpe", "tokenizer", "ext"),
)
def t16(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tw_etl_spark.operators.bpe import bpe_merges

    d = _t(spark, sf_dir, "documents")
    return bpe_merges(d, rounds=6).orderBy("merge_round")


@register(
    "t17_bpe_encode",
    oracle=_bpe_encode_oracle(6),
    doc="BPE ENCODE — the corpus-scale half of train->tokenize (t16 "
    "trains on the vocab; this applies the learned merge table to "
    "every document, the pass that actually touches all 100 TB). The "
    "whole document becomes one sentinel-delimited string (words "
    "joined by a space a merge pattern can never straddle), so R "
    "merges = R chained left-to-right non-overlapping string replaces "
    "— a pure narrow map at scan speed, zero shuffle beyond training's "
    "vocab-sized rounds (plan-asserted). Emits per-doc token count, "
    "merged-token count, and an md5 fingerprint of the full token "
    "sequence; the oracle retrains the identical 6 rounds and replays "
    "the identical replace cascade, pinning the end-to-end tokenizer "
    "cross-engine.",
    tags=("text", "bpe", "tokenizer", "ext"),
)
def t17(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tw_etl_spark.operators.bpe import bpe_merges, bpe_tokens_expr
    from tw_etl_spark.operators.text import let_expr

    d = _t(spark, sf_dir, "documents")
    merges = [
        (r.lhs, r.rhs)
        for r in bpe_merges(d, rounds=6).orderBy("merge_round").collect()
    ]
    toks = bpe_tokens_expr(F.col("text"), merges)
    return (
        d.select(
            "doc_id",
            let_expr(
                toks,
                lambda ts: F.struct(
                    F.size(ts).cast("long").alias("n_tokens"),
                    F.size(F.filter(ts, lambda t: F.length(t) > 1))
                    .cast("long")
                    .alias("n_merged"),
                    F.md5(F.array_join(ts, " ")).alias("tokens_fp"),
                ),
            ).alias("s"),
        )
        .select("doc_id", "s.n_tokens", "s.n_merged", "s.tokens_fp")
        .orderBy("doc_id")
    )


def _bm25_oracle(terms: tuple[str, ...], k: int = 10) -> str:
    """DuckDB replay of ``operators.text.bm25_topk`` (k1=1.2, b=0.75).

    Single source of truth for the BM25 arithmetic on the oracle side
    (the dd19 lesson: never hand-inline a second copy of a scoring
    expression — parameterize it). Every float constant is written
    exactly as the Spark plan computes it (``2.2`` == the Python double
    ``1.2 + 1.0``, asserted in tests), the operation ORDER matches the
    Spark expression left-to-right, and each (doc, term) contribution
    is rounded to integer micro units before the per-doc sum — so the
    per-doc score is an integer and the ranking hashes identically
    cross-engine.
    """
    assert len(set(terms)) == len(terms), (
        f"_bm25_oracle: duplicate query terms {sorted(terms)} — the "
        "VALUES cross-join would double-count df (bm25_topk raises too)"
    )
    values = ", ".join(f"('{t}')" for t in terms)
    return f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS} AS ts FROM documents
    ),
    stats AS (
      SELECT count(*)::DOUBLE AS n_docs, sum(len(ts))::DOUBLE AS sum_dl
      FROM toks
    ),
    matched AS (
      SELECT doc_id AS doc, len(ts)::BIGINT AS dl, q.term,
             len(list_filter(ts, t -> t = q.term))::BIGINT AS tf
      FROM toks CROSS JOIN (VALUES {values}) q(term)
      WHERE len(list_filter(ts, t -> t = q.term)) > 0
    ),
    dfreq AS (
      SELECT term, count(*)::DOUBLE AS dfq FROM matched GROUP BY term
    ),
    scored AS (
      SELECT m.doc,
             round(ln(1.0 + (s.n_docs - d.dfq + 0.5) / (d.dfq + 0.5))
                   * m.tf * 2.2
                   / (m.tf + 1.2 * (0.25 + 0.75 * m.dl
                                    / (s.sum_dl / s.n_docs)))
                   * 1e6, 0)::BIGINT AS sm
      FROM matched m JOIN dfreq d USING (term) CROSS JOIN stats s
    ),
    per_doc AS (
      SELECT doc, count(*)::BIGINT AS n_terms, sum(sm)::BIGINT AS score_micro
      FROM scored GROUP BY doc
    ),
    ranked AS (
      SELECT doc AS doc_id,
             row_number() OVER (ORDER BY score_micro DESC, doc) AS rank,
             n_terms, score_micro, score_micro / 1e6 AS score
      FROM per_doc
    )
    SELECT doc_id, rank, n_terms, score_micro, score
    FROM ranked WHERE rank <= {k} ORDER BY rank
    """


# t18's fixed query — terms drawn from the synthetic corpus vocabulary
# at three frequency bands so idf actually discriminates.
_BM25_TERMS = ("join", "broadcast", "skew")


@register(
    "t18_bm25_topk",
    oracle=_bm25_oracle(_BM25_TERMS),
    doc="Okapi BM25 ranked retrieval (Robertson & Zaragoza 2009): "
    "top-10 corpus documents for a fixed query-term set, the ranked "
    "companion to the x5/x11 membership decontamination tests (those "
    "answer 'does this benchmark string occur'; this answers 'which "
    "documents are MOST about these terms' — the soft lookup run "
    "before manual curation review). Per-(doc,term) contributions are "
    "rounded to integer micro units BEFORE the per-doc sum (the dd8p "
    "scaled-integer discipline), so the score — and therefore the "
    "RANKING — is float-summation-order-free and hash-matches DuckDB "
    "exactly. Scale shape: query terms ride as literals in one narrow "
    "map (no token-stream explode of the corpus), matched rows are "
    "|docs|x|terms| at most, df/stats are term-count-sized "
    "broadcasts, the per-doc sum is the one data-sized shuffle, and "
    "the cut is TakeOrderedAndProject (per-partition heaps).",
    tags=("text", "retrieval", "bm25", "ext"),
)
def t18(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tw_etl_spark.operators.text import bm25_topk

    d = _t(spark, sf_dir, "documents")
    return bm25_topk(d, list(_BM25_TERMS), k=10).orderBy("rank")


def _bm25_multi_oracle(queries: dict[int, list[str]], k: int = 10) -> str:
    """DuckDB replay of ``operators.text.bm25_topk_multiquery`` —
    the SAME per-(doc,term) arithmetic as :func:`_bm25_oracle` (one
    parameterized scoring expression, the dd19 lesson), lifted to a
    (query_id, term) VALUES table: df per DISTINCT term, contributions
    fanned to the queries containing the term, per-(query, doc) BIGINT
    sums, per-query rank windows."""
    for qid, terms in queries.items():
        assert len(set(terms)) == len(terms), (
            f"_bm25_multi_oracle: duplicate terms in query {qid} — the "
            "VALUES join would double-count (the operator raises too)"
        )
    qt_values = ", ".join(
        f"({int(qid)}, '{t}')"
        for qid, terms in sorted(queries.items())
        for t in terms
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS} AS ts FROM documents
    ),
    stats AS (
      SELECT count(*)::DOUBLE AS n_docs, sum(len(ts))::DOUBLE AS sum_dl
      FROM toks
    ),
    qt(query_id, term) AS (VALUES {qt_values}),
    terms AS (SELECT DISTINCT term FROM qt),
    matched AS (
      SELECT doc_id AS doc, len(ts)::BIGINT AS dl, q.term,
             len(list_filter(ts, t -> t = q.term))::BIGINT AS tf
      FROM toks CROSS JOIN terms q
      WHERE len(list_filter(ts, t -> t = q.term)) > 0
    ),
    dfreq AS (
      SELECT term, count(*)::DOUBLE AS dfq FROM matched GROUP BY term
    ),
    contrib AS (
      SELECT qt.query_id::BIGINT AS query_id, m.doc,
             round(ln(1.0 + (s.n_docs - d.dfq + 0.5) / (d.dfq + 0.5))
                   * m.tf * 2.2
                   / (m.tf + 1.2 * (0.25 + 0.75 * m.dl
                                    / (s.sum_dl / s.n_docs)))
                   * 1e6, 0)::BIGINT AS sm
      FROM matched m JOIN dfreq d USING (term) JOIN qt USING (term)
      CROSS JOIN stats s
    ),
    per_doc AS (
      SELECT query_id, doc, count(*)::BIGINT AS n_terms,
             sum(sm)::BIGINT AS score_micro
      FROM contrib GROUP BY query_id, doc
    ),
    ranked AS (
      SELECT query_id, doc AS doc_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score_micro DESC, doc) AS rank,
             n_terms, score_micro, score_micro / 1e6 AS score
      FROM per_doc
    )
    SELECT query_id, doc_id, rank, n_terms, score_micro, score
    FROM ranked WHERE rank <= {k} ORDER BY query_id, rank
    """


# t19's fixed query BATCH — query 0 is t18's exact term set (a parity
# anchor: its rows must equal t18's with a query_id column); 1 mixes
# the corpus-rare 'dup' (high idf) with common terms; 2/3 vary length;
# 4 is all-absent (zero rows for that query by definition).
_T19_QUERIES: dict[int, list[str]] = {
    0: ["join", "broadcast", "skew"],
    1: ["dup", "scan", "filter"],
    2: ["sort", "merge", "spill"],
    3: ["window", "agg", "stream", "key"],
    4: ["zzz_absent"],
}


@register(
    "t19_bm25_multiquery",
    oracle=_bm25_multi_oracle(_T19_QUERIES, k=10),
    doc="Batch-of-queries BM25 lexical retrieval (VERDICT r13 missing "
    "#1): one bounded (query_id, term) table scored against the corpus "
    "in TWO scans total — t18's information floor, now amortized over "
    "ALL queries instead of paid per term set. Pass 1 reduces the "
    "corpus to T+2 numbers (n_docs, sum_dl, df per distinct term) in "
    "one aggregate; pass 2 explodes each doc's MATCHED DISTINCT terms "
    "only (fan-out <= T, zero for non-matching docs — never the token "
    "stream), joins the broadcast query table (output-sized work), and "
    "cuts per-query top-10 windows. Same micro-rounded integer "
    "arithmetic as t18, so every per-query ranking hash-matches the "
    "relational replay; query 0 IS t18's term set (parity anchor), "
    "query 4 is all-absent (zero rows).",
    tags=("text", "retrieval", "bm25", "ext"),
)
def t19(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tw_etl_spark.operators.text import bm25_topk_multiquery

    d = _t(spark, sf_dir, "documents")
    return bm25_topk_multiquery(d, _T19_QUERIES, k=10).orderBy(
        "query_id", "rank"
    )
