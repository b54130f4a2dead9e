"""Text-analysis operators [EXT]: tokenization, language-ID, quality
scoring, token counting, fingerprinting (SURVEY.md §2.2).

Everything here is built from JVM-side expressions (split /
regexp_extract_all / higher-order functions) — no Python UDFs in any
hot path, so the whole stage stays inside whole-stage codegen and
scales linearly with input splits. Language profiles are plain token
sets; scoring is token-overlap density (the classic stopword-profile
n-gram heuristic, here over the corpus vocabulary).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Whitespace tokens vs "BPE-ish" maximal runs of letters/digits.
BPE_TOKEN_RE = "[a-z]+|[A-Z]+|[0-9]+"

# Per-language marker-token profiles over the corpus vocabulary.
# The operator is the interesting part (profile-overlap argmax); the
# profiles themselves are data-dependent configuration.
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "a", "table", "join", "query"],
    "de": ["scan", "row", "group", "batch"],
    "es": ["fast", "slow", "small", "big"],
    "fr": ["key", "value", "hash", "merge"],
    "zh": ["stream", "window", "vector", "spark"],
}


def let_expr(value: Column, body) -> Column:
    """Bind ``value`` once and reference it cheaply through a lambda
    variable (transform-over-singleton — Spark SQL has no LET form).

    Without this, a large sub-expression referenced N times is inlined
    N times into the plan: whole-stage-codegen source grows
    multiplicatively and janino COMPILE time dominates — t7's trigram
    tree (tokens inlined ~9x inside the trigram lambda, the whole
    trigram array inlined 3x in the ratio) took ~150 s to compile at
    sf1 vs 3 s let-bound, with identical ~40 ms execution. Lambda
    variables are bound references, evaluated once per row by
    construction, and stay fully inside codegen.
    """
    return F.element_at(F.transform(F.array(value), body), 1)


def tokens_expr(text: Column) -> Column:
    """Whitespace tokenization with empty-token cleanup."""
    return F.filter(F.split(text, " "), lambda t: t != "")


def token_count_expr(text: Column) -> Column:
    return F.size(tokens_expr(text)).cast("bigint")


def bpe_token_count_expr(text: Column) -> Column:
    """Count of regex-defined subword-ish tokens (letters/digit runs)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), 0)).cast("bigint")


def profile_hits_expr(toks: Column, profile: list[str]) -> Column:
    """How many tokens (with multiplicity) fall in the profile set."""
    lit_set = F.array(*[F.lit(w) for w in profile])
    return F.size(F.filter(toks, lambda t: F.array_contains(lit_set, t)))


def lang_scores(toks: Column) -> dict[str, Column]:
    n = F.greatest(F.size(toks), F.lit(1))
    return {
        lang: (profile_hits_expr(toks, prof) / n)
        for lang, prof in LANG_PROFILES.items()
    }


def lang_id_expr(toks: Column) -> Column:
    """argmax over profile densities; fixed priority order breaks ties
    deterministically. Both the token array and the score vector are
    let-bound: the naive form inlines `best` (which contains every
    score tree, each containing the tokenization) into every WHEN arm —
    a multiplicative codegen blowup (see ``let_expr``)."""
    langs = list(LANG_PROFILES)

    def pick(t: Column) -> Column:
        def choose(scores: Column) -> Column:
            best = F.array_max(scores)
            expr = F.lit("und")
            # reversed: first profile in LANG_PROFILES wins ties
            for i in reversed(range(len(langs))):
                expr = F.when(
                    F.element_at(scores, i + 1) == best, langs[i]
                ).otherwise(expr)
            return expr

        score_map = lang_scores(t)
        return let_expr(F.array(*[score_map[lang] for lang in langs]), choose)

    return let_expr(toks, pick)


def quality_score_expr(text: Column, n_chars: Column) -> Column:
    """Composite quality score: lexical diversity + length saturation +
    mean token length, each clamped to [0,1]. Deterministic arithmetic
    only, so it is oracle-verifiable."""
    def score(toks: Column) -> Column:
        n_tok = F.size(toks).cast("double")
        diversity = F.size(F.array_distinct(toks)) / F.greatest(n_tok, F.lit(1.0))
        length_sat = F.least(n_tok / F.lit(80.0), F.lit(1.0))
        avg_len = (n_chars.cast("double") / F.greatest(n_tok, F.lit(1.0))) / F.lit(6.0)
        return F.round(
            0.4 * diversity + 0.3 * length_sat + 0.3 * F.least(avg_len, F.lit(1.0)), 6
        )

    return let_expr(tokens_expr(text), score)


def fingerprint_expr(text: Column) -> Column:
    """Key-collision fingerprint: md5 of the sorted distinct token set.
    Collapses token-order/multiplicity variants into one cluster key —
    the light-weight near-dup primitive (one narrow hash column to
    shuffle at 100 TB, not the document text)."""
    canon = F.array_join(F.array_sort(F.array_distinct(tokens_expr(text))), " ")
    return F.md5(canon.cast("binary"))


def rolling_hash_expr(text: Column, base: int = 31, mod: int = 1_000_000_007) -> Column:
    """Polynomial rolling hash over whitespace tokens (token-level
    Rabin-Karp). Uses crc32 as the per-token integer so the fold stays
    in 64-bit range under the modulus."""
    return F.aggregate(
        tokens_expr(text),
        F.lit(0).cast("long"),
        lambda acc, t: (acc * base + F.crc32(t.cast("binary"))) % mod,
    )


def rolling_hash_portable_expr(
    text: Column, base: int = 31, mod: int = 1_000_000_007
) -> Column:
    """Portable twin of :func:`rolling_hash_expr`: the per-token integer
    is the first 8 md5 hex chars as uint32 (reconstructible in DuckDB as
    ``('0x'||substr(md5(t),1,8))::BIGINT``), so the whole Rabin-Karp
    fold — seed 0, left-to-right, ``(acc*base + h) % mod`` — is
    replayed verbatim by the t6p oracle via ``list_reduce``. Same
    narrow-map scale shape; crc32 (t6) stays the cheaper engine tier."""
    return F.aggregate(
        tokens_expr(text),
        F.lit(0).cast("long"),
        lambda acc, t: (
            acc * base + F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")
        )
        % mod,
    )


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the standard per-document text-analysis columns. The
    token array is materialized once as a temp column — four sibling
    columns reference it, and ``let_expr`` can't span siblings."""
    toks = F.col("__ts_toks")
    return (
        df.withColumn("__ts_toks", tokens_expr(F.col(text_col)))
        .withColumn("n_tokens", F.size(toks).cast("bigint"))
        .withColumn("n_distinct_tokens", F.size(F.array_distinct(toks)).cast("bigint"))
        .withColumn("n_bpe_tokens", bpe_token_count_expr(F.col(text_col)))
        .withColumn("lang_pred", lang_id_expr(toks))
        .withColumn("fingerprint", fingerprint_expr(F.col(text_col)))
        .drop("__ts_toks")
    )


def remove_stopwords_expr(toks: Column, stopwords: list[str]) -> Column:
    """Drop stopword tokens from a token array (JVM-side higher-order
    filter; the stopword list is a literal array, so it ships inside the
    serialized plan — no join, no UDF)."""
    lit_set = F.array(*[F.lit(w) for w in stopwords])
    return F.filter(toks, lambda t: ~F.array_contains(lit_set, t))


def tf_idf(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    stopwords: list[str] | None = None,
) -> DataFrame:
    """Per-(doc, token) TF-IDF over a corpus: smooth-idf variant
    ``tf * (ln((N+1)/(df+1)) + 1)`` (the scikit-learn formula), tf = raw
    in-doc term count.

    Returns (doc, tk, tf, tfidf). Scale shape: one explode -> two
    map-side-combinable aggregations (term counts per doc; document
    frequency per token) -> the per-token idf table joins back
    broadcast (the aggregated vocabulary is tiny next to the corpus —
    one row per distinct token, not per occurrence); corpus size N is a
    1-row broadcast cross join, so the whole plan has exactly one wide
    shuffle (the explode->groupBy) regardless of corpus size.
    """
    toks = tokens_expr(F.col(text_col))
    if stopwords:
        toks = remove_stopwords_expr(toks, stopwords)
    ex = df.select(F.col(id_col).alias("doc"), F.explode(toks).alias("tk"))
    tf = ex.groupBy("doc", "tk").agg(F.count(F.lit(1)).cast("double").alias("tf"))
    dfreq = ex.groupBy("tk").agg(
        F.count_distinct("doc").cast("double").alias("dfq")
    )
    n_docs = df.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    idf = F.log((F.col("n_docs") + 1) / (F.col("dfq") + 1)) + 1
    return (
        tf.join(F.broadcast(dfreq), "tk")
        .crossJoin(F.broadcast(n_docs))
        .select("doc", "tk", "tf", (F.col("tf") * idf).alias("tfidf"))
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 ranked retrieval (Robertson & Zaragoza 2009) of the
    top-``k`` corpus documents for a fixed query-term set — the ranked
    companion to the trigram membership tests the decontamination
    family uses (x5/x11 answer "does a benchmark string occur"; this
    answers "which documents are MOST about these terms", the soft
    lookup a curation pipeline runs before manual review).

    Per matched (doc, term):
    ``idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))`` with the
    BM25+-style non-negative ``idf(t) = ln(1 + (N - df + 0.5) /
    (df + 0.5))``. Each term's contribution is rounded to MICRO units
    (round-6) and summed as a BIGINT, so the per-doc score is an
    integer sum of identically-computed terms — immune to float
    summation order on any engine (the dd8p scaled-integer
    discipline), which is what puts the ranking itself under the
    cross-engine hash oracle (t18).

    Scale shape — TWO corpus passes, the information floor for exact
    BM25 (scores depend on corpus-global stats), and NOTHING else:
    pass 1 is one map-side-combinable global aggregate collecting a
    single 1-row stats vector (n_docs, Σdl, and df per query term —
    T+2 numbers, a bounded driver collect); pass 2 re-scans with the
    stats riding as LITERALS (the dd8p centroids-as-literals pattern),
    so scoring is a pure narrow map — zero joins, zero explode, zero
    data-sized shuffle — ending in TakeOrderedAndProject
    (per-partition heaps). The ``ln`` stays JVM-side (``F.log`` over a
    literal ratio, constant-folded by Catalyst with the same
    ``Math.log`` the runtime would use), so the arithmetic is
    bit-identical to an all-relational formulation and to the DuckDB
    replay. Query terms ride as literals inside one filter-count
    expression per term — the corpus scan never explodes its token
    stream. Returns (doc_id, rank, n_terms, score_micro, score) with
    rank-stable (score desc, id asc) ordering applied by the top-k
    cut.
    """
    from pyspark.sql import types as T
    from pyspark.sql.window import Window

    # Duplicate terms are a contract violation, not a soft case: this
    # side scores each DISTINCT tf_i column once, but the relational
    # replay's VALUES cross-join would match a duplicated term twice
    # (inflating dfq and n_terms) — silent divergence. Fail loudly.
    if len(set(query_terms)) != len(query_terms):
        dupes = sorted({t for t in query_terms if query_terms.count(t) > 1})
        raise ValueError(f"bm25_topk: duplicate query terms {dupes}")

    out_schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField("rank", T.LongType()),
            T.StructField("n_terms", T.LongType()),
            T.StructField("score_micro", T.LongType()),
            T.StructField("score", T.DoubleType()),
        ]
    )

    def _tf(term: str) -> Column:
        # NB: a bound-default lambda would have arity 2, which F.filter
        # interprets as (element, INDEX) — close over the term instead
        return F.size(
            F.filter(F.col("__bm_toks"), lambda x: x == F.lit(term))
        ).cast("long")

    base = df.withColumn("__bm_toks", tokens_expr(F.col(text_col))).select(
        F.col(id_col).alias("doc"),
        F.size("__bm_toks").cast("long").alias("dl"),
        *[_tf(t).alias(f"tf_{i}") for i, t in enumerate(query_terms)],
    )

    # pass 1: the whole corpus reduces to T+2 doubles (bounded collect)
    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.sum("dl").cast("double").alias("sum_dl"),
        *[
            F.sum(F.when(F.col(f"tf_{i}") > 0, 1).otherwise(0))
            .cast("double")
            .alias(f"dfq_{i}")
            for i in range(len(query_terms))
        ],
    ).first()
    n_docs, sum_dl = stats["n_docs"], stats["sum_dl"]
    if not n_docs or not sum_dl:
        # empty corpus / no tokens anywhere -> no matches by definition
        return df.sparkSession.createDataFrame([], out_schema)
    avgdl = sum_dl / n_docs

    # pass 2: stats ride as literals; per-term contribution
    # idf * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl)), micro-rounded.
    # tf = 0 contributes exactly round(0.0) = 0, so the per-doc score is
    # a plain sum; docs matching no term are dropped by n_terms > 0.
    sm_terms, nt_terms = [], []
    for i in range(len(query_terms)):
        dfq = stats[f"dfq_{i}"]
        if not dfq:
            continue  # term absent from the corpus: no contributions
        idf = F.log(F.lit(1.0 + (n_docs - dfq + 0.5) / (dfq + 0.5)))
        tf = F.col(f"tf_{i}")
        denom = tf + F.lit(k1) * (
            F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl)
        )
        sm_terms.append(
            F.round(idf * tf * F.lit(k1 + 1.0) / denom * 1e6, 0).cast("long")
        )
        nt_terms.append(F.when(tf > 0, 1).otherwise(0))
    if not sm_terms:
        return df.sparkSession.createDataFrame([], out_schema)

    add = lambda xs: xs[0] if len(xs) == 1 else xs[0] + add(xs[1:])
    per_doc = base.select(
        "doc",
        add(nt_terms).cast("bigint").alias("n_terms"),
        add(sm_terms).cast("bigint").alias("score_micro"),
    ).filter(F.col("n_terms") > 0)

    # top-k FIRST (orderBy+limit compiles to TakeOrderedAndProject —
    # distributed per-partition heaps, never a global single-task
    # sort), THEN rank via an unpartitioned window over just k rows
    w = Window.orderBy(F.desc("score_micro"), F.col("doc"))
    return (
        per_doc.orderBy(F.desc("score_micro"), F.col("doc"))
        .limit(k)
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .select(
            F.col("doc").alias(id_col),
            "rank",
            "n_terms",
            "score_micro",
            (F.col("score_micro") / 1e6).alias("score"),
        )
    )


def bm25_topk_multiquery(
    df: DataFrame,
    queries: dict[int, list[str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 over a QUERY TABLE — the batch-of-queries lexical
    retriever :func:`bm25_topk` cannot express (VERDICT r13 missing
    #1): t18's plan carries one literal tf column per term, which
    degrades past a few dozen terms and can only ever serve ONE term
    set; a RAG/eval harness scores hundreds of queries per corpus
    pass. ``queries`` is a bounded driver-side mapping
    ``query_id -> [terms]`` (the broadcast-small contract — query
    tables are KBs while the corpus is TBs).

    Same arithmetic as :func:`bm25_topk` (identical float op order,
    per-(doc,term) micro-rounding before the per-(doc,query) BIGINT
    sum — so the per-query rankings stay cross-engine hash-exact),
    different plan shape:

    - **pass 1 (stats)** — ONE corpus scan reducing to T+2 numbers
      (n_docs, Σdl, df per DISTINCT term): the matched-term array
      ``array_intersect(array_distinct(toks), terms)`` is a narrow
      map, and df per term is a ``sum(array_contains(...))`` column
      of the same single aggregate. Bounded 1-row collect.
    - **pass 2 (scoring)** — the corpus re-scans ONCE; each doc
      explodes its matched DISTINCT terms only (fan-out ≤ T per doc
      and 0 for non-matching docs — never the token stream), computes
      tf per matched term inside the same narrow map (nested HOF, no
      second tokenization), then joins the BROADCAST (query_id, term,
      idf) table — the only place queries meet the corpus, fanning
      each matched (doc, term) to exactly the queries containing the
      term, i.e. output-sized work. Per-(query, doc) integer sum, then
      a per-query top-k window over score-bearing rows only.

    idf is computed by the SAME JVM ``Math.log`` the single-query plan
    constant-folds with (an ``F.log`` column over the broadcast table),
    keeping t19's scores bit-identical to T separate t18 runs. Terms
    must be unique per query (loud error — the df replay would
    double-count duplicates). Returns (query_id, id_col, rank,
    n_terms, score_micro, score).
    """
    from pyspark.sql import types as T
    from pyspark.sql.window import Window

    for qid, terms in queries.items():
        if len(set(terms)) != len(terms):
            dupes = sorted({t for t in terms if terms.count(t) > 1})
            raise ValueError(
                f"bm25_topk_multiquery: duplicate terms {dupes} in query {qid}"
            )
    all_terms = sorted({t for ts in queries.values() for t in ts})

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField("rank", T.LongType()),
            T.StructField("n_terms", T.LongType()),
            T.StructField("score_micro", T.LongType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    if not all_terms:
        return df.sparkSession.createDataFrame([], out_schema)

    terms_lit = F.array(*[F.lit(t) for t in all_terms])
    base = df.withColumn("__bm_toks", tokens_expr(F.col(text_col))).select(
        F.col(id_col).alias("doc"),
        F.size("__bm_toks").cast("long").alias("dl"),
        F.col("__bm_toks"),
        F.array_intersect(F.array_distinct("__bm_toks"), terms_lit).alias(
            "__bm_matched"
        ),
    )

    # pass 1: the whole corpus reduces to T+2 doubles (bounded collect)
    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.sum("dl").cast("double").alias("sum_dl"),
        *[
            F.sum(F.array_contains("__bm_matched", t).cast("long"))
            .cast("double")
            .alias(f"dfq_{i}")
            for i, t in enumerate(all_terms)
        ],
    ).first()
    n_docs, sum_dl = stats["n_docs"], stats["sum_dl"]
    if not n_docs or not sum_dl:
        return df.sparkSession.createDataFrame([], out_schema)
    avgdl = sum_dl / n_docs
    dfq_by_term = {
        t: stats[f"dfq_{i}"] for i, t in enumerate(all_terms) if stats[f"dfq_{i}"]
    }

    # the bounded (query_id, term, dfq) table; idf computed JVM-side so
    # the log is the same Math.log t18's constant folding uses. Terms
    # absent from the corpus contribute nothing in BOTH engines (the
    # relational replay's dfreq join drops them) — exclude up front.
    qt_rows = [
        (int(qid), t, float(dfq_by_term[t]))
        for qid, ts in sorted(queries.items())
        for t in ts
        if t in dfq_by_term
    ]
    if not qt_rows:
        return df.sparkSession.createDataFrame([], out_schema)
    qt = df.sparkSession.createDataFrame(
        qt_rows,
        T.StructType(
            [
                T.StructField("query_id", T.LongType()),
                T.StructField("term", T.StringType()),
                T.StructField("dfq", T.DoubleType()),
            ]
        ),
    ).select(
        "query_id",
        "term",
        F.log(
            F.lit(1.0)
            + (F.lit(n_docs) - F.col("dfq") + F.lit(0.5))
            / (F.col("dfq") + F.lit(0.5))
        ).alias("idf"),
    )

    # pass 2: explode MATCHED DISTINCT terms only (never the token
    # stream); tf per matched term inside the same narrow map
    matched = base.select(
        "doc",
        "dl",
        F.explode(
            F.transform(
                F.col("__bm_matched"),
                lambda t: F.struct(
                    t.alias("term"),
                    F.size(
                        F.filter(F.col("__bm_toks"), lambda x: x == t)
                    )
                    .cast("long")
                    .alias("tf"),
                ),
            )
        ).alias("m"),
    ).select("doc", "dl", "m.term", "m.tf")

    tf = F.col("tf")
    denom = tf + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl)
    )
    sm = F.round(F.col("idf") * tf * F.lit(k1 + 1.0) / denom * 1e6, 0).cast(
        "long"
    )
    per = (
        matched.join(F.broadcast(qt), "term")
        .select("query_id", "doc", sm.alias("sm"))
        .groupBy("query_id", "doc")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms"),
            F.sum("sm").cast("long").alias("score_micro"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score_micro"), F.col("doc"))
    return (
        per.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("doc").alias(id_col),
            "rank",
            "n_terms",
            "score_micro",
            (F.col("score_micro") / 1e6).alias("score"),
        )
    )


def ngrams_expr(toks: Column, n: int) -> Column:
    """Token n-grams as space-joined strings (empty array when <n
    tokens). Pure higher-order functions — never leaves the scan stage.
    ``toks`` is let-bound: it is referenced n+2 times here, and callers
    routinely pass a whole tokenization expression."""
    return let_expr(
        toks,
        lambda t: F.when(
            F.size(t) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(t) - (n - 1)),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(t, i + j) for j in range(n)]
                ),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )


def trigrams_expr(toks: Column) -> Column:
    """Token trigrams as strings (empty array when <3 tokens)."""
    return ngrams_expr(toks, 3)


def repetition_ratio_expr(text: Column) -> Column:
    """Fraction of repeated token trigrams: 1 - distinct/total (0 for
    short docs). The repeated-n-gram quality rule used by large-corpus
    curation pipelines: high ratio flags boilerplate/spam/looping text.
    Pure JVM higher-order functions — no UDF in the scan path."""
    return let_expr(
        trigrams_expr(tokens_expr(text)),
        lambda tri: F.when(
            F.size(tri) > 0,
            F.lit(1.0) - F.size(F.array_distinct(tri)) / F.size(tri).cast("double"),
        ).otherwise(F.lit(0.0)),
    )


def token_entropy_expr(text: Column) -> Column:
    """Shannon entropy (nats) of the per-document token frequency
    distribution — low entropy flags degenerate/looping text that the
    distinct-trigram rule (repetition_ratio_expr) can miss (e.g. "a b
    a b a b ..." has high trigram diversity=0 but entropy ~0.69 vs a
    normal doc's 3+). Pure higher-order functions; O(unique·total)
    comparisons per doc, all inside codegen."""
    def entropy(toks: Column) -> Column:
        n = F.size(toks).cast("double")
        probs = F.transform(
            F.array_distinct(toks),
            lambda d: F.size(F.filter(toks, lambda t: t == d)) / n,
        )
        return F.when(
            n > 0,
            -F.aggregate(probs, F.lit(0.0), lambda acc, p: acc + p * F.log(p)),
        ).otherwise(F.lit(0.0))

    # let-bound: ``toks`` is referenced once per DISTINCT token by the
    # probability transform — inlining the split there multiplies the
    # codegen source by the vocabulary size.
    return let_expr(tokens_expr(text), entropy)


# Dialect-portable PII patterns (same semantics in Java regex and RE2):
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def redact_pii_expr(text: Column) -> Column:
    """Chained regexp_replace redaction of emails, phone numbers, and
    IPv4 literals — the standard pre-training scrub. Entirely JVM-side;
    at 100 TB this is a map-only pass fused into the scan stage."""
    out = text
    for pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 200,
    stride: int = 150,
) -> DataFrame:
    """Split each document into fixed-width character chunks with
    ``size - stride`` characters of overlap (training-context windowing
    for LLM data prep).

    Pure JVM-side expressions: the chunk-start array is
    ``sequence(1, length, stride)`` and each chunk is a ``substring``
    — one generate + explode inside the scan stage, no shuffle, no
    Python. Output rows: (id, chunk_id, chunk_start, chunk_text).
    Empty documents yield one empty chunk so no document silently
    disappears from the corpus.
    """
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")
    starts = F.sequence(
        F.lit(1), F.greatest(F.length(F.col(text_col)), F.lit(1)), F.lit(stride)
    )
    return df.select(
        F.col(id_col),
        F.explode(starts).alias("chunk_start"),
        F.col(text_col),
    ).select(
        id_col,
        ((F.col("chunk_start") - 1) / stride).cast("bigint").alias("chunk_id"),
        "chunk_start",
        F.substring(F.col(text_col), F.col("chunk_start"), F.lit(size)).alias(
            "chunk_text"
        ),
    )


def unigram_lm(
    ref_df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 50_000,
    smoothing_k: float = 0.5,
) -> tuple[DataFrame, float]:
    """Train an add-k-smoothed unigram language model from a reference
    corpus: one explode + count aggregate, vocabulary capped at the
    ``vocab_size`` most frequent tokens. Returns (model df of
    (token, logprob), oov_logprob).

    This is the CCNet-style quality signal (Wenzek et al. 2020): score
    documents by LM likelihood under a clean reference corpus and gate
    on the score. The unigram tier keeps the whole model a (token,
    logprob) table — broadcastable at any realistic vocabulary."""
    toks = ref_df.select(F.explode(tokens_expr(F.col(text_col))).alias("token"))
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    top = counts.orderBy(F.desc("c"), "token").limit(vocab_size)
    total_row = top.agg(F.sum("c"), F.count(F.lit(1))).first()
    total, v = int(total_row[0]), int(total_row[1])
    denom = total + smoothing_k * (v + 1)  # +1: one shared OOV bucket
    model = top.select(
        "token", F.log((F.col("c") + F.lit(smoothing_k)) / F.lit(denom)).alias("logprob")
    )
    import math

    oov_logprob = math.log(smoothing_k / denom)
    return model, oov_logprob


def lm_score(
    docs: DataFrame,
    model: DataFrame,
    oov_logprob: float,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Mean token logprob per document under a unigram model (higher =
    more reference-like; gate with a threshold as in CCNet head/middle/
    tail buckets).

    100 TB shape: explode tokens, BROADCAST-join the (token, logprob)
    model (vocab-bounded), re-aggregate per document — the only shuffle
    is the per-document mean, hash-partitioned on ``id_col``; the model
    never shuffles."""
    exploded = docs.select(
        F.col(id_col), F.explode(tokens_expr(F.col(text_col))).alias("token")
    )
    joined = exploded.join(F.broadcast(model), "token", "left")
    return (
        joined.groupBy(id_col)
        .agg(
            F.round(F.avg(F.coalesce("logprob", F.lit(oov_logprob))), 6).alias(
                "avg_logprob"
            ),
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        )
    )
