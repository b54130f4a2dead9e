"""Document-quality filter batteries [EXT]: the Gopher rules and
C4-style line cleaning, as pure JVM expressions.

Both filter sets are from public literature — the Gopher quality
heuristics (Rae et al. 2021, "Scaling Language Models", table A1) and
the C4 cleaning pipeline (Raffel et al. 2020, "Exploring the Limits of
Transfer Learning", §2.2). They are the standard pre-training corpus
gates; at 100 TB they must run as expression-only narrow maps — no
Python per row, no shuffle — which is exactly how both are built here
(split / filter / transform / aggregate higher-order functions, all
inside whole-stage codegen).

Thresholds are parameterized with the published defaults. The module
also carries the two rules beyond the per-document battery: Gopher's
top-bigram fraction (``top_bigram_fraction_expr`` — still a narrow map,
a run-length fold over the sorted bigram array) and C4's corpus-level
three-sentence-span dedup (``dedup_sentence_spans`` — the one rule that
genuinely shuffles, on span hashes only).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tw_etl_spark.functions.vectors import long_array_lit
from tw_etl_spark.operators.text import let_expr, tokens_expr

# A compact English stopword set for the "≥ N distinct stopwords" rule
# (Gopher uses a similar small must-occur list).
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def _lines_expr(text: Column) -> Column:
    return F.filter(
        F.transform(F.split(text, "\n"), lambda l: F.trim(l)), lambda l: l != ""
    )


def gopher_flags(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_distinct_stopwords: int = 2,
    max_dup_line_frac: float = 0.3,
) -> DataFrame:
    """Attach the Gopher rule battery as one boolean column per rule
    plus a conjunction ``gopher_keep``.

    Every rule is a deterministic arithmetic expression over the
    document alone (narrow map — no shuffle), so the whole battery is
    DuckDB-oracle-verifiable. Defaults are the published Gopher
    thresholds where the paper states one.

    The token/line arrays are materialized as temp columns (dropped at
    the end) rather than repeated inline: ten rules each referencing
    the tokenization would otherwise inline the split ten times into
    one projection's generated code (see ``text.let_expr``, which can't
    span sibling columns).
    """
    df = df.withColumn("__g_toks", tokens_expr(F.col(text_col))).withColumn(
        "__g_lines", _lines_expr(F.col(text_col))
    )
    toks = F.col("__g_toks")
    lines = F.col("__g_lines")
    n_words = F.size(toks).cast("double")
    n_lines = F.greatest(F.size(lines), F.lit(1)).cast("double")
    safe_words = F.greatest(n_words, F.lit(1.0))

    mean_word_len = (
        F.aggregate(toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t))
        .cast("double")
        / safe_words
    )
    symbol_ratio = (
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"(#|\.\.\.|…)"), 0)).cast("double")
        / safe_words
    )
    bullet_frac = (
        F.size(F.filter(lines, lambda l: l.rlike(r"^[-*•]"))).cast("double") / n_lines
    )
    ellipsis_frac = (
        F.size(F.filter(lines, lambda l: l.rlike(r"(\.\.\.|…)$"))).cast("double")
        / n_lines
    )
    alpha_frac = (
        F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]"))).cast("double") / safe_words
    )
    stop_lit = F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])
    n_stop = F.size(
        F.array_intersect(F.transform(F.array_distinct(toks), F.lower), stop_lit)
    )
    dup_line_frac = F.lit(1.0) - F.size(F.array_distinct(lines)).cast("double") / n_lines

    out = (
        df.withColumn("g_n_words", n_words.cast("bigint"))
        .withColumn("g_mean_word_len", F.round(mean_word_len, 6))
        .withColumn("g_word_count_ok", (n_words >= min_words) & (n_words <= max_words))
        .withColumn(
            "g_word_len_ok",
            (mean_word_len >= min_mean_word_len) & (mean_word_len <= max_mean_word_len),
        )
        .withColumn("g_symbol_ok", symbol_ratio <= max_symbol_word_ratio)
        .withColumn("g_bullet_ok", bullet_frac <= max_bullet_line_frac)
        .withColumn("g_ellipsis_ok", ellipsis_frac <= max_ellipsis_line_frac)
        .withColumn("g_alpha_ok", alpha_frac >= min_alpha_word_frac)
        .withColumn("g_stopword_ok", n_stop >= min_distinct_stopwords)
        .withColumn("g_dup_line_ok", dup_line_frac <= max_dup_line_frac)
    )
    keep = (
        F.col("g_word_count_ok")
        & F.col("g_word_len_ok")
        & F.col("g_symbol_ok")
        & F.col("g_bullet_ok")
        & F.col("g_ellipsis_ok")
        & F.col("g_alpha_ok")
        & F.col("g_stopword_ok")
        & F.col("g_dup_line_ok")
    )
    return out.withColumn("gopher_keep", keep).drop("__g_toks", "__g_lines")


def c4_clean(
    df: DataFrame,
    text_col: str = "text",
    min_line_words: int = 5,
    min_kept_lines: int = 3,
) -> DataFrame:
    """C4-style line-level cleanup: keep only lines that end in terminal
    punctuation AND have ≥ ``min_line_words`` words; drop documents with
    fewer than ``min_kept_lines`` surviving lines, a curly brace (code),
    or the string "lorem ipsum". Adds:

    - ``c4_text``   — the cleaned text (kept lines re-joined)
    - ``c4_n_lines``— surviving line count
    - ``c4_keep``   — document-level keep flag

    Narrow map only — the line splitting, filtering, and re-joining all
    happen inside one projection.
    """
    lines = _lines_expr(F.col(text_col))
    kept = F.filter(
        lines,
        lambda l: l.rlike("[.!?\"']$")
        & (F.size(F.filter(F.split(l, " "), lambda t: t != "")) >= min_line_words),
    )
    out = (
        df.withColumn("c4_text", F.array_join(kept, "\n"))
        .withColumn("c4_n_lines", F.size(kept).cast("bigint"))
    )
    doc_ok = (
        (F.col("c4_n_lines") >= min_kept_lines)
        & ~F.col(text_col).contains("{")
        & ~F.lower(F.col(text_col)).contains("lorem ipsum")
    )
    return out.withColumn("c4_keep", doc_ok)


# ------------------------------------------------------- C4 span dedup

SENTENCE_SPLIT_RE = r"(?<=[.!?])\s+"


def sentences_expr(text: Column) -> Column:
    """Regex sentence segmentation (C4's heuristic: split after
    terminal punctuation + whitespace), empty fragments dropped."""
    return F.filter(
        F.transform(F.split(text, SENTENCE_SPLIT_RE), lambda s: F.trim(s)),
        lambda s: s != "",
    )


def dedup_sentence_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span: int = 3,
    out_col: str = "deduped_text",
) -> DataFrame:
    """C4's corpus-level dedup rule (Raffel et al. 2020 §2.2): any
    ``span``-sentence window that occurs more than once in the corpus is
    kept ONCE (first occurrence by (id, position)) and removed everywhere
    else. A losing occurrence removes its ``span`` sentences; the
    document text is rebuilt from the surviving sentences.

    Scale shape: sentences explode to spans (fan-out ×span), the only
    wide stages are the min-winner aggregation on span hash and the
    per-doc regroup — both hash shuffles on narrow (hash, id, idx) rows;
    span text never shuffles (md5 only). Docs with fewer than ``span``
    sentences pass through untouched.

    EAGER: calling this function launches a Spark job immediately (the
    narrow span table is ``localCheckpoint``-materialized so the winner
    aggregation and the loser join don't each re-run the sentence-split
    + md5 explode); batch DataFrames only — a streaming input raises
    AnalysisException at the checkpoint.
    """
    sents = F.col("__sents")
    with_sents = df.withColumn("__sents", sentences_expr(F.col(text_col)))

    spans = (
        with_sents.select(
            F.col(id_col),
            F.posexplode(
                # sequence(0, -1) would count DOWN — short docs need an
                # explicitly empty span list
                F.when(
                    F.size(sents) >= span,
                    F.transform(
                        F.sequence(F.lit(0), F.size(sents) - span),
                        lambda i: F.md5(
                            F.concat_ws(" ", F.slice(sents, i + 1, span))
                        ),
                    ),
                ).otherwise(F.array().cast("array<string>")),
            ).alias("span_idx", "span_hash"),
        )
    )
    # Round 14 (guide §1.2 step 1): ``spans`` feeds both the winner
    # aggregation and the loser join — two independent subtrees, so the
    # sentence-split + md5-per-span explode ran TWICE over the corpus
    # (dd10 measured 1.78x its DuckDB replay at sf1, whose CTE is
    # materialized once). Checkpoint the narrow (id, span_idx,
    # span_hash) rows — ~50 bytes/span, never the sentence text — and
    # both consumers read them back; the dd3p signature-reuse pattern.
    spans = spans.localCheckpoint()
    # winner of each duplicated span: smallest (id, span_idx)
    winners = spans.groupBy("span_hash").agg(
        F.min(F.struct(F.col(id_col), F.col("span_idx"))).alias("w"),
        F.count(F.lit(1)).alias("n"),
    )
    losers = (
        spans.join(winners.filter(F.col("n") > 1), "span_hash")
        .filter(
            (F.col(id_col) != F.col(f"w.{id_col}"))
            | (F.col("span_idx") != F.col("w.span_idx"))
        )
        .select(F.col(id_col), F.col("span_idx"))
    )
    # sentence indices to drop per doc = union of losing spans' windows
    drops = losers.groupBy(id_col).agg(
        F.array_distinct(
            F.flatten(
                F.collect_list(F.sequence(F.col("span_idx"), F.col("span_idx") + span - 1))
            )
        ).alias("__drop")
    )
    rebuilt = (
        with_sents.join(drops, id_col, "left")
        .withColumn(
            out_col,
            F.when(F.col("__drop").isNull(), F.col(text_col)).otherwise(
                F.array_join(
                    F.filter(
                        F.transform(
                            F.sequence(F.lit(0), F.size(sents) - 1),
                            lambda i: F.when(
                                ~F.array_contains(F.col("__drop"), i),
                                F.element_at(sents, i + 1),
                            ),
                        ),
                        lambda s: s.isNotNull(),
                    ),
                    " ",
                )
            ),
        )
        .drop("__sents", "__drop")
    )
    return rebuilt


def top_bigram_count_expr(text: Column) -> Column:
    """Multiplicity of the document's most frequent bigram (0 for docs
    with fewer than two tokens). Expression-only: sort the bigram
    array, fold a (prev, run, best) struct through it — max run length
    of the sorted array IS the top multiplicity. Narrow map, no
    shuffle, whole-stage codegen. This is the raw count behind
    ``top_bigram_fraction_expr``; consumers that need the count must
    read it from here rather than inverting the rounded, capped
    fraction (which loses information once 2*best > n_tokens)."""
    return let_expr(
        tokens_expr(text),
        lambda t: _best_bigram_run(t).cast("bigint"),
    )


def _best_bigram_run(toks: Column) -> Column:
    """Max run length of the sorted bigram array over an already-BOUND
    token column (pass a lambda variable or a materialized column, not
    a tokenization expression — see ``let_expr``)."""
    bigrams = F.when(
        F.size(toks) >= 2,
        F.sort_array(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at(toks, i), F.element_at(toks, i + 1)
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    init = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )

    def step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best")
        )

    return F.aggregate(bigrams, init, step)["best"]


def top_bigram_fraction_expr(text: Column) -> Column:
    """Gopher's remaining corpus rule, per-document form: the fraction
    of tokens covered by the document's most frequent bigram (docs
    dominated by one repeated phrase are boilerplate). A bigram of
    multiplicity c covers c+1 tokens at most; Gopher uses the
    token-coverage fraction — approximate with 2c/n (disjoint
    occurrences), capped at 1. Narrow map like the count expr.

    NOTE: as a single codegen unit this expression carries a fixed
    multi-second compile cost (the sorted-array run-length fold is a
    large generated-code body). For whole-table scoring prefer
    ``top_bigram_stats`` — the relational form of the same statistic —
    and reserve this expression for contexts that need a Column (e.g.
    filtering inside a larger narrow map)."""
    return let_expr(
        tokens_expr(text),
        lambda t: F.round(
            F.least(
                _best_bigram_run(t).cast("double")
                * 2
                / F.greatest(F.size(t), F.lit(1)).cast("double"),
                F.lit(1.0),
            ),
            6,
        ),
    )


def top_bigram_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Top-bigram multiplicity and coverage fraction per document, as
    data flow rather than one giant expression: explode bigrams →
    ``groupBy(doc, bigram).count()`` → ``max`` per doc → join the
    per-doc token counts back. Identical values to
    ``top_bigram_count_expr`` / ``top_bigram_fraction_expr`` (and the
    t14 oracle), but the generated code per stage is tiny — the
    expression form's sorted-array fold costs ~12 s of codegen at sf1
    while this plan compiles in well under a second.

    Scale shape: both aggregations map-side combine, and the second
    (per-doc max) runs on the already-reduced distinct-bigram set, so
    the dominant shuffle is one pass over distinct (doc, bigram) pairs
    — strictly smaller than the exploded bigram stream. Bigram IDENTITY
    travels as ``xxhash64(tok_i, tok_j)`` (8 bytes) rather than the
    concatenated string: the statistic needs only equality, never the
    text, and hashing the aggregation key cut the hash-agg stage ~1.8x
    at sf1 (the standard move for n-gram statistics at corpus scale; a
    within-doc 64-bit collision — the only event that could perturb the
    max — has probability ~n_doc * b^2 / 2^65 ≈ 1e-12 on this fixture,
    and the frozen-fixture oracle gate would turn any such collision
    into a red hash, not a silent drift). The token COUNT never needs
    its own tokenization pass: a doc with >= 2 tokens emits exactly
    len(toks) - 1 bigram rows, so n = sum(bigram counts) + 1 falls out
    of the same aggregation, and a doc missing from the aggregate has
    top_cnt = 0, which forces top_frac = 0 regardless of n — the id
    universe is the only thing read from ``df`` twice.

    Returns ``(id_col, top_cnt bigint, top_frac double)``.
    """
    bg = (
        df.select(F.col(id_col), tokens_expr(F.col(text_col)).alias("__toks"))
        .where(F.size("__toks") >= 2)
        .select(
            id_col,
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("__toks") - 1),
                    lambda i: F.xxhash64(
                        F.element_at(F.col("__toks"), i),
                        F.element_at(F.col("__toks"), i + 1),
                    ),
                )
            ).alias("__bigram"),
        )
    )
    mx = (
        bg.groupBy(id_col, "__bigram")
        .agg(F.count(F.lit(1)).alias("__c"))
        .groupBy(id_col)
        .agg(F.max("__c").alias("__top"), (F.sum("__c") + 1).alias("__n"))
    )
    cnt = F.coalesce(F.col("__top"), F.lit(0))
    return df.select(id_col).join(mx, id_col, "left").select(
        id_col,
        cnt.cast("bigint").alias("top_cnt"),
        F.round(
            F.least(
                cnt.cast("double") * 2
                / F.greatest(F.coalesce(F.col("__n"), F.lit(1)), F.lit(1)).cast(
                    "double"
                ),
                F.lit(1.0),
            ),
            6,
        ).alias("top_frac"),
    )


def _weight_table_milli(n_buckets: int) -> list[int]:
    """The fixed md5-derived weight table w(j), materialized: the
    j-th entry equals int(md5(f"w:{j}")[:8], 16) % 2001 - 1000 —
    byte-for-byte the value the DuckDB oracle computes inline.  The
    table has only ``n_buckets`` (1024) possible inputs, so hashing it
    per TOKEN (the pre-round-14 form) paid a second md5 + string
    round-trip per token for a value from a 1024-entry domain; folding
    the table into the expression as an 8 KiB literal array halves the
    per-token hash cost (optimization guide §1.2 step 2 — per-task
    work) with bit-identical results."""
    import hashlib

    return [
        int(hashlib.md5(f"w:{j}".encode()).hexdigest()[:8], 16) % 2001 - 1000
        for j in range(n_buckets)
    ]


def token_weight_milli(tk: Column, n_buckets: int = 1024) -> Column:
    """Integer milli-weight of one token under the deterministic hashed
    weight table (h % 2001 - 1000 in [-1000, 1000]): hashing-trick
    bucket (md5 prefix mod ``n_buckets``) through a fixed md5-derived
    weight — every value reconstructible in any engine with md5.
    Exact BIGINTs end to end, so any sum over tokens is
    partition-order-independent (no float accumulation anywhere).

    Round 14: the weight lookup w(bucket) = md5("w:"+bucket)-derived
    int is served from a literal ``n_buckets``-entry array instead of
    re-hashing per token (see :func:`_weight_table_milli`); one md5 per
    token remains (the hashing-trick bucket itself)."""
    bucket = (
        F.conv(F.substring(F.md5(tk), 1, 4), 16, 10).cast("long")
        % F.lit(n_buckets)
    )
    # One parsed SQL literal = one py4j round-trip. (Round 15 fix of a
    # round-14 misconception: classic-mode F.lit(list) expands to
    # array(*[lit(x)...]) — one py4j call PER ELEMENT, ~2.4 s for 1024
    # entries; long_array_lit ships the whole table in one expr()
    # string, measured ~5 ms. ADVICE r14.)
    table = long_array_lit(_weight_table_milli(n_buckets))
    return F.element_at(table, (bucket + 1).cast("int")).cast("long")


def milli_weight_sum(ts: Column, n_buckets: int = 1024) -> Column:
    """Exact BIGINT fold of :func:`token_weight_milli` over a token
    array — the shared accumulator of the t15 classifier and the x13
    quantile gate (pure narrow map, whole-stage codegen)."""
    return F.aggregate(
        ts,
        F.lit(0).cast("long"),
        lambda acc, t: acc + token_weight_milli(t, n_buckets),
    )


def milli_score_col(text: Column, n_buckets: int = 1024) -> Column:
    """Per-document quality score as an exact BIGINT: round-half-away
    of mean token milli-weight (s/n in milli-units; 0 for empty docs).
    The integer-space form of t15's z that :func:`~tw_etl_spark.
    operators.sampling.quantile_gate` can bin without a single float
    op — a double score would make the bin edge engine-dependent."""
    from tw_etl_spark.functions.rounding import exact_round_ratio_long

    toks = tokens_expr(text)
    return let_expr(
        toks,
        lambda ts: F.when(
            F.size(ts) > 0,
            exact_round_ratio_long(
                milli_weight_sum(ts, n_buckets), F.size(ts).cast("long")
            ),
        ).otherwise(F.lit(0).cast("long")),
    )


def _z6_zraw_from_sn(s: Column, n: Column, bias: float) -> tuple[Column, Column]:
    """The (s = exact milli-weight sum, n = token count) -> (z6, z_raw)
    arithmetic shared by :func:`hashed_linear_score_cols` and
    :func:`hashed_linear_scored` (factored round 15, ADVICE r14: the
    boundary-rounding logic is subtle and the two forms must not
    drift). z6 is the EXACT 6-digit round-half-away of the true
    rational s/(1000n) + bias decided in integer space (see the column
    form's docstring for why); z_raw is the unrounded double that feeds
    the sigmoid. ``n`` must be a BIGINT column; empty docs (n == 0)
    yield z6 = round(bias, 6-exact) and z_raw = bias."""
    from tw_etl_spark.functions.rounding import exact_round_ratio

    bias_micro = round(bias * 10**6)
    z6 = F.when(
        n > 0,
        exact_round_ratio(
            s * F.lit(10**6).cast("long")
            + F.lit(bias_micro).cast("long") * n * 1000,
            n * 1000,
            0,
        )
        / F.lit(1e6),
    ).otherwise(F.lit(bias_micro / 1e6))
    z_raw = (
        F.when(n > 0, s.cast("double") / (F.lit(1000.0) * n.cast("double")))
        .otherwise(F.lit(0.0))
    ) + F.lit(bias)
    return z6, z_raw


def hashed_linear_score_cols(
    text: Column,
    n_buckets: int = 1024,
    bias: float = 0.0,
) -> tuple[Column, Column, Column, Column]:
    """Model-based quality filtering via a hashed linear classifier —
    the fasttext-style gate the CCNet/LLaMA corpus pipelines run AFTER
    the rule batteries (Wenzek et al. 2020 §4; public technique). The
    model here is a deterministic stand-in with the real serving shape:
    hashing-trick features (token -> md5-prefix bucket mod
    ``n_buckets``) and a fixed weight table w(j) derived from md5("w:j")
    — every value reconstructible in any engine with md5, so the whole
    scorer sits under the DuckDB hash oracle (t15). Swapping in trained
    weights is a lookup-table change, not a plan change.

    Returns (n_tokens, z, score, keep) columns where z is the mean
    bucket weight plus ``bias``, score = sigmoid(z), keep = z >= 0.
    z (bias INCLUDED) is rounded to 6 digits via EXACT integer
    arithmetic (functions.rounding.exact_round_ratio) — the
    milli-weight sum and token count are exact integers, so
    z = s/(1000n) + bias routinely lands on exact decimal halves
    (s/96000 at sf0.1 did) where Spark's shortest-repr rounding and
    DuckDB's binary-double rounding disagree; rounding the true
    rational in integer space removes the boundary entirely.  ``bias``
    must be a value with at most 6 decimal digits (it is folded into
    the rational as round(bias*1e6) micro-units so the rounding stays
    exact).  Scale shape: a pure per-row array fold — NO shuffle, no
    Python, whole-stage codegen end to end (plan-asserted); at 100 TB
    this runs at scan speed like the Gopher/C4 batteries.
    """
    toks = tokens_expr(text)

    def milli_sum(ts: Column) -> Column:
        return milli_weight_sum(ts, n_buckets)

    # exact 6-digit z: round-half-away of the TRUE rational
    # s/(1000n) + bias = (s*1e6 + B*1000n) / (1000n*1e6) where
    # B = round(bias*1e6) micro-units — numerator and denominator stay
    # exact BIGINTs, so the half-boundary is decided in integer space
    # with the bias included (rounding z then adding bias would return
    # a non-6-digit value and flip keep near the boundary). The
    # arithmetic itself lives in _z6_zraw_from_sn, shared with the
    # single-fold DataFrame form. Each output binds its own let_expr
    # over toks — this COLUMN form intentionally returns independent
    # trees (callers project subsets); use hashed_linear_scored when
    # you need all four without re-running the fold.
    z6 = let_expr(
        toks,
        lambda ts: _z6_zraw_from_sn(
            milli_sum(ts), F.size(ts).cast("long"), bias
        )[0],
    )
    # unrounded z feeds the sigmoid (transcendental output: plain
    # round-6 is safe — only exact integer ratios hit decimal halves)
    z_raw = let_expr(
        toks,
        lambda ts: _z6_zraw_from_sn(
            milli_sum(ts), F.size(ts).cast("long"), bias
        )[1],
    )
    n_tokens = F.size(toks).cast("bigint")
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-z_raw))
    keep = z6 >= 0
    # + 0.0 normalizes IEEE -0.0 -> +0.0 (identity for every other value)
    # so cross-engine value hashes can't diverge on signed zero.
    return (
        n_tokens,
        z6 + F.lit(0.0),
        F.round(score, 6) + F.lit(0.0),
        keep,
    )


def hashed_linear_scored(
    df: "DataFrame",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
    bias: float = 0.0,
) -> "DataFrame":
    """DataFrame form of :func:`hashed_linear_score_cols` that evaluates
    the expensive md5 token fold ONCE per row (round 14, optimization
    guide §1.2 step 2).  The column form returns four independent
    expression trees; Catalyst never deduplicates lambda-bearing
    subtrees (``EquivalentExpressions`` skips ``NamedLambdaVariable``),
    so a projection of all four re-ran the tokenize+hash fold 3x per
    row (z6 in both z and keep, plus z_raw in score).  Here the
    (s=milli-weight sum, n=token count) pair is computed inside a
    single one-element ``explode`` — a Generate node is a projection
    barrier ``CollapseProject`` cannot inline through — and the four
    outputs derive from (s, n) in cheap integer/double arithmetic,
    value-identical to the column form (same fold, same exact-integer
    rounding — the (s, n) -> (z6, z_raw) arithmetic is literally the
    same helper, :func:`_z6_zraw_from_sn`).  Still a shuffle-free
    narrow map: Generate adds no Exchange."""
    toks = tokens_expr(F.col(text_col))
    sn = let_expr(
        toks,
        lambda ts: F.struct(
            milli_weight_sum(ts, n_buckets).alias("s"),
            F.size(ts).cast("long").alias("n"),
        ),
    )
    s = F.col("__sn").getField("s")
    n = F.col("__sn").getField("n")
    z6, z_raw = _z6_zraw_from_sn(s, n, bias)
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-z_raw))
    return df.select(
        id_col, F.explode(F.array(sn)).alias("__sn")
    ).select(
        id_col,
        n.cast("bigint").alias("n_tokens"),
        (z6 + F.lit(0.0)).alias("z"),
        (F.round(score, 6) + F.lit(0.0)).alias("score"),
        (z6 >= 0).alias("keep"),
    )
