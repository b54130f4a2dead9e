"""Relational BPE merge training — the tokenizer-training step of an
LLM data pipeline (byte-pair encoding, Sennrich et al. 2016, the
public algorithm), expressed so every round is engine-reconstructible
and the learned merge table sits under the cross-engine hash oracle
(t16).

Representation trick: a word's symbol sequence is a single STRING with
every symbol wrapped in sentinels — ``\\x02 sym \\x03`` — so one BPE
merge of pair (L, R) is exactly ``replace(enc, αLω αRω, αLRω)``:
built-in string replace is left-to-right non-overlapping in Spark
(UTF8String.replace) and DuckDB alike, which is precisely BPE's merge
rule ("aaa" merging (a,a) -> [aa, a]), and full sentinel delimiting
makes cross-symbol false matches impossible. No per-element fold, no
UDF — each round is one narrow-map rewrite of the (distinct-word,
frequency) table plus one pair-count aggregation.

Scale shape: training runs on the DISTINCT word-frequency table (the
classic formulation) — vocabulary-sized, not corpus-sized, so a 100 TB
corpus first collapses through one word-count shuffle and every merge
round then touches |vocab| rows. Per round: one explode+groupBy for
pair counts (shuffle over distinct pairs, partially aggregated
map-side) and a 1-row argmax collect. Production BPE trainers keep
incremental pair-count deltas instead of recounting; the recount form
here is the oracle-replayable twin — DuckDB unrolls the same rounds as
chained CTEs and must land on the identical merge table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tw_etl_spark.operators.ckpt import free_local_checkpoint

SYM_L = "\x02"  # symbol-start sentinel (never in the token stream)
SYM_R = "\x03"  # symbol-end sentinel


def _pairs_expr(syms: Column) -> Column:
    """Adjacent symbol pairs as structs (all occurrences, including
    overlaps — the classic get_stats counting)."""
    from tw_etl_spark.operators.text import let_expr

    return let_expr(
        syms,
        lambda s: F.when(
            F.size(s) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(s) - 1),
                lambda i: F.struct(
                    F.element_at(s, i).alias("l"),
                    F.element_at(s, i + 1).alias("r"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<l:string,r:string>>")),
    )


def bpe_merges(
    df: DataFrame,
    text_col: str = "text",
    rounds: int = 6,
) -> DataFrame:
    """Learn the first ``rounds`` BPE merges over the corpus; returns a
    DataFrame of UP TO ``rounds`` rows (merge_round, lhs, rhs,
    pair_count) where pair_count is the winning pair's
    frequency-weighted count at merge time. Ties break
    lexicographically on (lhs, rhs) — deterministic on any engine.
    Training stops early (fewer rows) when no adjacent pair remains —
    an all-single-character vocabulary, or ``rounds`` exceeding the
    available merges. The per-round argmax is a bounded 1-row collect
    (like the k-means centroid collects); the vocabulary table is
    cached across rounds."""
    from tw_etl_spark.operators.text import tokens_expr

    spark = df.sparkSession
    words = (
        df.select(F.explode(tokens_expr(F.col(text_col))).alias("w"))
        .filter(~F.col("w").contains(SYM_L) & ~F.col("w").contains(SYM_R))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    # Round 14: eager localCheckpoint per round instead of the
    # cache()/unpersist() dance. The old code unpersisted ``cur``
    # BEFORE ``nxt`` had ever been materialized (cache() is lazy), so
    # round r's pair-count job recomputed the whole replace chain from
    # the corpus word-count shuffle — O(rounds^2) replays of the
    # vocabulary build (guide §1.2 step 1). The checkpoint materializes
    # each round's vocab rewrite exactly once (vocab-sized, not
    # corpus-sized) and truncates the rounds-deep replace lineage;
    # blocks are freed EXPLICITLY: once round r's checkpoint has
    # materialized (localCheckpoint is eager), round r-1's blocks are
    # dead weight, so we unpersist them rather than waiting for the
    # ContextCleaner to GC the dropped frame — executor storage stays
    # one vocab copy wide however many rounds run (ADVICE r14).
    # Identical merges: same counts, same (desc c, l, r) argmax.
    cur = words.select(
        "f",
        F.regexp_replace("w", "(.)", SYM_L + "$1" + SYM_R).alias("enc"),
    ).localCheckpoint()

    out = []
    for r in range(1, rounds + 1):
        syms = F.split(
            F.col("enc").substr(F.lit(2), F.length("enc") - 2), SYM_R + SYM_L
        )
        best = (
            cur.select("f", F.explode(_pairs_expr(syms)).alias("p"))
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("f").alias("c"))
            .orderBy(F.desc("c"), "l", "r")
            .first()
        )
        if best is None:  # no adjacent pairs left — corpus fully merged
            break
        out.append((r, best.l, best.r, int(best.c)))
        prev = cur
        cur = cur.select(
            "f",
            F.replace(
                F.col("enc"),
                F.lit(SYM_L + best.l + SYM_R + SYM_L + best.r + SYM_R),
                F.lit(SYM_L + best.l + best.r + SYM_R),
            ).alias("enc"),
        ).localCheckpoint()
        free_local_checkpoint(prev)
    free_local_checkpoint(cur)
    return spark.createDataFrame(
        out, "merge_round int, lhs string, rhs string, pair_count long"
    )


def bpe_tokens_expr(text: Column, merges: list[tuple[str, str]]) -> Column:
    """Tokenize ``text`` with a trained BPE merge table — the ENCODE
    half of train->tokenize, the pass an LLM pipeline actually runs at
    corpus scale (training touches the vocab; encoding touches every
    byte of 100 TB).

    Same sentinel representation as training: the whole document
    becomes one string of sentinel-wrapped characters with words joined
    by a plain space — a merge pattern ``αLω αRω`` can never straddle a
    word boundary (it would need ``ω αL`` there, the reverse order), so
    ONE left-to-right non-overlapping ``replace`` per merge applies the
    merge across all words at once, exactly BPE's within-word rule.
    Applying R merges is therefore R chained narrow-map replaces — NO
    shuffle, no Python, whole-stage codegen, scan-speed at any corpus
    size — and the identical replace cascade replays verbatim in the
    DuckDB oracle (t17). Words containing the sentinel bytes are
    dropped, matching training's vocabulary filter.

    Returns the token array (symbols in document order across words).
    """
    from tw_etl_spark.operators.text import tokens_expr

    words = F.filter(
        tokens_expr(text),
        lambda w: ~w.contains(SYM_L) & ~w.contains(SYM_R),
    )
    enc = F.array_join(
        F.transform(
            words, lambda w: F.regexp_replace(w, "(.)", SYM_L + "$1" + SYM_R)
        ),
        " ",
    )
    for l, r in merges:
        enc = F.replace(
            enc,
            F.lit(SYM_L + l + SYM_R + SYM_L + r + SYM_R),
            F.lit(SYM_L + l + r + SYM_R),
        )
    return F.flatten(
        F.transform(
            F.filter(F.split(enc, " "), lambda w: w != ""),
            lambda w: F.split(
                w.substr(F.lit(2), F.length(w) - 2), SYM_R + SYM_L
            ),
        )
    )


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Append a BPE token-array column computed with ``merges`` (ordered
    (lhs, rhs) pairs from ``bpe_merges``). Pure narrow map — see
    ``bpe_tokens_expr``."""
    return df.withColumn(out_col, bpe_tokens_expr(F.col(text_col), merges))
