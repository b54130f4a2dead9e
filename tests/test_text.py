"""Text-operator invariants: rolling-hash determinism, quality bounds,
language-ID totality."""

from __future__ import annotations

from pyspark.sql import functions as F

from tw_etl_spark.catalog import read_table
from tw_etl_spark.operators.text import (
    lang_id_expr,
    quality_score_expr,
    rolling_hash_expr,
    tokens_expr,
)
from tests.conftest import SF_SMOKE


def test_rolling_hash_deterministic_and_order_sensitive(spark):
    df = spark.createDataFrame(
        [("a b c",), ("a b c",), ("c b a",)], ["text"]
    ).select(rolling_hash_expr(F.col("text")).alias("h"))
    rows = [r.h for r in df.collect()]
    assert rows[0] == rows[1]
    assert rows[0] != rows[2]  # order-sensitive, unlike set fingerprints
    assert all(0 <= h < 1_000_000_007 for h in rows)


def test_quality_score_bounds(spark):
    d = read_table(spark, SF_SMOKE, "documents")
    stats = (
        d.select(quality_score_expr(F.col("text"), F.col("n_chars")).alias("q"))
        .agg(F.min("q").alias("lo"), F.max("q").alias("hi"))
        .first()
    )
    assert 0.0 <= stats.lo <= stats.hi <= 1.0


def test_lang_id_total_and_in_domain(spark):
    d = read_table(spark, SF_SMOKE, "documents")
    preds = (
        d.select(lang_id_expr(tokens_expr(F.col("text"))).alias("p"))
        .distinct()
        .collect()
    )
    assert {r.p for r in preds} <= {"en", "de", "es", "fr", "zh", "und"}


def test_pack_sequences_invariants(spark):
    """Packing: every doc appears once; no pack exceeds the budget
    (except single oversized docs); deterministic; waste bounded."""
    from tw_etl_spark.operators.packing import pack_sequences
    from tw_etl_spark.operators.text import token_count_expr

    d = read_table(spark, SF_SMOKE, "documents").select(
        "doc_id", token_count_expr(F.col("text")).alias("n_tok")
    )
    budget = 256
    packed = pack_sequences(d, "doc_id", "n_tok", budget).toPandas()
    # completeness: every doc exactly once
    assert sorted(packed["doc_id"]) == sorted(
        r.doc_id for r in d.collect()
    )
    # budget respected per pack unless the pack is a single oversized doc
    g = packed.groupby("pack_id").agg(total=("n_tok", "sum"), n=("doc_id", "count"))
    bad = g[(g["total"] > budget) & (g["n"] > 1)]
    assert bad.empty, bad
    # deterministic
    again = pack_sequences(d, "doc_id", "n_tok", budget).toPandas()
    a = packed.sort_values("doc_id").reset_index(drop=True)
    b = again.sort_values("doc_id").reset_index(drop=True)
    assert a[["doc_id", "pack_id"]].equals(b[["doc_id", "pack_id"]])
    # waste bound: packs <= FFD bound + one underfull pack per bucket
    total_tok = int(packed["n_tok"].sum())
    lower = -(-total_tok // budget)  # ceil
    n_packs = packed["pack_id"].nunique()
    n_buckets = packed["bucket"].nunique()
    assert n_packs <= (11 * lower) // 9 + 1 + n_buckets, (n_packs, lower, n_buckets)


def test_tfidf_invariants(spark):
    from tw_etl_spark.operators.text import tf_idf

    d = read_table(spark, SF_SMOKE, "documents")
    out = tf_idf(d, stopwords=["the", "a"]).toPandas()
    # stopwords never survive into the scored terms
    assert not set(out["tk"]) & {"the", "a"}
    # smooth idf >= 1 (ln >= 0), tf >= 1 => tfidf >= tf > 0
    assert (out["tfidf"] >= out["tf"] - 1e-12).all()
    assert (out["tf"] >= 1.0).all()
    # one row per (doc, token)
    assert not out.duplicated(["doc", "tk"]).any()


def test_token_entropy_flags_loops_not_trigram_rule(spark):
    from tw_etl_spark.operators.text import repetition_ratio_expr, token_entropy_expr

    df = spark.createDataFrame(
        [("loop", "a b " * 50), ("normal", "the quick brown fox jumps over lazy dogs today")],
        ["kind", "text"],
    ).select(
        "kind",
        token_entropy_expr(F.col("text")).alias("ent"),
        repetition_ratio_expr(F.col("text")).alias("rep"),
    )
    rows = {r.kind: r for r in df.collect()}
    # 'a b a b ...' has entropy ~ln(2)=0.69 (degenerate) …
    assert rows["loop"].ent < 1.0 < rows["normal"].ent
    # … and is exactly what the trigram rule also catches here; the
    # complementary case (high trigram diversity, low entropy) needs
    # only 2 distinct trigrams repeated — rep is high too, so check
    # entropy is the *tighter* signal on the loop:
    assert rows["loop"].ent < rows["loop"].rep + 1.0


def test_pii_redaction_patterns(spark):
    from tw_etl_spark.operators.text import redact_pii_expr

    df = spark.createDataFrame(
        [
            ("mail me at john.doe+x@sub.example.org now",),
            ("call 555-123-4567 or visit 192.168.1.1 today",),
            ("no pii here",),
        ],
        ["text"],
    ).select(redact_pii_expr(F.col("text")).alias("r"))
    out = [r.r for r in df.collect()]
    assert out[0] == "mail me at <EMAIL> now"
    assert out[1] == "call <PHONE> or visit <IP> today"
    assert out[2] == "no pii here"


def test_chunk_documents_reconstructs_and_counts(spark):
    """Chunking invariants: non-overlap prefixes concatenate back to the
    original text, every chunk is <= size chars, chunk count is
    ceil(len/stride) (one chunk for empty docs), overlap is size-stride."""
    import math

    from pyspark.sql import functions as F

    from tw_etl_spark.operators.text import chunk_documents

    docs = [(1, "abcdefghijklmnopqrstuvwxyz"), (2, "short"), (3, ""), (4, "x" * 450)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    size, stride = 10, 7
    out = chunk_documents(df, size=size, stride=stride).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, text in docs:
        chunks = sorted(by_doc[doc_id], key=lambda r: r.chunk_id)
        assert len(chunks) == max(1, math.ceil(len(text) / stride))
        assert all(len(c.chunk_text) <= size for c in chunks)
        # stride-prefixes reconstruct the document
        rebuilt = "".join(c.chunk_text[:stride] for c in chunks[:-1])
        rebuilt += chunks[-1].chunk_text
        assert rebuilt == text, doc_id
        # consecutive chunks overlap by size - stride
        for a, b in zip(chunks, chunks[1:]):
            assert a.chunk_text[stride:] == b.chunk_text[: size - stride] or len(
                a.chunk_text
            ) < size
