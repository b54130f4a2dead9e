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


# ---------------------------------------------------------- quality [EXT]
# The documents fixture is single-line, so the line-level Gopher/C4 rules
# are exercised here with crafted multi-line docs (the arithmetic rules
# are oracle-gated in t11/t12).


def test_gopher_line_rules(spark):
    from tw_etl_spark.operators.quality import gopher_flags

    good_body = ("the quick brown fox jumps over the lazy dog and runs off " * 6).strip()
    docs = spark.createDataFrame(
        [
            (1, good_body),  # passes everything
            (2, "\n".join(["- bullet point here we go again"] * 10)),  # all bullets
            (3, "\n".join(["this line trails off into nothing..."] * 10)),  # ellipsis
            (4, "\n".join(["the same line of and that to be have with" ] * 10)),  # dup lines
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in gopher_flags(docs, min_words=5).collect()}
    assert rows[1].gopher_keep
    assert not rows[2].g_bullet_ok and not rows[2].gopher_keep
    assert not rows[3].g_ellipsis_ok
    assert not rows[4].g_dup_line_ok


def test_gopher_word_rules(spark):
    from tw_etl_spark.operators.quality import gopher_flags

    docs = spark.createDataFrame(
        [
            (1, "too short to keep"),  # word count
            (2, " ".join(["supercalifragilistic"] * 60)),  # mean word len high
            (3, " ".join(["#"] * 30 + ["the be to of and words here ok fine"] * 6)),  # symbols
            (4, " ".join(["123"] * 60) + " the be"),  # alpha fraction low
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in gopher_flags(docs).collect()}
    assert not rows[1].g_word_count_ok
    assert not rows[2].g_word_len_ok
    assert not rows[3].g_symbol_ok
    assert not rows[4].g_alpha_ok
    assert all(not r.gopher_keep for r in rows.values())


def test_c4_clean_line_semantics(spark):
    from tw_etl_spark.operators.quality import c4_clean

    text = "\n".join(
        [
            "This is a proper sentence with enough words.",  # kept
            "Too short.",  # < 5 words
            "this line has many words but no terminal punctuation",  # no punct
            "Another good sentence appears right here!",  # kept
            "And a third good sentence closes it out?",  # kept
        ]
    )
    docs = spark.createDataFrame(
        [(1, text), (2, "Code doc { return 1; }"), (3, "lorem ipsum dolor sit amet.")],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in c4_clean(docs).collect()}
    assert rows[1].c4_n_lines == 3 and rows[1].c4_keep
    assert rows[1].c4_text.splitlines()[0] == "This is a proper sentence with enough words."
    assert not rows[2].c4_keep  # curly brace
    assert not rows[3].c4_keep  # lorem ipsum


def test_c4_sentence_span_dedup(spark):
    from tw_etl_spark.operators.quality import dedup_sentence_spans

    shared = "First shared one. Second shared two. Third shared three."
    docs = spark.createDataFrame(
        [
            (1, shared + " Unique tail of doc one."),
            (2, "Own opening sentence here. " + shared),
            (3, "Totally unrelated. Nothing here repeats. Honest!"),
            (4, "Too short to span."),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r.deduped_text for r in dedup_sentence_spans(docs).collect()}
    # doc 1 owns the first occurrence -> untouched
    assert out[1] == docs.filter("doc_id = 1").first().text
    # doc 2 loses the duplicated span: its three shared sentences vanish,
    # its own sentence survives
    assert "shared" not in out[2]
    assert out[2] == "Own opening sentence here."
    # non-duplicated and short docs untouched
    assert out[3] == docs.filter("doc_id = 3").first().text
    assert out[4] == docs.filter("doc_id = 4").first().text


def test_c4_span_dedup_is_deterministic_under_partitioning(spark):
    from tw_etl_spark.operators.quality import dedup_sentence_spans

    d = read_table(spark, SF_SMOKE, "documents").limit(100)
    a = {r.doc_id: r.deduped_text for r in dedup_sentence_spans(d).collect()}
    b = {
        r.doc_id: r.deduped_text
        for r in dedup_sentence_spans(d.repartition(7)).collect()
    }
    assert a == b


def test_top_bigram_fraction(spark):
    from tw_etl_spark.operators.quality import top_bigram_fraction_expr

    docs = spark.createDataFrame(
        [
            (1, "a b a b a b"),          # 'a b' x3 of 5 bigrams, 6 tokens
            (2, "all words differ here completely"),  # every bigram unique
            (3, "solo"),                  # no bigram
        ],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: r.f
        for r in docs.select(
            "doc_id", top_bigram_fraction_expr(F.col("text")).alias("f")
        ).collect()
    }
    assert out[1] == 1.0          # 3*2/6 capped at 1
    assert out[2] == round(2 / 5, 6)
    assert out[3] == 0.0


def test_top_bigram_count_survives_fraction_cap(spark):
    """The raw top-bigram multiplicity must come from the fold itself,
    not from inverting the rounded/capped fraction: for 'a a a a'
    (best=3, n=4) the capped fraction is 1.0 and inversion would yield
    round(4/2)=2 — the count expr must report the true 3."""
    from tw_etl_spark.operators.quality import (
        top_bigram_count_expr,
        top_bigram_fraction_expr,
    )

    docs = spark.createDataFrame(
        [(1, "a a a a"), (2, "a b a b a b"), (3, "solo"), (4, "x y z")],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: (r.c, r.f)
        for r in docs.select(
            "doc_id",
            top_bigram_count_expr(F.col("text")).alias("c"),
            top_bigram_fraction_expr(F.col("text")).alias("f"),
        ).collect()
    }
    assert out[1] == (3, 1.0)
    assert out[2] == (3, 1.0)
    assert out[3] == (0, 0.0)
    assert out[4] == (1, round(2 / 3, 6))


def test_top_bigram_stats_matches_expr_forms(spark):
    """The relational form (t14's scorer) must agree value-for-value
    with the narrow-map expression forms on every shape: capped
    fraction, unique bigrams, sub-2-token docs, repeated-run docs."""
    from tw_etl_spark.operators.quality import (
        top_bigram_count_expr,
        top_bigram_fraction_expr,
        top_bigram_stats,
    )

    docs = spark.createDataFrame(
        [
            (1, "a a a a"),
            (2, "a b a b a b"),
            (3, "solo"),
            (4, "x y z"),
            (5, ""),
            (6, "the the the end of the the story"),
        ],
        ["doc_id", "text"],
    )
    rel = {
        r.doc_id: (r.top_cnt, r.top_frac) for r in top_bigram_stats(docs).collect()
    }
    expr = {
        r.doc_id: (r.c, r.f)
        for r in docs.select(
            "doc_id",
            top_bigram_count_expr(F.col("text")).alias("c"),
            top_bigram_fraction_expr(F.col("text")).alias("f"),
        ).collect()
    }
    assert rel == expr


def test_t15_classifier_matches_pure_python(spark):
    """The hashed-linear classifier's bucket/weight arithmetic must
    equal a from-scratch hashlib re-implementation (the property the
    DuckDB oracle pins, re-proven without SQL in the loop)."""
    import hashlib

    from pyspark.sql import functions as F

    from tw_etl_spark.operators.quality import hashed_linear_score_cols

    texts = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "table scan agg join window sort"),
        (2, "a"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    n_tokens, z, score, keep = hashed_linear_score_cols(F.col("text"))
    got = {
        r.doc_id: (r.n, r.z)
        for r in df.select(
            "doc_id", n_tokens.alias("n"), z.alias("z")
        ).collect()
    }

    def py_z(text, n_buckets=1024):
        toks = [t for t in text.split(" ") if t]
        ws = []
        for t in toks:
            bucket = int(hashlib.md5(t.encode()).hexdigest()[:4], 16) % n_buckets
            h = int(hashlib.md5(f"w:{bucket}".encode()).hexdigest()[:8], 16)
            ws.append((h % 2001 - 1000) / 1000.0)
        return round(sum(ws) / len(ws), 6) if ws else 0.0

    for doc_id, text in texts:
        n, zv = got[doc_id]
        assert n == len([t for t in text.split(" ") if t])
        assert abs(zv - py_z(text)) < 2e-6, (doc_id, zv, py_z(text))


def test_rolling_hash_portable_matches_pure_python(spark):
    """t6p's fold == the hashlib/pure-python reference (the property the
    list_reduce oracle pins, re-proven without SQL)."""
    import hashlib

    from pyspark.sql import functions as F

    from tw_etl_spark.operators.text import rolling_hash_portable_expr

    texts = [(0, "alpha beta gamma"), (1, ""), (2, "x"), (3, "a a a b")]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        r.doc_id: r.rh
        for r in df.select(
            "doc_id", rolling_hash_portable_expr(F.col("text")).alias("rh")
        ).collect()
    }

    def py_rh(text, base=31, mod=1_000_000_007):
        h = 0
        for t in [x for x in text.split(" ") if x]:
            h = (h * base + int(hashlib.md5(t.encode()).hexdigest()[:8], 16)) % mod
        return h

    for doc_id, text in texts:
        assert got[doc_id] == py_rh(text), doc_id


def test_bpe_merges_known_answer(spark):
    """Hand-computed BPE on a crafted corpus, including the overlap
    rule: 'aaaa' merging (a,a) left-to-right -> [aa, aa] (not three
    overlapping pairs). Corpus: 'low low low lower aaaa'."""
    from tw_etl_spark.operators.bpe import bpe_merges

    df = spark.createDataFrame(
        [("low low low lower aaaa",)], "text string"
    )
    got = [
        (r.merge_round, r.lhs, r.rhs, r.pair_count)
        for r in bpe_merges(df, rounds=4).orderBy("merge_round").collect()
    ]
    # word freqs: low:3, lower:1, aaaa:1
    # round 1 pair counts: (l,o):4 (o,w):4 (w,e):1 (e,r):1 (a,a):3
    #   tie (l,o) vs (o,w) at 4 -> lexicographic: (l,o)
    # round 2: (lo,w):4 wins
    # round 3: (low,e):1 (e,r):1 (a,a):3 -> (a,a) merges OVERLAP-FREE
    # round 4: 'aaaa' is now [aa,aa] so (aa,aa):1 ties with (low,e),(e,r)
    #   -> lexicographic smallest (aa,aa)
    assert got == [
        (1, "l", "o", 4),
        (2, "lo", "w", 4),
        (3, "a", "a", 3),
        (4, "aa", "aa", 1),
    ]


def test_bpe_merges_exhausts_early_without_error(spark):
    """ADVICE r9: when no adjacent pair remains (every word fully
    merged) the per-round argmax finds nothing — training must stop
    early with fewer rows, not die dereferencing None."""
    from tw_etl_spark.operators.bpe import bpe_merges

    # single 2-char word: exactly ONE merge exists ((a,b) -> ab)
    df = spark.createDataFrame([("ab ab",)], "text string")
    got = [
        (r.merge_round, r.lhs, r.rhs, r.pair_count)
        for r in bpe_merges(df, rounds=5).orderBy("merge_round").collect()
    ]
    assert got == [(1, "a", "b", 2)]

    # all-single-character vocabulary: zero merges possible
    df1 = spark.createDataFrame([("a b c",)], "text string")
    assert bpe_merges(df1, rounds=3).count() == 0


def test_hashed_linear_score_bias_rounds_full_z(spark):
    """ADVICE r9: bias must be folded INSIDE the exact 6-digit
    rounding — z stays a 6-decimal value for nonzero bias and the keep
    gate flips exactly at the rounded boundary."""
    from pyspark.sql import functions as F

    from tw_etl_spark.operators.quality import hashed_linear_score_cols

    df = spark.createDataFrame(
        [("alpha beta gamma delta",), ("",)], "text string"
    )
    for bias in (0.0, 0.1234565, -2.5):
        n, z, s, keep = hashed_linear_score_cols(F.col("text"), bias=bias)
        rows = df.select(
            n.alias("n"), z.alias("z"), s.alias("s"), keep.alias("keep")
        ).collect()
        for r in rows:
            assert r.z == round(r.z, 6), (bias, r.z)  # 6-digit contract
            assert r.keep == (r.z >= 0)
        empty = next(r for r in rows if r.n == 0)
        assert empty.z == round(bias, 6)


def test_bpe_encode_known_answer(spark):
    """Encode with the hand-computed merge table from
    test_bpe_merges_known_answer: 'lower' stops at [low, e, r] (merge
    order respected), 'aaaa' collapses through [aa, aa] -> [aaaa]
    (non-overlap rule applied twice)."""
    from pyspark.sql import functions as F

    from tw_etl_spark.operators.bpe import bpe_encode

    merges = [("l", "o"), ("lo", "w"), ("a", "a"), ("aa", "aa")]
    df = spark.createDataFrame(
        [("low low low lower aaaa",), ("",)], "text string"
    )
    got = [
        r.bpe_tokens
        for r in bpe_encode(df, merges).orderBy(F.length("text").desc()).collect()
    ]
    assert got[0] == ["low", "low", "low", "low", "e", "r", "aaaa"]
    assert got[1] == []


def test_bpe_encode_feeds_packing(spark):
    """VERDICT r9 #1 'done' criterion: x3 sequence packing driven by
    REAL encoded token counts — train on the fixture corpus, encode it,
    pack by n_tokens; every pack must respect the budget and every doc
    must land in exactly one pack."""
    from pyspark.sql import functions as F

    from tw_etl_spark.catalog import read_table
    from tw_etl_spark.operators.bpe import bpe_merges, bpe_tokens_expr
    from tw_etl_spark.operators.packing import pack_sequences
    from tests.conftest import SF_SMOKE

    d = read_table(spark, SF_SMOKE, "documents")
    merges = [
        (r.lhs, r.rhs)
        for r in bpe_merges(d, rounds=6).orderBy("merge_round").collect()
    ]
    counts = d.select(
        "doc_id",
        F.size(bpe_tokens_expr(F.col("text"), merges)).alias("n_bpe"),
    )
    packed = pack_sequences(counts, "doc_id", "n_bpe", budget=512)
    agg = packed.groupBy("pack_id").agg(
        F.sum("n_tok").alias("tot"), F.max("n_tok").alias("mx")
    )
    # budget respected unless a single doc alone exceeds it
    bad = agg.filter((F.col("tot") > 512) & (F.col("mx") <= 512)).count()
    assert bad == 0
    assert packed.count() == d.count()
    assert packed.select("doc_id").distinct().count() == d.count()


def test_bm25_hand_computed(spark):
    """BM25 on a 3-doc corpus small enough to verify by hand: the doc
    matching the RARE term outranks a doc stuffed with the common one
    (idf dominates tf), absent terms contribute nothing, and the
    output contract (rank order, n_terms, integer micro score) holds.
    """
    import math

    from tw_etl_spark.operators.text import bm25_topk

    docs = [
        ("d1", "spark spark spark spark join"),   # common-term stuffing
        ("d2", "quorum raft paxos"),               # the only 'raft' doc
        ("d3", "join scan filter"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = bm25_topk(df, ["join", "raft", "zzz_absent"], k=3).toPandas()

    assert list(out["rank"]) == [1, 2, 3]
    by_id = out.set_index("doc_id")
    # 'raft': df=1 -> idf=ln(1+2.5/1.5); 'join': df=2 -> idf=ln(1+1.5/2.5)
    assert by_id.loc["d2", "rank"] == 1
    # absent term never shows up as a matched term
    assert (out["n_terms"] <= 2).all()
    assert by_id.loc["d2", "n_terms"] == 1
    # replay d2's single-term score: tf=1, dl=3, avgdl=11/3
    n, dfq, tf, dl, avgdl, k1, b = 3.0, 1.0, 1.0, 3.0, 11.0 / 3.0, 1.2, 0.75
    idf = math.log(1.0 + (n - dfq + 0.5) / (dfq + 0.5))
    want = round(idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl)) * 1e6)
    assert int(by_id.loc["d2", "score_micro"]) == want
    assert abs(by_id.loc["d2", "score"] - want / 1e6) < 1e-12


def test_bm25_topk_cut_and_plan(spark):
    """The k cut is a real cut (k rows out of a larger corpus) and the
    physical plan takes the distributed TakeOrderedAndProject path —
    per-partition heaps, never a global single-task sort."""
    from tw_etl_spark.operators.text import bm25_topk
    from tw_etl_spark.plans.inspect import explain_str

    d = read_table(spark, SF_SMOKE, "documents")
    q = bm25_topk(d, ["join", "broadcast", "skew"], k=5)
    assert "TakeOrderedAndProject" in explain_str(q)
    out = q.toPandas()
    assert len(out) == 5
    assert list(out["rank"]) == [1, 2, 3, 4, 5]
    # scores non-increasing; ties (if any) broken by ascending doc id
    sm = list(out["score_micro"])
    assert sm == sorted(sm, reverse=True)


def test_bm25_oracle_float_constants():
    """The oracle SQL writes '2.2' where the Spark plan computes the
    Python double 1.2 + 1.0; this is only hash-safe because those are
    the SAME double. Pin it (and the 1-b complement) so a future k1/b
    change that is NOT exactly representable fails here, not in the
    driver."""
    assert 1.2 + 1.0 == 2.2
    assert 1.0 - 0.75 == 0.25


def test_bm25_pure_python_parity_generated_corpora(spark):
    """Generated-corpus parity (the dd3p/t15 pattern): an independent
    pure-python BM25 replays the identical arithmetic over corpora with
    empty docs, multi-space runs, stuffed docs, and absent query terms;
    Spark must land on the same integer micro scores and the same
    ranking. Fixed seeds — deterministic forever."""
    import math
    import random

    from tw_etl_spark.operators.text import bm25_topk

    k1, b = 1.2, 0.75
    for seed in (7, 23, 101):
        rng = random.Random(seed)
        vocab = [f"w{i}" for i in range(40)]
        docs = []
        for i in range(60):
            n = rng.choice([0, 1, 3, 8, 20, 30])
            words = [rng.choice(vocab) for _ in range(n)]
            if i % 13 == 0 and words:
                words = [words[0]] * len(words)  # stuffed doc
            # multi-space runs exercise the empty-token filter
            sep = lambda: " " * rng.choice([1, 1, 2])
            docs.append((i, sep().join(words) if words else ""))
        terms = rng.sample(vocab, 3) + ["zz_absent"]

        # pure-python reference (same op order as the Spark expression)
        toks = {i: [t for t in txt.split(" ") if t] for i, txt in docs}
        n_docs = float(len(docs))
        sum_dl = float(sum(len(v) for v in toks.values()))
        scores: dict[int, list[int]] = {}
        for term in terms:
            matched = {i: ts.count(term) for i, ts in toks.items() if term in ts}
            if not matched:
                continue
            dfq = float(len(matched))
            idf = math.log(1.0 + (n_docs - dfq + 0.5) / (dfq + 0.5))
            for i, tf in matched.items():
                dl = len(toks[i])
                sm = round(
                    idf * tf * (k1 + 1.0)
                    / (tf + k1 * (1.0 - b + b * dl / (sum_dl / n_docs)))
                    * 1e6
                )
                scores.setdefault(i, []).append(sm)
        want = sorted(
            ((sum(v), -i) for i, v in scores.items()), reverse=True
        )[:10]
        want = [(-ni, sm) for sm, ni in want]

        df = spark.createDataFrame(docs, ["doc_id", "text"])
        got = bm25_topk(df, terms, k=10).orderBy("rank").collect()
        assert [(r.doc_id, r.score_micro) for r in got] == want, seed
        assert [r.rank for r in got] == list(range(1, len(want) + 1))


def test_rrf_fuse_pure_python_parity_generated_lists(spark):
    """Same parity discipline for the fusion: random overlapping ranked
    lists, python reference sums round(1e6/(60+r)) per id."""
    import random

    from tw_etl_spark.operators.similarity import rrf_fuse

    for seed in (3, 77):
        rng = random.Random(seed)
        ids = list(range(30))
        lists = []
        for _ in range(3):
            chosen = rng.sample(ids, rng.randint(5, 15))
            lists.append([(d, r + 1) for r, d in enumerate(chosen)])
        ref: dict[int, list[int]] = {}
        for lst in lists:
            for d, r in lst:
                ref.setdefault(d, []).append(round(1e6 / (60.0 + r)))
        want = sorted(((sum(v), -d) for d, v in ref.items()), reverse=True)[:8]
        want = [(-nd, sm) for sm, nd in want]

        dfs = [spark.createDataFrame(lst, ["doc_id", "rank"]) for lst in lists]
        got = rrf_fuse(dfs, id_col="doc_id", k0=60, k=8).orderBy("rank").collect()
        assert [(r.doc_id, r.rrf_micro) for r in got] == want, seed


def test_bm25_duplicate_terms_raise(spark):
    """Duplicate query terms are a contract violation on BOTH sides:
    the Spark plan scores each distinct tf column once while the
    oracle's VALUES cross-join would match the duplicate twice
    (inflating dfq and n_terms) — so both entry points fail loudly
    instead of silently diverging."""
    import pytest

    from tw_etl_spark.operators.text import bm25_topk
    from tw_etl_spark.queries.text import _bm25_oracle

    df = spark.createDataFrame([("d1", "join scan")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="duplicate query terms"):
        bm25_topk(df, ["join", "join"], k=3)
    with pytest.raises(AssertionError, match="duplicate query terms"):
        _bm25_oracle(("join", "join"))


def test_bm25_multiquery_parity_and_contract(spark):
    """The t19 anchor property: the batch retriever's per-query rows
    equal T independent single-query bm25_topk runs bit-for-bit (same
    docs, ranks, n_terms, integer micro scores) — the two plans share
    one scoring expression, so divergence means the multiquery join
    broke the arithmetic. Plus the contract edges: an all-absent query
    yields zero rows, and duplicate terms raise."""
    import pytest

    from tw_etl_spark.operators.text import bm25_topk, bm25_topk_multiquery

    d = read_table(spark, SF_SMOKE, "documents")
    qs = {
        0: ["join", "broadcast", "skew"],
        1: ["dup", "scan", "filter"],
        2: ["zzz_absent"],
        3: ["window", "agg", "stream", "key"],
    }
    multi = bm25_topk_multiquery(d, qs, k=5).orderBy("query_id", "rank").collect()
    for qid, terms in qs.items():
        single = [
            (r.doc_id, r.rank, r.n_terms, r.score_micro)
            for r in bm25_topk(d, terms, k=5).orderBy("rank").collect()
        ]
        batch = [
            (r.doc_id, r.rank, r.n_terms, r.score_micro)
            for r in multi
            if r.query_id == qid
        ]
        assert single == batch, qid
    assert not [r for r in multi if r.query_id == 2]  # all-absent query

    with pytest.raises(ValueError, match="duplicate terms"):
        bm25_topk_multiquery(d, {0: ["join", "join"]}, k=5)
