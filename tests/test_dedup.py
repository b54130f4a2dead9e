"""Unit tests for the approximate dedup operators: MinHash-LSH recall
against exact Jaccard ground truth, SimHash invariants, exact dedup."""

from __future__ import annotations

from pyspark.sql import functions as F

from tw_etl_spark.catalog import read_table
from tw_etl_spark.operators.dedup import (
    exact_dedup,
    exact_jaccard_pairs,
    minhash_lsh_pairs,
    simhash_expr,
)
from tw_etl_spark.operators.text import fingerprint_expr
from tests.conftest import SF_SMOKE


def test_minhash_recall_vs_exact_jaccard(spark):
    d = read_table(spark, SF_SMOKE, "documents")
    exact = {
        (r.id_a, r.id_b)
        for r in exact_jaccard_pairs(d, threshold=0.99).collect()
    }
    assert exact, "fixture should contain identical-token-set pairs"
    approx = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(d, threshold=0.9).collect()
    }
    # J=1.0 pairs have identical signatures → every band collides →
    # recall on the exact-dup stratum must be total.
    missed = exact - approx
    assert not missed, f"minhash missed exact-duplicate pairs: {sorted(missed)[:5]}"


def test_minhash_precision(spark):
    d = read_table(spark, SF_SMOKE, "documents")
    pairs = minhash_lsh_pairs(d, threshold=0.9).collect()
    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in exact_jaccard_pairs(d, threshold=0.0).collect()
    }
    # est-J ≥ 0.9 candidates should all have true J ≥ 0.7 (loose band
    # accounting for 64-hash estimator variance).
    for r in pairs:
        true_j = exact.get((r.id_a, r.id_b), 0.0)
        assert true_j >= 0.7, f"false positive pair {(r.id_a, r.id_b)}: true J={true_j}"


def test_simhash_identical_token_sets_collide(spark):
    d = read_table(spark, SF_SMOKE, "documents")
    df = d.select(
        "doc_id",
        fingerprint_expr(F.col("text")).alias("fp"),
        simhash_expr(F.col("text")).alias("sh"),
    )
    # same distinct-token set (same fingerprint) ⇒ same simhash
    bad = (
        df.groupBy("fp")
        .agg(F.countDistinct("sh").alias("n_sh"))
        .filter(F.col("n_sh") > 1)
        .count()
    )
    assert bad == 0


def test_portable_hash_family_matches_pure_python(spark):
    """The portable (md5) MinHash signatures and SimHash values must
    equal a from-scratch hashlib re-implementation — the same property
    the DuckDB oracle pins, re-proven here without SQL in the loop."""
    import hashlib

    from tw_etl_spark.operators.dedup import (
        minhash_signatures_portable,
        simhash_portable_expr,
    )

    texts = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "pack my box with five dozen liquor jugs"),
        (2, "the quick brown fox"),
        (3, "singleword"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")

    def py_minhash(text, k=16):
        toks = sorted({t for t in text.split(" ") if t})
        return [
            min(hashlib.md5(f"{i}:{t}".encode()).hexdigest() for t in toks)
            for i in range(k)
        ]

    def py_simhash(text, bits=32):
        toks = {t for t in text.split(" ") if t}
        hs = [int(hashlib.md5(t.encode()).hexdigest()[:8], 16) for t in toks]
        out = 0
        for b in range(bits):
            vote = sum(1 if (h >> b) & 1 else -1 for h in hs)
            if vote > 0:
                out |= 1 << b
        return out

    sigs = {
        r.doc_id: list(r.signature)
        for r in minhash_signatures_portable(df, num_hashes=16).collect()
    }
    shs = {
        r.doc_id: r.sh
        for r in df.select(
            "doc_id", simhash_portable_expr(F.col("text")).alias("sh")
        ).collect()
    }
    for doc_id, text in texts:
        assert sigs[doc_id] == py_minhash(text), doc_id
        assert shs[doc_id] == py_simhash(text), doc_id


def test_exact_dedup_keeps_min_id(spark):
    d = read_table(spark, SF_SMOKE, "documents")
    deduped = exact_dedup(d, content_col="text", id_col="doc_id")
    # fixture has no exact string dups → identity
    assert deduped.count() == d.count()
    # inject dups: union the table with itself shifted ids
    dup = d.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    both = d.unionByName(dup)
    kept = exact_dedup(both, content_col="text", id_col="doc_id")
    assert kept.count() == d.count()
    assert kept.agg(F.max("doc_id")).first()[0] < 1_000_000


def test_connected_components_chain_cycle_star(spark):
    """Min-label propagation: chain, cycle, star, and an isolated pair
    all collapse to their min member; convergence beats max_iter."""
    from tw_etl_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [
            (1, 2), (2, 3), (3, 4),          # chain 1-2-3-4
            (10, 11), (11, 12), (12, 10),    # cycle
            (20, 21), (20, 22), (20, 23),    # star
            (30, 31),                        # pair
        ],
        "id_a bigint, id_b bigint",
    )
    got = {
        r.id: r.component for r in connected_components(pairs).collect()
    }
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10, 12: 10,
        20: 20, 21: 20, 22: 20, 23: 20,
        30: 30, 31: 30,
    }


def test_dedup_by_components_keeps_singletons(spark):
    from tw_etl_spark.operators.dedup import dedup_by_components

    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in (1, 2, 3, 9)], "doc_id bigint, text string"
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a bigint, id_b bigint")
    got = sorted(r.doc_id for r in dedup_by_components(docs, pairs).collect())
    assert got == [1, 9]  # 2,3 fold into component 1; 9 untouched


def test_jaccard_max_df_guard(spark):
    """Stop-token cap: a generous cap changes nothing; max_df=1 leaves
    no shared tokens, hence no pairs."""
    from tw_etl_spark.operators.dedup import exact_jaccard_pairs

    d = read_table(spark, SF_SMOKE, "documents")
    base = {
        (r.id_a, r.id_b): r.jaccard
        for r in exact_jaccard_pairs(d, threshold=0.95).collect()
    }
    capped = {
        (r.id_a, r.id_b): r.jaccard
        for r in exact_jaccard_pairs(d, threshold=0.95, max_df=10**9).collect()
    }
    assert base == capped and base  # identical, and non-trivial
    assert exact_jaccard_pairs(d, threshold=0.0, max_df=1).count() == 0


def test_deterministic_split_properties(spark):
    """Split is a pure function of (id, salt): stable across calls,
    proportions roughly honored, different salt ⇒ different draw."""
    from tw_etl_spark.operators.sampling import deterministic_split

    d = read_table(spark, SF_SMOKE, "documents")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    s1 = {r.doc_id: r.split for r in deterministic_split(d, "doc_id", w).collect()}
    s2 = {r.doc_id: r.split for r in deterministic_split(d, "doc_id", w).collect()}
    assert s1 == s2  # reproducible
    n = len(s1)
    frac_train = sum(v == "train" for v in s1.values()) / n
    assert 0.7 < frac_train < 0.9
    s3 = {
        r.doc_id: r.split
        for r in deterministic_split(d, "doc_id", w, salt="v2").collect()
    }
    assert s1 != s3  # independent draw under a new salt


def test_component_split_no_leakage(spark):
    """Every near-dup pair must land in the same split."""
    from tw_etl_spark.operators.dedup import exact_jaccard_pairs
    from tw_etl_spark.operators.sampling import component_split

    d = read_table(spark, SF_SMOKE, "documents")
    pairs = exact_jaccard_pairs(d, threshold=0.95)
    s = component_split(d, pairs, "doc_id", {"train": 0.5, "test": 0.5})
    lab = {r.doc_id: r.split for r in s.collect()}
    for p in pairs.collect():
        assert lab[p.id_a] == lab[p.id_b], (p.id_a, p.id_b)


def test_stratified_sample_rates_and_determinism(spark):
    from tw_etl_spark.operators.sampling import stratified_sample

    d = read_table(spark, SF_SMOKE, "documents")
    rates = {"en": 0.5, "de": 0.25}
    kept = stratified_sample(d, "lang", rates, id_col="doc_id")
    pdf = kept.groupBy("lang").count().toPandas().set_index("lang")["count"]
    tot = d.groupBy("lang").count().toPandas().set_index("lang")["count"]
    for lang, r in rates.items():
        got = pdf.get(lang, 0) / tot[lang]
        assert abs(got - r) < 0.1, (lang, got, r)
    # strata without a configured rate are kept in full
    others = [l for l in tot.index if l not in rates]
    for lang in others:
        assert pdf.get(lang, 0) == tot[lang], lang
    # deterministic: second run keeps the identical id set
    again = stratified_sample(d, "lang", rates, id_col="doc_id")
    a = sorted(r.doc_id for r in kept.select("doc_id").collect())
    b = sorted(r.doc_id for r in again.select("doc_id").collect())
    assert a == b


def test_ngram_decontaminate_modes_agree(spark):
    from tw_etl_spark.operators.dedup import ngram_decontaminate

    d = read_table(spark, SF_SMOKE, "documents")
    bench = d.filter(F.col("doc_id") % 97 == 0)
    corpus = d.filter(F.col("doc_id") % 97 != 0)
    clean = ngram_decontaminate(corpus, bench, n=3)
    marked = ngram_decontaminate(corpus, bench, n=3, mark_only=True)
    clean_ids = {r.doc_id for r in clean.select("doc_id").collect()}
    flags = {r.doc_id: r.contaminated for r in marked.select("doc_id", "contaminated").collect()}
    # drop-mode == mark-mode's unflagged set; every corpus row is marked
    assert clean_ids == {i for i, c in flags.items() if not c}
    assert set(flags) == {r.doc_id for r in corpus.select("doc_id").collect()}
    # a doc that IS a benchmark doc's duplicate must be contaminated
    # (the fixture has exact dup clusters crossing the %97 boundary)
    assert any(flags.values())


def test_exact_jaccard_matches_bruteforce_on_random_corpora(spark):
    """PPJoin prefix+length filtering must be EXACT: compare against an
    all-pairs python brute force on randomized corpora with both
    realistic (large-vocab) and degenerate (tiny-vocab) shapes."""
    import itertools
    import random

    from tw_etl_spark.operators.dedup import exact_jaccard_pairs

    for seed, vocab_n, n_docs, thr in [
        (1, 500, 60, 0.5),
        (2, 8, 60, 0.8),
        (3, 2000, 40, 0.3),
        # threshold 0: the popcount window degenerates to the full
        # range (pre_threshold <= 0 branch) and ONLY J=0 pairs stay
        # excluded (the shares->=1-token contract)
        (6, 8, 40, 0.0),
    ]:
        rng = random.Random(seed)
        vocab = [f"w{i}" for i in range(vocab_n)]
        docs = {
            i: " ".join(rng.choices(vocab, k=rng.randint(1, 30)))
            for i in range(n_docs)
        }
        expected = set()
        sets = {i: set(t.split()) for i, t in docs.items()}
        for a, b in itertools.combinations(sorted(sets), 2):
            inter = len(sets[a] & sets[b])
            if inter and inter / len(sets[a] | sets[b]) >= thr:
                expected.add((a, b))
        df = spark.createDataFrame(list(docs.items()), ["doc_id", "text"])
        got = {
            (r.id_a, r.id_b)
            for r in exact_jaccard_pairs(df, threshold=thr).collect()
        }
        assert got == expected, (seed, got ^ expected)


def test_semantic_dedup_invariants(spark):
    """SemDeDup (k-means + within-cluster cosine): survivors are a
    subset keeping the min id per near-dup component, no two survivors
    in the SAME cluster remain >= threshold-similar, and the whole
    operator is deterministic (fixed seed)."""
    import numpy as np

    from tw_etl_spark.operators.dedup import kmeans_assign, semantic_dedup

    df = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    thr = 0.4
    surv = semantic_dedup(df, threshold=thr, k=8)
    ids_in = {r.vec_id for r in df.select("vec_id").collect()}
    ids_out = {r.vec_id for r in surv.select("vec_id").collect()}
    assert ids_out <= ids_in and len(ids_out) < len(ids_in)

    # brute-force within-cluster check on the survivors
    assigned = kmeans_assign(df, k=8).select("vec_id", "embedding", "cluster")
    rows = [r for r in assigned.collect() if r.vec_id in ids_out]
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r.cluster, []).append(r)
    for members in by_cluster.values():
        mat = np.array([m.embedding for m in members], dtype=np.float64)
        norm = np.linalg.norm(mat, axis=1, keepdims=True)
        unit = mat / np.where(norm == 0, 1, norm)
        sims = np.round(unit @ unit.T, 6)
        np.fill_diagonal(sims, 0)
        assert (sims < thr).all(), "two survivors in one cluster still near-dup"

    ids_out2 = {r.vec_id for r in semantic_dedup(df, threshold=thr, k=8).select("vec_id").collect()}
    assert ids_out2 == ids_out, "semantic dedup not deterministic"


def test_temperature_mix_rebalances_toward_uniform(spark):
    from tw_etl_spark.operators.sampling import temperature_mix, temperature_rates

    # rate math: alpha=1 natural (all rates 1), alpha->0 uniform counts
    rates = temperature_rates({"en": 400, "fr": 100}, alpha=1.0)
    assert rates == {"en": 1.0, "fr": 1.0}
    rates0 = temperature_rates({"en": 400, "fr": 100}, alpha=0.0)
    assert rates0["fr"] == 1.0 and abs(rates0["en"] - 0.25) < 1e-12

    d = read_table(spark, SF_SMOKE, "documents")
    kept, rates = temperature_mix(d, "lang", id_col="doc_id", alpha=0.5)
    before = {r.lang: r.n for r in d.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    after = {r.lang: r.n for r in kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    # the rarest language is untouched; the dominant one is downsampled
    rare = min(before, key=before.get)
    dom = max(before, key=before.get)
    assert after[rare] == before[rare]
    assert after[dom] < before[dom]
    # mixture is flatter: dominant/rare ratio strictly shrinks
    assert after[dom] / after[rare] < before[dom] / before[rare]
    # deterministic: re-running yields identical membership
    kept2, _ = temperature_mix(d, "lang", id_col="doc_id", alpha=0.5)
    assert kept.select("doc_id").subtract(kept2.select("doc_id")).count() == 0
    assert kept2.count() == kept.count()


def test_temperature_mix_null_stratum_gets_rate(spark):
    """NULL strata are a groupBy key like any other: the computed rate
    must be applied to them (eqNullSafe), not silently drop every
    null-stratum row through the CASE chain."""
    from tw_etl_spark.operators.sampling import temperature_mix

    rows = [(f"d{i:03d}", "en" if i < 80 else None) for i in range(200)]
    d = spark.createDataFrame(rows, "doc_id string, lang string")
    kept, rates = temperature_mix(d, "lang", id_col="doc_id", alpha=0.5)
    assert None in rates
    after = {r.lang: r.n for r in kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    # the NULL stratum is the dominant one (120 rows) -> downsampled but
    # decidedly non-empty; the rare 'en' stratum keeps rate 1.0
    assert after.get("en") == 80
    n_null = after.get(None, 0)
    assert 0 < n_null < 120
    # realized rate tracks the computed one within md5-bucket noise
    assert abs(n_null / 120 - rates[None]) < 0.15


def test_jaccard_components_match_pairwise_labeling(spark):
    """exact_jaccard_components must agree with
    connected_components(exact_jaccard_pairs(...)) on every strategy:
    tiny vocab (mask-graph labeling fast path, no doc pairs) and large
    vocab (PPJoin + pair-level propagation fallback)."""
    import random

    from tw_etl_spark.operators.dedup import (
        connected_components,
        exact_jaccard_components,
        exact_jaccard_pairs,
    )

    for seed, vocab_n, n_docs, thr in [(4, 8, 80, 0.8), (5, 500, 60, 0.5)]:
        rng = random.Random(seed)
        vocab = [f"w{i}" for i in range(vocab_n)]
        docs = [
            (i, " ".join(rng.choices(vocab, k=rng.randint(1, 30))))
            for i in range(n_docs)
        ]
        # guaranteed exact-dup cluster so the same-mask clique path runs
        docs += [(n_docs, docs[0][1]), (n_docs + 1, docs[0][1])]
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        via_pairs = {
            r.id: r.component
            for r in connected_components(
                exact_jaccard_pairs(df, threshold=thr)
            ).collect()
        }
        direct = {
            r.id: r.component
            for r in exact_jaccard_components(df, threshold=thr).collect()
        }
        assert direct == via_pairs, (seed, {
            k: (direct.get(k), via_pairs.get(k))
            for k in set(direct) ^ set(via_pairs) | {
                k for k in direct if direct.get(k) != via_pairs.get(k)
            }
        })


def test_mask_label_fallback_past_edge_cap(spark, monkeypatch):
    """When the mask-pair edge set exceeds the bounded-collect cap,
    exact_jaccard_components must fall back to DataFrame label
    propagation and return the SAME labels as the driver union-find."""
    import random

    from tw_etl_spark.operators import dedup as D

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(8)]
    docs = [
        (i, " ".join(rng.choices(vocab, k=rng.randint(1, 30))))
        for i in range(60)
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    fast = {
        r.id: r.component
        for r in D.exact_jaccard_components(df, threshold=0.6).collect()
    }
    monkeypatch.setattr(D, "_MASK_EDGE_COLLECT_MAX", 1)
    slow = {
        r.id: r.component
        for r in D.exact_jaccard_components(df, threshold=0.6).collect()
    }
    assert slow == fast


def test_duplicate_spans_crafted(spark):
    """Known-answer check for cross-doc duplicated spans: docs A and B
    share one 10-token block (positions 3..12 in A, 1..10 in B); doc C
    is unique. n=8 -> duplicated 8-gram start positions are 3,4,5 in A
    and 1,2,3 in B, merging into ONE span of 10 tokens each; C emits
    nothing."""
    from tw_etl_spark.operators.dedup import duplicate_spans

    shared = " ".join(f"s{i}" for i in range(10))
    rows = [
        (1, f"a1 a2 {shared} a3 a4 a5"),        # 15 tokens, span at 3..12
        (2, f"{shared} b1 b2 b3 b4 b5 b6 b7"),  # 17 tokens, span at 1..10
        (3, " ".join(f"c{i}" for i in range(17))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_dup_spans, r.dup_tokens, r.dup_frac)
        for r in duplicate_spans(df, n=8).collect()
    }
    assert got == {
        1: (1, 10, round(10 / 15, 6)),
        2: (1, 10, round(10 / 17, 6)),
    }


def test_semantic_dedup_relational_sanity(spark):
    """Relational SemDeDup (dd8p's operator): crafted corpus with two
    exact-duplicate groups and independent singletons — duplicates land
    in one cluster, exactly one survivor (min id) per duplicate group,
    singletons untouched. Also pins determinism across two runs."""
    import numpy as np

    from tw_etl_spark.operators.dedup import semantic_dedup_relational

    rng = np.random.default_rng(11)
    base = rng.normal(size=(12, 8)).astype("float32")
    rows = []
    for i in range(12):
        rows.append((i, [float(x) for x in base[i]]))
    # ids 12/13 duplicate id 0; id 14 duplicates id 5
    rows += [(12, rows[0][1]), (13, rows[0][1]), (14, rows[5][1])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {
        r.id: (r.cluster, r.survived)
        for r in semantic_dedup_relational(df, k=4, threshold=0.999).collect()
    }
    assert len(out) == 15
    assert out[0][1] and not out[12][1] and not out[13][1]
    assert out[0][0] == out[12][0] == out[13][0]
    assert out[5][1] and not out[14][1]
    assert out[5][0] == out[14][0]
    # everything else survives
    assert all(out[i][1] for i in range(1, 12) if i != 5 or True)
    out2 = {
        r.id: (r.cluster, r.survived)
        for r in semantic_dedup_relational(df, k=4, threshold=0.999).collect()
    }
    assert out == out2


def test_within_cluster_pairs_matches_bruteforce(spark):
    """The blocked-matmul pair kernel must emit EXACTLY the pairs a
    naive per-pair dot join emits: same threshold semantics (epsilon
    prefilter + authoritative rounded verify), within-cluster only —
    a cross-cluster exact duplicate must NOT pair."""
    import numpy as np

    from pyspark.sql import functions as F

    from tw_etl_spark.operators.dedup import within_cluster_pairs

    rng = np.random.default_rng(3)
    rows = []
    for i in range(40):
        v = rng.normal(size=6)
        rows.append((i, i % 3, [float(x) for x in v / np.linalg.norm(v)]))
    # inject near-dups within cluster 0 and across clusters (the
    # cross-cluster pair must NOT appear)
    rows.append((100, 0, rows[0][2]))
    rows.append((101, 1, rows[0][2]))
    df = spark.createDataFrame(rows, "id long, cluster int, u array<double>")

    got = {
        (r.id_a, r.id_b)
        for r in within_cluster_pairs(df, "id", "u", "cluster", 0.8).collect()
    }
    # brute force reference in python
    by_c = {}
    for i, c, v in rows:
        by_c.setdefault(c, []).append((i, np.array(v)))
    want = set()
    for c, mem in by_c.items():
        for x in range(len(mem)):
            for y in range(x + 1, len(mem)):
                ia, va = mem[x]
                ib, vb = mem[y]
                # same rounded-fold contract as the operator
                if round(float(sum(va[k] * vb[k] for k in range(6))), 6) >= 0.8:
                    want.add((min(ia, ib), max(ia, ib)))
    assert got == want and (0, 100) in got and (0, 101) not in got


def test_span_dedup_rewrite_crafted(spark):
    """Known-answer check for the C4-style span-removal rewrite with
    chunk_tokens=3: doc 1 owns both chunks first; doc 2 repeats doc 1's
    first chunk (dropped) plus a unique partial chunk (kept); doc 3
    repeats doc 1 verbatim (fully emptied); doc 4 is token-less."""
    from tw_etl_spark.operators.dedup import span_dedup_rewrite

    rows = [
        (1, "a b c d e f"),     # chunks: "a b c", "d e f" — both kept
        (2, "a b c zz"),        # "a b c" dropped, partial "zz" kept
        (3, "a b c d e f"),     # both chunks dropped -> ''
        (4, ""),                # no tokens -> '' with 0/0 counts
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.clean_text, r.n_kept, r.n_dropped)
        for r in span_dedup_rewrite(df, chunk_tokens=3).collect()
    }
    assert got == {
        1: ("a b c d e f", 2, 0),
        2: ("zz", 1, 1),
        3: ("", 0, 2),
        4: ("", 0, 0),
    }


def test_span_rewrite_hash_key_equivalence(spark):
    """VERDICT r9 #5: the xxhash64 shuffle-key variant (8-byte key for
    the 100 TB exchange instead of the raw chunk text) must produce
    byte-identical output on the span fuzz corpora — a 64-bit collision
    would only merge keep-first groups, and none occurs here."""
    from tw_etl_spark.operators.dedup import span_dedup_rewrite
    from tw_etl_spark.testing import dedupgen

    # derive span-kind seeds from the registry: hardcoded seed lists
    # break every time a fuzz kind is added (generate() maps seed ->
    # KINDS[seed % len(KINDS)])
    step = len(dedupgen.KINDS)
    start = dedupgen.KINDS.index("span")
    for seed in range(start, start + 6 * step, step):
        case = dedupgen.generate(seed)
        assert case.kind == "span", seed
        df = spark.createDataFrame(case.rows, "doc_id long, text string")
        k = case.params["chunk_tokens"]
        a = span_dedup_rewrite(df, chunk_tokens=k).orderBy("doc_id").collect()
        b = (
            span_dedup_rewrite(df, chunk_tokens=k, key_by_hash=True)
            .orderBy("doc_id")
            .collect()
        )
        assert a == b, seed


def test_delta_dedup_identity_with_full_rededup(spark):
    """The delta contract (VERDICT r10 #4): pairs(old ∪ new) ==
    pairs(old) ∪ delta_pairs(new, index(old)) — planted cross-batch
    near-dups are found by the delta path, old-old dup pairs are NOT
    re-emitted (the corpus is never re-deduped), and the updated index
    equals the union's signature table."""
    from pyspark.sql import functions as F

    from tw_etl_spark.operators.dedup import (
        lsh_delta_pairs_portable,
        minhash_lsh_pairs_portable,
        minhash_signatures_portable,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        # old batch: an exact dup pair (1, 2) — old-old, must NOT
        # appear in the delta output
        (1, base),
        (2, base),
        (4, "totally different words here entirely"),
        # new batch (% 3 == 0): 3 dups 1/2 cross-batch; 6 dups 9
        # within the new batch; 12 matches nothing
        (3, base),
        (6, "one two three four five six seven eight nine ten"),
        (9, "one two three four five six seven eight nine ten"),
        (12, "unique snowflake document with own words"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    old = d.filter(F.col("doc_id") % 3 != 0)
    new = d.filter(F.col("doc_id") % 3 == 0)
    kw = dict(num_hashes=16, bands=4, threshold=0.9)

    def pairs(df):
        return {
            (r.id_a, r.id_b, r.est_jaccard)
            for r in minhash_lsh_pairs_portable(df, **kw).collect()
        }

    index = minhash_signatures_portable(old, num_hashes=16)
    delta, updated = lsh_delta_pairs_portable(new, index, **kw)
    delta_set = {(r.id_a, r.id_b, r.est_jaccard) for r in delta.collect()}

    full = pairs(d)
    old_only = pairs(old)
    assert delta_set | old_only == full
    assert delta_set & old_only == set()  # old-old never re-emitted
    assert (1, 2, 1.0) in old_only and (1, 2, 1.0) not in delta_set
    assert {(1, 3, 1.0), (2, 3, 1.0), (6, 9, 1.0)} <= delta_set

    # updated index == signature table of the union (next delta's input)
    want = {
        (r.doc_id, tuple(r.signature))
        for r in minhash_signatures_portable(d, num_hashes=16).collect()
    }
    got = {(r.doc_id, tuple(r.signature)) for r in updated.collect()}
    assert got == want


def test_delta_dedup_identity_fuzz(spark):
    """Identity property over generated corpora with planted duplicate
    structure (the dedupgen grammar): for several seeds and split mods,
    full-corpus pairs == old pairs ∪ delta pairs, disjointly."""
    from pyspark.sql import functions as F

    from tw_etl_spark.operators.dedup import (
        lsh_delta_pairs_portable,
        minhash_lsh_pairs_portable,
        minhash_signatures_portable,
    )
    from tw_etl_spark.testing import dedupgen

    import random

    for seed, mod in ((11, 2), (27, 3), (42, 4)):
        rows = dedupgen.gen_corpus(random.Random(seed))
        d = spark.createDataFrame(rows, "doc_id long, text string")
        old = d.filter(F.col("doc_id") % mod != 0)
        new = d.filter(F.col("doc_id") % mod == 0)
        kw = dict(num_hashes=16, bands=4, threshold=0.8)
        full = {
            tuple(r)
            for r in minhash_lsh_pairs_portable(d, **kw).collect()
        }
        old_pairs = {
            tuple(r)
            for r in minhash_lsh_pairs_portable(old, **kw).collect()
        }
        index = minhash_signatures_portable(old, num_hashes=16)
        delta, _ = lsh_delta_pairs_portable(new, index, **kw)
        delta_set = {tuple(r) for r in delta.collect()}
        assert delta_set | old_pairs == full, (seed, mod)
        assert delta_set & old_pairs == set(), (seed, mod)


def test_merge_survivor_index_associative_and_exact(spark):
    """The st5-style exact-signature survivor index is a durable
    mergeable artifact: folding per-batch survivor tables in ANY
    grouping lands on the full-corpus recompute (min-id survivorship,
    additive counts)."""
    from pyspark.sql import functions as F

    from tw_etl_spark.operators.dedup import merge_survivor_index

    def survivors(df):
        return df.groupBy("sig").agg(
            F.min("doc_id").alias("survivor"),
            F.count(F.lit(1)).cast("long").alias("n_members"),
        )

    rows = [(i, f"s{i % 4}") for i in range(20)]
    d = spark.createDataFrame(rows, "doc_id long, sig string")
    b0 = survivors(d.filter("doc_id < 7"))
    b1 = survivors(d.filter("doc_id >= 7 and doc_id < 13"))
    b2 = survivors(d.filter("doc_id >= 13"))
    full = {tuple(r) for r in survivors(d).collect()}
    left_fold = merge_survivor_index(merge_survivor_index(b0, b1), b2)
    right_fold = merge_survivor_index(b0, merge_survivor_index(b1, b2))
    assert {tuple(r) for r in left_fold.collect()} == full
    assert {tuple(r) for r in right_fold.collect()} == full


def test_delta_dedup_chains_across_many_batches(spark):
    """The 'folds forever' claim for the LSH tier: feeding batches
    one at a time — each delta run consuming the PREVIOUS run's updated
    index — accumulates exactly the full-corpus pair set. Three daily
    'crawls' over a generated corpus with planted duplicate structure."""
    import random

    from pyspark.sql import functions as F

    from tw_etl_spark.operators.dedup import (
        lsh_delta_pairs_portable,
        minhash_lsh_pairs_portable,
        minhash_signatures_portable,
    )
    from tw_etl_spark.testing import dedupgen

    rows = dedupgen.gen_corpus(random.Random(5))
    d = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(num_hashes=16, bands=4, threshold=0.8)

    batch0 = d.filter(F.col("doc_id") % 3 == 0)
    acc = {
        tuple(r) for r in minhash_lsh_pairs_portable(batch0, **kw).collect()
    }
    index = minhash_signatures_portable(batch0, num_hashes=16)
    for m in (1, 2):
        delta, index = lsh_delta_pairs_portable(
            d.filter(F.col("doc_id") % 3 == m), index, **kw
        )
        new_pairs = {tuple(r) for r in delta.collect()}
        assert not (new_pairs & acc)  # nothing re-emitted, ever
        acc |= new_pairs
        index = index.localCheckpoint()  # the persisted-artifact step

    full = {tuple(r) for r in minhash_lsh_pairs_portable(d, **kw).collect()}
    assert acc == full


def test_semantic_delta_pairs_identity_with_fixed_centroids(spark):
    """dd17's contract: with centroids FIXED by the index (trained on
    the old corpus), within-cluster pairs of (old ∪ new) ==
    within-cluster pairs of (old) ∪ delta pairs, disjointly — and the
    delta variant's cos_sim equals the full scan's exact verify fold."""
    import numpy as np
    from pyspark.sql import functions as F

    from tw_etl_spark.operators.dedup import (
        kmeans_assign_expr,
        relational_kmeans_centroids,
        unit_vectors,
        within_cluster_delta_pairs,
        within_cluster_pairs,
    )

    rng = np.random.default_rng(3)
    anchors = rng.normal(size=(4, 16))
    rows = [
        (i, [float(x) for x in anchors[i % 4] + rng.normal(scale=0.04, size=16)])
        for i in range(36)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    unit_all = unit_vectors(df)
    old_unit = unit_vectors(df.filter(F.col("vec_id") % 3 != 0))
    _seeds, cents = relational_kmeans_centroids(old_unit, 4)

    def assigned(u_df, flag_new):
        a = u_df.select(
            "id", "u", kmeans_assign_expr(cents).alias("cluster")
        )
        return a.withColumn(
            "__new", (F.col("id") % 3 == 0) if flag_new else F.lit(False)
        )

    thr = 0.9
    full = {
        (r.id_a, r.id_b)
        for r in within_cluster_pairs(
            assigned(unit_all, False), "id", "u", "cluster", thr
        ).collect()
    }
    old_pairs = {
        (r.id_a, r.id_b)
        for r in within_cluster_pairs(
            assigned(unit_vectors(df.filter(F.col("vec_id") % 3 != 0)), False),
            "id", "u", "cluster", thr,
        ).collect()
    }
    delta_rows = within_cluster_delta_pairs(
        assigned(unit_all, True), "id", "u", "cluster", "__new", thr
    ).collect()
    delta = {(r.id_a, r.id_b) for r in delta_rows}
    assert delta | old_pairs == full
    assert delta & old_pairs == set()
    assert delta  # planted anchors guarantee cross-batch pairs
    assert len(delta_rows) == len(delta)  # single emission per pair


def test_cluster_cell_budget_rejects_oversized_cluster(spark):
    """VERDICT r11 #8: the per-cluster memory contract ("raise k with
    n") is a loud guard, not a docstring. A cluster whose m*d cells
    exceed cluster_cell_budget must fail with raise-k guidance BEFORE
    the matmul allocates — for both the full and the delta scans."""
    import pytest
    from pyspark.sql import functions as F

    from tw_etl_spark.operators.dedup import (
        within_cluster_delta_pairs,
        within_cluster_pairs,
    )

    df = spark.createDataFrame(
        [(i, [1.0] * 8, 0) for i in range(30)],
        "id long, u array<double>, cluster int",
    )  # one cluster: 30 * 8 = 240 cells
    with pytest.raises(Exception, match="per-cluster scan budget"):
        within_cluster_pairs(
            df, "id", "u", "cluster", 0.9, cluster_cell_budget=100
        ).collect()
    with pytest.raises(Exception, match="per-cluster scan budget"):
        within_cluster_delta_pairs(
            df.withColumn("__new", F.col("id") % 2 == 0),
            "id", "u", "cluster", "__new", 0.9, cluster_cell_budget=100,
        ).collect()
    # the default budget admits the same input untouched
    assert within_cluster_pairs(df, "id", "u", "cluster", 0.9).count() > 0


def test_prebanded_delta_identity_with_portable_form(spark, tmp_path):
    """The persisted-layout delta (dd18's primitive) must emit exactly
    the pairs of lsh_delta_pairs_portable given the same split — the
    layout changes WHERE banding work happens (write time vs query
    time), never the answer. Also pins the append chain: after folding
    batch 1 into the index on disk, batch 2's delta against the
    re-read index equals the portable two-batch chain."""
    from pyspark.sql import functions as F

    from tw_etl_spark.catalog import read_table
    from tw_etl_spark.operators.dedup import (
        lsh_delta_pairs_portable,
        lsh_delta_pairs_prebanded,
        minhash_signatures_portable,
        read_banded_index,
        write_banded_index,
    )

    docs = read_table(spark, SF_SMOKE, "documents")
    b0 = docs.filter(F.col("doc_id") % 3 == 0)
    b1 = docs.filter(F.col("doc_id") % 3 == 1)
    b2 = docs.filter(F.col("doc_id") % 3 == 2)
    root = str(tmp_path / "idx")
    sig0 = minhash_signatures_portable(b0, num_hashes=16).localCheckpoint()
    write_banded_index(sig0, root, num_hashes=16, bands=4)

    def pairs_set(df):
        return {(r.id_a, r.id_b, r.est_jaccard) for r in df.collect()}

    # batch 1: prebanded == portable against the same index
    banded, sigs = read_banded_index(spark, root)
    got1, new_sigs, new_banded = lsh_delta_pairs_prebanded(
        b1, banded, sigs, num_hashes=16, bands=4, threshold=0.5
    )
    want1, updated = lsh_delta_pairs_portable(
        b1, sig0, num_hashes=16, bands=4, threshold=0.5
    )
    got1_set = pairs_set(got1)
    assert got1_set == pairs_set(want1)
    assert got1_set  # the fixture's dup structure guarantees pairs

    # fold batch 1 into the persisted index, then batch 2
    import os

    new_banded.write.mode("append").partitionBy("band").parquet(
        os.path.join(root, "banded")
    )
    new_sigs.write.mode("append").parquet(os.path.join(root, "sigs"))
    banded2, sigs2 = read_banded_index(spark, root)
    got2, _, _ = lsh_delta_pairs_prebanded(
        b2, banded2, sigs2, num_hashes=16, bands=4, threshold=0.5
    )
    want2, _ = lsh_delta_pairs_portable(
        b2, updated, num_hashes=16, bands=4, threshold=0.5
    )
    assert pairs_set(got2) == pairs_set(want2)


def test_delta_duplicate_spans_identity_with_full_scan(spark):
    """dd19's load-bearing identity: span stats for the new batch
    computed against (persisted gram-count index + batch) EQUAL the
    full duplicate_spans re-scan of the union restricted to new docs —
    the criterion cnt_old + n_all_new > n_own reconstructs 'gram
    occurs beyond own doc in the union' exactly."""
    from tw_etl_spark.operators.dedup import (
        delta_duplicate_spans,
        duplicate_spans,
        gram_count_index,
    )

    d = read_table(spark, SF_SMOKE, "documents")
    old = d.filter(F.col("doc_id") % 3 != 0)
    new = d.filter(F.col("doc_id") % 3 == 0)

    got = {
        tuple(r)
        for r in delta_duplicate_spans(
            new, gram_count_index(old, n=8), n=8
        ).collect()
    }
    want = {
        tuple(r)
        for r in duplicate_spans(d, n=8)
        .filter(F.col("doc_id") % 3 == 0)
        .collect()
    }
    assert got == want
    assert got  # the fixture plants cross-batch duplicated text


def test_gram_index_merge_is_exact_and_fold_order_free(spark):
    """The span index's merge contract (the dd15 shape for the span
    family): folding per-batch gram-count indexes in ANY order equals
    the index of the union — so a daily chain index(d1) ⊕ index(d2) ⊕
    ... never drifts from a fresh full build."""
    from tw_etl_spark.operators.dedup import (
        gram_count_index,
        merge_gram_index,
    )

    d = read_table(spark, SF_SMOKE, "documents")
    a = d.filter(F.col("doc_id") % 3 == 0)
    b = d.filter(F.col("doc_id") % 3 == 1)
    c = d.filter(F.col("doc_id") % 3 == 2)

    full = {tuple(r) for r in gram_count_index(d, n=8).collect()}
    left = merge_gram_index(
        merge_gram_index(gram_count_index(a, n=8), gram_count_index(b, n=8)),
        gram_count_index(c, n=8),
    )
    right = merge_gram_index(
        gram_count_index(a, n=8),
        merge_gram_index(gram_count_index(b, n=8), gram_count_index(c, n=8)),
    )
    assert {tuple(r) for r in left.collect()} == full
    assert {tuple(r) for r in right.collect()} == full


def test_compact_banded_index_identity_with_full_write(spark, tmp_path):
    """dd20's load-bearing identity, pinned on the FULL row sets (the
    driver query's hash oracle only sees the day-3 view): compacting a
    seed index plus two stream-writer batches yields exactly the
    banded rows AND signatures write_banded_index(full corpus)
    produces, and a post-compaction delta answers identically to one
    computed against the uncompacted seed ∪ stream state."""
    import os

    from pyspark.sql import functions as F

    from tw_etl_spark.catalog import read_table
    from tw_etl_spark.operators.dedup import (
        compact_banded_index,
        lsh_delta_pairs_prebanded,
        minhash_signatures_portable,
        read_banded_index,
        read_banded_index_with_stream,
        write_banded_index,
    )
    from tw_etl_spark.streaming.sinks import lsh_index_stream_writer

    docs = read_table(spark, SF_SMOKE, "documents")
    live = str(tmp_path / "live")
    write_banded_index(
        minhash_signatures_portable(
            docs.filter(F.col("doc_id") % 4 == 0), num_hashes=16
        ),
        live, num_hashes=16, bands=4,
    )
    writer = lsh_index_stream_writer(
        spark, live, num_hashes=16, bands=4, threshold=0.5
    )
    for day in (1, 2):
        writer(
            docs.filter(F.col("doc_id") % 4 == day).select("doc_id", "text"),
            day - 1,
        )

    comp = str(tmp_path / "comp")
    compact_banded_index(spark, live, comp)

    full = str(tmp_path / "full")
    write_banded_index(
        minhash_signatures_portable(
            docs.filter(F.col("doc_id") % 4 != 3), num_hashes=16
        ),
        full, num_hashes=16, bands=4,
    )

    def banded_set(df):
        return {(r.doc, r.band, r.bucket) for r in df.collect()}

    def sigs_set(df):
        return {(r.doc_id, tuple(r.signature)) for r in df.collect()}

    cb, cs = read_banded_index(spark, comp)
    fb, fs = read_banded_index(spark, full)
    assert banded_set(cb) == banded_set(fb)
    assert sigs_set(cs) == sigs_set(fs)
    assert cb.count() == cb.select("doc", "band").distinct().count()

    # the compacted root is pure seed layout: no stream dirs remain
    assert not os.path.isdir(os.path.join(comp, "stream_banded"))
    assert not os.path.isdir(os.path.join(comp, "stream_sigs"))

    # post-compaction delta == delta against the uncompacted state
    day3 = docs.filter(F.col("doc_id") % 4 == 3)

    def pairs_set(banded, sigs):
        pairs, _, _ = lsh_delta_pairs_prebanded(
            day3, banded, sigs, num_hashes=16, bands=4, threshold=0.5
        )
        return {(r.id_a, r.id_b, r.est_jaccard) for r in pairs.collect()}

    got = pairs_set(cb, cs)
    want = pairs_set(*read_banded_index_with_stream(spark, live))
    assert got == want
    assert got  # the fixture's dup structure guarantees pairs


def test_compact_banded_index_pure_seed_is_identity(spark, tmp_path):
    """Compacting a root with NO stream tables is a faithful copy —
    the degenerate case a scheduled compaction job hits when no
    batches arrived since the last fold."""
    from pyspark.sql import functions as F

    from tw_etl_spark.catalog import read_table
    from tw_etl_spark.operators.dedup import (
        compact_banded_index,
        minhash_signatures_portable,
        read_banded_index,
        write_banded_index,
    )

    docs = read_table(spark, SF_SMOKE, "documents")
    live = str(tmp_path / "live")
    write_banded_index(
        minhash_signatures_portable(
            docs.filter(F.col("doc_id") % 4 == 0), num_hashes=16
        ),
        live, num_hashes=16, bands=4,
    )
    comp = str(tmp_path / "comp")
    compact_banded_index(spark, live, comp)
    lb, ls = read_banded_index(spark, live)
    cb, cs = read_banded_index(spark, comp)
    assert {tuple(r) for r in lb.collect()} == {tuple(r) for r in cb.collect()}
    assert {(r.doc_id, tuple(r.signature)) for r in ls.collect()} == {
        (r.doc_id, tuple(r.signature)) for r in cs.collect()
    }


def test_compact_banded_index_in_place_raises(spark, tmp_path):
    """'Never in place' is enforced, not advised: mode("overwrite") on
    the live root would truncate banded/sigs while the compaction plan
    lazily reads them. Equal paths — including relative/trailing-slash
    spellings of the same root — must raise before any write starts."""
    import pytest

    from tw_etl_spark.operators.dedup import (
        compact_banded_index,
        minhash_signatures_portable,
        write_banded_index,
    )

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b d")], ["doc_id", "text"]
    )
    live = str(tmp_path / "live")
    write_banded_index(
        minhash_signatures_portable(docs, num_hashes=16), live,
        num_hashes=16, bands=4,
    )
    with pytest.raises(ValueError, match="never writes in place"):
        compact_banded_index(spark, live, live)
    with pytest.raises(ValueError, match="never writes in place"):
        compact_banded_index(spark, live, live + "/")
