"""Corpus-level differential fuzzing for the dedup / data-selection
operator family (dd10 span rewrite, dd3p minhash-LSH, dd4p simhash,
x12 DSIR weights).

``relgen`` fuzzes generated QUERIES over the fixed driver tables; this
layer fuzzes generated CORPORA and OPERATOR PARAMETERS over the fixed
pipelines: each seed deterministically builds a synthetic document
table with planted exact duplicates, near duplicates (token
perturbations), empty docs, and degenerate one-token docs, draws
operator parameters, then runs the Spark operator AND a parameterized
DuckDB SQL template and strict-compares (tests/test_differential_fuzz
style). It catches the classes a fixed fixture cannot:
parameter-dependent off-by-ones (band slicing, chunk boundaries, bit
widths), all-duplicate / all-empty corner corpora, and rounding
legality under parameter change.

Rounding-legality rules the generator itself enforces (the same rules
the registered queries obey — SCALE.md round 9):

- minhash ``num_hashes`` is always 2^a*5^b, so est_jaccard =
  agree/num_hashes is a terminating decimal and round(·, 6) is the
  identity on BOTH engines;
- DSIR bucket log-ratios are rounded once to integer micro-units and
  folded as exact BIGINT sums (the template mirrors the operator).
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

_TOKS = "list_filter(string_split(text, ' '), t -> t <> '')"

KINDS = (
    "span",
    "minhash",
    "simhash",
    "dsir",
    "bpe",
    "cms",
    "bpe_enc",  # t17: train R rounds, then ENCODE every document
    "phash",  # dd11: perceptual image hash near-dup over synth PPMs
    "afp",  # dd12: audio fingerprint near-dup over synth WAVs
    "vfp",  # dd13: video fingerprint near-dup over synth PPM streams
    "delta",  # dd14: incremental dedup vs a persisted signature index
    "deltap",  # dd18: the delta against the PERSISTED pre-banded index
    "spand",  # dd19: delta duplicated spans vs a persisted gram index
    "compactb",  # dd20: stream-writer batches folded by compact_banded_index
)


@dataclass
class DedupCase:
    seed: int
    kind: str
    params: dict
    rows: list[tuple[int, str]] = field(repr=False)
    sql: str = field(repr=False)


def gen_corpus(
    rng: random.Random, min_vocab: int = 3, coverage_doc: bool = False
) -> list[tuple[int, str]]:
    """Synthetic document table with planted duplicate structure. Small
    vocabularies force natural token collisions; explicit branches
    plant exact dups, near dups (1-3 token swaps), empties, and
    one-token docs."""
    vocab = [f"w{i}" for i in range(rng.randint(min_vocab, 40))]
    docs: list[str] = []
    if coverage_doc:
        # guarantee every vocab word occurs at least once (the bpe kind
        # needs enough distinct symbol pairs for every merge round)
        docs.append(" ".join(vocab))
    for _ in range(rng.randint(20, 80)):
        r = rng.random()
        if docs and r < 0.22:  # exact duplicate of an earlier doc
            docs.append(docs[rng.randrange(len(docs))])
        elif docs and r < 0.45:  # near duplicate: perturb 1-3 tokens
            base = docs[rng.randrange(len(docs))].split()
            for _ in range(rng.randint(1, 3)):
                if base:
                    base[rng.randrange(len(base))] = rng.choice(vocab)
            docs.append(" ".join(base))
        elif r < 0.52:  # empty doc
            docs.append("")
        elif r < 0.58:  # degenerate one-token doc
            docs.append(rng.choice(vocab))
        else:  # fresh doc
            docs.append(
                " ".join(
                    rng.choice(vocab) for _ in range(rng.randint(1, 60))
                )
            )
    return list(enumerate(docs))


def span_sql(chunk_tokens: int) -> str:
    k = chunk_tokens
    return f"""
    WITH tok AS (
        SELECT doc_id, {_TOKS} AS tk FROM documents
    ), posed AS (
        SELECT doc_id, tk,
               unnest(range((len(tk) + {k - 1}) // {k})) AS idx
        FROM tok WHERE len(tk) > 0
    ), chunks AS (
        SELECT doc_id, idx,
               array_to_string(
                   list_slice(tk, idx * {k} + 1, idx * {k} + {k}), ' '
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
    """


def delta_span_sql(n: int, delta_mod: int) -> str:
    """dd19's oracle, parameterized: duplicated-span stats on the FULL
    union, restricted to the 'new' batch (doc_id % delta_mod == 0) —
    what the Spark side reconstructs from the persisted gram-count
    index via cnt_old + n_all_new > n_own."""
    from tw_etl_spark.functions.rounding import sql_round_ratio

    frac = sql_round_ratio(
        "sum(span_toks)::BIGINT", "any_value(n_tok)", 6
    )
    return f"""
    WITH toks AS (
        SELECT doc_id, {_TOKS} AS tk FROM documents
    ), posed AS (
        SELECT doc_id, tk, len(tk) AS n_tok,
               unnest(range(1, len(tk) - {n - 2})) AS pos
        FROM toks WHERE len(tk) >= {n}
    ), grams AS (
        SELECT doc_id, pos, n_tok,
               array_to_string(list_slice(tk, pos, pos + {n - 1}), ' ') AS g
        FROM posed
    ), dup AS (
        SELECT g FROM grams GROUP BY g HAVING count(DISTINCT doc_id) > 1
    ), hits AS (
        SELECT doc_id, pos, n_tok FROM grams
        WHERE g IN (SELECT g FROM dup) AND doc_id % {delta_mod} = 0
    ), marked AS (
        SELECT doc_id, pos, n_tok,
               CASE WHEN lag(pos) OVER w IS NULL
                         OR pos > lag(pos) OVER w + {n} THEN 1 ELSE 0 END AS brk
        FROM hits
        WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ), islands AS (
        SELECT doc_id, pos, n_tok,
               sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                              ROWS UNBOUNDED PRECEDING) AS island
        FROM marked
    ), spans AS (
        SELECT doc_id, any_value(n_tok) AS n_tok,
               max(pos) + {n} - min(pos) AS span_toks
        FROM islands GROUP BY doc_id, island
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT)        AS n_dup_spans,
           CAST(sum(span_toks) AS BIGINT)  AS dup_tokens,
           {frac} AS dup_frac
    FROM spans GROUP BY doc_id ORDER BY doc_id
    """


def minhash_sql(
    num_hashes: int,
    bands: int,
    threshold: float,
    delta_mod: int = 0,
    new_pred: str | None = None,
) -> str:
    """delta_mod > 0 restricts the output to pairs touching the 'new'
    batch (doc_id % delta_mod == 0) — the dd14 delta-dedup oracle: the
    full-corpus re-dedup filtered to new-touching pairs. ``new_pred``
    overrides with an arbitrary SQL predicate over c.id_a/c.id_b (the
    dd20 compaction oracle's 'touches the post-compaction day' shape,
    where new is % 4 == 3, not == 0)."""
    n, b = num_hashes, bands
    if new_pred is not None:
        delta_pred = f"AND ({new_pred})"
    else:
        delta_pred = (
            f"AND (c.id_a % {delta_mod} = 0 OR c.id_b % {delta_mod} = 0)"
            if delta_mod
            else ""
        )
    r = n // b
    return f"""
    WITH tok AS (
        SELECT doc_id, list_distinct({_TOKS}) AS toks FROM documents
    ),
    ex AS (SELECT doc_id AS doc, unnest(toks) AS tk FROM tok),
    sig AS (
        SELECT doc, r.range AS i, min(md5(r.range::VARCHAR || ':' || tk)) AS h
        FROM ex CROSS JOIN range({n}) r
        GROUP BY doc, r.range
    ),
    sigarr AS (SELECT doc, list(h ORDER BY i) AS sig FROM sig GROUP BY doc),
    banded AS (
        SELECT doc, g.range AS band,
               md5(array_to_string(
                   list_slice(sig, g.range * {r} + 1, g.range * {r} + {r}),
                   ',')) AS bucket
        FROM sigarr CROSS JOIN range({b}) g
    ),
    cand AS (
        SELECT DISTINCT a.doc AS id_a, b.doc AS id_b
        FROM banded a
        JOIN banded b ON a.band = b.band AND a.bucket = b.bucket
                     AND a.doc < b.doc
    )
    SELECT c.id_a, c.id_b,
           round(length(list_filter(range({n}),
                                    i -> sa.sig[i + 1] = sb.sig[i + 1]))
                 / {n}.0, 6) AS est_jaccard
    FROM cand c
    JOIN sigarr sa ON sa.doc = c.id_a
    JOIN sigarr sb ON sb.doc = c.id_b
    WHERE length(list_filter(range({n}),
                             i -> sa.sig[i + 1] = sb.sig[i + 1]))
          / {n}.0 >= {threshold}
      {delta_pred}
    ORDER BY id_a, id_b
    """


def simhash_sql(bits: int) -> str:
    return f"""
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
        FROM hashes CROSS JOIN range({bits}) g
        GROUP BY doc, g.range
    ),
    sh AS (
        SELECT doc,
               sum(CASE WHEN v > 0 THEN 1::BIGINT << b ELSE 0 END) AS simhash
        FROM votes GROUP BY doc
    )
    SELECT d.doc_id, coalesce(sh.simhash, 0)::BIGINT AS simhash
    FROM documents d LEFT JOIN sh ON sh.doc = d.doc_id
    ORDER BY d.doc_id
    """


def dsir_sql(buckets: int, target_mod: int) -> str:
    m = buckets
    return f"""
    WITH tok AS (
        SELECT doc_id, {_TOKS} AS tk FROM documents
    ), posed AS (
        SELECT doc_id, tk, unnest(range(1, len(tk))) AS i
        FROM tok WHERE len(tk) >= 2
    ), bg AS (
        SELECT doc_id, doc_id % {target_mod} = 0 AS is_t,
               ('0x' || substr(md5(tk[i] || ' ' || tk[i + 1]), 1, 8))::BIGINT
                   % {m} AS b
        FROM posed
    ), dc AS (
        SELECT doc_id, is_t, b, count(*)::BIGINT AS c
        FROM bg GROUP BY doc_id, is_t, b
    ), bc AS (
        SELECT b, sum(c)::BIGINT AS s_g,
               coalesce(sum(c) FILTER (WHERE is_t), 0)::BIGINT AS t_g
        FROM dc GROUP BY b
    ), tot AS (
        SELECT sum(s_g)::BIGINT AS s_tot, sum(t_g)::BIGINT AS t_tot FROM bc
    ), lr AS (
        SELECT b,
               CAST(round((ln((t_g + 1.0) / (t_tot + {m}.0))
                         - ln((s_g + 1.0) / (s_tot + {m}.0))) * 1000000)
                    AS BIGINT) AS lr_micro
        FROM bc, tot
    ), wd AS (
        SELECT doc_id, sum(c)::BIGINT AS n_bigrams,
               sum(c * lr_micro)::BIGINT AS w_micro
        FROM dc JOIN lr USING (b) GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(w.n_bigrams, 0)::BIGINT AS n_bigrams,
           coalesce(w.w_micro, 0)::BIGINT AS w_micro,
           coalesce(w.w_micro, 0)::BIGINT / 1000000.0 AS dsir_w
    FROM documents d LEFT JOIN wd w USING (doc_id)
    ORDER BY d.doc_id
    """


# num_hashes restricted to 2^a*5^b so agree/num_hashes terminates and
# round(·, 6) is the identity (see module docstring).
_MINHASH_N = (4, 5, 8, 10, 16, 20)
_THRESHOLDS = (0.25, 0.5, 0.75)


def cms_sql(depth: int, width: int, topk: int) -> str:
    d, w, k = depth, width, topk
    return f"""
    WITH w AS (
        SELECT unnest({_TOKS}) AS v FROM documents
    ), sk AS (
        SELECT r.range AS r,
               ('0x' || substr(md5(r.range::VARCHAR || ':' || v), 1, 8))
                   ::BIGINT % {w} AS b,
               count(*)::BIGINT AS cnt
        FROM w CROSS JOIN range({d}) r
        GROUP BY 1, 2
    ), exact AS (
        SELECT v, count(*)::BIGINT AS exact_cnt
        FROM w GROUP BY v
        ORDER BY exact_cnt DESC, v LIMIT {k}
    ), cand AS (
        SELECT e.v, e.exact_cnt, r.range AS r,
               ('0x' || substr(md5(r.range::VARCHAR || ':' || e.v), 1, 8))
                   ::BIGINT % {w} AS b
        FROM exact e CROSS JOIN range({d}) r
    )
    SELECT c.v AS word,
           any_value(c.exact_cnt) AS exact_cnt,
           min(s.cnt)::BIGINT AS cms_est,
           (min(s.cnt) - any_value(c.exact_cnt))::BIGINT AS overcount
    FROM cand c JOIN sk s ON s.r = c.r AND s.b = c.b
    GROUP BY c.v
    ORDER BY exact_cnt DESC, word
    """


def generate(seed: int) -> DedupCase:
    rng = random.Random(seed)
    kind = KINDS[seed % len(KINDS)]
    rows = gen_corpus(
        rng,
        min_vocab=8 if kind in ("bpe", "bpe_enc") else 3,
        coverage_doc=kind in ("bpe", "bpe_enc"),
    )
    if kind == "span":
        params = {"chunk_tokens": rng.choice((2, 3, 5, 8))}
        sql = span_sql(**params)
    elif kind == "minhash":
        n = rng.choice(_MINHASH_N)
        divs = [b for b in (2, 4, 5) if n % b == 0]
        params = {
            "num_hashes": n,
            "bands": rng.choice(divs),
            "threshold": rng.choice(_THRESHOLDS),
        }
        sql = minhash_sql(**params)
    elif kind == "simhash":
        params = {"bits": rng.choice((8, 16, 24, 32))}
        sql = simhash_sql(**params)
    elif kind == "bpe":
        from tw_etl_spark.queries.text import _bpe_oracle

        params = {"rounds": rng.choice((2, 3, 4))}
        sql = _bpe_oracle(params["rounds"])
    elif kind == "cms":
        params = {
            "depth": rng.choice((2, 4)),
            "width": rng.choice((4, 16, 64)),
            "topk": 10,
        }
        sql = cms_sql(**params)
    elif kind == "bpe_enc":
        from tw_etl_spark.queries.text import _bpe_encode_oracle

        params = {"rounds": rng.choice((2, 3, 4))}
        sql = _bpe_encode_oracle(params["rounds"])
    elif kind == "phash":
        from tw_etl_spark.queries.multimodalq import _dd11_oracle

        # thresholds above n_bands-1 lose the recall GUARANTEE but both
        # engines run the same banding, so equivalence still holds
        params = {"max_hamming": rng.choice((3, 7, 12))}
        sql = _dd11_oracle(params["max_hamming"])
    elif kind == "afp":
        from tw_etl_spark.queries.multimodalq import _dd12_oracle

        params = {"max_hamming": rng.choice((3, 7, 12))}
        sql = _dd12_oracle(params["max_hamming"])
    elif kind == "vfp":
        from tw_etl_spark.queries.multimodalq import _dd13_oracle

        params = {"max_hamming": rng.choice((3, 7, 12))}
        sql = _dd13_oracle(params["max_hamming"])
    elif kind == "spand":
        params = {
            "n": rng.choice((2, 3, 4, 5)),
            "delta_mod": rng.choice((2, 3, 4)),
        }
        sql = delta_span_sql(**params)
    elif kind in ("delta", "deltap"):
        n = rng.choice(_MINHASH_N)
        divs = [b for b in (2, 4, 5) if n % b == 0]
        params = {
            "num_hashes": n,
            "bands": rng.choice(divs),
            "threshold": rng.choice(_THRESHOLDS),
            "delta_mod": rng.choice((2, 3, 4)),
        }
        sql = minhash_sql(**params)
    elif kind == "compactb":
        # dd20's lifecycle: seed = %mod==0, stream batches 1..mod-2
        # through lsh_index_stream_writer's foreachBatch function,
        # compact, then the probe batch (%mod==mod-1) delta-dedups
        # against the COMPACTED root — the oracle is the full-corpus
        # re-dedup filtered to probe-touching pairs, so a hash match
        # proves the fold lost/invented nothing that candidate
        # generation or the verify join could see
        n = rng.choice(_MINHASH_N)
        divs = [b for b in (2, 4, 5) if n % b == 0]
        mod = rng.choice((3, 4))
        params = {
            "num_hashes": n,
            "bands": rng.choice(divs),
            "threshold": rng.choice(_THRESHOLDS),
            "mod": mod,
        }
        sql = minhash_sql(
            params["num_hashes"],
            params["bands"],
            params["threshold"],
            new_pred=(
                f"c.id_a % {mod} = {mod - 1} OR c.id_b % {mod} = {mod - 1}"
            ),
        )
    else:
        params = {"buckets": rng.choice((16, 64, 256)), "target_mod": rng.choice((2, 3, 5))}
        sql = dsir_sql(**params)
    return DedupCase(seed=seed, kind=kind, params=params, rows=rows, sql=sql)


def run_spark(spark: SparkSession, case: DedupCase) -> DataFrame:
    """Run the Spark-side operator for ``case`` on its generated corpus."""
    from pyspark.sql import functions as F

    from tw_etl_spark.operators.dedup import (
        minhash_lsh_pairs_portable,
        simhash_portable_expr,
        span_dedup_rewrite,
    )
    from tw_etl_spark.operators.sampling import dsir_importance_weights

    df = spark.createDataFrame(case.rows, "doc_id long, text string")
    p = case.params
    if case.kind == "span":
        return span_dedup_rewrite(df, chunk_tokens=p["chunk_tokens"]).orderBy(
            "doc_id"
        )
    if case.kind == "minhash":
        return minhash_lsh_pairs_portable(
            df,
            num_hashes=p["num_hashes"],
            bands=p["bands"],
            threshold=p["threshold"],
        ).orderBy("id_a", "id_b")
    if case.kind == "simhash":
        return df.select(
            "doc_id",
            simhash_portable_expr(F.col("text"), bits=p["bits"]).alias(
                "simhash"
            ),
        ).orderBy("doc_id")
    if case.kind == "bpe":
        from tw_etl_spark.operators.bpe import bpe_merges

        return bpe_merges(df, rounds=p["rounds"]).orderBy("merge_round")
    if case.kind == "bpe_enc":
        from tw_etl_spark.operators.bpe import bpe_merges, bpe_tokens_expr
        from tw_etl_spark.operators.text import let_expr

        merges = [
            (r.lhs, r.rhs)
            for r in bpe_merges(df, rounds=p["rounds"])
            .orderBy("merge_round")
            .collect()
        ]
        toks = bpe_tokens_expr(F.col("text"), merges)
        return (
            df.select(
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
    if case.kind == "phash":
        from tw_etl_spark.operators.multimodal import (
            perceptual_neardup_pairs,
            synthesize_image_df,
        )

        media = synthesize_image_df(df.withColumn("source", F.lit("fuzz")))
        return (
            perceptual_neardup_pairs(media, max_hamming=p["max_hamming"])
            .select("id_a", "id_b", "hamming")
            .orderBy("id_a", "id_b")
        )
    if case.kind == "afp":
        from tw_etl_spark.operators.multimodal import (
            audio_neardup_pairs,
            synthesize_audio_df,
        )

        media = synthesize_audio_df(df.withColumn("source", F.lit("fuzz")))
        return (
            audio_neardup_pairs(media, max_hamming=p["max_hamming"])
            .select("id_a", "id_b", "hamming")
            .orderBy("id_a", "id_b")
        )
    if case.kind == "vfp":
        from tw_etl_spark.operators.multimodal import (
            synthesize_video_df,
            video_neardup_pairs,
        )

        media = synthesize_video_df(df.withColumn("source", F.lit("fuzz")))
        return (
            video_neardup_pairs(media, max_hamming=p["max_hamming"])
            .select("id_a", "id_b", "hamming")
            .orderBy("id_a", "id_b")
        )
    if case.kind == "spand":
        from tw_etl_spark.operators.dedup import (
            delta_duplicate_spans,
            gram_count_index,
        )

        mod = p["delta_mod"]
        old = df.filter(F.col("doc_id") % mod != 0)
        new = df.filter(F.col("doc_id") % mod == 0)
        return delta_duplicate_spans(
            new, gram_count_index(old, n=p["n"]), n=p["n"]
        ).orderBy("doc_id")
    if case.kind == "delta":
        from tw_etl_spark.operators.dedup import (
            lsh_delta_pairs_portable,
            minhash_signatures_portable,
        )

        mod = p["delta_mod"]
        old = df.filter(F.col("doc_id") % mod != 0)
        new = df.filter(F.col("doc_id") % mod == 0)
        index = minhash_signatures_portable(
            old, num_hashes=p["num_hashes"]
        )
        delta, _ = lsh_delta_pairs_portable(
            new,
            index,
            num_hashes=p["num_hashes"],
            bands=p["bands"],
            threshold=p["threshold"],
        )
        return delta.orderBy("id_a", "id_b")
    if case.kind == "deltap":
        # the same delta semantics through the PERSISTED pre-banded
        # layout (dd18's primitive): write the index, read it back,
        # band only the new batch — same oracle as "delta"
        import os
        import shutil
        import tempfile

        from tw_etl_spark.operators.dedup import (
            lsh_delta_pairs_prebanded,
            minhash_signatures_portable,
            read_banded_index,
            write_banded_index,
        )

        mod = p["delta_mod"]
        root = os.path.join(
            tempfile.gettempdir(), "tw_etl_fuzz_deltap", str(case.seed)
        )
        shutil.rmtree(root, ignore_errors=True)
        write_banded_index(
            minhash_signatures_portable(
                df.filter(F.col("doc_id") % mod != 0),
                num_hashes=p["num_hashes"],
            ),
            root,
            num_hashes=p["num_hashes"],
            bands=p["bands"],
        )
        banded, sigs = read_banded_index(spark, root)
        delta, _, _ = lsh_delta_pairs_prebanded(
            df.filter(F.col("doc_id") % mod == 0),
            banded,
            sigs,
            num_hashes=p["num_hashes"],
            bands=p["bands"],
            threshold=p["threshold"],
        )
        return delta.orderBy("id_a", "id_b")
    if case.kind == "compactb":
        # dd20's whole lifecycle on the generated corpus: seed write,
        # stream-writer batches, compaction into a fresh root, probe
        # delta off the compacted index
        import os
        import shutil
        import tempfile

        from tw_etl_spark.operators.dedup import (
            compact_banded_index,
            lsh_delta_pairs_prebanded,
            minhash_signatures_portable,
            read_banded_index,
            write_banded_index,
        )
        from tw_etl_spark.streaming.sinks import lsh_index_stream_writer

        mod = p["mod"]
        root = os.path.join(
            tempfile.gettempdir(), "tw_etl_fuzz_compactb", str(case.seed)
        )
        shutil.rmtree(root, ignore_errors=True)
        live = os.path.join(root, "live")
        write_banded_index(
            minhash_signatures_portable(
                df.filter(F.col("doc_id") % mod == 0),
                num_hashes=p["num_hashes"],
            ),
            live,
            num_hashes=p["num_hashes"],
            bands=p["bands"],
        )
        writer = lsh_index_stream_writer(
            spark,
            live,
            num_hashes=p["num_hashes"],
            bands=p["bands"],
            threshold=p["threshold"],
        )
        for day in range(1, mod - 1):
            writer(
                df.filter(F.col("doc_id") % mod == day).select(
                    "doc_id", "text"
                ),
                day - 1,
            )
        compacted = os.path.join(root, "compacted")
        compact_banded_index(spark, live, compacted)
        banded, sigs = read_banded_index(spark, compacted)
        delta, _, _ = lsh_delta_pairs_prebanded(
            df.filter(F.col("doc_id") % mod == mod - 1),
            banded,
            sigs,
            num_hashes=p["num_hashes"],
            bands=p["bands"],
            threshold=p["threshold"],
        )
        return delta.orderBy("id_a", "id_b")
    if case.kind == "cms":
        from tw_etl_spark.operators.sketch import cms_counts, cms_estimate
        from tw_etl_spark.operators.text import tokens_expr

        words = df.select(F.explode(tokens_expr(F.col("text"))).alias("v"))
        sketch = cms_counts(
            words, "v", depth=p["depth"], width=p["width"]
        ).localCheckpoint()
        exact = (
            words.groupBy("v")
            .agg(F.count(F.lit(1)).cast("long").alias("exact_cnt"))
            .orderBy(F.desc("exact_cnt"), "v")
            .limit(p["topk"])
        )
        est = cms_estimate(
            exact, sketch, "v", depth=p["depth"], width=p["width"]
        )
        return (
            exact.join(est, "v")
            .select(
                F.col("v").alias("word"),
                "exact_cnt",
                "cms_est",
                (F.col("cms_est") - F.col("exact_cnt"))
                .cast("long")
                .alias("overcount"),
            )
            .orderBy(F.desc("exact_cnt"), "word")
        )
    return dsir_importance_weights(
        df,
        target=F.col("doc_id") % p["target_mod"] == 0,
        buckets=p["buckets"],
    ).orderBy("doc_id")


def run_duckdb(case: DedupCase):
    """Run the DuckDB template on the generated corpus; returns pandas."""
    import duckdb
    import pandas as pd

    con = duckdb.connect()
    pdf = pd.DataFrame(case.rows, columns=["doc_id", "text"])
    pdf["doc_id"] = pdf["doc_id"].astype("int64")
    con.register("documents", pdf)
    return con.execute(case.sql).df()
