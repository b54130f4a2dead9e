"""Deduplication operators [EXT]: exact, n-gram Jaccard, MinHash-LSH,
SimHash (SURVEY.md §2.2).

Scale design notes (the point of each variant):

- **Exact**: shuffle the 128-bit content hash, never the payload. At
  100 TB the dedup shuffle is ~32 bytes/row regardless of document size.
- **Exact Jaccard** (token-set): two physical strategies picked from
  data statistics — a prefix-filtering PPJoin (rare-token candidate
  equi-join + exact verify) for realistic vocabularies, and a 64-bit
  bitmask blocked-popcount scan over distinct token sets when the
  retained vocabulary fits one machine word (where prefix filtering
  degenerates: every token is hot). ``max_df`` stop-token filtering
  composes with both.
- **MinHash-LSH**: k independent min-hashes per doc (one map-side
  partial-agg shuffle), banded into b buckets; candidate pairs come from
  bucket equi-joins (only near-dups collide), then estimated Jaccard =
  signature agreement. Linear shuffle volume: k longs per doc.
- **SimHash**: one 32-bit signature per doc from per-bit majority votes;
  near-dup ⇔ small Hamming distance. Cheapest signature, weakest recall.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tw_etl_spark.operators.text import tokens_expr

# Per-cluster memory budget for the within-cluster matmul scans
# (dd8/dd17): the scan holds one cluster's m×d float64 matrix plus a
# 1024×m score tile in a single Python worker. 256M cells ≈ 2 GiB for
# X — beyond that the right fix is a larger k (more, smaller clusters),
# so the guard fails loudly WITH that guidance instead of letting the
# executor OOM (VERDICT r11 #8: this contract used to live only in a
# docstring).
DEFAULT_CLUSTER_CELL_BUDGET = 256_000_000


def _check_cluster_budget(
    n_rows: int, dim: int, budget: int | None, caller: str
) -> None:
    if budget is None or n_rows * dim <= budget:
        return
    raise ValueError(
        f"{caller}: one cluster holds {n_rows} vectors x {dim} dims = "
        f"{n_rows * dim} cells, over the per-cluster scan budget "
        f"({budget} cells ~ {budget * 8 >> 30} GiB of float64). The "
        f"scan materializes each cluster on one worker — raise k so "
        f"clusters shrink (k should grow with n; target m*d under the "
        f"budget), or pass cluster_cell_budget=<cells> (or None) if "
        f"the workers genuinely have the memory."
    )


def exact_dedup(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Keep one row (min id) per exact content hash."""
    h = F.md5(F.col(content_col).cast("binary")).alias("__h")
    keep = (
        df.select(h, F.col(id_col))
        .groupBy("__h")
        .agg(F.min(id_col).alias(id_col))
        .drop("__h")
    )
    return df.join(keep, id_col, "left_semi")


def token_set_df(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, token) rows over the distinct token set of each document."""
    return df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.array_distinct(tokens_expr(F.col(text_col)))).alias("tk"),
    )


# Bitmask strategy engages only when the retained vocabulary fits one
# 64-bit word AND the distinct-mask count keeps the blocked pair scan
# cheap (65536^2/2 ≈ 2.1e9 vectorized popcounts ≈ seconds on 32 cores).
_BITMASK_MAX_VOCAB = 64
_BITMASK_MAX_MASKS = 65536
# The sampled pre-probe reads this many (doc, token) rows before the
# full distinct-token probe: a realistic vocabulary blows past 64
# distinct tokens within the first partition, so huge-vocab corpora
# skip the full probe entirely (its distinct shuffle was pure waste
# there — the bitmask branch could never engage).
_VOCAB_PROBE_ROWS = 65536


def _bitmask_vocab(ex: DataFrame) -> list[str] | None:
    """The full retained vocabulary iff it fits the bitmask budget,
    else None. Two-stage so the common (huge-vocab) case stays cheap:
    a sampled probe over the first ~64k exploded rows (narrow scan of
    one-ish partition, no full shuffle) disqualifies first; only
    corpora that still look degenerate pay the full distinct probe."""
    sample = ex.select("tk").limit(_VOCAB_PROBE_ROWS).distinct()
    if len(sample.limit(_BITMASK_MAX_VOCAB + 1).collect()) > _BITMASK_MAX_VOCAB:
        return None
    vocab = [
        r[0]
        for r in ex.select("tk").distinct().limit(_BITMASK_MAX_VOCAB + 1).collect()
    ]
    if len(vocab) > _BITMASK_MAX_VOCAB:
        return None
    return sorted(vocab)


def _bitmask_groups(ex: DataFrame, vocab: list[str]) -> DataFrame | None:
    """Distinct-token-set groups for the bitmask strategy: one row per
    distinct 64-bit mask with the member doc ids. Returns None when the
    distinct-mask count exceeds the blocked-scan budget.

    ``localCheckpoint`` (not ``persist``) materializes the groups once
    for the multiple downstream references: checkpoint blocks are freed
    by the ContextCleaner when the caller drops the returned plan,
    unlike a CacheManager entry, which outlives the call (the round-5
    session-lifetime storage leak)."""
    spark = ex.sparkSession
    vmap = spark.createDataFrame(
        [(t, i) for i, t in enumerate(vocab)], "tk STRING, bit INT"
    )
    masks = (
        ex.join(F.broadcast(vmap), "tk")
        .groupBy("doc")
        .agg(F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), bit))").alias("mask"))
    )
    groups = (
        masks.groupBy("mask").agg(F.collect_list("doc").alias("docs")).localCheckpoint()
    )
    if groups.count() > _BITMASK_MAX_MASKS:
        return None
    return groups


def _bitmask_mask_pairs(groups: DataFrame, threshold: float) -> DataFrame:
    """Qualifying cross-mask pairs (mask_a < mask_b, jaccard) from a
    blocked numpy popcount scan over the ≤65536 distinct masks.

    Threshold semantics match the PPJoin path and the oracle exactly:
    the scan pre-filters with an epsilon margin (numpy's scaled
    rounding can disagree with Spark/DuckDB HALF_UP in the 7th
    decimal), and the authoritative filter —
    ``round(jaccard, 6) >= threshold`` — runs Spark-side on the
    emitted pairs, so both physical strategies return identical pair
    sets for every threshold."""
    import numpy as np

    mask_list = [r[0] for r in groups.select("mask").collect()]
    all_masks = np.array(sorted(mask_list), dtype=np.int64).astype(np.uint64)
    pop8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)

    def _popcount(x: "np.ndarray") -> "np.ndarray":
        flat = np.ascontiguousarray(x)
        return pop8[flat.view(np.uint8).reshape(flat.shape + (8,))].sum(
            axis=-1, dtype=np.int64
        )

    # Sort the comparison side by POPCOUNT: J(A,B) <= min(|A|,|B|) /
    # max(|A|,|B|), so J >= t confines each mask's partners to
    # popcount(b) in [ceil(t*|a|), floor(|a|/t)] — at t=0.95 a 20-token
    # mask only scans the |b| in {19..21} slice. Against the sf1
    # fixture's 39k distinct masks this windowing cuts the blocked scan
    # ~15x vs the full n^2 sweep, with an identical output set (the
    # bound is implied by the threshold, not a heuristic).
    pop_order = np.argsort(_popcount(all_masks), kind="stable")
    all_masks = all_masks[pop_order]
    pop_all = _popcount(all_masks)
    inner = 8192
    # margin > max rounding perturbation (5e-7): no pair whose ROUNDED
    # jaccard reaches the threshold can be dropped by the pre-filter.
    pre_threshold = threshold - 1e-6

    def scan(batches):
        import pandas as pd

        for pdf in batches:
            am_all = pdf["mask"].to_numpy(dtype=np.int64).astype(np.uint64)
            if not len(am_all):
                continue
            pa_all = _popcount(am_all)
            for p in np.unique(pa_all):
                am = am_all[pa_all == p]
                pa = np.full(len(am), p, dtype=np.int64)
                if pre_threshold > 0:
                    lo = int(np.ceil(p * pre_threshold))
                    hi = int(np.floor(p / pre_threshold))
                    j_lo = int(np.searchsorted(pop_all, lo, side="left"))
                    j_hi = int(np.searchsorted(pop_all, hi, side="right"))
                else:
                    j_lo, j_hi = 0, len(all_masks)
                for j0 in range(j_lo, j_hi, inner):
                    j1 = min(j0 + inner, j_hi)
                    bm = all_masks[j0:j1]
                    inter = _popcount(am[:, None] & bm[None, :])
                    union = pa[:, None] + pop_all[j0:j1][None, :] - inter
                    jac = inter / union
                    # inter > 0: the contract is pairs sharing >=1
                    # token, so J=0 pairs stay excluded even at
                    # threshold 0. Strict mask inequality emits each
                    # unordered pair once (same-mask doc pairs expand
                    # from the group lists).
                    ok = (
                        (jac >= pre_threshold)
                        & (inter > 0)
                        & (am[:, None] < bm[None, :])
                    )
                    ii, jj = np.nonzero(ok)
                    if len(ii):
                        yield pd.DataFrame(
                            {
                                "mask_a": am[ii].astype(np.int64),
                                "mask_b": bm[jj].astype(np.int64),
                                "jaccard": jac[ii, jj],
                            }
                        )

    return (
        groups.select("mask")
        .repartition(32)
        .mapInPandas(scan, schema="mask_a LONG, mask_b LONG, jaccard DOUBLE")
        .withColumn("jaccard", F.round("jaccard", 6))
        .filter(F.col("jaccard") >= threshold)
    )


def _jaccard_pairs_bitmask(
    ex: DataFrame, vocab: list[str], threshold: float
) -> DataFrame | None:
    """Tiny-vocabulary exact-Jaccard strategy: token sets as 64-bit masks.

    ``ex`` is the (doc, tk) exploded token-set relation; ``vocab`` the
    ≤64 retained tokens (sorted, so bit assignment is deterministic).
    Returns None if the distinct-mask count exceeds the blocked-scan
    budget — the caller falls back to the PPJoin strategy.

    Shape of the plan: one shuffle to build per-doc masks (bit_or agg),
    one to group docs per distinct mask, a driver collect of ≤65536
    longs (≤512 KB — bounded, NOT data-sized), a mapInPandas blocked
    popcount scan that emits qualifying MASK pairs only, and an
    expansion join back to doc ids. Qualifying doc pairs can be
    quadratic on dup-heavy data (that is the operator's contract); the
    candidate scan no longer is. Consumers that only need components
    should use :func:`exact_jaccard_components`, which labels the mask
    graph directly and never expands doc pairs.
    """
    groups = _bitmask_groups(ex, vocab)
    if groups is None:
        return None
    pair_masks = _bitmask_mask_pairs(groups, threshold)
    ga = groups.select(F.col("mask").alias("mask_a"), F.col("docs").alias("docs_a"))
    gb = groups.select(F.col("mask").alias("mask_b"), F.col("docs").alias("docs_b"))
    cross = (
        pair_masks.join(ga, "mask_a")
        .join(gb, "mask_b")
        .select(F.explode("docs_a").alias("da"), "docs_b", "jaccard")
        .select("da", F.explode("docs_b").alias("db"), "jaccard")
        .select(
            F.least("da", "db").alias("id_a"),
            F.greatest("da", "db").alias("id_b"),
            "jaccard",
        )
    )
    # Identical token sets: every within-group pair has J = 1.0 exactly.
    within = (
        groups.filter(F.size("docs") > 1)
        .select(F.explode("docs").alias("da"), "docs")
        .select("da", F.explode("docs").alias("db"))
        .filter(F.col("da") < F.col("db"))
        .select(
            F.col("da").alias("id_a"),
            F.col("db").alias("id_b"),
            F.lit(1.0).alias("jaccard"),
        )
    )
    return cross.unionByName(within)


def exact_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.95,
    max_df: int | None = None,
) -> DataFrame:
    """Exact token-set Jaccard over all pairs sharing ≥1 token.

    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard ≥ threshold,
    rounded to 6 for oracle comparison.

    Physical strategy is chosen from data statistics (two cheap stat
    jobs), the way Catalyst picks broadcast-vs-shuffle from sizes:

    - **Small vocabulary** (≤64 retained tokens, ≤65536 distinct token
      sets): every token set is one 64-bit mask and exact Jaccard is
      ``popcount(a&b) / (popcount(a)+popcount(b)-popcount(a&b))`` — a
      blocked numpy scan over DISTINCT masks (near-dup-heavy corpora
      collapse many docs per mask), then an expansion join back to doc
      pairs. The prefix-filter join degenerates exactly when the
      vocabulary is tiny (every token is hot, candidates ~n²); the
      bitmask scan is immune: measured ~45 min → ~40 s on the sf1
      dup-heavy documents fixture.
    - **General vocabulary**: prefix-filtering PPJoin (below) — at
      realistic web-corpus vocabularies the rare-token prefix prunes
      candidates to ~linear, and no mask fits a machine word anyway.

    ``max_df`` is the skew guard for scale: the token join blows up
    quadratically in documents-per-token, and the hottest tokens (stop
    words, boilerplate) carry ~zero Jaccard signal while causing all of
    the skew. With ``max_df`` set, tokens appearing in more than that
    many documents are dropped from BOTH the pair candidates and the
    per-doc set sizes, so the result is the exact Jaccard over the
    retained token space. Default ``None`` = fully exact (the oracle
    contract).

    Implementation is the exact prefix-filtering similarity join
    (PPJoin-family): under a global token order (document frequency
    ascending, i.e. rarest first), J(A,B) >= t requires the prefixes of
    length |X| - ceil(t*|X|) + 1 to intersect — so candidates come from
    an equi-join on RARE prefix tokens only (at t=0.95 the prefix is
    ~5% of each set), and each candidate is verified exactly with
    array_intersect on the full token sets. Same result as the naive
    all-shared-tokens join (the DuckDB oracle computes that form), at a
    fraction of the join fan-out: hot tokens never enter the candidate
    join because they sort last. A length filter (t*|A| <= |B| <= |A|/t)
    inside the candidate join prunes a further ~4.5x. Measured 88 s ->
    27 s on the sf0.1 documents fixture (5k docs, 31-token vocabulary,
    190k qualifying pairs — a pathologically dup-heavy worst case; on
    realistic corpora with large vocabularies the prefix prune is far
    stronger).
    """
    ex = _retained_token_sets(df, id_col, text_col, max_df)
    vocab = _bitmask_vocab(ex)
    if vocab is not None:
        out = _jaccard_pairs_bitmask(ex, vocab, threshold)
        if out is not None:
            return out
    return _jaccard_pairs_ppjoin(ex, threshold)


def _retained_token_sets(
    df: DataFrame, id_col: str, text_col: str, max_df: int | None
) -> DataFrame:
    ex = token_set_df(df, id_col, text_col)
    if max_df is not None:
        hot = (
            ex.groupBy("tk")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_df)
            .select("tk")
        )
        ex = ex.join(hot, "tk", "left_anti")
    return ex


def _jaccard_pairs_ppjoin(ex: DataFrame, threshold: float) -> DataFrame:
    """General-vocabulary strategy: prefix-filtering similarity join
    (see :func:`exact_jaccard_pairs` for the algorithm notes)."""
    from pyspark.sql.window import Window

    dfreq = ex.groupBy("tk").agg(F.count(F.lit(1)).alias("dfq"))
    sizes = ex.groupBy("doc").agg(F.count(F.lit(1)).alias("n"))
    pos_w = Window.partitionBy("doc").orderBy("dfq", "tk")
    prefix_len = F.col("n") - F.ceil(F.lit(threshold) * F.col("n")) + 1
    pref = (
        ex.join(dfreq, "tk")
        .withColumn("pos", F.row_number().over(pos_w))
        .join(sizes, "doc")
        .filter(F.col("pos") <= prefix_len)
        .select("doc", "tk", "n")
    )
    # size filter (also from the PPJoin family): J >= t forces
    # t*|A| <= |B| <= |A|/t — applied inside the candidate join it
    # prunes ~4.5x more candidates on the dup-heavy fixture.
    cond = (F.col("a.tk") == F.col("b.tk")) & (F.col("a.doc") < F.col("b.doc"))
    if threshold > 0:  # t=0 would divide by zero (and prunes nothing anyway)
        cond = (
            cond
            & (F.col("b.n") >= F.ceil(F.lit(threshold) * F.col("a.n")))
            & (F.col("b.n") <= F.floor(F.col("a.n") / F.lit(threshold)))
        )
    cand = (
        pref.alias("a")
        .join(pref.alias("b"), cond)
        .select(F.col("a.doc").alias("id_a"), F.col("b.doc").alias("id_b"))
        .distinct()
    )
    tsets = ex.groupBy("doc").agg(F.collect_list("tk").alias("toks"))
    ta = tsets.select(F.col("doc").alias("id_a"), F.col("toks").alias("ta"))
    tb = tsets.select(F.col("doc").alias("id_b"), F.col("toks").alias("tb"))
    inter = F.size(F.array_intersect("ta", "tb"))
    jac = inter / (F.size("ta") + F.size("tb") - inter)
    return (
        cand.join(ta, "id_a")
        .join(tb, "id_b")
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
) -> DataFrame:
    """MinHash signature per document: for seed i, min over the token set
    of xxhash64(token, i). One explode + one partial-aggregated groupBy —
    the 100 TB-safe shape (k longs per doc cross the wire, not text)."""
    ex = token_set_df(df, id_col, text_col)
    aggs = [
        F.min(F.xxhash64("tk", F.lit(i))).alias(f"h{i}") for i in range(num_hashes)
    ]
    sig = ex.groupBy("doc").agg(*aggs)
    return sig.select(
        F.col("doc").alias(id_col),
        F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("signature"),
    )


def _lsh_candidate_pairs(banded: DataFrame, salt_fan: int = 32) -> DataFrame:
    """Distinct candidate pairs (id_a < id_b) from a (doc, band, bucket)
    table via a SALTED self-join — the sf1 skew fix (VERDICT r13 #2).

    The naive self-join hash-partitions on (band, bucket), which caps
    parallelism at the number of distinct buckets AND pins each
    bucket's ENTIRE quadratic fan-out to one task: measured at sf1,
    the largest bucket holds 26,610 of 50,000 docs, so one task emits
    354 M of the 1.12 B raw pair rows while 31 cores idle — the
    single-task spill signature the AQE-coalesce lesson predicts (AQE
    sizes post-shuffle partitions from MAP-side bytes, and skew-join
    splitting keys off MAP partition sizes too; an OUTPUT explosion is
    invisible to both). Salting splits each bucket's probe side
    ``salt_fan`` ways (left side keyed by hash(doc) % salt_fan, right
    side replicated to every salt), so a mega-bucket's pair generation
    parallelizes across salt_fan tasks; each (x, y) pair still matches
    EXACTLY once (at x's salt), so the result set is identical. The
    replicated side is (doc, band, bucket) rows only — ids-only
    exchange discipline — so the x32 replication costs ~6 MB at sf1,
    not data. Explicit repartition widths keep AQE from coalescing the
    tiny map-side inputs to one task."""
    spark = banded.sparkSession
    from tw_etl_spark.operators.similarity import _shuffle_width

    n_shuffle = _shuffle_width(spark)
    a = (
        banded.withColumn(
            "salt", F.pmod(F.xxhash64("doc"), F.lit(salt_fan)).cast("int")
        )
        .repartition(n_shuffle, "band", "bucket", "salt")
        .alias("a")
    )
    b = (
        banded.withColumn(
            "salt", F.explode(F.sequence(F.lit(0), F.lit(salt_fan - 1)))
        )
        .withColumn("salt", F.col("salt").cast("int"))
        .repartition(n_shuffle, "band", "bucket", "salt")
        .alias("b")
    )
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.salt") == F.col("b.salt"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("id_a"), F.col("b.doc").alias("id_b"))
        .distinct()
    )


def _lsh_pairs_via_groups(
    sig: DataFrame,
    id_col: str,
    num_hashes: int,
    threshold: float,
    band_buckets,
) -> DataFrame:
    """(id_a, id_b, est_jaccard) near-dup pairs computed at the
    SIGNATURE-GROUP level — the sf1 decomposition fix for dd3p
    (VERDICT r13 #2). Banding, candidate collision, and the Jaccard
    estimate are all pure functions of the signature, so documents
    with IDENTICAL signatures are interchangeable everywhere in the
    pipeline. Measured at sf1 (50,000 docs, dup-heavy): 12,486
    distinct signatures; the doc-level self-join emits 1.12 B raw /
    632 M distinct candidate pairs, the group-level one 7.1 M raw /
    6.6 M distinct — a ~100x cut in the quadratic stage, leaving the
    110 M-row OUTPUT materialization (irreducible: it IS the result)
    as the dominant cost, produced here by fan-out joins with no
    doc-level distinct at all (a doc pair belongs to exactly one
    group pair, so uniqueness holds by construction).

    Three parts, identical output to the doc-level pipeline:
    - intra-group: every same-signature pair, est = 1.0 by definition
      (all num_hashes positions agree) — no banding check needed
      (identical signatures collide in every band);
    - group-level LSH: bands over ONE representative signature per
      group, salted candidate join (:func:`_lsh_candidate_pairs`),
      estimate + threshold filter per GROUP pair — each (sig_a, sig_b)
      estimate computed once instead of n_a*n_b times;
    - expansion: passing group pairs fan back to doc pairs through two
      id-map joins (docs-sized build sides — Catalyst broadcasts them
      at these sizes and falls back to shuffle joins at corpus scale),
      re-spread between the two fan-outs so a mega-group pair cannot
      serialize through one task; least/greatest restores the
      id_a < id_b orientation.

    Degenerates gracefully on dup-free corpora: every group is a
    singleton, intra is empty, and the group-level LSH is exactly the
    doc-level LSH plus one docs-sized dedup.
    """
    from tw_etl_spark.operators.similarity import _shuffle_width

    n_shuffle = _shuffle_width(sig.sparkSession)
    gid = F.md5(
        F.array_join(
            F.transform("signature", lambda h: h.cast("string")), ","
        )
    )
    sigg = sig.withColumn("gid", gid)
    # ids-only discipline: the doc->group map carries (gid, doc) and the
    # rep table one signature per group; both are localCheckpointed —
    # each is read twice and sized in docs/groups, not pairs
    dmap = sigg.select("gid", F.col(id_col).alias("doc")).localCheckpoint()
    reps = sigg.select("gid", "signature").dropDuplicates(["gid"]).localCheckpoint()

    ia, ib = dmap.alias("ia"), dmap.alias("ib")
    intra = (
        ia.join(
            ib,
            (F.col("ia.gid") == F.col("ib.gid"))
            & (F.col("ia.doc") < F.col("ib.doc")),
        )
        .select(
            F.col("ia.doc").alias("id_a"),
            F.col("ib.doc").alias("id_b"),
            F.lit(1.0).alias("est_jaccard"),
        )
    )

    banded = band_buckets(reps.withColumnRenamed("gid", "__g"), "__g")
    gpairs = _lsh_candidate_pairs(banded)
    ra = reps.select(F.col("gid").alias("id_a"), F.col("signature").alias("sig_a"))
    rb = reps.select(F.col("gid").alias("id_b"), F.col("signature").alias("sig_b"))
    agree = F.size(
        F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda eq: eq)
    )
    passing = (
        gpairs.join(F.broadcast(ra), "id_a")
        .join(F.broadcast(rb), "id_b")
        .select(
            F.col("id_a").alias("ga"),
            F.col("id_b").alias("gb"),
            F.round(agree / F.lit(num_hashes), 6).alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= threshold)
    )
    da = dmap.select(F.col("gid").alias("ga"), F.col("doc").alias("da"))
    db = dmap.select(F.col("gid").alias("gb"), F.col("doc").alias("db"))
    cross = (
        passing.join(da, "ga")
        # re-spread on the high-cardinality (da, gb) BETWEEN the two
        # fan-outs: without it both joins run in one stage and a
        # mega-group pair (n_a * n_b rows) serializes through the one
        # task its probe row landed on
        .repartition(n_shuffle, "da", "gb")
        .join(db, "gb")
        .select(
            F.least("da", "db").alias("id_a"),
            F.greatest("da", "db").alias("id_b"),
            "est_jaccard",
        )
    )
    return intra.unionByName(cross)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.9,
) -> DataFrame:
    """Near-dup candidate pairs via banded LSH over MinHash signatures.

    rows_per_band = num_hashes // bands; a pair becomes a candidate iff
    some band of the signatures collides, then is kept iff the estimated
    Jaccard (fraction of agreeing signature positions) ≥ threshold.
    Returns (id_a, id_b, est_jaccard).

    Shuffle discipline for scale: the band self-join and the pair
    de-duplication move ONLY (band, bucket, id) / (id_a, id_b) — never
    the signatures. On dup-heavy corpora a bucket with d docs emits
    O(d^2) pairs, and each band membership multiplies that; carrying
    two num_hashes-long arrays through those stages multiplies shuffle
    bytes by ~2*num_hashes. Signatures re-attach AFTER the distinct, so
    verification touches each surviving pair once.
    """
    r = num_hashes // bands
    # localCheckpoint, not cache(): the signature frame is re-read by
    # the grouped pipeline, but a CacheManager entry outlives the call
    # and accumulates across invocations in a long-lived session (the
    # round-5 storage-leak lesson from _bitmask_groups); checkpoint
    # blocks are freed by the ContextCleaner once the caller drops the
    # returned plan.
    sig = minhash_signatures(df, id_col, text_col, num_hashes).localCheckpoint()

    def band_buckets(sig_df: DataFrame, idc: str) -> DataFrame:
        return sig_df.select(
            F.col(idc).alias("doc"),
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(bands - 1)),
                    lambda b: F.struct(
                        b.alias("band"),
                        F.xxhash64(
                            F.array_join(
                                F.transform(
                                    F.slice(F.col("signature"), b * r + 1, r),
                                    lambda h: h.cast("string"),
                                ),
                                ",",
                            )
                        ).alias("bucket"),
                    ),
                )
            ).alias("bb"),
        ).select("doc", F.col("bb.band"), F.col("bb.bucket"))

    return _lsh_pairs_via_groups(sig, id_col, num_hashes, threshold, band_buckets)


def _md5_seed_hash(tok: Column, seed: int) -> Column:
    """Portable hash family H_seed(token) = md5("<seed>:<token>") hex.
    Available verbatim in any engine with md5 (the DuckDB oracle
    included), and the fixed-width lowercase hex string orders
    lexicographically exactly as the 128-bit value orders numerically —
    so MIN() over these strings is a valid minhash. Trade-off vs the
    xxhash64 family: 32-byte strings instead of 8-byte longs in the
    signature (4x shuffle bytes per hash), which is why the portable
    family is the ORACLE tier and xxhash64 stays the 100 TB scale tier."""
    return F.md5(F.concat(F.lit(f"{seed}:"), tok))


def minhash_signatures_portable(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
) -> DataFrame:
    """MinHash signatures over the md5 seed-hash family — same plan
    shape as :func:`minhash_signatures` (one explode + one partially
    aggregated groupBy), engine-portable values (hash-oracle tier)."""
    ex = token_set_df(df, id_col, text_col)
    aggs = [
        F.min(_md5_seed_hash(F.col("tk"), i)).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sig = ex.groupBy("doc").agg(*aggs)
    return sig.select(
        F.col("doc").alias(id_col),
        F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("signature"),
    )


def _band_buckets_portable(
    sig: DataFrame, id_col: str, num_hashes: int, bands: int
) -> DataFrame:
    """(doc, band, bucket) rows for a portable signature table: bucket =
    md5 of the comma-joined signature slice for that band. Shared by the
    full-corpus pipeline (minhash_lsh_pairs_portable) and the delta
    pipeline (lsh_delta_pairs_portable) so both tiers band identically."""
    r = num_hashes // bands
    return sig.select(
        F.col(id_col).alias("doc"),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.md5(
                        F.array_join(F.slice(F.col("signature"), b * r + 1, r), ",")
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("doc", F.col("bb.band"), F.col("bb.bucket"))


def minhash_lsh_pairs_portable(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """Banded-LSH near-dup pairs over the PORTABLE md5 minhash family —
    the cross-engine-verifiable twin of :func:`minhash_lsh_pairs`
    (identical banding/candidate/estimate logic; every value
    reconstructible in SQL, so the whole pipeline sits under the
    DuckDB hash oracle as dd3p). Band bucket = md5 of the
    comma-joined signature slice. Same shuffle discipline: bands move
    (doc, band, bucket) only; signatures re-attach after the distinct."""
    # localCheckpoint for the same storage-hygiene reason as
    # minhash_lsh_pairs (see note there).
    sig = minhash_signatures_portable(df, id_col, text_col, num_hashes).localCheckpoint()
    return _lsh_pairs_via_groups(
        sig,
        id_col,
        num_hashes,
        threshold,
        lambda sig_df, idc: _band_buckets_portable(sig_df, idc, num_hashes, bands),
    )


def _delta_pairs_scored(
    new_sigs: DataFrame,
    index_banded: DataFrame,
    index_sigs: DataFrame,
    id_col: str,
    num_hashes: int,
    threshold: float,
    band_fn,
    salt_fan: int = 32,
) -> DataFrame:
    """(id_a, id_b, est_jaccard) pairs touching a NEW batch, against a
    doc-level (doc, band, bucket) index — the delta twin of
    :func:`_lsh_pairs_via_groups`, asymmetric by design (VERDICT r13
    #2, the dd20 weak): the HISTORY side stays exactly the persisted
    columnar scan (zero md5 recompute, the delta family's core
    contract), while the BATCH side is grouped by signature — new docs
    with identical signatures band, collide, and score identically, so
    the candidate join probes one representative per new GROUP instead
    of every new doc, cutting the quadratic fan-out and the candidate
    distinct by the batch's duplication factor (sf1 day batches: ~3.5x)
    before any pair materializes.

    Two disjoint parts, identical union to the naive (new x new∪index)
    join: new x new runs the full grouped pipeline on the batch alone
    (batch-sized); new-group x index runs a SALTED (band, bucket) join
    — index side salted by hash(doc), the small grouped batch side
    replicated salt_fan ways — so a mega-bucket's fan-out parallelizes
    instead of serializing through one task (the measured dd3p
    single-task signature; replicating the BATCH side keeps the
    corpus-sized index side un-replicated at 100 TB). Candidates dedup
    at (new_gid, index_doc) — each expanded doc pair has exactly one
    source — then score once per group pair and fan back through the
    batch-sized gid map.
    """
    from tw_etl_spark.operators.similarity import _shuffle_width

    n_shuffle = _shuffle_width(new_sigs.sparkSession)
    gid = F.md5(
        F.array_join(
            F.transform("signature", lambda h: h.cast("string")), ","
        )
    )
    sigg = new_sigs.withColumn("gid", gid)
    gmap_new = sigg.select("gid", F.col(id_col).alias("ndoc"))
    reps_new = (
        sigg.select("gid", "signature").dropDuplicates(["gid"]).localCheckpoint()
    )

    nn = _lsh_pairs_via_groups(new_sigs, id_col, num_hashes, threshold, band_fn)

    gb_new = band_fn(reps_new.withColumnRenamed("gid", "__g"), "__g")
    ng = (
        gb_new.withColumn(
            "salt", F.explode(F.sequence(F.lit(0), F.lit(salt_fan - 1)))
        )
        .withColumn("salt", F.col("salt").cast("int"))
        .repartition(n_shuffle, "band", "bucket", "salt")
        .alias("n")
    )
    al = (
        index_banded.select("doc", "band", "bucket")
        .withColumn(
            "salt", F.pmod(F.xxhash64("doc"), F.lit(salt_fan)).cast("int")
        )
        .repartition(n_shuffle, "band", "bucket", "salt")
        .alias("al")
    )
    cross_cand = (
        ng.join(
            al,
            (F.col("n.band") == F.col("al.band"))
            & (F.col("n.bucket") == F.col("al.bucket"))
            & (F.col("n.salt") == F.col("al.salt")),
        )
        .select(F.col("n.doc").alias("gid"), F.col("al.doc").alias("odoc"))
        .distinct()
    )
    rep = reps_new.select("gid", F.col("signature").alias("sig_a"))
    osig = index_sigs.select(
        F.col(id_col).alias("odoc"), F.col("signature").alias("sig_b")
    )
    agree = F.size(
        F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda eq: eq)
    )
    scored = (
        cross_cand.join(F.broadcast(rep), "gid")
        .join(osig, "odoc")
        .select(
            "gid",
            "odoc",
            F.round(agree / F.lit(num_hashes), 6).alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= threshold)
    )
    cross = scored.join(gmap_new, "gid").select(
        F.least("ndoc", "odoc").alias("id_a"),
        F.greatest("ndoc", "odoc").alias("id_b"),
        "est_jaccard",
    )
    return nn.unionByName(cross)


def lsh_delta_pairs_portable(
    new_df: DataFrame,
    index_sigs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
) -> tuple[DataFrame, DataFrame]:
    """INCREMENTAL (delta) near-dup dedup — the production shape at
    100 TB: dedup today's crawl against the persisted survivor index,
    never re-deduping the corpus (VERDICT r10 #4; reference analog: the
    resume-from-snapshot posture of stream_manager/src/stream_manager/
    state.py:59-81, which never re-downloads finished work).

    ``index_sigs`` is the persisted signature table of the
    already-deduped corpus (exactly what minhash_signatures_portable
    emits — (id, signature array); dd3p's own artifact). The NEW batch
    is signed, banded, and joined band-bucket-wise against
    (new ∪ index) buckets — candidate pairs therefore always touch at
    least one new doc; index×index pairs are structurally impossible,
    so the old corpus contributes O(|index|) banding work and zero
    pair work. Because the LSH pair criterion is a pure function of
    the two docs' signatures, result identity holds:

        pairs(old ∪ new) = pairs(old) ∪ delta_pairs(new, index(old))

    (property-tested in tests/test_dedup.py; the dd14 oracle pins the
    delta side cross-engine at three scales).

    Returns ``(delta_pairs, updated_index)``: the pairs touching the
    new batch (id_a < id_b, est_jaccard >= threshold) and the index
    for the NEXT delta (old index ∪ new signatures — caller persists
    it; ids must be disjoint from the index by contract).
    """
    new_sigs = minhash_signatures_portable(
        new_df, id_col, text_col, num_hashes
    ).localCheckpoint()
    updated_index = index_sigs.unionByName(new_sigs)
    # history banding stays this tier's declared O(|index|) recompute;
    # candidates + scoring go through the grouped/salted delta scorer
    delta_pairs = _delta_pairs_scored(
        new_sigs,
        _band_buckets_portable(index_sigs, id_col, num_hashes, bands),
        index_sigs,
        id_col,
        num_hashes,
        threshold,
        lambda sig_df, idc: _band_buckets_portable(sig_df, idc, num_hashes, bands),
    )
    return delta_pairs, updated_index


def merge_survivor_index(
    index: DataFrame, delta: DataFrame
) -> DataFrame:
    """Merge two survivor tables (sig, survivor, n_members) — the
    st5-style exact-signature cluster index. Survivorship is min-id
    (deterministic), counts add; merging batch-by-batch lands on
    exactly the full-corpus recompute (associative + commutative —
    property-tested), which is what makes the index a durable artifact
    a daily delta job can fold into forever."""
    return (
        index.unionByName(delta)
        .groupBy("sig")
        .agg(
            F.min("survivor").alias("survivor"),
            F.sum("n_members").cast("long").alias("n_members"),
        )
    )


def write_survivor_index_bucketed(
    df: DataFrame, table: str, n_buckets: int | None = None
) -> None:
    """Persist a survivor table (sig, survivor, n_members) as a
    sig-BUCKETED, sig-sorted parquet table (VERDICT r11 #4): the write
    pays the sig shuffle ONCE, and every daily merge thereafter joins
    the index side straight off the bucket files — no Exchange over
    history (see :func:`merge_survivor_index_bucketed`), which is the
    difference between a daily O(|delta|) job and re-shuffling a
    corpus-sized index every day.

    ``n_buckets`` defaults to the session's ``spark.sql.shuffle.
    partitions``: Spark only elides the index-side Exchange when the
    join's target partition count equals the bucket count (measured —
    16 buckets under 32 shuffle partitions re-shuffles the BUCKETED
    side up to 32), so buckets must be sized to the consumer, the
    standard bucketing sizing rule at any scale."""
    if n_buckets is None:
        from tw_etl_spark.operators.similarity import _shuffle_width

        n_buckets = _shuffle_width(df.sparkSession)
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, "sig")
        .sortBy("sig")
        .saveAsTable(table)
    )


def merge_survivor_index_bucketed(
    index: DataFrame, delta: DataFrame
) -> DataFrame:
    """:func:`merge_survivor_index` shaped for a bucketed index: the
    small delta pre-aggregates per sig (one shuffle of delta-sized
    data), then a full-outer join on sig merges it into the index —
    whose bucketed layout joins WITHOUT an Exchange (plan-asserted in
    tests/test_plans.py). min-survivorship and additive counts match
    the fold exactly: F.least/greatest skip nulls, so an index-only or
    delta-only sig keeps its side's values."""
    d = delta.groupBy("sig").agg(
        F.min("survivor").alias("survivor"),
        F.sum("n_members").cast("long").alias("n_members"),
    )
    i, dl = index.alias("i"), d.alias("d")
    return i.join(dl, "sig", "full_outer").select(
        "sig",
        F.least("i.survivor", "d.survivor").alias("survivor"),
        (
            F.coalesce("i.n_members", F.lit(0))
            + F.coalesce("d.n_members", F.lit(0))
        ).cast("long").alias("n_members"),
    )


def write_banded_index(
    sigs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    mode: str = "overwrite",
) -> None:
    """Persist the delta-dedup index in its QUERY-SHAPED layout
    (VERDICT r11 #4): the daily job should consume a pruned parquet
    scan, not re-band the whole corpus.

    Two artifacts under ``path``:

    - ``banded/`` — the PRE-BANDED rows (doc, bucket), written
      ``partitionBy(band)``: candidate generation reads exactly these
      three columns (band comes back as the partition column, so a
      per-band probe is a pruned directory scan), and — the 100 TB
      point — the md5 banding of the historical corpus is computed
      ONCE at write time instead of once per daily batch
      (`lsh_delta_pairs_portable` re-bands the full updated index
      every call at dedup.py's `_band_buckets_portable`).
    - ``sigs/`` — the raw signature table (id, signature) the verify
      join consumes.

    Both are APPEND-friendly: banded rows and signatures are immutable
    facts keyed by doc, so the daily job folds the new batch in with
    ``mode="append"`` — no rewrite of history, which is what makes the
    layout viable when the index is 100 TB-corpus-sized.
    """
    import os

    _band_buckets_portable(sigs, id_col, num_hashes, bands).write.mode(
        mode
    ).partitionBy("band").parquet(os.path.join(path, "banded"))
    sigs.write.mode(mode).parquet(os.path.join(path, "sigs"))


def read_banded_index(spark, path: str) -> tuple[DataFrame, DataFrame]:
    """(banded, sigs) readers for a :func:`write_banded_index` root."""
    import os

    return (
        spark.read.parquet(os.path.join(path, "banded")),
        spark.read.parquet(os.path.join(path, "sigs")),
    )


def read_banded_index_with_stream(
    spark, path: str, before_batch: int | None = None
) -> tuple[DataFrame, DataFrame]:
    """(banded, sigs) for a :func:`write_banded_index` root INCLUDING
    any ``stream_banded``/``stream_sigs`` tables maintained by
    :func:`streaming.sinks.lsh_index_stream_writer` — the one reader
    for the full committed index state, shared by the stream writer
    (which passes ``before_batch=bid`` so a replayed micro-batch never
    sees its own crashed partial appends) and by
    :func:`compact_banded_index` (which folds everything).

    Each stream dir gets its OWN existence probe — scheme-aware
    (fs_exists: an s3a:// or file:-URI root takes the same branch a
    POSIX one does) — and an explicit read schema pinned from the seed
    tables: a crash can leave one dir absent or holding only
    _temporary (zero data files, where schema inference raises), and
    both states must read as valid (possibly empty) input."""
    import os

    from pyspark.sql import types as T

    from tw_etl_spark.sources.fsutil import fs_exists

    banded, sigs = read_banded_index(spark, path)
    banded = banded.select("doc", "band", "bucket")
    bid_filter = (
        (F.col("batch_id") < before_batch)
        if before_batch is not None
        else F.lit(True)
    )
    sb_path = os.path.join(path, "stream_banded")
    ss_path = os.path.join(path, "stream_sigs")
    if fs_exists(spark, sb_path):
        sb_schema = T.StructType(
            [
                banded.schema["doc"],
                banded.schema["bucket"],
                T.StructField("batch_id", T.LongType()),
                banded.schema["band"],
            ]
        )
        banded = banded.unionByName(
            spark.read.schema(sb_schema)
            .parquet(sb_path)
            .filter(bid_filter)
            .select("doc", "band", "bucket")
        )
    if fs_exists(spark, ss_path):
        ss_schema = T.StructType(
            list(sigs.schema) + [T.StructField("batch_id", T.LongType())]
        )
        sigs = sigs.unionByName(
            spark.read.schema(ss_schema)
            .parquet(ss_path)
            .filter(bid_filter)
            .select(sigs.columns)
        )
    return banded, sigs


def compact_banded_index(spark, path: str, out_path: str) -> None:
    """Fold a stream-maintained banded index back into its seed layout
    — the lifecycle close on the LSH side, mirroring
    :func:`similarity.recluster_ivf_index` on the IVF side (VERDICT
    r12 #2): ``lsh_index_stream_writer`` accumulates one
    ``stream_banded``/``stream_sigs`` partition directory per
    micro-batch forever, so week two of a daily pipeline reads an
    ever-growing directory listing. Compaction rewrites the union
    (seed ∪ all streamed batches) as a FRESH :func:`write_banded_index`
    root at ``out_path`` — never in place: readers of the live index
    are unaffected until the caller swaps roots (the publish-by-rename
    posture of the shard writers; reference analog: convert.sh:53-57's
    staging-dir rename-into-place).

    Identity (hash-oracled as dd20): banded rows and signatures are
    immutable facts keyed by doc and banding is a pure function of the
    signature, so compact(write(seed) + streamed batches) holds
    EXACTLY the rows write_banded_index(full corpus) produces — no
    re-banding, no md5 recompute: the compaction is one columnar
    read + partitioned write, shuffle-free except the partitionBy(band)
    exchange the seed write itself pays."""
    import os

    # "never in place" is a hard contract, not advice: mode("overwrite")
    # on the live root would truncate banded/sigs while the plan lazily
    # reads them — corrupting or losing the index. Guard the resolved
    # paths (covers ".", trailing slashes, and relative spellings).
    def _norm(p: str) -> str:
        return os.path.abspath(p) if "://" not in p else p.rstrip("/")

    if _norm(out_path) == _norm(path):
        raise ValueError(
            "compact_banded_index: out_path must differ from the live "
            f"index root ({path!r}) — compaction never writes in place; "
            "write to a fresh root and swap after."
        )

    banded, sigs = read_banded_index_with_stream(spark, path)
    banded.write.mode("overwrite").partitionBy("band").parquet(
        os.path.join(out_path, "banded")
    )
    sigs.write.mode("overwrite").parquet(os.path.join(out_path, "sigs"))


def lsh_delta_pairs_prebanded(
    new_df: DataFrame,
    index_banded: DataFrame,
    index_sigs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """:func:`lsh_delta_pairs_portable` against a PERSISTED pre-banded
    index (:func:`write_banded_index`): only the NEW batch is signed
    and banded; the index side is a parquet scan of (doc, band,
    bucket) — zero md5 recompute over history, which at 100 TB turns
    the daily banding cost from O(|corpus|) hashing into a columnar
    read. Ids must be disjoint from the index by contract (same as the
    portable form).

    Returns ``(delta_pairs, new_sigs, new_banded)`` — the caller
    appends the last two to the persisted index (``mode="append"``)
    AFTER materializing the pairs (the pairs plan reads the index
    parquet, so appending first would feed the plan its own output).
    """
    new_sigs = minhash_signatures_portable(
        new_df, id_col, text_col, num_hashes
    ).localCheckpoint()
    new_banded = _band_buckets_portable(new_sigs, id_col, num_hashes, bands)
    # history side: the persisted columnar scan, untouched (zero md5
    # recompute); candidates + scoring via the grouped/salted scorer
    delta_pairs = _delta_pairs_scored(
        new_sigs,
        index_banded,
        index_sigs,
        id_col,
        num_hashes,
        threshold,
        lambda sig_df, idc: _band_buckets_portable(sig_df, idc, num_hashes, bands),
    )
    return delta_pairs, new_sigs, new_banded


def simhash_portable_expr(text: Column, bits: int = 32) -> Column:
    """SimHash over the portable 32-bit hash family: token hash = first
    8 hex chars of md5(token) parsed as an unsigned 32-bit int —
    reconstructible in the DuckDB oracle as ('0x'||substr(md5(tk),1,8))
    ::BIGINT, which puts the signature itself under the hash oracle
    (dd4p). Same per-bit majority vote as :func:`simhash_expr`."""
    from tw_etl_spark.operators.text import let_expr

    toks = F.array_distinct(tokens_expr(text))
    th = F.transform(
        toks, lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")
    )

    # Round 14: bind the md5 token-hash array ONCE via let_expr. The 32
    # per-bit votes each referenced ``th`` directly, and Catalyst never
    # deduplicates lambda-bearing subtrees (EquivalentExpressions skips
    # NamedLambdaVariable), so every row paid 32x the md5+conv transform
    # — measured 3.75 s for 5000 docs at sf0.1. Bound, the hashes are
    # computed once and the 32 votes fold a plain long array
    # (optimization guide §1.2 step 2). Bit-identical votes.
    def simhash_of(h: Column) -> Column:
        def vote(bit: int):
            mask = F.lit(1 << bit)
            return F.aggregate(
                h,
                F.lit(0),
                lambda acc, x: acc
                + F.when(x.bitwiseAND(mask) > 0, 1).otherwise(-1),
            )

        out = F.lit(0).cast("long")
        for b in range(bits):
            out = out + F.when(vote(b) > 0, F.lit(1 << b).cast("long")).otherwise(
                0
            )
        return out

    return let_expr(th, simhash_of)


def simhash_expr(text: Column, bits: int = 32) -> Column:
    """SimHash over the distinct token set: per-bit majority vote of
    32-bit token hashes (crc32 — available in both Spark and the DuckDB
    oracle path via identical md5-prefix arithmetic is NOT needed since
    crc32 exists only Spark-side; oracle checks use md5-prefix hashes,
    see queries/dedup.py)."""
    from tw_etl_spark.operators.text import let_expr

    toks = F.array_distinct(tokens_expr(text))
    th = F.transform(toks, lambda t: F.crc32(t.cast("binary")))

    # Round 14: same let-binding as simhash_portable_expr — the 32
    # votes previously re-evaluated the crc32 transform per bit.
    def simhash_of(h: Column) -> Column:
        def vote(bit: int):
            mask = F.lit(1 << bit)
            return F.aggregate(
                h,
                F.lit(0),
                lambda acc, x: acc
                + F.when(x.bitwiseAND(mask) > 0, 1).otherwise(-1),
            )

        out = F.lit(0).cast("long")
        for b in range(bits):
            out = out + F.when(vote(b) > 0, F.lit(1 << b).cast("long")).otherwise(
                0
            )
        return out

    return let_expr(th, simhash_of)


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Cluster near-dup pairs into components by min-label propagation.

    Returns (id, component) for every id appearing in ``pairs``, where
    ``component`` is the minimum id reachable through the pair graph —
    the canonical representative. This is the union-find step that turns
    pairwise near-dup detection (Jaccard / MinHash-LSH / cosine) into an
    actual dedup, done entirely with DataFrame joins (no driver-side
    graph, no external graph library).

    Scale shape: each iteration is one join + one min-aggregate, both
    hash-partitioned on id — O(E) shuffle per round. Labels move one hop
    per round, so rounds ≈ cluster diameter; near-dup clusters are
    near-cliques (diameter ~2-3) since members share most of their
    content, so convergence is fast regardless of corpus size.
    ``localCheckpoint`` truncates plan lineage each round — without it
    the plan doubles per iteration and the driver, not the data, becomes
    the bottleneck.

    Round 15 (guide §1.2 step 1 — one job per round, not two): the old
    convergence check was a separate join-the-last-two-rounds +
    limit(1).count() job per round. Min-aggregation makes the label
    table monotone — new.component(id) <= old.component(id) — so the
    round changed anything iff sum(component) strictly decreased. The
    sum rides the checkpoint-materialization job itself as an observed
    metric (``df.observe``; DECIMAL(38,0) so arbitrary long ids cannot
    overflow the fold), and the driver compares two scalars. Same
    labels, same exit round; jobs per round: 2 -> 1.
    """
    from pyspark.sql import Observation

    from tw_etl_spark.operators.ckpt import free_local_checkpoint

    edges = pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    edges = (
        edges.union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
    )
    prev_total = None
    prev_ck = None
    for r in range(max_iter):
        msgs = edges.join(labels.withColumnRenamed("id", "a"), "a").select(
            F.col("b").alias("id"), "component"
        )
        obs = Observation(f"cc_round_{r}")
        new_labels = (
            labels.union(msgs)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
            .observe(
                obs,
                F.sum(F.col("component").cast("decimal(38,0)")).alias("t"),
            )
            .localCheckpoint()
        )
        total = obs.get["t"]
        if prev_ck is not None:
            free_local_checkpoint(prev_ck)
        labels, prev_ck = new_labels, new_labels
        if total == prev_total:
            break
        prev_total = total
    return labels


def dedup_by_components(
    df: DataFrame,
    pairs: DataFrame | None = None,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
    labels: DataFrame | None = None,
) -> DataFrame:
    """Survivor set of a near-dedup: drop every row whose component
    representative is a different (smaller) id; rows in no pair survive
    untouched (they never enter the component table).

    Pass either ``pairs`` (labeled here via min-label propagation) or
    precomputed ``labels`` (id, component) — e.g. from
    :func:`exact_jaccard_components`, whose bitmask fast path never
    materializes doc pairs at all."""
    if labels is None:
        if pairs is None:
            raise ValueError("dedup_by_components needs pairs or labels")
        labels = connected_components(pairs, src, dst)
    losers = labels.filter(F.col("id") != F.col("component"))
    return df.join(
        losers.select(F.col("id").alias(id_col)), id_col, "left_anti"
    )


def exact_jaccard_components(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.95,
    max_df: int | None = None,
) -> DataFrame:
    """(id, component) labels over the exact-Jaccard near-dup graph —
    result-identical to ``connected_components(exact_jaccard_pairs(…))``
    without materializing doc pairs when the bitmask strategy engages.

    On dup-heavy corpora the qualifying doc-pair set is quadratic in
    cluster sizes (sf1 fixture: ~2.6M pairs) even though the component
    labeling only needs the graph's connectivity. When token sets fit
    64-bit masks, connectivity lives entirely in the MASK graph: docs
    sharing a mask are one clique, and a qualifying mask pair connects
    two cliques. So this labels the ≤65536-node mask graph (min-label
    propagation over mask pairs — thousands of edges, not millions),
    takes each component's representative as the min doc id over member
    masks, and maps docs to labels with one broadcast join + explode.
    No doc-pair shuffle exists anywhere in the plan.

    Falls back to pair-level propagation under the PPJoin strategy,
    where candidate pruning already bounds the pair set.
    """
    ex = _retained_token_sets(df, id_col, text_col, max_df)
    vocab = _bitmask_vocab(ex)
    if vocab is not None:
        groups = _bitmask_groups(ex, vocab)
        if groups is not None:
            return _components_from_mask_groups(groups, threshold)
    return connected_components(_jaccard_pairs_ppjoin(ex, threshold))


# Bounded driver state for the mask-graph labeling: ≤65536 nodes by
# construction, and edge collection is capped here (2M edges ≈ 32 MB of
# longs). Past the cap the DataFrame min-label propagation takes over —
# the fast path degrades, it never OOMs the driver.
_MASK_EDGE_COLLECT_MAX = 2_000_000


def _label_masks_driver(edges: DataFrame) -> list[tuple[int, int]] | None:
    """(mask, component) labels via driver-side union-find, or None when
    the edge set exceeds the bounded-collect cap. The mask graph is
    ≤65536 nodes, so union-find is microseconds where the per-round
    join/agg/checkpoint cycle of the DataFrame propagation costs ~1 s of
    job overhead PER HOP on a cluster — the classic "tiny graph, big
    engine" inversion. Component representative = min mask, matching
    connected_components' min-label semantics."""
    rows = edges.limit(_MASK_EDGE_COLLECT_MAX + 1).collect()
    if len(rows) > _MASK_EDGE_COLLECT_MAX:
        return None
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in rows:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min keeps the representative the smallest mask
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return [(m, find(m)) for m in parent]


def _components_from_mask_groups(groups: DataFrame, threshold: float) -> DataFrame:
    """Label docs through the distinct-mask graph. ``groups`` is the
    localCheckpointed (mask, docs) relation; every frame here except
    the final explode is ≤65536 rows."""
    edges = _bitmask_mask_pairs(groups, threshold).select("mask_a", "mask_b")
    labeled = _label_masks_driver(edges)
    if labeled is not None:
        mlabels = groups.sparkSession.createDataFrame(
            labeled or [(-1, -1)], "mask LONG, mcomp LONG"
        )
        if not labeled:
            mlabels = mlabels.filter(F.lit(False))
    else:
        mlabels = connected_components(edges, "mask_a", "mask_b").select(
            F.col("id").alias("mask"), F.col("component").alias("mcomp")
        )
    stats = groups.select(
        "mask",
        F.array_min("docs").alias("min_doc"),
        F.size("docs").alias("n_docs"),
        "docs",
    )
    # A doc appears in some qualifying pair iff its mask has a same-mask
    # twin (n_docs > 1 → within-clique J = 1.0) or any cross-mask edge;
    # test participation BEFORE defaulting isolated masks to themselves.
    lab = stats.join(F.broadcast(mlabels), "mask", "left")
    part = lab.filter((F.col("n_docs") > 1) | F.col("mcomp").isNotNull()).withColumn(
        "mcomp", F.coalesce("mcomp", F.col("mask"))
    )
    reps = part.groupBy("mcomp").agg(F.min("min_doc").alias("component"))
    return (
        part.join(F.broadcast(reps), "mcomp")
        .select(F.explode("docs").alias("id"), "component")
    )


def ngram_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    mark_only: bool = False,
) -> DataFrame:
    """Benchmark decontamination: drop (or, with ``mark_only``, flag)
    corpus documents that share ANY token n-gram with a benchmark/eval
    corpus — the standard guard against test-set contamination in
    training data.

    Scale shape: the benchmark side reduces to its DISTINCT n-gram
    64-bit hashes — eval sets are MBs next to a 100 TB corpus, so that
    set broadcasts, and the corpus-side semi-join happens map-side
    inside the scan stage with NO shuffle of the exploded corpus
    n-grams. Only the contaminated id set (tiny) is shuffled for the
    final anti/left join.
    """
    from tw_etl_spark.operators.text import ngrams_expr, tokens_expr

    def grams(df: DataFrame) -> DataFrame:
        g = F.explode(ngrams_expr(tokens_expr(F.col(text_col)), n))
        return df.select(F.col(id_col).alias("doc"), g.alias("g")).select(
            "doc", F.xxhash64("g").alias("gh")
        )

    bench = F.broadcast(grams(benchmark).select("gh").distinct())
    dirty = (
        grams(corpus)
        .join(bench, "gh", "left_semi")
        .select(F.col("doc").alias(id_col))
        .distinct()
    )
    if mark_only:
        flag = dirty.withColumn("contaminated", F.lit(True))
        return corpus.join(flag, id_col, "left").withColumn(
            "contaminated", F.coalesce("contaminated", F.lit(False))
        )
    return corpus.join(dirty, id_col, "left_anti")


def kmeans_assign(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    seed: int = 7,
    cluster_col: str = "cluster",
) -> DataFrame:
    """Assign each embedding to one of ``k`` k-means clusters (fixed
    seed → deterministic). Vectors are L2-normalized first so Euclidean
    k-means approximates cosine clustering. Keeps all input columns and
    appends ``cluster_col``."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    from tw_etl_spark.functions.vectors import l2_norm_expr

    v = F.col(vec_col).cast("array<double>")
    norm = F.greatest(l2_norm_expr(v), F.lit(1e-12))
    unit = F.transform(v, lambda x: x / norm)
    feats = df.withColumn("_f", array_to_vector(unit))
    model = KMeans(
        k=k, seed=seed, featuresCol="_f", predictionCol=cluster_col, maxIter=20
    ).fit(feats)
    return model.transform(feats).drop("_f")


def within_cluster_pairs(
    assigned: DataFrame,
    id_col: str,
    vec_col: str,
    cluster_col: str,
    threshold: float,
    similarity: str = "dot",
    cluster_cell_budget: int | None = DEFAULT_CLUSTER_CELL_BUDGET,
) -> DataFrame:
    """Similarity-threshold pairs WITHIN each cluster, in two stages:

    1. **Candidate scan** per cluster (``applyInPandas``): blocked
       ``X @ X.T`` over the cluster's vectors with an epsilon-margined
       threshold — BLAS does the O(m²·d) work instead of a JVM
       fold-per-pair join (measured: the fold join burned 32 cores for
       >15 min on an 80k×64-dim corpus at k=64; the blocked matmul
       does the same 100M-pair scan in seconds).
    2. **Authoritative verify** Spark-side on the surviving candidates
       only: the exact index-order fold dot/cosine, rounded to 6 —
       bit-identical to the DuckDB oracle, so numpy's different
       float-sum order can never flip a boundary pair (the same
       prefilter/verify split as the bitmask Jaccard scan).

    ``similarity="dot"`` treats vectors as already unit-normalized
    (dd8p's contract); ``"cosine"`` normalizes inside the scan and
    verifies with the full cosine expression. Per-cluster memory is
    m·d doubles plus an m×1024 score tile — bound it by scaling the
    cluster count with n; ``cluster_cell_budget`` enforces that
    contract loudly (an oversized cluster raises with raise-k guidance
    before the matmul allocates, instead of OOMing the worker).
    """
    import numpy as np
    import pandas as pd

    from tw_etl_spark.functions.vectors import cosine_similarity_expr, dot_expr

    if similarity not in ("dot", "cosine"):
        raise ValueError(f"similarity must be dot|cosine, got {similarity!r}")
    pre = float(threshold) - 1e-6
    normalize = similarity == "cosine"

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy()
        n = len(ids)
        if n < 2:
            return pd.DataFrame(
                {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64")}
            )
        _check_cluster_budget(
            n, len(pdf[vec_col].iloc[0]), cluster_cell_budget,
            "within_cluster_pairs",
        )
        X = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
        if normalize:
            X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        outs_a, outs_b = [], []
        block = 1024
        for i0 in range(0, n, block):
            S = X[i0 : i0 + block] @ X.T
            ii, jj = np.nonzero(S >= pre)
            gi = ii + i0
            keep = gi < jj  # each unordered position pair once
            gi, jj = gi[keep], jj[keep]
            if len(gi):
                a, b = ids[gi], ids[jj]
                outs_a.append(np.minimum(a, b))
                outs_b.append(np.maximum(a, b))
        if not outs_a:
            return pd.DataFrame(
                {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64")}
            )
        return pd.DataFrame(
            {"id_a": np.concatenate(outs_a), "id_b": np.concatenate(outs_b)}
        )

    cand = (
        assigned.select(cluster_col, id_col, vec_col)
        .groupBy(cluster_col)
        .applyInPandas(scan, "id_a long, id_b long")
    )
    va = assigned.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    vb = assigned.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    verify = (
        dot_expr(F.col("_va"), F.col("_vb"))
        if similarity == "dot"
        else cosine_similarity_expr(F.col("_va"), F.col("_vb"))
    )
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .filter(F.round(verify, 6) >= threshold)
        .select("id_a", "id_b")
    )


def within_cluster_delta_pairs(
    assigned: DataFrame,
    id_col: str,
    vec_col: str,
    cluster_col: str,
    new_col: str,
    threshold: float,
    cluster_cell_budget: int | None = DEFAULT_CLUSTER_CELL_BUDGET,
) -> DataFrame:
    """Delta form of :func:`within_cluster_pairs` (the dd17 primitive):
    per cluster, candidate pairs are NEW-vs-ALL instead of ALL-vs-ALL —
    ``X_new @ X_all.T`` per block, so a daily batch costs
    |new_c|·|all_c| dot products per cluster and index×index pairs are
    structurally impossible. Each new-new pair emits once (counterpart
    id must exceed the scanning id); new-index pairs always report.
    Vectors are treated as unit-normalized (the dd8p "dot" contract);
    the authoritative verify re-folds the exact index-order dot and
    rounds to 6, bit-identical to the oracle. Returns
    (id_a, id_b, cos_sim). ``cluster_cell_budget`` bounds the one
    cluster a worker materializes (m·d cells), raising with raise-k
    guidance instead of OOMing.
    """
    import numpy as np
    import pandas as pd

    from tw_etl_spark.functions.vectors import dot_expr

    pre = float(threshold) - 1e-6

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64")}
        )
        ids = pdf[id_col].to_numpy()
        is_new = pdf[new_col].to_numpy(dtype=bool)
        n = len(ids)
        if n < 2 or not is_new.any():
            return empty
        _check_cluster_budget(
            n, len(pdf[vec_col].iloc[0]), cluster_cell_budget,
            "within_cluster_delta_pairs",
        )
        X = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
        Xn, ids_n = X[is_new], ids[is_new]
        outs_a, outs_b = [], []
        block = 1024
        for i0 in range(0, len(ids_n), block):
            S = Xn[i0 : i0 + block] @ X.T
            ii, jj = np.nonzero(S >= pre)
            qid = ids_n[ii + i0]
            cid = ids[jj]
            # self out; new counterpart only above the scanning id
            keep = (qid != cid) & (~is_new[jj] | (cid > qid))
            qid, cid = qid[keep], cid[keep]
            if len(qid):
                outs_a.append(np.minimum(qid, cid))
                outs_b.append(np.maximum(qid, cid))
        if not outs_a:
            return empty
        return pd.DataFrame(
            {"id_a": np.concatenate(outs_a), "id_b": np.concatenate(outs_b)}
        )

    cand = (
        assigned.select(cluster_col, id_col, vec_col, new_col)
        .groupBy(cluster_col)
        .applyInPandas(scan, "id_a long, id_b long")
    )
    va = assigned.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    vb = assigned.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(dot_expr(F.col("_va"), F.col("_vb")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    threshold: float = 0.97,
    seed: int = 7,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): k-means-cluster the embeddings, compare cosine
    similarity only WITHIN each cluster, and keep one representative
    per near-dup component (min id). Returns the survivor rows of
    ``df``.

    Scale shape: clustering reduces the O(n²) all-pairs problem to
    sum-of-squares over cluster sizes; each cluster's pair scan runs
    as a blocked numpy matmul inside ``applyInPandas`` (BLAS does the
    O(m²·d) work — measured 1000x over the JVM fold-per-pair join at
    80k vectors, which burned 30 cores for >15 min), epsilon-margined,
    with the authoritative threshold re-checked Spark-side on the few
    surviving candidates (see :func:`within_cluster_pairs`). Raise
    ``k`` with n to bound per-cluster memory (m·d doubles + the m×block
    score tile).
    """
    assigned = kmeans_assign(df, id_col, vec_col, k=k, seed=seed, cluster_col="_c")
    pairs = within_cluster_pairs(
        assigned, id_col, vec_col, "_c", threshold, similarity="cosine"
    )
    return dedup_by_components(df, pairs, id_col=id_col)


def duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Cross-document duplicated-span detection (the signal behind
    exact-substring training-data dedup, Lee et al. 2022,
    arXiv:2107.06499): a token position is "duplicated" when the
    n-gram starting there also occurs in ANOTHER document; maximal
    runs of duplicated positions merge into spans.

    Returns one row per document that contains at least one duplicated
    span: (id, n_dup_spans, dup_tokens, dup_frac) where dup_tokens
    counts tokens covered by merged spans and dup_frac divides by the
    doc's token count.

    Fully relational — no Python in the row path:

    1. per-doc n-grams with 1-based positions (one narrow map:
       transform over sequence + explode) — the exploded table is
       produced and shuffled ONCE;
    2. a position is duplicated iff its gram occurs beyond its own
       doc: ``count() over (gram) > count() over (gram, doc)`` — two
       window counts sharing ONE hash exchange on the gram (the
       second spec only adds a sort key), replacing the
       groupBy-then-semi-join formulation that scanned and shuffled
       the exploded table twice;
    3. island merge per doc: a position extends the current span iff
       pos <= prev + n (overlap or adjacency), else a new span starts —
       lag + running-sum window, the relational form of the
       reference's gap segmentation (convert.sh:60-62).

    The shuffle key is xxhash64 of the gram text (8 bytes), never the
    gram string itself — the t14 lesson; collision probability across
    a 100 TB corpus vocabulary is ~1e-12 per pair and only MERGES two
    grams (a false "duplicate"), never splits one.
    """
    from pyspark.sql.window import Window

    w_g = Window.partitionBy("gh")
    w_gd = Window.partitionBy("gh", "doc")
    hits = (
        _gram_positions(df, id_col, text_col, n)
        .withColumn("n_all", F.count(F.lit(1)).over(w_g))
        .withColumn("n_own", F.count(F.lit(1)).over(w_gd))
        .filter(F.col("n_all") > F.col("n_own"))
        .drop("n_all", "n_own")
    )
    return _merge_span_islands(hits, id_col, n)


def _gram_positions(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(doc, n_tok, pos, gh) — per-doc n-grams with 1-based positions,
    gram identity as 8-byte xxhash64 (the shared front half of
    :func:`duplicate_spans` and its delta form)."""
    base = df.select(
        F.col(id_col).alias("doc"), tokens_expr(F.col(text_col)).alias("tk")
    ).filter(F.size("tk") >= n)
    return base.select(
        "doc",
        F.size("tk").alias("n_tok"),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("tk") - (n - 1)),
                lambda i: F.struct(
                    i.alias("pos"),
                    F.xxhash64(F.concat_ws(" ", F.slice("tk", i, n))).alias("gh"),
                ),
            )
        ).alias("g"),
    ).select("doc", "n_tok", F.col("g.pos").alias("pos"), F.col("g.gh").alias("gh"))


def _merge_span_islands(hits: DataFrame, id_col: str, n: int) -> DataFrame:
    """Island merge + per-doc span stats (the shared back half of
    :func:`duplicate_spans` and its delta form): a duplicated position
    extends the current span iff pos <= prev + n, else a new span
    starts — lag + running-sum window."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc").orderBy("pos")
    run = Window.partitionBy("doc").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, 0
    )
    spans = (
        hits.withColumn(
            "brk",
            F.when(F.lag("pos").over(w).isNull(), 1)
            .when(F.col("pos") > F.lag("pos").over(w) + n, 1)
            .otherwise(0),
        )
        .withColumn("island", F.sum("brk").over(run))
        .groupBy("doc", "island")
        .agg(
            F.first("n_tok").alias("n_tok"),
            (F.max("pos") + n - F.min("pos")).alias("span_toks"),
        )
    )
    return (
        spans.groupBy("doc")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_dup_spans"),
            F.sum("span_toks").cast("bigint").alias("dup_tokens"),
            F.round(
                F.sum("span_toks") / F.first("n_tok"), 6
            ).alias("dup_frac"),
        )
        .withColumnRenamed("doc", id_col)
    )


def gram_count_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """(gh, cnt) — n-gram-hash occurrence counts, the persisted INDEX
    for :func:`delta_duplicate_spans` (the exact-substring cell of the
    delta-dedup family beside dd14's LSH bands, dd15's survivor sigs,
    dd16's embeddings, dd17's centroids). One groupBy over the gram
    explode; mergeable across batches with :func:`merge_gram_index`
    (sum of counts — associative and commutative, so daily jobs fold
    their batch's counts into the corpus index instead of re-scanning
    100 TB of history)."""
    return (
        _gram_positions(df, id_col, text_col, n)
        .groupBy("gh")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def merge_gram_index(a: DataFrame, b: DataFrame) -> DataFrame:
    """Fold two gram-count indexes: union + sum. Associative and
    commutative (integer sum), so any batch fold order lands the same
    index — the dd15 merge contract for the span family."""
    return (
        a.unionByName(b)
        .groupBy("gh")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )


def write_gram_index_bucketed(
    index_df: DataFrame, table: str, n_buckets: int | None = None
) -> None:
    """Persist a :func:`gram_count_index` table (gh, cnt) gh-BUCKETED
    and gh-sorted — the dd15-bucketed treatment for the span family's
    index, which is the LARGEST index in the delta family (one row per
    distinct n-gram ≈ corpus token count): the write pays the gh
    shuffle once, and every daily :func:`delta_duplicate_spans` join
    and :func:`merge_gram_index_bucketed` fold thereafter reads the
    index branch straight off the bucket files with no Exchange over
    history (plan-asserted in tests/test_plans.py).

    ``n_buckets`` defaults to the session's shuffle partitions — Spark
    only elides the bucketed side's Exchange when the join's target
    partition count equals the bucket count (the sizing rule measured
    for the survivor index)."""
    if n_buckets is None:
        from tw_etl_spark.operators.similarity import _shuffle_width

        n_buckets = _shuffle_width(index_df.sparkSession)
    (
        index_df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, "gh")
        .sortBy("gh")
        .saveAsTable(table)
    )


def merge_gram_index_bucketed(
    index: DataFrame, delta: DataFrame
) -> DataFrame:
    """:func:`merge_gram_index` shaped for a bucketed index: the
    daily delta pre-aggregates per gh (one shuffle of batch-sized
    data), then a full-outer join on gh folds it into the index —
    whose bucketed layout joins WITHOUT an Exchange. Additive counts
    match the union+groupBy fold exactly (coalesce(0) on both sides)."""
    d = delta.groupBy("gh").agg(F.sum("cnt").cast("long").alias("cnt"))
    i, dl = index.alias("i"), d.alias("d")
    return i.join(dl, "gh", "full_outer").select(
        "gh",
        (
            F.coalesce("i.cnt", F.lit(0)) + F.coalesce("d.cnt", F.lit(0))
        ).cast("long").alias("cnt"),
    )


def delta_duplicate_spans(
    new_df: DataFrame,
    index_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """INCREMENTAL duplicated-span detection: span stats for the NEW
    batch's documents against (old corpus ∪ new batch), where the old
    corpus is represented ONLY by its persisted
    :func:`gram_count_index` — the daily job never re-tokenizes the
    100 TB history. A new-doc position is duplicated iff its n-gram
    occurs beyond its own document in the union, i.e.
    ``cnt_old + n_all_new > n_own`` (index count plus the batch-wide
    window count vs the within-doc count), which is exactly
    :func:`duplicate_spans`' criterion on the union restricted to new
    docs — so the delta output EQUALS the full re-scan's rows for the
    new batch (the dd14/dd16 identity, hash-oracled as dd19).

    Plan shape: the gram explode is the new batch only; the two window
    counts and the left join against the index all key on ``gh``, so
    one hash exchange of the batch's grams serves all three; the
    index side is a corpus-sized but LINEAR scan (never re-banded,
    never re-hashed — the counts were paid once at index time).
    Ids in ``new_df`` must be disjoint from the docs the index was
    built over (the index carries no doc ids to check against — same
    contract as the rest of the delta family)."""
    from pyspark.sql.window import Window

    w_g = Window.partitionBy("gh")
    w_gd = Window.partitionBy("gh", "doc")
    hits = (
        _gram_positions(new_df, id_col, text_col, n)
        .withColumn("n_all", F.count(F.lit(1)).over(w_g))
        .withColumn("n_own", F.count(F.lit(1)).over(w_gd))
        .join(index_df.select("gh", "cnt"), "gh", "left")
        .withColumn("cnt_old", F.coalesce(F.col("cnt"), F.lit(0)))
        .filter(F.col("cnt_old") + F.col("n_all") > F.col("n_own"))
        .drop("n_all", "n_own", "cnt", "cnt_old")
    )
    return _merge_span_islands(hits, id_col, n)


def unit_vectors(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, u) with u = v / max(||v||, 1e-12) in double precision —
    index-order fold, IEEE bit-compatible with DuckDB's
    ``list_dot_product``-based normalization."""
    from tw_etl_spark.functions.vectors import l2_norm_expr

    v = F.col(vec_col).cast("array<double>")
    norm = F.greatest(l2_norm_expr(v), F.lit(1e-12))
    return df.select(
        F.col(id_col).alias("id"),
        F.transform(v, lambda x: x / norm).alias("u"),
    )


def kmeans_dists_expr(cents: list[list[float]], u_col: str = "u") -> Column:
    """array of squared-L2 distances from ``u_col`` to each literal
    centroid, each an index-order fold (engine-reconstructible).

    Round 15 (VERDICT r14 #1 — dd8p exonerated the hard way): the
    round-14 form wrapped the k folds in ONE ``transform`` over a
    nested literal to cut plan-construction py4j calls, but the
    interleaved fresh-JVM A/B (tools/ab_dd8p.py) showed it EVALUATES
    slower — dd8p best walls 13.4-17.5 s (per-centroid trees) vs
    17.3-19.3 s (transform form) on quiet-probe windows, and the
    steal-independent JVM CPU metric 33.6-35.7 s vs 36.5-46.0 s: the
    extra lambda binding + nested element access per row costs ~15-25%
    CPU in the interpreted HOF path.  This form keeps BOTH properties:
    per-centroid fold trees (the fast r13 eval shape) with each
    centroid shipped as one PARSED array literal (k py4j round-trips
    total instead of k*dim — construction stays milliseconds).
    Per-centroid arithmetic — zip_with in index order, 0.0-seeded left
    fold — is unchanged in all three forms, so every distance is
    bit-identical and the dd8p/v4p/v7p..v10/dd17/st11 oracles are
    untouched (optimization guide §1.2 step 2).

    ``u_col`` may be a column name or an arbitrary array Column (the
    v6p product-quantization subspaces pass vector slices directly)."""
    from tw_etl_spark.functions.vectors import double_array_lit

    u = F.col(u_col) if isinstance(u_col, str) else u_col
    return F.array(
        *[
            F.aggregate(
                F.zip_with(u, double_array_lit(c), lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, t: acc + t,
            )
            for c in cents
        ]
    )


def kmeans_assign_expr(cents: list[list[float]], u_col: str = "u") -> Column:
    """argmin_j ||u - c_j||^2 with first-wins (smallest j) ties —
    a strictly-less fold over the literal-centroid distance array, so
    both the arithmetic and the tie-break are engine-reconstructible.
    Shared by dd8p (semantic dedup) and v4p (portable IVF)."""
    from tw_etl_spark.operators.text import let_expr

    if len(cents) == 1:
        # One centroid: argmin is trivially 0. The general fold below
        # would build sequence(1, 0) — Spark evaluates that DESCENDING
        # ([1, 0]), making the fold read element_at(ds, 2) on a 1-element
        # array: ARRAY_INDEX_OUT_OF_BOUNDS under ANSI mode.
        return F.lit(0)
    dists = kmeans_dists_expr(cents, u_col)
    return let_expr(
        dists,
        lambda ds: F.aggregate(
            F.sequence(F.lit(1), F.lit(len(cents) - 1)),
            F.struct(F.element_at(ds, 1).alias("d"), F.lit(0).alias("j")),
            lambda acc, i: F.when(
                F.element_at(ds, i + 1) < acc["d"],
                F.struct(F.element_at(ds, i + 1).alias("d"), i.alias("j")),
            ).otherwise(acc),
        )["j"],
    )


def relational_kmeans_centroids(
    unit: DataFrame, k: int
) -> tuple[list[list[float]], list[list[float]]]:
    """Oracle-replayable k-means: seed centroids = unit vectors of the
    ``k`` smallest ids, then ONE Lloyd update whose element-wise member
    means use SCALED-INTEGER accumulation — each coordinate quantized to
    nano-units (round(u*1e9) as BIGINT, exact for any partition/scan
    order), summed exactly, divided once at the end.  A float sum here
    would be partition-order-dependent on the Spark side and
    scan-order-dependent in the DuckDB oracle; rounding the mean cannot
    repair a sum that already differs at the last ulp.  Overflow bound:
    |u| <= 1 so |sum| <= 1e9 * members — safe for clusters below
    ~9.2e9 rows.  Empty clusters drop out (dense renumber) on both
    sides identically.

    Returns (seeds, updated_centroids); both collects are k-row bounded.
    """
    from tw_etl_spark.functions.rounding import exact_round_ratio

    seeds = [list(r.u) for r in unit.orderBy("id").limit(k).collect()]
    dim = len(seeds[0])
    a1 = unit.select("id", "u", kmeans_assign_expr(seeds).alias("c1"))
    # (the multi-stage batching in relational_kmeans_centroids_multi
    # replays exactly this seed rule and mean arithmetic — keep in sync)
    # mean in nano-units rounded to the nearest integer IN INTEGER
    # ARITHMETIC (exact_round_ratio): s/c regularly lands on exact
    # decimal halves where float round(x, 9) diverges cross-engine
    mean_rows = (
        a1.groupBy("c1")
        .agg(
            *[
                (
                    exact_round_ratio(
                        F.sum(F.round(F.col("u")[i] * 1e9, 0).cast("long")),
                        F.count(F.lit(1)),
                        0,
                    )
                    / F.lit(1e9)
                ).alias(f"m{i}")
                for i in range(dim)
            ]
        )
        .orderBy("c1")
        .collect()
    )
    cents2 = [[float(r[f"m{i}"]) for i in range(dim)] for r in mean_rows]
    return seeds, cents2


def relational_kmeans_centroids_multi(
    unit: DataFrame, specs: list[tuple[int, int, int]]
) -> list[tuple[list[list[float]], list[list[float]]]]:
    """Batched :func:`relational_kmeans_centroids` over several
    independent stages of the SAME unit-vector table — v6p's staging
    (1 coarse k-means + m_sub per-subspace codebooks) previously ran
    2 bounded jobs per stage (seed collect + mean aggregate), 18 jobs
    of ~a scheduler floor each; this runs ONE seed collect and ONE
    union-aggregate job for every stage (guide §1.2 step 1 /
    VERDICT r14 #3).

    ``specs[i] = (k_i, offset_i, len_i)``: stage i trains ``k_i``
    centroids on the 0-based coordinate slice
    ``u[offset_i : offset_i + len_i]``.

    Value identity with the per-stage form (pinned by
    tests/test_r15_optimizations.py): seeds are the unit vectors of the
    k smallest ids — slicing commutes with orderBy(id).limit(k), so one
    max(k_i)-row collect serves every stage; means use the same
    round(u*1e9) BIGINT accumulation + exact_round_ratio per
    (stage, cluster, coordinate), which is partition-order-independent,
    so batching the stages into one union cannot move a single bit.
    Empty clusters drop out per stage exactly as in the single form.
    """
    from tw_etl_spark.functions.rounding import exact_round_ratio

    max_k = max(k for k, _, _ in specs)
    head = [list(r.u) for r in unit.orderBy("id").limit(max_k).collect()]
    seeds_per_stage = [
        [row[off : off + ln] for row in head[:k]] for k, off, ln in specs
    ]

    stage_frames = []
    for i, (k, off, ln) in enumerate(specs):
        sub = F.slice(F.col("u"), off + 1, ln)
        assign = kmeans_assign_expr(seeds_per_stage[i], sub)
        # two projections: a Generate in the SAME select strips the
        # aliases inside the assign fold's struct (analyzer quirk —
        # FIELD_NOT_FOUND col1/col2), so assign first, explode second
        stage_frames.append(
            unit.select(
                F.lit(i).alias("stage"),
                assign.alias("c1"),
                F.transform(
                    sub, lambda x: F.round(x * 1e9, 0).cast("long")
                ).alias("nanos"),
            ).select(
                "stage",
                "c1",
                F.posexplode(F.col("nanos")).alias("idx", "nano"),
            )
        )
    frame = stage_frames[0]
    for f in stage_frames[1:]:
        frame = frame.unionByName(f)
    mean_rows = (
        frame.groupBy("stage", "c1", "idx")
        .agg(
            (
                exact_round_ratio(F.sum("nano"), F.count(F.lit(1)), 0)
                / F.lit(1e9)
            ).alias("m")
        )
        .collect()
    )
    out = []
    for i, (k, off, ln) in enumerate(specs):
        rows = [r for r in mean_rows if r.stage == i]
        clusters = sorted({r.c1 for r in rows})
        by_cc = {(r.c1, r.idx): float(r.m) for r in rows}
        cents2 = [[by_cc[(c, j)] for j in range(ln)] for c in clusters]
        out.append((seeds_per_stage[i], cents2))
    return out


def semantic_dedup_relational(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    threshold: float = 0.95,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023) re-expressed so every intermediate
    is engine-reconstructible — the hash-oracle twin of
    :func:`semantic_dedup` (whose MLlib KMeans is a black box to any
    oracle). Pipeline, pinned step by step in the dd8p oracle:

    1. unit-normalize (double precision, index-order fold — IEEE
       bit-compatible with DuckDB's ``list_dot_product``);
    2. seed centroids = unit vectors of the ``k`` smallest ids;
    3. assign each vector to the nearest centroid (squared L2,
       ties -> smallest cluster index, via a strictly-less fold);
    4. ONE Lloyd update: centroid = element-wise mean of its members
       via scaled-integer accumulation (round(u*1e9) as BIGINT, exact
       sum, one final division) — order-independent by construction,
       so no cross-engine sum-order divergence is possible;
    5. reassign against the updated centroids;
    6. within-cluster cosine pairs (unit dot) >= ``threshold``;
    7. min-label components -> survivor = component representative.

    Returns (id, cluster, survived), one row per input row.

    Scale shape: both assignments are SHUFFLE-FREE narrow maps (the k
    centroids ride inside the expression as literals — two bounded
    collects of k rows each, never data-sized); the Lloyd update is one
    partially-aggregated groupBy producing k rows; the within-cluster
    pair scan is the blocked-matmul + exact-fold-verify split of
    :func:`within_cluster_pairs` (the verify stage keeps the oracle
    contract bit-identical).
    """
    unit = unit_vectors(df, id_col, vec_col)
    seeds, cents2 = relational_kmeans_centroids(unit, k)
    a2 = unit.select("id", "u", kmeans_assign_expr(cents2).alias("cluster"))

    pairs = within_cluster_pairs(a2, "id", "u", "cluster", threshold)
    labels = connected_components(pairs, "id_a", "id_b")
    return (
        a2.join(labels.withColumnRenamed("id", "id_"), F.col("id") == F.col("id_"), "left")
        .select(
            F.col("id"),
            F.col("cluster"),
            (F.col("component").isNull() | (F.col("component") == F.col("id"))).alias(
                "survived"
            ),
        )
    )


def bloom_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    m_bits: int = 65536,
    k_hashes: int = 3,
) -> DataFrame:
    """Bloom-prefiltered benchmark decontamination — the 100 TB tier of
    :func:`ngram_decontaminate`, with the filter itself under the hash
    oracle (x11).

    The benchmark's distinct n-grams build an ``m_bits`` Bloom filter
    with ``k_hashes`` md5-derived hash functions (position i =
    uint32(md5(i ":" gram)) % m_bits) — engine-reconstructible, so the
    oracle rebuilds the identical bitmap and the per-document Bloom hit
    counts (INCLUDING false positives) hash-match cross-engine, not
    just the final exact verdict.

    Scale shape: the bitmap is m_bits/64 longs folded into the corpus
    expression as literals (8 KiB at the default — rides inside the
    task binary, cheaper than any broadcast), so the per-gram membership
    test is a zero-shuffle narrow map over the n-gram array (no explode
    for the count). Only grams that PASS the Bloom are exploded into
    the exact semi-join against the broadcast benchmark set — at a
    false-positive rate of (1-e^{-kn/m})^k the explode volume drops by
    orders of magnitude versus joining every corpus n-gram, which is
    the point of Bloom pushdown in every warehouse engine. Exact verify
    removes false positives, so ``contaminated`` equals
    :func:`ngram_decontaminate`'s verdict bit for bit.

    Returns (id, n_grams, n_bloom_hits, contaminated).
    """
    from tw_etl_spark.operators.text import let_expr, ngrams_expr, tokens_expr

    assert m_bits % 64 == 0
    n_words = m_bits // 64

    grams_arr = ngrams_expr(tokens_expr(F.col(text_col)), n)

    bench_grams = (
        benchmark.select(
            F.explode(ngrams_expr(tokens_expr(F.col(text_col)), n)).alias("g")
        )
        .distinct()
    )
    # bitmap: bounded collect of <= m_bits/64 rows (1024 longs default)
    pos = bench_grams.select(
        F.explode(
            F.array(
                *[
                    (
                        F.conv(
                            F.substring(
                                F.md5(F.concat(F.lit(f"{i}:"), F.col("g"))), 1, 8
                            ),
                            16,
                            10,
                        ).cast("long")
                        % m_bits
                    )
                    for i in range(k_hashes)
                ]
            )
        ).alias("p")
    ).distinct()
    word_rows = (
        pos.select(
            (F.col("p") / 64).cast("long").alias("w"),
            F.expr("shiftleft(cast(1 as bigint), cast(p % 64 as int))").alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("bits"))
        .collect()
    )
    words = {int(r.w): int(r.bits) for r in word_rows}
    # Round 14: one parsed array literal instead of 2*n_words py4j
    # calls (~3 s of plan construction at the 1024-word default).
    from tw_etl_spark.functions.vectors import long_array_lit

    bloom_lit = long_array_lit([words.get(w, 0) for w in range(n_words)])

    def bloom_hit(g: Column) -> Column:
        test = F.lit(True)
        for i in range(k_hashes):
            p = (
                F.conv(F.substring(F.md5(F.concat(F.lit(f"{i}:"), g)), 1, 8), 16, 10)
                .cast("long")
                % m_bits
            )
            test = test & (
                F.getbit(
                    F.element_at(bloom_lit, ((p / 64).cast("long") + 1).cast("int")),
                    p % 64,
                )
                == 1
            )
        return test

    # Round 14: materialize the Bloom-passing gram array ONCE as an
    # aliased projection and derive the hit count from it. The previous
    # form evaluated ``F.filter(__grams, bloom_hit)`` twice in one
    # projection (count + candidate list) — Catalyst never deduplicates
    # lambda-bearing subtrees, so every gram paid the 3-md5 membership
    # test twice. CollapseProject keeps the split: it refuses to inline
    # a non-cheap alias referenced more than once.
    scored = (
        corpus.select(
            F.col(id_col).alias("id"),
            grams_arr.alias("__grams"),
        )
        .select(
            "id",
            F.size("__grams").cast("bigint").alias("n_grams"),
            F.filter(F.col("__grams"), bloom_hit).alias("__cand"),
        )
        .select(
            "id",
            "n_grams",
            F.size("__cand").cast("bigint").alias("n_bloom_hits"),
            "__cand",
        )
    )
    dirty = (
        scored.filter(F.col("n_bloom_hits") > 0)
        .select("id", F.explode("__cand").alias("g"))
        .join(F.broadcast(bench_grams), "g", "left_semi")
        .select("id")
        .distinct()
        .withColumn("contaminated", F.lit(True))
    )
    return (
        scored.drop("__cand")
        .join(dirty, "id", "left")
        .select(
            F.col("id").alias(id_col),
            "n_grams",
            "n_bloom_hits",
            F.coalesce("contaminated", F.lit(False)).alias("contaminated"),
        )
    )


def span_dedup_rewrite(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 10,
    key_by_hash: bool = False,
) -> DataFrame:
    """C4-style duplicated-span REMOVAL: rewrite every document by
    dropping token chunks whose exact text already occurred earlier in
    the corpus (C4, Raffel et al. 2020 §2.2 deduplicates three-sentence
    spans corpus-wide, keeping the first occurrence; dd9/duplicate_spans
    only REPORTS spans — this operator produces the cleaned corpus).

    Chunking: consecutive non-overlapping ``chunk_tokens``-token windows
    (the final partial window participates as-is).  Survivor rule is
    deterministic: the occurrence with the smallest (id, chunk_idx)
    keeps the chunk; every later occurrence is removed.  Output is one
    row per input document: (id, clean_text, n_kept, n_dropped) with
    clean_text the surviving chunks re-joined in original order (''
    when everything was dropped or the doc was empty).

    Fully relational — no Python in the row path:

    1. one narrow map explodes (chunk_idx, chunk_text) via
       transform-over-sequence + posexplode;
    2. keep = row_number() over (chunk ORDER BY id, idx) == 1 — ONE
       hash exchange; the chunk payload that rides it is bounded by
       ``chunk_tokens`` tokens by construction. ``key_by_hash=True``
       is the 100 TB key: partition the keep-rule window by
       xxhash64(chunk) instead of the raw chunk text — an 8-byte
       shuffle key instead of a ~10-token string; a (cosmically rare)
       64-bit collision only ever MERGES two chunks into one
       keep-first group, the same deterministic rule, so outputs are
       identical whenever no collision occurs (equivalence-tested on
       the fuzz corpora);
    3. reassembly is the collect_list(struct(idx, chunk)) → array_sort
       → array_join per-doc fold (same exchange as the groupBy), and a
       left join from the input preserves token-less documents.
    """
    n_chunks = F.floor(
        (F.size("tk") + (chunk_tokens - 1)) / F.lit(chunk_tokens)
    ).cast("int")
    chunks = (
        df.select(
            F.col(id_col).alias("doc"), tokens_expr(F.col(text_col)).alias("tk")
        )
        .filter(F.size("tk") > 0)
        .select(
            "doc",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), n_chunks - 1),
                    lambda i: F.concat_ws(
                        " ", F.slice("tk", i * chunk_tokens + 1, chunk_tokens)
                    ),
                )
            ).alias("idx", "chunk"),
        )
    )
    from pyspark.sql.window import Window

    part_key = F.xxhash64("chunk") if key_by_hash else F.col("chunk")
    w = Window.partitionBy(part_key).orderBy("doc", "idx")
    flagged = chunks.withColumn("keep", F.row_number().over(w) == F.lit(1))
    agg = flagged.groupBy("doc").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("keep"), F.struct("idx", "chunk"))
                    )
                ),
                lambda s: s["chunk"],
            ),
            " ",
        ).alias("clean_text"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("n_kept"),
        F.sum(F.when(F.col("keep"), 0).otherwise(1)).alias("n_dropped"),
    )
    return (
        df.select(F.col(id_col).alias("doc"))
        .join(agg, "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce("n_dropped", F.lit(0)).cast("long").alias("n_dropped"),
        )
    )
