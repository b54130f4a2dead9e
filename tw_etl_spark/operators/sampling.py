"""Deterministic dataset splitting / sampling for training pipelines.

`df.randomSplit` is seed- and partitioning-dependent: the same row can
land in different splits across runs, cluster sizes, or engine versions
— unacceptable for train/test membership at 100 TB where splits must be
reproducible forever. These operators derive the split from a content
hash instead: map-only (no shuffle, no sample+subtract double-scan),
identical in every engine that agrees on md5 (the DuckDB oracle does).

`component_split` additionally closes the near-dup leakage hole: if two
near-duplicate documents land in train and test, the split is
contaminated. Hashing the *component representative* (from
`dedup.connected_components`) instead of the row id puts every member
of a near-dup cluster in the same split.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tw_etl_spark.operators.dedup import connected_components

_BUCKETS = 10_000


def split_bucket_expr(key: Column, salt: str = "") -> Column:
    """Stable bucket in [0, 10000) from md5 of the (salted) key —
    engine-portable: Spark `conv(hex,16,10)` ≡ DuckDB `'0x…'::BIGINT`."""
    h = F.md5(F.concat(key.cast("string"), F.lit(salt)))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % _BUCKETS).alias(
        "bucket"
    )


def deterministic_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Assign every row a split label with proportions ``weights``
    (e.g. {'train': .8, 'val': .1, 'test': .1}), decided solely by
    md5(id + salt). Change ``salt`` to draw an independent split."""
    total = sum(weights.values())
    expr: Column | None = None
    acc = 0.0
    names = list(weights)
    bucket = split_bucket_expr(F.col(id_col), salt)
    for name in names[:-1]:
        acc += weights[name] / total * _BUCKETS
        cond = bucket < int(round(acc))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn(split_col, expr)


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    rates: dict[str, float],
    id_col: str,
    salt: str = "",
    default_rate: float = 1.0,
) -> DataFrame:
    """Deterministic per-stratum downsampling (domain mixing): keep a
    row iff its md5 bucket falls under its stratum's keep rate. The
    standard way to hit a target corpus mixture (e.g. re-weight
    languages or sources before training). Map-only — no shuffle, no
    sample()+subtract double scan — and reproducible forever: membership
    depends only on (id, salt), never on partitioning or engine version.
    Strata absent from ``rates`` keep ``default_rate``."""
    bucket = split_bucket_expr(F.col(id_col), salt)
    cut: Column | None = None
    for name, r in rates.items():
        lim = F.lit(int(round(r * _BUCKETS)))
        cond = F.col(stratum_col) == name
        cut = F.when(cond, lim) if cut is None else cut.when(cond, lim)
    default_lim = F.lit(int(round(default_rate * _BUCKETS)))
    cut = default_lim if cut is None else cut.otherwise(default_lim)
    return df.filter(bucket < cut)


def component_split(
    df: DataFrame,
    pairs: DataFrame | None,
    id_col: str,
    weights: dict[str, float],
    salt: str = "",
    split_col: str = "split",
    labels: DataFrame | None = None,
) -> DataFrame:
    """Leakage-aware split: rows connected through near-dup ``pairs``
    (id_a, id_b) always share a split, because the hash key is the
    component representative (min reachable id; rows in no pair
    represent themselves). Precomputed ``labels`` (id, component) —
    e.g. from ``dedup.exact_jaccard_components`` — skip the pair-level
    propagation."""
    if labels is None:
        if pairs is None:
            raise ValueError("component_split needs pairs or labels")
        labels = connected_components(pairs)
    comp = labels.select(F.col("id").alias(id_col), "component")
    with_comp = df.join(comp, id_col, "left").withColumn(
        "component", F.coalesce("component", F.col(id_col))
    )
    out = deterministic_split(with_comp, "component", weights, salt, split_col)
    return out.drop("component")


def deterministic_shuffle(
    df: DataFrame,
    id_col: str,
    salt: str = "",
    key_col: str = "shuffle_key",
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic global permutation of a corpus (the training-data
    "shuffle" step): order rows by md5(id + salt). Changing ``salt``
    draws an independent permutation; the order is a pure function of
    content, so it reproduces across runs, engines, and cluster sizes.

    Scale path: a total sort at 100 TB is a range-partitioned sort —
    ``repartitionByRange`` samples key quantiles so each output file
    holds one contiguous, internally-sorted key range; downstream
    sequential readers stream the permutation without any global
    coordination (no global row-number, no single reducer). The key is
    8 hex chars → uniform, so ranges are balanced by construction.
    """
    key = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    out = df.withColumn(key_col, key)
    if num_partitions:
        return out.repartitionByRange(num_partitions, key_col, id_col).sortWithinPartitions(
            key_col, id_col
        )
    return out.orderBy(key_col, id_col)


def temperature_rates(
    counts: dict[str, int], alpha: float = 0.5
) -> dict[str, float]:
    """Per-domain keep rates for temperature-based re-mixing: sampling
    probability p_d ∝ n_d^alpha (the standard multilingual/domain
    re-balancing rule — alpha=1 keeps the natural mixture, alpha→0
    approaches uniform). Downsampling-only form: the rarest domain
    keeps rate 1.0, every other domain keeps (n_min/n_d)^(1-alpha)."""
    if not counts:
        return {}
    n_min = min(counts.values())
    return {d: (n_min / n) ** (1.0 - alpha) for d, n in counts.items()}


def temperature_mix(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    alpha: float = 0.5,
    salt: str = "",
) -> tuple[DataFrame, dict[str, float]]:
    """Temperature-based domain mixing: downsample common domains so the
    corpus mixture follows p_d ∝ n_d^alpha, decided per row by the same
    md5 bucket as every other sampler here (reproducible forever,
    map-only after one counting aggregate).

    100 TB shape: the only corpus-level state is the per-domain count —
    one partial-aggregated groupBy on a low-cardinality column, whose
    result (#domains rows) is collected and folded into the filter plan
    as literals. The filter itself is a narrow map; no join, no second
    shuffle. Returns (filtered df, rates) so callers can log the
    realized mixture."""
    counts = {r[0]: r[1] for r in df.groupBy(stratum_col).count().collect()}
    rates = temperature_rates(counts, alpha)
    bucket = split_bucket_expr(F.col(id_col), salt)
    cut: Column | None = None
    for d, r in rates.items():
        lim = F.lit(int(r * _BUCKETS))  # floor — mirrors the oracle SQL
        # eqNullSafe so a NULL stratum (its own groupBy key above) gets
        # its computed rate applied instead of falling through the CASE
        # chain to NULL and being dropped unconditionally
        cond = F.col(stratum_col).eqNullSafe(F.lit(d))
        cut = F.when(cond, lim) if cut is None else cut.when(cond, lim)
    if cut is None:
        return df, rates
    return df.filter(bucket < cut), rates


def dsir_importance_weights(
    df: DataFrame,
    target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 1024,
) -> DataFrame:
    """DSIR-style hashed n-gram importance weights (Xie et al. 2023,
    arXiv:2302.03169): score every document by how much more likely its
    hashed bigram profile is under the TARGET distribution (rows where
    ``target`` is true) than under the raw corpus distribution —
    log w(d) = sum_g c_{d,g} * [ln p_target(g) - ln p_raw(g)] with
    Laplace-smoothed bucket probabilities over ``buckets`` hashed
    bigram buckets. Positive weight => looks like the target domain;
    selection/resampling ranks or thresholds on it.

    Determinism discipline (SCALE.md round 9): the per-bucket log-ratio
    is a transcendental of exact-integer ratios, rounded ONCE to
    integer micro-units; per-document accumulation is then an exact
    BIGINT sum (partition-order-proof), divided once at the end — so
    the emitted weight is bit-identical on any IEEE-754 engine.

    Scale shape: one exchange on (doc, bucket) for the count agg
    (map-side partials collapse repeated bigrams first), a
    ``buckets``-row stats table built from those partials (never a
    second corpus scan), totals via a 1-row cross join, and the
    per-doc weight join broadcasts the ``buckets``-row table — zero
    data-sized driver state, no Python in the row path.

    Bucket hash is the portable md5 family (first 8 hex chars as
    uint32, mod ``buckets``) so a SQL oracle replays it verbatim; at
    100 TB swap in xxhash64 and more buckets (the dd3/dd3p split).
    """
    tk = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    bigrams = F.when(
        F.size(tk) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(tk) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(tk, i), F.element_at(tk, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    ex = df.select(
        F.col(id_col).alias("doc"),
        target.alias("is_t"),
        F.explode(bigrams).alias("bg"),
    ).select(
        "doc",
        "is_t",
        F.pmod(
            F.conv(F.substring(F.md5(F.col("bg")), 1, 8), 16, 10).cast("long"),
            F.lit(buckets),
        ).alias("b"),
    )
    # localCheckpoint (the dd3p signature-reuse pattern): dc feeds BOTH
    # the bucket stats and the per-doc fold — without it each consumer
    # re-scans and re-explodes the corpus. ids+counts only, never text.
    dc = (
        ex.groupBy("doc", "is_t", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint()
    )
    bc = dc.groupBy("b").agg(
        F.sum("c").alias("s_g"),
        F.sum(F.when(F.col("is_t"), F.col("c")).otherwise(F.lit(0))).alias("t_g"),
    )
    tot = bc.agg(
        F.sum("s_g").alias("s_tot"), F.sum("t_g").alias("t_tot")
    )
    lr = bc.crossJoin(F.broadcast(tot)).select(
        "b",
        F.round(
            (
                F.log((F.col("t_g") + 1.0) / (F.col("t_tot") + float(buckets)))
                - F.log((F.col("s_g") + 1.0) / (F.col("s_tot") + float(buckets)))
            )
            * 1e6,
            0,
        )
        .cast("long")
        .alias("lr_micro"),
    )
    wd = (
        dc.join(F.broadcast(lr), "b")
        .groupBy("doc")
        .agg(
            F.sum("c").cast("long").alias("n_bigrams"),
            F.sum(F.col("c") * F.col("lr_micro")).cast("long").alias("w_micro"),
        )
    )
    return (
        df.select(F.col(id_col).alias("doc"))
        .join(wd, "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("w_micro", F.lit(0)).cast("long").alias("w_micro"),
            (F.coalesce("w_micro", F.lit(0)).cast("double") / F.lit(1e6)).alias(
                "dsir_w"
            ),
        )
    )


def quantile_gate(
    df: DataFrame,
    score: Column,
    id_col: str = "doc_id",
    bins: int = 64,
    pct: int = 70,
) -> DataFrame:
    """FineWeb-style "train on the top quality slice" gate (Penedo et
    al. 2024, arXiv:2406.17557 §3.5 keep-top-X%-by-classifier-score):
    bin an exact-integer quality ``score`` into a ``bins``-cell
    equi-width histogram, find the bin where the cumulative count
    crosses ``pct`` percent, and keep every document scoring STRICTLY
    ABOVE that bin — guaranteed to keep at most (100-pct)% of the
    corpus, and everything kept outscores everything dropped.

    ``score`` must be integral (e.g. ``quality.milli_score_col``): the
    bin edge is then decided entirely in BIGINT arithmetic
    ((score-lo)*bins floor-div (hi-lo), crossing test 100*cum >=
    pct*total) — no float ever touches the threshold, so the gate is
    bit-identical on any engine. |score range| * bins must stay below
    2^53 (milli/micro unit scores are orders of magnitude under this).

    Scale shape — the two-pass global-threshold pattern: pass 1 folds
    the corpus into ``bins`` longs (map-side-combinable agg, kilobytes
    of shuffle at any corpus size — the a13 mergeable-histogram tier);
    the threshold derivation runs on that ≤``bins``-row table; pass 2
    re-applies the narrow score map and filters against the broadcast
    1-row threshold. No data-sized shuffle, no sort, no driver state;
    at 100 TB both passes run at scan speed. Degenerate all-equal
    corpora land in bin 0 = the crossing bin, so nothing survives the
    strictly-above rule (deterministic; documented).

    Returns every input row as (id, score, bin_idx, thr_idx, kept) —
    callers drop to the survivor set with ``.filter("kept")``.

    EAGER: calling this function launches a Spark job immediately (the
    (id, score) proxy is ``localCheckpoint``-materialized so the three
    consumers of the scored relation don't re-run the score fold);
    batch DataFrames only — a streaming input raises AnalysisException
    at the checkpoint.
    """
    from tw_etl_spark.functions.rounding import floor_div

    # Round 14 (guide §1.2 step 1 — don't compute things 3x): the
    # ``score`` expression is typically an expensive text fold (x13
    # feeds the md5-per-token milli score), and this gate's plan reads
    # the scored relation THREE times (min/max/total stats, histogram,
    # final output) — each subtree re-tokenized and re-hashed the
    # corpus. localCheckpoint materializes the (id, score) proxy rows
    # once (16 bytes/row — the §2.3 "shuffle metadata, not payloads"
    # shape, stored not shuffled) and all three passes read it back;
    # the dd3p signature-reuse pattern. Values unchanged.
    scored = df.select(F.col(id_col), score.cast("long").alias("score"))
    scored = scored.localCheckpoint()
    stats = scored.agg(
        F.min("score").alias("lo"),
        F.max("score").alias("hi"),
        F.count(F.lit(1)).cast("long").alias("total"),
    )
    binned = scored.crossJoin(F.broadcast(stats)).select(
        id_col,
        "score",
        F.when(F.col("hi") == F.col("lo"), F.lit(0).cast("long"))
        .otherwise(
            F.least(
                F.lit(bins - 1).cast("long"),
                floor_div(
                    (F.col("score") - F.col("lo")) * F.lit(bins),
                    F.col("hi") - F.col("lo"),
                ),
            )
        )
        .alias("bin_idx"),
    )
    from pyspark.sql.window import Window

    hist = binned.groupBy("bin_idx").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    # ≤ bins rows reach the unpartitioned window — the single-partition
    # sort is over the histogram, never the data (the a13 pattern).
    cum = hist.withColumn("cum", F.sum("cnt").over(Window.orderBy("bin_idx")))
    thr = (
        cum.crossJoin(F.broadcast(stats))
        .filter(F.col("cum") * 100 >= F.lit(pct) * F.col("total"))
        .agg(F.min("bin_idx").cast("long").alias("thr_idx"))
    )
    return binned.crossJoin(F.broadcast(thr)).select(
        id_col,
        "score",
        "bin_idx",
        "thr_idx",
        (F.col("bin_idx") > F.col("thr_idx")).alias("kept"),
    )


def importance_resample(
    weights: DataFrame,
    id_col: str = "doc_id",
    w_col: str = "w_micro",
    base_micro: int = 500_000,
    shift_den: int = 16,
    salt: str = "rs",
) -> DataFrame:
    """Deterministic importance-weighted Bernoulli resample — the
    selection step DSIR (Xie et al. 2023, arXiv:2302.03169 §3) runs on
    its importance weights, made reproducible-forever: instead of RNG,
    each document draws its uniform from the portable md5 family
    (u = md5("<salt>:"+id) first 12 hex as micro-units mod 1e6) and is
    kept iff u < accept(w), with the acceptance curve a clamped-linear
    function of the micro-unit log-weight —
    accept_micro = clamp(base_micro + floor(w/shift_den), 0, 1e6).
    (The clamped-linear curve is the integer-exact stand-in for the
    usual exp/softmax acceptance: monotone in the log-weight, saturates
    at 0/1, and — unlike exp — decided wholly in BIGINT space, so keep
    bits can't flip on a 1-ulp cross-engine libm difference.)

    Membership is a pure per-row predicate on (id, w): map-only, no
    shuffle, no RNG state, independent of partitioning and cluster
    size — the same contract as `deterministic_split`, so a 100 TB
    resample is just a narrow filter. Returns every input row plus
    (u_micro, accept_micro, kept); callers filter on ``kept``.
    """
    u = portable_uniform_micro(id_col, salt)
    from tw_etl_spark.functions.rounding import floor_div

    accept = F.least(
        F.lit(1_000_000).cast("long"),
        F.greatest(
            F.lit(0).cast("long"),
            F.lit(base_micro).cast("long")
            + floor_div(F.col(w_col), F.lit(shift_den)),
        ),
    )
    return weights.select(
        "*",
        u.alias("u_micro"),
        accept.alias("accept_micro"),
        (u < accept).alias("kept"),
    )


def portable_uniform_micro(id_col: str, salt: str) -> Column:
    """The portable md5 uniform in micro units, u_micro ∈ [0, 1e6):
    first 12 hex chars of md5("<salt>:" + id) mod 1e6 — the same
    RNG-free family `deterministic_split` / `importance_resample` draw
    from, and exactly replayable in DuckDB as
    ``('0x' || substr(md5('<salt>:' || id::VARCHAR), 1, 12))::BIGINT
    % 1000000``. Per-row, partitioning-independent, reproducible
    forever."""
    return (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))
                ),
                1,
                12,
            ),
            16,
            10,
        ).cast("long")
        % F.lit(1_000_000)
    )


def weighted_sample_topn(
    df: DataFrame,
    n: int,
    id_col: str = "doc_id",
    w_col: str = "w",
    salt: str = "ws",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement of exactly ``n`` rows in
    ONE pass — Efraimidis & Spirakis (2006): each row draws a uniform
    u and is ranked by ``u^(1/w)``; the top-n by that key is a
    weighted sample without replacement. The complement of x14's
    Bernoulli form: x14 answers "keep each row with probability
    accept(w)" (variable output size); this answers "give me exactly
    n rows, heavier rows proportionally more likely" — the 'sample
    10M documents from 10B, proportional to quality/length' selection
    a curation pipeline runs.

    Determinism + cross-engine exactness: u comes from the portable
    md5 family (no RNG state, partitioning-independent); the key is
    ranked in LOG space, ``ln(u)/w`` (same ordering as u^(1/w),
    avoiding cross-engine pow), quantized to integer NANO units with
    id tie-break — so the selected set and its order hash-match the
    DuckDB replay exactly. u is shifted to (0, 1] as
    ``(u_micro + 1) / 1000001`` so ln never sees 0.

    Caveat (the one non-integer link in the portable family): the
    cross-engine hash match additionally assumes JVM ``Math.log`` and
    DuckDB's libm ``ln`` agree to the last bit on the 1e6 possible u
    values. Neither is correctly-rounded, so a 1-ulp disagreement
    landing within ~1 ulp of a .5 nano boundary could flip
    ``key_nano`` and, at a selection boundary, the sampled set — a
    WEAKER guarantee than the md5/integer-only members (x2/x4/x12/x14),
    though never observed across the sf0.001/0.01/0.1 sweeps. Callers
    needing the hard guarantee should treat near-boundary flips as
    acceptable sample noise (the sample stays a valid E-S draw under
    the perturbed key) rather than relying on set identity.

    Scale shape: ONE scan, a narrow map computing (u, key), and a
    TakeOrderedAndProject cut (per-partition heaps) — no shuffle, no
    RNG state, no second pass; at 100 TB this is scan speed plus an
    n-row reduce. Weights must be strictly positive (loud plan-side
    assert). Returns (id_col, rank, w_col, u_micro, key_nano).
    """
    from pyspark.sql.window import Window

    u_micro = portable_uniform_micro(id_col, salt)
    u = (F.col("u_micro") + 1).cast("double") / F.lit(1000001.0)
    key = F.round(F.log(u) * F.lit(1e9) / F.col(w_col), 0).cast("long")
    keyed = df.select(
        F.col(id_col),
        F.col(w_col),
        u_micro.alias("u_micro"),
    ).select(
        id_col,
        w_col,
        "u_micro",
        # assert_true(NULL when ok) gates the key: zero/negative
        # weights fail loudly instead of silently reordering the sample
        F.when(
            F.assert_true(
                F.col(w_col) > 0, f"weighted_sample_topn: {w_col} must be > 0"
            ).isNull(),
            key,
        ).alias("key_nano"),
    )
    w = Window.orderBy(F.desc("key_nano"), F.col(id_col))
    return (
        keyed.orderBy(F.desc("key_nano"), F.col(id_col))
        .limit(n)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .select(id_col, "rank", w_col, "u_micro", "key_nano")
    )
