"""Property-based tests (hypothesis) for the pure-python cores:
the R19 transition function and the IVF/quantization numpy kernels."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from tw_etl_spark.streaming.state_machine import (
    CONTINUE,
    DEDUP_SKIP,
    EXHAUSTED_COMPLETE,
    RETRY,
    START,
    STOP_EMPTY_POLL,
    RetryState,
    apply_events,
    step,
)

events_strategy = st.lists(
    st.fixed_dictionaries(
        {
            "event": st.sampled_from(["online", "download_done", "noise"]),
            "size": st.integers(min_value=-1, max_value=10),
            "poll_attempt": st.booleans(),
            "retries": st.integers(min_value=1, max_value=5),
        }
    ),
    max_size=40,
)


@given(events_strategy)
@settings(max_examples=300, deadline=None)
def test_machine_invariants(events):
    state = RetryState()
    for ev in events:
        prev = state
        state, action = step(state, ev)
        # retry_id never exceeds the retry budget
        assert state.retry_id <= state.retries
        # active implies a started attempt
        if state.active:
            assert state.retry_id >= 1
        # terminal actions always deactivate
        if action in (STOP_EMPTY_POLL, EXHAUSTED_COMPLETE):
            assert not state.active
        # a start activates with retry 1
        if action == START:
            assert state.active and state.retry_id == 1
        # retries/continues strictly advance the attempt counter
        if action in (RETRY, CONTINUE):
            assert state.retry_id == prev.retry_id + 1
        # skips never mutate state
        if action == DEDUP_SKIP:
            assert state == prev


@given(events_strategy)
@settings(max_examples=100, deadline=None)
def test_apply_events_matches_fold(events):
    st1, actions = apply_events(RetryState(), events)
    st2 = RetryState()
    acc = []
    for ev in events:
        st2, a = step(st2, ev)
        acc.append(a)
    assert st1 == st2 and actions == acc


@given(
    st.integers(min_value=1, max_value=6),  # retries
    st.booleans(),  # poll
)
@settings(max_examples=50, deadline=None)
def test_exhaustion_is_reachable_and_bounded(retries, poll):
    """Pushing empty downloads at an active push-attempt key exhausts it
    after exactly `retries` attempts; poll attempts stop immediately."""
    state, action = step(RetryState(), {"event": "online", "poll_attempt": poll, "retries": retries})
    assert action == START
    n = 0
    while state.active:
        state, action = step(state, {"event": "download_done", "size": 0})
        n += 1
        assert n <= retries  # bounded
    if poll:
        assert action == STOP_EMPTY_POLL and n == 1
    else:
        assert action == EXHAUSTED_COMPLETE and n == retries


# --------------------------------------------------------------- avro

_avro_primitive = st.sampled_from(
    ["boolean", "int", "long", "float", "double", "bytes", "string"]
)


def _avro_value(typ):
    return {
        "boolean": st.booleans(),
        "int": st.integers(min_value=-(2**31), max_value=2**31 - 1),
        "long": st.integers(min_value=-(2**63), max_value=2**63 - 1),
        # float32-representable values so the 4-byte round-trip is exact
        "float": st.sampled_from([0.0, 1.5, -2.25, 1024.0, -0.0078125]),
        "double": st.floats(allow_nan=False, allow_infinity=False),
        "bytes": st.binary(max_size=64),
        "string": st.text(max_size=64),
    }[typ]


@st.composite
def _avro_record_and_rows(draw):
    n_fields = draw(st.integers(min_value=1, max_value=5))
    fields = []
    for i in range(n_fields):
        typ = draw(_avro_primitive)
        nullable = draw(st.booleans())
        fields.append(
            {"name": f"f{i}", "type": ["null", typ] if nullable else typ}
        )
    schema = {"type": "record", "name": "P", "fields": fields}
    rows = []
    for _ in range(draw(st.integers(min_value=0, max_value=8))):
        row = {}
        for f in fields:
            t = f["type"]
            if isinstance(t, list):
                row[f["name"]] = draw(
                    st.none() | _avro_value(t[1])
                )
            else:
                row[f["name"]] = draw(_avro_value(t))
        rows.append(row)
    return schema, rows


@given(_avro_record_and_rows(), st.sampled_from(["null", "deflate"]))
@settings(max_examples=200, deadline=None)
def test_avro_container_roundtrip_property(schema_rows, codec):
    """encode -> decode is the identity for any record schema over the
    supported primitive surface, nullable or not, under both codecs."""
    from tw_etl_spark.sources import avro_fallback as A

    schema, rows = schema_rows
    got_schema, got_rows = A.decode_container(
        A.encode_container(schema, rows, codec=codec)
    )
    assert got_schema == schema
    assert got_rows == rows


# ----------------------------------------------------- duplicate spans


def _spans_reference(docs: dict[int, list[str]], n: int):
    """Pure-python oracle for duplicate_spans: per doc, duplicated
    n-gram start positions -> merged spans -> (count, covered)."""
    grams: dict[tuple, set[int]] = {}
    for d, toks in docs.items():
        for i in range(len(toks) - n + 1):
            grams.setdefault(tuple(toks[i : i + n]), set()).add(d)
    out = {}
    for d, toks in docs.items():
        pos = [
            i + 1
            for i in range(len(toks) - n + 1)
            if len(grams[tuple(toks[i : i + n])]) > 1
        ]
        if not pos:
            continue
        spans = []
        start = prev = pos[0]
        for p in pos[1:]:
            if p > prev + n:
                spans.append((start, prev))
                start = p
            prev = p
        spans.append((start, prev))
        covered = sum(e + n - s for s, e in spans)
        out[d] = (len(spans), covered)
    return out


@given(
    st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d"]), min_size=3, max_size=14
        ),
        min_size=2,
        max_size=6,
    )
)
@settings(max_examples=25, deadline=None)
def test_duplicate_spans_matches_reference(spark, token_docs):
    """Spark duplicate_spans == the pure-python span merge on random
    tiny-vocabulary corpora (the worst case: nearly every gram recurs,
    so island merging does real work)."""
    from tw_etl_spark.operators.dedup import duplicate_spans

    n = 3
    docs = {i: toks for i, toks in enumerate(token_docs)}
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in docs.items()],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_dup_spans, r.dup_tokens)
        for r in duplicate_spans(df, n=n).collect()
    }
    assert got == _spans_reference(docs, n)


@given(
    st.lists(
        st.lists(
            st.text(
                alphabet="abcxyz019", min_size=1, max_size=6
            ),
            min_size=0,
            max_size=10,
        ),
        min_size=1,
        max_size=5,
    )
)
@settings(max_examples=25, deadline=None)
def test_portable_hash_family_property(spark, token_docs):
    """Portable MinHash signatures and SimHash == the hashlib reference
    on random corpora (arbitrary tokens incl. empty docs) — generalizes
    the fixed-case parity test; together with the DuckDB oracle this
    pins Spark, SQL, and pure python to one definition."""
    import hashlib

    from tw_etl_spark.operators.dedup import (
        minhash_signatures_portable,
        simhash_portable_expr,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(token_docs)],
        "doc_id long, text string",
    )
    sigs = {
        r.doc_id: list(r.signature)
        for r in minhash_signatures_portable(df, num_hashes=8).collect()
    }
    shs = {
        r.doc_id: r.sh
        for r in df.select(
            "doc_id", simhash_portable_expr(F.col("text"), bits=16).alias("sh")
        ).collect()
    }
    for i, toks in enumerate(token_docs):
        tset = {t for t in toks if t}
        if tset:
            want_sig = [
                min(hashlib.md5(f"{j}:{t}".encode()).hexdigest() for t in tset)
                for j in range(8)
            ]
            assert sigs[i] == want_sig, i
        else:
            assert i not in sigs  # token-less docs have no signature
        hs = [int(hashlib.md5(t.encode()).hexdigest()[:8], 16) for t in tset]
        want_sh = 0
        for b in range(16):
            if sum(1 if (h >> b) & 1 else -1 for h in hs) > 0:
                want_sh |= 1 << b
        assert shs[i] == want_sh, i


# ---------------------------------------------------------------------------
# Round 9: order-independence of the hash-oracle twins' float folds.
# The r8 regressions (t15 -0.0, dd4p type widening) came from
# order-dependent float sums diverging between Spark's partition order
# and DuckDB's scan order.  The fix is exact integer accumulation; these
# tests pin it by permuting partitioning/row order and asserting the
# stringified output (the same canonical form the strict oracle harness
# hashes) is identical.
# ---------------------------------------------------------------------------


def _stringify(df):
    from tests.oracle_utils import stringify_frame

    return stringify_frame(df.toPandas())


def test_t15_scores_order_independent(spark):
    from tests.conftest import SF_SMOKE
    from tw_etl_spark.catalog import table_path
    from tw_etl_spark.operators.quality import hashed_linear_score_cols
    import pyspark.sql.functions as F

    docs = spark.read.parquet(table_path(SF_SMOKE, "documents"))

    def score(df):
        n_tokens, z, sc, keep = hashed_linear_score_cols(F.col("text"))
        return df.select(
            "doc_id",
            n_tokens.alias("n_tokens"),
            z.alias("z"),
            sc.alias("score"),
            keep.alias("keep"),
        )

    base = _stringify(score(docs))
    permuted = _stringify(
        score(
            docs.repartition(7, F.md5(F.col("doc_id").cast("string")))
            .sortWithinPartitions(F.col("doc_id").desc())
        )
    )
    assert base == permuted


def test_dd8p_lloyd_means_order_independent(spark):
    from tests.conftest import SF_SMOKE
    from tw_etl_spark.catalog import table_path
    from tw_etl_spark.operators.dedup import semantic_dedup_relational
    import pyspark.sql.functions as F

    emb = spark.read.parquet(table_path(SF_SMOKE, "embeddings"))
    base = _stringify(
        semantic_dedup_relational(emb).orderBy("id")
    )
    permuted = _stringify(
        semantic_dedup_relational(
            emb.repartition(11, F.md5(F.col("vec_id").cast("string")))
            .sortWithinPartitions(F.col("vec_id").desc())
        ).orderBy("id")
    )
    assert base == permuted


def test_t15_oracle_scan_order_independent():
    """The DuckDB side of the same property: feed the t15 oracle's
    aggregation a permuted scan order and assert identical z values —
    exact integer accumulation makes sum order irrelevant."""
    import duckdb

    from tests.conftest import SF_SMOKE
    from tests.oracle_utils import NULL, _cell_str
    from tw_etl_spark.catalog import TABLES, table_path
    from tw_etl_spark.queries import all_queries

    sql = all_queries()["t15_quality_classifier"].oracle

    def run(order_by: str):
        con = duckdb.connect()
        for t in TABLES:
            src = f"read_parquet('{table_path(SF_SMOKE, t)}')"
            if t == "documents":
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM {src} {order_by}"
                )
            else:
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")
        out = con.execute(sql).df()
        return [
            tuple(_cell_str(v) for v in row)
            for row in out.itertuples(index=False, name=None)
        ]

    assert run("") == run("ORDER BY md5(doc_id::VARCHAR)")


@given(
    st.integers(min_value=-10**9, max_value=10**9),
    st.integers(min_value=1, max_value=10**6),
    st.sampled_from([0, 2, 4, 6]),
)
@settings(max_examples=500, deadline=None)
def test_sql_round_ratio_matches_exact_rational(num, den, digits):
    """sql_round_ratio must equal round-half-away-from-zero of the TRUE
    rational num/den (computed via fractions), for any sign and scale —
    the property float round() lacks at exact decimal halves."""
    import duckdb
    from fractions import Fraction

    from tw_etl_spark.functions.rounding import sql_round_ratio

    got = duckdb.sql(
        f"SELECT {sql_round_ratio(str(num), str(den), digits)} AS r"
    ).fetchone()[0]
    s = 10 ** digits
    f = Fraction(num, den) * s
    q, rem = divmod(abs(f.numerator), f.denominator)
    exp = q + (1 if 2 * rem >= f.denominator else 0)
    if num < 0:
        exp = -exp
    assert got == exp / s, (num, den, digits, got, exp / s)


def test_spark_exact_round_ratio_matches_sql(spark):
    """The Spark Column form and the DuckDB SQL form of exact rounding
    agree cell-for-cell on a boundary-heavy grid (denominators that
    divide powers of ten, where float round() diverges)."""
    import duckdb
    import pyspark.sql.functions as F

    from tw_etl_spark.functions.rounding import exact_round_ratio, sql_round_ratio

    cases = [
        (n, d)
        for d in (1, 2, 16, 1000, 16000, 96000, 2 * 10**6)
        for n in (-96001, -6186, -1, 0, 1, 3, 647, 2074, 6186, 10**7)
    ]
    sdf = spark.createDataFrame(cases, "n long, d long").select(
        "n", "d", exact_round_ratio(F.col("n"), F.col("d"), 6).alias("r")
    )
    got = {(r.n, r.d): r.r for r in sdf.collect()}
    vals = ", ".join(f"({n}, {d})" for n, d in cases)
    oracle = duckdb.sql(
        f"SELECT n, d, {sql_round_ratio('n', 'd', 6)} AS r "
        f"FROM (VALUES {vals}) t(n, d)"
    ).fetchall()
    for n, d, r in oracle:
        assert got[(n, d)] == r, (n, d, got[(n, d)], r)


def test_x12_dsir_weights_order_independent(spark):
    """The DSIR fold is an exact BIGINT sum of micro-unit log-ratios —
    permuting partitioning and within-partition order must reproduce
    bit-identical weights (the round-9 transcendental-fold rule)."""
    from tests.conftest import SF_SMOKE
    from tw_etl_spark.catalog import table_path
    from tw_etl_spark.operators.sampling import dsir_importance_weights
    import pyspark.sql.functions as F

    docs = spark.read.parquet(table_path(SF_SMOKE, "documents"))
    tgt = F.col("lang") == "en"
    base = _stringify(
        dsir_importance_weights(docs, target=tgt).orderBy("doc_id")
    )
    permuted = _stringify(
        dsir_importance_weights(
            docs.repartition(7, F.md5(F.col("doc_id").cast("string")))
            .sortWithinPartitions(F.col("doc_id").desc()),
            target=tgt,
        ).orderBy("doc_id")
    )
    assert base == permuted


def test_x12_dsir_separates_target_domain(spark):
    """Directional sanity: documents drawn from the target domain must
    score a strictly higher mean importance weight than the rest (on
    the fixture the en slice IS the target sample)."""
    from tests.conftest import SF_SMOKE
    from tw_etl_spark.catalog import table_path
    from tw_etl_spark.operators.sampling import dsir_importance_weights
    import pyspark.sql.functions as F

    docs = spark.read.parquet(table_path(SF_SMOKE, "documents"))
    w = dsir_importance_weights(docs, target=F.col("lang") == "en")
    joined = w.join(docs.select("doc_id", "lang"), "doc_id")
    means = {
        r.is_t: r.m
        for r in joined.groupBy((F.col("lang") == "en").alias("is_t"))
        .agg(F.avg("dsir_w").alias("m"))
        .collect()
    }
    assert means[True] > means[False]


def test_integer_div_helpers_match_sql(spark):
    """floor_div / exact_round_ratio_long: the Spark Column forms and
    their DuckDB SQL twins agree cell-for-cell including negative
    numerators, where Spark div / DuckDB // (both truncating) would
    diverge from the floor the operators specify."""
    import duckdb
    import pyspark.sql.functions as F

    from tw_etl_spark.functions.rounding import (
        exact_round_ratio_long,
        floor_div,
        sql_floor_div,
        sql_round_ratio_long,
    )

    cases = [
        (n, d)
        for d in (1, 2, 16, 64, 1000)
        for n in (-1001, -17, -16, -15, -1, 0, 1, 15, 16, 17, 999, 10**9)
    ]
    sdf = spark.createDataFrame(cases, "n long, d long").select(
        "n",
        "d",
        floor_div(F.col("n"), F.col("d")).alias("fd"),
        exact_round_ratio_long(F.col("n"), F.col("d")).alias("rr"),
    )
    got = {(r.n, r.d): (r.fd, r.rr) for r in sdf.collect()}
    vals = ", ".join(f"({n}, {d})" for n, d in cases)
    oracle = duckdb.sql(
        f"SELECT n, d, {sql_floor_div('n', 'd')} AS fd, "
        f"{sql_round_ratio_long('n', 'd')} AS rr "
        f"FROM (VALUES {vals}) t(n, d)"
    ).fetchall()
    for n, d, fd, rr in oracle:
        assert fd == n // d, (n, d, fd)  # python // IS floor
        assert got[(n, d)] == (fd, rr), (n, d, got[(n, d)], (fd, rr))


def test_quantile_gate_keep_guarantees(spark):
    """The x13 gate's two contracts: at most (100-pct)% of rows keep,
    and every kept score strictly outscores every dropped score (equal
    scores always share a bin, so the strictly-above-the-crossing-bin
    rule can never split a tie across the keep boundary)."""
    from tests.conftest import SF_SMOKE
    from tw_etl_spark.catalog import read_table
    from tw_etl_spark.operators.quality import milli_score_col
    from tw_etl_spark.operators.sampling import quantile_gate
    import pyspark.sql.functions as F

    docs = read_table(spark, SF_SMOKE, "documents")
    for pct in (50, 70, 90):
        g = quantile_gate(docs, milli_score_col(F.col("text")), pct=pct)
        agg = g.agg(
            F.count(F.lit(1)).alias("total"),
            F.sum(F.when(F.col("kept"), 1).otherwise(0)).alias("kept"),
            F.min(F.when(F.col("kept"), F.col("score"))).alias("min_kept"),
            F.max(F.when(~F.col("kept"), F.col("score"))).alias("max_drop"),
        ).first()
        assert agg.kept * 100 <= agg.total * (100 - pct), (pct, agg)
        assert agg.kept > 0, pct  # corpus scores do spread at sf0.001
        assert agg.min_kept > agg.max_drop, (pct, agg)


def test_quantile_gate_degenerate_all_equal(spark):
    """All-equal scores: one bin, which is the crossing bin, so the
    strictly-above rule keeps nothing (documented determinism)."""
    from tw_etl_spark.operators.sampling import quantile_gate
    import pyspark.sql.functions as F

    df = spark.range(100).withColumnRenamed("id", "doc_id")
    g = quantile_gate(df, F.lit(42), id_col="doc_id")
    assert g.filter("kept").count() == 0
    assert g.count() == 100


def test_importance_resample_monotone_and_clamped(spark):
    """Acceptance is monotone in the weight and saturates: a weight
    below -8e6 micro (accept 0) can never keep; above +8e6 (accept 1e6)
    always keeps; and raising any weight never flips keep off."""
    from tw_etl_spark.operators.sampling import importance_resample
    import pyspark.sql.functions as F

    w = spark.createDataFrame(
        [(i, wm) for i in range(50) for wm in (-10**7, -8_000_016, 0, 8_000_000, 10**7)],
        "doc_id long, w_micro long",
    )
    r = importance_resample(w)
    rows = r.collect()
    for row in rows:
        if row.w_micro <= -8_000_016:
            assert row.accept_micro == 0 and not row.kept, row
        if row.w_micro >= 8_000_000:
            assert row.accept_micro == 1_000_000 and row.kept, row
    by_doc = {}
    for row in rows:
        by_doc.setdefault(row.doc_id, []).append((row.w_micro, row.kept))
    for doc, pairs in by_doc.items():
        pairs.sort()
        seen_keep = False
        for _, kept in pairs:
            assert not (seen_keep and not kept), doc  # monotone in w
            seen_keep = seen_keep or kept
