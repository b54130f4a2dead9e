"""Differential harness: run a Spark DataFrame and a DuckDB oracle SQL on
the same parquet tables, canonicalize both, and assert equality.

STRICT MODE (round 9): the driver's gate hashes exact stringified values
after sorting columns by name, so this harness must be at least that
strict.  Round 8 shipped two red driver rows (dd4p: DuckDB
sum(BIGINT)->HUGEINT/DECIMAL128 widening; t15: a -0.0 vs 0.0 cell) that
the old tolerant compare (int64/float64 coercion + atol 1e-9) silently
absorbed.  The strict compare therefore:

1. asserts dtype-KIND equality BEFORE any coercion — a DECIMAL column
   vs a BIGINT column is a failure even when the values are numerically
   identical (catches dd4p's class statically);
2. compares exact stringified cell values — floats via ``repr``, which
   distinguishes ``-0.0`` from ``0.0`` (catches t15's class).  Queries
   are expected to round their own float outputs; no tolerance is
   applied here;
3. sorts rows by the stringified matrix (engine-independent, no
   float-tie instability).
"""

from __future__ import annotations

import datetime
import decimal
import math

import numpy as np
import pandas as pd
import duckdb

from tw_etl_spark.catalog import TABLES, table_path

NULL = "\x00null"


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    return con.execute(sql).df()


def _sniff_object_kind(s: pd.Series) -> str:
    for v in s:
        if v is None:
            continue
        if isinstance(v, float) and math.isnan(v):
            continue
        if isinstance(v, decimal.Decimal):
            return "decimal"
        if isinstance(v, bool):
            return "bool"
        if isinstance(v, str):
            return "str"
        if isinstance(v, (bytes, bytearray)):
            return "binary"
        if isinstance(v, datetime.datetime):
            return "timestamp"
        if isinstance(v, datetime.date):
            return "date"
        if isinstance(v, (list, tuple, np.ndarray)):
            return "list"
        if isinstance(v, dict):
            return "struct"
        if isinstance(v, (int, np.integer)):
            return "int"
        if isinstance(v, (float, np.floating)):
            return "float"
        return type(v).__name__
    return "all-null"


def column_kind(s: pd.Series) -> str:
    """Canonical dtype kind for the strict schema check.  Distinguishes
    int / float / decimal / bool / str / timestamp / date / list /
    struct / binary; width differences (int32 vs int64, float32 vs
    float64) are NOT distinguished — the driver's hash stringifies
    values, and widths stringify identically — but DECIMAL vs BIGINT IS
    a mismatch because Decimal cells hash differently."""
    if pd.api.types.is_datetime64_any_dtype(s):
        return "timestamp"
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if isinstance(s.dtype, pd.CategoricalDtype):
        return "str"
    return _sniff_object_kind(s)


def _cell_str(v) -> str:
    if v is None:
        return NULL
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return NULL
        # repr distinguishes -0.0 from 0.0 and is exact for float64
        return repr(f)
    if isinstance(v, (np.bool_, bool)):
        return str(bool(v))
    if isinstance(v, (np.integer, int)):
        return str(int(v))
    if isinstance(v, decimal.Decimal):
        # normalized so Decimal('1.00') == Decimal('1') stringify alike;
        # note the KIND check has already failed if the other engine
        # returned ints — this exists for decimal-vs-decimal compares
        return str(v.normalize())
    if isinstance(v, (bytes, bytearray)):
        return "0x" + bytes(v).hex()
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_cell_str(x) for x in v) + "]"
    if isinstance(v, dict):
        return (
            "{"
            + ",".join(f"{k}:{_cell_str(v[k])}" for k in sorted(v))
            + "}"
        )
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    try:
        if pd.isna(v):
            return NULL
    except (TypeError, ValueError):
        pass
    return str(v)


def _normalize_ts(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            if getattr(s.dtype, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]")
    return df


def stringify_frame(df: pd.DataFrame) -> list[tuple[str, ...]]:
    """Columns sorted by name, every cell exactly stringified, rows
    sorted lexicographically — the canonical matrix the strict compare
    (and conceptually the driver's value hash) operates on."""
    df = _normalize_ts(df.reindex(sorted(df.columns), axis=1))
    rows = [
        tuple(_cell_str(v) for v in row)
        for row in df.itertuples(index=False, name=None)
    ]
    rows.sort()
    return rows


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str):
    a_cols, b_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    assert a_cols == b_cols, f"{name}: column mismatch {a_cols} vs {b_cols}"
    # strict schema gate: dtype-kind equality BEFORE any value compare
    for c in a_cols:
        ka, kb = column_kind(spark_pdf[c]), column_kind(oracle_pdf[c])
        if "all-null" in (ka, kb):
            continue
        assert ka == kb, (
            f"{name}: column {c!r} dtype-kind mismatch: spark={ka} "
            f"(dtype {spark_pdf[c].dtype}) vs oracle={kb} "
            f"(dtype {oracle_pdf[c].dtype}) — the driver's value hash "
            f"would reject this even if values are numerically equal"
        )
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} vs {len(oracle_pdf)}"
    )
    a, b = stringify_frame(spark_pdf), stringify_frame(oracle_pdf)
    if a != b:
        diffs = [
            (i, ra, rb) for i, (ra, rb) in enumerate(zip(a, b)) if ra != rb
        ][:5]
        msg = "\n".join(
            f"  row {i}:\n    spark ={ra}\n    oracle={rb}" for i, ra, rb in diffs
        )
        raise AssertionError(
            f"{name}: strict value mismatch on {sum(x != y for x, y in zip(a, b))}"
            f"/{len(a)} rows (cols sorted: {a_cols}):\n{msg}"
        )


def check_query(spark, spec, sf_dir: str):
    spark_pdf = spec.spark(spark, sf_dir).toPandas()
    oracle_pdf = run_oracle(spec.oracle, sf_dir)
    assert_frames_match(spark_pdf, oracle_pdf, spec.name)
    return spark_pdf


# ---------------------------------------------------------------------------
# IN-ENGINE strict compare (VERDICT r11 #2)
#
# The pandas compare above materializes BOTH result sets on the driver —
# dd3p's 110M pairs at sf1 needed maxResultSize=8g and 903 s even though
# the query itself is distributed. The in-engine tier instead has each
# engine reduce its own result to TWO scalars — a row count and an
# order-independent sum of per-row hashes over a canonical row string —
# and the harness compares scalars. The canonical cell forms were chosen
# so Spark (JVM expressions) and DuckDB produce byte-identical strings
# for identical values:
#
#   int      -> CAST AS STRING (plain digits, both engines)
#   double   -> ARITHMETIC canonical form (see below) — never printf
#   decimal  -> CAST AS STRING, trailing zeros trimmed (mirrors
#               Decimal.normalize() in _cell_str)
#   bool     -> CAST AS STRING ("true"/"false" both)
#   date     -> Spark: CAST AS STRING (ISO); DuckDB: midnight
#               timestamp + kind "timestamp" (mirroring the pandas
#               bridge, where duckdb DATE surfaces as datetime64)
#   timestamp-> 'yyyy-MM-dd HH:mm:ss.SSSSSS' / strftime '%...%f'
#   string   -> as-is; NULL -> '\x00null'
#
# Why doubles avoid printf (measured): Java's Formatter renders %f
# from the SHORTEST round-trip repr of the double, DuckDB's from the
# EXACT binary expansion — identical bits then format differently
# whenever the repr has more decimals than requested and the tail
# rounds differently (a13's 15.3815625 -> 15.381563 vs 15.381562),
# and for |x| over ~1e9 where half-ulp exceeds the printed resolution.
# IEEE-754 arithmetic, unlike formatting, IS bit-identical across the
# engines, so the canonical form uses only +,-,*,% and formats only
# (a) INTEGRAL doubles via %.0f (no rounding -> both implementations
# agree) and (b) a bounded integer micros fraction via CAST:
#
#   d      = x + 0.0                      (kills -0.0)
#   m      = d % 1.0 ; t = d - m
#   fl     = t - 1 if m < 0 else t        (floor as a double)
#   frac   = d - fl                       ([0, 1))
#   micros = trunc(frac * 1e6 + 0.5)      (integral, <= 1e6)
#   canon  = printf('%.0f', fl) '.' lpad(micros, 7, '0')
#
# Identical input bits -> identical canonical string by construction;
# two DIFFERENT doubles collide only within 5e-7 of each other — the
# same equivalence the queries' own round(x, 6) contract defines. The
# sweep harnesses still treat any in-engine MISMATCH as "re-adjudicate
# with the pandas compare", so the fast path cannot false-fail.
#
# Arrays / structs / binary columns raise InEngineUnsupported and the
# caller falls back to the pandas compare.
# ---------------------------------------------------------------------------


class InEngineUnsupported(Exception):
    """Result schema has a column the in-engine canonicalizer doesn't
    cover (array/struct/map/binary) — use the pandas compare."""


_NULL_SENTINEL = "\x00null"
_SEP = "\x01"


def _spark_canon_expr(field):
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    c = F.col(field.name)
    t = field.dataType
    if isinstance(t, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        s = c.cast("string")
    elif isinstance(t, (T.DoubleType, T.FloatType)):
        d = c.cast("double") + F.lit(0.0)
        m = d % F.lit(1.0)
        fl = F.when(m < 0, d - m - F.lit(1.0)).otherwise(d - m)
        y = (d - fl) * F.lit(1e6) + F.lit(0.5)
        micros = (y - (y % F.lit(1.0))).cast("long")
        s = (
            F.when(c.isNull() | F.isnan(d), F.lit(None))
            .when(d == F.lit(float("inf")), F.lit("inf"))
            .when(d == F.lit(float("-inf")), F.lit("-inf"))
            .otherwise(
                F.concat(
                    F.format_string("%.0f", fl),
                    F.lit("."),
                    F.lpad(micros.cast("string"), 7, "0"),
                )
            )
        )
    elif isinstance(t, T.DecimalType):
        raw = c.cast("string")
        s = F.regexp_replace(
            F.regexp_replace(raw, r"(\.\d*?)0+$", "$1"), r"\.$", ""
        )
    elif isinstance(t, T.BooleanType):
        s = c.cast("string")
    elif isinstance(t, T.DateType):
        s = c.cast("string")
    elif isinstance(t, (T.TimestampType, T.TimestampNTZType)):
        s = F.date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")
    elif isinstance(t, T.StringType):
        s = c
    else:
        raise InEngineUnsupported(f"{field.name}: {t.simpleString()}")
    return F.coalesce(s, F.lit(_NULL_SENTINEL))


def _duck_canon_expr(name: str, duck_type: str) -> str:
    q = f'"{name}"'
    t = duck_type.upper()
    if t in (
        "TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
        "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
    ):
        s = f"CAST({q} AS VARCHAR)"
    elif t in ("DOUBLE", "FLOAT", "REAL"):
        d = f"(CAST({q} AS DOUBLE) + 0.0)"
        m = f"fmod({d}, 1.0)"
        fl = f"(CASE WHEN {m} < 0 THEN {d} - {m} - 1.0 ELSE {d} - {m} END)"
        y = f"(({d} - {fl}) * 1e6 + 0.5)"
        micros = f"CAST({y} - fmod({y}, 1.0) AS BIGINT)"
        s = (
            f"CASE WHEN isnan({q}) THEN NULL "
            f"WHEN isinf({q}) AND {q} > 0 THEN 'inf' "
            f"WHEN isinf({q}) THEN '-inf' "
            f"ELSE printf('%.0f', {fl}) || '.' || "
            f"lpad(CAST({micros} AS VARCHAR), 7, '0') END"
        )
    elif t.startswith("DECIMAL"):
        s = (
            "regexp_replace(regexp_replace("
            f"CAST({q} AS VARCHAR), '(\\.\\d*?)0+$', '\\1'), '\\.$', '')"
        )
    elif t == "BOOLEAN":
        s = f"CAST({q} AS VARCHAR)"
    elif t == "DATE":
        # the pandas bridge surfaces duckdb DATE as datetime64 — the
        # canonical form mirrors that (midnight timestamp, kind
        # "timestamp") so in-engine verdicts match the pandas tier
        s = f"strftime(CAST({q} AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f')"
    elif t.startswith("TIMESTAMP"):
        s = f"strftime({q}, '%Y-%m-%d %H:%M:%S.%f')"
    elif t == "VARCHAR":
        s = q
    else:
        raise InEngineUnsupported(f"{name}: {duck_type}")
    # sentinel built via chr(): a raw NUL byte inside a SQL literal
    # terminates the string at the parser
    return f"coalesce({s}, chr(0) || 'null')"


def _duck_kind(duck_type: str) -> str:
    t = duck_type.upper()
    if t.startswith("DECIMAL"):
        return "decimal"
    if t in ("DOUBLE", "FLOAT", "REAL"):
        return "float"
    if t == "BOOLEAN":
        return "bool"
    if t == "VARCHAR":
        return "str"
    if t == "DATE":
        return "timestamp"  # the pandas bridge maps DATE -> datetime64
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    return "int"


def _spark_kind(dt) -> str:
    from pyspark.sql import types as T

    if isinstance(dt, T.DecimalType):
        return "decimal"
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        return "float"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.StringType):
        return "str"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "timestamp"
    return "int"


def canonical_hash_spark(df) -> tuple[int, int]:
    """(row_count, order-independent hash sum) computed entirely
    in-engine: per row, md5 over the '\\x01'-joined canonical cells
    (columns sorted by name); the top 60 bits of each digest sum as
    DECIMAL(38,0). Nothing but two scalars reaches the driver."""
    from pyspark.sql import functions as F

    fields = {f.name: f for f in df.schema.fields}
    exprs = [_spark_canon_expr(fields[n]) for n in sorted(fields)]
    row = F.md5(F.concat_ws(_SEP, *exprs).cast("binary"))
    h = F.conv(F.substring(row, 1, 15), 16, 10).cast("decimal(38,0)")
    out = df.select(h.alias("h")).agg(
        F.count(F.lit(1)).alias("n"), F.sum("h").alias("s")
    ).collect()[0]
    return int(out.n), int(out.s) if out.s is not None else 0


def canonical_hash_duckdb(sql: str, sf_dir: str) -> tuple[int, int, list[tuple[str, str]]]:
    """DuckDB twin of :func:`canonical_hash_spark`. Returns
    (row_count, hash_sum, [(column_name, duck_type), ...])."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    desc = con.execute(f"DESCRIBE SELECT * FROM ({sql}) q").fetchall()
    cols = [(r[0], r[1]) for r in desc]
    exprs = [
        _duck_canon_expr(n, t) for n, t in sorted(cols, key=lambda x: x[0])
    ]
    row = " || chr(1) || ".join(exprs) if len(exprs) > 1 else exprs[0]
    n, s = con.execute(
        f"SELECT count(*), sum(('0x' || substr(md5(__row), 1, 15))::BIGINT::HUGEINT) "
        f"FROM (SELECT {row} AS __row FROM ({sql}) q) h"
    ).fetchone()
    return int(n), int(s) if s is not None else 0, cols


def strict_compare(spark, spec, sf_dir: str) -> dict:
    """One sweep row: in-engine fast path, pandas fallback/adjudication.

    Returns {ok, compare, rows, spark_s, oracle_s[, inengine_mismatch]}.
    ``compare`` records which tier decided the row: "inengine" (two
    scalars crossed the harness), "pandas" (schema not in-engine-able),
    or "pandas-adjudicated" (in-engine mismatched — formatting edge or
    real bug — and the authoritative pandas compare ruled). Raises on
    a real mismatch (from the pandas tier, which is final)."""
    import time

    row: dict = {}
    tier = "pandas"
    try:
        df = spec.spark(spark, sf_dir)
        for f in df.schema.fields:  # trip InEngineUnsupported early
            _spark_canon_expr(f)
        t0 = time.perf_counter()
        o_n, o_s, o_cols = canonical_hash_duckdb(spec.oracle, sf_dir)
        row["oracle_s"] = round(time.perf_counter() - t0, 3)
        spark_kinds = {
            f.name: _spark_kind(f.dataType) for f in df.schema.fields
        }
        duck_kinds = {n: _duck_kind(t) for n, t in o_cols}
        assert sorted(spark_kinds) == sorted(duck_kinds), (
            f"{spec.name}: column mismatch {sorted(spark_kinds)} vs "
            f"{sorted(duck_kinds)}"
        )
        bad = {
            n: (spark_kinds[n], duck_kinds[n])
            for n in spark_kinds
            if spark_kinds[n] != duck_kinds[n]
        }
        assert not bad, f"{spec.name}: dtype-kind mismatch {bad}"
        t0 = time.perf_counter()
        s_n, s_s = canonical_hash_spark(df)
        row["spark_s"] = round(time.perf_counter() - t0, 3)
        assert s_n == o_n, f"{spec.name}: row count {s_n} vs {o_n}"
        assert s_s == o_s, (
            f"{spec.name}: in-engine hash mismatch over {s_n} rows"
        )
        row.update(ok=True, compare="inengine", rows=s_n)
        return row
    except InEngineUnsupported:
        tier = "pandas"
    except AssertionError as exc:
        tier = "pandas-adjudicated"
        row["inengine_mismatch"] = str(exc)[:300]
    t0 = time.perf_counter()
    spark_pdf = spec.spark(spark, sf_dir).toPandas()
    row["spark_s"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    oracle_pdf = run_oracle(spec.oracle, sf_dir)
    row["oracle_s"] = round(time.perf_counter() - t0, 3)
    row["rows"] = len(spark_pdf)
    assert_frames_match(spark_pdf, oracle_pdf, spec.name)
    row.update(ok=True, compare=tier)
    return row


def check_query_inengine(spark, spec, sf_dir: str) -> tuple[int, int]:
    """Strict compare without materializing either result set on the
    driver: static dtype-kind gate (Spark schema vs DESCRIBE), then the
    two (count, hash-sum) scalar pairs must match. Raises
    InEngineUnsupported for non-scalar schemas (caller falls back to
    the pandas compare) and AssertionError on any mismatch — which the
    sweep harnesses re-adjudicate with the authoritative pandas
    compare before declaring failure."""
    df = spec.spark(spark, sf_dir)
    spark_kinds = {f.name: _spark_kind(f.dataType) for f in df.schema.fields}
    # trip InEngineUnsupported BEFORE running anything heavy
    for f in df.schema.fields:
        _spark_canon_expr(f)
    o_n, o_s, o_cols = canonical_hash_duckdb(spec.oracle, sf_dir)
    duck_kinds = {n: _duck_kind(t) for n, t in o_cols}
    assert sorted(spark_kinds) == sorted(duck_kinds), (
        f"{spec.name}: column mismatch {sorted(spark_kinds)} vs "
        f"{sorted(duck_kinds)}"
    )
    bad = {
        n: (spark_kinds[n], duck_kinds[n])
        for n in spark_kinds
        if spark_kinds[n] != duck_kinds[n]
    }
    assert not bad, f"{spec.name}: dtype-kind mismatch {bad}"
    s_n, s_s = canonical_hash_spark(df)
    assert s_n == o_n, f"{spec.name}: row count {s_n} vs {o_n}"
    assert s_s == o_s, (
        f"{spec.name}: in-engine canonical hash mismatch over {s_n} rows "
        f"(spark={s_s}, oracle={o_s})"
    )
    return s_n, s_s
