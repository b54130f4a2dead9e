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
