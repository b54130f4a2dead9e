"""Differential harness: run a Spark DataFrame and a DuckDB oracle SQL on
the same parquet tables, canonicalize both, and assert equality.

Canonicalization mirrors the driver's contract: sort columns by name,
sort rows by all columns, compare values (floats with tolerance —
queries themselves are expected to round for the hash-match; the
tolerance here only absorbs representation noise like float32→64).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import duckdb

from tw_etl_spark.catalog import TABLES, table_path


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    return con.execute(sql).df()


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            if getattr(s.dtype, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str):
    a, b = canonicalize(spark_pdf), canonicalize(oracle_pdf)
    assert list(a.columns) == list(b.columns), (
        f"{name}: column mismatch {list(a.columns)} vs {list(b.columns)}"
    )
    assert len(a) == len(b), f"{name}: row count {len(a)} vs {len(b)}"
    for c in a.columns:
        if pd.api.types.is_float_dtype(a[c]):
            ok = np.isclose(a[c].values, b[c].values, rtol=0, atol=1e-9, equal_nan=True)
            assert ok.all(), (
                f"{name}: float col {c} mismatch at rows {np.where(~ok)[0][:5]}:\n"
                f"spark={a[c].values[~ok][:5]} oracle={b[c].values[~ok][:5]}"
            )
        else:
            ok = (a[c].values == b[c].values) | (a[c].isna() & b[c].isna()).values
            assert ok.all(), (
                f"{name}: col {c} mismatch at rows {np.where(~ok)[0][:5]}:\n"
                f"spark={a[c].values[~ok][:5]} oracle={b[c].values[~ok][:5]}"
            )


def check_query(spark, spec, sf_dir: str):
    spark_pdf = spec.spark(spark, sf_dir).toPandas()
    oracle_pdf = run_oracle(spec.oracle, sf_dir)
    assert_frames_match(spark_pdf, oracle_pdf, spec.name)
    return spark_pdf
