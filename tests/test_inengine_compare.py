"""The in-engine strict compare (VERDICT r11 #2): each engine reduces
its result to (row count, order-independent hash sum) over a canonical
row string, and the harness compares two scalars — no driver-side
materialization. These tests pin the cross-engine canonical forms
(the float form is ARITHMETIC because Java formats doubles from the
shortest repr while DuckDB formats from the exact binary expansion —
printf on identical bits diverges; IEEE arithmetic does not) and the
detection power of the scalar compare.
"""

from __future__ import annotations

import duckdb
import pytest

from tests.oracle_utils import (
    InEngineUnsupported,
    _duck_canon_expr,
    _spark_canon_expr,
    canonical_hash_spark,
    check_query_inengine,
)

# the printf-divergence witnesses: 15.3815625 is a repr-tie (Java
# %.6f HALF_UPs the shortest repr -> ...63, C rounds the exact
# expansion -> ...62); 37950000000.12's half-ulp exceeds 5e-7 so %.6f
# padding vs exact digits diverge; -0.0's sign survives Java printf
# but not DuckDB's. All must canonicalize identically here.
FLOAT_BATTERY = [
    1.5, 0.1 + 0.2, 2675.9, -0.0, 0.0703125, 1e18, 123456789.12345679,
    -1.23e-7, 3.0, 0.29, 15.3815625, 37950000000.12, -2.3, 2.9999999,
    None, 1e-300, -5.0, 0.145, 1234567.125,
]


def test_float_canonical_form_identical_across_engines(spark):
    con = duckdb.connect()
    rows = [(i, v) for i, v in enumerate(FLOAT_BATTERY)]
    df = spark.createDataFrame(rows, "i int, x double")
    fld = next(f for f in df.schema.fields if f.name == "x")
    got = {
        r.i: r.c
        for r in df.select("i", _spark_canon_expr(fld).alias("c")).collect()
    }
    expr = _duck_canon_expr("x", "DOUBLE")
    for i, v in enumerate(FLOAT_BATTERY):
        lit = "NULL" if v is None else repr(v)
        d = con.execute(
            f"SELECT {expr} FROM (SELECT CAST({lit} AS DOUBLE) AS x) q"
        ).fetchone()[0]
        assert got[i] == d, f"{v!r}: spark={got[i]!r} duck={d!r}"
    # special values (not expressible as plain SQL literals)
    for lit, want in [
        ("'NaN'::DOUBLE", "\x00null"),
        ("'Infinity'::DOUBLE", "inf"),
        ("'-Infinity'::DOUBLE", "-inf"),
    ]:
        d = con.execute(
            f"SELECT {expr} FROM (SELECT {lit} AS x) q"
        ).fetchone()[0]
        assert d == want, (lit, d)


def test_scalar_types_canonicalize_identically(spark):
    con = duckdb.connect()
    df = spark.sql(
        "SELECT CAST(12 AS BIGINT) AS i, 'ab' AS s, true AS b, "
        "DATE '2024-01-02' AS ts_from_date, "
        "TIMESTAMP '2024-01-02 03:04:05.123456' AS t, "
        "CAST(1.50 AS DECIMAL(18,2)) AS d, CAST(NULL AS STRING) AS n"
    )
    # mirror: the duck side returns DATE where Spark must send a
    # midnight timestamp (the pandas bridge maps DATE -> datetime64)
    df = df.withColumn("ts_from_date", df.ts_from_date.cast("timestamp"))
    vals = {}
    for f in df.schema.fields:
        vals[f.name] = df.select(_spark_canon_expr(f)).collect()[0][0]
    duck_sql = {
        "i": ("CAST(12 AS BIGINT)", "BIGINT"),
        "s": ("'ab'", "VARCHAR"),
        "b": ("true", "BOOLEAN"),
        "ts_from_date": ("DATE '2024-01-02'", "DATE"),
        "t": ("TIMESTAMP '2024-01-02 03:04:05.123456'", "TIMESTAMP"),
        "d": ("CAST(1.50 AS DECIMAL(18,2))", "DECIMAL(18,2)"),
        "n": ("CAST(NULL AS VARCHAR)", "VARCHAR"),
    }
    for name, (lit, typ) in duck_sql.items():
        expr = _duck_canon_expr(name, typ)
        got = con.execute(
            f'SELECT {expr} FROM (SELECT {lit} AS "{name}") q'
        ).fetchone()[0]
        assert vals[name] == got, f"{name}: {vals[name]!r} vs {got!r}"


def test_decimal_trailing_zero_trim_matches_normalize(spark):
    """_cell_str normalizes Decimal('1.50') -> '1.5'; the in-engine
    trim must land on the same form in both engines."""
    con = duckdb.connect()
    cases = [("1.50", "1.5"), ("2.00", "2"), ("0.05", "0.05"),
             ("-3.10", "-3.1"), ("100.00", "100")]
    for lit, want in cases:
        duck = con.execute(
            "SELECT " + _duck_canon_expr("d", "DECIMAL(18,2)")
            + f" FROM (SELECT CAST({lit} AS DECIMAL(18,2)) AS d) q"
        ).fetchone()[0]
        df = spark.sql(f"SELECT CAST({lit} AS DECIMAL(18,2)) AS d")
        sp = df.select(_spark_canon_expr(df.schema.fields[0])).collect()[0][0]
        assert sp == duck == want, (lit, sp, duck)


def test_hash_detects_single_cell_perturbation(spark):
    """The scalar compare must catch a one-cell change (the detection
    contract: same rows -> equal sums, any perturbed cell -> unequal)."""
    base = [(i, float(i) / 8, f"s{i}") for i in range(50)]
    df1 = spark.createDataFrame(base, "id long, x double, s string")
    mut = list(base)
    mut[17] = (17, 17 / 8 + 1e-3, "s17")
    df2 = spark.createDataFrame(mut, "id long, x double, s string")
    n1, h1 = canonical_hash_spark(df1)
    n2, h2 = canonical_hash_spark(df2)
    assert n1 == n2 == 50
    assert h1 != h2
    # and row ORDER must not matter (order-independent sum)
    df3 = spark.createDataFrame(list(reversed(base)), df1.schema)
    assert canonical_hash_spark(df3) == (n1, h1)


def test_unsupported_schema_raises(spark):
    df = spark.sql("SELECT array(1, 2) AS a")

    with pytest.raises(InEngineUnsupported):
        _spark_canon_expr(df.schema.fields[0])
    with pytest.raises(InEngineUnsupported):
        _duck_canon_expr("a", "INTEGER[]")


def test_inengine_agrees_with_pandas_tier_on_real_queries(spark):
    """Spot-pin the end-to-end agreement on queries that exercised the
    historical divergence classes: a13 (the repr-tie float), f20
    (timestamps + CASE math), j10 (nulls in every column), e7 (duck
    DATE vs spark timestamp), q1 (large decimal-derived sums)."""
    from tw_etl_spark.queries import all_queries

    reg = all_queries()
    for name in [
        "a13_histogram_quantiles",
        "f20_datetime_case_math",
        "j10_outer_join_family",
        "e7_retention_cohorts",
        "q1_pricing_summary",
    ]:
        check_query_inengine(spark, reg[name], "/root/testdata/sf0.001")
