"""Vector math over ``ArrayType`` columns via higher-order functions.

These stay entirely JVM-side (no Python UDF round-trip): ``zip_with`` +
``aggregate`` compile to Catalyst expressions. The fold is sequential
left-to-right, which makes the result bit-compatible with a scalar
loop (e.g. DuckDB's ``list_dot_product``) — important for the oracle
hash-match. For bulk similarity (N×M matmul) use
``operators.similarity`` instead, which goes through Arrow + numpy.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_expr(a: Column, b: Column) -> Column:
    """Exact dot product of two array columns (double accumulator)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm_expr(a: Column) -> Column:
    return F.sqrt(dot_expr(a, a))


def cosine_similarity_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (l2_norm_expr(a) * l2_norm_expr(b))


def long_array_lit(values: list[int]) -> Column:
    """A single ``array<bigint>`` literal from a Python int list.

    Round 14: element-wise construction (``F.array(*[F.lit(v).cast(
    "long") ...])``) costs two py4j round-trips per element — ~3 s of
    plan-construction for a 1024-word Bloom bitmap — and leaves a
     2N-node CreateArray tree for Catalyst to fold. One parsed SQL
    array literal is one py4j call and arrives pre-typed (the ``L``
    suffix pins BIGINT regardless of magnitude, where ``F.lit(list)``
    would infer int from small values)."""
    return F.expr("array(" + ",".join(f"{int(v)}L" for v in values) + ")")


def _fmt_double(v: float) -> str:
    """SQL double literal with exact bit round-trip: ``repr(float)`` is
    the shortest decimal that parses back to the same IEEE-754 double
    (both CPython and the JVM parse correctly rounded), and the ``D``
    suffix pins DoubleType in the SQL parser."""
    return repr(float(v)) + "D"


def double_array_lit(values) -> Column:
    """A single ``array<double>`` literal from a Python float list.

    The ``F.lit(list)`` form is NOT one py4j call in classic mode — it
    expands to ``array(*[lit(x) for x in list])``, one round-trip per
    element (ADVICE r14; verified in pyspark 4.1 builtin.py). One
    parsed SQL literal is one round-trip regardless of length, with
    bit-identical doubles (see :func:`_fmt_double`)."""
    return F.expr("array(" + ",".join(_fmt_double(v) for v in values) + ")")


def nested_double_array_lit(values) -> Column:
    """One parsed literal for an arbitrarily nested list-of-lists of
    floats (``array<array<...double>>``) — centroid tables, PQ
    codebooks. Same one-round-trip / bit-identity rationale as
    :func:`double_array_lit`."""

    def fmt(v) -> str:
        if isinstance(v, (list, tuple)):
            return "array(" + ",".join(fmt(x) for x in v) + ")"
        return _fmt_double(v)

    return F.expr(fmt(values))
