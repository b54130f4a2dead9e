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
