"""Column-expression helpers (all JVM-side, codegen-friendly)."""

from tw_etl_spark.functions.vectors import (  # noqa: F401
    dot_expr,
    l2_norm_expr,
    cosine_similarity_expr,
)
