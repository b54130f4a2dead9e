"""UDF surface (SURVEY.md §2.2): scalar Python UDF, vectorized Pandas
UDF, Pandas UDAF (GROUPED_AGG), grouped-map applyInPandas, Python UDTF.

Engine guidance encoded here: row-at-a-time Python UDFs exist for
completeness (the reference's crypto UDF niche, R11) but every hot-path
use gets the Arrow-vectorized form — ~10-100× less serde overhead, and
whole batches hit numpy.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf, udf, udtf


# --- scalar row-at-a-time UDF (slow path, niche use only) -----------------
@udf(returnType=T.StringType())
def slug_udf(s: str) -> str:
    """Deterministic slug: lowercase, spaces→'-' (R11-style name munging)."""
    return None if s is None else s.strip().lower().replace(" ", "-")


# --- vectorized scalar Pandas UDF ----------------------------------------
@pandas_udf(T.DoubleType())
def rescale_udf(v: pd.Series) -> pd.Series:
    """Arrow-batched linear rescale (v*1.8+32); whole batch in numpy."""
    return v * 1.8 + 32.0


# --- Pandas UDAF (GROUPED_AGG) -------------------------------------------
@pandas_udf(T.DoubleType())
def weighted_avg_udaf(v: pd.Series, w: pd.Series) -> float:
    """sum(v*w)/sum(w) — verified against the exact SQL form."""
    den = w.sum()
    return float((v * w).sum() / den) if den else float("nan")


# --- grouped map (applyInPandas) -----------------------------------------
ZSCORE_SCHEMA = "user_id long, event_id long, value double, zscore double"


def zscore_per_group(pdf: pd.DataFrame) -> pd.DataFrame:
    mu, sd = pdf["value"].mean(), pdf["value"].std(ddof=0)
    pdf = pdf[["user_id", "event_id", "value"]].copy()
    pdf["zscore"] = 0.0 if sd == 0 else (pdf["value"] - mu) / sd
    return pdf


# --- Python UDTF ----------------------------------------------------------
@udtf(returnType="token string, pos bigint")
class TokenPositionsUDTF:
    """Row → (token, 1-based position) rows; the ffprobe row→rows
    explosion pattern (R4) as a user-defined table function."""

    def eval(self, text: str):
        if text is None:
            return
        pos = 0
        for tok in text.split(" "):
            if tok:
                pos += 1
                yield tok, pos


# --- Arrow-optimized Python UDF (Spark 3.5+/4 useArrow) -------------------
@udf(returnType=T.StringType(), useArrow=True)
def slug_arrow_udf(s: str) -> str:
    """Same row-wise semantics as ``slug_udf`` but with Arrow transport:
    the per-row Python function is unchanged while (de)serialization is
    Arrow-columnar — the drop-in accelerator for legacy row UDFs that
    can't be rewritten as vectorized Pandas UDFs."""
    return None if s is None else s.strip().lower().replace(" ", "-")
