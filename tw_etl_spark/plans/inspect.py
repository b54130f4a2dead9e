"""Helpers for reading a DataFrame's physical plan as text and asserting
scan/join/shuffle properties."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df.sparkSession._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across scans in the plan."""
    plan = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        out.extend(p.strip() for p in m.group(1).split(",") if p.strip())
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists actually read by each scan (column-pruning check)."""
    plan = explain_str(df)
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        out.append(cols)
    return out


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the final (AQE) plan."""
    plan = explain_str(df)
    return len(re.findall(r"\bExchange\b(?! SinglePartition)", plan)) - len(
        re.findall(r"BroadcastExchange", plan)
    )


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df) or "BroadcastNestedLoopJoin" in (
        explain_str(df)
    )


def has_forced_broadcast(df: DataFrame) -> bool:
    """True if any join in the OPTIMIZED LOGICAL plan carries an explicit
    broadcast hint (F.broadcast / /*+ BROADCAST */). Distinguishes a
    pinned strategy — which survives to any data size and OOMs on a
    data-sized side — from Catalyst's stats-based broadcast choice,
    which flips to shuffle joins at scale."""
    optimized = df._jdf.queryExecution().optimizedPlan().toString()  # noqa: SLF001
    return "strategy=broadcast" in optimized
