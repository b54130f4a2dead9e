"""UDF-surface queries: each user-defined flavor exercised through an
oracle-verifiable computation (the UDF computes something ANSI SQL can
also express, so DuckDB checks the values end-to-end)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tw_etl_spark.catalog import read_table as _t
from tw_etl_spark.operators.udfs import (
    TokenPositionsUDTF,
    rescale_udf,
    slug_udf,
    weighted_avg_udaf,
    zscore_per_group,
    ZSCORE_SCHEMA,
)
from tw_etl_spark.queries import register


@register(
    "u1_scalar_udfs",
    oracle="""
    SELECT
        p_partkey,
        lower(replace(trim(p_name), ' ', '-'))  AS slug,
        round(p_retailprice * 1.8 + 32.0, 6)    AS rescaled
    FROM part
    ORDER BY p_partkey
    """,
    doc="Scalar Python UDF (slug) + vectorized Pandas UDF (rescale), "
    "value-checked against the pure-SQL forms.",
    tags=("udf",),
)
def u1(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return (
        p.select(
            "p_partkey",
            slug_udf(F.col("p_name")).alias("slug"),
            F.round(rescale_udf(F.col("p_retailprice")), 6).alias("rescaled"),
        )
        .orderBy("p_partkey")
    )


@register(
    "u2_pandas_udaf",
    oracle="""
    SELECT
        l_returnflag,
        round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 6) AS wavg_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="Pandas UDAF (GROUPED_AGG weighted average) vs the exact SQL "
    "aggregate.",
    tags=("udf", "udaf"),
)
def u2(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.round(
                weighted_avg_udaf(F.col("l_extendedprice"), F.col("l_quantity")), 6
            ).alias("wavg_price")
        )
        .orderBy("l_returnflag")
    )


@register(
    "u3_grouped_map_zscore",
    oracle="""
    WITH stats AS (
        SELECT user_id, avg(value) AS mu, stddev_pop(value) AS sd
        FROM events GROUP BY user_id
    )
    SELECT e.user_id, e.event_id,
           round(CASE WHEN sd = 0 THEN 0.0 ELSE (value - mu) / sd END, 6) AS zscore
    FROM events e JOIN stats USING (user_id)
    ORDER BY user_id, event_id
    """,
    doc="Grouped-map applyInPandas (per-user z-score) vs the window/join "
    "SQL form.",
    tags=("udf", "grouped-map"),
)
def u3(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    # Round 14 (guide §4.1): applyInPandas ships EVERY column of the
    # grouped rows through Arrow to the Python worker — events carries
    # ts/event_type/props (a JSON string) that zscore_per_group never
    # reads. Project to the three used columns first: less parquet
    # read, less shuffle, ~half the Python-boundary bytes. Same result.
    e = e.select("user_id", "event_id", "value")
    out = e.groupBy("user_id").applyInPandas(zscore_per_group, schema=ZSCORE_SCHEMA)
    return out.select(
        "user_id", "event_id", F.round("zscore", 6).alias("zscore")
    ).orderBy("user_id", "event_id")


@register(
    "u4_udtf_token_positions",
    oracle="""
    WITH tok AS (
        SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS t
        FROM documents WHERE doc_id < 50
    )
    SELECT doc_id, unnest(t) AS token,
           unnest(range(1, len(t) + 1)) AS pos
    FROM tok
    ORDER BY doc_id, pos
    """,
    doc="Python UDTF: row → (token, position) lateral explosion (the R4 "
    "ffprobe row→rows pattern) vs DuckDB's zipped unnest.",
    tags=("udf", "udtf"),
)
def u4(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    spark.udtf.register("token_positions", TokenPositionsUDTF)
    d.createOrReplaceTempView("u4_docs")
    return spark.sql(
        """
        SELECT doc_id, token, pos
        FROM u4_docs, LATERAL token_positions(text)
        ORDER BY doc_id, pos
        """
    )
