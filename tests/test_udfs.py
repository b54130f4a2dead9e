"""UDF-surface tests beyond the u1–u4 oracle queries."""

from __future__ import annotations

from pyspark.sql import functions as F

from tw_etl_spark.catalog import read_table
from tests.conftest import SF_SMOKE


def test_arrow_udf_matches_row_udf(spark):
    """useArrow=True must be a pure transport change: identical results
    to the row-at-a-time form on the same column, nulls included."""
    from tw_etl_spark.operators.udfs import slug_arrow_udf, slug_udf

    d = read_table(spark, SF_SMOKE, "documents").limit(200).select(
        "doc_id", F.col("source").alias("s")
    ).withColumn("s", F.when(F.col("doc_id") % 17 == 0, None).otherwise(F.col("s")))
    a = {r.doc_id: r.v for r in d.select("doc_id", slug_udf("s").alias("v")).collect()}
    b = {r.doc_id: r.v for r in d.select("doc_id", slug_arrow_udf("s").alias("v")).collect()}
    assert a == b
    assert any(v is None for v in a.values())


def test_parquet_schema_evolution_mergeschema(spark, tmp_path):
    """Schema evolution on read: batches written before a column existed
    merge with later batches (mergeSchema), old rows NULL-filled — the
    contract for long-lived 100 TB tables that gain columns over time."""
    p = str(tmp_path / "evolving")
    spark.range(0, 10).select(F.col("id"), F.lit("a").alias("v")).write.parquet(
        p + "/batch=1"
    )
    spark.range(10, 20).select(
        F.col("id"), F.lit("b").alias("v"), F.lit(1.5).alias("score")
    ).write.parquet(p + "/batch=2")
    merged = spark.read.option("mergeSchema", True).parquet(p)
    assert set(merged.columns) == {"id", "v", "score", "batch"}
    assert merged.count() == 20
    old = merged.filter(F.col("batch") == 1)
    assert old.filter(F.col("score").isNull()).count() == 10
    new = merged.filter(F.col("batch") == 2)
    assert new.filter(F.col("score") == 1.5).count() == 10
