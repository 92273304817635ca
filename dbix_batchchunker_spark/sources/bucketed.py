"""Bucketed tables: co-located joins with NO shuffle (SURVEY.md §2.C
"pre-partitioning / bucketing for co-located joins").

Writing both sides of a hot join bucketed by the join key (same bucket
count) lets Spark's sort-merge join read matching buckets directly —
`.explain` shows no Exchange on either side. At 100 TB this turns the
dominant repeated shuffle (e.g. orders ⋈ lineitem on orderkey in every
pipeline run) into a one-time write-side cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 16,
    sorted_within: bool = True,
) -> None:
    """Persist as a bucketed (and bucket-sorted) managed table."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sorted_within:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table_name)


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)


def cobucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on,
    how: str = "inner",
) -> DataFrame:
    """Join two tables bucketed on their join keys — shuffle-free when bucket
    counts match and AQE doesn't override (see write_bucketed)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
