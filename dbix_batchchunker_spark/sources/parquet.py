"""Parquet chunked source/sink helpers.

The keyed-overwrite sink is the file-side answer to per-chunk UPDATE/DELETE
(SURVEY.md §2.B "DML" row): partition the output by key bucket and use
dynamic partition overwrite so re-running a chunk replaces exactly its own
bucket files — idempotent under retry, which is the property the reference
demands of chunk work (BatchChunker.pm:109-112).
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_table(spark: SparkSession, path: str, columns: Optional[list] = None) -> DataFrame:
    df = spark.read.parquet(path)
    return df.select(*columns) if columns else df


def keyed_overwrite(
    df: DataFrame,
    path: str,
    id_name: str,
    bucket_width: int,
    min_id: int = 0,
) -> None:
    """Write ``df`` partitioned by key bucket with dynamic partition
    overwrite: only the buckets present in ``df`` are replaced, so a chunked
    rewrite touches exactly the ranges it processed."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            df.withColumn(
                "__bucket",
                ((F.col(id_name) - F.lit(min_id)) / F.lit(bucket_width)).cast("long"),
            )
            .write.partitionBy("__bucket")
            .mode("overwrite")
            .parquet(path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def read_keyed(spark: SparkSession, path: str) -> DataFrame:
    """Read a keyed-overwrite table back, dropping the bucket column."""
    df = spark.read.parquet(path)
    return df.drop("__bucket") if "__bucket" in df.columns else df
