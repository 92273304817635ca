"""Bounded driver-side rows → DataFrame, sliced to the DATA's size.

``SparkSession.createDataFrame(list)`` parallelizes the list across
``defaultParallelism`` pickled slices, so EVERY consuming action — a
broadcast build, an orderBy, the bench's noop write — runs a job whose
every task spins a Python worker just to re-emit a slice of rows that
already sit on the driver (measured ~350 ms per cold task, 32 near-empty
tasks for a 50-row list — optimization guide §4). Result frames,
planted corpora, and small lookup sides pay that fan-out repeatedly.

This helper sizes the slice count to the row count instead. It is for
BOUNDED driver-side row sets (collected results, planted fixtures,
per-partition metadata); anything row-scale must stay distributed.
pandas inputs don't need it — with Arrow enabled they already slice by
record batch.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

#: One Python worker comfortably emits thousands of pickled rows; the
#: fan-out only pays past this many rows per slice.
_ROWS_PER_SLICE = 8192


def driver_rows_df(
    spark: SparkSession,
    rows: list,
    schema,
    rows_per_slice: int = _ROWS_PER_SLICE,
) -> DataFrame:
    """``createDataFrame`` with ``ceil(len(rows)/rows_per_slice)`` slices
    (always ≥ 1) instead of the cluster default. Accepts the same
    ``schema`` forms ``createDataFrame`` does (DDL string / StructType).
    """
    nslices = max(1, math.ceil(len(rows) / max(1, rows_per_slice)))
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, nslices), schema
    )
