"""Distributed global prefix sums (running totals over a TOTAL order).

The naive spelling — ``SUM(x) OVER (ORDER BY k)`` with no PARTITION BY —
makes Spark funnel the entire table through ONE task (a single-partition
window), which is exactly the driver-shaped bottleneck a 100 TB build
cannot contain. The classic fix is the two-phase prefix sum:

1. range-partition by the order key (``repartitionByRange`` keeps key
   ranges contiguous and ordered across partition ids);
2. windowed running sum WITHIN each partition (parallel, partition-local
   sort only);
3. per-partition totals — one tiny row per partition — prefix-summed on
   the driver and broadcast back as per-partition base offsets.

Only #partitions rows ever reach the driver; everything row-scale stays
distributed. q31's single-partition window is fine for key-bounded frames
(one row per order date); this helper is for running sums over row-scale
frames, where sp04's sequence packing lives.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_global_cumsum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "cumsum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``out_col`` = running total of ``value_col`` over the global
    ``order_col`` order (inclusive of the current row), without a
    single-partition window.

    ``order_col`` must be a total order (unique values); the result is
    then independent of partition boundary placement — per-partition
    offsets are computed from the ACTUAL partition sums, so where
    ``repartitionByRange``'s sampled boundaries land cannot change any
    row's cumsum.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(n, F.col(order_col)).withColumn(
        "__pid", F.spark_partition_id()
    )
    w = Window.partitionBy("__pid").orderBy(order_col)
    local = ranged.withColumn("__local_cum", F.sum(value_col).over(w))
    # one row per partition crosses to the driver — #partitions, not #rows
    totals = sorted(
        (r["__pid"], r["__tot"])
        for r in local.groupBy("__pid")
        .agg(F.max("__local_cum").alias("__tot"))
        .collect()
    )
    offsets, acc = {}, 0
    for pid, tot in totals:
        offsets[pid] = acc
        acc += tot
    # range partitioning ⇒ pid order == key order, so the prefix of the
    # partition sums IS each partition's base offset
    offset_col: Column = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in offsets.items() for x in kv]
        ),
        F.col("__pid"),
    )
    return local.withColumn(out_col, F.col("__local_cum") + offset_col).drop(
        "__pid", "__local_cum"
    )
