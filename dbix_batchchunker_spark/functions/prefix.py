"""Distributed global prefix sums (running totals over a TOTAL order).

The naive spelling — ``SUM(x) OVER (ORDER BY k)`` with no PARTITION BY —
makes Spark funnel the entire table through ONE task (a single-partition
window), which is exactly the driver-shaped bottleneck a 100 TB build
cannot contain. The classic fix is the two-phase prefix sum:

1. range-partition by the order key (``repartitionByRange`` keeps key
   ranges contiguous and ordered across partition ids);
2. windowed running sum WITHIN each partition;
3. per-partition totals — one tiny row per partition — prefix-summed on
   the driver and broadcast-joined back as per-partition base offsets.

Only #partitions rows ever reach the driver; everything row-scale stays
distributed. Honest cost model: TWO row-scale exchanges (the range
partition, then the window's hash partition on the pid — Spark cannot be
told the data is already pid-partitioned), both carrying only the slim
(order, value) projection the callers pass. The one-exchange variant
would do the partition-local cumsum in ``mapInPandas``; not taken — it
trades a shuffle of slim rows for an Arrow round-trip of every row and
puts Python on the row path.

q31's single-partition window is fine for key-bounded frames (one row
per order date); this helper is for running sums over row-scale frames,
where sp04's sequence packing lives.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Every persisted frame this module creates, so callers that cannot reach
#: the ``.cumsum_cache`` attribute (it is lost by any downstream
#: transformation — a round-7 advice finding) still have a deterministic
#: cleanup path: :func:`release_cumsum_caches`. bench.py calls it between
#: queries; long-lived sessions should call it after materializing results.
_LIVE_CACHES: list[DataFrame] = []


#: Above this partition count the per-partition offsets ride the
#: broadcast-join fallback: the literal array serializes into every task
#: binary (~12 bytes/partition) and a multi-MB plan constant helps nobody.
#: 16384 covers any sane range-partition count by orders of magnitude.
_OFFSETS_LITERAL_MAX_PARTS = 16384


def _dense_offset_col(bases: list, base_type: str):
    """Per-partition base offsets as ONE constant-folded array literal,
    indexed O(1) by ``__pid`` (dense 0..n-1 by construction of
    ``spark_partition_id``). The createDataFrame + broadcast-join
    spelling of the same lookup costs a defaultParallelism-task job per
    consuming action — parallelizing the tiny Python list slices it
    across the whole cluster default, and EVERY slice's task spins a
    Python worker just to re-emit rows that already sit on the driver
    (measured: ~350 ms/task × 32 near-empty tasks per broadcast build,
    optimization guide §4). split(lit).cast is foldable, so the
    optimizer collapses it to a plain array literal at plan time: zero
    jobs, zero Python workers, no exchange. repr() round-trips binary64
    exactly; callers guard non-finite values into the fallback."""
    csv = ",".join(
        repr(float(b)) if base_type == "double" else str(int(b))
        for b in bases
    )
    return F.element_at(
        F.split(F.lit(csv), ",").cast(f"array<{base_type}>"),
        F.col("__pid") + 1,
    )


def register_cache(df: DataFrame) -> DataFrame:
    """Enroll an externally persisted frame in the same release registry,
    so operators that must persist-and-count (e.g. tx22's vocab gate) get
    the identical cleanup path. Returns the frame for chaining."""
    _LIVE_CACHES.append(df)
    return df


def release_cumsum_caches() -> int:
    """Unpersist every cumsum cache created since the last release.

    Idempotent (``unpersist`` on an already-unpersisted frame is a no-op)
    and safe to call while results are still lazy — downstream actions
    recompute the ranged frame, which is deterministic for deterministic
    sources (see the persist note in :func:`with_global_cumsum`). Returns
    the number of handles released."""
    n = len(_LIVE_CACHES)
    while _LIVE_CACHES:
        _LIVE_CACHES.pop().unpersist()
    return n


def with_global_rank(
    df: DataFrame,
    order_cols: "list",
    unique_cols: "list[str] | None" = None,
    out_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``out_col`` = global 1-based ROW_NUMBER over ``order_cols``
    without a single-partition window — the two-phase rewrite (range
    partition → partition-local row_number → per-partition counts prefix-
    summed on the driver and broadcast back as base offsets). The rank
    sibling of :func:`with_global_cumsum`; tx22's vocabulary rank rides it
    so the plan stays shuffle-parallel at ANY vocabulary size (round-7
    verdict "Next round #5" — the single-partition window was fine under
    Heaps' law but a documented cliff past ~100M types).

    ``order_cols`` are sort expressions (``F.col("freq").desc()`` is fine)
    and must define a TOTAL order; ``unique_cols`` names a plain-column
    uniqueness witness for the assert (default: ``order_cols`` when they
    are all strings — pass it explicitly when any sort expression is not).
    Same persistence contract as the cumsum: the ranged frame is persisted,
    registered in the release registry, and exposed as ``.cumsum_cache``.
    """
    spark = df.sparkSession
    order_exprs = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    if unique_cols is None:
        if not all(isinstance(c, str) for c in order_cols):
            raise ValueError(
                "unique_cols is required when order_cols contains sort "
                "expressions (the uniqueness witness needs plain columns)"
            )
        unique_cols = list(order_cols)
    n = num_partitions or spark.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(n, *order_exprs)
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    _LIVE_CACHES.append(ranged)
    w = Window.partitionBy("__pid").orderBy(*order_exprs)
    local = ranged.withColumn("__local_rank", F.row_number().over(w))
    # one row per partition to the driver; the distinct-struct check rides
    # the same job (range partitioning co-locates equal keys, so the
    # per-partition check is a global duplicate detector) — bounded.
    stats = (
        ranged.groupBy("__pid")
        .agg(
            F.count(F.lit(1)).alias("__cnt"),
            F.countDistinct(F.struct(*unique_cols)).alias("__dst"),
        )
        .collect()  # bounded: #partitions rows
    )
    bad = [r["__pid"] for r in stats if r["__cnt"] != r["__dst"]]
    if bad:
        raise ValueError(
            f"with_global_rank requires a total order; duplicate "
            f"{unique_cols!r} tuples found in partitions {bad[:5]}"
        )
    # dense 0..max_pid base array (partitions with no rows keep the
    # running count — they contribute no output rows, the slot only
    # aligns later indices)
    by_pid = {r["__pid"]: r["__cnt"] for r in stats}
    max_pid = max(by_pid, default=-1)
    bases, acc = [], 0
    for pid in range(max_pid + 1):
        bases.append(acc)
        acc += by_pid.get(pid, 0)
    if max_pid < _OFFSETS_LITERAL_MAX_PARTS:
        out = (
            local.withColumn(
                out_col,
                _dense_offset_col(bases, "long") + F.col("__local_rank"),
            )
            .drop("__pid", "__local_rank")
        )
    else:
        offsets = spark.createDataFrame(
            list(enumerate(bases)), "__pid int, __base long"
        )
        out = (
            local.join(F.broadcast(offsets), "__pid")
            .withColumn(out_col, F.col("__base") + F.col("__local_rank"))
            .drop("__pid", "__local_rank", "__base")
        )
    out.cumsum_cache = ranged
    out.cumsum_total = acc
    return out


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
    offsets are computed from the ACTUAL partition sums
    (``sum(value_col)``, so negative and NULL values are handled), so
    where ``repartitionByRange``'s sampled boundaries land cannot change
    any row's cumsum.

    The partitioned input is persisted before the totals job: the
    offsets map is built from the SAME materialization every downstream
    action reads, never from a recomputation (a nondeterministic source
    recomputed differently would silently skew every later partition).
    The persisted handle is exposed as ``.cumsum_cache`` on the returned
    frame — call ``out.cumsum_cache.unpersist()`` when done with the
    result (or ``spark.catalog.clearCache()``, as bench.py does).
    """
    spark = df.sparkSession
    vt = dict(df.dtypes)[value_col]
    if vt in ("tinyint", "smallint", "int", "bigint"):
        base_type = "long"
    elif vt in ("float", "double"):
        base_type = "double"
    else:
        raise TypeError(
            f"with_global_cumsum supports integral/floating value columns; "
            f"got {value_col}: {vt} (cast decimals explicitly)"
        )
    n = num_partitions or spark.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(n, F.col(order_col))
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    _LIVE_CACHES.append(ranged)
    # ROWS, not the default RANGE frame: RANGE is peer-inclusive, so a
    # duplicated order key would fold its peers' values into both rows'
    # running totals — and the result would then depend on which range
    # partition the ties landed in. ROWS + the uniqueness check below
    # make duplicates loud instead of silently wrong.
    w = (
        Window.partitionBy("__pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.withColumn("__local_cum", F.sum(value_col).over(w))
    # one row per partition crosses to the driver — #partitions, not #rows.
    # The uniqueness check rides the SAME job: repartitionByRange sends
    # equal keys to the same partition, so per-partition count vs
    # count(DISTINCT) is a GLOBAL duplicate detector at zero extra scans
    # (count() also counts NULL keys, countDistinct ignores them — NULLs
    # therefore trip the check too, and a NULL key is not a total order).
    stats = (
        ranged.groupBy("__pid")
        .agg(
            F.sum(value_col).alias("__tot"),
            F.count(F.lit(1)).alias("__cnt"),
            F.countDistinct(order_col).alias("__dst"),
        )
        .collect()  # bounded: one row per partition — #partitions, not #rows
    )
    bad = [r["__pid"] for r in stats if r["__cnt"] != r["__dst"]]
    if bad:
        raise ValueError(
            f"with_global_cumsum requires a unique, non-NULL {order_col!r} "
            f"(a total order); duplicates or NULLs found in partitions {bad[:5]}"
        )
    # dense 0..max_pid base array (empty partitions contribute 0 and no
    # rows; their slot only aligns later indices)
    by_pid = {r["__pid"]: r["__tot"] for r in stats}
    max_pid = max(by_pid, default=-1)
    bases, acc = [], (0.0 if base_type == "double" else 0)
    for pid in range(max_pid + 1):
        bases.append(acc)
        acc += by_pid.get(pid, 0) or 0  # all-NULL partition sum → 0
    literal_ok = max_pid < _OFFSETS_LITERAL_MAX_PARTS and (
        base_type != "double" or all(math.isfinite(b) for b in bases)
    )
    if literal_ok:
        out = (
            local.withColumn(
                out_col,
                F.col("__local_cum") + _dense_offset_col(bases, base_type),
            )
            .drop("__pid", "__local_cum")
        )
    else:
        # broadcast-join fallback: stays a hash lookup at ANY partition
        # count (and carries non-finite doubles exactly)
        offsets = spark.createDataFrame(
            list(enumerate(bases)), f"__pid int, __base {base_type}"
        )
        out = (
            local.join(F.broadcast(offsets), "__pid")
            .withColumn(out_col, F.col("__local_cum") + F.col("__base"))
            .drop("__pid", "__local_cum", "__base")
        )
    # expose the cache handle so callers can scope cleanup to THIS call
    # instead of a session-global clearCache, and the grand total (already
    # on the driver from the offsets pass) so callers never launch a
    # second job just to re-sum the column
    out.cumsum_cache = ranged
    out.cumsum_total = acc
    return out


#: Shared tier threshold for :func:`tiered_global_rank` — below it the
#: whole keyset is one fast single-partition window task; at or above it
#: no single task may hold the rows (tx22's measured cliff, reused by
#: q57's islands).
TIERED_RANK_MIN_ROWS = 5_000_000


def tiered_global_rank(
    df: DataFrame,
    order_cols: "list",
    unique_cols: "list[str]",
    out_col: str = "__r",
    min_rows: int = TIERED_RANK_MIN_ROWS,
) -> DataFrame:
    """Global 1-based ROW_NUMBER with the tier decision built in: persist
    the (slim) input, gate-count it, and rank via a plain single-partition
    window below ``min_rows`` or :func:`with_global_rank` past it. ONE
    copy of the dispatch both tx22 and q57 previously duplicated (round-9
    review) — the persist means the gate count's scan is reused by the
    rank and by whatever the caller computes downstream, and the frame is
    enrolled in the release registry like every other cached rank input."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = register_cache(df.persist())
    n = df.count()  # bounded: one long — the tier decision
    if n >= min_rows:
        return with_global_rank(
            df, order_cols, unique_cols=unique_cols, out_col=out_col
        )
    order_exprs = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    w = Window.orderBy(*order_exprs)
    return df.withColumn(out_col, F.row_number().over(w))
