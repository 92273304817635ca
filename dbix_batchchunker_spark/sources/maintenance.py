"""Table-maintenance for parquet at scale: sized writes and Z-order
clustering.

The two ops every 100 TB parquet estate runs nightly and Spark ships no
verb for:

* **The small-files problem** — a 1000-executor job that ends with
  ``spark.sql.shuffle.partitions`` output tasks writes thousands of tiny
  files per run; listing and opening them then dominates every later
  scan. :func:`write_sized_parquet` sizes the write to a target file
  size from a measured bytes-per-row sample instead of whatever the last
  shuffle's partition count happened to be.

* **Multi-dimensional data skipping** — parquet scans prune ROW GROUPS by
  footer min/max stats, but sorting by one column destroys locality in
  every other. :func:`zorder_by` interleaves the bits of bucketed
  dimension columns (Morton order) so a range predicate on ANY clustered
  dimension touches few row groups. Bucketing and interleave are one
  integer-exact closed form emitted per dialect (``div`` vs ``//``) by
  :func:`zvalue_sql`, so the layout key itself is driver-adjudicated
  against DuckDB (q49) — a wrong z-value silently destroys skipping
  without failing any query, which is exactly the kind of bug an oracle
  catches and a smoke test never will.

No reference analog (DBIx-BatchChunker delegates storage layout to the
RDBMS); this is the §2.C "100 TB posture" applied to the write side.
pyarrow-verified row-group pruning lives in tests/test_maintenance.py.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: bits per dimension in the Morton key (2 dims x 8 bits = 16-bit z —
#: 256 buckets/dim is plenty: skipping operates at row-group granularity,
#: and finer buckets only reshuffle rows WITHIN the same row group).
ZORDER_BITS = 8


# --------------------------------------------------------------------------- #
# Z-order (Morton) key — ONE expression generator, two dialects              #
# --------------------------------------------------------------------------- #
def zvalue_sql(cols: Sequence[str], mins: Sequence[str],
               maxs: Sequence[str], bits: int = ZORDER_BITS,
               dialect: str = "spark") -> str:
    """Morton (Z-order) key over integer dimension expressions, as a SQL
    string. Each dimension is equal-width bucketed into ``[0, 2**bits)``
    with pure BIGINT arithmetic —

        LEAST(((x - min) * 2**bits) floordiv (max - min + 1), 2**bits - 1)

    — then bucket bits are interleaved (dimension d owns bit positions
    ``d, d + ndims, d + 2*ndims, ...``). Only +,-,*,floordiv,shift,&,|
    on BIGINT: bit-identical across engines, whole-stage-codegen'd in
    Spark. The single generator IS the cross-engine guarantee — the
    dialects differ only in the floor-div token (``div`` vs ``//``)."""
    fdiv = {"spark": "div", "duckdb": "//"}[dialect]
    ndims = len(cols)
    nb = 1 << bits
    buckets = [
        f"LEAST((({c} - {lo}) * {nb}) {fdiv} ({hi} - {lo} + 1), {nb - 1})"
        for c, lo, hi in zip(cols, mins, maxs)
    ]
    terms = []
    for i in range(bits):
        for d, b in enumerate(buckets):
            terms.append(f"(SHIFTLEFT((SHIFTRIGHT({b}, {i}) & 1), {i * ndims + d}))"
                         if dialect == "spark"
                         else f"((({b} >> {i}) & 1) << {i * ndims + d})")
    return " | ".join(terms)


def zorder_by(df: DataFrame, cols: Sequence[str], n_partitions: int,
              bits: int = ZORDER_BITS) -> DataFrame:
    """Cluster ``df`` in Morton order over integer columns ``cols``:
    range-partition on the z-key (contiguous z-ranges per output file),
    sort within partitions (contiguous z-ranges per ROW GROUP — the
    granularity parquet stats actually prune at), drop the key.

    Min/max per dimension come from one tiny aggregate broadcast back
    into the plan (no collect; same stance as sp07's budget row). At
    100 TB this is the standard OPTIMIZE table-layout job: one full
    shuffle, embarrassingly parallel, run after ingest — every
    subsequent scan with predicates on any clustered dimension repays
    it via row-group skipping (measured in tests/test_maintenance.py)."""
    stats = df.agg(
        *[F.min(c).cast("long").alias(f"__min_{c}") for c in cols],
        *[F.max(c).cast("long").alias(f"__max_{c}") for c in cols],
    )
    z = zvalue_sql(
        [f"CAST({c} AS BIGINT)" for c in cols],
        [f"__min_{c}" for c in cols],
        [f"__max_{c}" for c in cols],
        bits,
        dialect="spark",
    )
    with_z = df.crossJoin(F.broadcast(stats)).withColumn("__z", F.expr(z))
    return (
        with_z.repartitionByRange(n_partitions, "__z")
        .sortWithinPartitions("__z")
        .drop("__z", *[f"__min_{c}" for c in cols],
              *[f"__max_{c}" for c in cols])
    )


# --------------------------------------------------------------------------- #
# Sized parquet writes                                                        #
# --------------------------------------------------------------------------- #
def estimate_parquet_bytes_per_row(df: DataFrame, sample_rows: int = 2000) -> float:
    """Parquet-encoded bytes/row measured on a bounded head sample
    (snappy, arrow writer — close enough to Spark's parquet writer for
    file SIZING, which only needs the right order of magnitude). A
    head-limit sample is biased toward the first partitions; acceptable
    for sizing, never for stats."""
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    # bounded: limit(sample_rows) rows cross to the driver, constant-sized
    pdf = df.limit(sample_rows).toPandas()
    if len(pdf) == 0:
        return 1.0
    buf = io.BytesIO()
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), buf,
                   compression="snappy")
    return max(buf.getbuffer().nbytes / len(pdf), 1.0)


def write_sized_parquet(
    df: DataFrame,
    path: str,
    target_mb: float = 128.0,
    n_rows: Optional[int] = None,
    sort_cols: Optional[Sequence[str]] = None,
    bytes_per_row: Optional[float] = None,
) -> dict:
    """Write ``df`` as parquet files of ~``target_mb`` each.

    file count = ceil(n_rows * bytes_per_row / target); the frame is
    repartitioned to exactly that count (by range over ``sort_cols`` when
    given — keeps clustering AND sizing; round-robin otherwise) and
    ``maxRecordsPerFile`` caps stragglers so one fat task can never emit
    a monster file. Row count and bytes/row are taken from the caller
    when known (a chunker loop knows both) to keep this single-pass;
    otherwise one COUNT aggregate + one bounded sample measure them.

    Returns the sizing decision ``{n_files, rows_per_file,
    bytes_per_row}`` so callers can log/assert it."""
    if n_rows is None:
        n_rows = df.count()
    if n_rows == 0:
        df.write.mode("overwrite").parquet(path)
        return {"n_files": 0, "rows_per_file": 0, "bytes_per_row": 0.0}
    if bytes_per_row is None:
        bytes_per_row = estimate_parquet_bytes_per_row(df)
    target_bytes = target_mb * 1024 * 1024
    n_files = max(1, math.ceil(n_rows * bytes_per_row / target_bytes))
    rows_per_file = math.ceil(n_rows / n_files)
    sized = (
        df.repartitionByRange(n_files, *sort_cols)
        if sort_cols
        else df.repartition(n_files)
    )
    (
        sized.write.mode("overwrite")
        .option("maxRecordsPerFile", rows_per_file)
        .parquet(path)
    )
    return {
        "n_files": n_files,
        "rows_per_file": rows_per_file,
        "bytes_per_row": bytes_per_row,
    }


def compact_parquet(spark, src_path: str, dst_path: str,
                    target_mb: float = 128.0,
                    sort_cols: Optional[Sequence[str]] = None) -> dict:
    """Rewrite a fragmented parquet directory at the target file size —
    the nightly bin-packing pass. Writes ASIDE (``dst_path``) and leaves
    the swap to the caller: an in-place overwrite that fails mid-write
    destroys the table, and object stores make rename-into-place the
    caller's transaction primitive, not this helper's."""
    df = spark.read.parquet(src_path)
    return write_sized_parquet(df, dst_path, target_mb, sort_cols=sort_cols)
