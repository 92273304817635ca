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


def _bucket_expr(id_name: str, bucket_width: int, min_id: int):
    """EXACT integer bucket assignment: ``(id - min_id) div width``.
    The first version used double division + cast — truncation that
    silently disagrees with the readers' integer floor for ids below
    ``min_id`` and loses precision past 2^53 (round-9 review). ``min_id``
    must not exceed any id in the table; readers validate the same."""
    return F.expr(
        f"CAST((({id_name}) - {min_id}) div {bucket_width} AS BIGINT)"
    )


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
            df.withColumn("__bucket", _bucket_expr(id_name, bucket_width, min_id))
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


# --------------------------------------------------------------------------- #
# Compensating chunk commit (round-8 verdict "What's missing" #4): the        #
# reference's single_rows mode wraps each chunk in a DB TRANSACTION           #
# (BatchChunker.pm:1305-1327); Spark file sinks have no transactions, so      #
# this repo's stance has been replay-based idempotency. The protocol below    #
# closes the remaining behavioral delta — DETECTING a torn chunk and          #
# repairing it — with roll-forward compensation around keyed_overwrite's      #
# bucket layout:                                                              #
#                                                                             #
#   stage   -> write the chunk's buckets under _staging/chunk=<id>           #
#   promote -> swap each staged bucket dir into the live table               #
#   commit  -> atomically (tmp+rename) drop _commits/chunk-<id>.json         #
#              listing the buckets replaced                                   #
#                                                                             #
# Crash anywhere before the marker: the next run of the SAME chunk finds no   #
# marker, re-stages from scratch (mode=overwrite heals a torn staging) and    #
# re-promotes — roll-forward recomputation, sound because the reference       #
# already demands idempotent chunk work (BatchChunker.pm:109-112). Crash      #
# after the marker: the run is a no-op ("already-committed"), giving          #
# exactly-once OBSERVABLE effect per chunk. `uncommitted_residue` lists       #
# chunks needing compensation so an operator can repair a dead run without    #
# re-walking every range.                                                     #
# --------------------------------------------------------------------------- #
def compensating_chunk_overwrite(
    df: DataFrame,
    path: str,
    chunk_id: str,
    id_name: str,
    bucket_width: int,
    min_id: int = 0,
    id_range: "tuple[int, int] | None" = None,
    is_tail: bool = False,
) -> str:
    """Chunk-transactional keyed overwrite; returns "committed" on a fresh
    commit or "already-committed" on replay. ``chunk_id`` must be stable
    across retries of the same chunk (e.g. f"{start}-{end}").

    PRECONDITIONS (round-9 review — violating either silently corrupts):

    * **Bucket alignment**: the atomic replace unit is the BUCKET, so a
      chunk must contain ALL surviving rows of every bucket it touches.
      Pass ``id_range=(start, end)`` to have alignment VALIDATED
      (``is_tail=True`` for the table's final partial chunk); without it
      the caller owns the invariant.
    * **One writer per bucket at a time**: concurrent promotes of the
      same bucket race (rmtree vs move). Aligned chunks touch disjoint
      buckets, so any per-id-range concurrency (ConcurrentChunker) is
      safe once alignment holds.
    * **Emptied buckets** (round-9 advisor, medium): a delete-heavy chunk
      can leave ZERO surviving rows in a bucket it covers; the staged
      write then produces no ``__bucket=`` dir for it, and a
      staged-dirs-only promote would leave the old live bucket — stale
      rows surviving a committed delete. With ``id_range`` the promote
      therefore CLEARS every covered live bucket that has no staged
      replacement (recorded under ``"cleared"`` in the marker). WITHOUT
      ``id_range`` the covering buckets are unknowable from the data
      alone (an absent bucket is indistinguishable from one outside the
      chunk), so an emptied bucket is NOT cleared and retains stale
      data — pass ``id_range`` whenever deletes are possible."""
    import json
    import shutil

    if id_range is not None:
        start, end = id_range
        if start < min_id:
            raise ValueError(
                f"chunk start {start} below min_id {min_id}: bucket math "
                f"requires non-negative offsets"
            )
        if (start - min_id) % bucket_width != 0 or (
            not is_tail and (end - min_id + 1) % bucket_width != 0
        ):
            raise ValueError(
                f"chunk [{start}, {end}] is not bucket-aligned "
                f"(width {bucket_width}, min_id {min_id}): the protocol's "
                f"atomic unit is the BUCKET, so a chunk covering part of a "
                f"bucket would replace the whole bucket with partial data. "
                f"Align chunk boundaries to bucket multiples (pass "
                f"is_tail=True for the table's final partial chunk)."
            )
    staging = os.path.join(path, "_staging", f"chunk={chunk_id}")
    marker = os.path.join(path, "_commits", f"chunk-{chunk_id}.json")
    if os.path.exists(marker):
        # a crash BETWEEN the marker write and the staging cleanup leaves
        # committed-but-staged residue; sweep it here so replay is the
        # repair path for that window too (round-9 review finding)
        shutil.rmtree(staging, ignore_errors=True)
        return "already-committed"
    # stage (overwrite heals any torn staging from a crashed attempt)
    (
        df.withColumn("__bucket", _bucket_expr(id_name, bucket_width, min_id))
        .write.partitionBy("__bucket")
        .mode("overwrite")
        .parquet(staging)
    )
    # promote: swap each staged bucket into the live table
    buckets = []
    for entry in sorted(os.listdir(staging)):
        if not entry.startswith("__bucket="):
            continue
        buckets.append(entry)
        target = os.path.join(path, entry)
        if os.path.exists(target):
            shutil.rmtree(target)
        shutil.move(os.path.join(staging, entry), target)
    # clear covered-but-unstaged live buckets: a bucket the chunk's range
    # covers that produced no staged dir has zero surviving rows, and its
    # old live dir must not outlive the commit (delete-heavy chunks).
    # Idempotent on replay: a crash after the rmtree re-stages and
    # re-clears an already-absent dir, a no-op.
    cleared = []
    if id_range is not None:
        start, end = id_range
        for b in range((start - min_id) // bucket_width,
                       (end - min_id) // bucket_width + 1):
            entry = f"__bucket={b}"
            if entry in buckets:
                continue
            target = os.path.join(path, entry)
            if os.path.exists(target):
                shutil.rmtree(target)
                cleared.append(entry)
    # commit marker, atomically
    os.makedirs(os.path.dirname(marker), exist_ok=True)
    tmp = marker + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"chunk_id": chunk_id, "buckets": buckets, "cleared": cleared}, fh)
    os.replace(tmp, marker)
    shutil.rmtree(staging, ignore_errors=True)
    return "committed"


def committed_chunks(path: str) -> "set[str]":
    """Chunk ids with a durable commit marker."""
    d = os.path.join(path, "_commits")
    if not os.path.isdir(d):
        return set()
    return {
        f[len("chunk-"):-len(".json")]
        for f in os.listdir(d)
        if f.startswith("chunk-") and f.endswith(".json")
    }


def uncommitted_residue(path: str) -> "list[str]":
    """Chunk ids with staging residue but NO commit marker — the
    compensation queue a recovery pass must re-run (roll-forward)."""
    d = os.path.join(path, "_staging")
    if not os.path.isdir(d):
        return []
    done = committed_chunks(path)
    return sorted(
        e[len("chunk="):]
        for e in os.listdir(d)
        if e.startswith("chunk=") and e[len("chunk="):] not in done
    )


def read_committed(spark: SparkSession, path: str) -> DataFrame:
    """Read the live table. Underscore-prefixed dirs (_staging, _commits)
    are metadata to Spark's file index (hiddenFileFilter), so the plain
    partition-discovery read never sees uncommitted bytes."""
    return read_keyed(spark, path)


def read_committed_range(
    spark: SparkSession,
    path: str,
    id_name: str,
    start: int,
    end: int,
    bucket_width: int,
    min_id: int = 0,
) -> DataFrame:
    """Range-read the committed table with PARTITION PRUNING: the id
    BETWEEN predicate alone cannot prune ``__bucket=`` directories (Spark
    sees no relation between a data column and the partition column), so
    this derives the covering bucket range and filters BOTH — the
    partition filter prunes directories at planning time, the id filter
    pushes into the surviving row groups. A chunk read over a 100 TB
    committed table touches O(chunk) files, the same contract the
    chunker's BETWEEN scan has on an unbucketed table (SCALING.md 'Chunk
    read cost')."""
    if start < min_id:
        raise ValueError(
            f"range start {start} below min_id {min_id}: bucket math "
            f"requires non-negative offsets (the writers share this rule)"
        )
    # non-negative offsets: Python // == the writers' exact `div`
    lo_b = (start - min_id) // bucket_width
    hi_b = (end - min_id) // bucket_width
    df = spark.read.parquet(path)
    pruned = df.where(F.col("__bucket").between(lo_b, hi_b)).where(
        F.col(id_name).between(start, end)
    )
    return pruned.drop("__bucket")
