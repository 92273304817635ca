"""Table maintenance: sized writes produce files near the target, and
Z-order clustering measurably prunes parquet row groups on EVERY
clustered dimension (the claim a single-column sort cannot make).
Pruning is measured from actual parquet footer min/max stats via
pyarrow — the same stats a scan's row-group filter consults."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

import pytest


@pytest.fixture(scope="module")
def spark():
    from dbix_batchchunker_spark.session import get_spark

    return get_spark(master="local[4]", shuffle_partitions=8)


def _overlapping_row_groups(path: str, col: str, lo: int, hi: int):
    """(#row groups whose [min,max] for col overlaps [lo, hi], total)."""
    import pyarrow.parquet as pq

    overlap = total = 0
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(names[col]).statistics
            total += 1
            if st is None or (st.min <= hi and st.max >= lo):
                overlap += 1
    return overlap, total


def test_zorder_prunes_both_dimensions(spark):
    """x-sorted layout prunes x-predicates but reads ~everything for a
    y-predicate; the z-ordered layout prunes BOTH to a small fraction."""
    from pyspark.sql import functions as F

    from dbix_batchchunker_spark.sources.maintenance import zorder_by

    n, files = 100_000, 16
    df = (
        spark.range(n)
        .select(
            (F.col("id") % 1000).alias("x"),
            # multiplicative hash decorrelates y from x and from row order
            ((F.col("id") * 7919) % 1000).alias("y"),
        )
    )
    base = tempfile.mkdtemp(prefix="zorder_")
    try:
        linear, zpath = os.path.join(base, "linear"), os.path.join(base, "z")
        (
            df.repartitionByRange(files, "x")
            .sortWithinPartitions("x")
            .write.parquet(linear)
        )
        zorder_by(df, ["x", "y"], n_partitions=files).write.parquet(zpath)

        lo, hi = 100, 119  # a 2%-selectivity box on either dimension
        lx, ltot = _overlapping_row_groups(linear, "x", lo, hi)
        ly, _ = _overlapping_row_groups(linear, "y", lo, hi)
        zx, ztot = _overlapping_row_groups(zpath, "x", lo, hi)
        zy, _ = _overlapping_row_groups(zpath, "y", lo, hi)

        assert ltot >= files and ztot >= files
        assert lx <= ltot // 4          # linear sort prunes its own key...
        assert ly == ltot               # ...and reads EVERYTHING for y
        # z-order prunes BOTH dims well below half the row groups
        assert zx <= ztot // 2, (zx, ztot)
        assert zy <= ztot // 2, (zy, ztot)
        # and rows are only re-laid-out, never lost
        assert spark.read.parquet(zpath).count() == n
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_zvalue_interleave_known_answer():
    """Morton interleave against hand-computed values: buckets (b0, b1)
    with spans that make bucket == value, via the Spark dialect on a
    literal frame (engine-executed, not reimplemented in the test)."""
    from dbix_batchchunker_spark.sources.maintenance import zvalue_sql

    # bits=2, dims x,y in [0,4): z = y1 x1 y0 x0 (x owns even bits)
    expr = zvalue_sql(["x", "y"], ["0", "0"], ["3", "3"], bits=2,
                      dialect="duckdb")
    import duckdb

    got = duckdb.sql(
        f"SELECT x, y, {expr} AS z FROM (SELECT unnest(range(4)) x, "
        f"unnest(range(4)) y)"
    ).fetchall()
    # diagonal points (i, i): interleave of i with itself
    expected = {0: 0, 1: 3, 2: 12, 3: 15}
    for x, y, z in got:
        assert z == expected[x]


def test_write_sized_parquet_hits_target(spark):
    from dbix_batchchunker_spark.sources.maintenance import (
        compact_parquet,
        write_sized_parquet,
    )

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    base = tempfile.mkdtemp(prefix="sized_")
    try:
        out = os.path.join(base, "sized")
        target_mb = 0.03  # ~30 KiB: forces multiple files from 500 docs
        decision = write_sized_parquet(docs, out, target_mb=target_mb)
        files = glob.glob(os.path.join(out, "*.parquet"))
        assert decision["n_files"] > 1
        assert len(files) >= decision["n_files"]
        sizes = [os.path.getsize(f) for f in files]
        target = target_mb * 1024 * 1024
        # sizing is an estimate from a sampled bytes/row: order-of-
        # magnitude bounds, not byte equality
        assert all(s < 4 * target for s in sizes)
        assert sum(sizes) > target  # it did split, not pad
        assert spark.read.parquet(out).count() == docs.count()

        # compaction pass: same rows, file count re-derived from target
        out2 = os.path.join(base, "compacted")
        compact_parquet(spark, out, out2, target_mb=1.0)
        assert spark.read.parquet(out2).count() == docs.count()
        assert len(glob.glob(os.path.join(out2, "*.parquet"))) == 1
    finally:
        shutil.rmtree(base, ignore_errors=True)
