"""Register-blocked Bloom filter as pure DataFrame ops (no UDF, no driver
round-trip).

Spark's own ``BloomFilterAggregate`` is optimizer-internal (not in the
public function registry), and ``DataFrameStatFunctions.bloomFilter``
returns a driver-side object with no column-level membership test. This
module builds the standard alternative from scratch, Spark-first:

* the filter is a **(block, bits) DataFrame** — one 64-bit register per
  non-empty block (Putze et al.'s cache-blocked layout: one hash picks the
  block, k hashes set bits inside it), built with a single
  ``groupBy(block).agg(bit_or(mask))`` over the keyed side;
* membership is **one broadcast-hash join + one bitwise AND** on the probe
  side — no explode, no extra shuffle, whole-stage-codegen throughout.

Why not just broadcast the keys and semi-join (the tx10 shape)? Broadcast
size. The bitmap is ``8 bytes × non-empty blocks`` regardless of key
length — a 10M-n-gram benchmark set at ~30 bytes/gram is a 300 MB
broadcast as keys but ~10 MB as a bitmap sized for ~4% false positives.
False positives are then removed by an exact confirm join that only
carries the fpp-bounded survivors. (For joins Spark plans itself, AQE's
``spark.sql.optimizer.runtime.bloomFilter.enabled`` injects the same
construct automatically; this module is for when the filter is part of
the operator's own dataflow.)
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: 64-bit registers in the default filter (2^13 blocks = 64 KiB of bits).
DEFAULT_BLOCKS = 1 << 13

#: Bits set per key inside its block. With load n/blocks keys per block,
#: the per-probe false-positive rate is ≈ (set_bits/64)^BLOOM_K.
BLOOM_K = 2


def _block(col: Column, blocks: int) -> Column:
    return F.pmod(F.xxhash64(col, F.lit(0)), F.lit(blocks))


def _mask(col: Column) -> Column:
    m = F.lit(0).cast("long")
    for seed in range(1, BLOOM_K + 1):
        bit = F.pmod(F.xxhash64(col, F.lit(seed)), F.lit(64)).cast("int")
        # F.shiftleft only accepts a Python-int shift; the SQL function
        # takes a column for both operands.
        m = m.bitwiseOR(F.call_function("shiftleft", F.lit(1).cast("long"), bit))
    return m


class BloomBitmap(NamedTuple):
    """A built filter: the (block, bits) DataFrame plus the block count it
    was hashed with. Probes MUST use the same modulus — carrying it with
    the bitmap makes a build/probe mismatch (silent false negatives)
    structurally impossible."""

    bitmap: DataFrame
    blocks: int


def bloom_bitmap(
    keyed: DataFrame, col: str, blocks: int = DEFAULT_BLOCKS
) -> BloomBitmap:
    """Build the (block, bits) bitmap over the values of ``keyed[col]``.

    One narrow projection + one aggregation whose output is at most
    ``blocks`` rows — the only thing ever broadcast."""
    c = F.col(col)
    return BloomBitmap(
        keyed.select(_block(c, blocks).alias("__bloom_block"), _mask(c).alias("__m"))
        .groupBy("__bloom_block")
        .agg(F.bit_or("__m").alias("__bloom_bits")),
        blocks,
    )


def bloom_prefilter(probe: DataFrame, col: str, bloom: BloomBitmap) -> DataFrame:
    """Rows of ``probe`` whose ``col`` *might* be in the set the bitmap was
    built from (guaranteed superset: no false negatives — every bit of a
    present key was OR-ed into its block by construction, and the block
    modulus travels inside ``BloomBitmap``).

    The join is broadcast by hint; the inner join doubles as the
    "block exists" test (an absent block means no key hashed there)."""
    c = F.col(col)
    probed = probe.withColumns(
        {"__bloom_block": _block(c, bloom.blocks), "__probe_mask": _mask(c)}
    )
    return (
        probed.join(F.broadcast(bloom.bitmap), "__bloom_block")
        .where(
            F.col("__bloom_bits").bitwiseAND(F.col("__probe_mask"))
            == F.col("__probe_mask")
        )
        .drop("__bloom_block", "__probe_mask", "__bloom_bits")
    )
