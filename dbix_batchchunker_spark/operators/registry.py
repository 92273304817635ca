"""Query registry: every implemented operator registers a (spark, sf_dir) →
DataFrame callable and, when SQL-expressible, a DuckDB oracle SQL string.

The driver's correctness gate runs both sides at sf0.01 and compares
row-count + schema + order-insensitive value hash, so:

* every computed column is aliased IDENTICALLY in Spark code and oracle SQL;
* money aggregates are summed as DECIMAL (per-row cast) — exact and
  order-independent, immune to Spark's nondeterministic partial-agg order;
* double outputs only where per-row deterministic (or integral-valued).
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Optional

from pyspark.sql import DataFrame, SparkSession

QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: Dict[str, str] = {}


def query(name: str, oracle: Optional[str] = None):
    """Register a query implementation and its DuckDB oracle (None for
    non-SQL-expressible operators → driver runs a rows-only check)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        fn.__query_name__ = name
        return fn

    return deco


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """THE events timestamp rule, shared by every read path (batch ``t()``
    and the streaming source): ``events.ts`` is TIMESTAMP(NANOS) parquet,
    which Spark rejects outright; with ``nanosAsLong`` set it arrives as
    int64 nanos, truncated here to microseconds — exactly what DuckDB does
    when it surfaces the column as TIMESTAMP (µs), so both engines (and
    both read paths) see identical values."""
    from pyspark.sql import functions as F

    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table (column-pruned/filter-pushed by Catalyst).
    ``events`` goes through :func:`normalize_event_ts` (nanos → µs)."""
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return normalize_event_ts(
            spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        )
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# Money columns are exact 2-decimal values stored as doubles. Casting the BASE
# column to decimal recovers the exact value identically in Spark and DuckDB;
# all arithmetic then stays in decimal (exact, order-independent). Casting a
# double PRODUCT to decimal is NOT cross-engine deterministic (Java shortest-
# repr vs full binary expansion round differently) — never do that.
# NOTE (measured, do not revive): a `widen()` helper that repartition()ed
# narrow single-file scans to defaultParallelism before CPU-heavy stages made
# the dedup family ~1.7× SLOWER in aggregate (39s → 67s at sf0.1): the fixed
# -width Exchange lands before column pruning, carries full rows, and opts
# the subtree out of AQE coalescing. Spark's own scan parallelism + AQE is
# the right default; fix narrow-input hotspots at the source (file layout /
# maxPartitionBytes), not with a blanket reshuffle.


def dec2(name: str):
    from pyspark.sql import functions as F

    return F.col(name).cast("decimal(12,2)")


def one_minus(name: str):
    """(1 - col) in exact decimal, e.g. (1 - l_discount)."""
    from pyspark.sql import functions as F

    return F.lit(1).cast("decimal(4,2)") - F.col(name).cast("decimal(4,2)")


def one_plus(name: str):
    from pyspark.sql import functions as F

    return F.lit(1).cast("decimal(4,2)") + F.col(name).cast("decimal(4,2)")
