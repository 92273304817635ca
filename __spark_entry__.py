"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 with its DuckDB oracle for the per-round correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

# Make the sibling package importable regardless of the caller's cwd.
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

# Importing the operator modules populates the registry. Imports are
# UNCONDITIONAL on purpose: a swallowed ImportError here would silently
# drop an entire query family from the correctness gate.
from dbix_batchchunker_spark.operators import registry
from dbix_batchchunker_spark.operators import (  # noqa: F401
    advanced,
    chunked,
    dedup,
    multimodal,
    relational,
    similarity,
    stream,
    text,
    # sampling/rangejoin are deliberately LAST (not alphabetical): import
    # order is registry order, and the driver gate adjudicates a 50-slot
    # prefix of queries() — new oracle-gated families must append after the
    # 50 long-standing gated queries, never displace them. Their binding
    # adjudication is the local replica (tests/test_queries_oracle.py).
    sampling,
    rangejoin,
)

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the chunked-delete query (the reference's core use case)
    driven by the adaptive BatchChunker loop at sf0.001."""
    return registry.QUERIES["q20_chunked_delete_survivors"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """All registered queries, ORACLE-GATED ENTRIES FIRST.

    The driver's correctness gate adjudicates a prefix of this dict (50
    entries in round 2), so ordering is load-bearing: every query with a
    DuckDB oracle must precede the rows-only demos, or oracle-gated queries
    silently receive no CORRECTNESS row (round-2 failure mode: tx06-tx11).
    Within each group, registration (import) order is preserved.
    """
    gated = {n: fn for n, fn in registry.QUERIES.items() if n in registry.ORACLES}
    rows_only = {
        n: fn for n, fn in registry.QUERIES.items() if n not in registry.ORACLES
    }
    return {**gated, **rows_only}


def oracle_sql() -> dict[str, str]:
    return dict(registry.ORACLES)
