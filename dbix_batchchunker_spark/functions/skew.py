"""Skew mitigation: salted joins (SURVEY.md §2.C "salting for skew").

AQE's skew-join splitting handles most cases at runtime
(`spark.sql.adaptive.skewJoin.enabled`, on by default in session.py); the
explicit salt is for the pathological case AQE can't fix — a single hot key
on BOTH a large fact AND a large-ish dimension, where one task would receive
the whole hot key's partition. Salting fans the hot key across
``salt_buckets`` tasks by replicating the smaller side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join fact⋈dim on ``key`` with the fact side salted and the dim
    side replicated ``salt_buckets``× — every fact row of a hot key lands in
    a different task. Use only when the dim side is small enough to
    replicate but too big (or too skewed) to broadcast outright."""
    salted_fact = fact.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    exploded_dim = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = salted_fact.join(exploded_dim, [key, "__salt"], how)
    return out.drop("__salt")
