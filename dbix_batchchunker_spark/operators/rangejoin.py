"""Banded range join — the join shape Spark genuinely lacks a primitive
for: a PURE range predicate (no equality key) between two large tables.
Catalyst plans `a JOIN b ON b.ts BETWEEN a.ts - W AND a.ts + W` as a
BroadcastNestedLoopJoin — O(n·m) comparisons and a broadcast of one whole
side — which is a non-starter at 100 TB (DuckDB ships IEJoin for exactly
this reason; SURVEY.md §2.C's posture is that we provide the missing
operator as a composition).

The banding re-expression: bucket both sides by ``floor(ts / W)``; a row
can only match rows in its own or adjacent buckets, so exploding the probe
side into its 3 candidate buckets turns the range join into an EQUI-join
on the bucket id + a residual |Δts| ≤ W filter. Each true pair is found
exactly once (the build row's bucket is unique). Cost: one 3× row
expansion + one hash shuffle on bucket id — linear in input + output, the
same technique at any scale. Skew note: a "flash crowd" minute becomes a
hot bucket; at 100 TB add a salt to the bucket key (replicating the build
side per salt) or lean on AQE skew-join splitting, exactly as for any hot
equi-key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import epoch_us, query, t

RANGE_WINDOW_US = 60_000_000  # ±60 s


def banded_range_join(
    left: DataFrame,
    right: DataFrame,
    left_us: str,
    right_us: str,
    window_us: int,
) -> DataFrame:
    """All (left, right) pairs with |left_us - right_us| <= window_us, as an
    equi-join on time buckets. Returns the joined frame with both input
    schemas (caller selects/aggregates)."""
    taken = set(left.columns) | set(right.columns)
    if taken & {"__probe", "__bucket"}:
        # withColumn would silently OVERWRITE a caller column of the same
        # name and the trailing drop would then delete the caller's data.
        raise ValueError(
            "banded_range_join reserves the internal column names "
            "'__probe'/'__bucket'; rename them on the inputs first"
        )
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        # After the join every shared name exists twice; the joined frame we
        # return (both schemas, caller selects) would make any bare
        # F.col(name) — ours in the residual filter, or the caller's
        # downstream — ambiguous at analysis time. The residual below is
        # resolved via lb[...]/rb[...] so WE would survive, but the output
        # contract wouldn't; fail fast instead of handing back a frame the
        # caller can't select from.
        raise ValueError(
            "banded_range_join requires disjoint column names between left "
            f"and right (shared: {sorted(overlap)}); rename one side first "
            "(e.g. right.withColumnRenamed)"
        )
    lb = left.withColumn(
        "__probe",
        F.explode(
            F.array(
                *[
                    (F.floor(F.col(left_us) / window_us) + d).cast("long")
                    for d in (-1, 0, 1)
                ]
            )
        ),
    )
    rb = right.withColumn(
        "__bucket", F.floor(F.col(right_us) / window_us).cast("long")
    )
    joined = lb.join(rb, lb["__probe"] == rb["__bucket"]).where(
        F.abs(lb[left_us] - rb[right_us]) <= window_us
    )
    return joined.drop("__probe", "__bucket")


@query(
    "q32_banded_range_join",
    oracle=f"""
    WITH e AS (
        SELECT event_id, epoch_us(ts) AS us FROM events
    )
    SELECT a.event_id,
           COUNT(*) AS n_neighbors
    FROM e a JOIN e b
      ON b.us BETWEEN a.us - {RANGE_WINDOW_US} AND a.us + {RANGE_WINDOW_US}
     AND a.event_id != b.event_id
    GROUP BY a.event_id
    ORDER BY a.event_id
    """,
)
def q32_banded_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events within ±60 s of each other (across all users): per-event
    neighbor count — the cross-stream coincidence/correlation primitive.
    The DuckDB oracle runs the literal range theta-join (its IEJoin handles
    gate scale); the Spark side runs the banded equi-join re-expression,
    so the correctness gate checks the REWRITE, not just the math."""
    events = t(spark, sf_dir, "events")
    e = events.select("event_id", epoch_us(events).alias("us"))
    a = e.select(F.col("event_id").alias("a_id"), F.col("us").alias("a_us"))
    b = e.select(F.col("event_id").alias("b_id"), F.col("us").alias("b_us"))
    return (
        banded_range_join(a, b, "a_us", "b_us", RANGE_WINDOW_US)
        .where(F.col("a_id") != F.col("b_id"))
        .groupBy(F.col("a_id").alias("event_id"))
        .agg(F.count(F.lit(1)).alias("n_neighbors"))
        .orderBy("event_id")
    )
