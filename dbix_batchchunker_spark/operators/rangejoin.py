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


def _require_disjoint(
    left: DataFrame, right: DataFrame, reserved: set, op: str
) -> None:
    """Shared input contract of both banding joins: the internal bucket
    names must be free (withColumn would silently overwrite a caller
    column and the trailing drop would delete caller data), and the two
    sides must not share ANY column name — after the join every shared
    name exists twice, making any bare F.col(name) (ours in the residual,
    or the caller's downstream on the returned both-schemas frame)
    ambiguous at analysis time. Fail fast with an actionable message."""
    taken = set(left.columns) | set(right.columns)
    if taken & reserved:
        names = "/".join(f"'{r}'" for r in sorted(reserved))
        raise ValueError(
            f"{op} reserves the internal column names {names}; "
            "rename them on the inputs first"
        )
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(
            f"{op} requires disjoint column names between left and right "
            f"(shared: {sorted(overlap)}); rename one side first "
            "(e.g. right.withColumnRenamed)"
        )


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
    _require_disjoint(left, right, {"__probe", "__bucket"}, "banded_range_join")
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


# --------------------------------------------------------------------------- #
# Interval-overlap join: the two-sided sibling of the banded range join.      #
# --------------------------------------------------------------------------- #
OVERLAP_BUCKET_US = 600_000_000  # 10 min


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_us: int,
) -> DataFrame:
    """All (left, right) pairs whose [start, end] intervals overlap
    (``l.start <= r.end AND r.start <= l.end``), as an equi-join on time
    buckets.

    Catalyst plans a bare two-sided inequality join as
    BroadcastNestedLoopJoin, same as the one-sided case above (DuckDB again
    ships IEJoin for it — exactly 2 inequality conditions). The banding
    re-expression generalizes: each interval explodes into EVERY bucket it
    covers (``sequence(floor(start/W), floor(end/W))`` — row expansion is
    length/W + 1, linear in total covered time, so W should be chosen near
    the typical interval length), the join is an equi-join on bucket id
    with the overlap condition as residual, and each true pair is counted
    ONCE by keeping only the bucket containing the overlap's start
    (``max(l.start, r.start)`` lies inside both intervals, so exactly one
    joined bucket satisfies it). Skew note: same as banded_range_join —
    a hot bucket is a hot equi-key; salt or let AQE split it.
    """
    _require_disjoint(left, right, {"__lbk", "__rbk"}, "interval_overlap_join")
    lb = left.withColumn(
        "__lbk",
        F.explode(
            F.sequence(
                F.floor(F.col(left_start) / bucket_us),
                F.floor(F.col(left_end) / bucket_us),
            )
        ),
    )
    rb = right.withColumn(
        "__rbk",
        F.explode(
            F.sequence(
                F.floor(F.col(right_start) / bucket_us),
                F.floor(F.col(right_end) / bucket_us),
            )
        ),
    )
    joined = (
        lb.join(rb, lb["__lbk"] == rb["__rbk"])
        .where(
            (lb[left_start] <= rb[right_end])
            & (rb[right_start] <= lb[left_end])
        )
        # count each overlapping pair exactly once: only in the bucket
        # where the overlap region starts
        .where(
            lb["__lbk"]
            == F.floor(F.greatest(lb[left_start], rb[right_start]) / bucket_us)
        )
    )
    return joined.drop("__lbk", "__rbk")


@query(
    "q33_interval_overlap_join",
    oracle="""
    WITH e AS (
        SELECT event_id, epoch_us(ts) AS s_us,
               epoch_us(ts) + CAST(round(value * 1e6) AS BIGINT) AS e_us
        FROM events
    )
    SELECT a.event_id, COUNT(*) AS n_overlaps
    FROM e a JOIN e b
      ON a.s_us <= b.e_us AND b.s_us <= a.e_us
     AND a.event_id != b.event_id
    GROUP BY a.event_id
    ORDER BY a.event_id
    """,
)
def q33_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping activity spans: each event occupies [ts, ts + value
    seconds]; count the other events whose span overlaps — the
    concurrency/contention primitive (who was active at the same time).
    As with q32, the oracle runs the literal inequality theta-join
    (DuckDB IEJoin) while Spark runs the bucketed re-expression, so the
    gate adjudicates the rewrite itself. round() on both sides pins the
    one float→int step to the same value (DuckDB CAST rounds where Spark's
    would truncate)."""
    events = t(spark, sf_dir, "events")
    s = epoch_us(events)
    # scan spread tried and REVERTED on measurement (r18 A/B: flat — the
    # bucket-join reduce dominates, not the explode map)
    e = events.select(
        "event_id",
        s.alias("s_us"),
        (s + F.round(F.col("value") * 1e6).cast("long")).alias("e_us"),
    )
    a = e.select(
        F.col("event_id").alias("a_id"),
        F.col("s_us").alias("a_s"),
        F.col("e_us").alias("a_e"),
    )
    b = e.select(
        F.col("event_id").alias("b_id"),
        F.col("s_us").alias("b_s"),
        F.col("e_us").alias("b_e"),
    )
    return (
        interval_overlap_join(a, b, "a_s", "a_e", "b_s", "b_e", OVERLAP_BUCKET_US)
        .where(F.col("a_id") != F.col("b_id"))
        .groupBy(F.col("a_id").alias("event_id"))
        .agg(F.count(F.lit(1)).alias("n_overlaps"))
        .orderBy("event_id")
    )
