"""Structured Streaming analogs of the chunk loop (SURVEY.md §2.A mapping):

* **Incremental keyed processing** — `readStream` + `Trigger.AvailableNow`
  + checkpoint is the streaming re-expression of the reference's cursor
  resume and `process_past_max` (BatchChunker.pm:1394-1460, 1228): each
  micro-batch is a chunk (`maxFilesPerTrigger` ≈ chunk_size), the
  checkpoint is the persisted `min_id` watermark, and re-running after new
  data arrives processes ONLY the new rows — exactly the reference's
  "re-check max id and continue" behavior, with exactly-once bookkeeping
  handled by the engine instead of driver code.
* **Watermarked windowed aggregation** and **session windows** for late
  event data.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_table(
    spark: SparkSession,
    path: str,
    schema=None,
    max_files_per_trigger: Optional[int] = None,
) -> DataFrame:
    """File-source stream over a parquet path; schema borrowed from a batch
    read when not supplied (streaming reads require an explicit schema)."""
    if schema is None:
        schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def process_available(
    stream_df: DataFrame,
    batch_fn: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
) -> None:
    """Drain everything the checkpoint hasn't seen, then stop
    (Trigger.AvailableNow). ``batch_fn(batch_df, batch_id)`` is the chunk
    coderef; the checkpoint is the durable cursor — calling this again after
    new files land processes only the new files."""
    q = (
        stream_df.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def as_event_time(df: DataFrame, ts_col: str) -> DataFrame:
    """Make ``ts_col`` a watermark-capable TIMESTAMP regardless of the
    parquet physical form. The testdata generator has shipped events.ts as
    both TIMESTAMP(NANOS) (→ TIMESTAMP after registry.normalize_event_ts)
    and TIMESTAMP(MICROS, isAdjustedToUTC=false) (→ TIMESTAMP_NTZ, which
    Spark's event-time machinery rejects: EVENT_TIME_IS_NOT_ON_TIMESTAMP_
    TYPE). NTZ wall-clock converts to the instant it would denote IN UTC —
    pure NTZ date arithmetic, so the result is identical under any session
    timezone (a bare CAST would shift by the session offset and move
    fractional-offset window boundaries)."""
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        # One shared NTZ→epoch rule for the whole engine: epoch_us
        # (operators/registry.py) is the session-tz-proof conversion every
        # batch consumer uses; wrapping it in timestamp_micros yields the
        # as-if-UTC instant. Keeping a second copy of the timestampdiff
        # expression here is how the two sides drift next time the testdata
        # changes physical form.
        from ..operators.registry import epoch_us

        df = df.withColumn(ts_col, F.timestamp_micros(epoch_us(df, ts_col)))
    return df


def windowed_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    group_cols: tuple = ("event_type",),
) -> DataFrame:
    """Tumbling-window counts with a lateness watermark; works on both batch
    and streaming DataFrames (same Catalyst operator)."""
    df = as_event_time(events, ts_col)
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return df.groupBy(F.window(F.col(ts_col), window), *group_cols).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("total_value"),
    )


def windowed_exact_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    group_cols: tuple = ("event_type",),
) -> DataFrame:
    """Tumbling-window rollup in EXACT integer domains: counts plus the
    value sum carried as ``FLOOR(value*100)`` cents (BIGINT). Integer
    addition is associative, so the micro-batch accumulation order cannot
    perturb the result the way ``windowed_counts``'s double sum can —
    which is what puts the VALUE path of the windowed state operator on
    the DuckDB oracle track (st01), not just its counts (st09). FLOOR on
    both engines (not CAST: DuckDB rounds doubles to BIGINT where Spark
    truncates); batch and streaming share the plan."""
    df = as_event_time(events, ts_col)
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return df.groupBy(F.window(F.col(ts_col), window), *group_cols).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.floor(F.col("value") * 100).cast("long")).alias(
            "total_value_cents"
        ),
    )


def sessionized(
    events: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    key_col: str = "user_id",
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based session windows per key (F.session_window) — the custom
    stateful-operator case the reference has no analog for; batch and
    streaming share the plan."""
    df = as_event_time(events, ts_col)
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return df.groupBy(
        F.session_window(F.col(ts_col), gap).alias("session"), F.col(key_col)
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
    )


def running_user_totals(
    stream_df: DataFrame,
    key_col: str = "user_id",
) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): running
    per-key event counts and value sums that persist across micro-batches —
    and, via the checkpoint, across separate drains. This is the
    SURVEY.md §2.C "custom stateful operator" pattern: arbitrary Python
    state per key, Arrow-batched, with engine-managed exactly-once state.
    """
    import pandas as pd  # noqa: F401 (executor-side)
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update_totals(key, pdf_iter, state):
        import pandas as pd

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return stream_df.groupBy(key_col).applyInPandasWithState(
        update_totals,
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_user_totals_exact(
    stream_df: DataFrame,
    key_col: str = "user_id",
) -> DataFrame:
    """:func:`running_user_totals` with the value sum in an EXACT integer
    domain: ``value_cents = FLOOR(value*100)`` is computed Spark-side (one
    shared cross-engine arithmetic rule — see windowed_exact_rollup), and
    the Python state accumulates int64 cents, so the per-key totals are
    independent of micro-batch arrival order. This is what lets the
    custom-stateful VALUE path sit on the DuckDB oracle track (st02) —
    st10 adjudicates only the count half of the double-summing sibling."""
    import pandas as pd  # noqa: F401 (executor-side)
    from pyspark.sql.streaming.state import GroupStateTimeout

    prepared = stream_df.withColumn(
        "value_cents", F.floor(F.col("value") * 100).cast("long")
    )

    def update_totals(key, pdf_iter, state):
        import pandas as pd

        n, cents = state.get if state.exists else (0, 0)
        for pdf in pdf_iter:
            n += len(pdf)
            cents += int(pdf["value_cents"].sum())
        state.update((n, cents))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value_cents": [cents],
            }
        )

    return prepared.groupBy(key_col).applyInPandasWithState(
        update_totals,
        outputStructType="user_id long, n_events long, total_value_cents long",
        stateStructType="n long, cents long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def tws_available() -> bool:
    """True when ``transformWithStateInPandas`` can actually run: the
    Python side of the state-server protocol needs ``google.protobuf``,
    which Spark does not bundle. Gate, don't crash — the query fails at
    RUNTIME (streaming Python runner init) if protobuf is missing, not at
    plan time."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def running_type_breakdown(stream_df: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Spark 4-native arbitrary stateful operator (transformWithState):
    per-user running totals in a typed ValueState plus a per-event-type
    MapState — the successor API to ``running_user_totals``'s
    applyInPandasWithState, with composable typed state variables, TTL
    support, and timers. Requires the RocksDB state-store provider (set by
    the caller) and ``google.protobuf`` on the Python side
    (:func:`tws_available`); the container this repo is developed in lacks
    protobuf, so the end-to-end drain is exercised only where available
    (tests/test_streaming.py skips with the reason otherwise) — the
    operator itself is plain public PySpark API.

    Emits one row per (user, event_type) touched in the micro-batch with
    the type's running count and the user's running value total; the
    bounded-drain batch equivalent is a groupBy(user, type) count joined
    to groupBy(user) value sums.
    """
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class TypeBreakdown(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.totals = handle.getValueState("totals", "n long, total double")
            self.by_type = handle.getMapState(
                "by_type", "event_type string", "cnt long"
            )

        def handleInputRows(self, key, rows, timer_values):
            n, total = self.totals.get() if self.totals.exists() else (0, 0.0)
            touched: set = set()
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
                for et, c in pdf.groupby("event_type").size().items():
                    prev = (
                        self.by_type.getValue((et,))[0]
                        if self.by_type.containsKey((et,))
                        else 0
                    )
                    self.by_type.updateValue((et,), (prev + int(c),))
                    touched.add(et)
            self.totals.update((n, total))
            yield pd.DataFrame(
                [
                    {
                        "user_id": key[0],
                        "event_type": et,
                        "n_type_events": self.by_type.getValue((et,))[0],
                        "user_total_value": total,
                    }
                    for et in sorted(touched)
                ]
            )

        def close(self) -> None:
            pass

    return stream_df.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=TypeBreakdown(),
        outputStructType=(
            "user_id long, event_type string, "
            "n_type_events long, user_total_value double"
        ),
        outputMode="Update",
        timeMode="None",
    )


def incremental_pack_assign(
    stream_df: DataFrame,
    out_dir: str,
    state_path: str,
    checkpoint_dir: str,
    budget: int = 2048,
    batch_partitions: int | None = None,
) -> None:
    """INCREMENTAL sequence packing — the streaming form of sp04: each new
    corpus drop appends its documents to the global token stream exactly
    where the previous drain stopped, so pack layout is stable under
    incremental ingest (early packs never change when new data arrives —
    a trainer can consume them while the corpus still grows).

    foreachBatch computes the batch-local spans with the same two-phase
    prefix sum as sp04, shifted by the persisted stream offset. Replay
    safety (a batch re-delivered after a crash) comes from keying BOTH the
    output path and the recorded start offset by batch_id: a replayed
    batch overwrites its own parquet dir using its original offset, and
    the high-water offset never double-advances. The JSON state file is
    the demo-sized cursor store (entries bounded by #batches); a
    deployment puts the (batch_id, start_offset) map in a transactional
    table exactly like the chunker's resume cursor.

    ``batch_partitions``: a caller that knows the micro-batch geometry
    (e.g. the feed's batchrows option) passes the partition count the
    batch should compute at; the counts projection is then coalesced and
    localCheckpoint'ed ONCE so every downstream job of the batch — the
    range-boundary sample, the prefix-sum materialization, the span write
    — reads the checkpointed rows instead of re-planning the source (a
    Python Data Source feed otherwise re-runs a worker scan per action,
    and a SimpleDataSourceStreamReader hands even a tiny batch over at
    cluster default parallelism — near-empty tasks each paying the fixed
    Python-eval cost). None keeps the incoming partitioning untouched.
    """
    import json
    import os

    # the ONE copy of the pack arithmetic (review contract), shifted by
    # the persisted stream offset
    from ..operators.gram_store import _free_local_checkpoint
    from ..operators.sampling import token_pack_spans

    def sink(batch_df, batch_id: int) -> None:
        bid = str(batch_id)
        state = {"batches": {}}
        if os.path.exists(state_path):
            with open(state_path) as fh:
                state = json.load(fh)
        batches = state["batches"]
        if bid in batches:
            start = batches[bid]["start"]  # replay: reuse original offset
        else:
            start = max(
                (b["end"] for b in batches.values()), default=0
            )
        counts = batch_df.select("doc_id", "n_tokens")
        ckpt = None
        if batch_partitions is not None:
            # ONE source scan per micro-batch (optimization guide §4):
            # bounded by the batch's (doc_id, n_tokens) projection — two
            # numeric columns; freed after the span write lands.
            ckpt = counts.coalesce(max(1, batch_partitions)).localCheckpoint(
                eager=True
            )
            counts = ckpt
        spans = token_pack_spans(
            counts,
            budget=budget,
            start_offset=start,
            num_partitions=batch_partitions,
        )
        try:
            # idempotent: the batch's own directory, overwritten on replay
            spans.write.mode("overwrite").parquet(
                os.path.join(out_dir, f"batch={bid}")
            )
            # batch token total came back with the prefix-sum offsets pass
            # — no extra job
            total = int(spans.cumsum_total)
        finally:
            spans.cumsum_cache.unpersist()
            if ckpt is not None:
                _free_local_checkpoint(ckpt)
        batches[bid] = {"start": start, "end": start + total}
        tmp = state_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"batches": batches}, fh)
        os.replace(tmp, state_path)

    q = (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
