"""Streaming analogs: availableNow incremental processing with checkpointed
cursor (= the reference's resume / process_past_max semantics), watermarked
windows, and session windows."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="session")
def spark():
    from dbix_batchchunker_spark.session import get_spark

    return get_spark(master="local[4]", shuffle_partitions=8)


def test_incremental_cursor_resume(spark, tmp_path):
    """First drain processes all rows; after new data lands, a second drain
    with the SAME checkpoint processes only the new rows — the streaming
    re-expression of cursor resume (BatchChunker.pm:1228) and
    process_past_max (BatchChunker.pm:1394-1460)."""
    from dbix_batchchunker_spark.streaming.incremental import (
        process_available,
        stream_table,
    )

    data_dir = str(tmp_path / "data")
    ckpt = str(tmp_path / "ckpt")
    spark.range(0, 100).withColumn("v", F.col("id") * 2).write.parquet(data_dir)

    seen_batches: list[int] = []

    def handle(batch_df, batch_id):
        seen_batches.append(batch_df.count())

    schema = spark.read.parquet(data_dir).schema
    process_available(stream_table(spark, data_dir, schema), handle, ckpt)
    assert sum(seen_batches) == 100

    # table grows (the "past max" case) → only the delta is processed
    spark.range(100, 130).withColumn("v", F.col("id") * 2).write.mode(
        "append"
    ).parquet(data_dir)
    before = sum(seen_batches)
    process_available(stream_table(spark, data_dir, schema), handle, ckpt)
    assert sum(seen_batches) - before == 30

    # nothing new → drain processes nothing
    before = sum(seen_batches)
    process_available(stream_table(spark, data_dir, schema), handle, ckpt)
    assert sum(seen_batches) == before


def test_windowed_counts_batch_equivalence(spark):
    """The windowed aggregation gives identical results on batch input as a
    plain group-by on the truncated hour (sanity for q11's streaming twin)."""
    from dbix_batchchunker_spark.operators.registry import t
    from dbix_batchchunker_spark.streaming.incremental import windowed_counts

    ev = t(spark, "/root/testdata/sf0.001", "events")
    out = windowed_counts(ev).collect()
    expected = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("h"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    got = {(r["window"]["start"], r["event_type"]): r["n_events"] for r in out}
    want = {(r["h"], r["event_type"]): r["n"] for r in expected}
    assert got == want


def test_windowed_counts_streaming_with_watermark(spark, tmp_path):
    """Same aggregation through an actual stream with watermark + complete
    output into a memory sink."""
    from dbix_batchchunker_spark.streaming.incremental import (
        stream_table,
        windowed_counts,
    )

    data_dir = str(tmp_path / "events")
    src = spark.createDataFrame(
        [(i, f"2024-01-01 0{i % 3}:15:00", i % 2, "click", 1.0, "{}") for i in range(30)],
        "event_id long, ts_s string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
    src.write.parquet(data_dir)

    stream = stream_table(spark, data_dir)
    agg = windowed_counts(stream, window="1 hour", watermark="2 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM win_counts").collect()
    assert sum(r.n_events for r in rows) == 30
    assert len(rows) == 3  # three distinct hours


def test_sessionize_gap_windows(spark):
    from dbix_batchchunker_spark.streaming.incremental import sessionized

    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00"),
            (1, "2024-01-01 10:10:00"),   # same session (gap < 30m)
            (1, "2024-01-01 11:30:00"),   # new session
            (2, "2024-01-01 10:05:00"),
        ],
        "user_id long, ts_s string",
    ).withColumn("ts", F.col("ts_s").cast("timestamp")).withColumn("value", F.lit(1.0))
    out = sessionized(ev, gap="30 minutes").collect()
    per_user = {}
    for r in out:
        per_user.setdefault(r.user_id, []).append(r.n_events)
    assert sorted(per_user[1]) == [1, 2]
    assert per_user[2] == [1]


def test_stateful_running_totals_across_drains(spark, tmp_path):
    """applyInPandasWithState totals accumulate across micro-batches AND
    across separate availableNow drains (state restored from checkpoint) —
    the streaming analog of resumable chunk bookkeeping."""
    from dbix_batchchunker_spark.streaming.incremental import (
        running_user_totals,
        stream_table,
    )

    data_dir = str(tmp_path / "ev")
    ckpt = str(tmp_path / "ck")
    mk = lambda lo, hi: spark.range(lo, hi).selectExpr(
        "id AS event_id", "id % 3 AS user_id", "CAST(1.5 AS DOUBLE) AS value"
    )
    mk(0, 30).write.parquet(data_dir)
    schema = spark.read.parquet(data_dir).schema

    latest = {}

    def sink(batch_df, batch_id):
        for r in batch_df.collect():
            latest[r.user_id] = (r.n_events, r.total_value)

    def drain():
        q = (
            running_user_totals(stream_table(spark, data_dir, schema))
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    assert sum(v[0] for v in latest.values()) == 30

    mk(30, 60).write.mode("append").parquet(data_dir)
    drain()
    assert sum(v[0] for v in latest.values()) == 60  # state accumulated
    assert all(abs(v[1] - v[0] * 1.5) < 1e-9 for v in latest.values())


def test_stateful_exact_totals_across_drains(spark, tmp_path):
    """The EXACT-cents stateful sibling (running_user_totals_exact — st02's
    oracle-track operator) must also restore its int64 state from the
    checkpoint across drains, and its totals are EXACT equalities, no
    tolerance: 1.5 → FLOOR(150) cents per event."""
    from dbix_batchchunker_spark.streaming.incremental import (
        running_user_totals_exact,
        stream_table,
    )

    data_dir = str(tmp_path / "ev")
    ckpt = str(tmp_path / "ck")
    mk = lambda lo, hi: spark.range(lo, hi).selectExpr(
        "id AS event_id", "id % 3 AS user_id", "CAST(1.5 AS DOUBLE) AS value"
    )
    mk(0, 30).write.parquet(data_dir)
    schema = spark.read.parquet(data_dir).schema

    latest = {}

    def sink(batch_df, batch_id):
        for r in batch_df.collect():
            latest[r.user_id] = (r.n_events, r.total_value_cents)

    def drain():
        q = (
            running_user_totals_exact(stream_table(spark, data_dir, schema))
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    assert sum(v[0] for v in latest.values()) == 30

    mk(30, 60).write.mode("append").parquet(data_dir)
    drain()
    assert sum(v[0] for v in latest.values()) == 60  # state accumulated
    assert all(v[1] == v[0] * 150 for v in latest.values())  # exact cents


def test_st01_demo_stream_matches_batch_rollup(spark):
    """The timestamp-shaped drain (hourly_rollup_streamed — the demo/library
    surface) must equal the batch windowed aggregation over the same events
    input — same Catalyst window operator, so any divergence means the
    drain lost or duplicated state."""
    from dbix_batchchunker_spark.operators.registry import t
    from dbix_batchchunker_spark.operators.stream import hourly_rollup_streamed
    from dbix_batchchunker_spark.streaming.incremental import windowed_counts

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    streamed = hourly_rollup_streamed(spark, sf_dir).collect()
    batch = (
        windowed_counts(t(spark, sf_dir, "events"), ts_col="ts", window="1 hour")
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            F.round("total_value", 6).alias("total_value"),
        )
        .orderBy("window_start", "event_type")
        .collect()
    )
    assert streamed == batch
    assert len(streamed) > 0


def test_st01_registered_exact_rollup_matches_batch(spark):
    """The REGISTERED st01 (exact integer domains — the oracle-track shape)
    must equal the batch windowed_exact_rollup projected the same way:
    integer cents are associative, so streaming accumulation order cannot
    perturb the sums at all."""
    from dbix_batchchunker_spark.operators.registry import t
    from dbix_batchchunker_spark.operators.stream import st01_stream_hourly_rollup
    from dbix_batchchunker_spark.streaming.incremental import windowed_exact_rollup

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    streamed = st01_stream_hourly_rollup(spark, sf_dir).collect()
    batch = (
        windowed_exact_rollup(
            t(spark, sf_dir, "events"), ts_col="ts", window="1 hour"
        )
        .select(
            F.expr(
                "CAST(unix_micros(window.start) div 3600000000 AS BIGINT)"
            ).alias("window_hour"),
            "event_type",
            F.col("n_events").cast("long").alias("n_events"),
            "total_value_cents",
        )
        .orderBy("window_hour", "event_type")
        .collect()
    )
    assert streamed == batch
    assert len(streamed) > 0


def test_st02_demo_stream_matches_batch_totals(spark):
    """The double-summing stateful drain (user_totals_streamed — the demo/
    library surface) must equal the batch per-user aggregate: counts
    exactly, value sums to float tolerance (the state accumulates per
    micro-batch, so float association order differs from the batch
    partial-agg tree)."""
    from dbix_batchchunker_spark.operators.registry import t
    from dbix_batchchunker_spark.operators.stream import user_totals_streamed

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    streamed = {
        r.user_id: (r.n_events, r.total_value)
        for r in user_totals_streamed(spark, sf_dir).collect()
    }
    batch = {
        r.user_id: (r.n, r.tv)
        for r in t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("tv"))
        .collect()
    }
    assert set(streamed) == set(batch) and len(streamed) > 0
    for u, (n, tv) in batch.items():
        assert streamed[u][0] == n, u
        assert abs(streamed[u][1] - tv) < 1e-6 * max(1.0, abs(tv)), u


def test_st02_registered_exact_totals_match_batch(spark):
    """The REGISTERED st02 (int64 cents carried through
    applyInPandasWithState state) must equal the batch aggregate EXACTLY —
    no tolerance: integer accumulation is order-independent, which is the
    whole point of the exact sibling."""
    from dbix_batchchunker_spark.operators.registry import t
    from dbix_batchchunker_spark.operators.stream import st02_stream_user_totals

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    streamed = [tuple(r) for r in st02_stream_user_totals(spark, sf_dir).collect()]
    batch = [
        tuple(r)
        for r in t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias(
                "total_value_cents"
            ),
        )
        .orderBy("user_id")
        .collect()
    ]
    assert streamed == batch and len(streamed) > 0


def test_st03_stream_dedup_equals_batch_distinct(spark):
    """Doubling the stream and draining through dropDuplicates must yield
    each event exactly once — equal to the batch per-event_id distinct."""
    from dbix_batchchunker_spark.operators.registry import t
    from dbix_batchchunker_spark.operators.stream import st03_stream_dedup

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    streamed = st03_stream_dedup(spark, sf_dir).collect()
    ids = [r.event_id for r in streamed]
    assert len(ids) == len(set(ids))  # exactly once
    batch = (
        t(spark, sf_dir, "events")
        .select("event_id", "user_id", "event_type")
        .distinct()
        .orderBy("event_id")
        .collect()
    )
    assert streamed == batch


def test_sqlite_upsert_sink_foreachbatch(spark, tmp_path):
    """The deployment-grade sink shape for update-mode stateful streams:
    foreachBatch upserting into a keyed store. Drain the running-totals
    operator into sqlite via streaming/sinks.py and check (a) the table
    holds exactly the batch aggregate — re-emissions collapsed by the
    primary key — and (b) replaying a batch is idempotent."""
    import sqlite3

    from dbix_batchchunker_spark.operators.registry import (
        normalize_event_ts,
        t,
    )
    from dbix_batchchunker_spark.streaming.incremental import (
        running_user_totals,
        stream_table,
    )
    from dbix_batchchunker_spark.streaming.sinks import sqlite_upsert_sink

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    path = os.path.join(sf_dir, "events.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(path).schema
    stream = normalize_event_ts(
        stream_table(spark, os.path.join(sf_dir, "events.*"), schema=schema)
    )

    db = str(tmp_path / "totals.db")
    sink = sqlite_upsert_sink(
        db, "user_totals", ["user_id"], ["n_events", "total_value"]
    )
    q = (
        running_user_totals(stream)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    conn = sqlite3.connect(db)
    stored = {
        u: (n, tv)
        for u, n, tv in conn.execute(
            "SELECT user_id, n_events, total_value FROM user_totals"
        )
    }
    conn.close()

    batch = {
        r.user_id: (r.n, r.tv)
        for r in t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("tv"))
        .collect()
    }
    assert set(stored) == set(batch) and len(stored) > 0
    for u, (n, tv) in batch.items():
        assert stored[u][0] == n, u
        assert abs(stored[u][1] - tv) < 1e-6 * max(1.0, abs(tv)), u

    # idempotent replay: re-applying the final totals frame changes nothing
    final_df = spark.createDataFrame(
        [(u, n, tv) for u, (n, tv) in stored.items()],
        "user_id long, n_events long, total_value double",
    )
    sink(final_df, 999)
    conn = sqlite3.connect(db)
    (count,) = conn.execute("SELECT COUNT(*) FROM user_totals").fetchone()
    conn.close()
    assert count == len(stored)


def test_sqlite_upsert_sink_rejects_unsafe_identifiers():
    from dbix_batchchunker_spark.streaming.sinks import sqlite_upsert_sink

    with pytest.raises(ValueError, match="unsafe SQL identifier"):
        sqlite_upsert_sink("x.db", "users; DROP", ["id"], ["v"])


def test_sqlite_upsert_sink_keywords_and_presence_shape(spark, tmp_path):
    """Identifier handling (round-7 review): SQL-keyword names are legal
    identifiers and must be quoted, not break the generated SQL; empty
    value_cols is the presence-sink (seen-keys) shape and degrades the
    conflict action to DO NOTHING."""
    import sqlite3

    from dbix_batchchunker_spark.streaming.sinks import sqlite_upsert_sink

    db = str(tmp_path / "kw.db")
    sink = sqlite_upsert_sink(db, "order", ["group"], ["select"])
    df = spark.createDataFrame([(1, 10), (2, 20)], "group long, select long")
    sink(df, 0)
    sink(spark.createDataFrame([(1, 99)], "group long, select long"), 1)
    conn = sqlite3.connect(db)
    rows = dict(conn.execute('SELECT "group", "select" FROM "order"'))
    conn.close()
    assert rows == {1: 99, 2: 20}  # upserted, keywords quoted throughout

    seen = sqlite_upsert_sink(db, "seen_keys", ["event_id"], [])
    ev = spark.createDataFrame([(7,), (8,)], "event_id long")
    seen(ev, 0)
    seen(ev, 1)  # replay: DO NOTHING keeps exactly-once presence
    conn = sqlite3.connect(db)
    (n,) = conn.execute("SELECT COUNT(*) FROM seen_keys").fetchone()
    conn.close()
    assert n == 2

    with pytest.raises(ValueError, match="at least one column"):
        sqlite_upsert_sink(db, "t", [], ["v"])


def test_st04_stream_sessions_equals_batch_session_window(spark):
    """The drained streaming session-window result must equal the BATCH
    session_window aggregation over the same events — merging-window
    state vs a single sort-based pass, same Catalyst semantics."""
    from dbix_batchchunker_spark.operators.registry import normalize_event_ts, t
    from dbix_batchchunker_spark.operators.stream import stream_sessions_drain
    from dbix_batchchunker_spark.streaming.incremental import sessionized

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    streamed = stream_sessions_drain(spark, sf)
    batch = (
        sessionized(t(spark, sf, "events"), gap="30 minutes")
        .select(
            "user_id",
            F.col("session.start").alias("session_window_start"),
            "n_events",
            "session_start",
            "session_end",
        )
        .orderBy("user_id", "session_window_start")
    )
    srows = [tuple(r) for r in streamed.collect()]
    brows = [tuple(r) for r in batch.collect()]
    assert srows == brows
    assert len(srows) > 0


def test_st05_stream_enrich_equals_batch_join(spark):
    """The drained stream-static join must equal the batch broadcast join
    + aggregate over the same input."""
    from dbix_batchchunker_spark.operators.registry import t
    from dbix_batchchunker_spark.operators.stream import stream_enrich_drain

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    streamed = stream_enrich_drain(spark, sf)
    customers = spark.read.parquet(os.path.join(sf, "customer.parquet"))
    n_cust = customers.count()
    batch = (
        t(spark, sf, "events")
        .withColumn("c_custkey", F.pmod(F.col("user_id"), F.lit(n_cust)))
        .join(customers.select("c_custkey", "c_nationkey"), "c_custkey")
        .groupBy("c_nationkey", "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy("c_nationkey", "event_type")
    )
    assert [tuple(r) for r in streamed.collect()] == [
        tuple(r) for r in batch.collect()
    ]
    # every event must be enriched — an off-by-one key mapping would
    # silently drop a residue class in the inner join
    n_events = t(spark, sf, "events").count()
    assert sum(r.n_events for r in streamed.collect()) == n_events


def test_st06_stream_stream_join_equals_batch_interval_join(spark):
    """The drained stream-stream interval join must equal the batch
    interval join over the same events — buffered two-sided state vs a
    single join pass, same semantics."""
    from dbix_batchchunker_spark.operators.registry import t
    from dbix_batchchunker_spark.operators.stream import stream_stream_join_drain

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    streamed = stream_stream_join_drain(spark, sf)
    ev = t(spark, sf, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("c_id"),
        F.col("ts").alias("c_ts"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("p_id"),
        F.col("ts").alias("p_ts"),
    )
    batch = (
        clicks.join(
            purchases,
            (F.col("c_user") == F.col("p_user"))
            & (F.col("p_ts") >= F.col("c_ts"))
            & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
        )
        .select(F.col("c_user").alias("user_id"), "c_id", "p_id")
        .orderBy("user_id", "c_id", "p_id")
    )
    srows = [tuple(r) for r in streamed.collect()]
    brows = [tuple(r) for r in batch.collect()]
    assert srows == brows
    assert srows, "fixture must produce attribution pairs"


def test_drop_duplicates_within_watermark_bounded_state(spark, tmp_path):
    """st03's docstring prescribes dropDuplicatesWithinWatermark as the
    deployment shape (bounded dedup state). Pin its semantics: duplicates
    arriving within the watermark delay collapse to one emission."""
    import shutil
    import tempfile

    src = str(tmp_path / "src")
    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00"),
            (1, "2024-01-01 10:05:00"),   # dup within delay → dropped
            (2, "2024-01-01 10:10:00"),
            (2, "2024-01-01 10:11:00"),   # dup within delay → dropped
            (3, "2024-01-01 12:00:00"),
        ],
        "event_id long, ts_s string",
    ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
    ev.write.parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .parquet(src)
        .withWatermark("ts", "30 minutes")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    sink = "ddww_sink"
    ckpt = tempfile.mkdtemp(prefix="ddww_ckpt_")
    try:
        q = (
            stream.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        rows = sorted(r.event_id for r in spark.table(sink).collect())
        assert rows == [1, 2, 3]
    finally:
        spark.catalog.dropTempView(sink)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_tws_type_breakdown_matches_batch(spark, tmp_path):
    """transformWithStateInPandas breakdown equals the batch groupBy
    equivalent. Skipped where google.protobuf is absent (the streaming
    Python runner's state-server protocol needs it and Spark doesn't
    bundle it) — the gate is part of the operator's contract."""
    import pytest

    from dbix_batchchunker_spark.streaming.incremental import (
        running_type_breakdown,
        stream_table,
        tws_available,
    )

    if not tws_available():
        pytest.skip("google.protobuf unavailable: transformWithState "
                    "runner cannot initialize in this environment")

    data_dir = str(tmp_path / "ev")
    ckpt = str(tmp_path / "ck")
    spark.range(0, 100).selectExpr(
        "id AS event_id",
        "id % 5 AS user_id",
        "CASE WHEN id % 2 = 0 THEN 'click' ELSE 'view' END AS event_type",
        "CAST(id AS DOUBLE) / 10 AS value",
    ).write.parquet(data_dir)
    schema = spark.read.parquet(data_dir).schema

    latest = {}

    def sink(batch_df, _bid):
        for r in batch_df.collect():
            latest[(r.user_id, r.event_type)] = r

    saved = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        q = (
            running_type_breakdown(stream_table(spark, data_dir, schema))
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if saved is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", saved
            )

    batch = spark.read.parquet(data_dir)
    expect_counts = {
        (r.user_id, r.event_type): r.cnt
        for r in batch.groupBy("user_id", "event_type").count()
        .withColumnRenamed("count", "cnt").collect()
    }
    expect_totals = {
        r.user_id: r.total
        for r in batch.groupBy("user_id")
        .agg(F.sum("value").alias("total"))
        .collect()
    }
    assert set(latest) == set(expect_counts)
    for (u, et), r in latest.items():
        assert r.n_type_events == expect_counts[(u, et)]
        assert abs(r.user_total_value - expect_totals[u]) < 1e-9


def _pack_drain(spark, tmp_path, batchrows):
    """Shared scaffold for the incremental-pack tests: one availableNow
    drain of the corpusfeed through incremental_pack_assign."""
    from dbix_batchchunker_spark.operators.text import _tokens_spark
    from dbix_batchchunker_spark.sources.pydatasource import register_feed
    from dbix_batchchunker_spark.streaming.incremental import (
        incremental_pack_assign,
    )

    register_feed(spark)
    out = str(tmp_path / "spans")
    state = str(tmp_path / "state.json")
    ck = str(tmp_path / "ck")

    def drain():
        feed = (
            spark.readStream.format("corpusfeed")
            .option("batchrows", batchrows)
            .load()
            .select("doc_id", F.size(_tokens_spark("text")).alias("n_tokens"))
        )
        incremental_pack_assign(feed, out, state, ck, budget=256)

    return drain, out, state, ck


def test_incremental_pack_assign_matches_batch_layout(spark, tmp_path):
    """Incremental sequence packing over the corpusfeed stream: two
    separate drains (50 docs each) must produce EXACTLY the span layout
    the batch two-phase prefix sum assigns to the same 100 docs — early
    packs never move when later data arrives, and the second drain
    resumes the token stream where the first stopped."""
    from dbix_batchchunker_spark.functions.prefix import with_global_cumsum
    from dbix_batchchunker_spark.operators.text import _tokens_spark
    from dbix_batchchunker_spark.sources.pydatasource import register

    register(spark)
    drain, out, _state, _ck = _pack_drain(spark, tmp_path, batchrows=50)
    drain()
    drain()
    got = {
        r.doc_id: (r.start_tok, r.end_tok, r.first_pack, r.last_pack)
        for r in spark.read.parquet(out).collect()
    }
    batch = (
        spark.read.format("corpusgen")
        .option("rows", 100)
        .option("partitions", 4)
        .load()
        .select("doc_id", F.size(_tokens_spark("text")).alias("n_tokens"))
    )
    spans = with_global_cumsum(batch, "doc_id", "n_tokens", out_col="cum")
    expect = {
        r.doc_id: (
            r.cum - r.n_tokens,
            r.cum,
            (r.cum - r.n_tokens) // 256,
            (r.cum - 1) // 256,
        )
        for r in spans.collect()
    }
    assert got == expect


def test_incremental_pack_assign_replay_is_idempotent(spark, tmp_path):
    """Crash-recovery contract: if the streaming checkpoint is lost but
    the span state survives, the re-delivered batch takes the REPLAY path
    — it reuses its originally recorded start offset and overwrites its
    own output dir, so spans are byte-identical and the high-water offset
    does not double-advance."""
    import json
    import shutil

    drain, out, state, ck = _pack_drain(spark, tmp_path, batchrows=40)
    drain()
    first = sorted(
        (r.doc_id, r.start_tok, r.end_tok, r.first_pack, r.last_pack)
        for r in spark.read.parquet(out).collect()
    )
    with open(state) as fh:
        st1 = json.load(fh)

    # lose the checkpoint, keep the state → the feed restarts from offset
    # {"pos": 0} and re-delivers batch 0
    shutil.rmtree(ck)
    drain()
    replayed = sorted(
        (r.doc_id, r.start_tok, r.end_tok, r.first_pack, r.last_pack)
        for r in spark.read.parquet(out).collect()
    )
    with open(state) as fh:
        st2 = json.load(fh)
    assert replayed == first  # overwrote itself, same layout
    assert st2 == st1  # offset did NOT double-advance


def test_sized_parquet_sink_sizes_and_replay(spark, tmp_path):
    """The sized streaming sink (1) splits each batch into ~target-sized
    files rather than one-file-per-shuffle-partition, and (2) is replay-
    idempotent: re-draining the same feed from a FRESH checkpoint (the
    engine re-delivers the same batches with the same ids) overwrites
    each batch's own dir, leaving the table byte-identical — no
    duplicate rows, no file-count creep."""
    import glob
    import os

    from dbix_batchchunker_spark.sources.pydatasource import register_feed
    from dbix_batchchunker_spark.streaming.sinks import sized_parquet_sink

    register_feed(spark)
    out = str(tmp_path / "table")

    def drain(ck_name: str) -> None:
        feed = (
            spark.readStream.format("corpusfeed")
            .option("batchrows", 60)
            .load()
            .select("doc_id", "text")
        )
        sized_parquet_sink(
            feed, out, str(tmp_path / ck_name), target_mb=0.002
        )

    drain("ck1")
    files1 = sorted(glob.glob(os.path.join(out, "batch=*", "*.parquet")))
    rows1 = sorted(
        (r.doc_id, r.text) for r in spark.read.parquet(out).collect()
    )
    assert len(files1) > 1  # 60 docs vs a 2 KiB target: must split
    assert len(rows1) == 60 and len({d for d, _ in rows1}) == 60

    drain("ck2")  # lost-checkpoint replay of the same batches
    files2 = sorted(glob.glob(os.path.join(out, "batch=*", "*.parquet")))
    rows2 = sorted(
        (r.doc_id, r.text) for r in spark.read.parquet(out).collect()
    )
    assert [os.path.basename(os.path.dirname(f)) for f in files2] == [
        os.path.basename(os.path.dirname(f)) for f in files1
    ]
    assert len(files2) == len(files1)
    assert rows2 == rows1


def test_incremental_pack_state_is_batch_bounded_not_row_bounded(spark, tmp_path):
    """The state carried across drains (round-8 verdict "Next round #6")
    must be O(batches) — the (batch_id -> [start,end]) cursor map plus the
    engine's per-batch offset/commit markers — never O(rows seen). Proof:
    3 drains at 10 rows/batch and 3 drains at 200 rows/batch must leave
    (a) the SAME number of state entries (one per batch, two ints each),
    (b) state files within bytes of each other despite 20x the rows, and
    (c) one bounded offset+commit marker pair per batch in the checkpoint."""
    import json
    import os

    sizes = {}
    for label, rows in (("small", 10), ("large", 200)):
        sub = tmp_path / label
        sub.mkdir()
        drain, _out, state, ck = _pack_drain(spark, sub, batchrows=rows)
        for _ in range(3):
            drain()
        with open(state) as fh:
            st = json.load(fh)
        n_batches = len(st["batches"])
        assert n_batches == 3, st
        # each entry is exactly the two-int cursor — nothing row-shaped
        for b in st["batches"].values():
            assert set(b) == {"start", "end"}
        sizes[label] = os.path.getsize(state)
        # engine checkpoint: one offset + one commit marker per batch,
        # each a bounded few-hundred-byte JSON file
        offsets = [f for f in os.listdir(os.path.join(ck, "offsets"))
                   if not f.startswith(".")]
        commits = [f for f in os.listdir(os.path.join(ck, "commits"))
                   if not f.startswith(".")]
        assert len(offsets) == n_batches and len(commits) == n_batches
        for d in ("offsets", "commits"):
            for f in os.listdir(os.path.join(ck, d)):
                assert os.path.getsize(os.path.join(ck, d, f)) < 4096
    # 20x the rows may not move the carried state by more than int-width
    # digit drift
    assert abs(sizes["large"] - sizes["small"]) < 64, sizes


def test_pre_batch_store_dirs_exclude_own_and_later_batches(tmp_path):
    """Replay safety (round-13 advisor, medium): a replayed batch must
    read exactly the PRE-batch gram store — its own b{bid} dir (present
    when the crash fell between the store write and the checkpoint
    commit) and any later dirs are excluded, as are non-batch artifacts."""
    from dbix_batchchunker_spark.operators.stream import (
        _pre_batch_store_dirs,
    )

    store = tmp_path / "grams"
    store.mkdir()
    for d in ("seed", "b0", "b1", "b2", "b10", "_tmp", "bx"):
        (store / d).mkdir()
    got = _pre_batch_store_dirs(str(store), 2)
    names = sorted(os.path.basename(p) for p in got)
    assert names == ["b0", "b1", "seed"], names
    # bid=0 (first batch, replayed after its own store write): seed only
    assert [os.path.basename(p)
            for p in _pre_batch_store_dirs(str(store), 0)] == ["seed"]


def test_corpusfeed_rejects_nonterminating_plant_options(spark):
    """plantmod=1 (or a negative span) would hang resolve()'s source walk
    (round-13 advisor) — the reader must refuse at construction."""
    import pytest as _pytest

    from dbix_batchchunker_spark.sources.pydatasource import (
        _FeedStreamReader,
    )

    with _pytest.raises(ValueError, match="plantmod"):
        _FeedStreamReader({"plantmod": "1"})
    with _pytest.raises(ValueError, match="plantspan"):
        _FeedStreamReader({"plantmod": "5", "plantspan": "-1"})
    # the documented geometries still construct
    _FeedStreamReader({"plantmod": "0"})
    _FeedStreamReader({"plantmod": "5", "plantspan": "100"})


def test_vecfeed_rows_deterministic_and_options_guarded():
    """vecfeed (st14's planted vector source): rows are a pure function
    of vec_id — read() and readBetweenOffsets agree over the same span,
    re-reads are byte-identical (LIST, not generator: the simple-reader
    cache copies the iterator), the one-hot sits at vec_id % classes in
    a dims-long array, and out-of-range classes refuse at construction."""
    import pytest as _pytest

    from dbix_batchchunker_spark.sources.pydatasource import (
        _VecFeedStreamReader,
    )

    r = _VecFeedStreamReader(
        {"batchrows": "6", "dims": "8", "classes": "4"}
    )
    rows, off = r.read({"pos": 0})
    assert off == {"pos": 6}
    assert list(rows) == list(r.readBetweenOffsets({"pos": 0}, {"pos": 6}))
    for i, (vid, label, emb) in enumerate(rows):
        assert vid == i and label == i % 4 and len(emb) == 8
        assert emb[label] == 1.0 and sum(emb) == 1.0
    # same-residue rows are exact duplicates — the device's premise
    assert rows[0][2] == rows[4][2]
    # classes defaults to dims; out-of-range refuses
    assert _VecFeedStreamReader({"dims": "8"}).classes == 8
    with _pytest.raises(ValueError, match="classes"):
        _VecFeedStreamReader({"dims": "4", "classes": "5"})
    with _pytest.raises(ValueError, match="dims"):
        _VecFeedStreamReader({"dims": "0"})


def test_fold_outputs_bounds_files_over_50_batches(spark, tmp_path):
    """Verdict #3 done-criterion: a 50-batch ingest with a fold every 10
    batches keeps the output's parquet file count BOUNDED (one compacted
    dir + at most one fold-interval of batch dirs), while the unfolded
    layout grows linearly — and the folded table equals the union of all
    batches exactly."""
    from dbix_batchchunker_spark.operators.stream import (
        fold_outputs,
        read_outputs,
    )

    out = str(tmp_path / "docs")
    os.makedirs(out)
    expect = []
    for bid in range(50):
        rows = [(bid * 10 + k, bid) for k in range(10)]
        expect += rows
        spark.createDataFrame(rows, "doc_id long, batch long").coalesce(
            2
        ).write.mode("overwrite").parquet(os.path.join(out, f"b{bid}"))
        if (bid + 1) % 10 == 0:
            fold_outputs(spark, out, upto=bid + 1, target_mb=128.0)
    got = sorted(
        (r.doc_id, r.batch) for r in read_outputs(spark, out).collect()
    )  # bounded: 500 synthetic rows
    assert got == sorted(expect)
    n_files = sum(
        1
        for root, _d, files in os.walk(out)
        for f in files
        if f.endswith(".parquet")
    )
    # one sized fold (≤ a few files) + 10 un-folded batch dirs × 2 files
    assert n_files <= 25, n_files
    # exactly one committed fold dir survives the sweeps
    folds = [d for d in os.listdir(out) if d.startswith("compacted_v")]
    assert folds == ["compacted_v50"], folds


def test_fold_outputs_idempotent_and_crash_repairable(spark, tmp_path):
    """Re-running a committed fold only sweeps; a fold whose sweep
    crashed (folded b dirs still on disk) never double-counts, because
    read_outputs ignores batch dirs below the committed mark."""
    from dbix_batchchunker_spark.operators.stream import (
        fold_outputs,
        read_outputs,
    )

    out = str(tmp_path / "docs")
    os.makedirs(out)
    for bid in range(4):
        spark.createDataFrame(
            [(bid, bid)], "doc_id long, batch long"
        ).write.mode("overwrite").parquet(os.path.join(out, f"b{bid}"))
    fold_outputs(spark, out, upto=2)
    # crashed sweep: resurrect a folded batch dir alongside the fold
    spark.createDataFrame([(0, 0)], "doc_id long, batch long").write.mode(
        "overwrite"
    ).parquet(os.path.join(out, "b0"))
    got = sorted(r.doc_id for r in read_outputs(spark, out).collect())
    assert got == [0, 1, 2, 3]  # b0 ignored: below the committed mark
    # re-run = repair: sweeps the leftover, result unchanged
    fold_outputs(spark, out, upto=2)
    assert not os.path.exists(os.path.join(out, "b0"))
    got = sorted(r.doc_id for r in read_outputs(spark, out).collect())
    assert got == [0, 1, 2, 3]
    # replaying an OLD mark after a newer fold is a no-op
    fold_outputs(spark, out, upto=4)
    fold_outputs(spark, out, upto=2)
    got = sorted(r.doc_id for r in read_outputs(spark, out).collect())
    assert got == [0, 1, 2, 3]


def test_fold_outputs_through_filesystem_api_uri(spark, tmp_path):
    """Round-14 verdict #1 done-criterion: the whole fold → crash →
    re-run → read cycle driven through an EXPLICIT file:// URI — the
    os.listdir/shutil implementation raised FileNotFoundError on any
    scheme-qualified path, which is what every hdfs:///s3a:// output is.
    Every maintenance decision (committed-fold discovery, batch-dir
    listing, sweep) must resolve through the path's own Hadoop
    FileSystem."""
    from dbix_batchchunker_spark.operators.stream import (
        fold_outputs,
        read_outputs,
    )

    local = tmp_path / "docs"
    out = f"file://{local}"
    for bid in range(4):
        spark.createDataFrame(
            [(bid, bid)], "doc_id long, batch long"
        ).write.mode("overwrite").parquet(f"{out}/b{bid}")
    fold_outputs(spark, out, upto=2)
    assert (local / "compacted_v2" / "_SUCCESS").exists()
    assert not (local / "b0").exists()  # swept through the FS API
    # crash mid-sweep: a folded batch dir resurfaces next to the fold
    spark.createDataFrame([(0, 0)], "doc_id long, batch long").write.mode(
        "overwrite"
    ).parquet(f"{out}/b0")
    got = sorted(
        r.doc_id for r in read_outputs(spark, out).collect()
    )  # bounded: 4 synthetic rows
    assert got == [0, 1, 2, 3]  # leftover ignored by version arithmetic
    # re-run = repair, then fold the rest and read the final table
    fold_outputs(spark, out, upto=2)
    assert not (local / "b0").exists()
    fold_outputs(spark, out, upto=4)
    assert sorted(
        d.name for d in local.iterdir()
    ) == ["compacted_v4"]  # everything folded, old fold + b dirs swept
    got = sorted(
        r.doc_id for r in read_outputs(spark, out).collect()
    )  # bounded: 4 synthetic rows
    assert got == [0, 1, 2, 3]
