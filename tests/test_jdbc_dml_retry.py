"""execute_dml_per_chunk under a REAL Spark task retry (round-7 verdict
"Next round #6"): the helper commits per batch, so a task that dies
mid-partition leaves earlier batches durably applied and Spark re-runs
the WHOLE partition — the documented contract is that the DML must be
idempotent for the final state to be exactly-once-equivalent. This test
kills the first attempt of one partition mid-way (after committed
batches) and asserts (a) the retry genuinely happened and (b) the final
table state equals the no-failure outcome.

Task retries need ``spark.task.maxFailures >= 2``, which in local mode is
baked into the master string (``local[2,2]``) — a per-session setting the
shared test session can't provide — so the scenario runs in a subprocess
with its own SparkSession."""

from __future__ import annotations

import os
import sqlite3
import subprocess
import sys
import textwrap


def test_dml_exactly_once_equivalent_under_task_retry(tmp_path):
    db = str(tmp_path / "dml.sqlite")
    marker = str(tmp_path / "retry-happened")
    conn = sqlite3.connect(db)
    conn.execute("CREATE TABLE t (id INTEGER PRIMARY KEY, v INTEGER)")
    conn.executemany(
        "INSERT INTO t (id, v) VALUES (?, 0)", [(i,) for i in range(40)]
    )
    conn.commit()
    conn.close()

    script = textwrap.dedent(
        f"""
        import os, sqlite3, sys
        sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
        from pyspark.sql import SparkSession
        from dbix_batchchunker_spark.sources.jdbc import execute_dml_per_chunk

        DB = {db!r}
        MARKER = {marker!r}

        spark = (
            SparkSession.builder.master("local[2,2]")  # 2 threads, 2 attempts
            .appName("dml-retry-test")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        # 2 deterministic range partitions: partition 1 holds ids 20..39
        df = spark.range(0, 40, 1, 2)

        def factory():
            return sqlite3.connect(DB, timeout=30)

        def binds(row):
            from pyspark import TaskContext

            tc = TaskContext.get()
            if tc.partitionId() == 1:
                if tc.attemptNumber() == 0 and row.id >= 30:
                    # die MID-partition, after two batch_size=5 commits
                    # (ids 20..29) are already durable
                    raise RuntimeError("injected mid-partition failure")
                if tc.attemptNumber() > 0:
                    open(MARKER, "w").close()
            return (int(row.id),)

        execute_dml_per_chunk(
            df, factory,
            # idempotent DML — the helper's documented requirement; a
            # non-idempotent "v = v + 1" would double-apply the re-run
            # rows 20..29 here
            "UPDATE t SET v = 1 WHERE id = ?",
            binds, batch_size=5,
        )
        spark.stop()
        """
    )
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=300,
        env={**os.environ, "PYTHONDONTWRITEBYTECODE": "1"},
    )
    assert proc.returncode == 0, f"subprocess failed:\n{proc.stderr[-3000:]}"
    assert os.path.exists(marker), (
        "the injected failure never triggered a task retry — the scenario "
        f"did not exercise the contract\n{proc.stderr[-2000:]}"
    )
    conn = sqlite3.connect(db)
    rows = dict(conn.execute("SELECT id, v FROM t ORDER BY id").fetchall())
    conn.close()
    # exactly-once-equivalent: every row updated exactly to the target
    # state, including the rows committed by the killed first attempt
    assert rows == {i: 1 for i in range(40)}
