#!/usr/bin/env python
"""Per-job profile of registered queries (optimization guide §1).

Runs each named query once (warmed at sf0.001), with Spark event logging
into a temp dir, then parses the event log to print each job's wall time,
task time, shuffle bytes and callsite — the breakdown the Spark UI would
show, readable without the UI.  All queries share ONE session/JVM; the
event-log timeline is sliced per query by wall-clock marks.  Usage:

    python scripts/profile_query.py <query_name> [<query_name> ...]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
PROFILE_MIN_JOB_S (default 0.0 — only print jobs at least this long).
"""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load_events(evdir: str) -> list:
    events = []
    # Spark 4 event logs land as a rolling DIRECTORY (eventlog_v2_*)
    for f in glob.glob(os.path.join(evdir, "**", "*"), recursive=True):
        if os.path.isfile(f) and "appstatus" not in os.path.basename(f):
            with open(f) as fh:
                for line in fh:
                    try:
                        events.append(json.loads(line))
                    except Exception:  # noqa: BLE001
                        pass
    return events


def _report(events: list, name: str, t0_ms: float, t1_ms: float, wall: float,
            min_job_s: float) -> None:
    jobs: dict[int, dict] = {}
    stage_metrics: dict[int, dict] = {}
    for e in events:
        ev = e.get("Event")
        if ev == "SparkListenerJobStart":
            ts = e.get("Submission Time", 0)
            if not (t0_ms <= ts <= t1_ms):
                continue
            props = e.get("Properties") or {}
            desc = props.get("spark.job.description", "").replace("\n", " | ")
            jobs[e["Job ID"]] = {
                "start": ts,
                "desc": desc[:100],
                "callsite": (e.get("Stage Infos") or [{}])[-1]
                .get("Stage Name", "")
                .replace("\n", " ")[:100],
                "stages": [s["Stage ID"] for s in e.get("Stage Infos") or []],
            }
        elif ev == "SparkListenerJobEnd":
            j = jobs.get(e["Job ID"])
            if j is not None:
                j["end"] = e.get("Completion Time", j["start"])
        elif ev == "SparkListenerStageCompleted":
            si = e["Stage Info"]
            acc = {a.get("Name"): a.get("Value") for a in si.get("Accumulables", [])}

            def num(k):
                try:
                    return int(acc.get(k, 0) or 0)
                except Exception:  # noqa: BLE001
                    return 0

            stage_metrics[si["Stage ID"]] = {
                "tasks": si.get("Number of Tasks", 0),
                "sh_read": num("internal.metrics.shuffle.read.remoteBytesRead")
                + num("internal.metrics.shuffle.read.localBytesRead"),
                "sh_write": num("internal.metrics.shuffle.write.bytesWritten"),
                "run_ms": num("internal.metrics.executorRunTime"),
            }

    total_job = 0.0
    rows = []
    prev_end = None
    for jid in sorted(jobs):
        j = jobs[jid]
        if "end" not in j:
            continue
        dur = (j["end"] - j["start"]) / 1000.0
        gap = (j["start"] - prev_end) / 1000.0 if prev_end is not None else 0.0
        prev_end = j["end"]
        total_job += dur
        tasks = sum(stage_metrics.get(s, {}).get("tasks", 0) for s in j["stages"])
        shr = sum(stage_metrics.get(s, {}).get("sh_read", 0) for s in j["stages"])
        shw = sum(stage_metrics.get(s, {}).get("sh_write", 0) for s in j["stages"])
        run = sum(stage_metrics.get(s, {}).get("run_ms", 0) for s in j["stages"])
        rows.append(
            (jid, dur, gap, tasks, run, shr, shw,
             (j["callsite"] or "") + "  ||  " + (j["desc"] or "")[:40])
        )

    total_gap = sum(r[2] for r in rows)
    print(
        f"\n==== query={name} wall={wall:.3f}s jobs={len(rows)} "
        f"sum_job_wall={total_job:.3f}s sum_gaps={total_gap:.3f}s ===="
    )
    print(
        f"{'job':>4} {'wall_s':>7} {'gap_s':>7} {'tasks':>6} {'task_ms':>8} "
        f"{'shuf_r':>9} {'shuf_w':>9}  where"
    )
    for jid, dur, gap, tasks, run, shr, shw, where in rows:
        if dur < min_job_s and gap < min_job_s:
            continue
        print(
            f"{jid:>4} {dur:7.3f} {gap:7.3f} {tasks:>6} {run:>8} "
            f"{shr:>9} {shw:>9}  {where}"
        )


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_SF_DIR", "/root/testdata/sf0.001")
    min_job_s = float(os.environ.get("PROFILE_MIN_JOB_S", "0"))
    evdir = tempfile.mkdtemp(prefix="prof_evlog_")

    from dbix_batchchunker_spark.session import get_spark

    import __spark_entry__ as entry

    spark = get_spark(
        app_name="profile",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.compress": "false",
            "spark.eventLog.dir": evdir,
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    queries = entry.queries()
    spans = []
    for name in names:
        fn = queries[name]
        try:
            fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
        except Exception as exc:  # noqa: BLE001
            print(f"# warmup failed for {name}: {exc}", file=sys.stderr)
        spark.catalog.clearCache()
        t_mark = time.time() * 1000
        t0 = time.monotonic()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.monotonic() - t0
        t_end = time.time() * 1000
        spark.catalog.clearCache()
        spans.append((name, t_mark, t_end, wall))
    spark.stop()

    events = _load_events(evdir)
    for name, t0_ms, t1_ms, wall in spans:
        _report(events, name, t0_ms, t1_ms, wall, min_job_s)

    import shutil

    shutil.rmtree(evdir, ignore_errors=True)


if __name__ == "__main__":
    main()
