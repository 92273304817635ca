#!/usr/bin/env python
"""Dump ``.explain("formatted")`` for registered queries to plans/<tag>/.

Usage: python scripts/explain_query.py <tag> <query_name> [<query_name> ...]
Writes plans/<tag>/<query>_<suffix>.txt (suffix via PLAN_SUFFIX, default
"before"). Queries whose substance is a multi-job lifecycle (store
save/append/compact) have no single plan; for those this captures the plan
of the RETURNED frame, which is still what the driver's noop sink times.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    suffix = os.environ.get("PLAN_SUFFIX", "before")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        tag,
    )
    os.makedirs(outdir, exist_ok=True)

    from dbix_batchchunker_spark.session import get_spark

    import __spark_entry__ as entry

    spark = get_spark(
        app_name="explain",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry.queries()
    for name in names:
        df = queries[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)")
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
