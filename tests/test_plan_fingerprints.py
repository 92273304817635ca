"""Plan-shape regression net over the adjudicated query surface.

The oracle gate proves each query's VALUES; nothing so far pinned each
query's PLAN — a refactor can silently turn a broadcast join into a
sort-merge join, or double a shuffle count, while every value stays
correct. This test fingerprints the physical plan of every oracle-backed
query (operator-name counts from the formatted explain's detail headers)
at sf0.001 against a committed baseline, so a plan regression fails CI
with a one-line diff of what changed.

Regenerate after an INTENTIONAL plan change:

    python tests/test_plan_fingerprints.py   # rewrites the baseline

and review the json diff in the commit like any other artifact. Streaming
queries (st*) are excluded: their callables run actual drains. The
fingerprint counts only operator KINDS that encode cost decisions —
exchanges, join strategies, windows, generators, Python stages, scans —
not expression details, so it is stable across cosmetic edits.
"""

from __future__ import annotations

import json
import os
import re

import pytest

BASELINE = os.path.join(os.path.dirname(__file__), "plan_fingerprints.json")
SF_DIR = "/root/testdata/sf0.001"  # pinned: fingerprints are sf-sensitive

#: operator kinds worth pinning (detail-header names, matched exactly)
_OPS = (
    "Exchange",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "Window",
    "WindowGroupLimit",
    "Generate",
    "Expand",
    "MapInPandas",
    "ArrowEvalPython",
    "BatchEvalPython",
    "Scan parquet",
)


def _fingerprint(df) -> dict:
    from dbix_batchchunker_spark.plans.explain import formatted_plan

    plan = formatted_plan(df)
    fp = {}
    for op in _OPS:
        n = len(re.findall(rf"\(\d+\) {re.escape(op)}\s*\n", plan))
        if n:
            fp[op] = n
    return fp


def _targets():
    import __spark_entry__ as E

    return {
        name: fn
        for name, fn in E.queries().items()
        if name in E.oracle_sql() and not name.startswith("st")
    }


@pytest.fixture(scope="module")
def spark():
    from dbix_batchchunker_spark.session import get_spark

    return get_spark(master="local[4]", shuffle_partitions=8)


def _baseline() -> dict:
    if not os.path.exists(BASELINE):  # pre-generation bootstrap
        return {}
    with open(BASELINE) as fh:
        return json.load(fh)


def test_baseline_covers_exactly_the_oracle_surface():
    assert sorted(_baseline()) == sorted(_targets())


@pytest.mark.parametrize("name", sorted(_baseline()))
def test_plan_shape_unchanged(spark, name):
    fn = _targets().get(name)
    if fn is None:
        pytest.skip(f"{name} no longer registered (covered by coverage test)")
    got = _fingerprint(fn(spark, SF_DIR))
    want = _baseline()[name]
    assert got == want, (
        f"{name}: plan shape drifted {want} -> {got}; if intentional, "
        f"regenerate: python tests/test_plan_fingerprints.py"
    )


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from dbix_batchchunker_spark.session import get_spark

    s = get_spark(master="local[4]", shuffle_partitions=8)
    out = {}
    for name, fn in sorted(_targets().items()):
        out[name] = _fingerprint(fn(s, SF_DIR))
        print(name, out[name])
    with open(BASELINE, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(f"wrote {BASELINE} ({len(out)} fingerprints)")
