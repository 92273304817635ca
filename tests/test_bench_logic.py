"""bench.py decision logic (no Spark): the automated single-query burst
re-measure (round-15 verdict #4). SCALING.md's live instance — tx40 read
12.88 s once in an otherwise-quiet r15 artifact and 6.25 s on immediate
solo re-run — reproduced synthetically against the decision function, so
the discipline that used to be operator memory is pinned as code."""

from __future__ import annotations

import importlib.util
import os
import sys


def _bench():
    here = os.path.join(os.path.dirname(__file__), "..", "bench.py")
    spec = importlib.util.spec_from_file_location("bench_under_test", here)
    mod = importlib.util.module_from_spec(spec)
    # bench.py imports only stdlib at module level; queries load in main()
    sys.modules["bench_under_test"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_burst_suspects_tx40_scenario():
    """The r15 live case: one query's window caught a co-tenant burst the
    suite-bracketing sentinels missed (quiet artifact, 12.88 s vs a
    6.25 s prior-class number). Exactly that query is flagged."""
    b = _bench()
    prior = {"tx40": 6.09, "tx38": 7.73, "q01": 1.20}
    timings = {"tx40": 12.88, "tx38": 7.90, "q01": 1.25}
    assert b._burst_suspects(timings, prior, contended=False) == ["tx40"]


def test_burst_suspects_thresholds_and_gates():
    b = _bench()
    prior = {"fast": 0.20, "slow": 6.0, "zero": 0.0}
    # BOTH legs required: >1.5x AND >0.3s absolute (a fast query's 2x
    # blip under 0.3 s is noise; a slow query's +0.4 s under 1.5x is the
    # ±10% band)
    assert b._burst_suspects({"fast": 0.35}, prior, False) == []  # <0.3s
    assert b._burst_suspects({"fast": 0.55}, prior, False) == ["fast"]
    assert b._burst_suspects({"slow": 8.0}, prior, False) == []  # <1.5x
    assert b._burst_suspects({"slow": 9.5}, prior, False) == ["slow"]
    # zero/absent priors never flag (new queries have no burst baseline)
    assert b._burst_suspects({"zero": 9.0, "new": 9.0}, prior, False) == []
    # a CONTENDED artifact skips re-measures entirely — the whole run is
    # already stamped unreliable; re-running under the same load would
    # only launder noise into the published record
    assert b._burst_suspects({"slow": 20.0}, prior, True) == []
    # deterministic ordering for the artifact
    got = b._burst_suspects({"slow": 20.0, "fast": 2.0}, prior, False)
    assert got == ["fast", "slow"]
