"""Property-based tests (hypothesis) for the loop machinery — a step beyond
the reference's purely example-based suite (SURVEY.md §5 notes it has no
property testing)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from dbix_batchchunker_spark import BatchChunker
from dbix_batchchunker_spark.loop_state import LoopState


@given(
    min_id=st.integers(min_value=0, max_value=10**20),
    span=st.integers(min_value=1, max_value=100_000),
    chunk_size=st.integers(min_value=1, max_value=10_000),
)
@settings(max_examples=200, deadline=None)
def test_static_ranges_partition_exactly(min_id, span, chunk_size):
    """chunk_ranges() is always an exact partition of [min_id, max_id]:
    contiguous, non-overlapping, fully covering, every width ≤ chunk_size."""
    bc = BatchChunker(
        coderef=lambda *a: None, min_id=min_id, max_id=min_id + span - 1,
        chunk_size=chunk_size, target_time=0, sleep=0,
    )
    ranges = list(bc.chunk_ranges())
    assert ranges[0][0] == min_id
    assert ranges[-1][1] == min_id + span - 1
    for (s1, e1), (s2, e2) in zip(ranges, ranges[1:]):
        assert s2 == e1 + 1
    assert all(e - s + 1 <= chunk_size for s, e in ranges)
    assert sum(e - s + 1 for s, e in ranges) == span


@given(
    ops=st.lists(st.sampled_from(["inc", "dec"]), min_size=1, max_size=50),
)
@settings(max_examples=200, deadline=None)
def test_bisection_multiplier_invariants(ops):
    """Under the real loop protocol (range += step at the TOP of every
    iteration, then the checker may widen or bisect), any outcome sequence
    keeps the bisection sane: the probed range stays non-negative, bounds
    stay ordered once both are known, and the step stays finite."""
    ls = LoopState(chunk_size=10, time_source=lambda: 0.0)
    for op in ops:
        ls.multiplier_range += ls.multiplier_step  # loop-top advance
        if op == "inc":
            ls.increase_multiplier()
        else:
            ls.decrease_multiplier()
        assert ls.multiplier_range >= 0
        if ls.last_range_min is not None and ls.last_range_max is not None:
            assert ls.last_range_min <= ls.last_range_max
        assert ls.multiplier_step == ls.multiplier_step  # not NaN
        assert abs(ls.multiplier_step) < 1e18


@given(
    span=st.integers(min_value=1, max_value=5_000),
    chunk_size=st.integers(min_value=1, max_value=500),
    budget_chunks=st.integers(min_value=1, max_value=20),
)
@settings(max_examples=100, deadline=None)
def test_interrupt_resume_never_loses_ids(span, chunk_size, budget_chunks):
    """Stop the loop after N chunks (simulating max_runtime), resume from the
    stored cursor: the union of both runs always covers every id, and only
    the single boundary id may repeat (reference resume semantics)."""
    seen: list[tuple[int, int]] = []

    class Stop(Exception):
        pass

    def work(bc, s, e):
        seen.append((s, e))
        if len(seen) == budget_chunks:
            raise Stop()

    bc = BatchChunker(
        coderef=work, min_id=1, max_id=span, chunk_size=chunk_size,
        target_time=0, sleep=0,
    )
    try:
        bc.execute()
    except Stop:
        bc.min_id = seen[-1][1]  # what max_runtime's write-back would do

    def run2(bc2):
        bc2.execute()

    bc.coderef = lambda b, s, e: seen.append((s, e))
    bc.execute()

    covered = set()
    for s, e in seen:
        covered.update(range(s, e + 1))
    assert covered == set(range(1, span + 1))
