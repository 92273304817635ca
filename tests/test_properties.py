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


@given(
    w=st.integers(min_value=1, max_value=9),
    h=st.integers(min_value=1, max_value=9),
    channels=st.sampled_from([1, 2, 3, 4]),
    filter_type=st.integers(min_value=0, max_value=4),
    data=st.data(),
)
@settings(max_examples=120, deadline=None)
def test_png_round_trip_property(w, h, channels, filter_type, data):
    """decode(encode(x)) == x for arbitrary pixel bytes, sizes, channel
    counts, and filter types — the PNG filter reconstruction is an exact
    inverse everywhere, not just on the fixture images."""
    from dbix_batchchunker_spark.functions.png import decode_png, encode_png

    n = w * h * channels
    pixels = bytes(
        data.draw(st.lists(st.integers(0, 255), min_size=n, max_size=n))
    )
    assert decode_png(encode_png(pixels, w, h, channels, filter_type)) == (
        w, h, channels, pixels
    )


@given(
    rate=st.sampled_from([8000, 16000, 44100]),
    channels=st.integers(min_value=1, max_value=3),
    bits=st.sampled_from([8, 16, 32]),
    data=st.data(),
)
@settings(max_examples=80, deadline=None)
def test_wav_round_trip_property(rate, channels, bits, data):
    from dbix_batchchunker_spark.functions.wav import decode_wav, encode_wav

    lo, hi = {
        8: (0, 255), 16: (-(2**15), 2**15 - 1), 32: (-(2**31), 2**31 - 1)
    }[bits]
    n_frames = data.draw(st.integers(min_value=0, max_value=16))
    samples = data.draw(
        st.lists(
            st.integers(lo, hi),
            min_size=n_frames * channels,
            max_size=n_frames * channels,
        )
    )
    assert decode_wav(encode_wav(samples, rate, channels, bits)) == (
        rate, channels, bits, samples
    )


@given(data=st.data())
@settings(max_examples=30, deadline=None)
def test_union_find_labels_match_bruteforce_components(data):
    """_union_find_labels (the dd03/dd04/sim07 closure fast path) must
    label every vertex with its true component minimum for arbitrary
    small graphs — checked against a brute-force flood fill."""
    import pandas as pd

    from dbix_batchchunker_spark.operators.dedup import _union_find_labels

    n = data.draw(st.integers(min_value=0, max_value=14))
    edges = data.draw(
        st.lists(
            st.tuples(st.integers(0, n), st.integers(0, n)), max_size=30
        )
    )
    epdf = pd.DataFrame(edges, columns=["src", "dst"]) if edges else (
        pd.DataFrame({"src": [], "dst": []})
    )
    labels = dict(_union_find_labels(epdf))
    # brute force: flood fill over the undirected graph
    adj: dict = {}
    verts = set()
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
        verts |= {a, b}
    want = {}
    seen = set()
    for v in sorted(verts):
        if v in seen:
            continue
        comp, stack = set(), [v]
        while stack:
            x = stack.pop()
            if x in comp:
                continue
            comp.add(x)
            stack.extend(adj.get(x, ()))
        m = min(comp)
        seen |= comp
        for x in comp:
            want[x] = m
    for v in verts:
        assert labels.get(v, v) == want[v], (v, labels, want)
