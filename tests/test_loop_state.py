"""LoopState bisection + timing-ring unit tests (LoopState.pm:170-245)."""

from dbix_batchchunker_spark.loop_state import LoopState, Timing


def make_ls(**kw):
    return LoopState(chunk_size=10, time_source=lambda: 0.0, **kw)


def test_increase_accelerates_without_upper_bound():
    ls = make_ls()
    ls.multiplier_range = 1.0
    ls.increase_multiplier()
    assert ls.multiplier_step == 2.0
    assert ls.last_range_min == 1.0
    ls.multiplier_range = 3.0
    ls.increase_multiplier()
    assert ls.multiplier_step == 4.0
    assert ls.last_range_min == 3.0


def test_decrease_walks_back_then_bisects():
    ls = make_ls()
    # grew to 4 (min=2 known), found too many at 4
    ls.multiplier_range = 4.0
    ls.multiplier_step = 2.0
    ls.last_range_min = 2.0
    ls.decrease_multiplier()
    assert ls.last_range_max == 4.0
    assert ls.multiplier_range == 2.0          # walk back to known min
    assert ls.multiplier_step == (4.0 - 2.0) / 2


def test_decrease_without_min_decelerates():
    ls = make_ls()
    ls.multiplier_range = 2.0
    ls.multiplier_step = 2.0
    ls.decrease_multiplier()
    assert ls.multiplier_range == 0.0
    assert ls.multiplier_step == 1.0
    assert ls.last_range_max == 2.0


def test_timing_ring_keeps_five():
    ls = make_ls()
    for i in range(8):
        ls.push_timing(Timing(runtime=i, chunk_count=1, chunk_per=1, rowtime=i))
    assert len(ls.last_timings) == 5
    assert ls.last_timings[0].runtime == 3


def test_reset_chunk_state():
    ls = make_ls()
    ls.start, ls.end = 5, 14
    ls.multiplier_range, ls.multiplier_step = 3.0, 4.0
    ls.checked_count = 7
    ls.last_range_min = 1.0
    ls.reset_chunk_state()
    assert ls.start is None
    assert ls.prev_end == 14
    assert ls.multiplier_range == 0.0
    assert ls.multiplier_step == 1.0
    assert ls.checked_count == 0
    assert ls.last_range_min is None
