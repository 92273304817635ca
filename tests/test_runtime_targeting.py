"""Runtime-targeting feedback loop — mirrors t/dbic.t:255-352 (too-fast
growth capped at 2×, 5/5 sample requirement; too-slow convergence to a
chunk_size floor of 1) with a deterministic fake clock."""

from dbix_batchchunker_spark import BatchChunker
from tests.helpers import FakeClock


def run_targeted(per_row_time, target_time, min_id=1, max_id=2000, chunk_size=10):
    clock = FakeClock()
    widths = []
    sizes = []

    def work(bc, start, end):
        widths.append(end - start + 1)
        sizes.append(bc._ls.chunk_size)
        clock.advance(per_row_time * (end - start + 1))

    bc = BatchChunker(
        coderef=work, min_id=min_id, max_id=max_id, chunk_size=chunk_size,
        target_time=target_time, sleep=0,
        time_source=clock, sleep_func=clock.sleep,
    )
    bc.execute()
    return widths, sizes


def test_too_fast_grows_chunk_size():
    # 0.001 s/row, 10-row chunks = 0.01 s ≪ 1 s target → growth after 5 samples
    widths, sizes = run_targeted(per_row_time=0.001, target_time=1.0)
    assert sizes[0] == 10
    assert max(sizes) > 10
    # no growth before 5 full timings
    assert all(s == 10 for s in sizes[:5])
    # growth never more than doubles between consecutive chunks
    for a, b in zip(sizes, sizes[1:]):
        assert b <= a * 2


def test_too_slow_converges_to_one():
    # 0.05 s/row with target 0.05 s → even 1-row chunks hit target; floor at 1
    widths, sizes = run_targeted(
        per_row_time=0.05, target_time=0.05, max_id=200, chunk_size=10
    )
    assert sizes[-1] == 1
    # shrink is halving at most (never less than half per step) until way over
    for a, b in zip(sizes, sizes[1:]):
        assert b >= 1


def test_runtime_ceiling_honored_once_converged():
    # target 0.5 s, 0.01 s/row: converged chunks should run under ~0.5 s
    clock = FakeClock()
    runtimes = []

    def work(bc, start, end):
        dt = 0.01 * (end - start + 1)
        runtimes.append(dt)
        clock.advance(dt)

    bc = BatchChunker(
        coderef=work, min_id=1, max_id=20000, chunk_size=10,
        target_time=0.5, sleep=0, time_source=clock, sleep_func=clock.sleep,
    )
    bc.execute()
    # after convergence (skip warm-up), runtimes stay below 2x target
    tail = runtimes[10:]
    assert tail and max(tail) < 1.0


def test_target_time_disabled_keeps_static_size():
    widths, sizes = run_targeted(per_row_time=0.001, target_time=0)
    assert set(sizes) == {10}
