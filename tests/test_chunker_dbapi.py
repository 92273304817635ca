"""DBAPI (sqlite3) modes — mirrors t/dbh.t: Active (51-102), Query+expand
(104-150), Query single_rows (152-199), DIY+count_stmt (201-247), manual
min/max (249-281), retries (283-379), non-unique id column (381-435)."""

import math

import pytest

from dbix_batchchunker_spark import BatchChunker
from tests.helpers import TRACK_IDS, make_track_db, shared_connector

CHUNK = 3


@pytest.fixture()
def db():
    conn = make_track_db()
    yield conn
    conn.close()


def test_active_mode_updates_all_rows(db):
    bc = BatchChunker(
        dbapi_connector=shared_connector(db),
        stmt="UPDATE track SET title = 'x' WHERE trackid BETWEEN ? AND ?",
        min_stmt="SELECT MIN(trackid) FROM track",
        max_stmt="SELECT MAX(trackid) FROM track",
        chunk_size=CHUNK, target_time=0, sleep=0, min_chunk_percent=0,
    )
    assert bc.calculate_ranges()
    assert (bc.min_id, bc.max_id) == (min(TRACK_IDS), max(TRACK_IDS))
    bc.execute()
    db.commit()
    n = db.execute("SELECT COUNT(*) FROM track WHERE title = 'x'").fetchone()[0]
    assert n == len(TRACK_IDS)


def test_query_mode_passes_cursor(db):
    seen = []

    def work(bc, cur):
        seen.extend(r[0] for r in cur.fetchall())

    BatchChunker.construct_and_execute(
        dbapi_connector=shared_connector(db),
        stmt="SELECT trackid FROM track WHERE position = 1 AND trackid BETWEEN ? AND ?",
        coderef=work,
        min_stmt="SELECT MIN(trackid) FROM track",
        max_stmt="SELECT MAX(trackid) FROM track",
        chunk_size=CHUNK, target_time=0, sleep=0, min_chunk_percent=0,
    )
    expected = [r[0] for r in db.execute(
        "SELECT trackid FROM track WHERE position = 1 ORDER BY trackid")]
    assert sorted(seen) == expected


def test_query_with_extra_binds(db):
    seen = []
    BatchChunker.construct_and_execute(
        dbapi_connector=shared_connector(db),
        stmt=("SELECT trackid FROM track WHERE position = ? AND trackid BETWEEN ? AND ?", 2),
        coderef=lambda bc, cur: seen.extend(r[0] for r in cur.fetchall()),
        min_stmt="SELECT MIN(trackid) FROM track",
        max_stmt="SELECT MAX(trackid) FROM track",
        chunk_size=CHUNK, target_time=0, sleep=0, min_chunk_percent=0,
    )
    expected = [r[0] for r in db.execute(
        "SELECT trackid FROM track WHERE position = 2 ORDER BY trackid")]
    assert sorted(seen) == expected


def test_single_rows_lowercase_dict(db):
    rows = []
    BatchChunker.construct_and_execute(
        dbapi_connector=shared_connector(db),
        stmt="SELECT TrackID, Title FROM track WHERE trackid BETWEEN ? AND ?",
        coderef=lambda bc, row: rows.append(row),
        single_rows=True,
        min_stmt="SELECT MIN(trackid) FROM track",
        max_stmt="SELECT MAX(trackid) FROM track",
        chunk_size=CHUNK, target_time=0, sleep=0, min_chunk_percent=0,
    )
    assert len(rows) == len(TRACK_IDS)
    assert all(set(r) == {"trackid", "title"} for r in rows)  # lowercased keys


def test_diy_with_count_stmt_skips_gaps(db):
    calls = []
    bc = BatchChunker(
        dbapi_connector=shared_connector(db),
        coderef=lambda bc, s, e: calls.append((s, e)),
        count_stmt="SELECT COUNT(*) FROM track WHERE trackid BETWEEN ? AND ?",
        min_stmt="SELECT MIN(trackid) FROM track",
        max_stmt="SELECT MAX(trackid) FROM track",
        chunk_size=CHUNK, target_time=0, sleep=0,
    )
    bc.calculate_ranges()
    bc.execute()
    ids = set(TRACK_IDS)
    # every processed chunk contains at least one real id (gaps were skipped
    # or absorbed), and all ids are covered
    for s, e in calls:
        assert any(i in ids for i in range(s, e + 1))
    covered = set()
    for s, e in calls:
        covered.update(i for i in range(s, e + 1) if i in ids)
    assert covered == ids
    # the pure-gap block 26..39 must never be its own processed chunk
    assert not any(s >= 26 and e <= 39 for s, e in calls)


def test_chunk_expansion_on_sparse_range(db):
    """'expanded at least once': with min_chunk_percent, a sparse range grows
    past chunk_size (t/dbh.t:149 max_range > CHUNK_SIZE)."""
    processed = []
    bc = BatchChunker(
        dbapi_connector=shared_connector(db),
        coderef=lambda bc, s, e: processed.append((s, e, bc._ls.chunk_count)),
        count_stmt="SELECT COUNT(*) FROM track WHERE trackid BETWEEN ? AND ?",
        min_stmt="SELECT MIN(trackid) FROM track",
        max_stmt="SELECT MAX(trackid) FROM track",
        chunk_size=5, target_time=0, sleep=0, min_chunk_percent=0.5,
    )
    bc.calculate_ranges()
    bc.execute()
    max_range = max(e - s + 1 for s, e, _ in processed)
    assert max_range > 5
    # never process more than (1+mcp)*chunk_size rows unless at a single ID
    # or at max_id (t/dbic.t:213-220)
    for s, e, cnt in processed:
        assert cnt is not None
        assert cnt <= math.ceil(5 * 1.5) or (e - s <= 0) or e >= bc.max_id


def test_manual_min_max(db):
    calls = []
    bc = BatchChunker(
        dbapi_connector=shared_connector(db),
        stmt="UPDATE track SET title='y' WHERE trackid BETWEEN ? AND ?",
        min_stmt="SELECT MIN(trackid) FROM track",   # present but overridden
        max_stmt="SELECT MAX(trackid) FROM track",
        min_id=50, max_id=60,
        chunk_size=100, target_time=0, sleep=0, min_chunk_percent=0,
    )
    bc.execute()
    db.commit()
    n = db.execute("SELECT COUNT(*) FROM track WHERE title='y'").fetchone()[0]
    assert n == 11  # only ids 50-60


def test_retry_single_rows_replays_whole_chunk(db):
    """2 failures then success ⇒ chunk replayed 3×, rows seen 3× for that
    chunk (t/dbic.t:438-458 analog)."""
    failures = {"n": 0}
    rows_seen = []

    def work(bc, row):
        rows_seen.append(row["trackid"])
        if row["trackid"] == 7 and failures["n"] < 2:
            failures["n"] += 1
            raise RuntimeError("transient")

    bc = BatchChunker(
        dbapi_connector=shared_connector(db),
        stmt="SELECT trackid FROM track WHERE trackid BETWEEN ? AND ?",
        coderef=work, single_rows=True,
        min_stmt="SELECT MIN(trackid) FROM track",
        max_stmt="SELECT MAX(trackid) FROM track",
        chunk_size=10, target_time=0, sleep=0, min_chunk_percent=0,
        retry_opts={"max_attempts": 10},
    )
    bc.calculate_ranges()
    bc.execute()
    assert failures["n"] == 2
    # id 7 was attempted 3 times (two failed chunk replays + one success)
    assert rows_seen.count(7) == 3
    # ids outside the failing chunk seen exactly once
    assert rows_seen.count(55) == 1


def test_retry_exhausted_raises(db):
    def work(bc, cur):
        raise RuntimeError("permanent")

    bc = BatchChunker(
        dbapi_connector=shared_connector(db),
        stmt="SELECT trackid FROM track WHERE trackid BETWEEN ? AND ?",
        coderef=work,
        min_stmt="SELECT MIN(trackid) FROM track",
        max_stmt="SELECT MAX(trackid) FROM track",
        chunk_size=10, target_time=0, sleep=0, min_chunk_percent=0,
        retry_opts={"max_attempts": 3},
    )
    bc.calculate_ranges()
    with pytest.raises(RuntimeError, match="permanent"):
        bc.execute()


def test_nonunique_id_single_id_forced(db):
    """Chunking on track.cd (many rows per id, t/dbh.t:381-435): resizing
    bottoms out at a single ID, which must still be processed (with warning
    when rows > 1)."""
    processed = []
    bc = BatchChunker(
        dbapi_connector=shared_connector(db),
        coderef=lambda bc, s, e: processed.append((s, e, bc._ls.chunk_count)),
        count_stmt="SELECT COUNT(*) FROM track WHERE cd BETWEEN ? AND ?",
        min_stmt="SELECT MIN(cd) FROM track",
        max_stmt="SELECT MAX(cd) FROM track",
        chunk_size=2, target_time=0, sleep=0, min_chunk_percent=0.25,
    )
    bc.calculate_ranges()
    bc.execute()
    # coverage: every cd value fell in exactly one processed range
    cds = [r[0] for r in db.execute("SELECT DISTINCT cd FROM track")]
    for cd in cds:
        assert sum(1 for s, e, _ in processed if s <= cd <= e) == 1


def test_slow_count_probe_shrinks_chunk(db):
    """COUNT slower than 1.05x target_time forces a shrink + warning
    (BatchChunker.pm:1523-1543; t/dbic.t:354-419's slow-COUNT path)."""
    from tests.helpers import FakeClock

    clock = FakeClock()
    conn = db

    class SlowCursorConn:
        """Wraps sqlite conn; every COUNT advances the fake clock past the
        probe budget once, then becomes fast."""

        def __init__(self):
            self.slow_remaining = 1

        def cursor(self):
            real = conn.cursor()
            wrapper = self

            class Cur:
                def execute(self, sql, binds=()):
                    if "COUNT" in sql and wrapper.slow_remaining > 0:
                        wrapper.slow_remaining -= 1
                        clock.advance(2.0)  # ≫ 1.05 × target_time
                    return real.execute(sql, binds)

                def fetchone(self):
                    return real.fetchone()

                def __getattr__(self, name):
                    return getattr(real, name)

            return Cur()

        def __getattr__(self, name):
            return getattr(conn, name)

    slow_conn = SlowCursorConn()
    calls = []
    from dbix_batchchunker_spark import BatchChunker

    bc = BatchChunker(
        dbapi_connector=lambda: slow_conn,
        coderef=lambda bc, s, e: calls.append((s, e)),
        count_stmt="SELECT COUNT(*) FROM track WHERE trackid BETWEEN ? AND ?",
        min_stmt="SELECT MIN(trackid) FROM track",
        max_stmt="SELECT MAX(trackid) FROM track",
        chunk_size=20, target_time=0.5, sleep=0, min_chunk_percent=0.25,
        time_source=clock, sleep_func=clock.sleep,
    )
    bc.calculate_ranges()
    bc.execute()
    assert any("COUNT statement was too slow" in m for m in bc.messages)
    assert any("shrunk" in m for m in bc.messages)
    assert calls  # loop still completed
