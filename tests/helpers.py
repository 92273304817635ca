"""Shared test helpers: fake clock + gappy sqlite fixture.

The defining property of the fixture (mirroring the reference's test data,
t/lib/CDTest.pm:226-338) is GAPPY monotone integer keys — chunk resizing is
only exercised by sparse keys.
"""

from __future__ import annotations

import sqlite3


class FakeClock:
    """Deterministic, manually-advanced time source for loop tests."""

    def __init__(self) -> None:
        self.t = 0.0

    def __call__(self) -> float:
        return self.t

    def advance(self, dt: float) -> None:
        self.t += dt

    def sleep(self, dt: float) -> None:
        self.t += dt


# Deliberately gappy id domain: dense run, hole, sparse run, big hole, dense.
TRACK_IDS = (
    list(range(1, 11))        # 1-10 dense
    + list(range(20, 26))     # 20-25 after a gap
    + [40]                    # lone id
    + list(range(50, 61))     # 50-60 dense
)


def make_track_db() -> sqlite3.Connection:
    """In-memory sqlite with a gappy `track` table.

    Columns: trackid (gappy PK), cd (non-unique, many tracks per cd —
    exercises the single-ID/too-many-rows paths), position (1..3 cycling).
    """
    conn = sqlite3.connect(":memory:")
    conn.execute(
        "CREATE TABLE track (trackid INTEGER PRIMARY KEY, cd INTEGER NOT NULL, "
        "position INTEGER NOT NULL, title TEXT NOT NULL)"
    )
    for i, tid in enumerate(TRACK_IDS):
        conn.execute(
            "INSERT INTO track VALUES (?, ?, ?, ?)",
            (tid, tid // 5 + 1, i % 3 + 1, f"Track {tid}"),
        )
    conn.commit()
    return conn


def shared_connector(conn: sqlite3.Connection):
    """Factory that keeps handing back the same connection (in-memory DBs
    evaporate on reconnect)."""
    return lambda: conn
