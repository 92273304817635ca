"""Session-timezone-proofness of the timestamp-bearing gated queries.

The driver's gate session sets its OWN timezone (registry.epoch_us exists
because an NTZ→TIMESTAMP cast measured +5 h under America/New_York), so
every timestamp-touching oracle must hash-match DuckDB under a non-UTC
session too. A full 53-oracle sweep under America/New_York (round 6)
found exactly one sensitive query — q11's date_trunc, since fixed; this
test pins the timestamp-bearing subset so the property can't silently
regress. spark.sql.session.timeZone is a runtime conf, so the same JVM
serves both sides.
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TZ = "America/New_York"
# Every gated query that reads a timestamp column (events.ts or the
# orders/lineitem date columns) plus the date-literal-filter representative.
TS_QUERIES = [
    "q06_view_orders_1995",
    "q08_latest_event_per_user",
    "q11_hourly_event_rollup",
    "q15_asof_join",
    "q24_keyset_page",
    "q30_sessionize",
    "q32_banded_range_join",
    "q33_interval_overlap_join",
]


@pytest.fixture(scope="module")
def spark_ny():
    from dbix_batchchunker_spark.session import get_spark

    s = get_spark(master="local[4]", shuffle_partitions=8)
    prev = s.conf.get("spark.sql.session.timeZone")
    s.conf.set("spark.sql.session.timeZone", TZ)
    yield s
    s.conf.set("spark.sql.session.timeZone", prev)


@pytest.fixture(scope="module")
def duck():
    conn = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        path = os.path.join(SF_DIR, f"{name}.parquet")
        if os.path.exists(path):
            conn.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    yield conn
    conn.close()


def _cell(v):
    if v is None or v is pd.NaT:
        return "NULL"
    if isinstance(v, float) and math.isnan(v):
        return "NULL"
    return str(v)


def _canon(pdf: pd.DataFrame):
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    return sorted(
        tuple(_cell(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    )


@pytest.mark.parametrize("name", TS_QUERIES)
def test_ts_query_matches_oracle_under_ny_tz(spark_ny, duck, name):
    sdf = entry_mod.queries()[name](spark_ny, SF_DIR)
    spdf = pd.DataFrame([tuple(r) for r in sdf.collect()], columns=sdf.columns)
    dpdf = duck.execute(entry_mod.oracle_sql()[name]).df()
    assert len(spdf) == len(dpdf), name
    assert _canon(spdf) == _canon(dpdf), name
