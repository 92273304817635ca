"""Corpus contracts the oracle gate RESTS ON, checked instead of assumed.

Every adjudicated text query tokenizes with some \\s dialect — Java \\s
(Spark split), RE2 \\s (DuckDB regexp_split_to_array), or the RE2-exact
Python class in bpe.py — and these agree ONLY on documents free of the
characters where the dialects differ: vertical tab (\\x0b — in Java and
Python-ASCII \\s but not RE2 \\s) and Unicode spaces (U+00A0, U+2000-
U+200A, U+3000 — in Python str.split() but in none of the regex
dialects). The same goes for event_id uniqueness, which st03's streaming
dedup oracle needs. If the driver ever regenerates testdata violating
one of these, THIS file names the root cause instead of a dozen oracle
hash mismatches."""

import duckdb
import pytest

SCALES = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


@pytest.mark.parametrize("sf_dir", SCALES)
def test_documents_free_of_dialect_splitting_whitespace(sf_dir):
    n = duckdb.sql(
        f"""
        SELECT COUNT(*) FROM '{sf_dir}/documents.parquet'
        WHERE regexp_matches(
            text, '[\\x{{0b}}\\x{{1c}}-\\x{{1f}}\\x{{85}}\\x{{a0}}\\x{{1680}}\\x{{2000}}-\\x{{200a}}\\x{{2028}}\\x{{2029}}\\x{{202f}}\\x{{205f}}\\x{{3000}}]')
        """
    ).fetchone()[0]
    assert n == 0, (
        f"{n} documents contain whitespace on which the Java/RE2/Python "
        f"tokenizer dialects disagree — text-oracle hash mismatches will "
        f"follow; align the tokenizers' whitespace classes first"
    )


@pytest.mark.parametrize("sf_dir", SCALES)
def test_event_ids_unique(sf_dir):
    total, distinct = duckdb.sql(
        f"SELECT COUNT(*), COUNT(DISTINCT event_id) "
        f"FROM '{sf_dir}/events.parquet'"
    ).fetchone()
    assert total == distinct, (
        "st03's streaming-dedup oracle assumes event_id uniqueness"
    )
