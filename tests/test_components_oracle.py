"""Independent-engine adjudication of the iterative component closures.

dd03 (MinHash-LSH cluster dedup) and sim07 (embedding dedup clusters) are
rows-only at the driver gate because xxhash64/IVF candidate generation is
not SQL-expressible. The part of each query where the correctness risk
actually lives, though — the ITERATIVE min-label propagation that closes
candidate edges into components — is engine-checkable: hand DuckDB the
same candidate graph Spark computed and let a recursive CTE (set-semantics
UNION reachability) derive every vertex's component minimum independently.
A bug in the propagation loop (early convergence exit, checkpoint lineage
truncation, band/bucket join keys) diverges from the CTE; a shared-input
bug in candidate generation is covered by the recall/property tests in
test_extensions.py.

Reachability via recursive CTE materializes O(sum of component size²) rows,
fine at gate scale (sf0.001) and exactly why the CTE is the oracle, not the
implementation.
"""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from dbix_batchchunker_spark.session import get_spark

    return get_spark(master="local[4]", shuffle_partitions=8)


def _components_via_duckdb(ids: pd.DataFrame, edges: pd.DataFrame) -> dict:
    """{id: component min id} from an undirected edge list, by recursive-CTE
    reachability in DuckDB (UNION dedups states, so it terminates)."""
    conn = duckdb.connect()
    conn.register("ids", ids)
    conn.register("edges_raw", edges)
    rows = conn.execute(
        """
        WITH RECURSIVE
        adj AS (
            SELECT src, dst FROM edges_raw
            UNION
            SELECT dst AS src, src AS dst FROM edges_raw
        ),
        reach(id, peer) AS (
            SELECT id, id AS peer FROM ids
            UNION
            SELECT r.id, a.dst AS peer
            FROM reach r JOIN adj a ON a.src = r.peer
        )
        SELECT id, MIN(peer) AS rep_id FROM reach GROUP BY id
        """
    ).fetchall()
    conn.close()
    return {r[0]: r[1] for r in rows}


def test_dd03_components_match_duckdb_closure(spark):
    from dbix_batchchunker_spark.operators.dedup import (
        _band_entries,
        _spread,
        dd03_minhash_dedup,
        minhash_signatures,
    )
    from dbix_batchchunker_spark.operators.registry import t

    docs = _spread(t(spark, SF_DIR, "documents"), "doc_id", "text")
    entries = _band_entries(minhash_signatures(docs)).toPandas()

    # Same bipartite doc↔bucket graph dd03 propagates over, closed by DuckDB:
    # docs sharing any (band, bucket) are adjacent.
    conn = duckdb.connect()
    conn.register("entries", entries)
    edges = conn.execute(
        """
        SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
        FROM entries a JOIN entries b
          ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
        """
    ).df()
    conn.close()
    ids = entries[["doc_id"]].drop_duplicates().rename(columns={"doc_id": "id"})
    expected = _components_via_duckdb(ids, edges)

    got = {
        r["doc_id"]: r["rep_id"] for r in dd03_minhash_dedup(spark, SF_DIR).collect()
    }
    assert got == expected


def test_sim07_components_match_duckdb_closure(spark):
    from dbix_batchchunker_spark.operators.similarity import (
        SIM07_THRESHOLD,
        ivf_near_dup_pairs,
        norm,
        sim07_embedding_dedup,
    )
    from dbix_batchchunker_spark.operators.registry import t

    emb = t(spark, SF_DIR, "embeddings").withColumn("nrm", norm(F.col("embedding")))
    edges = (
        # same DEDUP threshold sim07 feeds the closure (tighter than the
        # sim06 pair-listing default)
        ivf_near_dup_pairs(emb, SIM07_THRESHOLD)
        .select(F.col("vec_a").alias("src"), F.col("vec_b").alias("dst"))
        .toPandas()
    )
    ids = emb.select(F.col("vec_id").alias("id")).toPandas()
    expected = _components_via_duckdb(ids, edges)

    out = sim07_embedding_dedup(spark, SF_DIR).collect()
    got = {r["vec_id"]: r["rep_id"] for r in out}
    assert got == expected
    # is_dup is definitionally id != rep_id
    assert all((r["vec_id"] != r["rep_id"]) == r["is_dup"] for r in out)


def test_salted_sides_pairs_negative_ids(spark):
    """_salted_sides must salt with pmod: a plain % gives negative ids a
    negative salt that matches no replicated right-side salt, silently
    dropping their pairs from every blocked-pair operator."""
    from pyspark.sql import functions as F

    from dbix_batchchunker_spark.operators.dedup import _salted_sides

    df = spark.createDataFrame(
        [(-5, "en", [1, 2, 3]), (-3, "en", [1, 2, 3]), (4, "en", [1, 2, 3])],
        "doc_id long, lang string, feats array<bigint>",
    )
    a, b = _salted_sides(df)
    pairs = a.join(
        b,
        (F.col("a.lang") == F.col("b.lang"))
        & (F.col("a.salt") == F.col("b.salt"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    )
    assert pairs.count() == 3  # all C(3,2) pairs survive the salt
