#!/usr/bin/env python
"""Incremental EMBEDDING ingestion — the vector twin of
examples/incremental_ingest.py: dedup each new embedding batch against a
persisted IVF index + posting store, never re-indexing the corpus.

The round-12 addition this demonstrates is the explicit index handle:
``build_ivf_index`` returns an :class:`IvfIndex` whose two-level routing
state (super centroids + children-per-super, engaged above 256 cells)
SURVIVES persistence via ``save_ivf_index``/``load_ivf_index``. A bare
centroids parquet would reload without the super index and probe flat —
correct, but a DIFFERENT candidate set than the slack-routed entries the
store was built with, so batch and incremental probes would disagree on
the same geometry. The handle round-trip keeps them symmetric.

  store on disk        <store>/index/{centroids,supers,meta.json} +
                       (vec_id, centroid_id) multi-probe posting list +
                       (vec_id, label, embedding, nrm) vectors
  per increment        1. probe the increment against the LOADED index
                       2. pairs WITHIN the increment via shared cells
                       3. pairs ACROSS via the stored posting lists
                       4. exact cosine verify; append survivors
  cost per ingest      O(increment + touched cells)

Run: python examples/embedding_store_ingest.py [sf_dir] [store_dir]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dbix_batchchunker_spark.operators.registry import t
from dbix_batchchunker_spark.operators.similarity import (
    SIM06_NPROBE,
    _probe_entries,
    build_ivf_index,
    incremental_embedding_near_dups,
    load_ivf_index,
    norm,
    save_ivf_index,
)
from dbix_batchchunker_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    store_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else tempfile.mkdtemp(prefix="embedding_store_")
    )
    spark = get_spark()
    emb = t(spark, sf_dir, "embeddings").withColumn(
        "nrm", norm(F.col("embedding"))
    )

    cut = emb.agg(F.expr("percentile_approx(vec_id, 0.8)")).first()[0]
    corpus = emb.where(F.col("vec_id") <= cut)
    increment = emb.where(F.col("vec_id") > cut)

    # ---- build + persist the store (yesterday's job) -------------------
    index = build_ivf_index(corpus)
    save_ivf_index(index, os.path.join(store_dir, "index"))
    entries = _probe_entries(corpus, index, SIM06_NPROBE).select(
        F.col("doc_id").alias("vec_id"), F.col("bucket").alias("centroid_id")
    )
    # posting list partitioned by cell: an increment's probe prunes the
    # read to touched cells only
    entries.write.mode("overwrite").partitionBy("centroid_id").parquet(
        os.path.join(store_dir, "entries")
    )
    corpus.select("vec_id", "label", "embedding", "nrm").write.mode(
        "overwrite"
    ).parquet(os.path.join(store_dir, "vectors"))

    # ---- ingest (today's job: fresh session in production) -------------
    loaded = load_ivf_index(spark, os.path.join(store_dir, "index"))
    store_entries = spark.read.parquet(os.path.join(store_dir, "entries"))
    store_vectors = spark.read.parquet(os.path.join(store_dir, "vectors"))
    pairs = incremental_embedding_near_dups(
        increment, loaded, store_entries, store_vectors
    )
    n_pairs = pairs.count()
    dup_new = pairs.select(F.col("vec_b").alias("vec_id")).distinct()
    survivors = increment.join(dup_new, "vec_id", "left_anti")
    print(
        f"increment={increment.count()} near-dup pairs={n_pairs} "
        f"survivors={survivors.count()} "
        f"(two_level={loaded.two_level}) store={store_dir}"
    )

    # close the loop: append survivors' entries + vectors to the store
    _probe_entries(survivors, loaded, SIM06_NPROBE).select(
        F.col("doc_id").alias("vec_id"), F.col("bucket").alias("centroid_id")
    ).write.mode("append").partitionBy("centroid_id").parquet(
        os.path.join(store_dir, "entries")
    )
    survivors.select("vec_id", "label", "embedding", "nrm").write.mode(
        "append"
    ).parquet(os.path.join(store_dir, "vectors"))


if __name__ == "__main__":
    main()
