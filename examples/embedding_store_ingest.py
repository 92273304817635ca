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
                       — written/appended/compacted through the
                       save/append/compact_persisted_embedding_store
                       API, every mutation under the maintenance lease
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
    append_embedding_store,
    build_ivf_index,
    compact_persisted_embedding_store,
    incremental_embedding_near_dups,
    load_embedding_store,
    norm,
    save_embedding_store,
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
    # one composite save, one maintenance lease (round 16): index +
    # entries (partitioned by cell, so an increment's probe prunes the
    # read to touched cells only) + vectors
    index = build_ivf_index(corpus)
    entries = _probe_entries(corpus, index, SIM06_NPROBE).select(
        F.col("doc_id").alias("vec_id"), F.col("bucket").alias("centroid_id")
    )
    save_embedding_store(store_dir, index, entries, corpus)

    # ---- ingest (today's job: fresh session in production) -------------
    loaded, store_entries, store_vectors = load_embedding_store(
        spark, store_dir
    )
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

    # close the loop: append survivors' entries + vectors — leased, so a
    # compact landing mid-append refuses instead of corrupting
    append_embedding_store(
        store_dir,
        _probe_entries(survivors, loaded, SIM06_NPROBE).select(
            F.col("doc_id").alias("vec_id"),
            F.col("bucket").alias("centroid_id"),
        ),
        survivors,
    )

    # maintenance window: physically delete a takedown slice from both
    # halves — write-aside + checked swap under the same lease; every
    # crash point (including mid-swap, round 17) converges by re-running
    takedown = corpus.limit(3).select("vec_id")
    compact_persisted_embedding_store(spark, store_dir, takedown)
    _, _, live_vectors = load_embedding_store(spark, store_dir)
    print(f"post-takedown store vectors={live_vectors.count()}")

    # keyset discipline (round 17): vec_ids are never reused — the store
    # persists a watermark and a reusing append refuses loudly, so a
    # batch keyed below yesterday's ids can't silently duplicate rows
    from dbix_batchchunker_spark.operators.similarity import (
        verify_embedding_store_watermark,
    )

    probe = verify_embedding_store_watermark(spark, store_dir)
    print(f"watermark={probe['watermark']} residue={probe['residue']}")
    # derive the reused batch from the POST-compact reload: frames loaded
    # before a compact must not be re-read after it (the compact
    # physically replaced their files — the mixed-window caveat)
    reused = live_vectors.limit(2).localCheckpoint(eager=True)
    try:
        append_embedding_store(
            store_dir,
            _probe_entries(reused, loaded, SIM06_NPROBE).select(
                F.col("doc_id").alias("vec_id"),
                F.col("bucket").alias("centroid_id"),
            ),
            reused,
        )
        raise AssertionError("reused-id append must refuse")
    except ValueError as e:
        print(f"reused-id append refused as designed: {str(e)[:72]}…")

    # append-growth endgame (round 17): appends route through the TRAINED
    # centroids — the index is never touched — so cells fatten as the
    # store grows and probe cost erodes the trained sqrt(n) geometry.
    # ivf_drift_stats/ivf_needs_retrain watch the decay (pure driver
    # arithmetic, loggable); retrain_embedding_store rebuilds centroids
    # from the live vectors into a FRESH store — never in place, because
    # an index+entries two-dir swap has a crash window that pairs
    # silently wrong — and the cutover is the caller's pointer swap.
    from dbix_batchchunker_spark.operators.similarity import (
        ivf_drift_stats,
        ivf_needs_retrain,
        retrain_embedding_store,
        store_near_dup_pairs,
    )

    idx_now, e_now, v_now = load_embedding_store(spark, store_dir)
    baseline = ivf_drift_stats(idx_now.centroids, v_now.limit(20))
    current = ivf_drift_stats(idx_now.centroids, v_now)
    fire = ivf_needs_retrain(baseline, current)
    print(
        f"drift: mean_top_cos={current['mean_top_cos']:.3f} "
        f"skew={current['occupancy_skew']:.2f} needs_retrain={fire}"
    )
    retrained_dir = store_dir.rstrip("/") + "__retrained"
    retrain_embedding_store(spark, store_dir, retrained_dir)
    _, e_r, v_r = load_embedding_store(spark, retrained_dir)
    before = store_near_dup_pairs(e_now, v_now).count()
    after = store_near_dup_pairs(e_r, v_r).count()
    print(f"retrain: pair listing before={before} after={after}")
    assert after == before, "retrain must preserve the pair listing"


if __name__ == "__main__":
    main()
