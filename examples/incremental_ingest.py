#!/usr/bin/env python
"""Incremental corpus ingestion — dedup each new batch against the
EXISTING corpus via a persisted signature store, never rebuilding.

Production corpora grow by increments (a crawl drop, a new dump). The
naive play — rerun document dedup over old ∪ new — re-pairs the whole
corpus every ingest: O(corpus²) forever. The incremental contract is:

  store on disk        (doc_id, band, bucket) minhash band entries +
                       (doc_id, words) hashed token sets
  per increment        1. pairs WITHIN the increment: banding among new
                       2. pairs ACROSS: band-bucket equi-join of the new
                          entries against the store (bucket-partitioned
                          parquet ⇒ the probe prunes to touched buckets)
                       3. exact-verify both sets (size-ratio prefilter,
                          then word-set Jaccard)
                       4. drop the increment's dup docs, APPEND the
                          survivors' entries/words to the store
  cost per ingest      O(increment + matching buckets) — the old corpus
                       is never paired against itself again

Equality with the full-batch run (restricted to pairs touching the
increment) is pinned in tests/test_extensions.py; this script shows the
disk round-trip shape.

Run: python examples/incremental_ingest.py [sf_dir] [store_dir]
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dbix_batchchunker_spark.operators.dedup import (
    JACCARD_THRESHOLD,
    hashed_words,
    incremental_near_dup_pairs,
    minhash_band_entries,
)
from dbix_batchchunker_spark.operators.registry import t
from dbix_batchchunker_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    store_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(
        prefix="corpus_store_"
    )
    spark = get_spark()
    docs = t(spark, sf_dir, "documents")

    # Split the table into an "existing corpus" and an "ingest increment"
    # by id, standing in for yesterday's corpus and today's drop.
    cut = docs.agg(F.expr("percentile_approx(doc_id, 0.8)")).first()[0]
    corpus, increment = docs.where(F.col("doc_id") <= cut), docs.where(
        F.col("doc_id") > cut
    )

    # --- day 0: build and persist the store ------------------------------
    words_path = os.path.join(store_dir, "words")
    entries_path = os.path.join(store_dir, "entries")
    w0 = hashed_words(corpus)
    w0.write.mode("overwrite").parquet(words_path)
    # Partitioned by band: an increment's probe join reads only the bands
    # (and, with bucketing on `bucket`, only the buckets) it actually hits.
    minhash_band_entries(w0).write.mode("overwrite").partitionBy("band").parquet(
        entries_path
    )
    print(f"store built at {store_dir} (corpus ≤ doc_id {cut})")

    # --- day 1: dedup the increment against the store --------------------
    new_words = hashed_words(increment)
    pairs = incremental_near_dup_pairs(
        new_words,
        spark.read.parquet(entries_path),
        spark.read.parquet(words_path),
        threshold=JACCARD_THRESHOLD,
    )
    # doc_b is the increment-side doc by contract (cross pairs) and the
    # larger id of a within-increment pair — either way a valid drop set
    # that keeps one representative per dup group.
    dup_new_ids = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    survivors = increment.join(dup_new_ids, "doc_id", "left_anti")
    n_inc, n_dup = increment.count(), dup_new_ids.count()
    print(f"increment: {n_inc} docs, {n_dup} near-dups dropped")

    # --- close the loop: append the survivors to the store ---------------
    sw = hashed_words(survivors)
    sw.write.mode("append").parquet(words_path)
    minhash_band_entries(sw).write.mode("append").partitionBy("band").parquet(
        entries_path
    )
    total = spark.read.parquet(words_path).count()
    print(f"store now holds {total} docs; next ingest probes it the same way")

    # --- lifecycle: compact deletions out of the store --------------------
    # The append-only loop only GROWS the store; docs later deleted (DMCA,
    # quality purge) keep matching every future ingest until compacted.
    from dbix_batchchunker_spark.operators.dedup import compact_near_dup_store

    deleted = corpus.select("doc_id").limit(5)  # stand-in for a purge list
    c_entries, c_words = compact_near_dup_store(
        spark.read.parquet(entries_path), spark.read.parquet(words_path), deleted
    )
    # at 100 TB this is a partition-overwrite; demo-scale: rewrite aside
    c_words.write.mode("overwrite").parquet(words_path + "_compacted")
    c_entries.write.mode("overwrite").partitionBy("band").parquet(
        entries_path + "_compacted"
    )
    n_after = spark.read.parquet(words_path + "_compacted").count()
    print(f"compacted store: {total} -> {n_after} docs (5 purged)")

    # --- the SUBSTRING modality of the same loop (round 13) ---------------
    # Document-level dedup above drops whole near-dup docs; the gram store
    # cuts duplicated SPANS from what survives (tx36). Same append-only
    # lifecycle: one distinct-gram table on disk, each increment semi-joins
    # against it, survivors' grams append back.
    from dbix_batchchunker_spark.operators.text import (
        _positional_grams,
        incremental_substring_dedup,
    )

    grams_path = os.path.join(store_dir, "grams")
    _positional_grams(corpus, 4).select("gram").distinct().write.mode(
        "overwrite"
    ).parquet(grams_path)
    gram_store = spark.read.parquet(grams_path)
    span_cut = incremental_substring_dedup(survivors, gram_store)
    n_cut = span_cut.where(F.col("n_removed") > 0).count()
    print(f"gram store: {n_cut} surviving increment docs had spans cut")
    # close the loop: the increment's own distinct grams join the store.
    # Materialize the delta BEFORE appending — the left_anti reads
    # grams_path lazily, and appending to a dir a running job is still
    # listing is timing-dependent (round-13 advisor).
    gram_delta = (
        _positional_grams(
            span_cut.where(F.col("n_kept") > 0).select(
                "doc_id", F.col("kept_text").alias("text")
            ),
            4,
        )
        .select("gram")
        .distinct()
        .join(gram_store, "gram", "left_anti")
        .localCheckpoint(eager=True)
    )
    gram_delta.write.mode("append").parquet(grams_path)

    if len(sys.argv) <= 2:
        shutil.rmtree(store_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
