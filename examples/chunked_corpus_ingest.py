#!/usr/bin/env python
"""Chunked corpus onboarding — the reference's core loop driving the
substring-dedup postings store.

The reference's whole reason to exist is "run one huge keyed operation as
many small BETWEEN ranges" (BatchChunker.pm:70-178, examples/basic.pl).
The 100 TB analogue here: onboarding a corpus into the deduplicated
training set. One giant substring-dedup pass would be a single monster
job; the chunked form is restartable, throttleable, and bounds every
batch's memory — and thanks to the bucketed postings store each chunk's
probe does NO store-side shuffle, so per-chunk cost does not grow as the
onboarded corpus ages (measured: scripts/ingest_decade.py, SCALING.md).

The loop (tx38's machinery, operators/gram_store.py):

  BatchChunker keyset-chunks documents by doc_id
      └─ per chunk k: store.ingest_batch(chunk, bid=k)
           1. cut spans duplicating the store (bucketed probe, zero
              store-side Exchange) or an earlier same-chunk doc
           2. localCheckpoint the per-doc result (bounded: chunk-sized)
           3. claim the kept docs' grams as partition batch=k
              (dynamic overwrite ⇒ replay-idempotent)

  maintenance window (between chunks / drains):
      store.purge(doc_ids)     — tombstone, cheap
      store.needs_compact()    — tombstone backlog past the broadcast
                                 ceiling? (reads already degraded to the
                                 shuffle fallback ⇒ compact NOW)
      store.compact()          — physical delete + file-count bound;
                                 single-writer enforced by a lease file
                                 (a racing ingest/purge refuses loudly)
      fold_outputs(...)        — sized parquet over per-batch output
                                 dirs, all IO through the path's own
                                 Hadoop FileSystem (object-store safe)

Chunk boundaries do NOT affect the result: keep-priority is MIN(doc_id),
and id-ordered chunks make "earlier chunk" ⊆ "smaller doc_id" — the
property tx38's oracle adjudicates without modelling the chunking.

Run: python examples/chunked_corpus_ingest.py [sf_dir]
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dbix_batchchunker_spark.chunker import BatchChunker
from dbix_batchchunker_spark.operators.gram_store import GramPostingsStore
from dbix_batchchunker_spark.operators.registry import t
from dbix_batchchunker_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(master="local[8]", shuffle_partitions=16)
    base = tempfile.mkdtemp(prefix="corpus_ingest_")
    store = GramPostingsStore(
        spark, "corpus_grams", os.path.join(base, "postings")
    ).create()
    out = os.path.join(base, "docs")

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    row = docs.agg(
        F.min("doc_id").alias("mn"), F.max("doc_id").alias("mx")
    ).first()
    n_chunks = [0]

    def ingest_chunk(bc: BatchChunker, chunk_df) -> None:
        bid = n_chunks[0] + 1  # 1-based: probe reads batch < bid
        res = store.ingest_batch(chunk_df, bid=bid)
        res.write.mode("overwrite").parquet(os.path.join(out, f"b{bid}"))
        n_chunks[0] = bid

    BatchChunker(
        df=docs,
        id_name="doc_id",
        coderef=ingest_chunk,
        chunk_size=max(1, (int(row["mx"]) - int(row["mn"]) + 1) // 8),
        min_id=int(row["mn"]),
        max_id=int(row["mx"]),
        target_time=0,
        min_chunk_percent=0,
        sleep=0,
        verbose=True,
        on_message=print,
    ).execute()

    from dbix_batchchunker_spark.operators.stream import (
        fold_outputs,
        read_outputs,
    )

    # maintenance window: purge one doc, compact, fold the output dirs
    store.purge(docs.limit(1).select("doc_id"))
    store.compact()
    fold_outputs(spark, out, upto=n_chunks[0] + 1)

    result = read_outputs(spark, out)
    stats = result.agg(
        F.count("*").alias("docs"),
        F.sum("n_removed").alias("removed_tokens"),
        F.sum("n_kept").alias("kept_tokens"),
    ).first()
    print(
        f"chunks={n_chunks[0]} docs={stats['docs']} "
        f"removed={stats['removed_tokens']} kept={stats['kept_tokens']} "
        f"live_postings={store.live_postings().count()}"
    )
    store.drop()
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
