#!/usr/bin/env python
"""End-to-end LLM training-data pipeline composed from the engine's
operators — the workflow a user of this engine runs over a raw document
corpus before tokenization:

  1. PII redaction         (tx13: email/phone/IPv4 → typed placeholders,
                            pure JVM regexp chain)
  2. quality filter        (tx02: length / punctuation / digit heuristics)
  3. near-dup removal      (dd03: MinHash-LSH cluster dedup, keep each
                            cluster's representative — NO pair emission)
  4. substring-dup filter  (tx15: drop docs whose k-token windows are
                            mostly shared with OTHER docs — the
                            memorization signal document-level dedup
                            misses when documents only partially overlap)
  5. substring-span dedup  (tx35: cut token spans whose 4-grams first
                            occurred in an EARLIER doc — the surgical
                            Lee-et-al form; the doc keeps its unique text
                            where step 4 would have dropped or kept it
                            whole)
  6. decontamination       (tx10: drop docs sharing a word 5-gram with the
                            held-out benchmark set)
  7. mixture sampling      (sp01: per-language hash keep-rates — the
                            corpus-composition knob; deterministic, so
                            re-weighting one language leaves the others
                            byte-identical)
  8. deterministic split   (tx09: md5-hash train/val/test — reproducible
                            across engines, runs, and cluster sizes)
  9. write                 parquet partitioned by split (each split prunes
                            to its own directory for downstream readers)

The embedding modality gets the same treatment via sim07
(`embedding_dedup`): IVF-candidate near-dup clusters over the embeddings
table, keep one representative per cluster — compose it exactly like
step 3 when the corpus carries precomputed embeddings.

Every stage is a DataFrame → DataFrame transform, so the whole pipeline is
ONE lazy plan per split until the write; nothing materializes on the
driver. The same composition runs unchanged on a 1000-executor cluster —
stage shapes are analyzed in SCALING.md.

Run: python examples/training_pipeline.py [sf_dir] [out_dir]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dbix_batchchunker_spark.session import get_spark
from dbix_batchchunker_spark.operators.registry import QUERIES, t
import __spark_entry__  # noqa: F401  (populates the query registry)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp() + "/corpus"
    spark = get_spark(app_name="training_pipeline_example")

    docs = t(spark, sf_dir, "documents")
    n_raw = docs.count()

    # 1. PII scrub — replaces matches in-place; counts ride along for audit
    from dbix_batchchunker_spark.operators.text import redact_pii

    docs = redact_pii(docs).drop("text").withColumnRenamed("clean_text", "text")

    # 2. quality gate — keep docs passing the heuristic filters
    quality = QUERIES["tx02_quality_score"](spark, sf_dir).where("passes_quality")

    # 3. near-dup clusters — keep only cluster representatives (rep of its
    #    own cluster ⇒ is_dup = false); Θ(n) output, no pair join anywhere
    reps = QUERIES["dd03_minhash_dedup"](spark, sf_dir).where(~F.col("is_dup"))

    # 4. substring-dup filter — per-doc shared-window fraction; a doc that
    #    is >50% windows-shared with OTHERS is partial-duplicate content
    #    dd03's document-level clusters can't see. Computed on the dd03
    #    SURVIVORS, not the raw corpus: against raw docs, a kept
    #    representative still sees all its removed near-dup copies'
    #    windows, scores shared_ratio ≈ 1, and duplicated content would
    #    vanish from the training set entirely instead of being kept once.
    from dbix_batchchunker_spark.operators.text import dup_window_stats

    survivors = docs.join(reps.select("doc_id"), "doc_id", "left_semi")
    window_ok = dup_window_stats(survivors).where(F.col("shared_ratio") <= 0.5)

    # 5. substring-span dedup — the SURGICAL pass after the document-level
    #    ones: spans whose 4-grams first occurred in an earlier surviving
    #    doc are cut, the rest of the doc is kept (tx35; doc-id order is
    #    the keep-priority, so the result is deterministic under any
    #    execution order). Run on the window_ok SURVIVORS for the same
    #    reason step 4 runs on dd03's: against the raw corpus, kept
    #    representatives would see their removed copies' grams and lose
    #    their own text.
    from dbix_batchchunker_spark.operators.text import dedup_substring_spans

    span_kept = dedup_substring_spans(
        docs.join(window_ok.select("doc_id"), "doc_id", "left_semi")
    ).where(F.col("n_kept") > 0)
    docs = (
        docs.join(span_kept.select("doc_id", "kept_text"), "doc_id")
        .drop("text")
        .withColumnRenamed("kept_text", "text")
    )

    # 6. decontamination — tx10 returns the CONTAMINATED doc_ids (share a
    #    word 5-gram with the benchmark docs); anti-join them away
    contaminated = QUERIES["tx10_decontaminate"](spark, sf_dir)

    # 7. mixture — per-language keep-rates reweight the corpus composition
    mixture = QUERIES["sp01_mixture_sample"](spark, sf_dir)

    # 8. deterministic split assignment
    split = QUERIES["tx09_det_split"](spark, sf_dir)

    clean = (
        docs.join(quality.select("doc_id"), "doc_id", "left_semi")
        .join(reps.select("doc_id"), "doc_id", "left_semi")
        .join(window_ok.select("doc_id"), "doc_id", "left_semi")
        .join(contaminated, "doc_id", "left_anti")
        .join(mixture.select("doc_id"), "doc_id", "left_semi")
        .join(split, "doc_id")
    )

    # 9. learned-quality gate — linearized classifier inference (tx19):
    #    weights folded into codegen. The demo corpus is synthetic word
    #    salad, so instead of tx19's absolute keep threshold (tuned for
    #    prose) the pipeline keeps the TOP HALF by logit — the percentile
    #    form real corpus builds use ("keep the best k%"); approxQuantile
    #    is one pass, driver gets a single number
    # persisted: approxQuantile is an ACTION — without the cache the full
    # upstream pipeline (dedup + regex scoring) would run once for the
    # quantile and again for the final write (round-7 review finding)
    scored = (
        QUERIES["tx19_classifier_score"](spark, sf_dir)
        .join(clean.select("doc_id"), "doc_id", "left_semi")
        .select("doc_id", "quality_logit")
        .persist()
    )
    cut = scored.approxQuantile("quality_logit", [0.5], 0.001)[0]
    clean = clean.join(
        scored.where(F.col("quality_logit") >= cut).select("doc_id"),
        "doc_id", "left_semi",
    )

    # 10. one partitioned write; downstream readers of split=train prune the
    #    other directories at the source. The write goes through the
    #    maintenance layer: files come out ~target-sized (never
    #    one-per-shuffle-partition), and each split's files are laid out
    #    in doc_id ranges (sort_cols) so keyed scans prune row groups.
    from dbix_batchchunker_spark.sources.maintenance import write_sized_parquet

    clean = clean.persist()  # three split writes + sizing counts, one compute
    for split_name in ("train", "val", "test"):
        part = clean.where(F.col("split") == split_name).drop("split")
        write_sized_parquet(
            part, f"{out_dir}/split={split_name}",
            target_mb=8.0, sort_cols=["doc_id"],
        )
    clean.unpersist()

    # 11. sequence packing — the trainer-ready manifest: each train doc's
    #     slice of the concatenated token stream, cut into fixed-budget
    #     packs (two-phase prefix sum, no single-partition window)
    from dbix_batchchunker_spark.operators.sampling import (
        pack_segment_manifest,
        token_pack_spans,
    )
    from dbix_batchchunker_spark.operators.text import _tokens_spark

    train = spark.read.parquet(out_dir).where("split = 'train'")
    counts = train.select("doc_id", F.size(_tokens_spark("text")).alias("n_tokens"))
    # sp04/sp05's shared layout helpers — one copy of the pack arithmetic;
    # the manifest carries the per-segment slice columns a trainer needs
    manifest = pack_segment_manifest(token_pack_spans(counts))
    manifest.write.mode("overwrite").parquet(out_dir + "_packs")

    kept = spark.read.parquet(out_dir)
    per_split = {r["split"]: r["n"] for r in
                 kept.groupBy("split").agg(F.count("*").alias("n")).collect()}
    n_kept = sum(per_split.values())
    print(f"raw={n_raw} kept={n_kept} " +
          " ".join(f"{s}={per_split.get(s, 0)}" for s in ("train", "val", "test")))
    assert 0 < n_kept <= n_raw
    assert set(per_split) <= {"train", "val", "test"}


if __name__ == "__main__":
    main()
