"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 with its DuckDB oracle for the per-round correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

# Make the sibling package importable regardless of the caller's cwd.
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

# Importing the operator modules populates the registry. Imports are
# UNCONDITIONAL on purpose: a swallowed ImportError here would silently
# drop an entire query family from the correctness gate.
from dbix_batchchunker_spark.operators import registry
from dbix_batchchunker_spark.operators import (  # noqa: F401
    advanced,
    bpe,
    chunked,
    dedup,
    gram_store,
    multimodal,
    relational,
    similarity,
    stream,
    text,
    # Import order no longer affects the adjudicated prefix — that is
    # pinned by name in ADJUDICATED_PREFIX below. sampling/rangejoin stay
    # last for historical diff stability only.
    sampling,
    rangejoin,
)

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the chunked-delete query (the reference's core use case)
    driven by the adaptive BatchChunker loop at sf0.001."""
    return registry.QUERIES["q20_chunked_delete_survivors"](spark, SF0001)


#: THE 50 driver-adjudicated slots, pinned BY NAME (the driver's
#: correctness gate compares exactly the first 50 queries() entries against
#: their DuckDB oracles at sf0.01). Pinning the prefix explicitly — rather
#: than deriving it from registration order — makes displacement
#: structurally impossible: a newly registered oracle-backed query can
#: never push a slot-holder out (pre-pin failure modes: round 2 lost
#: tx06-tx11 to ordering; round 7's q33 briefly displaced q32). With 85
#: oracle-backed queries (95 after the round-8 additions: sp07/sp08, q48-q54, tx26)
#: and a fixed 50-slot driver cap, the prefix now
#: ROTATES each round (round-7 verdict "Next round #2") so every
#: oracle-backed query earns a driver-adjudicated green row within a few
#: rounds. Rotation log:
#:   round 7: q13/q14/q24 out -> tx14/sp01/q32 in.
#:   round 8: 12 long-stable slot-holders out (q02/q04/q05/q06/q10/q11,
#:     tx01/tx04/tx05/tx08/tx09/tx12 — all 7-rounds driver-green, shapes
#:     covered by prefix siblings) -> 12 never-adjudicated in
#:     (q33/q36/q38/q40/q42/q44, dd10/dd11, sim08, tx16/tx18, sp04).
#:   round 9: CORRECTNESS_r08 = 50/50 green, so the 12 round-8
#:     first-timers (q33/q36/q38/q40/q42/q44, dd10/dd11, sim08,
#:     tx16/tx18, sp04) rotate out, plus 3 long-stable 8-round-green
#:     slot-holders (q16/q17/q18). In: the 10 round-8 oracle-backed
#:     additions (sp07/sp08, q48-q54, tx26), the 2 longest-waiting
#:     (tx15/tx17), and the 3 oldest demoted for re-adjudication
#:     (q13/q14/q24 — demoted since round 7).
#:   round 10: CORRECTNESS_r09 = 50/50 green, so the full backlog clears
#:     in one swing — ALL 40 never-driver-adjudicated oracle-backed
#:     queries rotate in: the round-9 planned set (tx27/tx28/tx29,
#:     mm07/mm08, q55, sp09, st03/st05/st06/st09/st10/st11 — the
#:     streaming block's FIRST driver slots) plus every waiter
#:     (tx19-tx23, q34/q35/q37/q39/q41/q43/q45/q46/q47, q56-q59, tx30,
#:     sp02/sp03/sp05/sp06) and the 4 round-10 additions (dd12 star
#:     components, dd13 SQL-minhash banding, sim02 newly oracle-gated,
#:     tx31 BPE trainer oracle). The chunker flagships q20-q23 keep
#:     permanent slots (the reference's core loop must stay driver-
#:     adjudicated every round); the 6 remaining slots re-adjudicate the
#:     OLDEST demotions (q02/q04/q05/q06/q10/q11, driver-green last in
#:     round 7). Everything green in r09 rotates out. Queued for the
#:     round-11 rotation: the round-10 LATE additions (dd14, dd15,
#:     sim06, sim07, sim09, mm02, mm03 — all oracle-gated after this
#:     prefix was pinned).
#:   round 11: CORRECTNESS_r10 = 50/50 green (all 40 first-timers
#:     passed), so every r10 green except the permanent chunker slots
#:     rotates out. In: the 7 queued late-r10 oracle additions — the
#:     entire never-driver-adjudicated backlog (dd14/dd15, mm02/mm03,
#:     sim06/sim07/sim09) — plus the round-11 additions earning
#:     first-round driver rows (st01/st02/st04 batch-drain oracles,
#:     tx32 trainer→encode composition, mm04 pHash oracle), so the
#:     never-adjudicated backlog hits ZERO. Remaining slots refill from
#:     the head of DEMOTED_FROM_PREFIX (oldest driver-green first:
#:     q01/q03/q07/q08… last green round 9).
#:   round 12: CORRECTNESS_r11 = 50/50 green and the never-adjudicated
#:     backlog is zero, so the rotation swings to the OLDEST driver-green
#:     cohorts (round-11 verdict #7): every r11 green except the
#:     permanent chunker slots rotates out. In: the 3 round-12 oracle
#:     debuts (st08's layout-invariant sized-sink relation, mm05's
#:     integer-exact clip stats, mm06's stored-block payload sizes —
#:     multimodal and streaming families now FULLY adjudicated — and
#:     tx33's sliding-window chunker + tx34's span-level
#:     decontamination, added mid-round) plus the 41 oldest demotions —
#:     the full round-7 (tx01…tx12), round-8 (q16…sp04) and round-9
#:     (tx02…sp08) cohorts and the 7 head entries of the round-10
#:     cohort (q34…q45).
#:   round 13: CORRECTNESS_r12 = 50/50 green, so the r12 cohort (its 3
#:     debuts included) rotates out. In: the 2 round-13 oracle debuts
#:     (sim11's persisted-store incremental ingest, tx13v's planted-PII
#:     redaction rewrite) plus 44 from the demotion queue head — the
#:     ENTIRE remaining round-10 cohort (q46…q11, 39 queries, demoted
#:     since round 11) and the first 5 of the round-11 cohort
#:     (dd14/dd15 — mm02/mm03/sim06 ceded their slots to the mid-round
#:     tx35/tx36/st12 debuts). Queue head for round 14: mm02, mm03,
#:     sim06, sim07….
#:   round 14: CORRECTNESS_r13 = 50/50 green, so the full r13 cohort (its
#:     5 debuts included) rotates out. In: the 4 round-14 oracle debuts
#:     (tx37's purged+compacted postings-store dedup, st13's streaming
#:     ingest on the postings store with mid-stream purge/compact, sim12's
#:     embedding-store purge/compact adjudication — the deletion/compaction
#:     lifecycle family — plus the mid-round debuts: tx38, BatchChunker
#:     driving the postings-store ingest; q60, the store-accounting
#:     observability row; tx40, the wave-parallel onboarding composition
#:     through ConcurrentChunker. dd08/mm01/sim01 ceded their slots back
#:     to the queue head, the tx35/tx36/st12 precedent) plus the first 40
#:     of the demotion queue: the round-11 cohort head recorded last round
#:     (mm02, mm03, sim06, sim07, sim09, st01…) through dd06 —
#:     dd08/mm01/sim01/sim03 head the queue for round 15.
#:   round 15: CORRECTNESS_r14 = 50/50 green, so the full r14 cohort (its
#:     6 debuts included) rotates out. In: the round-15 oracle debuts —
#:     q61 (store accounting at the lifecycle edges: fresh-store zeros and
#:     overlapping double purges, the round-14 advisor's findings made a
#:     driver row) and the mid-round tx41 (the FIXPOINT wave composition
#:     on a planted CHAINED corpus via the seam-gram device — q35 ceded
#:     its seat back to the queue head, the tx35/tx36/st12 precedent) —
#:     plus the recorded queue head (dd08/mm01/sim01/sim03, which ceded
#:     their r14 seats to mid-round debuts) and the first 40 of the
#:     round-12 demotion cohort (st08…q34). q35/q37/q39/q41/q43/q45 head
#:     the queue for round 16.
#:   round 16: CORRECTNESS_r15 = 50/50 green, so the full r15 cohort (its
#:     2 debuts included) rotates out. In: the round-16 oracle debut —
#:     tx42 (TWO corpus drops onboarded into one UNCOMPACTED store: the
#:     round-15 verdict's top ask adjudicated — bids offset past
#:     max_real_batch(), probes pinned to the true pre-run snapshot) —
#:     plus the recorded queue head (q35/q37/q39/q41/q43/q45, the
#:     round-12 cohort's tail) and the first 39 of the round-13 demotion
#:     cohort (sim11…q02). Mid-round: tx43 debuted (purge+compact between
#:     two drops through the public onboarding API — the maintenance-
#:     window lifecycle cell tx37/tx42 left open) and q02 ceded its seat
#:     back to the queue head, the tx35/tx36/st12/tx41 precedent.
#:     q02/q04/q05/q06/q10/q11/dd14/dd15 head the queue for round 17.
#:   round 17: CORRECTNESS_r16 = 50/50 green, so the full r16 cohort (its
#:     2 debuts included) rotates out. In: the round-17 oracle debut —
#:     sim13 (the persisted embedding store's full lifecycle through the
#:     round-16 API: save → leased append → purge →
#:     compact_persisted_embedding_store → pair listing from the reloaded
#:     posting lists, on sim12's planted device — round-16 verdict #4) —
#:     plus the recorded queue head (q02/q04/q05/q06/q10/q11, dd14/dd15)
#:     and the first 37 of the round-14 demotion cohort (tx37…q49,
#:     round-14 debuts first). Mid-round: sim14 debuted (retrain of the
#:     append-grown persisted embedding store — the round-17 maintenance
#:     op retrain_embedding_store, oracle-gated from birth on sim11's
#:     device without the purge) and q49 ceded its seat back to the
#:     queue head, the tx41/tx43 precedent. Then st14 debuted (the
#:     persisted embedding store's STREAMING arm: st13's ingest loop
#:     re-seated on the second store via the planted one-hot vecfeed —
#:     bootstrap save, dedup-on-arrival leased appends, purge+compact
#:     mid-stream) and q48 ceded likewise.
#:     q48/q49/q50/q51/q52/q53/q54/dd01/dd02 head the queue for
#:     round 18.
#: Every rotated-out query stays oracle-pinned in the local gate replica
#: (tests/test_queries_oracle.py parametrizes over every oracle —
#: 153 after the round-17 additions: sim13, sim14, st14).
ADJUDICATED_PREFIX = (
    # chunker flagships: permanent slots
    "q20_chunked_delete_survivors", "q21_chunked_groupby_combine",
    "q22_chunked_update_overlay", "q23_chunked_update_join",
    # round-17 oracle debuts: first driver rows in their debut round
    # (mid-round: sim14 = retrain of the append-grown persisted store,
    # st14 = the persisted embedding store's streaming ingest arm)
    "sim13_persisted_store_lifecycle", "sim14_retrained_store_pairs",
    "st14_stream_embedding_store_ingest",
    # recorded queue head: the round-13 cohort's tail (q02 ceded its r16
    # seat to the mid-round tx43 debut) + the dd pair queued since r13
    "q02_filter_predicates", "q04_minmax_count", "q05_groupby_having",
    "q06_view_orders_1995", "q10_set_ops", "q11_hourly_event_rollup",
    "dd14_sql_simhash_pairs", "dd15_sql_minhash_components",
    # …then the round-14 cohort (last driver-green round 14), oldest
    # first: its debuts, then the re-adjudication block
    "tx37_purged_store_dedup", "st13_stream_purged_store_ingest",
    "sim12_purged_store_pairs", "tx38_chunked_corpus_ingest",
    "q60_store_accounting", "tx40_concurrent_corpus_ingest",
    "mm02_decode_pipeline", "mm03_resize_and_sample", "sim06_ivf_near_dup",
    "sim07_embedding_dedup", "sim09_mmr_rerank", "st01_stream_hourly_rollup",
    "st02_stream_user_totals", "st04_stream_sessions",
    "tx32_bpe_train_encode", "mm04_phash_near_dup",
    "st07_stream_incremental_packing", "q01_pricing_summary",
    "q03_revenue_by_nation", "q07_top_customers",
    "q08_latest_event_per_user", "q09_customers_without_orders",
    "q12_rollup_revenue", "q13_conditional_agg", "q14_below_avg_quantity",
    "q15_asof_join", "q24_keyset_page", "q25_shipping_priority",
    "q26_returned_items", "q27_above_avg_spenders", "q28_cube_counts",
    "q29_fuzzy_part_names", "q30_sessionize", "q31_running_revenue",
    "q32_banded_range_join",
)

#: Former slot-holders, first in line for re-adjudication when the
#: rotation swings back — the queue is ordered OLDEST driver-green first,
#: so the head is always first in line when slots free up (or if the
#: driver cap were raised).
DEMOTED_FROM_PREFIX = (
    # Last driver-green round 14 (the remaining entries of that cohort —
    # the 37 ahead were re-seated for round 17).
    "q50_histogram_quantile_rollup", "q51_event_funnel",
    "q52_dense_hourly_fill", "q53_null_aware_anti_shuffle",
    "q54_session_paths", "dd01_exact", "dd02_jaccard_pairs",
    "dd05_mllib_minhash", "dd06_lsh_jaccard_pairs",
    # Last driver-green round 15 (all 46 r15 greens except the permanent
    # chunker flagships; round-15 debuts first).
    "q61_store_purge_accounting", "tx41_fixpoint_wave_ingest",
    "dd08_ngram_jaccard_pairs", "mm01_binary_stats",
    "sim01_topk_bruteforce", "sim03_embedding_near_dup",
    "st08_stream_sized_sink", "mm05_wav_clip_stats",
    "mm06_png_header_metadata", "tx33_sliding_windows",
    "tx34_span_decontaminate", "tx01_token_stats", "tx04_fingerprint",
    "tx05_json_extract", "tx08_rolling_hash", "tx09_det_split",
    "tx12_repetition", "q16_semi_join", "q17_scalar_functions",
    "q18_percentiles", "q33_interval_overlap_join", "q36_pivot_event_matrix",
    "q38_composite_keyset", "q40_null_aware_anti",
    "q42_trailing_week_revenue", "q44_full_outer_reconcile",
    "dd10_jaccard_components", "dd11_containment_pairs",
    "sim08_quantized_topk", "tx16_bloom_decontaminate",
    "tx18_bpe_merge_pairs", "sp04_sequence_packing", "tx02_quality_score",
    "tx03_langid", "tx06_pipeline_quality_dedup", "tx07_bpe_token_count",
    "tx10_decontaminate", "tx11_group_sample", "tx14_vocab",
    "tx15_dup_windows", "tx17_contamination_severity", "tx26_token_rarity",
    "sp01_mixture_sample", "sp07_mixture_waterfill", "sp08_epoch_plan",
    "q34_grouping_sets",
    # Last driver-green round 16 (demoted this round — all 46 r16 greens
    # except the permanent chunker flagships; round-16 debuts first).
    "tx42_second_drop_onboarding", "tx43_purged_store_second_drop",
    "q35_event_gaps", "q37_topk_per_group", "q39_spend_deciles",
    "q41_sketch_rollup", "q43_salted_hot_join",
    "q45_unpivot_status_counts", "sim11_incremental_store_pairs",
    "tx13v_pii_redact_portable", "tx35_substring_dedup",
    "tx36_incremental_substring_dedup", "st12_stream_gram_store_ingest",
    "q46_lateral_topn_per_customer", "q47_recursive_hierarchy_rollup",
    "q55_snapshot_diff", "q56_relational_division", "q57_id_islands",
    "q58_revenue_share", "q59_segment_listagg", "tx19_classifier_score",
    "tx20_split_leakage", "tx21_variant_extract", "tx22_zipf_fit",
    "tx23_pii_scan", "tx27_bpe_fixed_encode", "tx28_gopher_quality_rules",
    "tx29_ngram_novelty", "tx30_langid_confusion",
    "tx31_bpe_trainer_oracle", "mm07_png_header_oracle",
    "mm08_wav_header_oracle", "dd12_star_components",
    "dd13_sql_minhash_bands", "sim02_ann_lsh", "sp02_weighted_sample",
    "sp03_temperature_sample", "sp05_pack_segments", "sp06_epoch_shuffle",
    "sp09_stratified_split", "st03_stream_dedup", "st05_stream_enrich",
    "st06_stream_stream_join", "st09_stream_hourly_counts",
    "st10_stream_user_counts", "st11_stream_session_counts",
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """All registered queries: the pinned 50-slot ADJUDICATED_PREFIX, then
    every other oracle-gated query (demoted slot-holders first, then
    later additions in registration order — all adjudicated by the local
    gate replica, tests/test_queries_oracle.py), then rows-only demos.

    A renamed or unregistered prefix query raises KeyError HERE (loudly,
    in every test run) instead of silently shrinking the adjudicated
    surface at driver time.
    """
    prefix = {n: registry.QUERIES[n] for n in ADJUDICATED_PREFIX}
    placed = set(ADJUDICATED_PREFIX) | set(DEMOTED_FROM_PREFIX)
    trailing_gated = {
        n: registry.QUERIES[n]
        for n in (
            *DEMOTED_FROM_PREFIX,
            *(
                n
                for n in registry.QUERIES
                if n in registry.ORACLES and n not in placed
            ),
        )
    }
    rows_only = {
        n: fn for n, fn in registry.QUERIES.items() if n not in registry.ORACLES
    }
    return {**prefix, **trailing_gated, **rows_only}


def oracle_sql() -> dict[str, str]:
    return dict(registry.ORACLES)
