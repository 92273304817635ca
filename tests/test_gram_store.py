"""GramPostingsStore lifecycle net: the bucketed, deletion-capable gram
store (round-13 verdict #1/#2/#3) — plan shape, purge/compact round-trip,
replay idempotency, crash repair, re-registration, file discipline."""

from __future__ import annotations

import os
import re

import pytest
from pyspark.sql import functions as F

from dbix_batchchunker_spark.operators.gram_store import (
    COMPACT_PARTITION,
    GramPostingsStore,
    cleanup_store,
    temp_store,
)
from dbix_batchchunker_spark.operators.text import (
    _positional_grams,
    incremental_substring_dedup,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from dbix_batchchunker_spark.session import get_spark

    return get_spark(master="local[4]", shuffle_partitions=8)


@pytest.fixture()
def docs(spark):
    from dbix_batchchunker_spark.operators.registry import t

    return t(spark, SF, "documents").select("doc_id", "text")


def _executed(df) -> str:
    df.write.format("noop").mode("overwrite").save()
    return df._jdf.queryExecution().executedPlan().toString()


def _n_shuffles(plan: str) -> int:
    return len(re.findall(r"Exchange hashpartitioning", plan))


def test_live_grams_plan_zero_store_exchange(spark, docs):
    """The verdict-#1 done-criterion: the store side of every per-batch
    read is Exchange-FREE — bucketed scan feeds the tombstone anti-join
    and the distinct in place."""
    store = temp_store(spark, "gs_t1_")
    try:
        store.add_postings(docs.where("doc_id % 5 != 4"), bid=0)
        store.purge(docs.where("doc_id % 20 == 0").select("doc_id"))
        plan = _executed(store.live_grams(before_batch=1))
        assert "Bucketed: true" in plan
        assert _n_shuffles(plan) == 0, plan
    finally:
        cleanup_store(store)


def test_probe_plan_streams_store_single_batch_shuffle(spark, docs):
    """probe_hits: exactly ONE shuffle (the batch side, to the bucket
    count), SHJ streaming the store scan — never a sort-merge join, never
    a store-side Exchange, at any store size by construction."""
    store = temp_store(spark, "gs_t2_")
    try:
        store.add_postings(docs.where("doc_id % 5 != 4"), bid=0)
        pos = _positional_grams(docs.where("doc_id % 5 = 4"), 4)
        plan = _executed(store.probe_hits(pos, before_batch=1))
        assert "Bucketed: true" in plan
        assert "ShuffledHashJoin" in plan
        assert "SortMergeJoin" not in plan
        assert _n_shuffles(plan) == 1, plan
    finally:
        cleanup_store(store)


def test_purge_compact_equals_rebuild_from_live_docs(spark, docs):
    """Deletion exactness: ingest → purge → compact must equal a store
    REBUILT from only the live docs — grams co-claimed by a live doc
    survive, exclusively-claimed grams vanish, and the increment dedups
    identically through either store (the compact_near_dup_store
    round-trip property, ported to the gram modality)."""
    live_pred = "doc_id % 5 != 4 AND doc_id % 20 != 0"
    store = temp_store(spark, "gs_t3_")
    try:
        store.add_postings(docs.where("doc_id % 5 != 4"), bid=0)
        store.purge(docs.where("doc_id % 20 == 0").select("doc_id"))
        store.compact()
        got = sorted(
            r.gram for r in store.live_grams().collect()
        )  # bounded: distinct grams of the sf0.001 gate corpus
        want = sorted(
            r.gram
            for r in _positional_grams(docs.where(live_pred), 4)
            .select("gram")
            .distinct()
            .collect()
        )  # bounded: same gate-scale gram set
        assert got == want
        # post-compact layout: only the base partition remains
        parts = [
            int(r[0].split("=", 1)[1])
            for r in spark.sql(f"SHOW PARTITIONS {store.name}").collect()
        ]
        assert parts == [COMPACT_PARTITION]
        # and the increment dedups identically through the compacted store
        inc = docs.where("doc_id % 5 = 4")
        via_store = store.ingest_batch(inc, bid=1).drop("kept_text")
        rebuilt = incremental_substring_dedup(
            inc,
            _positional_grams(docs.where(live_pred), 4)
            .select("gram")
            .distinct(),
        ).drop("kept_text")
        assert via_store.exceptAll(rebuilt).count() == 0
        assert rebuilt.exceptAll(via_store).count() == 0
    finally:
        cleanup_store(store)


def test_add_postings_replay_is_idempotent(spark, docs):
    """Dynamic partition overwrite: re-running a batch's claim rewrites
    the same partition with the same rows — the exactly-once half."""
    store = temp_store(spark, "gs_t4_")
    try:
        batch = docs.where("doc_id % 7 = 0")
        store.add_postings(batch, bid=0)
        first = store.postings().count()
        store.add_postings(batch, bid=0)  # replay
        assert store.postings().count() == first
    finally:
        cleanup_store(store)


def test_ingest_replay_reads_pre_batch_store(spark, docs):
    """The round-13 advisor's replay hazard, closed at the metadata level:
    a replayed ingest_batch (own partition ALREADY written by the crashed
    attempt) must produce the identical result — the partition filter
    batch < bid excludes the batch's own claims."""
    store = temp_store(spark, "gs_t5_")
    try:
        store.add_postings(docs.where("doc_id % 5 != 4"), bid=0)
        inc = docs.where("doc_id % 5 = 4")
        first = store.ingest_batch(inc, bid=1).orderBy("doc_id").collect()
        # bounded: one row per gate-corpus increment doc
        replay = store.ingest_batch(inc, bid=1).orderBy("doc_id").collect()
        assert first == replay
        # a doc with removals must exist or the assertion is vacuous
        assert any(r.n_removed > 0 for r in first)
    finally:
        cleanup_store(store)


def test_compact_crash_repair_by_rerun(spark, docs):
    """compact()'s documented idempotence: a crash between the base fold
    and the partition drops leaves batch=-1 ∪ old partitions (duplicated
    postings); RE-RUNNING compact converges to the clean base."""
    store = temp_store(spark, "gs_t6_")
    try:
        store.add_postings(docs.where("doc_id % 5 != 4"), bid=0)
        store.purge(docs.where("doc_id % 20 == 0").select("doc_id"))
        clean = sorted(
            r.gram
            for r in _positional_grams(
                docs.where("doc_id % 5 != 4 AND doc_id % 20 != 0"), 4
            )
            .select("gram")
            .distinct()
            .collect()
        )  # bounded: gate-scale distinct gram set
        # simulate the torn compact: fold into the base partition but
        # "crash" before dropping the old partitions or the tombstones
        base = (
            store.live_postings()
            .select("gram", "doc_id")
            .distinct()
            .withColumn("batch", F.lit(COMPACT_PARTITION).cast("long"))
        )
        store._insert(base)
        parts = [
            int(r[0].split("=", 1)[1])
            for r in spark.sql(f"SHOW PARTITIONS {store.name}").collect()
        ]
        assert sorted(parts) == [COMPACT_PARTITION, 0]  # torn state on disk
        # repair = re-run
        store.compact()
        parts = [
            int(r[0].split("=", 1)[1])
            for r in spark.sql(f"SHOW PARTITIONS {store.name}").collect()
        ]
        assert parts == [COMPACT_PARTITION]
        got = sorted(r.gram for r in store.live_grams().collect())  # bounded
        assert got == clean
        # tombstones drained
        assert store._tombstones() is None
    finally:
        cleanup_store(store)


def test_register_reattaches_existing_store(spark, docs):
    """Cross-session story: a fresh table name over the same path sees
    the same live grams (partition recovery + bucket spec from DDL),
    and its probe still plans the bucketed scan."""
    store = temp_store(spark, "gs_t7_")
    try:
        store.add_postings(docs.where("doc_id % 3 = 0"), bid=0)
        store.add_postings(docs.where("doc_id % 3 = 1"), bid=1)
        n = store.live_grams().count()
        re_store = GramPostingsStore(
            spark, store.name + "_re", store.path, store.n_buckets
        ).register()
        assert re_store.live_grams().count() == n
        plan = _executed(re_store.live_grams())
        assert "Bucketed: true" in plan and _n_shuffles(plan) == 0
        re_store.drop()
    finally:
        cleanup_store(store)


def test_one_file_per_bucket_per_partition(spark, docs):
    """File discipline (verdict #3's small-file concern at the store
    layer): each batch partition holds exactly n_buckets parquet files."""
    store = temp_store(spark, "gs_t8_", n_buckets=4)
    try:
        store.add_postings(docs.where("doc_id % 5 != 4"), bid=0)
        files = [
            f
            for f in os.listdir(os.path.join(store.path, "batch=0"))
            if f.endswith(".parquet")
        ]
        assert len(files) == 4, files
    finally:
        cleanup_store(store)


def test_stats_empty_store_and_double_purge(spark, docs):
    """Round-14 advisor pair: (a) stats() on a FRESH store must report
    non-null zero bigints (F.sum over zero rows is NULL without the
    coalesce); (b) a doc purged in two separate purge() calls appears
    twice in the tombstone dir — the marking join must not fan its
    postings out (verified-live bug: 6 reported vs 4 stored)."""
    store = temp_store(spark, "gs_t9_")
    try:
        row = store.stats().collect()[0]  # bounded: one accounting row
        assert row.asDict() == {
            "n_postings_total": 0,
            "n_postings_live": 0,
            "n_grams_total": 0,
            "n_grams_live": 0,
            "n_docs_live": 0,
            "n_docs_tombstoned": 0,
        }
        store.add_postings(docs.where("doc_id % 5 = 0"), bid=0)
        stored = store.postings().count()
        one = docs.where("doc_id % 25 = 0").select("doc_id")
        store.purge(one)
        store.purge(one)  # second call re-appends the same ids
        row = store.stats().collect()[0]  # bounded: one accounting row
        assert row.n_postings_total == stored
        assert row.n_postings_live == store.live_postings().count()
    finally:
        cleanup_store(store)


def test_tombstone_backlog_shuffle_fallback(spark, docs, monkeypatch):
    """Round-14 verdict #3: past TOMBSTONE_BROADCAST_MAX_BYTES the
    tombstone anti-join must degrade to a SHUFFLE_HASH join (bounded
    memory) instead of broadcasting an arbitrarily large purge list, and
    needs_compact() must report the same condition — with identical
    results through either plan."""
    from dbix_batchchunker_spark.operators import gram_store as gs_mod

    store = temp_store(spark, "gs_t10_")
    try:
        store.add_postings(docs.where("doc_id % 5 != 4"), bid=0)
        store.purge(docs.where("doc_id % 20 == 0").select("doc_id"))
        assert not store.needs_compact()
        via_broadcast = sorted(
            r.gram for r in store.live_grams().collect()
        )  # bounded: gate-scale distinct gram set
        plan = _executed(store.live_grams())
        assert "BroadcastHashJoin" in plan and "LeftAnti" in plan

        # force the backlog over the ceiling: every byte counts as huge
        monkeypatch.setattr(gs_mod, "TOMBSTONE_BROADCAST_MAX_BYTES", 1)
        assert store.needs_compact()
        plan = _executed(store.live_grams())
        assert "ShuffledHashJoin" in plan and "LeftAnti" in plan
        assert "BroadcastHashJoin" not in plan
        got = sorted(
            r.gram for r in store.live_grams().collect()
        )  # bounded: same gate-scale set
        assert got == via_broadcast
        # stats' marking join degrades the same way, same numbers
        row = store.stats().collect()[0]  # bounded: one row
        assert row.n_postings_live == len(
            store.live_postings().collect()
        )  # bounded: gate-scale postings
    finally:
        cleanup_store(store)


def test_compact_lease_refuses_second_writer(spark, docs):
    """Round-14 verdict #8: single-writer compaction is enforced by an
    atomically-created lease file, not docstring discipline — a second
    compact, an ingest, or a purge racing a held lease refuses LOUDLY;
    break_lease()/compact(force=True) is the documented crash repair."""
    from dbix_batchchunker_spark.operators.gram_store import (
        StoreMaintenanceLockError,
    )

    store = temp_store(spark, "gs_t11_")
    try:
        store.add_postings(docs.where("doc_id % 5 != 4"), bid=0)
        # a SECOND handle on the same path (another session/process in
        # production) holds the lease, as a crashed compact would
        other = GramPostingsStore(
            spark, store.name + "_w2", store.path, store.n_buckets
        )
        other._acquire_lease()
        with pytest.raises(StoreMaintenanceLockError):
            store.compact()
        with pytest.raises(StoreMaintenanceLockError):
            store.add_postings(docs.where("doc_id % 5 = 4"), bid=1)
        with pytest.raises(StoreMaintenanceLockError):
            store.purge(docs.limit(1).select("doc_id"))
        # crash repair path 1: break, then compact normally
        store.break_lease()
        store.purge(docs.where("doc_id % 20 == 0").select("doc_id"))
        store.compact()
        assert store._tombstones() is None
        # crash repair path 2: a stale lease + force=True in one call
        other._acquire_lease()
        store.compact(force=True)
        # the lease is released after a successful compact
        fs, jp = store._fs(store.lease_path)
        assert not fs.exists(jp)
    finally:
        cleanup_store(store)


def test_reingest_purged_doc_after_compact(spark):
    """The purge contract's positive half: re-ingesting a purged doc_id
    is unsupported only UNTIL compact() clears the tombstone — afterwards
    the id claims grams again (the docstring states this boundary; the
    lifecycle fuzz never reuses ids, so nothing executed it)."""
    store = temp_store(spark, "gs_t12_")
    one = spark.createDataFrame(
        [(7, "aa bb cc dd ee")], "doc_id long, text string"
    )
    try:
        store.add_postings(one, bid=0)
        store.purge(one.select("doc_id"))
        # before compact: tombstone suppresses even NEW claims under id 7
        store.add_postings(one, bid=1)
        assert store.live_grams().count() == 0
        store.compact()  # physical delete, tombstones cleared
        assert store.live_grams().count() == 0
        store.add_postings(one, bid=2)  # id 7 reingested post-compact
        got = sorted(r.gram for r in store.live_grams().collect())  # bounded
        assert got == ["aa bb cc dd", "bb cc dd ee"]
        row = store.stats().collect()[0]  # bounded: one row
        assert row.n_docs_live == 1 and row.n_docs_tombstoned == 0
    finally:
        cleanup_store(store)


def test_store_lifecycle_through_filesystem_api_uri(spark, docs, tmp_path):
    """The store's scheme-agnostic claim, actually driven: the FULL
    lifecycle (create → ingest → purge → needs_compact → compact → stats
    → re-register) on an EXPLICIT file:// URI, the path shape every
    hdfs:///s3a:// deployment presents. Any maintenance step that fell
    back to driver-local IO (os.listdir/open/shutil) would throw here."""
    path = f"file://{tmp_path}/postings"
    store = GramPostingsStore(spark, "gs_uri_t", path).create()
    try:
        store.add_postings(docs.where("doc_id % 5 != 4"), bid=0)
        store.purge(docs.where("doc_id % 20 == 0").select("doc_id"))
        assert not store.needs_compact()  # FS metadata via the URI
        n_live = store.live_postings().count()
        store.compact()
        assert store._tombstones() is None
        assert store.postings().count() == n_live
        row = store.stats().collect()[0]  # bounded: one accounting row
        assert row.n_postings_live == n_live
        re_store = GramPostingsStore(spark, "gs_uri_t_re", path).register()
        assert re_store.live_postings().count() == n_live
        re_store.drop()
        inc = store.ingest_batch(docs.where("doc_id % 5 = 4"), bid=1)
        assert inc.where("n_removed > 0").count() > 0
    finally:
        store.drop()


GRAM_N = 4


def _gen_onboard_corpus(rng, n_docs: int, allow_chains: bool):
    """Random corpus with CONTROLLED collisions: every doc's own tokens
    carry a doc-unique suffix, so the only cross-doc duplicate content is
    what the generator plants (exact copies and partial copies — a source
    doc embedded in fresh per-doc context). With ``allow_chains`` sources
    may themselves be derived docs (copy-of-a-copy, copy-of-a-partial):
    the removal-chain corpora whose wave-vs-serial behavior the planted
    tx38/tx40 oracle corpus cannot reach (it is chain-free by
    construction — round-14 verdict gap #2). Returns (doc_id -> tokens,
    doc_id -> derivation depth); occasional doc_id gaps exercise the
    empty-chunk path."""
    docs: dict[int, list] = {}
    depth: dict[int, int] = {}
    ids: list[int] = []
    did = 0
    for _ in range(n_docs):
        pool = [
            i
            for i in ids
            if len(docs[i]) >= GRAM_N and (allow_chains or depth[i] == 0)
        ]
        r = rng.random()
        if r < 0.45 or not pool:
            toks = [f"t{k}x{did}" for k in range(rng.randint(0, 10))]
            d = 0
        else:
            src = rng.choice(pool)
            d = depth[src] + 1
            if r < 0.75:
                toks = list(docs[src])  # exact copy
            else:  # partial: source embedded in fresh unique context
                toks = (
                    [f"p{k}x{did}" for k in range(rng.randint(0, 3))]
                    + list(docs[src])
                    + [f"q{k}x{did}" for k in range(rng.randint(0, 3))]
                )
        if rng.random() < 0.15:
            did += rng.randint(1, 12)
        docs[did] = toks
        depth[did] = d
        ids.append(did)
        did += 1
    return docs, depth


def _onboard(spark, docs: dict, mode: str, tag: str, **kw):
    from dbix_batchchunker_spark.operators.gram_store import (
        onboard_corpus_serial,
        onboard_corpus_wave,
    )

    df = spark.createDataFrame(
        sorted((i, " ".join(t)) for i, t in docs.items()),
        "doc_id long, text string",
    ).localCheckpoint(eager=True)
    store = temp_store(spark, f"gs_wf{tag}_", n_buckets=4)
    try:
        fn = (
            onboard_corpus_serial if mode == "serial" else onboard_corpus_wave
        )
        out = fn(df, store, target_chunks=4, n=GRAM_N, **kw)
        return {
            r.doc_id: (r.n_tokens, r.n_removed, r.n_kept, r.kept_text)
            for r in out.collect()  # bounded: one row per fuzz-corpus doc
        }
    finally:
        cleanup_store(store)


@pytest.mark.parametrize("seed", [3, 11])
def test_wave_vs_serial_onboarding_contract(spark, seed):
    """Pin the wave composition's REAL contract against the serial loop
    on randomized corpora (round-14 verdict gap #2 — the adjudicated
    oracle corpus is chain-free by construction, so the chained behavior
    was documented but never executed). What this net established — and
    what it CORRECTED: the round-14 docstring claimed chains only ever
    over-remove ("the conservative direction"); fuzzing found BOTH
    directions (≈560 docs/14 seeds: 10 over-removals, 2 UNDER-removals).
    Mechanism of the under-removal: serial claims derive from each doc's
    kept text AT ITS BATCH TIME — including seam grams created by span
    surgery — and a later doc's removal can depend on a claimant the
    wave composition removes entirely, losing the claim. The pinned
    contract is therefore:

    (a) chain-free corpora (every duplicate's source is an underived
        doc): wave == serial EXACTLY, all columns — the premise tx40's
        closed-form oracle rests on;
    (b) chained corpora: wave is ORDER-INDEPENDENT — identical results
        at max_in_flight 1 and 4 (phase 1 probes a pinned snapshot;
        phase 2 is deterministic), i.e. a well-defined semantics of its
        own, not a race;
    (c) chained corpora: divergence vs serial is CONFINED to docs of
        derivation depth >= 2 — depth-0/1 docs (bases, direct copies and
        direct partials of bases) match serial row-for-row;
    (d) either composition's rows are structurally sound
        (n_removed + n_kept == n_tokens, same doc set);
    (e) reconcile="fixpoint" (the stable chained-corpus contract): equal
        to once/serial on chain-free corpora; on chains its removals are
        a SUPERSET of the once pass's per doc (kept text a subsequence)."""
    import random as _random

    rng = _random.Random(seed)

    # (a) chain-free: exact equality (fixpoint included — a second pass
    # finds nothing to cut when no chain exists)
    docs, _ = _gen_onboard_corpus(rng, 30, allow_chains=False)
    s = _onboard(spark, docs, "serial", f"a{seed}s")
    w = _onboard(spark, docs, "wave", f"a{seed}w")
    wf = _onboard(spark, docs, "wave", f"a{seed}wf", reconcile="fixpoint")
    assert s == w == wf

    # (b)(c)(d)(e) chained
    docs, depth = _gen_onboard_corpus(rng, 35, allow_chains=True)
    s = _onboard(spark, docs, "serial", f"c{seed}s")
    w = _onboard(spark, docs, "wave", f"c{seed}w")
    w1 = _onboard(spark, docs, "wave", f"c{seed}w1", max_in_flight=1)
    wf = _onboard(spark, docs, "wave", f"c{seed}wf", reconcile="fixpoint")
    assert w == w1  # (b) order independence
    assert set(s) == set(w) == set(wf) == set(docs)  # (d) same doc set

    def _subseq(a, b):
        it = iter(b)
        return all(x in it for x in a)

    for i in docs:
        assert s[i][0] == w[i][0] == wf[i][0] == len(docs[i])
        for r in (s[i], w[i], wf[i]):
            assert r[1] + r[2] == r[0]
        if depth[i] <= 1:
            assert s[i] == w[i], (seed, i, depth[i])  # (c)
        # (e) fixpoint only ever removes MORE than the once pass
        assert wf[i][1] >= w[i][1], (seed, i)
        assert _subseq(
            wf[i][3].split() if wf[i][3] else [],
            w[i][3].split() if w[i][3] else [],
        ), (seed, i)


@pytest.mark.parametrize("seed", [13, 47, 88, 101, 222])
def test_randomized_lifecycle_matches_model(spark, seed):
    """Randomized lifecycle fuzz (the round-13 lesson applied to the
    store itself): a seeded sequence of add_postings / purge / compact /
    re-register ops, checked after EVERY op against a pure-Python
    postings model — live_grams must equal { gram : some live doc claims
    it } no matter how the ops interleave. Catches the ordering classes
    the fixed-scenario tests can't reach: purge after compact before the
    next compact, double purge, purge of never-ingested or already-purged
    docs, empty batches, re-registration mid-sequence with tombstones
    outstanding. Round-15 strengthening: after every op, stats()' full
    accounting row is ALSO checked against the model (live AND
    dead-but-stored postings) — the integer surface the round-14 advisor
    caught over-counting under double purge."""
    import random as _random

    rng = _random.Random(seed)
    vocab = ["aa", "bb", "cc", "dd", "ee", "ff"]
    store = temp_store(spark, f"gs_fz{seed}_", n_buckets=4)
    model: dict[int, set] = {}  # doc_id -> claimed gram set (live docs)
    dead: dict[int, set] = {}  # tombstoned docs whose postings still stored
    purged: set = set()  # tombstoned ids: suppress ALL claims til compact
    next_doc, next_bid = 0, 0
    try:
        for _step in range(10):
            op = rng.choice(
                ["add", "add", "purge", "compact", "reregister", "locked"]
            )
            if op == "locked":
                # interleaved-compact refusal (round-14 verdict #8): a
                # foreign writer's lease blocks EVERY mutation loudly and
                # changes nothing; break_lease restores service
                from dbix_batchchunker_spark.operators.gram_store import (
                    StoreMaintenanceLockError,
                )

                holder = GramPostingsStore(
                    spark, store.name + "_h", store.path, store.n_buckets
                )
                holder._acquire_lease()
                one = spark.createDataFrame([(0, "aa bb cc dd")],
                                            "doc_id long, text string")
                with pytest.raises(StoreMaintenanceLockError):
                    store.add_postings(one, bid=next_bid)
                with pytest.raises(StoreMaintenanceLockError):
                    store.purge(one.select("doc_id"))
                with pytest.raises(StoreMaintenanceLockError):
                    store.compact()
                store.break_lease()
            elif op == "add":
                rows, grams = [], {}
                for _ in range(rng.randint(0, 6)):
                    toks = [
                        rng.choice(vocab) for _ in range(rng.randint(0, 7))
                    ]
                    rows.append((next_doc, " ".join(toks)))
                    if toks:  # sub-width docs emit one truncated gram
                        grams[next_doc] = {
                            " ".join(toks[i : i + 4])
                            for i in range(max(len(toks) - 4, 0) + 1)
                        }
                    next_doc += 1
                df = spark.createDataFrame(
                    rows or [(None, None)], "doc_id long, text string"
                )
                if not rows:
                    df = df.where("doc_id is not null")
                store.add_postings(df, bid=next_bid)
                # purge contract: an outstanding tombstone suppresses even
                # later-ingested claims under that id until compact() —
                # the postings are STORED (dead) either way
                for i, g in grams.items():
                    (dead if i in purged else model)[i] = g
                next_bid += 1
            elif op == "purge":
                # mix of live, already-purged, and never-ingested ids
                ids = [
                    rng.randrange(0, max(next_doc, 1) + 3)
                    for _ in range(rng.randint(0, 4))
                ]
                store.purge(
                    spark.createDataFrame(
                        [(i,) for i in ids] or [(None,)], "doc_id long"
                    ).where("doc_id is not null")
                )
                for i in ids:
                    if i in model:
                        dead[i] = model.pop(i)
                purged.update(ids)
            elif op == "compact":
                store.compact()
                purged.clear()
                dead.clear()  # physical deletion
            else:
                store.drop()
                store = GramPostingsStore(
                    spark, store.name, store.path, store.n_buckets
                ).register()
            got = sorted(
                r.gram for r in store.live_grams().collect()
            )  # bounded: tiny-vocab fuzz corpus
            live_grams = set().union(*model.values()) if model else set()
            assert got == sorted(live_grams), (seed, _step, op)
            row = store.stats().collect()[0]  # bounded: one accounting row
            all_grams = live_grams.union(
                *dead.values()
            ) if dead else live_grams
            want_stats = {
                "n_postings_total": sum(len(g) for g in model.values())
                + sum(len(g) for g in dead.values()),
                "n_postings_live": sum(len(g) for g in model.values()),
                "n_grams_total": len(all_grams),
                "n_grams_live": len(live_grams),
                "n_docs_live": len(model),
                "n_docs_tombstoned": len(dead),
            }
            assert row.asDict() == want_stats, (seed, _step, op)
    finally:
        cleanup_store(store)
