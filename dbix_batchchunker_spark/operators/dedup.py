"""Deduplication operators (SURVEY.md §2.C): exact, blocked n-gram Jaccard,
MinHash-LSH, and SimHash — each designed scale-first:

* exact dedup        → one hash-aggregate (groupBy key), no driver state;
* jaccard pairs      → blocked pair join (block keys bound the quadratic
                       blow-up; the unblocked form would be a cross join);
* MinHash-LSH        → explode→agg signature (one shuffle), band-bucket
                       self-join (candidates only), exact-Jaccard verify —
                       the standard shingle→minhash→band→bucket-join pipeline;
* SimHash            → explode→agg 64 bit-sums, constant-width signature.

Everything is deterministic (xxhash64 seeds, no RNG), pure DataFrame ops.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.driver_rows import driver_rows_df
from .registry import ordered_small, query, t

_WS = r"\s+"

# MinHash parameters: 64 hashes = 8 bands × 8 rows. Band-collision
# probability: ~0.99 at Jaccard 0.9, ~0.77 at 0.8, ~3% at 0.5 — an operating
# point for HIGH-similarity dedup, which keeps candidate volume near-linear
# even on a near-duplicate-dense corpus (this testdata has 7% of ALL pairs
# above 0.9, so a low threshold would be inherently quadratic).
MINHASH_HASHES = 64
LSH_BANDS = 8
LSH_ROWS = MINHASH_HASHES // LSH_BANDS
JACCARD_THRESHOLD = 0.9
# Banding for PAIR EMISSION with an exactness contract (dd06): 16 bands × 4
# rows drives the per-pair miss probability at Jaccard 0.9 to (1-0.9^4)^16
# ≈ 4e-8 — measured recall 1.0 vs the exact all-pairs oracle at sf0.001 and
# sf0.01 (deterministic: xxhash64 everywhere). The default 8×8 banding tops
# out at ~98.9% per-pair recall at 0.9 — fine for cluster dedup, not for a
# hash-gated pair listing.
PAIR_BANDS = 16
PAIR_ROWS = MINHASH_HASHES // PAIR_BANDS


def _hashed_words() -> Column:
    """Distinct word set as xxhash64 longs. Jaccard over hashed tokens equals
    Jaccard over the tokens themselves up to hash collisions (~n²/2^64 —
    none in this corpus, verified against the string-set oracle), and long
    arrays make the verify join ~6× cheaper than shuffling string arrays."""
    return F.transform(F.array_distinct(_tokens()), lambda x: F.xxhash64(x))


def _tokens():
    return F.filter(F.split(F.col("text"), _WS), lambda x: x != F.lit(""))


def _spread(df: DataFrame, *cols: str | Column) -> DataFrame:
    """Slim-project then round-robin repartition to shuffle-partition width.

    The documents corpus arrives as ONE parquet split at test scale, so any
    CPU-heavy projection chained onto the scan runs on a single core. A
    repartition of the few slim input columns (cheap Exchange) spreads the
    expensive downstream compute across the cluster. Project-then-spread is
    NOT the measured-bad blanket repartition in registry.py — that one
    exchanged full rows before pruning; this one ships only what the
    downstream expression needs. At real scale (many splits) the Exchange
    is still near-free relative to the compute it parallelizes — and an
    input ALREADY at least width-wide passes through untouched (r18:
    repartition(width) would otherwise CONTRACT a many-split corpus scan
    to the local shuffle width; plan-time metadata check, no job).
    """
    from .registry import scan_width

    width = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    out = df.select(*cols)
    if scan_width(out) >= width:  # file metadata only (r19) — no plan build
        return out
    return out.repartition(width)


def _shingles(n: int = 3) -> Column:
    """Word n-gram shingles as strings (distinct), straight off the text
    column. ONLY for one-shot use: the token expression is re-evaluated
    inside the transform lambda (Spark does no CSE in higher-order-function
    lambdas), so hot paths must materialize a token column first and use
    :func:`_shingles_of`."""
    return _shingles_of(_tokens(), n)


def _shingles_of(toks: Column, n: int) -> Column:
    """Word n-gram shingles from an (ideally already-materialized) token
    array column. Pass a plain column reference — passing an expression
    re-evaluates it per element_at call (measured 20 s vs 0.9 s for the
    sf0.1 corpus build).

    Docs with fewer than n tokens still emit ONE (short) window — sequence()
    bottoms out at [0] — whose out-of-range reads must be try_element_at:
    plain element_at throws INVALID_ARRAY_INDEX_IN_ELEMENT_AT under Spark 4's
    default ANSI mode. concat_ws skips the resulting nulls, so the short doc
    collapses to the same short shingle DuckDB's array_to_string(toks[i:i+n])
    slice produces (dd08's oracle relies on that equivalence)."""
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    return F.array_distinct(
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ",
                *[F.try_element_at(toks, (i + j + 1).cast("int")) for j in range(n)],
            ),
        )
    )


# --------------------------------------------------------------------------- #
# dd01: exact dedup — representative (min doc_id) per identical text          #
# --------------------------------------------------------------------------- #
@query(
    "dd01_exact",
    oracle="""
    SELECT MIN(doc_id) AS doc_id, COUNT(*) AS dup_count
    FROM documents
    GROUP BY text
    """,
)
def dd01_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return docs.groupBy("text").agg(
        F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("dup_count")
    ).select("doc_id", "dup_count")


# --------------------------------------------------------------------------- #
# dd02: exact word-set Jaccard pairs within blocks                            #
# Blocking key (lang, n_chars bucket) bounds the pair space — the exact-      #
# oracle-checkable counterpart of the MinHash pipeline below.                 #
# --------------------------------------------------------------------------- #
@query(
    "dd02_jaccard_pairs",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, lang, n_chars // 100 AS len_bucket,
               list_distinct(list_filter(regexp_split_to_array(text, '{_WS}'),
                             x -> x != '')) AS words
        FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           ROUND(len(list_intersect(a.words, b.words))
                 / (len(a.words) + len(b.words)
                    - len(list_intersect(a.words, b.words))), 6) AS jaccard
    FROM d a JOIN d b
      ON a.lang = b.lang AND a.len_bucket = b.len_bucket AND a.doc_id < b.doc_id
    WHERE len(list_intersect(a.words, b.words))
          / (len(a.words) + len(b.words) - len(list_intersect(a.words, b.words)))
          >= 0.6
    """,
)
def dd02_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = t(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        (F.col("n_chars") / 100).cast("long").alias("len_bucket"),
        _hashed_words().alias("feats"),
    )
    return _blocked_jaccard_pairs(feats, threshold=0.6)


# The blocked-exact operators (dd02/dd08/sim03) are Θ(block²) with
# DATA-DETERMINED block sizes — the deliberate oracle-checkable counterparts
# of the LSH/IVF scale paths. At 100× a hot block would otherwise run the
# quadratic join silently for hours; instead they probe block cardinalities
# up front and abort with a pointer to the registered scale-safe sibling.
# 10k² ≈ 50M in-block pairs is the most a single "exact counterpart" block
# should ever cost; the gate corpora sit orders of magnitude below it.
MAX_BLOCK_SIZE = 10_000


def _require_bounded_blocks(
    df: DataFrame,
    keys: list[str],
    max_block_size: int | None,
    op: str,
    alternative: str,
) -> None:
    """Fail fast when any block exceeds ``max_block_size`` members.

    One cheap probe job before the quadratic join is launched: the count
    needs only the key columns, so Catalyst prunes any expensive feature
    expressions out of the probe's scan (and for persisted inputs the probe
    is what triggers materialization the join would pay anyway). ``None``
    disables the guard. This mirrors the engine's convergence stance —
    never run silently past a known scale cliff; raise with guidance.
    """
    if max_block_size is None:
        return
    # bounded: limit(1) — at most one offending block crosses to the driver
    over = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > max_block_size)
        .orderBy(F.col("n").desc())
        .limit(1)
        .collect()
    )
    if over:
        row = over[0]
        key_desc = ", ".join(f"{k}={row[k]!r}" for k in keys)
        raise ValueError(
            f"{op}: block ({key_desc}) has {row['n']} members, exceeding "
            f"max_block_size={max_block_size}; the blocked-exact quadratic "
            f"path is the oracle-scale counterpart only — at this size use "
            f"{alternative} instead, or raise max_block_size explicitly."
        )


_SALT_R = 8


def _salted_sides(docs: DataFrame):
    """ONE copy of the salted self-join scaffolding (shared by the blocked
    Jaccard family and dd11): left side salted by doc_id%R, right side
    replicated R× — a block's pair space spreads across R tasks with an
    identical result set.

    The left side is additionally SPREAD to the cluster's core count
    (round-18 profiling): the planner builds the replicated right side
    into a broadcast and streams the left, so with a small single-file
    input the whole Θ(block²) enumeration ran in the scan's ONE task —
    the salt split pairs across hash-table probes, not tasks. The
    explicit round-robin repartition is what actually lands the pair
    space on every core (dd02: 6.3 s single-task job → parallel);
    already-wide inputs pass through untouched."""
    from .registry import spread_probe_side

    # pmod, not %: a negative id's % salt is negative, matching NO
    # replicated right-side salt — pairs would vanish silently
    a = spread_probe_side(docs).withColumn(
        "salt", F.pmod(F.col("doc_id"), F.lit(_SALT_R)).cast("int")
    ).alias("a")
    b = docs.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(_SALT_R - 1)))
    ).alias("b")
    return a, b


def _blocked_jaccard_pairs(
    feats_df: DataFrame,
    threshold: float,
    max_block_size: int | None = MAX_BLOCK_SIZE,
) -> DataFrame:
    """Exact Jaccard ≥ threshold over a set-valued `feats` column, pairs
    blocked on (lang, 100-char length bucket) — the oracle-checkable
    counterpart of the LSH pipelines, shared by dd02 (word sets) and dd08
    (3-gram shingle sets). `feats_df`: (doc_id, lang, len_bucket, feats).

    Salting: there are only ~|langs|×|len buckets| distinct block keys, so
    an unsalted self-join computes a whole block's pair space in ONE task.
    Adding doc_id%R to the left key and replicating the right side R times
    splits each block's pairs across R tasks — identical result set.
    """
    _require_bounded_blocks(
        feats_df,
        ["lang", "len_bucket"],
        max_block_size,
        op="blocked_jaccard_pairs",
        alternative="the banded-LSH pair path (dd06_lsh_jaccard_pairs / "
        "near_dup_pairs) or cluster dedup (dd03_minhash_dedup)",
    )
    docs = (
        feats_df
        # Empty feature sets can't reach any positive threshold, and a pair
        # of them would make the Jaccard 0/0 (an error under ANSI mode).
        .where(F.size("feats") > 0)
    )
    a, b = _salted_sides(docs)
    inter = F.size(F.array_intersect(F.col("a.feats"), F.col("b.feats")))
    union = F.size(F.col("a.feats")) + F.size(F.col("b.feats")) - inter
    # Size-ratio prune, exact-preserving: J = |A∩B|/|A∪B| ≤ min(|A|,|B|) /
    # max(|A|,|B|), so J ≥ t forces the smaller set to hold ≥ t of the
    # larger. Two int comparisons per block pair skip the O(|A|+|B|)
    # array intersection for size-mismatched pairs before it is built.
    # (threshold scaled to per-mille ints to keep the predicate integral.)
    sa, sb = F.size(F.col("a.feats")), F.size(F.col("b.feats"))
    prune = F.least(sa, sb) * F.lit(1000) >= F.greatest(sa, sb) * F.lit(
        int(threshold * 1000)
    )
    # Project the Jaccard ONCE, then filter — referencing the expression in
    # both WHERE and SELECT would evaluate the array intersection twice.
    scored = (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.len_bucket") == F.col("b.len_bucket"))
            & (F.col("a.salt") == F.col("b.salt"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & prune,
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            (inter / union).alias("jaccard_raw"),
        )
    )
    return scored.where(F.col("jaccard_raw") >= threshold).select(
        "doc_a", "doc_b", F.round("jaccard_raw", 6).alias("jaccard")
    )


# --------------------------------------------------------------------------- #
# dd08: n-gram (3-gram shingle) Jaccard pairs — order-SENSITIVE near-dup      #
# detection (word-set Jaccard (dd02) is invariant to word order; shingles     #
# catch reorderings and phrase-level edits). Broder mod-p shingle sampling    #
# keeps 1/4 of the shingles (those whose md5 starts with 0-3): Jaccard over   #
# a hash-sampled subset is the standard sketch of full-shingle Jaccard        #
# ("On the resemblance and containment of documents", Broder 1997), and the  #
# sampling predicate — md5 lowercase hex — evaluates identically in Spark    #
# and DuckDB, so the sampled metric itself is oracle-exact. Full shingle     #
# arrays measured 6× the intersection cost for the same pair decisions at    #
# the 0.5 threshold.                                                          #
# --------------------------------------------------------------------------- #
_SHINGLE_KEEP = ("0", "1", "2", "3")  # md5 first nibble → keep 4/16 = 1/4

#: ONE copy of the 3-gram shingle SQL (over a `toks` column) shared by the
#: dd08/dd10 CTEs and dd11's oracle — tokenization/shingling changes reach
#: every oracle or none.
_GRAMS_SQL = (
    "list_distinct(list_transform(range(1, greatest(len(toks) - 2, 1) + 1), "
    "i -> array_to_string(toks[i:i+2], ' ')))"
)


# dd08's oracle, split so dd10 can reuse the identical edge derivation: the
# shingle-feature CTEs and the blocked Jaccard pair-join are shared text —
# byte-identical SQL, so the two oracles cannot drift apart.
_NGRAM_FEATURE_CTES = f"""
    d AS (
        SELECT doc_id, lang, n_chars // 100 AS len_bucket,
               list_filter(regexp_split_to_array(text, '{_WS}'), x -> x != '') AS toks
        FROM documents
    ), s AS (
        SELECT doc_id, lang, len_bucket,
               list_filter(
                   {_GRAMS_SQL},
                   sh -> substr(md5(sh), 1, 1) IN {_SHINGLE_KEEP!r}) AS shingles
        FROM d
    )"""

_NGRAM_PAIR_SELECT = """
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           ROUND(len(list_intersect(a.shingles, b.shingles))
                 / (len(a.shingles) + len(b.shingles)
                    - len(list_intersect(a.shingles, b.shingles))), 6) AS jaccard
    FROM s a JOIN s b
      ON a.lang = b.lang AND a.len_bucket = b.len_bucket AND a.doc_id < b.doc_id
    WHERE len(a.shingles) > 0 AND len(b.shingles) > 0
      AND len(list_intersect(a.shingles, b.shingles))
          / (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles)))
          >= 0.5"""


@query(
    "dd08_ngram_jaccard_pairs",
    oracle=f"""
    WITH {_NGRAM_FEATURE_CTES}
    {_NGRAM_PAIR_SELECT}
    """,
)
def dd08_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Sampled shingles are intersected as xxhash64 longs (same equality-up-
    # to-collisions argument as _hashed_words; verified against the string-
    # set oracle). Trailing windows shorter than n collapse identically on
    # both sides (concat_ws skips nulls / array_to_string on a short slice).
    # The select chain materializes toks → shingles → sampled hashes so each
    # higher-order function consumes a COLUMN, not an expression (no CSE
    # inside HOF lambdas: inlining re-splits the text per window position —
    # measured 20 s vs 0.9 s for this corpus build at sf0.1).
    # The shingle+md5 build is the expensive stage here (unlike dd02's word
    # build) and the corpus arrives as ONE small parquet split, so without a
    # _spread it runs on one core — and it feeds BOTH sides of the block
    # self-join, so it is persisted to run once. (The blanket-repartition
    # negative result in registry.py doesn't apply: this Exchange ships 5k
    # slim rows to parallelize a measured 10 s single-core projection.)
    feats = (
        _spread(
            t(spark, sf_dir, "documents"),
            "doc_id",
            "lang",
            (F.col("n_chars") / 100).cast("long").alias("len_bucket"),
            "text",
        )
        .select(
            "doc_id",
            "lang",
            "len_bucket",
            _tokens().alias("toks"),
        )
        .select(
            "doc_id",
            "lang",
            "len_bucket",
            _shingles_of(F.col("toks"), 3).alias("shingles"),
        )
        .select(
            "doc_id",
            "lang",
            "len_bucket",
            F.transform(
                F.filter(
                    F.col("shingles"),
                    lambda s: F.substring(F.md5(s), 1, 1).isin(*_SHINGLE_KEEP),
                ),
                lambda x: F.xxhash64(x),
            ).alias("feats"),
        )
        .persist()
    )
    # persisted frame outlives this lazy result — enrolled in the shared
    # release registry so library callers (and bench) can drop it
    from ..functions.prefix import register_cache

    register_cache(feats)
    return _blocked_jaccard_pairs(feats, threshold=0.5)


# --------------------------------------------------------------------------- #
# dd03: MinHash-LSH near-dup pairs (the 100 TB path)                          #
# shingle → minhash signature (explode + 64 min-aggs, ONE shuffle) → band     #
# keys → bucket self-join (candidates only) → exact-Jaccard verify.           #
# Non-SQL-expressible at the LSH stage → no oracle (driver does a rows-only   #
# check); tests/test_dedup.py checks recall against dd02's exact pairs.       #
# --------------------------------------------------------------------------- #
def minhash_signatures(
    docs: DataFrame, n_hashes: int = MINHASH_HASHES, shingle_n: int = 1
) -> DataFrame:
    """doc_id → array<long> minhash signature over word n-gram shingles.

    Default shingle_n=1 (word-set granularity) so the LSH candidates
    approximate the same Jaccard metric the verify stage (and dd02) uses;
    raise to 3 for order-sensitive near-dup detection on natural prose.
    """
    shingled = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(_tokens()) if shingle_n == 1 else _shingles(shingle_n)
        ).alias("shingle"),
    )
    return _signatures_from_shingles(shingled, n_hashes)


def _signatures_from_shingles(shingled: DataFrame, n_hashes: int) -> DataFrame:
    """(doc_id, shingle) rows → doc_id + array<long> signature. The shingle
    column may be any hashable type — hashing an already-xxhashed long token
    with a fresh seed is just as valid a minhash family as hashing the
    string, and lets callers tokenize ONCE for signature and verify stages."""
    # parsed expressions (one py4j round-trip each) — the 64-agg block
    # built through the Column API cost ~0.5 s of driver time per build
    aggs = [
        F.expr(f"min(xxhash64(shingle, {h})) AS h{h}")
        for h in range(n_hashes)
    ]
    sig = shingled.groupBy("doc_id").agg(*aggs)
    return sig.select(
        "doc_id",
        F.expr(
            "array(" + ",".join(f"h{h}" for h in range(n_hashes)) + ") AS sig"
        ),
    )


def lsh_candidate_pairs(sig: DataFrame, bands: int = LSH_BANDS, rows: int = LSH_ROWS) -> DataFrame:
    """Band the signatures and self-join on band buckets → candidate pairs."""
    return _candidates_from_entries(_band_entries(sig, bands, rows))


def _candidates_from_entries(band_entries: DataFrame) -> DataFrame:
    """(band, bucket) entry rows → distinct candidate pairs, skew-proof.

    A naive bucket self-join re-emits every pair once per band it collides
    in — on a duplicate-dense corpus that is ~10× the distinct pair count
    (measured sf0.1: 9.3M distinct pairs, ~100M raw join rows). Instead:

    1. aggregate each bucket to its sorted member list and DEDUPE the lists
       across bands (a duplicate cluster lands in the same bucket in nearly
       every band, so this alone cuts emission ~6×: 80k bucket rows → 2.3k
       distinct groups at sf0.1);
    2. emit each group's C(k,2) pairs with a TWO-LEVEL explode and a
       repartition between the levels, so a single 2 000-member bucket
       (4M pairs) spreads across the cluster instead of serializing one
       task — single-level flatten(transform(...)) builds the whole k²/2
       array in one row and was the measured long pole (46 s → 5 s);
    3. the mid-emission repartition hashes on doc_a, NOT round-robin:
       partially-overlapping group variants of the same dup cluster emit the
       same pair once per variant (measured sf0.1: 49M raw rows → 9.6M
       distinct pairs), and hashing by doc_a lands every copy of a pair in
       the SAME partition, so the distinct's map-side partial aggregate
       collapses them before the shuffle (stage measured 6s → 2.2s).
       Skew-safe: one doc_a key carries at most (cluster members × bands)
       rows, and a hot cluster's doc_a values are all distinct, so the
       cluster itself still spreads.

    Member lists are sorted, so doc_a < doc_b by construction; the final
    distinct covers partially-overlapping groups. Every stage is linear in
    its input — the only super-linear term is the candidate pair count
    itself, which is the operator's output bound.
    """
    spark = band_entries.sparkSession
    width = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    groups = (
        band_entries.groupBy("band", "bucket")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("docs"))
        .where(F.size("docs") > 1)
        .select("docs")
        .distinct()
    )
    # round-robin the GROUP rows to the cluster width before the
    # posexplode+slice (r19): the groups exchange is a few hundred KB, so
    # AQE coalesces it to ONE task — and the slice() below EXPANDS those
    # rows into the full O(Σk²/2) "rest" arrays (82 MB at sf0.1, a
    # measured 1.0 s single-task job) before the post-slice repartition
    # can spread anything. Spreading the group rows themselves costs a
    # ~0.4 MB exchange; moving the repartition between posexplode and
    # slice instead (so member rows carry the whole docs array) was
    # measured-and-REJECTED: Σk² of duplicated array bytes through the
    # exchange read dd06 +1.6 s / dd13 +0.35 s.
    halves = (
        groups.repartition(width)
        .select(F.posexplode("docs").alias("i", "doc_a"), "docs")
        .select("doc_a", F.expr("slice(docs, i + 2, size(docs))").alias("rest"))
        .repartition(width, "doc_a")
    )
    return halves.select("doc_a", F.explode("rest").alias("doc_b")).distinct()


def _band_entries(sig: DataFrame, bands: int = LSH_BANDS, rows: int = LSH_ROWS) -> DataFrame:
    """doc_id → (band, bucket) rows: one hashed band key per band."""
    parts = ",".join(
        f"struct({b} AS band, xxhash64("
        + ",".join(f"element_at(sig, {b * rows + r + 1})" for r in range(rows))
        + ") AS bucket)"
        for b in range(bands)
    )
    # one parsed explode expression (py4j round-trip economy, see simhash)
    return sig.select(
        "doc_id", F.expr(f"explode(array({parts}))").alias("bk")
    ).select("doc_id", "bk.band", "bk.bucket")


def near_dup_pairs(
    docs: DataFrame,
    threshold: float = JACCARD_THRESHOLD,
    bands: int = PAIR_BANDS,
    rows: int = PAIR_ROWS,
    cache_tokens: bool = False,
) -> DataFrame:
    """LSH candidates verified with exact word-set Jaccard ≥ threshold.

    Pair emission is inherently O(matches); for cluster-style dedup at scale
    use :func:`dd03_minhash_dedup`'s representative assignment instead.

    Tokenization runs ONCE: the hashed word arrays feed both the minhash
    signatures (hashing a hashed-long token with a fresh seed is an equally
    valid minhash family) and the exact verify join. That frame is consumed
    FIVE times uncached (signature build, the two size-prefilter sides, the
    two verify sides); pass ``cache_tokens=True`` to persist it for the
    duration of the job — worth ~2× on the token build, but the persisted
    frame OUTLIVES the call (nothing here can unpersist after a lazy result
    materializes), so the default keeps library use leak-free and callers
    who opt in own the cleanup (``spark.catalog.clearCache()``). The gated
    dd06 query opts in: it is a run-once-per-session query and bench.py
    clears caches after each timed run.
    """
    words = hashed_words(docs)
    if cache_tokens:
        words = words.persist()
    sig = _signatures_from_shingles(
        words.select("doc_id", F.explode("words").alias("shingle")),
        n_hashes=bands * rows,
    )
    candidates = lsh_candidate_pairs(sig, bands=bands, rows=rows)
    return verify_jaccard_pairs(candidates, words, threshold)


def verify_jaccard_pairs(
    candidates: DataFrame, words: DataFrame, threshold: float
) -> DataFrame:
    """Exact-Jaccard verification of (doc_a, doc_b) candidate pairs against
    a (doc_id, words) frame: size-ratio prefilter (lossless) first, word
    arrays joined only for pairs that can pass. Shared by the batch
    (``near_dup_pairs``) and incremental (``incremental_near_dup_pairs``)
    flows."""
    # Prefilter kept as its own join stage (r19 measured-and-REJECTED
    # fusion): joining the words arrays once and putting the size-ratio
    # conjunct first in one WHERE read as a strict win on paper (two
    # broadcast probes per candidate instead of four) but measured dd06
    # +0.66 s / dd13 +0.20 s — whole-stage codegen's subexpression
    # elimination evaluates the array_intersect EAGERLY ahead of the
    # conjunction, so the 63% of pairs the ratio test kills paid the
    # O(|A|+|B|) intersect anyway. The standalone prefilter keeps the
    # intersect structurally behind the cheap join.
    candidates = _size_ratio_prefilter(
        candidates, words.select("doc_id", F.size("words").alias("n")), threshold
    )
    a = words.alias("wa")
    b = words.alias("wb")
    inter = F.size(F.array_intersect(F.col("wa.words"), F.col("wb.words")))
    union = F.size(F.col("wa.words")) + F.size(F.col("wb.words")) - inter
    jac = inter / union
    return (
        candidates.join(a, candidates.doc_a == F.col("wa.doc_id"))
        .join(b, candidates.doc_b == F.col("wb.doc_id"))
        .where(jac >= threshold)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


def _size_ratio_prefilter(
    candidates: DataFrame, sizes: DataFrame, threshold: float
) -> DataFrame:
    """Losslessly drop candidate pairs that CANNOT reach the Jaccard
    threshold: |A∩B| ≤ min(|A|,|B|) and |A∪B| ≥ max(|A|,|B|), so
    J(A,B) ≤ min/max — a pair whose set-size ratio is below the threshold
    needs no verification. On the dup-dense sf0.1 corpus this kills 63% of
    the 9.6M banded candidates (→ 3.6M) BEFORE the word arrays are joined,
    so the heavy array shuffle and the O(|A|+|B|) intersects only run on
    pairs with a chance of passing (measured: dd06 verify stage ~2×).
    ``sizes`` is (doc_id, n) — 12 bytes a row, broadcast- or
    shuffle-joinable at any scale."""
    return (
        candidates.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")),
            "doc_b",
        )
        .where(F.least("na", "nb") / F.greatest("na", "nb") >= threshold)
        .select("doc_a", "doc_b")
    )


# --------------------------------------------------------------------------- #
# Incremental dedup: a production corpus is not rebuilt per batch — each      #
# ingest increment is deduped against the EXISTING corpus via a persisted     #
# signature store, never re-pairing the corpus against itself.                #
# --------------------------------------------------------------------------- #
def cross_candidates(
    store_entries: DataFrame, new_entries: DataFrame, keys: list[str]
) -> DataFrame:
    """(doc_a=old, doc_b=new) candidate pairs from shared buckets,
    skew-proof — the incremental twin of :func:`_candidates_from_entries`:

    a naive store⋈new bucket join re-emits a pair once per shared bucket
    (≤ bands, or ≤ nprobe² for the IVF path) and funnels a hot bucket's
    |old|×|new| product through one join task. Instead the store side
    collapses to sorted member LISTS, identical lists dedupe across
    buckets BEFORE any pair exists, and the pre-explode repartition on
    doc_b spreads a hot bucket across the cluster — each task explodes
    one (doc_b, members) row bounded by the bucket size. Both ``entries``
    frames carry ``doc_id`` plus the ``keys`` columns."""
    spark = store_entries.sparkSession
    width = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    old_lists = store_entries.groupBy(*keys).agg(
        F.sort_array(F.collect_set("doc_id")).alias("olds")
    )
    joined = (
        new_entries.select(*keys, F.col("doc_id").alias("doc_b"))
        .join(old_lists, keys)
        .select("doc_b", "olds")
        .distinct()
    )
    return (
        joined.repartition(width, "doc_b")
        .select(F.explode("olds").alias("doc_a"), "doc_b")
        .distinct()
    )


def hashed_words(docs: DataFrame) -> DataFrame:
    """(doc_id, words array<long>) — the token frame both the signature and
    verify stages consume. Persist this next to the band-entry store so
    increments can exact-verify against old docs without re-reading text."""
    return _spread(docs, "doc_id", "text").select(
        "doc_id", _hashed_words().alias("words")
    )


def minhash_band_entries(
    words: DataFrame, bands: int = PAIR_BANDS, rows: int = PAIR_ROWS
) -> DataFrame:
    """(doc_id, band, bucket) rows for a (doc_id, words) frame — the
    persistable LSH signature store (bands × 16 bytes per doc). Write it
    partitioned/bucketed by ``bucket`` and each increment's probe join
    prunes to the buckets it actually hits."""
    sig = _signatures_from_shingles(
        words.select("doc_id", F.explode("words").alias("shingle")),
        n_hashes=bands * rows,
    )
    return _band_entries(sig, bands, rows)


def incremental_near_dup_pairs(
    new_words: DataFrame,
    store_entries: DataFrame,
    store_words: DataFrame,
    threshold: float = JACCARD_THRESHOLD,
    bands: int = PAIR_BANDS,
    rows: int = PAIR_ROWS,
) -> DataFrame:
    """Near-dup pairs TOUCHING the increment: (new × new) via banding among
    the new docs plus (new × old) via a band-bucket equi-join against the
    stored entries — the existing corpus is never paired against itself,
    so each ingest costs O(increment + matching buckets), not O(corpus²).

    Equals the full-batch :func:`near_dup_pairs` over old ∪ new restricted
    to pairs with at least one new doc (same hash family ⇒ identical
    signatures ⇒ identical candidate buckets; pinned in
    tests/test_extensions.py). Returns (doc_a, doc_b, jaccard) with doc_b
    always the new doc in cross pairs. After verification, append the
    increment's ``minhash_band_entries``/``hashed_words`` to the store —
    the loop is closed, no global rebuild ever.
    """
    entries_new = minhash_band_entries(new_words, bands, rows)
    within = _candidates_from_entries(entries_new)
    cross = cross_candidates(store_entries, entries_new, ["band", "bucket"])
    words = store_words.unionByName(new_words)
    return verify_jaccard_pairs(within.unionByName(cross), words, threshold)


def compact_near_dup_store(
    store_entries: DataFrame,
    store_words: DataFrame,
    deleted_ids: DataFrame,
) -> tuple[DataFrame, DataFrame]:
    """Store lifecycle (round-7 verdict "Next round #7"): the band/word
    stores only ever GROW under the append-only ingest loop, so deleted
    or filtered-out docs keep matching against every future increment
    until compacted. One anti-join per store frame drops them — the
    signature family is per-doc, so removal is exact (no re-banding, no
    neighbor effects; compaction round-trip pinned identical to a rebuild
    from the surviving docs in tests/test_extensions.py).

    ``deleted_ids``' first column is the doc id. At 100 TB run this as a
    partition-overwrite over the bucket-partitioned store parquet; the
    deleted set is typically small enough to broadcast — hinted here so
    neither store frame shuffles."""
    d = deleted_ids.select(
        F.col(deleted_ids.columns[0]).alias("doc_id")
    ).distinct()
    return (
        store_entries.join(F.broadcast(d), "doc_id", "left_anti"),
        store_words.join(F.broadcast(d), "doc_id", "left_anti"),
    )


# --------------------------------------------------------------------------- #
# dd06: LSH near-dup pairs with an EXACT, UNBLOCKED oracle — the scale path   #
# for pair emission, correctness-gated against the full quadratic ground      #
# truth (which DuckDB computes directly; Spark never materializes it).       #
# NOTE (measured, sf0.1): routing dd02's 0.6-threshold blocked listing       #
# through LSH was 5× SLOWER than its blocked-exact join — at low thresholds  #
# on a dup-dense corpus nearly every pair becomes a candidate, so banding    #
# only pays above ~0.9. That is why dd02 stays exact and dd06 is the LSH     #
# demonstration at the threshold where it wins.                              #
# --------------------------------------------------------------------------- #
@query(
    "dd06_lsh_jaccard_pairs",
    oracle=f"""
    WITH d AS (
        SELECT doc_id,
               list_distinct(list_filter(regexp_split_to_array(text, '{_WS}'),
                             x -> x != '')) AS words
        FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           ROUND(len(list_intersect(a.words, b.words))
                 / (len(a.words) + len(b.words)
                    - len(list_intersect(a.words, b.words))), 6) AS jaccard
    FROM d a JOIN d b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.words, b.words))
          / (len(a.words) + len(b.words) - len(list_intersect(a.words, b.words)))
          >= {JACCARD_THRESHOLD}
    """,
)
def dd06_lsh_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return near_dup_pairs(docs, cache_tokens=True)


@query("dd03_minhash_dedup")  # no oracle: LSH banding isn't SQL-expressible
def dd03_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH duplicate-CLUSTER assignment — the 100 TB shape.

    Docs sharing any LSH band bucket form a duplicate component; each doc is
    assigned the component's min doc_id by iterative min-label propagation
    over the doc↔bucket bipartite graph (converges in O(log diameter)
    rounds, 2 shuffles per round). This needs NO pair join at all —
    O(n·bands) rows per round — versus the O(n²) pair emission a
    near-duplicate-dense corpus forces on any "all pairs above threshold"
    formulation. Representatives are transitively closed: every rep_id is
    itself a cluster root (is_dup = false).
    """
    docs = _spread(t(spark, sf_dir, "documents"), "doc_id", "text")
    # vertex set = docs with ≥1 token — exactly the docs that produce band
    # entries (explode drops empty shingle arrays); see bucket_graph_labels
    ids = (
        t(spark, sf_dir, "documents")
        .where(F.size(_tokens()) > 0)
        .select(F.col("doc_id").alias("id"))
    )
    return bucket_graph_labels(ids, _band_entries(minhash_signatures(docs)))


def bucket_graph_labels(ids: DataFrame, entries: DataFrame) -> DataFrame:
    """Duplicate-cluster labels over the doc↔bucket bipartite graph —
    dd03's closure engine, extracted so dd15 (the closed-form-hash
    adjudicated sibling) runs the SAME production code path, not a copy.

    ``entries`` is (doc_id, band, bucket); ``ids`` is the one-column vertex
    set and must equal the docs that can produce entries (isolated vertices
    label themselves). Returns (doc_id, rep_id, is_dup) ordered by doc_id.
    """
    entries = entries.persist()
    # Closure tiering (same stance as components_from_edges): reduce the
    # bucket graph to its per-bucket star edges (bucket-min → member, doc ≠
    # min — component-preserving, O(n·bands) worst case but only DUP docs
    # ever produce an edge, so the list is sparse at any corpus size) and,
    # under the constant driver ceiling, close with union-find + one
    # broadcast join instead of O(log d) checkpointed propagation rounds.
    # Measured 4.4 s → 2.9 s at sf0.1, identical labels (pinned by the
    # recursive-CTE oracle + the dd09 equality test). Past the ceiling the
    # bipartite propagation below runs unchanged.
    # window-min, not groupBy+self-join (r18): one exchange and one pass
    # over the persisted entries instead of two of each — identical rows
    # (each entry row meets its bucket's minimum either way).
    star = (
        entries.withColumn(
            "bmin", F.min("doc_id").over(Window.partitionBy("band", "bucket"))
        )
        .where(F.col("doc_id") != F.col("bmin"))
        .select(F.col("bmin").alias("src"), F.col("doc_id").alias("dst"))
        .distinct()
    )
    # ONE action is both the gate check and the edge transfer (round-7
    # verdict: the persist→count→collect→checkpoint job chain left the
    # small-graph path stage-launch-bound): limit(gate+1) bounds the driver
    # transfer to the same constant the count used to enforce, and the
    # returned length IS the gate decision.
    epdf = star.limit(SMALL_GRAPH_EDGES + 1).toPandas()
    if len(epdf) <= SMALL_GRAPH_EDGES:
        entries.unpersist()
        # The caller's vertex set comes straight off the parquet scan, so
        # the result's lineage no longer runs through the signature
        # pipeline: no eager checkpoint, no cache outliving the call, and
        # the caller's action recomputes only a pruned doc_id scan plus one
        # broadcast hash join.
        rep = _labels_join(ids, _union_find_labels(epdf))
        return rep.select(
            F.col("id").alias("doc_id"),
            "rep_id",
            (F.col("id") != F.col("rep_id")).alias("is_dup"),
        ).orderBy("doc_id")
    del epdf
    rep = entries.select("doc_id").distinct().select(
        "doc_id", F.col("doc_id").alias("rep_id")
    )
    # Min-label propagation is MONOTONE (labels only decrease), so
    # convergence ⟺ sum(rep_id) unchanged — one partial-aggregatable scan
    # instead of the join+count the first version used. The scan runs every
    # SECOND round: monotonicity makes sum-equality across two rounds imply
    # neither changed anything, so the check stays sound and half the
    # convergence actions disappear (worst case: one extra cheap round).
    prev_sum = None
    max_rounds = 16
    for rnd in range(max_rounds):
        bucket_label = (
            entries.join(rep, "doc_id")
            .groupBy("band", "bucket")
            .agg(F.min("rep_id").alias("bucket_label"))
        )
        rep = (
            entries.join(bucket_label, ["band", "bucket"])
            .groupBy("doc_id")
            .agg(F.min("bucket_label").alias("rep_id"))
            # Truncate lineage each round — otherwise round k re-executes
            # rounds 1..k-1 and the loop goes quadratic in plan depth.
            .localCheckpoint(eager=True)
        )
        if rnd % 2 == 1 or rnd == max_rounds - 1:
            cur_sum = rep.agg(F.sum("rep_id")).first()[0]
            if cur_sum == prev_sum:
                break
            prev_sum = cur_sum
    else:
        # Same stance as components_from_edges: unconverged labels are
        # silently-wrong dedup output, never worth returning.
        entries.unpersist()
        raise RuntimeError(
            f"dd03 label propagation did not converge in {max_rounds} rounds"
        )
    entries.unpersist()
    return rep.select(
        "doc_id", "rep_id", (F.col("doc_id") != F.col("rep_id")).alias("is_dup")
    ).orderBy("doc_id")


# A million (src, dst) long pairs ≈ 16 MB on the driver — a constant,
# corpus-size-independent ceiling for the components fast path.
SMALL_GRAPH_EDGES = 1_000_000


def _union_find_labels(epdf) -> list[tuple[int, int]]:
    """Driver-side union-find over an ALREADY-BOUNDED pandas edge frame
    (src/dst int64 — the caller enforces the SMALL_GRAPH_EDGES gate before
    the Arrow transfer). Path compression + union-by-min, so the root IS
    the component minimum. Returns (vertex, root) for every non-isolated
    vertex; isolated vertices never appear (they label themselves in
    :func:`_labels_join`)."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(epdf["src"].to_numpy(), epdf["dst"].to_numpy()):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra

    return [(int(v), int(find(v))) for v in list(parent)]


def _labels_join(ids: DataFrame, labels: list[tuple[int, int]]) -> DataFrame:
    """Broadcast the non-trivial (id, root) labels back and left-join the
    full vertex set (one ``id`` column): isolated vertices stay their own
    representative. Pure plan — no action, no persisted state."""
    spark = ids.sparkSession
    if labels:
        mdf = driver_rows_df(spark, labels, "id long, rep long")
        out = ids.select("id").join(F.broadcast(mdf), "id", "left")
    else:
        out = ids.select("id", F.lit(None).cast("long").alias("rep"))
    return out.select(
        "id", F.coalesce("rep", F.col("id")).alias("rep_id")
    )


def components_from_edges(
    ids: DataFrame,
    edges: DataFrame,
    max_rounds: int = 64,
    small_graph_edges: int | None = SMALL_GRAPH_EDGES,
) -> DataFrame:
    """Connected components over an explicit edge list by min-label
    propagation: ``ids`` has one ``id`` column (every vertex, including
    isolated ones), ``edges`` has ``src``/``dst`` (undirected; either
    orientation). Returns ``id, rep_id`` where ``rep_id`` is the component's
    minimum id.

    This is the generic sibling of :func:`dd03_minhash_dedup`'s doc↔bucket
    propagation for when the edges are already materialized (e.g. verified
    near-dup pairs). Each round combines neighbor-min (one hop along edges)
    with POINTER JUMPING (``rep(v) ← rep(rep(v))``, an n-row self-join that
    compresses label chains — sequential-id chains converge in O(log
    diameter) rounds; adversarial id layouts degrade toward O(diameter)).
    Labels are MONOTONE non-increasing (every candidate label names a
    vertex of the same component), so sum-equality across consecutive
    rounds is a sound fixed-point test; the loop runs TO THE FIXPOINT — an
    unconverged label frame is silently-wrong dedup output, never worth
    returning, so exhausting ``max_rounds`` re-runs the closure through
    :func:`components_star` (id-layout-independent rounds) instead of
    raising. Edge lists within ``small_graph_edges`` (a constant driver-
    memory bound, None disables) skip the rounds entirely: driver
    union-find + one broadcast join — near-dup graphs at sane thresholds
    are edge-sparse, so this is the common case at every corpus size.
    """
    # Persist the edge list BEFORE symmetrizing: the union's two branches are
    # separate plan subtrees (no cross-branch CSE), so an un-cached edge
    # pipeline — sim07 hands us IVF-candidates + exact-verify — would execute
    # TWICE just to build sym (measured: ~3 s doubled at sf0.1).
    edges = edges.select("src", "dst").persist()
    # Small-graph fast path: when the edge list fits the driver comfortably
    # — SMALL_GRAPH_EDGES pairs ≈ tens of MB via Arrow (~16 B/edge, two
    # int64 columns; collect()'s Row objects would cost 10-30× that), a
    # CONSTANT bound independent of corpus size — a driver union-find
    # replaces O(log d) checkpointed rounds (each 3 joins + 2 actions of
    # pure stage-launch overhead on a near-empty cluster) with one transfer
    # + one broadcast join. limit(gate+1) makes the transfer itself the
    # gate check — one action where persist→count→toPandas was two
    # (round-7 verdict on dd03's job count; same surgery here). Near-dup
    # graphs at sane thresholds are edge-sparse (sf0.1: 391 verified pairs
    # from 2k vectors), so this is the common case at every scale; past
    # the bound the distributed propagation below runs unchanged, where
    # its per-round cost amortizes over real data. Measured when this fast
    # path landed: sim07 12.3 s → 3.2 s at sf0.1 (same labels);
    # BENCH_DETAIL.json is the binding record for current numbers.
    if small_graph_edges is not None:
        epdf = edges.limit(small_graph_edges + 1).toPandas()
        if len(epdf) <= small_graph_edges:
            # the result's lineage is ids + a driver-literal broadcast —
            # independent of the edge cache, so unpersist immediately.
            edges.unpersist()
            return _labels_join(ids, _union_find_labels(epdf))
        del epdf  # over the gate: distributed propagation (edges stay cached)
    sym = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    rep = ids.select("id", F.col("id").alias("rep_id"))

    def hop(r: DataFrame) -> DataFrame:
        """One neighbor-min step: rep(v) ← min(rep(v), min over N(v))."""
        nbr_min = (
            sym.join(r, sym.dst == r.id)
            .groupBy("src")
            .agg(F.min("rep_id").alias("nbr_min"))
        )
        return r.join(nbr_min, r.id == nbr_min.src, "left").select(
            "id",
            F.least(F.col("rep_id"), F.coalesce("nbr_min", "rep_id")).alias("rep_id"),
        )

    def jump(r: DataFrame) -> DataFrame:
        """Pointer compression: rep(v) ← rep(rep(v)) — the looked-up label is
        still a same-component vertex id, so least() keeps the invariant."""
        j = r.select(F.col("id").alias("rid"), F.col("rep_id").alias("rep2"))
        return r.join(j, r.rep_id == j.rid, "left").select(
            "id",
            F.least(F.col("rep_id"), F.coalesce("rep2", "rep_id")).alias("rep_id"),
        )

    prev_sum = None
    try:
        for rnd in range(max_rounds):
            # Two hops + a jump per materialization: per-stage launch
            # overhead (not data) dominates each round at gate scale, so
            # batching steps into one checkpointed plan buys the same label
            # movement with fewer rounds/actions (sim07 converges in 3
            # rounds at sf0.1).
            rep = (
                hop(jump(hop(rep)))
                # Truncate lineage each round (see dd03): otherwise round k
                # re-executes rounds 1..k-1 and plan depth goes quadratic.
                .localCheckpoint(eager=True)
            )
            cur_sum = rep.agg(F.sum("rep_id")).first()[0]
            if cur_sum == prev_sum:
                break
            prev_sum = cur_sum
        else:
            # Propagation moves the minimum O(1) hops per round on
            # adversarial id layouts, so a pathological high-diameter graph
            # can exhaust max_rounds. Unconverged labels are silently-wrong
            # dedup output — instead of a dead end, re-run the closure via
            # components_star (id-layout-independent O(log² n) rounds, same
            # contract, union-find-verified). Its first step eagerly
            # checkpoints the edge set, so the frame returned here survives
            # the unpersist in finally.
            import warnings

            warnings.warn(
                f"components_from_edges hit max_rounds={max_rounds}; "
                "falling back to components_star contraction",
                RuntimeWarning,
                stacklevel=2,
            )
            return components_star(ids, edges)
    finally:
        edges.unpersist()
    return rep


def components_star(
    ids: DataFrame, edges: DataFrame, max_rounds: int = 48
) -> DataFrame:
    """Connected components via alternating large-star / small-star edge
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC'14 — published algorithm, public knowledge). Same
    ``(ids, edges) → (id, rep_id)`` contract as
    :func:`components_from_edges`.

    This is the long-chain-safe sibling: label propagation moves the
    component minimum O(1) hops per round on adversarial id layouts, while
    star contraction rewires whole neighborhoods toward local minima each
    round — O(log² n) rounds guaranteed, O(log n) observed, independent of
    id layout (a 300-vertex shuffled-id path resolves in ~7 iterations —
    pytest). Each iteration is two groupBy+join passes over O(edges) rows;
    every intermediate edge (child, parent) keeps parent < child, and at
    the fixed point the edge set IS the star forest: child → component
    minimum.

    Use :func:`components_from_edges` for shallow near-dup graphs (fewer
    fixed costs per round); use this when component diameter is unknown or
    unbounded.
    """
    # normalize: drop self-loops, orient (child, parent) with parent < child
    E = (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.greatest("src", "dst").alias("child"),
            F.least("src", "dst").alias("parent"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    # Both per-neighborhood minima come from partition WINDOWS, not
    # groupBy+join (r18, guide §2/§3): min(w) over (partition by u) carries
    # the neighborhood minimum onto every edge row in ONE exchange where
    # the agg+self-join form paid an exchange for the agg, another to
    # co-partition the join probe, and a third for an intermediate
    # distinct — 6 exchanges and 2 joins per round down to 3 and 0. The
    # edge SET each round is unchanged: the window sees the same rows the
    # agg grouped, and the trailing distinct folds the duplicates the
    # dropped intermediate distinct used to (min is duplicate-blind, so
    # nothing upstream of the fold can differ).
    w_u = Window.partitionBy("u")
    w_c = Window.partitionBy("child")
    prev_sig = None
    for rnd in range(max_rounds):
        # LARGE-STAR: for each u, connect every strictly-greater neighbor to
        # m(u) = min(N(u) ∪ {u}). Keeps (child > parent) orientation since
        # m(u) <= u < w.
        sym = E.select(
            F.col("child").alias("u"), F.col("parent").alias("w")
        ).union(E.select(F.col("parent").alias("u"), F.col("child").alias("w")))
        large = (
            sym.withColumn("m", F.least(F.min("w").over(w_u), F.col("u")))
            .where(F.col("w") > F.col("u"))
            .select(F.col("w").alias("child"), F.col("m").alias("parent"))
        )
        # SMALL-STAR: for each node, re-point all its parents (and itself)
        # at its minimum parent. Emitted as ONE explode pass (child→m
        # always; parent→m when parent ≠ m) instead of a two-arm union —
        # a union would plan the whole sym→window chain once per arm.
        with_m = large.withColumn("m", F.min("parent").over(w_c))
        small = (
            with_m.select(
                F.explode(
                    F.when(
                        F.col("parent") != F.col("m"),
                        F.array(
                            F.struct(
                                F.col("child").alias("child"),
                                F.col("m").alias("parent"),
                            ),
                            F.struct(
                                F.col("parent").alias("child"),
                                F.col("m").alias("parent"),
                            ),
                        ),
                    ).otherwise(
                        F.array(
                            F.struct(
                                F.col("child").alias("child"),
                                F.col("m").alias("parent"),
                            )
                        )
                    )
                ).alias("e")
            )
            .select("e.child", "e.parent")
            .distinct()
            # materialized by the signature agg below — one job per round
            .localCheckpoint(eager=False)
        )
        E = small
        # fixed point ⟺ the edge multiset is unchanged across one full
        # large+small iteration (order-independent checksum + count).
        # Decimal accumulator: summing 64-bit hashes overflows long under
        # ANSI mode (on by default in Spark 4).
        sig = tuple(
            E.agg(
                F.sum(F.xxhash64("child", "parent").cast("decimal(38,0)")),
                F.count(F.lit(1)),
            ).first()
        )
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(f"components_star did not converge in {max_rounds} rounds")
    return ids.join(E, ids.id == E.child, "left").select(
        "id", F.coalesce("parent", "id").alias("rep_id")
    )


# --------------------------------------------------------------------------- #
# dd09: dd03's duplicate clusters closed via components_star — the driver-    #
# inventory registration of the Kiveris contraction path (pytest already      #
# union-find-verifies it; this exercises it end-to-end in the per-round       #
# driver run). Edges are the per-bucket STAR (bucket-min → member): one       #
# groupBy over the band entries, O(n·bands) edges with NO pair emission, and  #
# star edges preserve the co-membership components exactly. Semantics are     #
# therefore identical to dd03 (pinned in tests/test_extensions.py); only the  #
# closure algorithm differs — contraction rounds independent of id layout,    #
# the variant you reach for when component diameter is unknown.               #
# --------------------------------------------------------------------------- #
@query("dd09_components_star_dedup")  # no oracle: xxhash64 banding isn't
def dd09_components_star_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # SQL-expressible (same stance as dd03); equivalence to dd03's labels and
    # to union-find is pinned in pytest, closure also CTE-checked via dd03's
    # in tests/test_components_oracle.py.
    docs = _spread(t(spark, sf_dir, "documents"), "doc_id", "text")
    entries = _band_entries(minhash_signatures(docs)).persist()
    # window-min star edges (r18): same rewrite as bucket_graph_labels —
    # one exchange/one cache pass instead of a groupBy+self-join.
    edges = (
        entries.withColumn(
            "bmin", F.min("doc_id").over(Window.partitionBy("band", "bucket"))
        )
        .where(F.col("doc_id") != F.col("bmin"))
        .select(F.col("bmin").alias("src"), F.col("doc_id").alias("dst"))
        .distinct()
    )
    # SAME vertex domain as dd03 (entries-derived, not the documents table):
    # a token-less doc produces no shingles, hence no band entries, and is
    # absent from BOTH queries' output — the label-equality pin in pytest
    # depends on the domains matching exactly.
    ids = (
        entries.select(F.col("doc_id").alias("id"))
        .distinct()
        .localCheckpoint(eager=True)  # survives the unpersist below
    )
    rep = components_star(ids, edges)
    entries.unpersist()  # star's first step eagerly checkpointed the edges
    return rep.select(
        F.col("id").alias("doc_id"),
        "rep_id",
        (F.col("id") != F.col("rep_id")).alias("is_dup"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------- #
# dd04: SimHash — 64-bit signature from token-frequency bit votes             #
# --------------------------------------------------------------------------- #
def simhash(docs: DataFrame) -> DataFrame:
    """doc_id → 64-bit simhash (signed long bit pattern).

    Term-frequency weighting comes FREE from summing ±1 per token
    OCCURRENCE: sum over occurrences of ±1 ≡ sum over distinct tokens of
    ±tf. That removes the (doc_id, token) pre-count aggregation the first
    version used — one shuffle instead of two, same bits (verified equal
    at sf0.001/sf0.01)."""
    tok = _spread(docs, "doc_id", "text").select(
        "doc_id", F.explode(_tokens()).alias("token")
    )
    hashed = tok.withColumn("h", F.xxhash64("token"))
    # F.expr strings, not per-bit Column algebra: the 64-vote block built
    # through the Column API cost ~1.5 s of driver time PER BUILD in py4j
    # round-trips alone (r18 measurement: dd04 build 1.52 s, plan 0.06 s);
    # one parsed expression per vote is one round-trip, same operator tree
    votes = [
        F.expr(f"sum(IF((shiftright(h, {b}) & 1) = 1, 1, -1)) AS b{b}")
        for b in range(64)
    ]
    bits = hashed.groupBy("doc_id").agg(*votes)
    sim = F.expr(
        " | ".join(
            f"IF(b{b} > 0, shiftleft(CAST(1 AS BIGINT), {b}), "
            "CAST(0 AS BIGINT))"
            for b in range(64)
        )
    )
    return bits.select("doc_id", sim.alias("simhash"))


@query("dd04_simhash")  # no oracle: bit-vote aggregation isn't SQL-friendly
def dd04_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return simhash(docs).orderBy("doc_id")


# --------------------------------------------------------------------------- #
# dd07: SimHash near-dup PAIRS via banded Hamming lookup — the dedup use of   #
# the dd04 signature. 4 bands × 16 bits: by pigeonhole, a pair differing in   #
# ≤3 bits can disturb at most 3 bands, so it MUST collide on ≥1 exact band —  #
# recall is exactly 1.0 for the ≤3-Hamming contract (not probabilistic like   #
# minhash banding). Verify is XOR+popcount on the bucket-join candidates.     #
# --------------------------------------------------------------------------- #
SIMHASH_BANDS = 4
SIMHASH_BAND_BITS = 64 // SIMHASH_BANDS
SIMHASH_MAX_HAMMING = SIMHASH_BANDS - 1  # the bound banding guarantees


def simhash_near_pairs(
    docs: DataFrame, max_hamming: int = SIMHASH_MAX_HAMMING
) -> DataFrame:
    """Pairs within ``max_hamming`` bits of simhash distance.

    Guaranteed-complete only for max_hamming ≤ SIMHASH_BANDS-1; a larger
    radius would need more/narrower bands (pigeonhole again).

    The 64-bit signature rides along INSIDE the band entries (8 bytes per
    entry), so the bucket self-join verifies Hamming distance in the same
    stage it finds candidates — no join-back to the signature table, and
    the pair `distinct` (a ≤max_hamming pair can collide on up to
    SIMHASH_BANDS bands) shuffles only the few verified survivors instead
    of every candidate. Measured at sf0.1: the old
    candidates→distinct→double-join-back shape moved ~232k rows through
    three extra shuffles to produce the same output."""
    from ..functions.prefix import register_cache

    # Persisted because the band self-join scans it from both sides;
    # registered so callers (bench, pipelines) can release it — the
    # round-8 form leaked this cache for the session's lifetime.
    sh = register_cache(simhash(docs).persist())
    return _banded_hamming_pairs(
        sh, SIMHASH_BANDS, SIMHASH_BAND_BITS, max_hamming
    )


def _banded_hamming_pairs(
    sh: DataFrame, bands: int, band_bits: int, max_hamming: int
) -> DataFrame:
    """Banded Hamming pair emission over a (doc_id, simhash) frame — ONE
    copy of the bucket-join/verify plumbing for dd07 (xxhash signature) and
    dd14 (closed-form signature, where this exact code path is what the
    DuckDB oracle adjudicates). ``sh`` should be persisted by the caller:
    the self-join scans it from both sides."""
    mask = (1 << band_bits) - 1
    parts = ",".join(
        f"struct({b} AS band, "
        f"shiftrightunsigned(simhash, {b * band_bits}) & {mask} AS bucket)"
        for b in range(bands)
    )
    entries = sh.select(
        "doc_id",
        "simhash",
        F.expr(f"explode(array({parts}))").alias("bk"),
    ).select("doc_id", "simhash", "bk.band", "bk.bucket")
    a, b = entries.alias("a"), entries.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
            .cast("long")
            .alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


@query("dd07_simhash_pairs")  # no oracle: banded bit-vote pipeline; recall
def dd07_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # contract (hamming ≤ 3 ⇒ found) is exercised in tests/test_extensions.py
    docs = t(spark, sf_dir, "documents")
    return ordered_small(simhash_near_pairs(docs), "doc_a", "doc_b")


# --------------------------------------------------------------------------- #
# dd05: MLlib MinHashLSH variant (SURVEY.md §2.C's suggested mapping:         #
# HashingTF → MinHashLSH), AND-amplified.                                     #
#                                                                             #
# MLlib's own approxSimilarityJoin amplifies OR-only (every hash table is a   #
# 1-row band), so on a similarity-dense corpus nearly EVERY pair becomes a    #
# candidate — Θ(n²) regardless of threshold (measured: 318 s at 5k docs vs   #
# 10 s for 8-row banding). Round 1 shipped this capped to a 500-doc sample;   #
# now the stock estimator output (64 hash tables, fixed seed) is banded       #
# 16×4 by the same machinery dd06 uses, restoring AND-amplification: the     #
# full table runs uncapped and the result equals the exact all-pairs ground   #
# truth (same oracle as dd06 — two independent signature families, one        #
# exactness contract).                                                        #
# --------------------------------------------------------------------------- #
@query(
    "dd05_mllib_minhash",
    oracle=f"""
    WITH d AS (
        SELECT doc_id,
               list_distinct(list_filter(regexp_split_to_array(text, '{_WS}'),
                             x -> x != '')) AS words
        FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           ROUND(len(list_intersect(a.words, b.words))
                 / (len(a.words) + len(b.words)
                    - len(list_intersect(a.words, b.words))), 6) AS jaccard
    FROM d a JOIN d b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.words, b.words))
          / (len(a.words) + len(b.words) - len(list_intersect(a.words, b.words)))
          >= {JACCARD_THRESHOLD}
    """,
)
def dd05_mllib_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml.feature import HashingTF, MinHashLSH
    from pyspark.ml.functions import vector_to_array

    # Spread the single-split scan before the tokenize (single-core
    # otherwise), build the word set ONCE, and hash it from the materialized
    # column (no CSE inside HOF lambdas — _hashed_words would re-split).
    docs = (
        _spread(t(spark, sf_dir, "documents"), "doc_id", "text")
        .select("doc_id", F.array_distinct(_tokens()).alias("words_str"))
        .select(
            "doc_id",
            "words_str",
            F.transform(F.col("words_str"), lambda x: F.xxhash64(x)).alias("words"),
        )
        .where(F.size("words_str") > 0)
        .persist()
    )
    from ..functions.prefix import register_cache

    register_cache(docs)  # outlives the lazy result; shared release path
    tf = HashingTF(inputCol="words_str", outputCol="features", numFeatures=1 << 18)
    feats = tf.transform(docs.select("doc_id", "words_str"))
    mh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=MINHASH_HASHES, seed=42)
    model = mh.fit(feats)
    # One vector_to_array per exploded hash row — 64 per-row vector_to_array
    # calls on the array<vector> column measured 2× slower than this shape.
    # Band DIRECTLY from the exploded rows (band = pos div rows-per-band) with
    # a single (doc_id, band) aggregate: reassembling full 64-long signatures
    # first (sort_array(collect_list(...)) per doc, then a 16-struct explode
    # with 64 element_at calls) cost ~2× this plan at sf0.1. The bucket is a
    # hash of the pos-ordered in-band hash tuple, so the 16×4 AND-banding
    # contract is unchanged — same-band equality ⇔ same bucket.
    entries = (
        model.transform(feats)
        .select("doc_id", F.posexplode("hashes").alias("pos", "hv"))
        .select(
            "doc_id",
            (F.col("pos") / PAIR_ROWS).cast("int").alias("band"),
            F.struct("pos", vector_to_array("hv")[0].cast("long").alias("h")).alias(
                "ph"
            ),
        )
        .groupBy("doc_id", "band")
        .agg(F.xxhash64(F.sort_array(F.collect_list("ph"))).alias("bucket"))
    )
    cand = _size_ratio_prefilter(
        _candidates_from_entries(entries),
        docs.select("doc_id", F.size("words").alias("n")),
        JACCARD_THRESHOLD,
    )
    w = docs.select("doc_id", "words")
    a, b = w.alias("wa"), w.alias("wb")
    inter = F.size(F.array_intersect(F.col("wa.words"), F.col("wb.words")))
    union = F.size(F.col("wa.words")) + F.size(F.col("wb.words")) - inter
    return (
        cand.join(a, cand.doc_a == F.col("wa.doc_id"))
        .join(b, cand.doc_b == F.col("wb.doc_id"))
        .where(inter / union >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round(inter / union, 6).alias("jaccard"))
    )


# --------------------------------------------------------------------------- #
# dd10: transitive-closure dedup with a DRIVER-RUNNABLE oracle.               #
# --------------------------------------------------------------------------- #
#: The recursive-CTE components oracle, shared VERBATIM by dd10
#: (components_from_edges) and dd12 (components_star): both closure engines
#: are adjudicated against the same independently-derived DuckDB answer.
_COMPONENTS_ORACLE = f"""
    WITH RECURSIVE {_NGRAM_FEATURE_CTES},
    pairs AS ({_NGRAM_PAIR_SELECT}
    ),
    adj AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION
        SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    reach(id, peer) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT r.id, a.dst FROM reach r JOIN adj a ON a.src = r.peer
    )
    SELECT id AS doc_id, MIN(peer) AS rep_id
    FROM reach GROUP BY id ORDER BY doc_id
    """


@query("dd10_jaccard_components", oracle=_COMPONENTS_ORACLE)
def dd10_jaccard_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters: dd08's n-gram Jaccard pairs closed into connected
    components by :func:`components_from_edges`.

    This is the oracle-adjudicable form of the transitive-closure dedup
    machinery (round-6 verdict #8): dd03/dd09/sim07's closures are checked
    by a recursive-CTE oracle only in pytest because their xxhash64/IVF
    candidate generation isn't SQL-expressible — here the edge set IS
    SQL-expressible (it shares dd08's oracle text verbatim), so DuckDB
    independently derives the full closure and the driver gate can
    hash-compare every (doc, component-min) label the iterative
    propagation/union-find path produces. Reference parity: the dedup
    posture of SURVEY.md §2.C with the reference's own
    every-operator-oracle-checked bar (BatchChunker t/ suite idiom).

    Scale shape: edges are verified near-dup pairs — sparse at any corpus
    size — so the closure inherits components_from_edges' tiering (driver
    union-find under the constant 1M-edge Arrow gate, checkpointed
    label propagation past it). Nothing here is quadratic beyond dd08's
    own guarded block join.
    """
    pairs = dd08_ngram_jaccard_pairs(spark, sf_dir)
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    ids = t(spark, sf_dir, "documents").select(F.col("doc_id").alias("id"))
    return (
        components_from_edges(ids, edges)
        .select(F.col("id").alias("doc_id"), "rep_id")
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------- #
# dd11: shingle CONTAINMENT pairs — the asymmetric metric Jaccard misses.     #
#                                                                             #
# Broder's containment C(A→B) = |A∩B|/|A| ("On the resemblance and           #
# containment of documents", 1997): a short document quoted or pasted into   #
# a longer one has HIGH containment but LOW Jaccard (the union is dominated  #
# by the longer doc), so Jaccard dedup keeps both copies. Corpus builds     #
# drop the CONTAINED doc. Directed pairs on purpose; blocked on lang only   #
# — a length bucket would break the very asymmetry the metric exists for —  #
# with the family's fail-fast block guard; at 100 TB the scale path is      #
# banding on the SMALLER side's minhash (containment sketches), same        #
# S-curve story as dd03.                                                     #
# --------------------------------------------------------------------------- #
_CONTAIN_THRESHOLD = 0.8


@query(
    "dd11_containment_pairs",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, lang,
               list_filter(regexp_split_to_array(text, '{_WS}'), x -> x != '') AS toks
        FROM documents
    ), s AS (
        SELECT doc_id, lang, {_GRAMS_SQL} AS grams
        FROM d
    )
    SELECT a.doc_id AS doc_sub, b.doc_id AS doc_sup,
           ROUND(len(list_intersect(a.grams, b.grams)) / len(a.grams), 6)
               AS containment
    FROM s a JOIN s b ON a.lang = b.lang AND a.doc_id != b.doc_id
    WHERE len(list_intersect(a.grams, b.grams))
          >= {_CONTAIN_THRESHOLD} * len(a.grams)
    ORDER BY doc_sub, doc_sup
    """,
)
def dd11_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = (
        _spread(t(spark, sf_dir, "documents"), "doc_id", "lang", "text")
        # NULL text: the oracle's toks is NULL (row drops in the WHERE);
        # Spark's shingle chain would fabricate [''] instead — filter to
        # match (dd02 gets this for free via NULL feats)
        .where(F.col("text").isNotNull())
        .select("doc_id", "lang", _tokens().alias("toks"))
        .select("doc_id", "lang", _shingles_of(F.col("toks"), 3).alias("grams"))
        # xxhash64 longs for the intersect, same equality-up-to-collisions
        # argument as _hashed_words (verified against the string-set oracle)
        .select(
            "doc_id",
            "lang",
            F.transform(F.col("grams"), lambda x: F.xxhash64(x)).alias("feats"),
        )
        .persist()
    )
    from ..functions.prefix import register_cache

    register_cache(feats)  # outlives the lazy result; shared release path
    _require_bounded_blocks(
        feats,
        ["lang"],
        MAX_BLOCK_SIZE,
        op="containment_pairs",
        alternative="minhash-containment banding on the smaller side "
        "(compose dd03's band machinery over the sub-side signature)",
    )
    a, b = _salted_sides(feats)
    inter = F.size(F.array_intersect(F.col("a.feats"), F.col("b.feats")))
    # size prune, exact-preserving: |A∩B| ≤ |B|, so C(A→B) ≥ t forces
    # |B| ≥ t·|A| — skip the intersect for pairs that cannot pass
    thr_pm = int(_CONTAIN_THRESHOLD * 1000)
    # project the intersection ONCE, then filter (the family rule —
    # referencing it in both WHERE and SELECT evaluates it twice)
    scored = a.join(
        b,
        (F.col("a.lang") == F.col("b.lang"))
        & (F.col("a.salt") == F.col("b.salt"))
        & (F.col("a.doc_id") != F.col("b.doc_id"))
        & (F.size(F.col("b.feats")) * 1000 >= thr_pm * F.size(F.col("a.feats"))),
    ).select(
        F.col("a.doc_id").alias("doc_sub"),
        F.col("b.doc_id").alias("doc_sup"),
        inter.alias("inter"),
        F.size(F.col("a.feats")).alias("sub_size"),
    )
    return (
        scored.where(F.col("inter") * 1000 >= thr_pm * F.col("sub_size"))
        .select(
            "doc_sub",
            "doc_sup",
            F.round(F.col("inter") / F.col("sub_size"), 6).alias("containment"),
        )
        .transform(lambda df: ordered_small(df, "doc_sub", "doc_sup"))
    )

# --------------------------------------------------------------------------- #
# dd12: components_star under the recursive-CTE components oracle.             #
#                                                                             #
# Round-9 verdict #3: the Kiveris star-contraction closure (components_star,  #
# dd09's engine) had only pytest pins — its driver-adjudicated sibling dd10   #
# runs components_from_edges. This registers the CONTRACTION path over the    #
# same SQL-expressible edge set (dd08's n-gram Jaccard pairs), so DuckDB's    #
# independent recursive-CTE closure hash-adjudicates every (doc,              #
# component-min) label the large-star/small-star iteration produces. dd10     #
# and dd12 share ONE oracle constant (_COMPONENTS_ORACLE, defined above       #
# dd10) — byte-identical SQL, so the two closure engines are graded against  #
# the same independent answer and any divergence between them is a driver-   #
# visible hash mismatch, not just a pytest failure. Scale shape: identical   #
# to dd09's (O(edges) per round, O(log n) rounds, no pair emission beyond    #
# dd08's own guarded block join).                                             #
# --------------------------------------------------------------------------- #
@query("dd12_star_components", oracle=_COMPONENTS_ORACLE)
def dd12_star_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dd10's edge set closed by :func:`components_star` instead of
    :func:`components_from_edges` — the adjudicated registration of the
    star-contraction closure. Output contract identical to dd10
    (doc_id, rep_id = component minimum over the dd08 near-dup graph)."""
    pairs = dd08_ngram_jaccard_pairs(spark, sf_dir)
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    ids = t(spark, sf_dir, "documents").select(F.col("doc_id").alias("id"))
    return (
        components_star(ids, edges)
        .select(F.col("id").alias("doc_id"), "rep_id")
        .orderBy("doc_id")
    )

# --------------------------------------------------------------------------- #
# dd13: the minhash→band→bucket-join→verify pipeline with a CLOSED-FORM hash  #
# family, DuckDB-adjudicated END TO END.                                      #
#                                                                             #
# dd03/dd06's banding rests on xxhash64, which no oracle can restate — their  #
# recall is pinned in pytest and dd06's oracle bypasses the banding with an   #
# all-pairs join. Swapping the hash family for one both engines compute       #
# exactly (polynomial codepoint fold mod 1e9+7 — tx08's proven primitive —    #
# plus affine rehashes (Aj·h+Bj) mod p with baked constants) makes EVERY      #
# stage SQL-statable: DuckDB independently derives signatures, band buckets,  #
# candidate pairs, and the exact-Jaccard verify, so the driver gate hash-     #
# adjudicates the banding machinery itself (round-9 verdict #3). The Spark    #
# side deliberately reuses the production plumbing — _candidates_from_entries #
# for skew-proof pair emission and verify_jaccard_pairs for the exact check — #
# so the adjudication covers the same code dd06 runs, not a parallel toy.     #
#                                                                             #
# Banding operating point: 4 bands × 4 rows (16 hashes) — per-pair capture    #
# 1-(1-J⁴)⁴ ≈ 98.6% at J=0.9. The ~1.4% of true pairs the banding misses are  #
# missed IDENTICALLY by both engines (same hashes), so the comparison stays   #
# exact; dd06 (16×4 xxhash banding) remains the exhaustive-recall sibling.    #
# All arithmetic stays in BIGINT: h<p and Aj<p bound Aj·h+Bj < ~1.1e18 and    #
# the 131-multiplier bucket fold < 1.4e11 — no overflow on either engine.     #
# --------------------------------------------------------------------------- #
_SQLMH_MOD = 1_000_000_007
_SQLMH_HASHES = 16
_SQLMH_BANDS = 4
_SQLMH_ROWS = 4


def _affine_consts(n: int) -> tuple[list[int], list[int]]:
    """The (A_j, B_j) affine rehash constants, deterministic and baked into
    BOTH dialects — ONE generator shared by the minhash (16) and simhash
    (60) closed-form families so the two can never desynchronize."""
    a = [(j * 2654435761 + 1) % _SQLMH_MOD for j in range(n)]
    b = [(j * 40503 + 12345) % _SQLMH_MOD for j in range(n)]
    assert all(x != 0 for x in a)
    return a, b


_SQLMH_A, _SQLMH_B = _affine_consts(_SQLMH_HASHES)

_SQLMH_WORD_SQL = (
    "list_distinct(list_transform("
    f"list_filter(regexp_split_to_array(text, '{_WS}'), x -> x != ''), "
    "w -> list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(regexp_extract_all(w, '[\\s\\S]'), "
    "c -> CAST(unicode(c) AS BIGINT))), "
    f"(a, b) -> (a * 31 + b) % {_SQLMH_MOD})))"
)

# the DuckDB band-bucket fold; must mirror the Spark fold op-for-op (the
# leading (0*131+h1)%p step collapses to h1 since h1 < p)
_SQLMH_BUCKET_SQL = (
    f"(((((s[4*b + 1] * 131 + s[4*b + 2]) % {_SQLMH_MOD}) * 131 + s[4*b + 3])"
    f" % {_SQLMH_MOD}) * 131 + s[4*b + 4]) % {_SQLMH_MOD}"
)


def _sqlmh_fold(w: Column) -> Column:
    """The closed-form token hash both SQL-statable dedup siblings share:
    polynomial codepoint fold ``(acc*31 + code) % 1e9+7`` — op-for-op the
    DuckDB ``list_reduce`` in the dd13/dd14 oracles."""
    codes = F.transform(
        F.regexp_extract_all(w, F.lit(r"[\s\S]"), F.lit(0)),
        lambda c: F.ascii(c).cast("long"),
    )
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + c) % _SQLMH_MOD,
    )


def _sqlmh_word_hashes(docs: DataFrame) -> DataFrame:
    """(doc_id, words: array<long>) — distinct tokens under the closed-form
    polynomial fold. The select chain materializes toks first so the nested
    higher-order functions consume a COLUMN (no CSE inside HOF lambdas)."""

    return (
        _spread(docs, "doc_id", "text")
        .select("doc_id", F.array_distinct(_tokens()).alias("toks"))
        .select(
            "doc_id",
            F.array_distinct(
                F.transform(F.col("toks"), _sqlmh_fold)
            ).alias("words"),
        )
    )


def _sqlmh_band_entries(words: DataFrame) -> DataFrame:
    """words → 16 affine-rehash minhash aggs → (doc_id, band, bucket) rows,
    the _band_entries shape with the closed-form bucket fold."""
    shingled = words.select("doc_id", F.explode("words").alias("h"))
    # parsed expressions - one py4j round-trip per agg/band instead of ~8
    # (the dd04 r18 rationale); same operator tree, oracle-adjudicated
    sig = shingled.groupBy("doc_id").agg(
        *[
            F.expr(
                f"min(({_SQLMH_A[j]} * h + {_SQLMH_B[j]}) % {_SQLMH_MOD}) "
                f"AS h{j}"
            )
            for j in range(_SQLMH_HASHES)
        ]
    )

    def bucket_sql(b: int) -> str:
        acc = "CAST(0 AS BIGINT)"
        for r in range(_SQLMH_ROWS):
            acc = (
                f"((({acc}) * 131 + h{b * _SQLMH_ROWS + r}) % {_SQLMH_MOD})"
            )
        return acc

    parts = ",".join(
        f"struct({b} AS band, {bucket_sql(b)} AS bucket)"
        for b in range(_SQLMH_BANDS)
    )
    return sig.select(
        "doc_id", F.expr(f"explode(array({parts}))").alias("bk")
    ).select("doc_id", "bk.band", "bk.bucket")


#: The CTE chain deriving the closed-form band buckets (w → g → pj → sigl
#: → bnd), shared VERBATIM by dd13 (banded pair listing) and dd15
#: (component labels over the bucket graph) so both adjudications rest on
#: one independently-derived bucket table.
_SQLMH_BAND_CTES = f"""w AS (
        SELECT doc_id, {_SQLMH_WORD_SQL} AS words FROM documents
    ),
    g AS (SELECT doc_id, unnest(words) AS h FROM w),
    pj AS (
        SELECT g.doc_id, r.j,
               MIN(({_SQLMH_A!r}[CAST(r.j AS INT) + 1] * g.h
                    + {_SQLMH_B!r}[CAST(r.j AS INT) + 1]) % {_SQLMH_MOD}) AS mh
        FROM g CROSS JOIN range({_SQLMH_HASHES}) r(j)
        GROUP BY g.doc_id, r.j
    ),
    sigl AS (SELECT doc_id, list(mh ORDER BY j) AS s FROM pj GROUP BY doc_id),
    bnd AS (
        SELECT doc_id, CAST(r.b AS INT) AS b, {_SQLMH_BUCKET_SQL} AS bucket
        FROM sigl CROSS JOIN range({_SQLMH_BANDS}) r(b)
    )"""


@query(
    "dd13_sql_minhash_bands",
    oracle=f"""
    WITH {_SQLMH_BAND_CTES},
    cand AS (
        SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        FROM bnd x JOIN bnd y
          ON x.b = y.b AND x.bucket = y.bucket AND x.doc_id < y.doc_id
    )
    SELECT c.doc_a, c.doc_b,
           ROUND(len(list_intersect(wa.words, wb.words))
                 / (len(wa.words) + len(wb.words)
                    - len(list_intersect(wa.words, wb.words))), 6) AS jaccard
    FROM cand c
    JOIN w wa ON wa.doc_id = c.doc_a
    JOIN w wb ON wb.doc_id = c.doc_b
    WHERE len(list_intersect(wa.words, wb.words))
          / (len(wa.words) + len(wb.words)
             - len(list_intersect(wa.words, wb.words))) >= {JACCARD_THRESHOLD}
    """,
)
def dd13_sql_minhash_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    words = _sqlmh_word_hashes(t(spark, sf_dir, "documents")).persist()
    from ..functions.prefix import register_cache

    register_cache(words)  # outlives the lazy result; shared release path
    candidates = _candidates_from_entries(_sqlmh_band_entries(words))
    return verify_jaccard_pairs(candidates, words, JACCARD_THRESHOLD)


# --------------------------------------------------------------------------- #
# dd15: dd03's FULL composition — minhash → bands → bucket graph → closure —  #
# under a DuckDB oracle. The round-9 verdict asked for "a components oracle   #
# on dd03's edge set"; dd03's own xxhash64 banding can't be restated in SQL,  #
# so this runs dd03's EXACT engine (bucket_graph_labels — the tiered          #
# union-find / min-label-propagation closure over the doc↔bucket bipartite    #
# graph, NO pair verify, extracted from dd03 so the code path is shared, not  #
# copied) over dd13's closed-form band entries. DuckDB independently derives  #
# the same buckets (shared _SQLMH_BAND_CTES), expands bucket co-membership    #
# into edges, and closes them with the recursive-CTE components pattern       #
# (dd10's form) — so a green row hash-adjudicates dd03's banding→closure      #
# composition end to end, the last piece of the minhash family that only had  #
# pytest pins. The oracle's all-pairs bucket expansion is oracle-side only;   #
# the Spark engine never emits pairs (bucket-min star edges, O(n·bands)).     #
# Vertex set: docs with ≥1 token — exactly the docs that can produce band     #
# entries on both engines (NULL/empty text drops from w via len(words) > 0).  #
# --------------------------------------------------------------------------- #
@query(
    "dd15_sql_minhash_components",
    oracle=f"""
    WITH RECURSIVE {_SQLMH_BAND_CTES},
    pairs AS (
        SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        FROM bnd x JOIN bnd y
          ON x.b = y.b AND x.bucket = y.bucket AND x.doc_id < y.doc_id
    ),
    adj AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION
        SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    reach(id, peer) AS (
        SELECT doc_id, doc_id FROM w WHERE len(words) > 0
        UNION
        SELECT r.id, a.dst FROM reach r JOIN adj a ON a.src = r.peer
    )
    SELECT id AS doc_id, MIN(peer) AS rep_id, id <> MIN(peer) AS is_dup
    FROM reach GROUP BY id ORDER BY doc_id
    """,
)
def dd15_sql_minhash_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    # raw-scan vertex set, same stance as dd03: a filter+project needs no
    # _spread Exchange, and keeping it off the signature lineage lets the
    # small-graph fast path return a plan that rescans only doc_id/text
    ids = docs.where(F.size(_tokens()) > 0).select(F.col("doc_id").alias("id"))
    return bucket_graph_labels(ids, _sqlmh_band_entries(_sqlmh_word_hashes(docs)))


# --------------------------------------------------------------------------- #
# dd14: SQL-statable SimHash banding — dd13's closure for the OTHER near-dup  #
# sketch family. dd04/dd07 are rows-only because xxhash64 has no DuckDB       #
# counterpart; swapping in the shared closed-form token fold (_sqlmh_fold)    #
# plus bit-sliced affine rehashes (3 rehashes × 20 low bits — classic        #
# SimHash bit-slices one hash per token; 60 independent modmuls per           #
# occurrence was the suite's widest expression block, trimmed round 11)       #
# makes the ENTIRE pipeline — tf-weighted ±1 bit votes, signature packing,    #
# banded bucket join, XOR/popcount verify — derivable by DuckDB, so the       #
# driver gate adjudicates the same _banded_hamming_pairs plumbing dd07        #
# runs, not a parallel toy.                                                   #
#                                                                             #
# 60 bits (not 64): bit 63 is the BIGINT sign bit, and the engines disagree   #
# on signed-shift edge semantics — 4 bands × 15 bits sidesteps the hazard     #
# entirely while keeping 32k buckets/band (bucket population n/32768, so the  #
# bucket self-join stays linear-ish at gate scales; production recall work    #
# belongs to dd07's 64-bit/16-bit-band form). Pigeonhole contract is dd07's:  #
# Hamming ≤ bands-1 ⇒ at least one band collides ⇒ recall 1.0 at the radius. #
# All arithmetic is BIGINT-exact on both engines: A·h+B < ~1.1e18, votes are  #
# small ints, signature < 2^60.                                               #
# --------------------------------------------------------------------------- #
_SQLSH_BITS = 60
_SQLSH_BANDS = 4
_SQLSH_BAND_BITS = _SQLSH_BITS // _SQLSH_BANDS
#: Bit source: _SQLSH_REHASHES affine rehashes of the token fold, sliced
#: _SQLSH_SLICE_BITS low bits each (bit b ← bit (b mod 20) of rehash
#: b div 20). Low 20 bits of a value uniform mod 1e9+7 (≈0.93·2^30) are
#: effectively unbiased — only bit 29 carries visible bias, and the slice
#: stays well under it.
_SQLSH_REHASHES = 3
_SQLSH_SLICE_BITS = _SQLSH_BITS // _SQLSH_REHASHES
_SQLSH_A, _SQLSH_B = _affine_consts(_SQLSH_REHASHES)


def sql_simhash(docs: DataFrame) -> DataFrame:
    """doc_id → 60-bit closed-form simhash. Same vote algebra as
    :func:`simhash` (±1 per token OCCURRENCE ≡ ±tf per distinct token);
    only the bit source differs: low bits of affine rehashes of the
    polynomial fold instead of xxhash64 bit extraction."""
    tok = _spread(docs, "doc_id", "text").select(
        "doc_id", F.explode(_tokens()).alias("w")
    )
    hashed = tok.select("doc_id", _sqlmh_fold(F.col("w")).alias("h"))
    # Bit-slicing, not one-affine-map-per-bit (round-10 verdict #5): classic
    # SimHash takes all its bit dimensions from ONE hash of the token, so
    # the 60 bits come from _SQLSH_REHASHES affine rehashes of the fold —
    # _SQLSH_SLICE_BITS low bits each — instead of 60 independent modmuls
    # per occurrence. 3 modmuls + 60 shift/ands ≈ 20× less modular
    # arithmetic in the widest expression block in the suite. (The tf
    # pre-aggregation variant was measured FIRST and rejected: ±tf per
    # distinct (doc, h) saves little on short mostly-distinct docs and its
    # extra shuffle cost 3.0 → 3.5 s.)
    rehashed = hashed.select(
        "doc_id",
        *[
            (
                (F.lit(_SQLSH_A[k]) * F.col("h") + F.lit(_SQLSH_B[k]))
                % F.lit(_SQLMH_MOD)
            ).alias(f"g{k}")
            for k in range(_SQLSH_REHASHES)
        ],
    )
    # Plain bit sums, not ±1 CASE branches: vote_b > 0 ⟺ 2·Σbit_b > n, so
    # summing the sliced bit directly (plus one shared count) drops 60
    # conditionals from the aggregate while the oracle's ±1 statement stays
    # equivalent integer-for-integer.
    # parsed expressions, not per-bit Column algebra (the dd04 r18
    # rationale: one py4j round-trip per vote instead of ~6)
    votes = [
        F.expr(
            f"sum(shiftright(g{b // _SQLSH_SLICE_BITS}, "
            f"{b % _SQLSH_SLICE_BITS}) & 1) AS v{b}"
        )
        for b in range(_SQLSH_BITS)
    ]
    bits = rehashed.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"), *votes
    )
    sig = F.expr(
        " | ".join(
            f"IF(v{b} * 2 > n, shiftleft(CAST(1 AS BIGINT), {b}), "
            "CAST(0 AS BIGINT))"
            for b in range(_SQLSH_BITS)
        )
    )
    return bits.select("doc_id", sig.alias("simhash"))


@query(
    "dd14_sql_simhash_pairs",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id,
               unnest(list_filter(regexp_split_to_array(text, '{_WS}'),
                      x -> x != '')) AS w
        FROM documents
    ),
    h AS (
        SELECT doc_id,
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                   list_transform(regexp_extract_all(w, '[\\s\\S]'),
                                  c -> CAST(unicode(c) AS BIGINT))),
                   (a, b) -> (a * 31 + b) % {_SQLMH_MOD}) AS h
        FROM tok
    ),
    bits AS (
        SELECT doc_id, CAST(r.b AS INT) AS b,
               SUM(CASE WHEN ((({_SQLSH_A!r}[CAST(r.b AS INT) // {_SQLSH_SLICE_BITS} + 1] * h
                               + {_SQLSH_B!r}[CAST(r.b AS INT) // {_SQLSH_SLICE_BITS} + 1])
                              % {_SQLMH_MOD})
                              >> (CAST(r.b AS INT) % {_SQLSH_SLICE_BITS})) & 1 = 1
                        THEN 1 ELSE -1 END) AS vote
        FROM h CROSS JOIN range({_SQLSH_BITS}) r(b)
        GROUP BY doc_id, r.b
    ),
    sig AS (
        SELECT doc_id,
               CAST(SUM(CASE WHEN vote > 0
                             THEN (CAST(1 AS BIGINT) << b)
                             ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS simhash
        FROM bits GROUP BY doc_id
    ),
    bnd AS (
        SELECT doc_id, simhash, CAST(r.k AS INT) AS band,
               (simhash >> ({_SQLSH_BAND_BITS} * CAST(r.k AS INT)))
               & {(1 << _SQLSH_BAND_BITS) - 1} AS bucket
        FROM sig CROSS JOIN range({_SQLSH_BANDS}) r(k)
    ),
    cand AS (
        SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
               x.simhash AS sa, y.simhash AS sb
        FROM bnd x JOIN bnd y
          ON x.band = y.band AND x.bucket = y.bucket
         AND x.doc_id < y.doc_id
    )
    SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
    FROM cand
    WHERE bit_count(xor(sa, sb)) <= {SIMHASH_MAX_HAMMING}
    ORDER BY doc_a, doc_b
    """,
)
def dd14_sql_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.prefix import register_cache

    sh = register_cache(sql_simhash(t(spark, sf_dir, "documents")).persist())
    return ordered_small(
        _banded_hamming_pairs(
            sh, _SQLSH_BANDS, _SQLSH_BAND_BITS, SIMHASH_MAX_HAMMING
        ),
        "doc_a",
        "doc_b",
    )
