"""Mixture sampling — the corpus-composition knob of a pretraining run
(SURVEY.md §2.C posture; no reference analog: DBIx-BatchChunker processes
every row, this chooses WHICH rows a corpus build keeps, per group).

The deterministic-selection siblings live in text.py: tx09 (hash split),
tx10 (decontamination), tx11 (per-group k-smallest sample). Every member
of the family hashes a DISTINCT salt (sp01 unsalted as the base; tx09
':split', tx11 ':group-sample', sp02 ':w') so their draws compose
independently — with a shared hash, the split of a subsampled language
would be wildly skewed (see tx09's in-code note) and chained samplers
would keep min(r, w) instead of r·w. What none of
them express is a per-group KEEP-RATE — "100% of en, 50% of de/fr, 25% of
es, 12.5% of zh" — the way data mixtures are actually specified. Like its
siblings, membership derives from ``md5(doc_id)`` rather than an RNG: the
sample is a pure function of the data, reproducible across runs, engines
(the DuckDB oracle runs the SAME hash), cluster sizes, and partitionings —
Spark's ``sample()``/``sampleBy()`` are seeded per-partition and change
membership when the partitioning changes, which a 100 TB corpus build
cannot tolerate. Because each doc's draw is independent of every other
doc, adjusting one language's rate leaves all other languages' samples
byte-identical — ablation mixtures stay comparable.

Scale posture: a stateless one-pass filter + projection — no shuffle, no
state, whole-stage codegen; composes with the scan's column pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.driver_rows import driver_rows_df
from .registry import query, t

# Per-language keep-rates; 16-bit hex thresholds give 1/65536 resolution.
SP01_RATES = {"en": 1.0, "de": 0.5, "fr": 0.5, "es": 0.25, "zh": 0.125}
SP01_DEFAULT_RATE = 0.5


def _rate_hex(rate: float) -> str:
    # 'ffff~' sorts after every 4-hex-digit prefix → keep-all without a
    # special case ('ffff' alone would drop hashes with prefix ffff).
    return format(int(rate * 65536), "04x") if rate < 1.0 else "ffff~"


def _threshold_case_sql() -> str:
    whens = "\n                ".join(
        f"WHEN lang = '{lang}' THEN '{_rate_hex(rate)}'"
        for lang, rate in sorted(SP01_RATES.items())
    )
    return (
        f"CASE {whens}\n                ELSE '{_rate_hex(SP01_DEFAULT_RATE)}' END"
    )


@query(
    "sp01_mixture_sample",
    oracle=f"""
    SELECT doc_id, lang, source
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < {_threshold_case_sql()}
    ORDER BY doc_id
    """,
)
def sp01_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    h4 = F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 4)
    thr = F.lit(_rate_hex(SP01_DEFAULT_RATE))
    for lang, rate in sorted(SP01_RATES.items()):
        thr = F.when(F.col("lang") == lang, _rate_hex(rate)).otherwise(thr)
    return (
        docs.where(h4 < thr)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------- #
# sp02: per-row WEIGHTED deterministic sampling.                              #
# --------------------------------------------------------------------------- #
def weighted_hash_sample(
    df: DataFrame, weight, id_col: str = "doc_id", salt: str = "w"
) -> DataFrame:
    """Keep each row with probability ``weight`` (a Column in [0, 1]),
    deterministically: the row's md5-derived uniform draw is compared to
    its own weight. Same determinism contract as sp01 — membership is a
    pure function of the data (reproducible across runs/engines/
    partitionings), and each row's draw is independent, so reweighting one
    stratum leaves every other row's membership untouched. Shuffle-free,
    whole-stage codegen.

    The uniform is the first 16 bits of ``md5(id || ':' || salt)`` scaled
    to [0, 1) — 1/65536 probability resolution, identical in DuckDB via
    ``('0x' || substr(md5(id || ':w'), 1, 4))::INT / 65536.0``. The SALT
    decorrelates this sampler from sp01/tx09/tx11 (round-7 review: all
    selectors share md5(doc_id), so unsalted composition keeps
    ``min(r, w)`` of the corpus instead of ``r·w`` — with w ≤ r a strict
    subset of the mixture sample, not an independent thinning). Chaining
    two weighted samples likewise needs two different salts.
    """
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col(id_col).cast("string"), F.lit(":" + salt)
                    ).cast("binary")
                ),
                1,
                4,
            ),
            16,
            10,
        ).cast("long")
        / 65536.0
    )
    return df.where(u < weight)


#: sp02's weight: documents kept proportionally to length (capped at
#: LENGTH_CAP chars ⇒ probability 1). Sampling documents ∝ size approximates
#: a uniform sample over TOKENS — the quantity a pretraining mixture
#: actually budgets — where uniform-over-documents oversamples short docs'
#: tokens. The weight is any [0,1] expression; this one is the registered
#: token-budget shape.
SP02_LENGTH_CAP = 400


@query(
    "sp02_weighted_sample",
    oracle=f"""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':w'), 1, 4))::INT
          / 65536.0
          < least(n_chars / {SP02_LENGTH_CAP}.0, 1.0)
    ORDER BY doc_id
    """,
)
def sp02_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    weight = F.least(F.col("n_chars") / SP02_LENGTH_CAP, F.lit(1.0))
    return (
        weighted_hash_sample(docs, weight)
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------- #
# sp03: TEMPERATURE-scaled mixture — sp01 with the rates DERIVED from the     #
# data instead of hand-specified. Multilingual pretraining's standard         #
# α-sampling: target share per language ∝ n^α (α=1 natural, α→0 uniform),    #
# realized as keep-rate(lang) = (n_lang / n_min)^(α−1) — the smallest        #
# language keeps 100%, larger ones are thinned toward balance. One tiny      #
# count aggregate (|langs| rows, broadcast back), then the same stateless    #
# md5 filter as sp01/sp02 — still shuffle-free on the corpus side, still     #
# per-doc independent draws (re-running with a new α leaves every kept       #
# doc's draw unchanged). Rates are rounded to 6 dp on BOTH engines: pow()    #
# may differ by an ulp across libms, and the gate compares exact             #
# membership.                                                                 #
# --------------------------------------------------------------------------- #
SP03_ALPHA = 0.5


@query(
    "sp03_temperature_sample",
    oracle=f"""
    WITH counts AS (
        SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang
    ),
    rates AS (
        SELECT lang,
               ROUND(POW(CAST(n AS DOUBLE) / (SELECT MIN(n) FROM counts),
                         {SP03_ALPHA} - 1), 6) AS keep_rate
        FROM counts
    )
    SELECT d.doc_id, d.lang, r.keep_rate
    FROM documents d JOIN rates r USING (lang)
    WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':t'), 1, 4))::INT
          / 65536.0 < r.keep_rate
    ORDER BY d.doc_id
    """,
)
def sp03_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    n_min = counts.agg(F.min("n")).first()[0]
    rates = counts.select(
        "lang",
        F.round(
            F.pow(F.col("n").cast("double") / F.lit(n_min), SP03_ALPHA - 1), 6
        ).alias("keep_rate"),
    )
    enriched = docs.join(F.broadcast(rates), "lang")
    return (
        weighted_hash_sample(enriched, F.col("keep_rate"), salt="t")
        .select("doc_id", "lang", "keep_rate")
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------- #
# sp04: SEQUENCE PACKING — map each document onto the global token stream.    #
#                                                                             #
# Training batches are fixed-token-budget packs; the standard concat-then-    #
# chunk scheme (GPT-style packing) assigns every document the half-open      #
# range [start_tok, start_tok + n_tokens) of the concatenated corpus and     #
# cuts packs every _PACK_BUDGET tokens — docs crossing a boundary split     #
# across consecutive packs (first_pack..last_pack). The whole layout is a    #
# pure function of (doc order, token counts): deterministic, resumable,      #
# and engine-checkable.                                                       #
#                                                                             #
# The distributed heart is the GLOBAL running token count. SUM OVER          #
# (ORDER BY doc_id) with no partition key would single-partition the         #
# corpus; functions/prefix.with_global_cumsum runs the two-phase prefix     #
# sum instead — partition-local windows + a #partitions-row driver offset    #
# pass (plan-asserted free of SinglePartition exchanges). The DuckDB oracle  #
# IS the naive global window: the gate adjudicates the rewrite.              #
# --------------------------------------------------------------------------- #
_PACK_BUDGET = 2048


def token_pack_spans(
    counts: DataFrame,
    budget: int = _PACK_BUDGET,
    order_col: str = "doc_id",
    start_offset: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """ONE copy of the pack-layout arithmetic for sp04, sp05, the pipeline
    example, AND the incremental streaming form (hand-synchronized copies
    were a round-7 review finding — twice): map each (order_col, n_tokens)
    row onto the concatenated token stream via the two-phase prefix sum
    and derive its pack span. ``start_offset`` shifts the stream origin —
    the incremental ingest path passes the persisted high-water offset so
    each corpus drop continues where the last stopped.

    The result carries ``cumsum_cache`` (unpersist when done) and
    ``cumsum_total`` (this batch's token total, already driver-side — no
    extra job) through from :func:`with_global_cumsum`.
    ``num_partitions`` forwards to the prefix sum's range repartition —
    callers with a small bounded input (a micro-batch) size it to the
    input instead of the cluster default; the cumsum is partition-count
    independent by construction, so the layout cannot change."""
    from ..functions.prefix import with_global_cumsum

    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    cum = with_global_cumsum(
        counts, order_col, "n_tokens", out_col="cum",
        num_partitions=num_partitions,
    )
    out = (
        cum.where(F.col("n_tokens") > 0)
        .select(
            order_col,
            "n_tokens",
            F.expr(f"cum + {start_offset} - n_tokens").alias("start_tok"),
            F.expr(f"cum + {start_offset}").alias("end_tok"),
            # the budget rides in column metadata so the manifest step
            # CANNOT be called with a mismatched budget (review catch:
            # independent params silently corrupted the segment math)
            F.expr(f"(cum + {start_offset} - n_tokens) div {budget}").alias(
                "first_pack", metadata={"pack_budget": budget}
            ),
            F.expr(f"(cum + {start_offset} - 1) div {budget}").alias("last_pack"),
        )
    )
    out.cumsum_cache = cum.cumsum_cache
    out.cumsum_total = cum.cumsum_total
    return out


def pack_segment_manifest(spans: DataFrame) -> DataFrame:
    """Explode pack spans into the per-(pack, doc-segment) manifest a
    trainer consumes: which slice of which doc fills which token range of
    which pack. Output is linear: n_docs + boundary crossings. The budget
    is read from the metadata :func:`token_pack_spans` stamped on
    ``first_pack`` — one source of truth, no mismatch possible."""
    budget = spans.schema["first_pack"].metadata["pack_budget"]
    seg = spans.select(
        spans.columns[0],
        "start_tok",
        "end_tok",
        F.explode(F.sequence("first_pack", "last_pack")).alias("pack_id"),
    )
    seg_start = F.greatest(F.col("start_tok"), F.col("pack_id") * budget)
    seg_end = F.least(F.col("end_tok"), (F.col("pack_id") + 1) * budget)
    return seg.select(
        "pack_id",
        spans.columns[0],
        (seg_start - F.col("start_tok")).alias("offset_in_doc"),
        (seg_end - seg_start).alias("seg_len"),
        (seg_start - F.col("pack_id") * budget).alias("offset_in_pack"),
    )


@query(
    "sp04_sequence_packing",
    oracle=f"""
    WITH d AS (
        SELECT doc_id,
               len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '')) AS n_tokens
        FROM documents
    ), c AS (
        SELECT doc_id, n_tokens,
               SUM(n_tokens) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM d
    )
    SELECT doc_id, n_tokens,
           CAST(cum - n_tokens AS BIGINT) AS start_tok,
           CAST((cum - n_tokens) // {_PACK_BUDGET} AS BIGINT) AS first_pack,
           CAST((cum - 1) // {_PACK_BUDGET} AS BIGINT) AS last_pack,
           CAST((cum - 1) // {_PACK_BUDGET} - (cum - n_tokens) // {_PACK_BUDGET} + 1 AS BIGINT) AS n_segments
    FROM c
    WHERE n_tokens > 0
    ORDER BY doc_id
    """,
)
def sp04_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .text import _tokens_spark

    docs = t(spark, sf_dir, "documents").select(
        "doc_id", F.size(_tokens_spark("text")).alias("n_tokens")
    )
    spans = token_pack_spans(docs)
    return spans.select(
        "doc_id",
        "n_tokens",
        "start_tok",
        "first_pack",
        "last_pack",
        (F.col("last_pack") - F.col("first_pack") + F.lit(1)).alias("n_segments"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------- #
# sp05: pack-segment manifest — sp04's layout MATERIALIZED. A trainer reads   #
# packs, so the deliverable is one row per (pack, doc-segment): which slice   #
# of which document fills which token range of which pack. Segments per doc   #
# = packs it touches (explode over sequence(first_pack, last_pack)): total    #
# rows = n_docs + n_boundary_crossings ≤ n_docs + total_tokens/_PACK_BUDGET   #
# — linear, no blow-up. Every pack except the last is exactly full by        #
# construction (asserted in tests/test_extensions.py).                        #
# --------------------------------------------------------------------------- #
@query(
    "sp05_pack_segments",
    oracle=f"""
    WITH d AS (
        SELECT doc_id,
               len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '')) AS n_tokens
        FROM documents
    ), c AS (
        SELECT doc_id, n_tokens,
               SUM(n_tokens) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM d
    ), spans AS (
        SELECT doc_id,
               CAST(cum - n_tokens AS BIGINT) AS start_tok,
               CAST(cum AS BIGINT) AS end_tok,
               CAST((cum - n_tokens) // {_PACK_BUDGET} AS BIGINT) AS first_pack,
               CAST((cum - 1) // {_PACK_BUDGET} AS BIGINT) AS last_pack
        FROM c WHERE n_tokens > 0
    )
    SELECT p.pack_id, s.doc_id,
           GREATEST(s.start_tok, p.pack_id * {_PACK_BUDGET}) - s.start_tok AS offset_in_doc,
           LEAST(s.end_tok, (p.pack_id + 1) * {_PACK_BUDGET})
               - GREATEST(s.start_tok, p.pack_id * {_PACK_BUDGET}) AS seg_len,
           GREATEST(s.start_tok, p.pack_id * {_PACK_BUDGET})
               - p.pack_id * {_PACK_BUDGET} AS offset_in_pack
    FROM spans s, UNNEST(range(s.first_pack, s.last_pack + 1)) AS p(pack_id)
    ORDER BY pack_id, offset_in_pack
    """,
)
def sp05_pack_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .text import _tokens_spark

    docs = t(spark, sf_dir, "documents").select(
        "doc_id", F.size(_tokens_spark("text")).alias("n_tokens")
    )
    return pack_segment_manifest(token_pack_spans(docs)).orderBy(
        "pack_id", "offset_in_pack"
    )


# --------------------------------------------------------------------------- #
# sp06: deterministic EPOCH SHUFFLE — the global permutation a trainer        #
# re-derives per epoch. Shuffle order = md5(seed || doc_id): deterministic    #
# across engines/runs/cluster sizes (the tx09 hash-splitting stance), a new   #
# seed is a new permutation, and no RNG state ever ships. The global rank    #
# over the hash order is the scale problem — ROW_NUMBER with no partition    #
# key single-partitions the corpus — so this rides                           #
# functions/prefix.with_global_rank (two-phase: range partition + local      #
# row_number + broadcast offsets). The DuckDB oracle IS the naive global     #
# window: the driver gate adjudicates the distributed rank rewrite against   #
# per-row ground truth, on a permutation (not just tx22's vocab stats).      #
# --------------------------------------------------------------------------- #
_EPOCH_SEED = 7


@query(
    "sp06_epoch_shuffle",
    oracle=f"""
    SELECT doc_id,
           ROW_NUMBER() OVER (
               ORDER BY md5(CONCAT('epoch-{_EPOCH_SEED}:', CAST(doc_id AS VARCHAR))),
                        doc_id
           ) AS shuffle_pos
    FROM documents
    ORDER BY shuffle_pos
    """,
)
def sp06_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.prefix import with_global_rank

    docs = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(
            F.concat(
                F.lit(f"epoch-{_EPOCH_SEED}:"), F.col("doc_id").cast("string")
            )
        ).alias("__h"),
    )
    ranked = with_global_rank(
        docs, ["__h", "doc_id"], unique_cols=["doc_id"], out_col="shuffle_pos"
    )
    return ranked.select("doc_id", "shuffle_pos").orderBy("shuffle_pos")


# --------------------------------------------------------------------------- #
# sp07: EXACT-BUDGET mixture waterfill — the third way a mixture is           #
# specified. sp01 takes hand-set keep-RATES, sp03 derives rates from a        #
# temperature; both realize the mixture only in EXPECTATION (each doc an     #
# independent draw). A pretraining data order is usually specified the       #
# other way around: "the corpus is 30% en / 20% de / ... BY TOKENS, as       #
# large as the available data allows without upsampling". That is a          #
# waterfilling problem with a closed form: the binding domain — the one      #
# with the least data relative to its target share — sets the total,        #
#     T = min_d floor(avail_d * 10000 / bp_d)        (shares in basis        #
# points, all-BIGINT arithmetic so both engines agree bit-for-bit), and      #
# each domain keeps its hash-smallest docs until                            #
#     budget_d = floor(bp_d * T / 10000)                                     #
# chars are taken (greedy prefix of the salted-md5 order: deterministic,    #
# engine-independent, and stable under rate changes to OTHER domains —      #
# doc draws never depend on each other across domains).                      #
#                                                                            #
# Scale posture: the totals aggregate is |domains| rows (broadcast back);   #
# the only heavy step is the per-domain hash-ordered cumsum, a per-domain   #
# global sort. At gate scale a plain Window is right; at 100 TB the swap    #
# is the functions/prefix.py two-phase construction run per domain (range-  #
# partition WITHIN domain by hash, per-partition totals to the driver —     #
# |domains|·|partitions| rows — broadcast offsets back), or equivalently a  #
# sampled hash-threshold with exact boundary refinement. Same rewrite        #
# sp06/tx22 already adjudicate for the global-rank case.                     #
# --------------------------------------------------------------------------- #
SP07_TARGET_BP = {"en": 3000, "de": 2000, "fr": 2000, "es": 1500, "zh": 1500}


def mixture_waterfill(
    docs: DataFrame,
    target_bp: dict[str, int],
    domain_col: str = "lang",
    size_col: str = "n_chars",
    id_col: str = "doc_id",
    salt: str = "wf",
) -> DataFrame:
    """Keep each domain's hash-smallest docs up to an exact size budget
    chosen so the kept corpus matches ``target_bp`` (basis points, must sum
    to 10000) as closely as no-upsampling allows. BIGINT-only arithmetic:
    ``avail * 10000`` stays under 2^63 up to ~9e14 total chars (≈ 900 TB),
    asserted nowhere because the overflow is loud, not silent (ANSI mode).
    Domains absent from ``target_bp`` are dropped (share 0).

    Raises ``ValueError`` if the shares do not sum to 10000, or if a
    ``target_bp`` domain has no rows in ``docs`` — without the check a
    zero-row domain would silently vanish from the totals aggregate, and
    ``T = min(avail*10000/bp)`` over the REMAINING domains would emit a
    mixture that simply lacks that domain instead of failing loudly."""
    from pyspark.sql import Window

    if sum(target_bp.values()) != 10000:
        raise ValueError(
            f"target_bp shares must sum to 10000 basis points, "
            f"got {sum(target_bp.values())}: {dict(sorted(target_bp.items()))}"
        )

    bp_col = None
    for dom, bp in sorted(target_bp.items()):
        bp_col = (F if bp_col is None else bp_col).when(
            F.col(domain_col) == dom, F.lit(bp)
        )
    base = docs.where(
        F.col(domain_col).isin(list(target_bp))
    ).select(
        id_col,
        domain_col,
        size_col,
        F.md5(
            F.concat(F.col(id_col).cast("string"), F.lit(f":{salt}"))
        ).alias("__h"),
        bp_col.alias("__bp"),
    )
    # Bounded driver materialization: totals is at most |target_bp| rows
    # (one per requested domain). Collected ONCE — the zero-row-domain
    # gate, T = min(avail*10000/bp) and the per-domain budgets are all
    # closed-form over these few rows, so computing them driver-side and
    # broadcasting the literal budgets back costs ONE corpus aggregate
    # instead of three (round-9 review: the first validation collect left
    # the lazy plan re-running the identical aggregate twice more).
    rows = (
        base.groupBy(domain_col, "__bp")
        .agg(F.sum(size_col).cast("long").alias("__avail"))
        .collect()
    )
    missing = sorted(set(target_bp) - {r[0] for r in rows})
    if missing:
        raise ValueError(
            f"target_bp domains with zero rows in docs[{domain_col}]: "
            f"{missing} — a no-upsampling waterfill cannot satisfy a "
            f"nonzero share for an empty domain"
        )
    # Python // == Spark/DuckDB div on non-negative BIGINTs
    t_scale = min(r["__avail"] * 10000 // r["__bp"] for r in rows)
    from pyspark.sql import types as T

    budgets = driver_rows_df(
        docs.sparkSession,
        [(r[0], r["__bp"] * t_scale // 10000) for r in rows],
        # domain keeps the CALLER's column type (review: a hardcoded
        # string schema broke non-string domain columns)
        T.StructType([
            T.StructField(domain_col, docs.schema[domain_col].dataType),
            T.StructField("__budget", T.LongType()),
        ]),
    )
    w = (
        Window.partitionBy(domain_col)
        .orderBy("__h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        base.join(F.broadcast(budgets), domain_col)
        .withColumn("__cum", F.sum(size_col).over(w))
        .where(F.col("__cum") <= F.col("__budget"))
        .select(id_col, domain_col, size_col)
    )


def _sp07_bp_case_sql() -> str:
    whens = " ".join(
        f"WHEN '{dom}' THEN {bp}" for dom, bp in sorted(SP07_TARGET_BP.items())
    )
    return f"CASE lang {whens} END"


@query(
    "sp07_mixture_waterfill",
    oracle=f"""
    WITH base AS (
        SELECT doc_id, lang, n_chars,
               md5(CAST(doc_id AS VARCHAR) || ':wf') AS h,
               {_sp07_bp_case_sql()} AS bp
        FROM documents
        WHERE lang IN ({", ".join(f"'{d}'" for d in sorted(SP07_TARGET_BP))})
    ), totals AS (
        SELECT lang, bp, CAST(SUM(n_chars) AS BIGINT) AS avail
        FROM base GROUP BY lang, bp
    ), scale AS (
        SELECT MIN(avail * 10000 // bp) AS t FROM totals
    ), budgets AS (
        SELECT lang, CAST(bp * t // 10000 AS BIGINT) AS budget
        FROM totals, scale
    )
    SELECT b.doc_id, b.lang, b.n_chars
    FROM base b JOIN budgets USING (lang)
    QUALIFY SUM(n_chars) OVER (
        PARTITION BY b.lang ORDER BY h
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) <= budget
    ORDER BY doc_id
    """,
)
def sp07_mixture_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return mixture_waterfill(docs, SP07_TARGET_BP).orderBy("doc_id")


# --------------------------------------------------------------------------- #
# sp08: EPOCH PLAN with upsampling — sp07's complement, completing the        #
# mixture family (sp01 hand rates / sp03 temperature / sp07 exact budget     #
# without upsampling / sp08 the plan WHEN the target total exceeds what's    #
# available). Pretraining corpora routinely run small high-quality domains   #
# for multiple epochs while capping the big ones; the plan is closed-form    #
# integer arithmetic per domain:                                             #
#     budget_d      = bp_d * T_total div 10000                               #
#     full_epochs_d = budget_d div avail_d                                   #
#     tail_chars_d  = budget_d mod avail_d                                   #
# with the tail drawn by the SAME hash-smallest prefix rule as sp07 (so the  #
# partial epoch is deterministic and stable under rate changes elsewhere).   #
# The registered query emits the |domains|-row PLAN — the artifact a corpus  #
# build reviews/commits before expanding it (the expansion itself is one    #
# explode over sequence(1, full_epochs) plus one sp07-style prefix filter). #
# T_total here = 2x available total: forces upsampling of every domain      #
# whose share exceeds half its natural proportion — exercises both sides.   #
# --------------------------------------------------------------------------- #
@query(
    "sp08_epoch_plan",
    oracle=f"""
    WITH base AS (
        SELECT lang, n_chars, {_sp07_bp_case_sql()} AS bp
        FROM documents
        WHERE lang IN ({", ".join(f"'{d}'" for d in sorted(SP07_TARGET_BP))})
    ), totals AS (
        SELECT lang, bp, CAST(SUM(n_chars) AS BIGINT) AS avail_chars
        FROM base GROUP BY lang, bp
    ), grand AS (
        SELECT CAST(2 * SUM(avail_chars) AS BIGINT) AS t_total FROM totals
    )
    SELECT lang, avail_chars,
           CAST(bp * t_total // 10000 AS BIGINT) AS budget_chars,
           CAST((bp * t_total // 10000) // avail_chars AS BIGINT)
               AS full_epochs,
           CAST((bp * t_total // 10000) % avail_chars AS BIGINT)
               AS tail_chars
    FROM totals, grand
    ORDER BY lang
    """,
)
def sp08_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    bp_col = None
    for dom, bp in sorted(SP07_TARGET_BP.items()):
        bp_col = (F if bp_col is None else bp_col).when(
            F.col("lang") == dom, F.lit(bp)
        )
    totals = (
        docs.where(F.col("lang").isin(list(SP07_TARGET_BP)))
        .select("lang", "n_chars", bp_col.alias("bp"))
        .groupBy("lang", "bp")
        .agg(F.sum("n_chars").cast("long").alias("avail_chars"))
    )
    grand = totals.select(
        (F.lit(2) * F.sum("avail_chars")).cast("long").alias("t_total")
    )
    budget = F.expr("bp * t_total div 10000")
    return (
        totals.crossJoin(F.broadcast(grand))
        .select(
            "lang",
            "avail_chars",
            budget.alias("budget_chars"),
            F.expr("(bp * t_total div 10000) div avail_chars").alias(
                "full_epochs"
            ),
            F.expr("(bp * t_total div 10000) % avail_chars").alias(
                "tail_chars"
            ),
        )
        .orderBy("lang")
    )


def expand_epoch_plan(docs: DataFrame, plan: DataFrame,
                      domain_col: str = "lang", size_col: str = "n_chars",
                      id_col: str = "doc_id", salt: str = "wf") -> DataFrame:
    """Materialize sp08's plan into the actual multi-epoch corpus: each
    domain's docs replicated ``full_epochs`` times (epoch column 1..k via
    one explode over ``sequence``) plus a partial epoch 0 holding the
    hash-smallest prefix that fills ``tail_chars`` — the sp07 rule, so
    the tail is deterministic and stable under changes to OTHER domains.
    The greedy prefix stops at ``cum <= tail_chars``, so the realized
    size is within one document of the plan's budget (never over; the
    weaker-than-exact bound is what tests/test_extensions.py pins); the
    corpus is touched once, the plan is broadcast."""
    from pyspark.sql import Window

    base = docs.join(
        F.broadcast(plan.select(domain_col, "full_epochs", "tail_chars")),
        domain_col,
    ).withColumn(
        "__h",
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f":{salt}"))),
    )
    full = base.select(
        id_col, domain_col, size_col,
        F.explode(F.sequence(F.lit(1), F.col("full_epochs"))).alias("epoch"),
    )
    w = (
        Window.partitionBy(domain_col)
        .orderBy("__h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tail = (
        base.withColumn("__cum", F.sum(size_col).over(w))
        .where(F.col("__cum") <= F.col("tail_chars"))
        .select(id_col, domain_col, size_col, F.lit(0).alias("epoch"))
    )
    return full.unionAll(tail)


# --------------------------------------------------------------------------- #
# sp09: stratified EXACT split — tx09's hash-threshold split gives each doc   #
# an independent 80/10/10 coin, so realized per-language proportions drift   #
# by sqrt(n) (and a small stratum can lose a whole side). Training-data      #
# curation wants the other contract too: per-stratum COUNTS exact to the    #
# floor, deterministic, stable under corpus growth only in expectation.     #
# Rank docs inside each language by salted md5 (the package's selector      #
# convention), then cut at closed-form integer thresholds:                  #
# rank*10 <= 8*cnt -> train, <= 9*cnt -> val, else test. BIGINT-only, so    #
# the DuckDB oracle adjudicates exactly.                                     #
#                                                                            #
# Scale posture: one window per lang partition over the salted-hash order   #
# — a per-stratum global sort, same shape as sp07's cumsum (and the same    #
# functions/prefix.py two-phase rewrite applies when a stratum outgrows a   #
# partition).                                                                #
# --------------------------------------------------------------------------- #
@query(
    "sp09_stratified_split",
    oracle="""
    WITH r AS (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR) || ':strat'), doc_id
               ) AS rnk,
               COUNT(*) OVER (PARTITION BY lang) AS cnt
        FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN rnk * 10 <= 8 * cnt THEN 'train'
                WHEN rnk * 10 <= 9 * cnt THEN 'val'
                ELSE 'test' END AS split
    FROM r
    ORDER BY doc_id
    """,
)
def sp09_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = t(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.md5(
            F.concat(F.col("doc_id").cast("string"), F.lit(":strat"))
        ).alias("__h"),
    )
    w = Window.partitionBy("lang").orderBy("__h", "doc_id")
    wc = Window.partitionBy("lang")
    ranked = docs.select(
        "doc_id",
        "lang",
        F.row_number().over(w).alias("rnk"),
        F.count(F.lit(1)).over(wc).alias("cnt"),
    )
    return ranked.select(
        "doc_id",
        "lang",
        F.when(F.col("rnk") * 10 <= 8 * F.col("cnt"), "train")
        .when(F.col("rnk") * 10 <= 9 * F.col("cnt"), "val")
        .otherwise("test")
        .alias("split"),
    ).orderBy("doc_id")
