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
