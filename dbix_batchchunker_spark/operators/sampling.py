"""Deterministic sampling operators — the selection stages of a
training-data pipeline (SURVEY.md §2.C posture; no reference analog:
DBIx-BatchChunker processes every row, these choose WHICH rows a corpus
build keeps).

Every operator here derives its randomness from ``md5(doc_id)`` instead of
an RNG: the sample is a pure function of the data, so it is reproducible
across runs, engines (the DuckDB oracles run the SAME hash), cluster sizes,
and partitionings — the property that makes eval holdouts and ablation
corpora stable as the pipeline re-runs. Spark's ``sample()``/``sampleBy()``
are seeded per-partition and change membership when the partitioning
changes, which is exactly what a 100 TB corpus build cannot tolerate.

Scale posture: sp01/sp03/sp04 are stateless one-pass filters/projections
(no shuffle, whole-stage codegen, combinable with the scan's predicate
pushdown); sp02 ranks within strata via a window — its shuffle is by the
stratum key, and the documented 100 TB refinement is a hash-threshold
pre-filter that bounds each stratum's window input before the sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import query, t


def doc_hash(id_col: str = "doc_id"):
    """Lowercase hex md5 of the id's decimal string — identical in Spark and
    DuckDB (``md5(CAST(doc_id AS VARCHAR))``), the shared deterministic
    "random" draw for every sampling operator."""
    return F.md5(F.col(id_col).cast("string").cast("binary"))


def _hash_sql(id_col: str = "doc_id") -> str:
    return f"md5(CAST({id_col} AS VARCHAR))"


# --------------------------------------------------------------------------- #
# sp01: deterministic uniform sample — keep a doc iff its hash prefix falls   #
# below a threshold. Rate resolution is 1/256 per hex pair; '1a' = 26/256 ≈   #
# 10.2%. Stateless filter: no shuffle, no state, membership independent of    #
# partitioning — the canonical stable eval-holdout selector.                  #
# --------------------------------------------------------------------------- #
SP01_THRESHOLD_HEX = "1a"


@query(
    "sp01_hash_sample",
    oracle=f"""
    SELECT doc_id, lang, source, n_chars
    FROM documents
    WHERE substr({_hash_sql()}, 1, 2) < '{SP01_THRESHOLD_HEX}'
    ORDER BY doc_id
    """,
)
def sp01_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return (
        docs.where(F.substring(doc_hash(), 1, 2) < SP01_THRESHOLD_HEX)
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------- #
# sp02: stratified k-per-stratum sample — the k hash-smallest docs of each    #
# language. Deterministic "reservoir": rank by (hash, doc_id) inside the     #
# stratum. The window shuffles by lang (5 strata here — skewed by nature);   #
# at 100 TB the input is first cut by a generous hash threshold (≥ k per     #
# stratum whp), so the per-stratum sort ranks thousands of rows, not         #
# billions, and AQE's skew split handles the residual imbalance.             #
# --------------------------------------------------------------------------- #
SP02_PER_STRATUM = 25


@query(
    "sp02_stratified_sample",
    oracle=f"""
    WITH ranked AS (
        SELECT doc_id, lang, source,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY {_hash_sql()}, doc_id
               ) AS stratum_rank
        FROM documents
    )
    SELECT doc_id, lang, source, stratum_rank
    FROM ranked
    WHERE stratum_rank <= {SP02_PER_STRATUM}
    ORDER BY lang, stratum_rank
    """,
)
def sp02_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(doc_hash(), F.col("doc_id"))
    return (
        docs.select(
            "doc_id", "lang", "source", F.row_number().over(w).alias("stratum_rank")
        )
        .where(F.col("stratum_rank") <= SP02_PER_STRATUM)
        .orderBy("lang", "stratum_rank")
    )


# --------------------------------------------------------------------------- #
# sp03: train/val/test split assignment — hex-prefix thresholds partition the #
# hash space ≈80/10/10. Pure projection (no shuffle); every engine that can  #
# compute md5 reproduces the membership, so the split survives re-runs,      #
# re-partitions, and engine migrations — the property no RNG split has.      #
# --------------------------------------------------------------------------- #
SP03_TRAIN_BELOW = "cd"  # 205/256 ≈ 80.1%
SP03_VAL_BELOW = "e6"  # next 25/256 ≈ 9.8%; rest = test


@query(
    "sp03_split_assign",
    oracle=f"""
    SELECT doc_id, lang,
           CASE WHEN substr({_hash_sql()}, 1, 2) < '{SP03_TRAIN_BELOW}' THEN 'train'
                WHEN substr({_hash_sql()}, 1, 2) < '{SP03_VAL_BELOW}' THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    ORDER BY doc_id
    """,
)
def sp03_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    h2 = F.substring(doc_hash(), 1, 2)
    return (
        docs.select(
            "doc_id",
            "lang",
            F.when(h2 < SP03_TRAIN_BELOW, "train")
            .when(h2 < SP03_VAL_BELOW, "val")
            .otherwise("test")
            .alias("split"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------- #
# sp04: mixture sampling — per-language keep-rates reweight the corpus        #
# composition (the "data mixture" knob of a pretraining run). Rates map to   #
# 16-bit hex thresholds (resolution 1/65536); membership is again a pure     #
# function of doc_id, so adjusting one language's rate leaves every other    #
# language's sample byte-identical — mixtures stay comparable across         #
# ablations. Stateless one-pass filter.                                      #
# --------------------------------------------------------------------------- #
SP04_RATES = {"en": 1.0, "de": 0.5, "fr": 0.5, "es": 0.25, "zh": 0.125}
SP04_DEFAULT_RATE = 0.5


def _rate_hex(rate: float) -> str:
    return format(min(int(rate * 65536), 65536), "04x") if rate < 1.0 else "ffff~"
    # 'ffff~' sorts after every 4-hex-digit prefix → keep-all without a
    # special case ('ffff' alone would drop hashes with prefix ffff).


def _threshold_case_sql() -> str:
    whens = "\n                ".join(
        f"WHEN lang = '{lang}' THEN '{_rate_hex(rate)}'"
        for lang, rate in sorted(SP04_RATES.items())
    )
    return (
        f"CASE {whens}\n                ELSE '{_rate_hex(SP04_DEFAULT_RATE)}' END"
    )


@query(
    "sp04_mixture_sample",
    oracle=f"""
    SELECT doc_id, lang, source
    FROM documents
    WHERE substr({_hash_sql()}, 1, 4) < {_threshold_case_sql()}
    ORDER BY doc_id
    """,
)
def sp04_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    thr = F.lit(_rate_hex(SP04_DEFAULT_RATE))
    for lang, rate in sorted(SP04_RATES.items()):
        thr = F.when(F.col("lang") == lang, _rate_hex(rate)).otherwise(thr)
    return (
        docs.where(F.substring(doc_hash(), 1, 4) < thr)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )
