"""Text-analysis operators for training-data pipelines (SURVEY.md §2.C):
token statistics, quality scoring, heuristic language ID, and document
fingerprinting — all pure JVM-side expressions (no Python UDFs), so they
whole-stage-codegen and scale linearly with a parquet scan.

Design note: the oracle SQL for each operator is GENERATED from the same
constants (stopword lists, punctuation class, formula weights) used to build
the Spark plan, so the two sides can't drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import query, t

# Tiny per-language stopword lists for the n-gram/stopword-hit heuristic.
# Deterministic tie order: first list wins (en > de > es > fr > zh).
LANG_STOPWORDS = [
    ("en", ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"]),
    ("de", ["der", "die", "das", "und", "ist", "ein", "nicht", "mit", "auf", "zu"]),
    ("es", ["el", "la", "de", "que", "y", "en", "un", "es", "no", "por"]),
    ("fr", ["le", "la", "de", "et", "un", "est", "que", "pour", "dans", "sur"]),
    ("zh", ["的", "是", "了", "在", "我", "有", "和", "不", "这", "人"]),
]

_PUNCT_CLASS = r"[.,;:!?]"
_WS = r"\s+"


def _tokens_spark(col: str = "text"):
    """Non-empty whitespace tokens (identical to the oracle's
    list_filter(regexp_split_to_array(...)))."""
    return F.filter(F.split(F.col(col), _WS), lambda x: x != F.lit(""))


def _tokens_sql(col: str = "text") -> str:
    return f"list_filter(regexp_split_to_array({col}, '{_WS}'), x -> x != '')"


def _hits_spark(tokens, words: list[str]):
    return F.size(F.filter(tokens, lambda x: x.isin(*words)))


def _hits_sql(tokens_sql: str, words: list[str]) -> str:
    lst = ", ".join(f"''{w}''" if False else f"'{w}'" for w in words)
    return f"len(list_filter({tokens_sql}, x -> x IN ({lst})))"


# --------------------------------------------------------------------------- #
# tx01: token & char statistics                                               #
# --------------------------------------------------------------------------- #
@query(
    "tx01_token_stats",
    oracle=f"""
    SELECT doc_id,
           len({_tokens_sql()}) AS n_tokens,
           length(text) AS n_chars_actual,
           length(regexp_replace(text, '{_WS}', '', 'g')) AS n_token_chars,
           ROUND(length(regexp_replace(text, '{_WS}', '', 'g'))
                 / GREATEST(len({_tokens_sql()}), 1), 6) AS avg_token_len
    FROM documents
    """,
)
def tx01_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    toks = _tokens_spark()
    n_token_chars = F.length(F.regexp_replace("text", _WS, ""))
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.length("text").alias("n_chars_actual"),
        n_token_chars.alias("n_token_chars"),
        F.round(n_token_chars / F.greatest(F.size(toks), F.lit(1)), 6).alias(
            "avg_token_len"
        ),
    )


# --------------------------------------------------------------------------- #
# tx02: quality score (length / punctuation / stopword / digit signals)       #
# --------------------------------------------------------------------------- #
_EN_WORDS = LANG_STOPWORDS[0][1]
_EN_LIST_SQL = ", ".join(f"'{w}'" for w in _EN_WORDS)

@query(
    "tx02_quality_score",
    oracle=f"""
    WITH s AS (
        SELECT doc_id,
               {_tokens_sql()} AS toks,
               length(text) AS n_chars_actual,
               len(regexp_extract_all(text, '{_PUNCT_CLASS}')) AS n_punct,
               len(regexp_extract_all(text, '[0-9]')) AS n_digits
        FROM documents
    )
    SELECT doc_id,
           len(toks) AS n_tokens,
           ROUND(n_punct  / GREATEST(n_chars_actual, 1), 6) AS punct_ratio,
           ROUND(n_digits / GREATEST(n_chars_actual, 1), 6) AS digit_ratio,
           ROUND(len(list_filter(toks, x -> x IN ({_EN_LIST_SQL})))
                 / GREATEST(len(toks), 1), 6) AS stopword_ratio,
           CAST(len(toks) BETWEEN 5 AND 1000000
                AND n_punct / GREATEST(n_chars_actual, 1) < 0.2
                AND n_digits / GREATEST(n_chars_actual, 1) < 0.3 AS BOOLEAN)
               AS passes_quality
    FROM s
    """,
)
def tx02_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread A/B-measured at +0.27 s here (r18): the regexp-count map is
    # cheaper than the exchange at this row weight — left on the scan
    docs = t(spark, sf_dir, "documents")
    toks = _tokens_spark()
    n_chars = F.length("text")
    n_punct = F.size(F.regexp_extract_all("text", F.lit(_PUNCT_CLASS), 0))
    n_digits = F.size(F.regexp_extract_all("text", F.lit("[0-9]"), 0))
    n_tokens = F.size(toks)
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1))
    digit_ratio = n_digits / F.greatest(n_chars, F.lit(1))
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(digit_ratio, 6).alias("digit_ratio"),
        F.round(
            _hits_spark(toks, _EN_WORDS) / F.greatest(n_tokens, F.lit(1)), 6
        ).alias("stopword_ratio"),
        (
            n_tokens.between(5, 1000000)
            & (punct_ratio < 0.2)
            & (digit_ratio < 0.3)
        ).alias("passes_quality"),
    )


# --------------------------------------------------------------------------- #
# tx03: heuristic language ID (stopword-hit argmax, deterministic tie order)  #
# --------------------------------------------------------------------------- #
def _langid_case_sql() -> str:
    toks = _tokens_sql()
    hits = {lang: _hits_sql(toks, words) for lang, words in LANG_STOPWORDS}
    # argmax ladder in declared order (ties go to the earlier language)
    branches = []
    langs = [lang for lang, _ in LANG_STOPWORDS]
    for i, lang in enumerate(langs):
        conds = [f"{hits[lang]} >= {hits[other]}" for other in langs[i + 1:]]
        cond = " AND ".join(conds) if conds else "TRUE"
        branches.append(f"WHEN {cond} THEN '{lang}'")
    return "CASE " + " ".join(branches) + " END"


@query(
    "tx03_langid",
    oracle=f"""
    SELECT doc_id, lang AS tagged_lang,
           {_langid_case_sql()} AS detected_lang
    FROM documents
    """,
)
def tx03_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread A/B-measured flat here (r18) — left on the scan
    docs = t(spark, sf_dir, "documents")
    toks = _tokens_spark()
    hits = {lang: _hits_spark(toks, words) for lang, words in LANG_STOPWORDS}
    langs = [lang for lang, _ in LANG_STOPWORDS]
    expr = None
    for i, lang in enumerate(langs):
        cond = F.lit(True)
        for other in langs[i + 1:]:
            cond = cond & (hits[lang] >= hits[other])
        expr = F.when(cond, lang) if expr is None else expr.when(cond, lang)
    return docs.select(
        "doc_id", F.col("lang").alias("tagged_lang"), expr.alias("detected_lang")
    )


# --------------------------------------------------------------------------- #
# tx04: document fingerprint (md5 of whitespace-normalized lowercase text)    #
# --------------------------------------------------------------------------- #
@query(
    "tx04_fingerprint",
    oracle=f"""
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '{_WS}', ' ', 'g'))) AS fingerprint
    FROM documents
    """,
)
def tx04_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    normalized = F.trim(F.regexp_replace(F.lower(F.col("text")), _WS, " "))
    return docs.select("doc_id", F.md5(normalized).alias("fingerprint"))


# --------------------------------------------------------------------------- #
# tx05: JSON extraction from event props (semi-structured surface)            #
# --------------------------------------------------------------------------- #
@query(
    "tx05_json_extract",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def tx05_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.get_json_object("props", "$.k").cast("bigint")).alias("sum_k"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------- #
# tx06: end-to-end training-data pipeline — quality filter → fingerprint      #
# dedup → token stats, composed from the operators above (the shape a 100 TB  #
# pretraining-data job runs; every stage stays in whole-stage codegen)        #
# --------------------------------------------------------------------------- #
@query(
    "tx06_pipeline_quality_dedup",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, lang,
               {_tokens_sql()} AS toks,
               length(text) AS n_chars_actual,
               len(regexp_extract_all(text, '{_PUNCT_CLASS}')) AS n_punct,
               md5(trim(regexp_replace(lower(text), '{_WS}', ' ', 'g'))) AS fingerprint
        FROM documents
    ),
    quality AS (
        SELECT * FROM scored
        WHERE len(toks) >= 5 AND n_punct / GREATEST(n_chars_actual, 1) < 0.2
    ),
    deduped AS (
        SELECT MIN(doc_id) AS doc_id, fingerprint, COUNT(*) AS dup_count
        FROM quality GROUP BY fingerprint
    )
    SELECT d.doc_id, d.fingerprint, d.dup_count, q.lang,
           len(q.toks) AS n_tokens
    FROM deduped d JOIN quality q ON d.doc_id = q.doc_id
    """,
)
def tx06_pipeline_quality_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    toks = _tokens_spark()
    normalized = F.trim(F.regexp_replace(F.lower(F.col("text")), _WS, " "))
    n_punct = F.size(F.regexp_extract_all("text", F.lit(_PUNCT_CLASS), 0))
    scored = docs.select(
        "doc_id",
        "lang",
        F.size(toks).alias("n_tokens"),
        F.md5(normalized).alias("fingerprint"),
        (n_punct / F.greatest(F.length("text"), F.lit(1))).alias("punct_ratio"),
    )
    quality = scored.filter((F.col("n_tokens") >= 5) & (F.col("punct_ratio") < 0.2))
    deduped = quality.groupBy("fingerprint").agg(
        F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("dup_count")
    )
    return deduped.join(quality.select("doc_id", "lang", "n_tokens"), "doc_id").select(
        "doc_id", "fingerprint", "dup_count", "lang", "n_tokens"
    )


# --------------------------------------------------------------------------- #
# tx07: BPE-ish regex token counting — GPT-2-style pre-tokenization pattern   #
# (letter runs / digit runs / single punctuation), alongside whitespace       #
# tokens for comparison. Counting tokens this way approximates subword-BPE    #
# token counts far better than whitespace splitting on punctuated text.       #
# --------------------------------------------------------------------------- #
_BPE_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"

@query(
    "tx07_bpe_token_count",
    oracle=f"""
    SELECT doc_id,
           len(regexp_extract_all(text, '{_BPE_PATTERN}')) AS n_bpe_tokens,
           len({_tokens_sql()}) AS n_ws_tokens,
           ROUND(len(regexp_extract_all(text, '{_BPE_PATTERN}'))
                 / GREATEST(len({_tokens_sql()}), 1), 6) AS bpe_per_word
    FROM documents
    """,
)
def tx07_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    bpe = F.regexp_extract_all("text", F.lit(_BPE_PATTERN), 0)
    ws = _tokens_spark()
    return docs.select(
        "doc_id",
        F.size(bpe).alias("n_bpe_tokens"),
        F.size(ws).alias("n_ws_tokens"),
        F.round(F.size(bpe) / F.greatest(F.size(ws), F.lit(1)), 6).alias(
            "bpe_per_word"
        ),
    )


# --------------------------------------------------------------------------- #
# tx08: polynomial rolling-hash fingerprint over code points                  #
# h = fold(codepoints, h*31 + c mod 1e9+7) — pure integer fold, identical in  #
# Spark (aggregate) and DuckDB (list_reduce with a prepended 0 seed).         #
# --------------------------------------------------------------------------- #
_HASH_MOD = 1_000_000_007

@query(
    "tx08_rolling_hash",
    oracle=f"""
    SELECT doc_id,
           list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                   list_transform(regexp_extract_all(text, '[\\s\\S]'),
                                  c -> CAST(unicode(c) AS BIGINT))),
               (a, b) -> (a * 31 + b) % {_HASH_MOD}
           ) AS content_hash
    FROM documents
    """,
)
def tx08_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import _spread

    # per-char fold over every document — CPU-bound one-split scan (r18)
    docs = _spread(t(spark, sf_dir, "documents"), "doc_id", "text")
    codes = F.expr(r"transform(regexp_extract_all(text, '[\\s\\S]', 0), c -> CAST(ascii(c) AS BIGINT))")
    rolled = F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + c) % _HASH_MOD,
    )
    return docs.select("doc_id", rolled.alias("content_hash"))


# --------------------------------------------------------------------------- #
# tx09: deterministic train/val/test split — hash-based assignment that is    #
# reproducible across engines, runs, and cluster sizes (the property random  #
# splits lack). md5 of the id string is the split key: identical lowercase   #
# hex in Spark and DuckDB, so the lexicographic threshold compare agrees     #
# byte-for-byte. First hex byte < 0x10 → val (1/16), < 0x20 → test (1/16),   #
# else train.                                                                 #
# --------------------------------------------------------------------------- #
# ONE copy of the split-assignment rule, shared by tx09 (the split) and
# tx20 (the audit OF that split) on both the Spark and oracle sides — if
# the salt or thresholds are retuned, the audit follows automatically
# instead of silently auditing a split nobody produces.
_SPLIT_CASE_SQL = (
    "CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 2) < '10' THEN 'val' "
    "WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 2) < '20' THEN 'test' "
    "ELSE 'train' END"
)


def _split_spark():
    key = F.substring(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":split"))), 1, 2
    )
    return (
        F.when(key < "10", "val").when(key < "20", "test").otherwise("train")
    )


@query(
    "tx09_det_split",
    oracle=f"""
    SELECT doc_id,
           {_SPLIT_CASE_SQL} AS split
    FROM documents
    ORDER BY doc_id
    """,
)
def tx09_det_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    # ':split'-SALTED hash (round-7 review): every deterministic selector in
    # the package derives from md5(doc_id), so an UNSALTED split is fully
    # correlated with the samplers — sp01's zh keep-set (prefix < '2000')
    # lands entirely inside val/test (prefix < '10'/'20') and zh gets ZERO
    # train docs. Distinct salts make the family's draws independent.
    return docs.select("doc_id", _split_spark().alias("split")).orderBy("doc_id")


# --------------------------------------------------------------------------- #
# tx10: benchmark decontamination — flag training docs sharing any word       #
# 5-gram with a held-out "benchmark" set (here: doc_id < 10). The standard   #
# n-gram-overlap contamination check, as a shingle explode + broadcast        #
# semi-join: candidates never pair docs, so the cost is O(total shingles),    #
# not O(docs²). At 100 TB the benchmark shingle set stays broadcast-sized    #
# (benchmarks are small by definition).                                      #
# --------------------------------------------------------------------------- #
_DECON_N = 5
_DECON_BENCH = 10  # doc_id < this = the "benchmark" set

#: ONE oracle for both decontamination queries (tx10 / tx16) — they are
#: documented as producing the same exact result, so they must share it.
_DECON_ORACLE = f"""
    WITH d AS (
        SELECT doc_id, {_tokens_sql()} AS w FROM documents
    ),
    g AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   range(0, greatest(len(w) - {_DECON_N}, 0) + 1),
                   i -> array_to_string(w[i + 1 : i + {_DECON_N}], ' ')
               ))) AS gram
        FROM d
    )
    SELECT DISTINCT doc_id
    FROM g
    WHERE doc_id >= {_DECON_BENCH}
      AND gram IN (SELECT gram FROM g WHERE doc_id < {_DECON_BENCH})
    ORDER BY doc_id
    """


def _decon_grams(docs: DataFrame) -> DataFrame:
    """(doc_id, gram) word-n-gram rows (n = _DECON_N), shared by tx10/tx16.

    Tokens are materialized as a column BEFORE shingling: expressions
    inside a transform() lambda get no common-subexpression elimination, so
    referencing the split() directly would re-split the whole text for
    every element_at — measured 16.8s → 1.4s at sf0.1 for this change.
    """
    from .dedup import _spread

    n = _DECON_N
    # the tokenize+shingle below is the expensive thing and the corpus
    # arrives as one split at test scale — spread the slim projection so
    # it runs cluster-wide (r18, guide §2.5; no-op on many-split scans)
    with_toks = _spread(docs, "doc_id", "text").select(
        "doc_id", _tokens_spark().alias("toks")
    )
    toks = F.col("toks")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    shingles = F.array_distinct(
        F.transform(
            idx,
            # try_element_at: strict element_at made any document shorter
            # than the gram width a hard ERROR (round-13 fuzz finding —
            # unreachable on the gate corpus, guaranteed reachable on a
            # real one); the padded short gram it yields instead equals
            # the oracle's short slice (concat_ws skips the NULLs)
            lambda i: F.concat_ws(
                " ",
                *[
                    F.try_element_at(toks, (i + j + 1).cast("int"))
                    for j in range(n)
                ],
            ),
        )
    )
    # zero-token docs: '' gram here vs NULL in the oracle slice dialect —
    # no tokens means no grams on both sides (the tx34 rule)
    return with_toks.where(F.size(toks) > 0).select(
        "doc_id", F.explode(shingles).alias("gram")
    )


@query("tx10_decontaminate", oracle=_DECON_ORACLE)
def tx10_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    grams = _decon_grams(t(spark, sf_dir, "documents"))
    bench = (
        grams.where(F.col("doc_id") < _DECON_BENCH).select("gram").distinct()
    )
    return (
        grams.where(F.col("doc_id") >= _DECON_BENCH)
        .join(F.broadcast(bench), "gram", "left_semi")
        .select("doc_id")
        .distinct()
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------- #
# tx11: deterministic per-group sampling — keep the k docs with smallest      #
# md5(id) per language. The hash order is a uniform permutation that both    #
# engines (and any cluster size) agree on, so eval subsets are reproducible  #
# — rerunning on different hardware samples the SAME docs, unlike rand().    #
# --------------------------------------------------------------------------- #
_SAMPLE_K = 5


# --------------------------------------------------------------------------- #
# tx12: n-gram repetition signals — the Gopher-style "fraction of duplicated   #
# word bigrams" quality heuristic (high repetition = boilerplate / spam).     #
# Computed ENTIRELY per-row with array higher-order functions: no explode,    #
# no shuffle, pure whole-stage-codegen map over the scan — the shape that     #
# scales to 100 TB linearly. Docs are short (hundreds of tokens), so the      #
# O(distinct × total) per-row top-count scan is bounded and JVM-side.         #
# --------------------------------------------------------------------------- #
@query(
    "tx12_repetition",
    oracle=f"""
    WITH tk AS (
        SELECT doc_id, {_tokens_sql()} AS w FROM documents
    ),
    bg AS (
        SELECT doc_id,
               list_transform(range(1, greatest(len(w), 1)),
                              i -> w[i] || ' ' || w[i + 1]) AS grams
        FROM tk
    )
    SELECT doc_id,
           len(grams) AS n_bigrams,
           len(list_distinct(grams)) AS n_distinct,
           COALESCE(list_max(list_transform(
               list_distinct(grams),
               g -> len(list_filter(grams, x -> x = g)))), 0) AS top_count,
           ROUND((len(grams) - len(list_distinct(grams)))
                 / greatest(len(grams), 1), 6) AS dup_frac
    FROM bg
    """,
)
def tx12_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import _spread

    # CPU-bound per-row HOF map on a one-split scan ran single-task
    # (2.3 s on one core of 32, r18 profile) — spread the slim projection
    # first (guide §2.5; pass-through on many-split scans)
    docs = _spread(t(spark, sf_dir, "documents"), "doc_id", "text")
    # Chained selects: each higher-order function consumes a MATERIALIZED
    # column (Catalyst does no common-subexpression elimination inside HOF
    # lambdas, and CollapseProject will not re-inline multi-referenced
    # aliases — measured 20s-class regressions when inlined).
    with_toks = docs.select("doc_id", _tokens_spark().alias("w"))
    toks = F.col("w")
    # zip_with over two offset slices (not sequence+element_at: sequence(1, 0)
    # DESCENDS and ANSI element_at throws out-of-bounds). n tokens yield
    # n-1 bigrams, 0 for empty/single-token docs — matching the oracle's
    # range(1, greatest(len(w), 1)) exactly.
    n1 = F.greatest(F.size(toks) - 1, F.lit(0))
    grams = F.zip_with(
        F.slice(toks, 1, n1),
        F.slice(toks, 2, n1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    with_grams = with_toks.select("doc_id", grams.alias("grams"))
    g = F.col("grams")
    distinct = F.array_distinct(g)
    top = F.array_max(
        F.transform(distinct, lambda d: F.size(F.filter(g, lambda x: x == d)))
    )
    return with_grams.select(
        "doc_id",
        F.size(g).alias("n_bigrams"),
        F.size(distinct).alias("n_distinct"),
        F.coalesce(top, F.lit(0)).alias("top_count"),
        F.round(
            (F.size(g) - F.size(distinct)) / F.greatest(F.size(g), F.lit(1)), 6
        ).alias("dup_frac"),
    )


@query(
    "tx11_group_sample",
    oracle=f"""
    SELECT lang, doc_id
    FROM (
        SELECT lang, doc_id,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR) || ':group-sample'),
                            doc_id) AS rn
        FROM documents
    )
    WHERE rn <= {_SAMPLE_K}
    ORDER BY lang, doc_id
    """,
)
def tx11_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = t(spark, sf_dir, "documents")
    # salted like tx09 (see there): an unsalted hash ORDER would pick
    # exactly the docs the samplers keep (k-smallest = sp01's keep-set),
    # biasing any eval subset drawn alongside a sampled corpus
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":group-sample"))),
        F.col("doc_id"),
    )
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _SAMPLE_K)
        .select("lang", "doc_id")
        .orderBy("lang", "doc_id")
    )


# --------------------------------------------------------------------------- #
# tx13: PII redaction — the C4/Dolma-style scrub step a training-data         #
# pipeline runs before anything else ships. Pure JVM regexp_replace chains    #
# (whole-stage codegen, zero shuffle — the same scales-with-the-scan shape    #
# as tx12). Patterns apply SEQUENTIALLY, each counting on the text the        #
# previous stage produced, and each stage is a separate select so every      #
# regexp consumes a MATERIALIZED column (no CSE inside nested expressions    #
# — the tx12/_shingles lesson).                                              #
# --------------------------------------------------------------------------- #
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    # digit lookarounds instead of \b: a leading "+" sits between two
    # non-word chars, so \b never fires there (Java regex; no oracle parity
    # needed — DuckDB's RE2 has no lookbehind)
    ("phone", r"(?<![\d.])(?:\+?\d{1,2}[ .-]?)?\(?\d{3}\)?[ .-]\d{3}[ .-]\d{4}(?![\d.])"),
    ("ipv4", r"(?<![\d.])(?:\d{1,3}\.){3}\d{1,3}(?![\d.])"),
)


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Replace each PII match with a ``<TYPE>`` placeholder; returns the
    input plus ``clean_text`` and one ``n_<type>`` count per pattern."""
    out = docs.withColumn("clean_text", F.col(text_col))
    for name, pat in PII_PATTERNS:
        out = out.select(
            "*",
            F.size(
                F.regexp_extract_all("clean_text", F.lit(pat), F.lit(0))
            ).alias(f"n_{name}"),
        ).withColumn(
            "clean_text",
            F.regexp_replace("clean_text", pat, f"<{name.upper()}>"),
        )
    return out


@query("tx13_pii_redact")  # no oracle: DuckDB regexp dialect differs (no \b
def tx13_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    # word-boundary parity guarantees); planted-PII semantics are pinned in
    # tests/test_extensions.py instead.
    from .dedup import _spread

    # the sequential regexp chain is CPU-bound and ran single-task on the
    # one-split scan (r18 profile) — spread the slim projection first
    docs = _spread(t(spark, sf_dir, "documents"), "doc_id", "text")
    return redact_pii(docs).select(
        "doc_id",
        "n_email",
        "n_phone",
        "n_ipv4",
        F.length("clean_text").alias("clean_len"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------- #
# tx14: corpus vocabulary — global token frequencies, the input every        #
# tokenizer-training (BPE/unigram) run starts from. One explode + one        #
# hash-partitioned count aggregate (map-side partial combine collapses      #
# per-partition duplicates before the shuffle), then a TakeOrdered top-k    #
# — no global sort materializes. Scales as one pass over the scan.          #
# --------------------------------------------------------------------------- #
_VOCAB_K = 1000


def vocab_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """token → (n_occurrences, n_docs), exact, over the whole corpus."""
    tok = docs.select("doc_id", F.explode(_tokens_spark(text_col)).alias("token"))
    return tok.groupBy("token").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.count_distinct("doc_id").alias("n_docs"),
    )


@query(
    "tx14_vocab",
    # Fully deterministic and SQL-expressible (exact counts; the ORDER BY
    # (n_occurrences DESC, token) is a total order, so the top-k cut is
    # unambiguous) — oracle-gated since round 6. Registered 51st, past the
    # driver gate's 50-slot prefix, so the binding adjudication is the local
    # replica (tests/test_queries_oracle.py enumerates every oracle).
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest({_tokens_sql("text")}) AS token
        FROM documents
    )
    SELECT token,
           COUNT(*) AS n_occurrences,
           COUNT(DISTINCT doc_id) AS n_docs
    FROM tok
    GROUP BY token
    ORDER BY n_occurrences DESC, token
    LIMIT {_VOCAB_K}
    """,
)
def tx14_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exact counts + deterministic order also pinned on planted docs in
    # tests/test_extensions.py.
    docs = t(spark, sf_dir, "documents")
    return (
        vocab_counts(docs)
        .orderBy(F.col("n_occurrences").desc(), "token")
        .limit(_VOCAB_K)
    )



# --------------------------------------------------------------------------- #
# tx15: cross-document duplicated-window statistics.                          #
#                                                                             #
# The training-data signal behind substring-level dedup (Lee et al.,          #
# "Deduplicating Training Data Makes Language Models Better", ACL'22 —        #
# published work): a k-token window occurring in MORE THAN ONE document is    #
# memorization fuel, and the per-document fraction of such windows is the     #
# filter/repair signal a corpus build thresholds on. The reference engine     #
# has no text analysis at all (SURVEY.md §2.C posture: pipeline operators     #
# the reference's users would run AROUND their chunked batches).              #
#                                                                             #
# Scale shape: explode is linear (one row per distinct window per doc, an     #
# 8-byte xxhash64 — not the window text — crosses the shuffle); the shared-   #
# window set comes from ONE hash aggregate on the window key (windows are     #
# pre-distinct per doc, so COUNT(*) counts documents); the join back is a     #
# plain equi-join on the same key, so AQE plans it off the same shuffle.      #
# No driver materialization, no quadratic term, no Python.                    #
# --------------------------------------------------------------------------- #
_WINDOW_K = 8


@query(
    "tx15_dup_windows",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, {_tokens_sql()} AS toks FROM documents
    ), w AS (
        -- len > 0: a zero-token doc has NO windows on the Spark side
        -- (explode of the empty shingle array drops the row), while the
        -- slice dialect here would emit one NULL window and a phantom
        -- row (caught by the round-13 fuzz net; unreachable on the gate
        -- corpus, which has no empty documents)
        SELECT doc_id,
               list_distinct(list_transform(
                   range(1, greatest(len(toks) - {_WINDOW_K - 1}, 1) + 1),
                   i -> array_to_string(toks[i:i+{_WINDOW_K - 1}], ' '))) AS wins
        FROM d WHERE len(toks) > 0
    ), e AS (
        SELECT doc_id, unnest(wins) AS win FROM w
    ), shared AS (
        SELECT win FROM e GROUP BY win HAVING COUNT(*) >= 2
    )
    SELECT e.doc_id,
           COUNT(*) AS n_windows,
           COUNT(*) FILTER (WHERE e.win IN (SELECT win FROM shared))
               AS n_shared_windows,
           ROUND(COUNT(*) FILTER (WHERE e.win IN (SELECT win FROM shared))
                 / COUNT(*), 6) AS shared_ratio
    FROM e GROUP BY e.doc_id ORDER BY e.doc_id
    """,
)
def tx15_dup_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dup_window_stats(t(spark, sf_dir, "documents"))


def dup_window_stats(docs: DataFrame, k: int = _WINDOW_K) -> DataFrame:
    """Per-document duplicated-window stats over k-token windows.

    Windows are materialized column-by-column (toks → wins) so the
    higher-order functions consume columns, not re-evaluated expressions
    (no CSE inside HOF lambdas — same measured pitfall as dd08), and cross
    the shuffle as xxhash64 longs; the DuckDB oracle carries the window
    STRINGS, so agreement also re-verifies the hash-equality argument at
    the whole-query level (collision probability ~n²/2⁶⁴). Short docs
    (1 ≤ tokens < k) emit their single truncated window on both sides —
    the dd08 slice-equivalence contract; ZERO-token docs emit no row at
    all (their padded '' windows would cross-match between empty docs —
    round-13 fuzz finding).
    """
    from pyspark.sql import Window

    from .dedup import _shingles_of, _spread

    wins = (
        _spread(docs, "doc_id", "text")
        .select("doc_id", _tokens_spark().alias("toks"))
        # a zero-token doc would emit one '' window here (the padded
        # shingle) and '' windows CROSS-MATCH between empty docs — drop
        # them, mirroring the oracle's len > 0 (round-13 fuzz finding;
        # no windows means no row, not a phantom shared window)
        .where(F.size("toks") > 0)
        .select("doc_id", _shingles_of(F.col("toks"), k).alias("wins"))
        .select(
            "doc_id",
            F.explode(F.transform(F.col("wins"), lambda w: F.xxhash64(w))).alias(
                "win"
            ),
        )
    )
    # Per-window doc count as a WINDOW function, not aggregate-then-join-
    # back: the exploded frame is the expensive thing (scan + tokenize +
    # shingle per row), and two references to it run the whole pipeline
    # twice. One partitionBy(win) window annotates each row off a single
    # shuffle of a single computation (windows are pre-distinct per doc, so
    # the count counts documents).
    n_docs = F.count(F.lit(1)).over(Window.partitionBy("win"))
    return (
        wins.withColumn("is_shared", (n_docs >= 2).cast("int"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum("is_shared").alias("n_shared_windows"),
            F.round(F.sum("is_shared") / F.count(F.lit(1)), 6).alias(
                "shared_ratio"
            ),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------- #
# tx16: Bloom-prefiltered decontamination — tx10's semantics through the      #
# functions/bloom.py register-blocked Bloom filter. Same exact result (the    #
# confirm join removes the filter's false positives; the filter has no false  #
# negatives by construction), different scale envelope: the PREFILTER's       #
# broadcast payload is the 64 KiB bitmap instead of the benchmark's distinct  #
# n-gram strings, so the corpus-sized probe side never shuffles for           #
# membership. The exact-confirm join is left UNHINTED on purpose: it only     #
# carries the fpp-bounded survivors, and at a benchmark-set size where the    #
# strings outgrow a broadcast AQE picks a shuffle join over exactly that      #
# small survivor set — forcing broadcast there would re-create the problem    #
# the bitmap solves. Shares _decon_grams/_DECON_ORACLE with tx10 so the two   #
# documented-identical queries cannot drift.                                  #
# --------------------------------------------------------------------------- #
@query("tx16_bloom_decontaminate", oracle=_DECON_ORACLE)
def tx16_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.bloom import bloom_bitmap, bloom_prefilter

    grams = _decon_grams(t(spark, sf_dir, "documents"))
    bench = grams.where(F.col("doc_id") < _DECON_BENCH).select("gram").distinct()
    corpus = grams.where(F.col("doc_id") >= _DECON_BENCH)
    candidates = bloom_prefilter(corpus, "gram", bloom_bitmap(bench, "gram"))
    return (
        candidates.join(bench, "gram", "left_semi")
        .select("doc_id")
        .distinct()
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------- #
# tx17: contamination severity — tx10 answers "which docs touch the           #
# benchmark"; pipelines also need HOW MUCH (drop above a fraction, downweight #
# below it). Same shared gram frame, two narrow aggregates joined on doc_id:  #
# per-doc gram totals and per-doc benchmark hits (broadcast semi-side join).  #
# --------------------------------------------------------------------------- #
@query(
    "tx17_contamination_severity",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, {_tokens_sql()} AS w FROM documents
    ),
    g AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   range(0, greatest(len(w) - {_DECON_N}, 0) + 1),
                   i -> array_to_string(w[i + 1 : i + {_DECON_N}], ' ')
               ))) AS gram
        FROM d
    ),
    bench AS (SELECT DISTINCT gram FROM g WHERE doc_id < {_DECON_BENCH}),
    totals AS (
        SELECT doc_id, COUNT(*) AS n_grams FROM g
        WHERE doc_id >= {_DECON_BENCH} GROUP BY doc_id
    ),
    hits AS (
        SELECT doc_id, COUNT(*) AS n_hit FROM g
        WHERE doc_id >= {_DECON_BENCH} AND gram IN (SELECT gram FROM bench)
        GROUP BY doc_id
    )
    SELECT t.doc_id, t.n_grams, h.n_hit,
           ROUND(h.n_hit / t.n_grams, 6) AS overlap_frac
    FROM totals t JOIN hits h ON t.doc_id = h.doc_id
    ORDER BY t.doc_id
    """,
)
def tx17_contamination_severity(spark: SparkSession, sf_dir: str) -> DataFrame:
    grams = _decon_grams(t(spark, sf_dir, "documents"))
    bench = grams.where(F.col("doc_id") < _DECON_BENCH).select("gram").distinct()
    corpus = grams.where(F.col("doc_id") >= _DECON_BENCH)
    totals = corpus.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    hits = (
        corpus.join(F.broadcast(bench), "gram", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return (
        totals.join(hits, "doc_id")
        .select(
            "doc_id",
            "n_grams",
            "n_hit",
            F.round(F.col("n_hit") / F.col("n_grams"), 6).alias("overlap_frac"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------- #
# tx18: BPE merge-step pair counting — ONE iteration of byte-pair-encoding    #
# training (Sennrich et al., "Neural Machine Translation of Rare Words with   #
# Subword Units", ACL'16): count every ADJACENT token pair across the corpus  #
# and surface the top merge candidates. The full trainer loops this count →   #
# merge → recount; the count is the distributed 99% of the work (the merge    #
# table is vocabulary-sized, driver/broadcast material), so this is the       #
# operator a 100 TB tokenizer build runs repeatedly.                          #
#                                                                             #
# Scale shape: slice+zip builds the pair list inside codegen (no Python, no   #
# extra scan), explode is linear in token count, and the groupBy partial-     #
# aggregates map-side before one hash shuffle on the pair; the top-k cut is   #
# TakeOrdered (same shape as tx14's vocab). Deterministic total order         #
# (count DESC, left, right) makes the cut unambiguous in both engines.        #
# --------------------------------------------------------------------------- #
_BPE_TOP_PAIRS = 40


@query(
    "tx18_bpe_merge_pairs",
    # Parallel unnest in DuckDB zips the two shifted slices positionally —
    # exactly arrays_zip's semantics on the Spark side.
    oracle=f"""
    WITH d AS (
        SELECT {_tokens_sql()} AS toks FROM documents
    ), p AS (
        SELECT unnest(toks[1:len(toks)-1]) AS left_tok,
               unnest(toks[2:len(toks)])   AS right_tok
        FROM d WHERE len(toks) >= 2
    )
    SELECT left_tok, right_tok, COUNT(*) AS n_occurrences
    FROM p
    GROUP BY left_tok, right_tok
    ORDER BY n_occurrences DESC, left_tok, right_tok
    LIMIT {_BPE_TOP_PAIRS}
    """,
)
def tx18_bpe_merge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    toks = F.col("toks")
    n = F.size(toks)
    pairs = (
        docs.select(_tokens_spark().alias("toks"))
        .where(n >= 2)
        .select(
            F.explode(
                F.arrays_zip(
                    F.slice(toks, F.lit(1), n - 1).alias("left_tok"),
                    F.slice(toks, F.lit(2), n - 1).alias("right_tok"),
                )
            ).alias("pr")
        )
    )
    return (
        pairs.groupBy(
            F.col("pr.left_tok").alias("left_tok"),
            F.col("pr.right_tok").alias("right_tok"),
        )
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), "left_tok", "right_tok")
        .limit(_BPE_TOP_PAIRS)
    )


# --------------------------------------------------------------------------- #
# tx19: learned quality classifier, linearized — model INFERENCE as pure JVM  #
# expressions. The FineWeb-Edu recipe scores every document with a trained    #
# quality classifier; at 100 TB the scoring pass dominates, and a linear     #
# model over cheap text features (the distilled/regression form of such      #
# classifiers) runs entirely inside whole-stage codegen: the weight vector   #
# is a handful of literals folded into the plan — no UDF, no model server,   #
# no Python on the scoring path. The LOGIT is emitted instead of the        #
# sigmoid: monotone transforms preserve ranking and thresholding, and the    #
# logit is plain multiply/add on 6-dp-rounded features — engine-portable    #
# where exp() libm drift is not. Weights here are illustrative constants;   #
# a real deployment pastes its trained coefficients into _TX19_W.           #
# --------------------------------------------------------------------------- #
_TX19_W = {
    "stopword_ratio": 8.0,   # English prose carries stopwords
    "punct_ratio": -6.0,     # over-punctuation reads as spam/boilerplate
    "digit_ratio": -4.0,     # digit-dense docs are tables/logs
    "log_tokens": 0.5,       # longer docs mildly favored
}
_TX19_BIAS = -2.0
_TX19_THRESHOLD = 0.0  # keep iff logit > 0 (= sigmoid > 0.5)


@query(
    "tx19_classifier_score",
    oracle=f"""
    WITH s AS (
        SELECT doc_id,
               {_tokens_sql()} AS toks,
               length(text) AS n_chars,
               len(regexp_extract_all(text, '{_PUNCT_CLASS}')) AS n_punct,
               len(regexp_extract_all(text, '[0-9]')) AS n_digits
        FROM documents
    ), f AS (
        SELECT doc_id,
               ROUND(len(list_filter(toks, x -> x IN ({_EN_LIST_SQL})))
                     / GREATEST(len(toks), 1), 6) AS stopword_ratio,
               ROUND(n_punct / GREATEST(n_chars, 1), 6) AS punct_ratio,
               ROUND(n_digits / GREATEST(n_chars, 1), 6) AS digit_ratio,
               ROUND(ln(1 + len(toks)), 6) AS log_tokens
        FROM s
    )
    SELECT doc_id, stopword_ratio, punct_ratio, digit_ratio, log_tokens,
           -- UNROUNDED on purpose: both engines run the identical IEEE
           -- multiply/add sequence on the identical 6-dp features, so the
           -- doubles are bit-equal — while ROUND(double, n) itself is the
           -- one op whose boundary behavior differs cross-engine.
           ({_TX19_W['stopword_ratio']} * stopword_ratio
                 + {_TX19_W['punct_ratio']} * punct_ratio
                 + {_TX19_W['digit_ratio']} * digit_ratio
                 + {_TX19_W['log_tokens']} * log_tokens
                 + {_TX19_BIAS}) AS quality_logit,
           ({_TX19_W['stopword_ratio']} * stopword_ratio
                 + {_TX19_W['punct_ratio']} * punct_ratio
                 + {_TX19_W['digit_ratio']} * digit_ratio
                 + {_TX19_W['log_tokens']} * log_tokens
                 + {_TX19_BIAS}) > {_TX19_THRESHOLD} AS keep
    FROM f
    ORDER BY doc_id
    """,
)
def tx19_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread A/B-measured at +0.09 s here (r18) — left on the scan
    docs = t(spark, sf_dir, "documents")
    toks = _tokens_spark()
    n_chars = F.greatest(F.length("text"), F.lit(1))
    n_punct = F.size(F.regexp_extract_all("text", F.lit(_PUNCT_CLASS), F.lit(0)))
    n_digits = F.size(F.regexp_extract_all("text", F.lit("[0-9]"), F.lit(0)))
    feats = docs.select(
        "doc_id",
        F.round(
            _hits_spark(toks, _EN_WORDS) / F.greatest(F.size(toks), F.lit(1)), 6
        ).alias("stopword_ratio"),
        F.round(n_punct / n_chars, 6).alias("punct_ratio"),
        F.round(n_digits / n_chars, 6).alias("digit_ratio"),
        F.round(F.log(F.lit(1) + F.size(toks)), 6).alias("log_tokens"),
    )
    logit = (
        F.lit(_TX19_W["stopword_ratio"]) * F.col("stopword_ratio")
        + F.lit(_TX19_W["punct_ratio"]) * F.col("punct_ratio")
        + F.lit(_TX19_W["digit_ratio"]) * F.col("digit_ratio")
        + F.lit(_TX19_W["log_tokens"]) * F.col("log_tokens")
        + F.lit(_TX19_BIAS)
    )
    return feats.select(
        "doc_id",
        "stopword_ratio",
        "punct_ratio",
        "digit_ratio",
        "log_tokens",
        logit.alias("quality_logit"),
        (logit > _TX19_THRESHOLD).alias("keep"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------- #
# tx20: SPLIT-LEAKAGE audit — exact-duplicate documents that land in          #
# DIFFERENT splits. Deterministic hash splits (tx09) are assigned per doc    #
# id, so two byte-identical documents can straddle train/val — the exact    #
# leak an eval protects against, and the audit every corpus release runs    #
# after dedup + split. Shape: fingerprint hash-agg to duplicate GROUPS      #
# (dd01's shuffle: 16 B fingerprint + split label per doc, never text),     #
# keep groups spanning >1 split, emit one row per leaking group with the    #
# doc count per side. The fingerprint is the SORTED-DISTINCT-TOKEN-SET      #
# hash (word-order-insensitive — the corpus's near-dups are token          #
# reshuffles, which byte-exact md5(text) calls distinct; swap in md5(text)  #
# for the strict form). Composes two existing selectors — the point is     #
# the cross-family audit, not new machinery.                                 #
# --------------------------------------------------------------------------- #
@query(
    "tx20_split_leakage",
    oracle=f"""
    WITH s AS (
        SELECT doc_id,
               md5(array_to_string(list_sort(list_distinct(
                   list_filter(regexp_split_to_array(text, '\\s+'), x -> x != ''))), ' ')) AS fp,
               {_SPLIT_CASE_SQL} AS split
        FROM documents
    )
    SELECT fp,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT split) AS n_splits,
           MIN(doc_id) AS first_doc_id,
           CAST(SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
           CAST(SUM(CASE WHEN split != 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_eval
    FROM s
    GROUP BY fp
    HAVING COUNT(DISTINCT split) > 1
    ORDER BY fp
    """,
)
def tx20_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    s = docs.select(
        "doc_id",
        F.md5(
            F.array_join(F.array_sort(F.array_distinct(_tokens_spark())), " ")
        ).alias("fp"),
        _split_spark().alias("split"),
    )
    return (
        s.groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("split").alias("n_splits"),
            F.min("doc_id").alias("first_doc_id"),
            F.sum(F.when(F.col("split") == "train", 1).otherwise(0)).alias("n_train"),
            F.sum(F.when(F.col("split") != "train", 1).otherwise(0)).alias("n_eval"),
        )
        .where(F.col("n_splits") > 1)
        .orderBy("fp")
    )


# --------------------------------------------------------------------------- #
# tx21: VARIANT semi-structured extraction — Spark 4's shredded-JSON path.    #
# tx05 re-parses the JSON STRING once per get_json_object call; parse_json   #
# shreds each document into the binary VARIANT encoding ONCE, and every     #
# subsequent variant_get is a path lookup into that encoding — with many    #
# extracted paths at 100 TB, parse-once-extract-many is the difference      #
# between one JSON parse and P parses per row. (The testdata's props        #
# carries a single key, so tx05 and tx21 agree numerically; the registered  #
# value is the mechanism + cross-engine agreement, with min/max/sum all     #
# served from one shred.)                                                    #
# --------------------------------------------------------------------------- #
@query(
    "tx21_variant_extract",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def tx21_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").withColumn("v", F.parse_json("props"))
    k = F.try_variant_get("v", "$.k", "long")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(k).alias("sum_k"),
            F.min(k).alias("min_k"),
            F.max(k).alias("max_k"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------- #
# tx22: Zipf power-law fit — the corpus-health diagnostic. Natural-language   #
# token frequencies follow freq ∝ rank^(-s) with s ≈ 1; a corpus whose       #
# log-log slope is far from -1 is telling you something (template spam       #
# flattens it, aggressive dedup steepens it). The fit is ordinary least     #
# squares on (ln rank, ln freq): slope = covar_pop/var_pop — two passes     #
# total: one vocabulary hash-agg (map-side partial counts), one window      #
# rank + one tiny aggregate over the VOCAB table (vocabulary-sized, not    #
# corpus-sized). Every engine-side op is exact until the final ln/division  #
# (rounded 4dp: ln ulp drift is the same accepted class as sp03's pow).    #
# --------------------------------------------------------------------------- #
@query(
    "tx22_zipf_fit",
    oracle=f"""
    WITH vocab AS (
        SELECT token, COUNT(*) AS freq
        FROM (SELECT unnest({_tokens_sql()}) AS token FROM documents)
        GROUP BY token
    ), ranked AS (
        SELECT ln(ROW_NUMBER() OVER (ORDER BY freq DESC, token)) AS lr,
               ln(freq) AS lf
        FROM vocab
    )
    SELECT COUNT(*) AS n_types,
           ROUND(covar_pop(lr, lf) / var_pop(lr), 4) AS zipf_slope,
           ROUND(corr(lr, lf), 4) AS log_log_corr
    FROM ranked
    """,
)
def tx22_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(_tokens_spark()).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    return zipf_fit_over_vocab(vocab)


#: Above this type count the vocabulary rank switches from the single-
#: partition window to the two-phase global rank. 5M tuned empirically:
#: a 5M-row one-task window sort is comfortably sub-second JVM-side,
#: while the always-two-phase form measured +0.64 s of fixed extra jobs
#: at sf0.1. The gate itself costs one count over the persisted vocab
#: (+0.32 s at sf0.1, and the persist is reused by the rank and
#: statistics passes) — the price of removing the documented 100M+-type
#: cliff without slowing the common case to the full two-phase cost.
ZIPF_TWO_PHASE_MIN_TYPES = 5_000_000


def zipf_fit_over_vocab(
    vocab: DataFrame,
    two_phase_min_types: int = ZIPF_TWO_PHASE_MIN_TYPES,
) -> DataFrame:
    """OLS Zipf fit over a (token, freq) vocabulary — tiered rank stage
    (round-7 verdict "Next round #5"): below ``two_phase_min_types`` the
    rank is a plain single-partition ROW_NUMBER (vocab-sized, one fast
    task); at or above it, functions/prefix.with_global_rank range-
    partitions the rank so no single task ever holds the vocabulary
    (plan-asserted SinglePartition-free in tests/test_sources_and_plans
    .py; both tiers equality-tested against each other). The vocab is
    persisted for the gate count + rank + statistics passes and enrolled
    in the prefix-sum release registry."""
    from ..functions.prefix import tiered_global_rank

    ranked = tiered_global_rank(
        vocab,
        [F.col("freq").desc(), F.col("token")],
        unique_cols=["token"],
        out_col="__r",
        min_rows=two_phase_min_types,
    )
    lrlf = ranked.select(
        F.log(F.col("__r").cast("double")).alias("lr"),
        F.log(F.col("freq").cast("double")).alias("lf"),
    )
    return lrlf.agg(
        F.count(F.lit(1)).alias("n_types"),
        F.round(F.covar_pop("lr", "lf") / F.var_pop("lr"), 4).alias("zipf_slope"),
        F.round(F.corr("lr", "lf"), 4).alias("log_log_corr"),
    )


# --------------------------------------------------------------------------- #
# tx23: ORACLE-GATED PII scan + per-source rollup — the adjudicated sibling   #
# of tx13. tx13's redact_pii is the richer production scrub (lookaround      #
# phone/IP patterns Java regex supports but RE2 cannot → rows-only); tx23    #
# restricts itself to the DIALECT-PORTABLE subset (classes, bounded          #
# quantifiers, \b — RE2 and Java agree) plus an SSN family, so the DuckDB   #
# oracle adjudicates the regex semantics and the count/redaction arithmetic  #
# row by row. This corpus is synthetic word-soup, so the gate totals are     #
# structurally zero; DETECTION semantics for both variants are pinned on     #
# planted fixtures in tests/test_extensions.py.                              #
# --------------------------------------------------------------------------- #
#: detector family -> (regex, redaction token). One alternation per family
#: (not per-variant regexes): each extra regexp column is another full pass
#: over the string.
PII_PATTERNS_PORTABLE: "dict[str, tuple[str, str]]" = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "phone": (r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
    "ssn": (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    "ipv4": (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
}


def scan_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add one ``n_<family>`` count column per PII family. Pure JVM
    regexp_count — no Python on the row path."""
    out = df
    for fam, (pat, _tok) in PII_PATTERNS_PORTABLE.items():
        out = out.withColumn(
            f"n_{fam}", F.regexp_count(F.col(text_col), F.lit(pat))
        )
    return out


def redact_pii_portable(df: DataFrame, text_col: str = "text",
                        out_col: str = "redacted") -> DataFrame:
    """Portable-subset redaction (tx23): every hit replaced by its class
    token in one chained JVM regexp_replace. The chain order is pinned by
    the dict and mirrored in the oracle. For the richer lookaround-based
    production scrub, use :func:`redact_pii` (tx13)."""
    expr = F.col(text_col)
    for _fam, (pat, tok) in PII_PATTERNS_PORTABLE.items():
        expr = F.regexp_replace(expr, pat, tok)
    return df.withColumn(out_col, expr)


@query(
    "tx23_pii_scan",
    oracle=f"""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(len(regexp_extract_all(text, '{PII_PATTERNS_PORTABLE["email"][0]}'))) AS BIGINT) AS n_emails,
           CAST(SUM(len(regexp_extract_all(text, '{PII_PATTERNS_PORTABLE["phone"][0]}'))) AS BIGINT) AS n_phones,
           CAST(SUM(len(regexp_extract_all(text, '{PII_PATTERNS_PORTABLE["ssn"][0]}'))) AS BIGINT) AS n_ssns,
           CAST(SUM(len(regexp_extract_all(text, '{PII_PATTERNS_PORTABLE["ipv4"][0]}'))) AS BIGINT) AS n_ipv4,
           CAST(SUM(CASE WHEN len(regexp_extract_all(text, '{PII_PATTERNS_PORTABLE["email"][0]}'))
                     + len(regexp_extract_all(text, '{PII_PATTERNS_PORTABLE["phone"][0]}'))
                     + len(regexp_extract_all(text, '{PII_PATTERNS_PORTABLE["ssn"][0]}'))
                     + len(regexp_extract_all(text, '{PII_PATTERNS_PORTABLE["ipv4"][0]}')) > 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_with_pii,
           CAST(SUM(length(text)) AS BIGINT) AS n_chars_in,
           CAST(SUM(length(
               regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                   text,
                   '{PII_PATTERNS_PORTABLE["email"][0]}', '<EMAIL>', 'g'),
                   '{PII_PATTERNS_PORTABLE["phone"][0]}', '<PHONE>', 'g'),
                   '{PII_PATTERNS_PORTABLE["ssn"][0]}', '<SSN>', 'g'),
                   '{PII_PATTERNS_PORTABLE["ipv4"][0]}', '<IP>', 'g')
           )) AS BIGINT) AS n_chars_redacted
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def tx23_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import _spread

    # the portable-regex scan chain is the cost — spread the one-split
    # scan before it (r18); the groupBy(source) agg shuffles 4 rows/task
    docs = _spread(t(spark, sf_dir, "documents"), "source", "text")
    scanned = redact_pii_portable(scan_pii(docs))
    fams = list(PII_PATTERNS_PORTABLE)
    any_pii = sum(F.col(f"n_{f}") for f in fams) > 0
    return (
        scanned.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_email").alias("n_emails"),
            F.sum("n_phone").alias("n_phones"),
            F.sum("n_ssn").alias("n_ssns"),
            F.sum("n_ipv4").alias("n_ipv4"),
            F.sum(any_pii.cast("long")).alias("n_docs_with_pii"),
            F.sum(F.length("text")).alias("n_chars_in"),
            F.sum(F.length("redacted")).alias("n_chars_redacted"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------- #
# tx13v: the REDACTION REWRITE itself under the hash (round-12 verdict #6).   #
# tx23 adjudicates the portable-subset scan and aggregate redacted lengths,   #
# but on this word-soup corpus the hit totals are structurally ZERO, so the   #
# rewrite rode the hash only as identity. tx13v plants one deterministic PII  #
# string per document — family chosen by doc_id % 4, digits/local-part        #
# closed-form in doc_id, built with the same lpad/concat arithmetic in both   #
# engines — then emits the per-doc REDACTED TEXT, so every document's         #
# replacement (match extent, token substitution, chain order, and the \b     #
# boundary behavior on real hits, which tx23's zero-hit totals never          #
# exercised) is value-hashed against DuckDB. The production lookaround scrub  #
# stays tx13 (rows-only, Java-dialect); this is its RE2/ASCII-safe            #
# adjudicated sibling.                                                        #
# --------------------------------------------------------------------------- #
def _plant_sql() -> str:
    """DuckDB side of the planted document: text || ' ' || one PII string."""
    return """text || ' ' || CASE doc_id % 4
        WHEN 0 THEN 'u' || CAST(doc_id AS VARCHAR) || '@ex'
                    || CAST(doc_id % 7 AS VARCHAR) || '.com'
        WHEN 1 THEN '555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                    || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        WHEN 2 THEN lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
                    || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') || '-'
                    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        ELSE CAST(doc_id % 256 AS VARCHAR) || '.'
             || CAST(doc_id % 250 AS VARCHAR) || '.'
             || CAST(doc_id % 100 AS VARCHAR) || '.'
             || CAST(doc_id % 254 AS VARCHAR)
    END"""


def _plant_spark():
    did = F.col("doc_id")

    def pad(expr, n):
        return F.lpad(expr.cast("string"), n, "0")

    email = F.concat(
        F.lit("u"), did.cast("string"), F.lit("@ex"),
        (did % 7).cast("string"), F.lit(".com"),
    )
    phone = F.concat(
        F.lit("555-"), pad(did % 1000, 3), F.lit("-"), pad(did % 10000, 4)
    )
    ssn = F.concat(
        pad(did % 1000, 3), F.lit("-"), pad(did % 100, 2), F.lit("-"),
        pad(did % 10000, 4),
    )
    ip = F.concat(
        (did % 256).cast("string"), F.lit("."),
        (did % 250).cast("string"), F.lit("."),
        (did % 100).cast("string"), F.lit("."),
        (did % 254).cast("string"),
    )
    fam = (
        F.when(did % 4 == 0, email)
        .when(did % 4 == 1, phone)
        .when(did % 4 == 2, ssn)
        .otherwise(ip)
    )
    return F.concat(F.col("text"), F.lit(" "), fam)


@query(
    "tx13v_pii_redact_portable",
    oracle=f"""
    WITH planted AS (
        SELECT doc_id, {_plant_sql()} AS ptext FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(ptext, '{PII_PATTERNS_PORTABLE["email"][0]}')) AS INT) AS n_email,
           CAST(len(regexp_extract_all(ptext, '{PII_PATTERNS_PORTABLE["phone"][0]}')) AS INT) AS n_phone,
           CAST(len(regexp_extract_all(ptext, '{PII_PATTERNS_PORTABLE["ssn"][0]}')) AS INT) AS n_ssn,
           CAST(len(regexp_extract_all(ptext, '{PII_PATTERNS_PORTABLE["ipv4"][0]}')) AS INT) AS n_ipv4,
           regexp_replace(regexp_replace(regexp_replace(regexp_replace(
               ptext,
               '{PII_PATTERNS_PORTABLE["email"][0]}', '<EMAIL>', 'g'),
               '{PII_PATTERNS_PORTABLE["phone"][0]}', '<PHONE>', 'g'),
               '{PII_PATTERNS_PORTABLE["ssn"][0]}', '<SSN>', 'g'),
               '{PII_PATTERNS_PORTABLE["ipv4"][0]}', '<IP>', 'g') AS redacted
    FROM planted ORDER BY doc_id
    """,
)
def tx13v_pii_redact_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import _spread

    # same single-task regexp-chain cliff as tx13 (r18 profile)
    docs = _spread(t(spark, sf_dir, "documents"), "doc_id", "text").select(
        "doc_id", _plant_spark().alias("ptext")
    )
    scanned = redact_pii_portable(
        scan_pii(docs, text_col="ptext"), text_col="ptext"
    )
    return scanned.select(
        "doc_id",
        F.col("n_email").cast("int").alias("n_email"),
        F.col("n_phone").cast("int").alias("n_phone"),
        F.col("n_ssn").cast("int").alias("n_ssn"),
        F.col("n_ipv4").cast("int").alias("n_ipv4"),
        "redacted",
    ).orderBy("doc_id")


# --------------------------------------------------------------------------- #
# tx26: TOKEN RARITY profile — the inverse-document-frequency signal quality  #
# filters rank on, kept in exact integers so the gate adjudicates it          #
# bit-for-bit (log-space idf is a per-row monotone map the consumer applies;  #
# summing floats cross-engine is order-dependent and would break the value    #
# hash). Per doc: how much of it is made of corpus-common words vs words      #
# seen nowhere else. n_hapax > 0 flags docs carrying unique strings (IDs,     #
# gibberish, PII-ish tokens); high sum_df/n_distinct flags boilerplate.      #
#                                                                            #
# Shape is the classic TF-IDF pipeline: distinct (doc, token) pairs → df     #
# per token → join BACK to the pairs → per-doc aggregate. Scale: the pairs   #
# frame crosses two shuffles (by token for the df aggregate — map-side      #
# partials on array_distinct'd pairs — then by doc_id for the profile);     #
# the join-back reuses the by-token partitioning on both sides, so no third  #
# shuffle. The token key is intrinsically skewed (a stopword's join fan-out  #
# IS its df) — exactly the case AQE skew-join splits; the structural         #
# alternative is broadcasting the df table, sound because vocabulary is      #
# Heaps-bounded (~K·N^0.5, tx22's measured exponent) — sublinear in corpus   #
# size where the corpus itself is not.                                       #
# --------------------------------------------------------------------------- #
@query(
    "tx26_token_rarity",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {_tokens_sql()} AS toks FROM documents
    ), pairs AS (
        SELECT doc_id, unnest(list_distinct(toks)) AS tok FROM toks
    ), dfreq AS (
        SELECT tok, COUNT(*) AS df FROM pairs GROUP BY tok
    ), per_doc AS (
        SELECT doc_id,
               COUNT(*) AS n_distinct,
               CAST(SUM(df) AS BIGINT) AS sum_df,
               MIN(df) AS min_df,
               COUNT(*) FILTER (WHERE df = 1) AS n_hapax
        FROM pairs JOIN dfreq USING (tok)
        GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(len(t.toks) AS BIGINT) AS n_tokens,
           COALESCE(n_distinct, 0) AS n_distinct,
           COALESCE(sum_df, 0) AS sum_df,
           COALESCE(min_df, 0) AS min_df,
           COALESCE(n_hapax, 0) AS n_hapax
    FROM toks t LEFT JOIN per_doc USING (doc_id)
    ORDER BY t.doc_id
    """,
)
def tx26_token_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", _tokens_spark().alias("toks"))
    pairs = toks.select(
        "doc_id", F.explode(F.array_distinct("toks")).alias("tok")
    )
    dfreq = pairs.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    per_doc = (
        pairs.join(dfreq, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_distinct"),
            F.sum("df").alias("sum_df"),
            F.min("df").alias("min_df"),
            F.count(F.when(F.col("df") == 1, 1)).alias("n_hapax"),
        )
    )
    return (
        toks.select("doc_id", F.size("toks").cast("long").alias("n_tokens"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_distinct", F.lit(0)).alias("n_distinct"),
            F.coalesce("sum_df", F.lit(0)).alias("sum_df"),
            F.coalesce("min_df", F.lit(0)).alias("min_df"),
            F.coalesce("n_hapax", F.lit(0)).alias("n_hapax"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------- #
# tx28: Gopher-style document quality RULES (Rae et al., "Scaling Language    #
# Models: Methods, Analysis & Insights from Training Gopher", 2021 — the     #
# published rule set LLM pipelines actually apply before training). Unlike   #
# tx02's continuous score, these are hard accept/reject gates. Every rule    #
# is stated in INTEGER closed form (3*n_words <= chars, 10*sym <= words,     #
# ...) so the DuckDB oracle adjudicates bit-for-bit — no ratio rounding      #
# drift — and the whole pass is one projection inside codegen: at 100 TB     #
# this runs AT THE SCAN with zero shuffles.                                  #
# --------------------------------------------------------------------------- #
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def _tx28_sql() -> str:
    stop = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)
    return f"""
    WITH d AS (
        SELECT doc_id,
               len(list_filter(regexp_split_to_array(text, '{_WS}'),
                   x -> x != '')) AS n_words,
               length(regexp_replace(text, '{_WS}', '', 'g')) AS n_word_chars,
               length(text) - length(replace(text, '#', '')) AS n_hash,
               (length(text) - length(replace(text, '...', ''))) // 3
                   AS n_ellipsis,
               len(regexp_split_to_array(text, '\n')) AS n_lines,
               len(list_filter(regexp_split_to_array(text, '\n'),
                   l -> regexp_matches(l, '^\\s*[-*]'))) AS n_bullet,
               len(list_filter(list_filter(regexp_split_to_array(text, '{_WS}'),
                   x -> x != ''), x -> regexp_matches(x, '[A-Za-z]')))
                   AS n_alpha,
               len(list_filter(list_filter(regexp_split_to_array(text, '{_WS}'),
                   x -> x != ''), x -> lower(x) IN ({stop}))) AS n_stop
        FROM documents
    )
    SELECT doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           CAST(n_words BETWEEN 50 AND 100000 AS BIGINT) AS r_word_count,
           CAST(3 * n_words <= n_word_chars
                AND n_word_chars <= 10 * n_words AS BIGINT) AS r_mean_word_len,
           CAST(10 * (n_hash + n_ellipsis) <= n_words AS BIGINT)
               AS r_symbol_ratio,
           CAST(10 * n_bullet <= n_lines AS BIGINT) AS r_bullets,
           CAST(5 * n_alpha >= 4 * n_words AS BIGINT) AS r_alpha_words,
           CAST(n_stop >= 2 AS BIGINT) AS r_stopwords,
           CAST(n_words BETWEEN 50 AND 100000
                AND 3 * n_words <= n_word_chars
                AND n_word_chars <= 10 * n_words
                AND 10 * (n_hash + n_ellipsis) <= n_words
                AND 10 * n_bullet <= n_lines
                AND 5 * n_alpha >= 4 * n_words
                AND n_stop >= 2 AS BIGINT) AS passes
    FROM d
    ORDER BY doc_id
    """


@query("tx28_gopher_quality_rules", oracle=_tx28_sql())
def tx28_gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import _spread

    # token + line HOF battery per row — one-split scan (r18)
    docs = _spread(t(spark, sf_dir, "documents"), "doc_id", "text")
    base = docs.select(
        "doc_id",
        "text",
        _tokens_spark().alias("toks"),
        F.split(F.col("text"), r"\n").alias("lines"),
    ).select(
        "doc_id",
        F.size("toks").cast("long").alias("n_words"),
        F.length(F.regexp_replace("text", _WS, "")).cast("long")
        .alias("n_word_chars"),
        (F.length("text") - F.length(F.replace(F.col("text"), F.lit("#"))))
        .cast("long").alias("n_hash"),
        F.expr("(length(text) - length(replace(text, '...', ''))) div 3")
        .alias("n_ellipsis"),
        F.size("lines").cast("long").alias("n_lines"),
        F.size(F.filter("lines", lambda l: l.rlike(r"^\s*[-*]")))
        .cast("long").alias("n_bullet"),
        F.size(F.filter("toks", lambda x: x.rlike("[A-Za-z]")))
        .cast("long").alias("n_alpha"),
        F.size(F.filter("toks", lambda x: F.lower(x).isin(*GOPHER_STOPWORDS)))
        .cast("long").alias("n_stop"),
    )
    r_wc = F.col("n_words").between(50, 100000)
    r_len = (3 * F.col("n_words") <= F.col("n_word_chars")) & (
        F.col("n_word_chars") <= 10 * F.col("n_words")
    )
    r_sym = 10 * (F.col("n_hash") + F.col("n_ellipsis")) <= F.col("n_words")
    r_bul = 10 * F.col("n_bullet") <= F.col("n_lines")
    r_alp = 5 * F.col("n_alpha") >= 4 * F.col("n_words")
    r_stp = F.col("n_stop") >= 2
    return base.select(
        "doc_id",
        "n_words",
        r_wc.cast("long").alias("r_word_count"),
        r_len.cast("long").alias("r_mean_word_len"),
        r_sym.cast("long").alias("r_symbol_ratio"),
        r_bul.cast("long").alias("r_bullets"),
        r_alp.cast("long").alias("r_alpha_words"),
        r_stp.cast("long").alias("r_stopwords"),
        (r_wc & r_len & r_sym & r_bul & r_alp & r_stp)
        .cast("long").alias("passes"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------- #
# tx29: n-gram NOVELTY scoring — "how much of this document's content has     #
# not been seen in any earlier document?" First-occurrence attribution:      #
# every distinct 3-gram shingle is owned by the minimum doc_id containing    #
# it; a doc's novelty is the share of its grams it owns. The training use    #
# is corpus ORDERING and incremental-crawl triage (near-zero novelty =       #
# boilerplate/templated content even when no single pair crosses a dedup    #
# threshold — the corpus-level complement of dd08's pairwise view).          #
#                                                                            #
# Plan shape (100 TB): explode grams once; ONE gram-keyed aggregate gives   #
# first owners; n_novel then comes from re-AGGREGATING the owner table by   #
# first_doc — never joining the corpus-sized gram list back to itself —     #
# and the two doc-keyed side tables join onto the doc spine. Linear, two    #
# gram-shuffles + doc-key joins, no quadratic anything. BIGINT basis-point  #
# ratio keeps the oracle hash-exact.                                         #
# --------------------------------------------------------------------------- #
@query(
    "tx29_ngram_novelty",
    oracle=f"""
    WITH d AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(text, '{_WS}'),
                           x -> x != '') AS toks
        FROM documents
    ), g AS (
        SELECT doc_id, unnest(
            list_distinct(list_transform(
                range(1, greatest(len(toks) - 2, 1) + 1),
                i -> array_to_string(toks[i:i+2], ' ')))) AS gram
        FROM d
    ), gg AS (SELECT doc_id, gram FROM g WHERE gram != ''),
    ng AS (SELECT doc_id, COUNT(*) AS n_grams FROM gg GROUP BY doc_id),
    fo AS (SELECT gram, MIN(doc_id) AS first_doc FROM gg GROUP BY gram),
    nv AS (SELECT first_doc AS doc_id, COUNT(*) AS n_novel
           FROM fo GROUP BY first_doc)
    SELECT d.doc_id,
           CAST(COALESCE(ng.n_grams, 0) AS BIGINT) AS n_grams,
           CAST(COALESCE(nv.n_novel, 0) AS BIGINT) AS n_novel,
           CAST(COALESCE(nv.n_novel, 0) * 10000
                // greatest(COALESCE(ng.n_grams, 0), 1) AS BIGINT)
               AS novelty_bp
    FROM d
    LEFT JOIN ng ON d.doc_id = ng.doc_id
    LEFT JOIN nv ON d.doc_id = nv.doc_id
    ORDER BY d.doc_id
    """,
)
def tx29_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import _shingles_of, _spread

    docs = t(spark, sf_dir, "documents")
    # n_grams is just the (distinct, non-empty) shingle-array SIZE — a
    # projection, so the corpus is EXPLODED only once, for the gram-keyed
    # first-owner aggregate (the naive two-aggregate form re-ran the
    # explode per consumer: 2 Generates, 2 corpus shuffles). Grams shuffle
    # as xxhash64 LONGS, not ~20-byte strings — dd08's equality-up-to-
    # collisions argument (driver-green there against a string-set oracle).
    # PERSISTED, dd08's pattern: CollapseProject would inline the whole
    # tokenize->shingle->hash chain INTO the Generate, re-splitting the
    # text per window position (measured: the un-cached explode alone ran
    # 8.4 s at sf0.1 for 260k gram rows; cached, the full query is ~1 s).
    from ..functions.prefix import register_cache

    shingled = register_cache(
        _spread(docs, "doc_id", "text")
        .select("doc_id", _tokens_spark().alias("toks"))
        .select(
            "doc_id",
            F.transform(
                F.filter(
                    _shingles_of(F.col("toks"), 3), lambda g: g != F.lit("")
                ),
                lambda g: F.xxhash64(g),
            ).alias("grams"),
        )
        .persist()
    )
    ng = shingled.select(
        "doc_id", F.size("grams").cast("long").alias("n_grams")
    )
    fo = (
        shingled.select("doc_id", F.explode("grams").alias("gram"))
        .groupBy("gram")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    nv = fo.groupBy("first_doc").agg(F.count(F.lit(1)).alias("n_novel"))
    # ng already carries every doc_id (it is a projection of the corpus
    # scan), so it IS the spine — no extra join against documents.
    return (
        ng.join(nv, F.col("doc_id") == F.col("first_doc"), "left")
        .select(
            "doc_id",
            "n_grams",
            F.coalesce("n_novel", F.lit(0)).cast("long").alias("n_novel"),
            F.expr(
                "CAST(coalesce(n_novel, 0) * 10000 "
                "div greatest(n_grams, 1) AS BIGINT)"
            ).alias("novelty_bp"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------- #
# tx30: language-ID CONFUSION MATRIX — the EVAL half tx03 was missing:        #
# classifier quality is judged on the (tagged, detected) count matrix, not   #
# per-row predictions. One hash aggregate over tx03's argmax projection —    #
# output is |langs|² rows at most, so the rollup is alphabet-bounded at any  #
# corpus size. Each cell ships its ROW-NORMALIZED share in exact BIGINT      #
# basis points — cell·10000 div tagged-language total (a window over the    #
# alphabet-sized aggregate, the q50/sp07 integer-ratio idiom); the diagonal  #
# cells' shares ARE per-language recall. (The first cut divided the cell's  #
# correct-count by the cell's own count — constant 0/10000 per cell, a      #
# metric-free column; round-9 review #3 caught it.)                          #
# --------------------------------------------------------------------------- #
@query(
    "tx30_langid_confusion",
    oracle=f"""
    WITH pred AS (
        SELECT lang AS tagged_lang,
               {_langid_case_sql()} AS detected_lang
        FROM documents
    )
    SELECT tagged_lang, detected_lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(*) * 10000
                // SUM(COUNT(*)) OVER (PARTITION BY tagged_lang)
             AS BIGINT) AS row_share_bp
    FROM pred
    GROUP BY tagged_lang, detected_lang
    ORDER BY tagged_lang, detected_lang
    """,
)
def tx30_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    pred = tx03_langid(spark, sf_dir)
    cells = pred.groupBy("tagged_lang", "detected_lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    return (
        cells.select(
            "tagged_lang",
            "detected_lang",
            "n_docs",
            F.expr(
                "CAST(n_docs * 10000 div "
                "sum(n_docs) OVER (PARTITION BY tagged_lang) AS BIGINT)"
            ).alias("row_share_bp"),
        )
        .orderBy("tagged_lang", "detected_lang")
    )


# --------------------------------------------------------------------------- #
# tx33: sliding-window context chunking — the RAG/context-window prep step a  #
# training-data pipeline runs between cleaning and packing: each document     #
# splits into token windows of WIN_SIZE with WIN_STRIDE overlap, the final    #
# window CLAMPED to end at the document tail (start = n - W) so no token is   #
# dropped and no window underruns W unless the whole doc is shorter. The      #
# whole window set is built as ONE array-of-structs expression and exploded   #
# ONCE (Generate evaluates its child once per input row — the dd08 lesson:    #
# per-window re-tokenization is what a naive explode-then-project plan does). #
# Oracle-exact: spans are integer closed forms of the token count, and the    #
# boundary tokens (first/last of each window) adjudicate the actual SLICING   #
# against DuckDB's list_extract over the shared \s+ tokenization (tx01's      #
# parity convention), so an off-by-one in either engine's window math breaks  #
# the hash. At 100 TB this is one Generate inside the scan stage — no         #
# shuffle, no Python; window count per doc is n/stride-bounded.               #
# --------------------------------------------------------------------------- #
WIN_SIZE = 32
WIN_STRIDE = 24


@query(
    "tx33_sliding_windows",
    oracle=f"""
    WITH tk AS (
        SELECT doc_id, {_tokens_sql()} AS toks FROM documents
    ),
    geo AS (
        SELECT doc_id, toks, len(toks) AS n,
               CASE WHEN len(toks) <= {WIN_SIZE} THEN 1
                    ELSE (len(toks) - {WIN_SIZE} + {WIN_STRIDE} - 1)
                         // {WIN_STRIDE} + 1 END AS n_win
        FROM tk
    ),
    wins AS (
        SELECT doc_id, toks, n, n_win, unnest(range(n_win)) AS win_id
        FROM geo
    ),
    spans AS (
        SELECT doc_id, toks,
               CAST(win_id AS BIGINT) AS win_id,
               CAST(CASE WHEN win_id = n_win - 1
                         THEN GREATEST(n - {WIN_SIZE}, 0)
                         ELSE win_id * {WIN_STRIDE} END AS BIGINT) AS start_tok,
               CAST(CASE WHEN win_id = n_win - 1
                         THEN n
                         ELSE win_id * {WIN_STRIDE} + {WIN_SIZE} END
                    AS BIGINT) AS end_tok
        FROM wins
    )
    SELECT doc_id, win_id, start_tok, end_tok,
           end_tok - start_tok AS win_len,
           list_extract(toks, start_tok + 1) AS first_tok,
           list_extract(toks, end_tok) AS last_tok
    FROM spans ORDER BY doc_id, win_id
    """,
)
def tx33_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    w, s = WIN_SIZE, WIN_STRIDE
    # n_win - 1 (the sequence bound), stated once and reused inside the
    # lambda for the last-window clamp test
    wmax = f"CASE WHEN n <= {w} THEN 0 ELSE CAST((n - {w} + {s} - 1) DIV {s} AS INT) END"
    wins = F.expr(
        f"""
        transform(sequence(0, {wmax}), wi -> named_struct(
            'win_id', CAST(wi AS BIGINT),
            'start_tok', CAST(CASE WHEN wi = ({wmax})
                                   THEN GREATEST(n - {w}, 0)
                                   ELSE wi * {s} END AS BIGINT),
            'end_tok', CAST(CASE WHEN wi = ({wmax})
                                 THEN n
                                 ELSE wi * {s} + {w} END AS BIGINT)))
        """
    )
    return (
        docs.select("doc_id", _tokens_spark().alias("toks"))
        .select("doc_id", "toks", F.size("toks").alias("n"))
        .select("doc_id", "toks", F.explode(wins).alias("wspan"))
        .select(
            "doc_id",
            F.col("wspan.win_id").alias("win_id"),
            F.col("wspan.start_tok").alias("start_tok"),
            F.col("wspan.end_tok").alias("end_tok"),
            (F.col("wspan.end_tok") - F.col("wspan.start_tok")).alias("win_len"),
            F.expr(
                "try_element_at(toks, CAST(wspan.start_tok + 1 AS INT))"
            ).alias("first_tok"),
            # GREATEST(end_tok, 1): a zero-token doc has end_tok = 0 and
            # Spark rejects element_at index 0 outright (it is an error,
            # not an out-of-bounds NULL like DuckDB's list_extract(l, 0));
            # index 1 on the empty array is NULL via try_element_at, which
            # matches the oracle's NULL. For n > 0 end_tok >= 1 always, so
            # this changes nothing on non-degenerate docs.
            F.expr(
                "try_element_at(toks, CAST(GREATEST(wspan.end_tok, 1) AS INT))"
            ).alias("last_tok"),
        )
        .orderBy("doc_id", "win_id")
    )


# --------------------------------------------------------------------------- #
# tx34: SPAN-level decontamination — the surgical form of tx10. Doc-level     #
# dropping (tx10/tx16) throws away a whole document because five tokens of   #
# it appear in a benchmark; at 100 TB that wastes real data, so modern       #
# pipeline decontamination cuts the MATCHED SPANS out and keeps the rest.    #
# Machinery: positional gram matching (posexplode of the shingle array +    #
# broadcast benchmark semi-structure), span→token coverage expansion (one    #
# bounded explode of n indices per match), a per-doc covered-index set      #
# (one doc_id-keyed shuffle, output bounded by matched tokens), and         #
# reconstruction via the index-aware array filter — all JVM expressions,    #
# no Python. Oracle-exact: coverage indices are integers and the kept text  #
# re-joins the SAME parity-proven tokens, so a one-off in either engine's   #
# span arithmetic breaks the hash.                                          #
# --------------------------------------------------------------------------- #
@query(
    "tx34_span_decontaminate",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, {_tokens_sql()} AS w FROM documents
    ),
    g AS (
        SELECT doc_id,
               unnest(list_transform(
                   range(0, greatest(len(w) - {_DECON_N}, 0) + 1),
                   i -> struct_pack(p := i,
                       gram := array_to_string(w[i + 1 : i + {_DECON_N}], ' '))
               )) AS pg
        FROM d
    ),
    hits AS (
        SELECT doc_id, pg.p AS p FROM g
        WHERE doc_id >= {_DECON_BENCH}
          AND pg.gram IN (SELECT pg.gram FROM g WHERE doc_id < {_DECON_BENCH})
    ),
    cov AS (
        -- clamp to the doc's token count: a doc shorter than the gram
        -- width still emits one (NULL-padded) gram, and a match on it
        -- must not cover indices past the last real token
        SELECT DISTINCT hits.doc_id, p + j AS ti
        FROM hits JOIN d USING (doc_id), unnest(range({_DECON_N})) AS t(j)
        WHERE p + j < len(d.w)
    ),
    covagg AS (
        SELECT doc_id, list(ti) AS cov FROM cov GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(len(d.w) AS INT) AS n_tokens,
           CAST(COALESCE(len(covagg.cov), 0) AS INT) AS n_removed,
           CAST(len(d.w) - COALESCE(len(covagg.cov), 0) AS INT) AS n_kept,
           -- DuckDB's array_to_string of an EMPTY list is NULL where
           -- Spark's concat_ws is '' — coalesce to match (fully-covered
           -- docs keep zero tokens)
           COALESCE(array_to_string(list_filter(
               list_transform(range(0, len(d.w)),
                   k -> CASE WHEN list_contains(COALESCE(covagg.cov, []), k)
                             THEN NULL ELSE d.w[k + 1] END),
               x -> x IS NOT NULL), ' '), '') AS kept_text
    FROM d LEFT JOIN covagg USING (doc_id)
    WHERE d.doc_id >= {_DECON_BENCH}
    ORDER BY d.doc_id
    """,
)
def tx34_span_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import _spread

    # positional-gram explosion + span surgery are CPU-bound and ran
    # single-task on the one-split scan (r18 profile) — spread first
    docs = _spread(t(spark, sf_dir, "documents"), "doc_id", "text")
    n = _DECON_N
    with_toks = docs.select("doc_id", _tokens_spark().alias("toks"))
    # positional grams: (doc_id, p, gram) — the POSITION is what tx10's
    # distinct-gram form discards and span surgery needs
    toks = F.col("toks")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    pos_grams = with_toks.select(
        "doc_id",
        F.size(toks).alias("nt"),
        F.explode(
            F.transform(
                idx,
                lambda i: F.struct(
                    i.alias("p"),
                    # try_element_at: a doc shorter than the gram width
                    # pads with NULLs (concat_ws skips them), matching the
                    # oracle's short list slice; strict element_at ERRORS
                    # past the bound instead of padding
                    F.concat_ws(
                        " ",
                        *[
                            F.try_element_at(toks, (i + j + 1).cast("int"))
                            for j in range(n)
                        ],
                    ).alias("gram"),
                ),
            )
        ).alias("pg"),
    ).select(
        "doc_id", "nt", F.col("pg.p").alias("p"), F.col("pg.gram").alias("gram")
    ).where(
        # a zero-token doc's padded gram is '' in Spark (concat_ws skips
        # NULLs) but NULL in DuckDB's slice — drop it on THIS side so an
        # empty-vs-empty match can never diverge cross-engine; any doc
        # with >= 1 token grams identically in both dialects
        F.col("nt") > 0
    )
    bench = (
        pos_grams.where(F.col("doc_id") < _DECON_BENCH)
        .select("gram")
        .distinct()
    )
    # matched span starts -> covered token indices (bounded: n per match)
    covered = (
        pos_grams.where(F.col("doc_id") >= _DECON_BENCH)
        .join(F.broadcast(bench), "gram", "left_semi")
        .select(
            "doc_id",
            # LEAST(nt - 1): a doc shorter than the gram width emits one
            # NULL-padded gram; a match on it covers only the real tokens,
            # so n_removed can never exceed n_tokens (oracle mirrors with
            # p + j < len(w))
            F.explode(
                F.sequence(
                    F.col("p"), F.least(F.col("p") + n - 1, F.col("nt") - 1)
                )
            ).alias("ti"),
        )
        .distinct()
        .groupBy("doc_id")
        .agg(F.collect_set("ti").alias("cov"))
    )
    corpus = with_toks.where(F.col("doc_id") >= _DECON_BENCH)
    cov = F.coalesce(F.col("cov"), F.array())
    kept = F.filter(
        F.col("toks"), lambda x, i: ~F.array_contains(cov, i.cast("long"))
    )
    return (
        corpus.join(covered, "doc_id", "left")
        .select(
            "doc_id",
            F.size("toks").alias("n_tokens"),
            F.size(cov).alias("n_removed"),
            (F.size("toks") - F.size(cov)).alias("n_kept"),
            F.concat_ws(" ", kept).alias("kept_text"),
        )
        .orderBy("doc_id")
    )

# --------------------------------------------------------------------------- #
# tx35: EXACT SUBSTRING DEDUP with span removal — the Lee et al. ("Dedupli-   #
# cating Training Data Makes Language Models Better", 2022) operation tx15    #
# only MEASURES: any token span duplicating one that first occurred in an     #
# EARLIER document is cut out; the first corpus occurrence keeps its text.    #
# Machinery is tx34's positional-gram surgery pointed at the corpus itself:   #
# the per-gram MIN(doc_id) table (the gram-frequency table every substring-   #
# dedup pipeline builds; Heaps-bounded but corpus-scale, so it stays a        #
# shuffle join — never a broadcast), a first_doc < doc_id hit filter, the     #
# clamped coverage explode, and index-aware reconstruction. All JVM; the      #
# kept_text of every document rides the oracle hash. Doc-id order as the     #
# keep-priority makes the result deterministic under any execution order —   #
# the property a distributed dedup MUST have (a "first seen at runtime"      #
# rule would be racy).                                                        #
# --------------------------------------------------------------------------- #
_SSD_N = 4  # span gram width; 4 gives real coverage on the gate corpus
            # (233 of 500 sf0.01 docs carry an earlier-doc dup gram)


@query(
    "tx35_substring_dedup",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, {_tokens_sql()} AS w FROM documents
    ),
    g AS (
        SELECT doc_id,
               unnest(list_transform(
                   range(0, greatest(len(w) - {_SSD_N}, 0) + 1),
                   i -> struct_pack(p := i,
                       gram := array_to_string(w[i + 1 : i + {_SSD_N}], ' '))
               )) AS pg
        FROM d WHERE len(w) > 0
    ),
    firsts AS (
        SELECT pg.gram AS gram, MIN(doc_id) AS first_doc FROM g GROUP BY 1
    ),
    hits AS (
        SELECT g.doc_id AS doc_id, pg.p AS p
        FROM g JOIN firsts ON pg.gram = firsts.gram
        WHERE firsts.first_doc < g.doc_id
    ),
    cov AS (
        SELECT DISTINCT hits.doc_id, p + j AS ti
        FROM hits JOIN d USING (doc_id), unnest(range({_SSD_N})) AS t(j)
        WHERE p + j < len(d.w)
    ),
    covagg AS (
        SELECT doc_id, list(ti) AS cov FROM cov GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(len(d.w) AS INT) AS n_tokens,
           CAST(COALESCE(len(covagg.cov), 0) AS INT) AS n_removed,
           CAST(len(d.w) - COALESCE(len(covagg.cov), 0) AS INT) AS n_kept,
           COALESCE(array_to_string(list_filter(
               list_transform(range(0, len(d.w)),
                   k -> CASE WHEN list_contains(COALESCE(covagg.cov, []), k)
                             THEN NULL ELSE d.w[k + 1] END),
               x -> x IS NOT NULL), ' '), '') AS kept_text
    FROM d LEFT JOIN covagg USING (doc_id)
    ORDER BY d.doc_id
    """,
)
def tx35_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup_substring_spans(t(spark, sf_dir, "documents"))


def _positional_grams(docs: DataFrame, n: int) -> DataFrame:
    """(doc_id, nt, p, gram): every document's positional n-grams, built
    as ONE transform expression and exploded once. Zero-token docs are
    excluded — their padded gram is '' in Spark (concat_ws skips NULLs)
    but NULL in the oracle's slice dialect (the tx34 rule). Shared by
    tx35's batch form, tx36's incremental form, and the gram store's
    ingest/claim paths. A _spread of the input was tried and REVERTED on
    measurement (r18 A/B: net flat-to-negative across the family — the
    consumers are chunk/batch loops whose per-chunk extra exchange costs
    what the parallelized tokenize saves, and the downstream
    repartition(n_buckets, gram) already spreads the heavy join work)."""
    with_toks = docs.select("doc_id", _tokens_spark().alias("toks"))
    toks = F.col("toks")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    return (
        with_toks.select(
            "doc_id",
            F.size(toks).alias("nt"),
            F.explode(
                F.transform(
                    idx,
                    lambda i: F.struct(
                        i.alias("p"),
                        F.concat_ws(
                            " ",
                            *[
                                F.try_element_at(toks, (i + j + 1).cast("int"))
                                for j in range(n)
                            ],
                        ).alias("gram"),
                    ),
                )
            ).alias("pg"),
        )
        .select(
            "doc_id",
            "nt",
            F.col("pg.p").alias("p"),
            F.col("pg.gram").alias("gram"),
        )
        .where(F.col("nt") > 0)
    )


def _apply_span_removal(docs: DataFrame, hits: DataFrame, n: int) -> DataFrame:
    """(doc_id, n_tokens, n_removed, n_kept, kept_text) from a frame of
    span HITS (doc_id, nt, p — each an n-gram start position to cut):
    tx34's clamped coverage explode + index-aware reconstruction, shared
    by tx35's batch form, tx36's incremental form, and the postings-store
    ingest (gram_store.py)."""
    covered = (
        hits.select(
            "doc_id",
            F.explode(
                F.sequence(
                    F.col("p"), F.least(F.col("p") + n - 1, F.col("nt") - 1)
                )
            ).alias("ti"),
        )
        .distinct()
        .groupBy("doc_id")
        .agg(F.collect_set("ti").alias("cov"))
    )
    with_toks = docs.select("doc_id", _tokens_spark().alias("toks"))
    cov = F.coalesce(F.col("cov"), F.array())
    kept = F.filter(
        F.col("toks"), lambda x, i: ~F.array_contains(cov, i.cast("long"))
    )
    # UNORDERED on purpose (r19): this engine runs once per ingest CHUNK
    # in the gram-store loops (tx38/40-43, st13, tx37) whose per-chunk
    # localCheckpoint paid the trailing sort's range-boundary sample by
    # re-running the whole span surgery, then ran it again for the sort —
    # and chunk results feed sinks/unions that never needed order. The
    # query-result consumers that DO declare an order re-sort at their
    # tail (dedup_substring_spans / tx36's helper via barriered_order,
    # tx37/st13 over their checkpointed results).
    return with_toks.join(covered, "doc_id", "left").select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.size(cov).alias("n_removed"),
        (F.size("toks") - F.size(cov)).alias("n_kept"),
        F.concat_ws(" ", kept).alias("kept_text"),
    )


def dedup_substring_spans(docs: DataFrame, n: int = _SSD_N) -> DataFrame:
    """tx35's body as a composable stage: (doc_id, n_tokens, n_removed,
    n_kept, kept_text) with every span duplicating an earlier document's
    n-gram cut out. Drop-in between near-dup removal and decontamination
    in a pipeline (examples/training_pipeline.py)."""
    pos_grams = _positional_grams(docs, n)
    # the gram-frequency table: corpus-scale, map-side-combined MIN — a
    # shuffle join on gram, deliberately NOT broadcast (Heaps-bounded but
    # huge at 100 TB)
    firsts = pos_grams.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    hits = (
        pos_grams.join(firsts, "gram")
        .where(F.col("doc_id") > F.col("first_doc"))
        .select("doc_id", "nt", "p")
    )
    from .registry import barriered_order

    return barriered_order(_apply_span_removal(docs, hits, n), "doc_id")

# --------------------------------------------------------------------------- #
# tx36: INCREMENTAL substring dedup — tx35's ingest form. A live pipeline     #
# doesn't re-scan the corpus per batch: it keeps a GRAM STORE (the distinct   #
# n-grams of everything already ingested) and cuts each arriving batch's      #
# spans against (a) the store and (b) earlier documents in the same batch.    #
# The store side is one left-semi join against the distinct-gram table (at    #
# 100 TB that table is the pipeline's persistent artifact, Heaps-bounded,     #
# bucket-able by gram hash); the within-batch half reuses tx35's             #
# first-occurrence rule. Adjudicated with sim11's planting device: the       #
# increment is a deterministic corpus slice (doc_id % 5 == 4), the store is  #
# the rest, so the oracle states both halves in plain SQL — store docs rank  #
# before every increment doc, increment docs rank by doc_id.                 #
# --------------------------------------------------------------------------- #
_TX36_MOD, _TX36_RES = 5, 4  # increment = doc_id % 5 == 4


def incremental_substring_dedup(
    new_docs: DataFrame, gram_store: DataFrame, n: int = _SSD_N
) -> DataFrame:
    """(doc_id, n_tokens, n_removed, n_kept, kept_text) for the ARRIVING
    batch: spans whose n-grams exist in ``gram_store`` (one column,
    ``gram`` — the distinct grams of the already-ingested corpus) or in an
    earlier same-batch document are cut. Close the loop by unioning the
    batch's own distinct grams into the store afterward. Store-side
    lookup is a semi join (never a broadcast: the store is corpus-scale);
    the within-batch rule is tx35's MIN(doc_id) table over the batch.

    The distinct-gram store is APPEND-ONLY: purging a document (DMCA,
    quality) cannot un-claim its grams from this layout — a
    deletion-capable store keeps (gram, doc_id) postings and compacts
    like compact_near_dup_store does for the minhash store, at ~n_grams
    storage instead of n_distinct_grams. Choose by whether the corpus
    has a purge path."""
    pos = _positional_grams(new_docs, n)
    firsts = pos.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    store_hits = pos.join(gram_store.select("gram"), "gram", "left_semi")
    batch_hits = (
        pos.join(firsts, "gram")
        .where(F.col("doc_id") > F.col("first_doc"))
        .select("doc_id", "nt", "p")
    )
    hits = store_hits.select("doc_id", "nt", "p").unionByName(batch_hits)
    from .registry import barriered_order

    return barriered_order(_apply_span_removal(new_docs, hits, n), "doc_id")


@query(
    "tx36_incremental_substring_dedup",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, {_tokens_sql()} AS w FROM documents
    ),
    g AS (
        SELECT doc_id,
               unnest(list_transform(
                   range(0, greatest(len(w) - {_SSD_N}, 0) + 1),
                   i -> struct_pack(p := i,
                       gram := array_to_string(w[i + 1 : i + {_SSD_N}], ' '))
               )) AS pg
        FROM d WHERE len(w) > 0
    ),
    store_grams AS (
        SELECT DISTINCT pg.gram AS gram FROM g
        WHERE doc_id % {_TX36_MOD} != {_TX36_RES}
    ),
    inc AS (
        SELECT doc_id, pg.p AS p, pg.gram AS gram FROM g
        WHERE doc_id % {_TX36_MOD} = {_TX36_RES}
    ),
    firsts AS (
        SELECT gram, MIN(doc_id) AS first_doc FROM inc GROUP BY gram
    ),
    hits AS (
        SELECT doc_id, p FROM inc
        WHERE gram IN (SELECT gram FROM store_grams)
        UNION ALL
        SELECT inc.doc_id, inc.p FROM inc JOIN firsts USING (gram)
        WHERE firsts.first_doc < inc.doc_id
    ),
    cov AS (
        SELECT DISTINCT hits.doc_id, p + j AS ti
        FROM hits JOIN d USING (doc_id), unnest(range({_SSD_N})) AS t(j)
        WHERE p + j < len(d.w)
    ),
    covagg AS (
        SELECT doc_id, list(ti) AS cov FROM cov GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(len(d.w) AS INT) AS n_tokens,
           CAST(COALESCE(len(covagg.cov), 0) AS INT) AS n_removed,
           CAST(len(d.w) - COALESCE(len(covagg.cov), 0) AS INT) AS n_kept,
           COALESCE(array_to_string(list_filter(
               list_transform(range(0, len(d.w)),
                   k -> CASE WHEN list_contains(COALESCE(covagg.cov, []), k)
                             THEN NULL ELSE d.w[k + 1] END),
               x -> x IS NOT NULL), ' '), '') AS kept_text
    FROM d LEFT JOIN covagg USING (doc_id)
    WHERE d.doc_id % {_TX36_MOD} = {_TX36_RES}
    ORDER BY d.doc_id
    """,
)
def tx36_incremental_substring_dedup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Round-13 contract, kept adjudicated as-is. For PERSISTED stores the
    round-14 GramPostingsStore (operators/gram_store.py) supersedes this
    distinct-gram layout: bucketed (flat per-batch probes across a store
    decade vs 1.24-1.6x here — SCALING.md), deletion-capable, compactable.
    This in-memory-frame form remains the right tool when the "store" is
    itself a transient frame (a single backfill's earlier slice)."""
    docs = t(spark, sf_dir, "documents")
    is_inc = F.col("doc_id") % _TX36_MOD == _TX36_RES
    store_grams = (
        _positional_grams(docs.where(~is_inc), _SSD_N)
        .select("gram")
        .distinct()
    )
    return incremental_substring_dedup(docs.where(is_inc), store_grams)
