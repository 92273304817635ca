"""Distributed BPE tokenizer TRAINING (SURVEY.md §2.C text analysis; the
iterative half of tx18's single-step pair count).

Classic byte-pair encoding (Sennrich et al., "Neural Machine Translation
of Rare Words with Subword Units", ACL 2016 — published algorithm, public
knowledge) trains on the WORD-FREQUENCY table, not the corpus: after one
distributed word-count pass (Heaps'-bounded output), every iteration
operates on vocabulary-sized state — count all adjacent symbol pairs
weighted by word frequency, pick the most frequent pair, merge it in
every word containing it. The Spark formulation keeps exactly that
split:

- ONE corpus-scale pass (``vocab_counts``-shaped word count);
- per iteration: a pair-count aggregate over the exploded symbol arrays
  (map-side partials, one small shuffle), an ARGMAX of one row to the
  driver, and a vectorized Arrow re-encode of only the words that contain
  the merged pair (everything else passes through untouched);
- lineage truncated per iteration (``localCheckpoint``) so round k never
  replays rounds 1..k-1.

Determinism: ties on pair count break lexicographically on the pair
itself — pinned against a pure-Python reference implementation in
tests/test_extensions.py, merge-for-merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.driver_rows import driver_rows_df
from .registry import query, t


def _word_symbols(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq, syms array<string>) — BPE's training state: distinct
    words with corpus frequencies, split into single-character symbols
    with the end-of-word marker the published algorithm uses."""
    from .text import _tokens_spark

    words = (
        docs.select(F.explode(_tokens_spark(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    return words.select(
        "word",
        "freq",
        F.concat(
            F.split(F.col("word"), ""),  # single characters
            F.array(F.lit("</w>")),
        ).alias("syms"),
        # The state is vocabulary-sized (Heaps-bounded) but inherits the
        # word count's full shuffle width; right-size it so each training
        # iteration schedules a handful of tasks, not the session's full
        # shuffle count (a 100M-type vocabulary raises this to keep
        # partitions executor-sized — it does not change the loop). At
        # gate scale the measured cost is ~0.45 s/merge either way: two
        # actions per iteration (argmax + checkpointed re-encode) is the
        # floor, which is why the registered query trains 6 merges and
        # the reference-equality test carries the longer sequence.
    ).coalesce(4)


def _pair_counts(state: DataFrame) -> DataFrame:
    """freq-weighted adjacent-pair counts over the symbol arrays — the
    tx18 shape: slice+arrays_zip inside codegen, explode, map-side
    partial agg, ONE small shuffle on the pair."""
    pairs = state.select(
        "freq",
        F.explode(
            F.arrays_zip(
                F.slice(F.col("syms"), 1, F.size("syms") - 1).alias("a"),
                F.slice(F.col("syms"), 2, F.size("syms") - 1).alias("b"),
            )
        ).alias("p"),
    ).select("freq", F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    return pairs.groupBy("a", "b").agg(F.sum("freq").alias("n"))


def bpe_train(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
) -> "tuple[list[tuple[str, str]], DataFrame]":
    """Train ``n_merges`` BPE merges over the corpus; returns
    ``(merges, final_state)`` where ``merges`` is the ordered merge list
    and ``final_state`` the (word, freq, syms) table encoded under them.

    Each iteration's driver traffic is ONE (pair, count) row — the argmax
    — never the vocabulary.

    Checkpoints are LAZY (eager=False): each round's re-encoded state
    materializes inside the NEXT round's argmax job (TakeOrdered scans
    every partition, so the whole state persists as a side effect) —
    one job per merge instead of two, and the final round's state never
    materializes at all unless the caller consumes it. Lineage is still
    truncated round-by-round: truncation happens at materialization,
    which is never more than one round behind."""
    state = _word_symbols(docs, text_col).localCheckpoint(eager=False)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        top = (
            _pair_counts(state)
            # deterministic tie-break: count desc, then pair lexicographic
            .orderBy(F.col("n").desc(), "a", "b")
            .limit(1)
            .collect()  # bounded: the argmax — exactly one row
        )
        if not top:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        merged = a + b

        def apply_merge(it, a=a, b=b, merged=merged):
            for pdf in it:
                out = []
                for syms in pdf["syms"]:
                    syms = list(syms)
                    # fast reject: untouched words pass through unscanned
                    if a in syms:
                        i, new = 0, []
                        while i < len(syms):
                            if (
                                i + 1 < len(syms)
                                and syms[i] == a
                                and syms[i + 1] == b
                            ):
                                new.append(merged)
                                i += 2
                            else:
                                new.append(syms[i])
                                i += 1
                        syms = new
                    out.append(syms)
                pdf = pdf.copy()
                pdf["syms"] = out
                yield pdf

        state = state.mapInPandas(
            apply_merge, schema="word string, freq long, syms array<string>"
        ).localCheckpoint(eager=False)  # truncated at next round's argmax
    return merges, state


@query("tx24_bpe_train")  # rows-only: an iterative trainer isn't SQL
def tx24_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six merges trained on the documents corpus; returns the ordered
    merge table (rank, left, right, merged). Six keeps the registered
    query bench-lean (each merge costs one pair-count job + one Arrow
    re-encode); the merge-for-merge equality with a pure-Python reference
    BPE — including tie-breaks — is pinned in tests/test_extensions.py."""
    docs = t(spark, sf_dir, "documents")
    merges, _state = bpe_train(docs, n_merges=6)
    return driver_rows_df(
        spark,
        [(i + 1, a, b, a + b) for i, (a, b) in enumerate(merges)],
        "rank int, left string, right string, merged string",
    )


#: Driver gate for the local training fast path: a (word, freq) vocabulary
#: of 100k rows is a few MB — tokenizer training on a bounded sample is
#: driver-scale work at ANY corpus size (the HF-tokenizers posture, same
#: stance as sim10's codebook training).
BPE_LOCAL_VOCAB_GATE = 100_000


def bpe_train_local(docs: DataFrame, n_merges: int,
                    text_col: str = "text") -> "list[tuple[str, str]]":
    """Merge table from ONE distributed word-count pass + a driver-side
    training loop — the fast path for sample-trained tokenizers, where
    per-iteration Spark jobs would be pure overhead (12 merges measured
    4.2 s distributed vs ~0.5 s here at gate scale). Identical merges to
    :func:`bpe_train` (same tie-break; pinned in tests). Raises past the
    vocabulary gate — huge-vocab corpora use the distributed loop."""
    from .text import _tokens_spark

    vocab_df = (
        docs.select(F.explode(_tokens_spark(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    rows = (
        vocab_df.limit(BPE_LOCAL_VOCAB_GATE + 1)
        .collect()  # bounded: the vocab gate — a few MB of (word, freq)
    )
    if len(rows) > BPE_LOCAL_VOCAB_GATE:
        raise ValueError(
            f"bpe_train_local: vocabulary exceeds the {BPE_LOCAL_VOCAB_GATE}"
            f"-word driver gate; use the distributed bpe_train loop"
        )
    vocab = {tuple(list(r["word"]) + ["</w>"]): r["freq"] for r in rows}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pc: dict = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pc[p] = pc.get(p, 0) + f
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        nv: dict = {}
        for syms, f in vocab.items():
            syms = list(syms)
            i, new = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    new.append(a + b)
                    i += 2
                else:
                    new.append(syms[i])
                    i += 1
            nv[tuple(new)] = nv.get(tuple(new), 0) + f
        vocab = nv
    return merges


def bpe_encode_token_counts(
    docs: DataFrame,
    merges: "list[tuple[str, str]]",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_words, n_bpe_tokens): encode every document under a
    trained merge table — the corpus-wide APPLY pass (the inference half;
    tx07's regex count is the merge-free approximation of this).

    One Arrow pass; the merge ranks broadcast inside the closure (a merge
    table is vocabulary-scale driver material, same stance as tx18). Each
    word encodes by repeatedly merging its lowest-rank adjacent pair —
    the published algorithm — with a per-batch WORD CACHE: natural text
    repeats words heavily, so amortized cost per row is a dict hit, not a
    merge loop."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    merge_list = list(merges)

    def enc(it):
        import pandas as pd

        cache: dict = {}

        def enc_word(w: str) -> int:
            hit = cache.get(w)
            if hit is not None:
                return hit
            syms = list(w) + ["</w>"]
            while len(syms) > 1:
                best = None
                for i in range(len(syms) - 1):
                    r = ranks.get((syms[i], syms[i + 1]))
                    if r is not None and (best is None or r < best):
                        best = r
                if best is None:
                    break
                a, b = merge_list[best]
                i, new = 0, []
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        new.append(a + b)
                        i += 2
                    else:
                        new.append(syms[i])
                        i += 1
                syms = new
            cache[w] = len(syms)
            return len(syms)

        import re

        # RE2-exact whitespace class [ \t\n\f\r] — the rule the DuckDB
        # oracles split on. Neither Python str.split() (Unicode ws,
        # U+00A0/U+3000/...) nor re.ASCII \s nor Java \s matches it
        # exactly: the latter two also include \x0b, which RE2 \s does
        # NOT. An adjudicated path must mirror its ORACLE's dialect; the
        # \x0b gap between Java-split queries and their RE2 oracles is a
        # corpus contract (no vertical tabs) shared by the whole suite.
        ws = re.compile(r"[ \t\n\f\r]+")
        for pdf in it:
            n_words, n_toks = [], []
            for text in pdf[text_col]:
                words = [w for w in ws.split(text or "") if w]
                n_words.append(len(words))
                n_toks.append(sum(enc_word(w) for w in words))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_words": n_words,
                    "n_bpe_tokens": n_toks,
                }
            )

    return docs.select("doc_id", text_col).mapInPandas(
        enc, schema="doc_id long, n_words long, n_bpe_tokens long"
    )


@query("tx25_bpe_encode")  # rows-only: iterative merge application isn't SQL
def tx25_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train on a SAMPLE, encode the corpus — the shape a real pipeline
    runs (a tokenizer trains on a bounded sample; the corpus-wide work is
    the apply pass). Sample = first 200 docs by doc_id (deterministic);
    12 merges; output is per-doc exact BPE token counts. End-to-end
    equality with a pure-Python train+encode reference is pinned in
    tests/test_extensions.py."""
    docs = t(spark, sf_dir, "documents")
    sample = docs.orderBy("doc_id").limit(200)
    merges = bpe_train_local(sample, n_merges=12)
    return bpe_encode_token_counts(docs, merges).orderBy("doc_id")


# --------------------------------------------------------------------------- #
# tx27: the BPE ENCODE pass under a FIXED merge table, oracle-adjudicated     #
# (round-8 verdict "Next round #3": the tokenizer family rested on pure-      #
# Python pins; this puts the exact Arrow encode path tx25 runs onto the      #
# driver's DuckDB track).                                                     #
#                                                                             #
# Oracle trick: the merge pairs below have PAIRWISE-DISJOINT character sets   #
# and distinct characters within each pair, so (a) merges commute — no rank   #
# interaction — and (b) each merge's application count in a word equals the   #
# leftmost-non-overlapping substring count of its pair in the ORIGINAL text   #
# (a merged 2-char symbol can never create or destroy another listed pair).   #
# Token count is then closed-form:                                            #
#     n_bpe_tokens = n_non_ws_chars + n_words − Σ_m occurrences(m)            #
# (each word contributes len(word)+1 for the </w> marker, minus one per       #
# merge application), and occurrences are countable on the raw text because   #
# no pair spans whitespace. Verified against the real encoder over 20k        #
# randomized + hostile words (tests/test_extensions.py); the encode path      #
# itself is bpe_encode_token_counts — the SAME mapInPandas tx25 uses.         #
# --------------------------------------------------------------------------- #
TX27_FIXED_MERGES: "list[tuple[str, str]]" = [
    ("t", "h"), ("e", "r"), ("o", "n"), ("a", "d"),
    ("i", "s"), ("l", "y"), ("u", "m"),
]


def _tx27_occ_sql(pair: "tuple[str, str]") -> str:
    p = pair[0] + pair[1]
    return f"(length(text) - length(replace(text, '{p}', ''))) // 2"


@query(
    "tx27_bpe_fixed_encode",
    oracle=f"""
    SELECT doc_id,
           CAST(len(list_filter(regexp_split_to_array(text, '\\s+'),
                    x -> x != '')) AS BIGINT) AS n_words,
           CAST(length(regexp_replace(text, '\\s+', '', 'g'))
                + len(list_filter(regexp_split_to_array(text, '\\s+'),
                      x -> x != ''))
                - ({" + ".join(_tx27_occ_sql(m) for m in TX27_FIXED_MERGES)})
             AS BIGINT) AS n_bpe_tokens
    FROM documents
    ORDER BY doc_id
    """,
)
def tx27_bpe_fixed_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return bpe_encode_token_counts(docs, TX27_FIXED_MERGES).orderBy("doc_id")


# --------------------------------------------------------------------------- #
# tx31: the distributed BPE TRAINER under oracle adjudication (round-9        #
# verdict #4: tx24's merge table rested on a pure-Python pin; this drives     #
# the SAME bpe_train loop — distributed pair counts, one-row argmax, Arrow    #
# re-encode per round — on a PLANTED corpus whose argmax sequence is          #
# closed-form, so DuckDB can independently derive the full ordered merge     #
# table and the driver gate hash-compares it).                                #
#                                                                             #
# Corpus construction (tx27's disjoint-charset trick, extended to the         #
# TRAINER): word_i = a_i b_i a_i b_i over pairwise-disjoint char pairs, with  #
# corpus frequency f_i. Pair counts in "abab</w>": (a,b)=2f, (b,a)=f,         #
# (b,</w>)=f — the DOUBLED pair beats every single-count pair as long as      #
# 2·min(f) > max(f), and merging (a,b)→"ab" only creates ("ab","ab")=f and    #
# ("ab","</w>")=f, both ≤ max(f) < 2·min(f), so post-merge pairs can never    #
# win a later round. The argmax sequence is therefore exactly the pairs in    #
# descending-f order; two pairs planted at EQUAL f additionally pin the      #
# count-then-lexicographic tie-break. A trainer that miscounts pairs,        #
# mis-argmaxes, or fails to re-encode (leaving the merged pair's 2f count    #
# alive, so it wins again) produces a different table → hash mismatch.       #
#                                                                             #
# The oracle DERIVES the sequence from the same (pair, freq) model — ORDER   #
# BY doubled count DESC, then pair — rather than hardcoding rows, the        #
# mm07/mm08 closed-form-oracle pattern.                                       #
# --------------------------------------------------------------------------- #
#: (left char, right char, corpus frequency): 6 strictly-decreasing
#: frequencies force ranks 1-6; ("w","x") and ("y","z") tie at 42 and land
#: in lexicographic order (ranks 7-8). 2·42 = 84 > 50 = max single count.
TX31_PLANT: "list[tuple[str, str, int]]" = [
    ("b", "c", 50), ("d", "e", 49), ("f", "g", 48),
    ("h", "i", 47), ("j", "k", 46), ("l", "m", 45),
    ("y", "z", 42), ("w", "x", 42),
]


@query(
    "tx31_bpe_trainer_oracle",
    oracle=f"""
    WITH plant(a, b, f) AS (
        VALUES {", ".join(f"('{a}', '{b}', {f})" for a, b, f in TX31_PLANT)}
    ),
    counts AS (SELECT a, b, 2 * f AS cnt FROM plant)
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, a, b) AS BIGINT) AS rank,
           a AS lhs, b AS rhs, a || b AS merged
    FROM counts ORDER BY rank
    """,
)
def tx31_bpe_trainer_oracle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the REAL distributed trainer (:func:`bpe_train` — the loop tx24
    registers) for 8 merges over the planted corpus; return the ordered
    merge table. ``sf_dir`` is unused by design: the corpus must be the
    crafted one for the closed-form answer to exist (the trainer under
    test is scale-independent; its corpus-scale half — the word count —
    is adjudicated by tx14's vocab oracle)."""
    docs = driver_rows_df(
        spark,
        [(i, ((a + b) * 2 + " ") * f) for i, (a, b, f) in enumerate(TX31_PLANT)],
        "doc_id long, text string",
    )
    merges, _state = bpe_train(docs, n_merges=len(TX31_PLANT))
    return driver_rows_df(
        spark,
        [(i + 1, a, b, a + b) for i, (a, b) in enumerate(merges)],
        "rank long, lhs string, rhs string, merged string",
    )


# --------------------------------------------------------------------------- #
# tx32: trainer → encode adjudicated as a COMPOSITION (round-10 verdict #4:   #
# tx31 proves the trainer on a crafted corpus, tx27 proves the encode path    #
# under fixed merges; this runs the REAL distributed trainer and feeds its    #
# trained table into the REAL Arrow encode pass over the REAL documents       #
# corpus, end to end, under one hash adjudication).                           #
#                                                                             #
# Why the composition stays closed-form: the table tx31's plant trains —     #
# bc de fg hi jk lm wx yz — has pairwise-disjoint character sets with        #
# distinct characters inside each pair, which is exactly tx27's oracle        #
# precondition. So encoding ANY text (here: the real documents table, the    #
# corpus-wide apply pass tx25 runs) is rank-independent and                   #
#     n_bpe_tokens = n_non_ws_chars + n_words − Σ_pair occurrences(pair)      #
# with occurrences countable on the raw text. The oracle DERIVES the pair     #
# set from the same (a, b, f) plant model the trainer sees — it never reads   #
# the trained table — so a trainer that produces a wrong pair, or an encode   #
# that mis-applies one, lands on a different count → hash mismatch.           #
# --------------------------------------------------------------------------- #
@query(
    "tx32_bpe_train_encode",
    oracle=f"""
    WITH plant(a, b, f) AS (
        VALUES {", ".join(f"('{a}', '{b}', {f})" for a, b, f in TX31_PLANT)}
    ),
    occ AS (
        SELECT d.doc_id,
               CAST(SUM((length(d.text) - length(replace(d.text, p.a || p.b, '')))
                        // 2) AS BIGINT) AS n_merged
        FROM documents d CROSS JOIN plant p
        GROUP BY d.doc_id
    )
    SELECT d.doc_id,
           CAST(len(list_filter(regexp_split_to_array(d.text, '\\s+'),
                    x -> x != '')) AS BIGINT) AS n_words,
           CAST(length(regexp_replace(d.text, '\\s+', '', 'g'))
                + len(list_filter(regexp_split_to_array(d.text, '\\s+'),
                      x -> x != ''))
                - occ.n_merged AS BIGINT) AS n_bpe_tokens
    FROM documents d JOIN occ USING (doc_id)
    ORDER BY d.doc_id
    """,
)
def tx32_bpe_train_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAIN on tx31's planted corpus with the real distributed loop
    (:func:`bpe_train`), then ENCODE the real documents table under the
    trained merge table with the real Arrow pass
    (:func:`bpe_encode_token_counts` — the same mapInPandas tx25 runs).
    Closes the tokenizer family end to end: tx31 (trainer alone) + tx27
    (encode alone) + tx32 (the composition) put every arrow of
    train → table → corpus-apply under driver adjudication."""
    plant_docs = driver_rows_df(
        spark,
        [(i, ((a + b) * 2 + " ") * f) for i, (a, b, f) in enumerate(TX31_PLANT)],
        "doc_id long, text string",
    )
    merges, _state = bpe_train(plant_docs, n_merges=len(TX31_PLANT))
    docs = t(spark, sf_dir, "documents")
    return bpe_encode_token_counts(docs, merges).orderBy("doc_id")
