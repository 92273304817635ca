"""Custom connector via Spark 4's Python Data Source API — a deterministic
synthetic-corpus generator (``corpusgen``).

Why this exists: training pipelines routinely need a SOURCE that is not a
file format — synthetic/augmentation corpora, internal feed APIs, test
fixtures at arbitrary scale. Spark 4 makes connectors a first-class Python
extension point (``pyspark.sql.datasource``): the source declares a
schema, plans its own InputPartitions (so reads parallelize like any scan)
and each partition emits Arrow RecordBatches — the vectorized path, not
row tuples, so generation throughput is bounded by numpy, not the Python
interpreter.

Determinism contract (same as the md5 samplers): every value is a pure
function of (doc_id), never of partitioning or run — regenerating with a
different partition count yields byte-identical rows, pinned in
tests/test_sources_and_plans.py. That makes the generated corpus safe to
use in golden tests and reproducible ablations.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_VOCAB = (
    "key agg row scan slow fast table value part hash merge batch line sort "
    "window stream group filter column data query customer order spark big "
    "small the a vector join"
).split()
_LANGS = ("en", "en", "en", "de", "es", "fr", "zh")  # en-weighted like testdata


class _GenPartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class _CorpusGenReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 8))
        self.doc_tokens = int(options.get("doctokens", 40))

    def partitions(self):
        step = max(1, (self.n_rows + self.n_parts - 1) // self.n_parts)
        return [
            _GenPartition(lo, min(lo + step, self.n_rows))
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, part: _GenPartition):
        # Arrow fast path: one RecordBatch per partition, vectorized via
        # numpy — values derive ONLY from doc_id (md5-seeded), so the
        # output is invariant under any partitioning of the id range.
        import hashlib

        import numpy as np
        import pyarrow as pa

        ids = np.arange(part.start, part.end, dtype=np.int64)
        seeds = np.frombuffer(
            b"".join(
                hashlib.md5(f"corpusgen:{i}".encode()).digest() for i in ids
            ),
            dtype=np.uint64,
        ).reshape(-1, 2)
        rng_words = seeds[:, 0]
        texts = []
        vocab = np.array(_VOCAB)
        for k, s in enumerate(rng_words):
            # per-doc deterministic word stream: LCG seeded by the doc hash
            state = np.uint64(s) | np.uint64(1)
            picks = []
            for _ in range(self.doc_tokens):
                state = np.uint64(state * np.uint64(6364136223846793005) + np.uint64(1442695040888963407))
                picks.append(vocab[int(state >> np.uint64(33)) % len(vocab)])
            texts.append(" ".join(picks))
        langs = [_LANGS[int(s % len(_LANGS))] for s in seeds[:, 1]]
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(ids),
                pa.array(texts, type=pa.string()),
                pa.array(langs, type=pa.string()),
            ],
            names=["doc_id", "text", "lang"],
        )


class CorpusGenDataSource(DataSource):
    """``spark.read.format("corpusgen").option("rows", N).load()``."""

    @classmethod
    def name(cls) -> str:
        return "corpusgen"

    def schema(self) -> str:
        return "doc_id long, text string, lang string"

    def reader(self, schema):
        return _CorpusGenReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(CorpusGenDataSource)
