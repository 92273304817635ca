"""Multimodal column handling (SURVEY.md §2.C): image/audio/video payloads as
opaque `binary` columns with typed metadata structs.

The testdata has no binary table, so the payload is materialized in-flight
(`encode(text)` — deterministic bytes) and every Spark-side mechanism is
real: BinaryType schema, metadata struct, hashing/length ops on blobs, and
an Arrow-batched `mapInPandas` decode pipeline. The actual media decode is
STUBBED with a deterministic fake (this container has no image/audio libs);
swap `_fake_decode` for PIL/ffmpeg in production — the plumbing (schema,
batching, partitioning) is what's engineered and tested here.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .registry import query, t


# --------------------------------------------------------------------------- #
# mm01: binary payload + metadata struct, JVM-side blob ops                   #
# --------------------------------------------------------------------------- #
@query(
    "mm01_binary_stats",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS payload_bytes,
           sha256(text) AS payload_sha256,
           hex(encode(substr(text, 1, 8))) AS magic_hex
    FROM documents
    """,
)
def mm01_binary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # magic_hex is defined on the first 8 *characters*' bytes (DuckDB 1.0 has
    # no BLOB substr, so both sides slice the string then encode).
    docs = t(spark, sf_dir, "documents")
    payload = F.encode("text", "UTF-8")
    return docs.select(
        "doc_id",
        F.octet_length(payload).alias("payload_bytes"),
        F.sha2(payload, 256).alias("payload_sha256"),
        F.hex(F.encode(F.substring("text", 1, 8), "UTF-8")).alias("magic_hex"),
    )


# --------------------------------------------------------------------------- #
# mm02: mapInPandas decode pipeline (Arrow-batched; decode stubbed)           #
# --------------------------------------------------------------------------- #
DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("payload_bytes", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int, int, list[float]]:
    """Deterministic stand-in for a real media decode.

    In production this would be e.g. PIL.Image.open(io.BytesIO(payload)) —
    not available in this container, so dimensions/features are derived from
    the payload bytes themselves (stable across runs and executors).
    """
    h = int.from_bytes(payload[:8].ljust(8, b"\0"), "big")
    width = 64 + (h % 1920)
    height = 64 + ((h >> 16) % 1080)
    n_frames = 1 + (h % 32)
    feature = [((h >> (8 * i)) & 0xFF) / 255.0 for i in range(4)]
    return width, height, n_frames, feature


def decode_binary_column(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Arrow-batched decode over a binary column.

    mapInPandas keeps the batch shape (one pandas DataFrame per Arrow batch
    per partition) so a real decoder amortizes model/codec setup per batch,
    not per row — the pattern that matters at 100 TB.
    """

    def decode_batches(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            decoded = [_fake_decode(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload_bytes": [len(p) for p in pdf[payload_col]],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "n_frames": [d[2] for d in decoded],
                    "feature": [d[3] for d in decoded],
                }
            )

    return df.mapInPandas(decode_batches, schema=DECODED_SCHEMA)


@query("mm02_decode_pipeline")  # no oracle: Pandas-UDF pipeline, rows-only check
def mm02_decode_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return decode_binary_column(docs).orderBy("doc_id")
