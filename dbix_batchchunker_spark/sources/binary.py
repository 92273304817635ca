"""Binary-file ingestion for multimodal columns (SURVEY.md §2.C: opaque
``binary`` payload + typed metadata).

``spark.read.format("binaryFile")`` is the built-in source: one row per
file with (path, modificationTime, length, content) — the scan is
distributed, each file read by the executor that owns the split, nothing
driver-side. This wrapper normalizes that row shape into the package's
multimodal contract (a ``doc_id``-keyed binary ``payload`` column the
operators/multimodal.py pipelines consume) and applies the two knobs that
matter at scale:

* ``pathGlobFilter`` pushes the filename filter INTO the file listing —
  a directory of mixed assets lists only the matching files, instead of
  reading everything and filtering rows.
* binary payloads are whole-file values: ``maxFileSize`` guards against a
  stray multi-GB file becoming a single unsplittable task (binaryFile
  rows are never split). Oversized files are excluded by a LENGTH
  predicate that the source evaluates from file metadata, before content
  is read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_binary_dir(
    spark: SparkSession,
    path: str,
    pattern: str | None = None,
    max_file_bytes: int | None = None,
) -> DataFrame:
    """One row per file under ``path``: ``doc_id`` (xxhash64 of the file
    path — deterministic, join-stable across runs), ``path``, ``length``,
    ``payload`` (binary content). ``pattern`` is a glob applied at listing
    time (e.g. ``"*.png"``); ``max_file_bytes`` excludes oversized files
    via the metadata-only ``length`` column.

    The result feeds ``operators.multimodal`` directly::

        frames = read_binary_dir(spark, "/data/imgs", "*.png")
        resize_binary_column(frames, 64, 64, codec=pil_codec)
    """
    reader = spark.read.format("binaryFile")
    if pattern:
        reader = reader.option("pathGlobFilter", pattern)
    df = reader.load(path)
    if max_file_bytes is not None:
        df = df.where(F.col("length") <= max_file_bytes)
    return df.select(
        F.xxhash64(F.col("path")).alias("doc_id"),
        "path",
        "length",
        F.col("content").alias("payload"),
    )
