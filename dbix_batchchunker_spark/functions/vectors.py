"""Vector math over `array<float>` columns as pure JVM expressions
(`zip_with` + `aggregate` — no Python UDF in the hot path, SURVEY.md §2.C).

All arithmetic is done in DOUBLE regardless of the input element type so
results are deterministic and match DuckDB's list_cosine_similarity.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
