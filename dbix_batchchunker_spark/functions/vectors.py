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


def int_dot(a: Column, b: Column) -> Column:
    """Exact integer dot product of two integer-array columns (LONG
    accumulator). For int8-quantized embeddings the magnitudes stay far
    under 2^53, so the same value computed by an engine that accumulates
    in DOUBLE (DuckDB's list_dot_product) is bit-identical — the basis of
    the quantized-ANN oracle's hash equality."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("long") * y.cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def quantize_int8(vec: Column) -> Column:
    """Per-vector symmetric int8 scalar quantization: scale = max|v|/127,
    q_i = floor(v_i/scale + 0.5) — half-up rounding spelled as floor so
    every engine computes the identical integer (ROUND() half-even vs
    half-away varies by engine; floor(x+0.5) does not). The max|v| scale
    bounds |q_i| ≤ 127 with no clipping branch; all-zero vectors quantize
    to all-zero via the greatest(scale, 1e-30) guard instead of a 0/0."""
    amax = F.array_max(F.transform(vec, lambda x: F.abs(x.cast("double"))))
    scale = F.greatest(amax / F.lit(127.0), F.lit(1e-30))
    # tinyint, not int: the stored code column must actually be 1 byte per
    # component or the 4× memory/scan-IO claim over float32 is fiction
    return F.transform(
        vec, lambda x: F.floor(x.cast("double") / scale + F.lit(0.5)).cast("byte")
    )
