"""Vector math over ``array<float>`` embedding columns (SURVEY.md §2.11) —
pure JVM higher-order-function expressions (zip_with + aggregate): no Python
boundary, fuses into codegen, works on any array length.

Floats are cast to double element-wise before accumulating, so Spark and the
DuckDB oracle (list_cosine_similarity over double lists) produce bit-identical
IEEE results in the same left-to-right order.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 when either vector has zero norm (a real
    corpus contains zero embeddings, and ANSI mode would otherwise abort
    the whole job on the first one)."""
    return safe_cosine_from(dot(a, b), norm(a), norm(b))


def safe_cosine_from(dot_val: Column, norm_a: Column, norm_b: Column) -> Column:
    """Assemble cosine from precomputed pieces with the zero-norm guard —
    use this when norms are computed once per side (similarity/dedup ops)."""
    denom = norm_a * norm_b
    return F.when(denom > 0, dot_val / denom).otherwise(F.lit(0.0))


def l2_distance(a: Column, b: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: F.pow(x.cast("double") - y.cast("double"), 2)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
