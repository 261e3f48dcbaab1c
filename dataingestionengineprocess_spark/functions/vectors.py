"""Vector math over array<float|double> columns, pure built-ins.

The embedding fixture is float32 on disk; every helper first casts
element-wise to double so folds are bit-stable and match DuckDB's
``::DOUBLE[]`` + ``list_dot_product`` semantics (sequential
left-to-right accumulation in double).

At 100 TB these expressions run inside whole-stage codegen over the
scan -- no shuffle, no Python boundary; a 64-dim dot product is ~64
fused multiply-adds per row.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column | str) -> Column:
    """Element-wise cast to array<double>."""
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Dot product via zip_with + sequential fold (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def sq_norm(a: Column) -> Column:
    return dot(a, a)


def l2_norm(a: Column) -> Column:
    return F.sqrt(sq_norm(a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL if either vector has zero norm."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def l2_normalize(a: Column) -> Column:
    """Unit-normalize a vector (array<double> in, array<double> out)."""
    n = l2_norm(a)
    return F.transform(a, lambda x: x / n)
