"""Vector column functions over ``array<float/double>`` embeddings.

Pure ``F.zip_with``/``F.aggregate`` compositions — JVM-side, no UDF.
Elements are cast to double before arithmetic so Spark and an ANSI-SQL
oracle accumulate identically (float32 intermediate math would drift).
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


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """NULL when either vector has zero norm (try_divide), mirroring the
    engine-wide drop-non-finite convention (PreProcess.scala:75)."""
    return F.try_divide(dot(a, b), l2_norm(a) * l2_norm(b))
