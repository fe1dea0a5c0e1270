"""Vector math as JVM-side column expressions (no Python UDFs).

Higher-order functions (``aggregate`` / ``zip_with``) keep the arithmetic
inside whole-stage codegen — the scalable default for array<float>
embedding columns. Sums fold sequentially over the array, matching
DuckDB's list functions, so rounded results are oracle-stable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two equal-length numeric arrays, computed in double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def sq_norm(a: Column | str) -> Column:
    """Squared L2 norm in double precision."""
    return F.aggregate(
        a, F.lit(0.0).cast("double"), lambda acc, v: acc + v.cast("double") * v.cast("double")
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(sq_norm(a))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity (double); NULL-safe only insofar as inputs are non-null."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
