"""Skew-mitigation: salted joins.

AQE's skew-join splitting (on by default in build_session) handles most
skew at runtime; explicit salting remains the tool when one join key
dominates so heavily that even split partitions overwhelm a task, or
when AQE is unavailable (e.g. inside foreachBatch on some versions).

Pattern: replicate the build side R times with a salt column, scatter
the probe side uniformly over R salts, join on (key, salt). Results are
identical to the unsalted join; the hot key's rows spread over R tasks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salt_probe(df: DataFrame, n_salts: int) -> DataFrame:
    """Scatter rows uniformly over n_salts (deterministic per row via
    hash, not rand() — keeps retries/oracle runs stable)."""
    salt = F.pmod(F.xxhash64(*df.columns), F.lit(n_salts)).cast("int")
    return df.withColumn(SALT_COL, salt)


def replicate_build(df: DataFrame, n_salts: int) -> DataFrame:
    """Replicate every row once per salt value."""
    return df.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>"))
    )


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: Column,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join with the probe side salted and the build side replicated.

    ``on`` is the ordinary join condition; the salt equality is added
    automatically and both salt columns are dropped from the result."""
    p = salt_probe(probe, n_salts)
    b = replicate_build(build, n_salts).withColumnRenamed(SALT_COL, SALT_COL + "_b")
    joined = p.join(b, on & (F.col(SALT_COL) == F.col(SALT_COL + "_b")), how)
    return joined.drop(SALT_COL, SALT_COL + "_b")
