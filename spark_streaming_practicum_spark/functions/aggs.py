"""Oracle-stable float aggregation helpers.

Floating-point SUM/AVG results depend on summation order, which differs
between Spark's partial aggregation and DuckDB — so a raw double sum can
hash-mismatch even when both are "correct". Routing the sum through
DECIMAL(38,6) makes the arithmetic exact and order-independent: the
double->decimal cast of identical input doubles is identical on both
systems (decimal midpoint doubles are non-dyadic, so exact ties cannot
occur), the decimal sum is exact, and the final decimal->double cast is
deterministic. SUM and AVG surfaced this way are bit-identical across
engines, with no rounding anywhere.

Input resolution is bounded by scale=6; use a finer scale for
sub-micro-unit data (e.g. embedding coordinates -> 12).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dsum(col: Column | str, scale: int = 6) -> Column:
    """Order-independent float SUM via exact decimal accumulation."""
    return F.sum(_c(col).cast(f"decimal(38,{scale})")).cast("double")


def davg(col: Column | str, scale: int = 6) -> Column:
    """Order-independent float AVG: exact decimal sum / count, divided in
    IEEE double (deterministic given identical inputs)."""
    return dsum(col, scale) / F.count(_c(col))


def dsum_sql(expr: str, scale: int = 6) -> str:
    """DuckDB-side mirror of ``dsum``."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(38,{scale}))) AS DOUBLE)"


def davg_sql(expr: str, scale: int = 6) -> str:
    """DuckDB-side mirror of ``davg``."""
    return f"{dsum_sql(expr, scale)} / COUNT({expr})"
