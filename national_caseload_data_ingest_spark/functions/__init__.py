"""Column-expression helpers shared by the query surface.

The driver's correctness gate hashes query output values against a DuckDB
oracle, so floating-point aggregates must be *deterministic*, not merely
close: double summation order differs between engines (and between runs, once
partitioning changes).  The engine therefore computes money/quantity
aggregates in exact decimal arithmetic — cast each operand to
``DECIMAL(18,2)`` (the natural scale of TPC-H-ish money columns), aggregate
exactly, and cast the final result to ``DOUBLE`` (an exact, deterministic
conversion).  The oracle SQL mirrors the same casts.

This is also the right call at 100 TB: decimal aggregation is codegen'd
JVM-side and avoids the silent drift that plagues distributed double sums.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec(col: Column | str, precision: int = 18, scale: int = 2) -> Column:
    """Cast a (double) column to exact decimal for deterministic aggregation."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def dsum(col: Column | str, precision: int = 18, scale: int = 2) -> Column:
    """SUM in exact decimal, returned as DOUBLE (deterministic)."""
    return F.sum(dec(col, precision, scale)).cast("double")


def davg(col: Column | str, precision: int = 18, scale: int = 2) -> Column:
    """AVG as exact-decimal SUM divided by COUNT, in double.

    Mirrors the oracle's ``CAST(SUM(CAST(x AS DECIMAL)) AS DOUBLE)/COUNT(x)``
    so both engines perform the identical (exact-sum → double ÷ int64)
    computation.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(dec(c, precision, scale)).cast("double") / F.count(c)
