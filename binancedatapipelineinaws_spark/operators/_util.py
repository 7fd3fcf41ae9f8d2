"""Shared helpers for operator modules.

Float-parity policy (see SURVEY.md §5): aggregate money/quantity columns
are cast to DECIMAL *before* arithmetic so sums are exact and
order-independent — the result is bit-identical across Spark partial-agg
schedules and vs DuckDB — then cast back to DOUBLE for a stable output
schema.  Columns that hold integers-in-doubles (l_quantity) are exact in
double anyway.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec(col: str | Column, scale: int = 2) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(18,{scale})")


def dec_sum(col: str | Column, scale: int = 2) -> Column:
    """Exact SUM: decimal-cast input, double output."""
    return F.sum(dec(col, scale)).cast("double")


def dec_avg(col: str | Column, scale: int = 2) -> Column:
    """Exact-numerator AVG: decimal sum cast to double, divided by count.
    DuckDB's AVG always returns double; this reproduces it exactly:
    CAST(SUM(CAST(x AS DECIMAL)) AS DOUBLE) / COUNT(x)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(dec(c, scale)).cast("double") / F.count(c)
