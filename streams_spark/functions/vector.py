"""Vector math over array columns using JVM-side higher-order functions.

No Python UDFs: dot products, norms and cosine run inside Catalyst
expressions (zip_with / aggregate), so they stay in whole-stage codegen
and scale with executor count. The fold is sequential left-to-right,
matching DuckDB's list_sum for oracle-exact comparison.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double_array(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column) -> Column:
    # try_divide, not /: a zero-norm vector (an empty document embeds to
    # all-zeros) makes the denominator 0; ANSI Spark raises DIVIDE_BY_ZERO
    # where DuckDB's double division yields NULL. try_divide restores the
    # NULL contract, and NULL cosine then drops out of >=threshold filters
    # and sorts NULLS LAST in both engines.
    return F.try_divide(dot(a, b), norm(a) * norm(b))
