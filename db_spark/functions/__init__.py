"""Scalar/aggregate function surface + reference value-semantics helpers.

The reference's "function library" is arbitrary Rust closures inside
``filter``/``select`` (reference: src/operators/mod.rs:42-48); our
equivalents are Catalyst ``Column`` expressions (fast path, JVM-side) and
pandas UDFs (slow path, Arrow-batched) — never row-at-a-time Python UDFs
in hot paths.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Epsilon used by the reference for Decimal (f64) equality
#: (reference: src/objects/object_field.rs:87-91).
EPSILON = 1e-6


def eps_eq(a: Column, b: Column, eps: float = EPSILON) -> Column:
    """Reference float equality: ``|a-b| < eps`` and ``NaN == NaN`` is true
    (src/objects/object_field.rs:87-99). Spark's ``=`` is exact; this
    compat helper is only for reference-parity comparisons — engine
    internals use exact equality (documented deviation, SURVEY §1.2)."""
    both_nan = F.isnan(a) & F.isnan(b)
    return both_nan | (F.abs(a - b) < F.lit(eps))


def truthy(c: Column, dtype: T.DataType) -> Column:
    """Per-type truthiness used by ``count_when`` (reference:
    src/operators/linear/select.rs:247-263).

    bool: itself; int: != 0; uuid(string 36): non-nil; str/bytes:
    non-empty; double: not NaN and |d| >= EPSILON. NOTE: the reference
    *inverts* the decimal case (counts values ~equal to 0,
    select.rs:257 bug) — we implement the intended semantics and keep a
    test documenting the deviation (SURVEY §2.1 #6).
    """
    if isinstance(dtype, T.BooleanType):
        return c
    if isinstance(dtype, (T.IntegerType, T.LongType, T.ShortType, T.ByteType)):
        return c != F.lit(0)
    if isinstance(dtype, (T.DoubleType, T.FloatType)):
        return (~F.isnan(c)) & (F.abs(c) >= F.lit(EPSILON))
    if isinstance(dtype, T.StringType):
        # uuid columns are strings; the nil uuid counts as falsy
        return (F.length(c) > 0) & (c != F.lit("00000000-0000-0000-0000-000000000000"))
    if isinstance(dtype, T.BinaryType):
        return F.length(c) > 0
    return c.isNotNull()


def col_at(df: DataFrame, i: int) -> Column:
    """Positional column access — the reference addresses columns by
    integer index everywhere (src/storage/log_file/entry_fields.rs:133,
    join keys src/operators/joining/nested_loop.rs:15)."""
    return df[df.columns[i]]


def money_sum(c: Column, alias: str) -> Column:
    """Deterministic sum of a double 'money' column: accumulate in
    DECIMAL(18,2) (exact, order-independent) then present as double.
    Keeps Spark and external oracles (DuckDB) bit-identical regardless of
    partial-aggregation order at any scale."""
    return F.sum(c.cast(T.DecimalType(12, 2))).cast("double").alias(alias)


def decimal_sum(c: Column, alias: str, scale: int = 6, prec: int = 18) -> Column:
    """Exact decimal accumulation for arbitrary computed doubles.

    Precision <= 18 keeps values in Tungsten's long-backed compact
    Decimal (~6x faster than BigDecimal-backed precision > 18); Spark
    widens the sum accumulator itself, so overflow safety at scale comes
    from the accumulator, not the input precision."""
    return F.sum(c.cast(T.DecimalType(prec, scale))).cast("double").alias(alias)
