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


def eq_values(a, b, eps: float = EPSILON) -> bool:
    """Driver-side value equality with the reference's float semantics
    (src/objects/object_field.rs:87-99): floats compare by ``|a-b| <
    eps`` and ``NaN == NaN`` is TRUE; sequences/Rows compare pairwise;
    everything else by ``==``. This is a *compat helper* for comparing
    deserialized results against reference outputs — engine internals
    use exact equality (documented deviation, SURVEY §1.2: epsilon
    equality is not transitive, so it cannot drive grouping/joins)."""
    import math

    if isinstance(a, float) or isinstance(b, float):
        if not isinstance(a, (int, float)) or not isinstance(b, (int, float)):
            return False
        fa, fb = float(a), float(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        if math.isnan(fa) or math.isnan(fb):
            return False
        if math.isinf(fa) or math.isinf(fb):
            return fa == fb
        return abs(fa - fb) < eps
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        return len(a) == len(b) and all(
            eq_values(x, y, eps) for x, y in zip(a, b))
    return a == b


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


#: ASCII case-fold alphabet for ``ascii_lower`` — the SQL-oracle form is
#: ``translate(x, 'ABC...Z', 'abc...z')`` with the same two constants.
ASCII_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
ASCII_LOWER = "abcdefghijklmnopqrstuvwxyz"


def ascii_lower(c: Column) -> Column:
    """Engine-portable case fold: lowercases ASCII A-Z ONLY, leaving
    every other codepoint untouched.

    Full unicode ``lower()`` is ICU/locale-dependent and NOT identical
    across engines — e.g. Spark lowercases 'İ' (U+0130) to 'i' + a
    combining dot (two codepoints, injecting a phantom ASCII 'i' into
    any downstream ``[a-z']+`` tokenizer) while DuckDB yields a plain
    'i'; Greek final-sigma context rules also differ. Every tokenizer,
    shingle and fingerprint in this repo case-folds through THIS
    function so token/fingerprint semantics are deterministic and
    identical in any engine; non-ASCII letters simply never participate
    in ASCII token classes (they are token separators either way)."""
    return F.translate(c, ASCII_UPPER, ASCII_LOWER)


def exact_sum(c: Column, alias: str, decimals: int = 2, wide: bool = False) -> Column:
    """Deterministic (order-independent) sum of a double column: each term
    is rounded to ``decimals`` places, accumulation is exact integer
    arithmetic, result presented as double. Keeps Spark and external
    oracles (DuckDB) value-identical regardless of partial-aggregation
    order. SQL equivalent:
    ``CAST(SUM(CAST(round(x * 10^d) AS BIGINT)) AS DOUBLE) / 10^d``.

    Fast path (default): scaled BIGINT — stays in whole-stage-codegen
    long adds (~2x faster than even compact Decimal aggregation). Safe
    while sum(|x|) * 10^decimals < 2^63 per group: at 2 decimals and
    1e5-magnitude money values that is ~9e11 rows per group (beyond
    100 TB TPC-H group sizes); at 4 decimals ~9e9 rows per group.
    ``wide=True`` switches to DECIMAL(38) accumulation for regimes past
    the long range (same per-term rounding, so results are identical
    where both are exact)."""
    if wide:
        return F.sum(F.round(c, decimals).cast(T.DecimalType(38, decimals))).cast(
            "double").alias(alias)
    scale = 10 ** decimals
    return (F.sum(F.round(c * F.lit(scale)).cast("long")) / F.lit(float(scale))).alias(alias)


def money_sum(c: Column, alias: str) -> Column:
    """2-decimal exact sum (money semantics)."""
    return exact_sum(c, alias, 2)


def decimal_sum(c: Column, alias: str, decimals: int = 4) -> Column:
    """Exact sum for computed doubles (4 decimals per term by default —
    headroom to ~9e9 rows/group before long overflow; use
    ``exact_sum(..., wide=True)`` beyond that)."""
    return exact_sum(c, alias, decimals)


def approx_distinct(c: Column, alias: str, rsd: float = 0.05) -> Column:
    """HyperLogLog++ distinct count — the 100 TB fast path: one pass, no
    expand, fixed-size sketch per group (exact COUNT(DISTINCT) doubles
    the shuffle via expand). rsd is the relative error target."""
    return F.approx_count_distinct(c, rsd).alias(alias)


def approx_quantiles(df: DataFrame, col_name: str, probs: list[float],
                     rel_err: float = 0.01) -> list[float]:
    """Greenwald-Khanna sketch quantiles — one pass, bounded memory,
    mergeable across partitions (exact percentile sorts the column)."""
    return df.approxQuantile(col_name, probs, rel_err)
