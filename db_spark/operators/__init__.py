"""Custom relational operators beyond both the reference and vanilla
DataFrame surface: as-of joins, binned range joins, window-function
helpers, grouping sets.

Reference context: the reference has only inner equi-joins
(nested_loop.rs, hash_match.rs); SURVEY §2.3 lists the rest as capability
gaps our engine fills. Each operator here is a *composition of built-in
DataFrame ops* (strategy (a) from the task brief) — no UDFs — so
Catalyst plans them and they scale with partitioning.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# As-of join
# ---------------------------------------------------------------------------

def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_time: str,
    right_time: str,
    right_values: Sequence[str] | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, the single right row with the
    largest ``right_time <= left_time`` (direction='backward'; 'forward'
    gives smallest ``right_time >= left_time``), per ``on`` key group.

    Implementation: the *union trick* — tag both inputs, union on the
    time axis, and carry the last non-null right payload forward with a
    running window. One shuffle on (key, time); no range-explosion, no
    per-row rescan — works at any scale, unlike a naive theta join whose
    candidate set is quadratic. Ties (equal timestamps) match the right
    row (right sorts before left at the same instant).
    """
    keys = [on] if isinstance(on, str) else list(on)
    right_values = list(right_values or [c for c in right.columns if c not in keys + [right_time]])
    left_cols = left.columns

    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")

    lt = F.col(left_time)
    l_tagged = left.select(
        *[F.col(c) for c in left_cols],
        lt.alias("_t"),
        F.lit(1).alias("_is_left"),
        *[F.lit(None).cast(right.schema[v].dataType).alias(f"_rv_{v}") for v in right_values],
    )
    r_tagged = right.select(
        *[F.col(k) for k in keys],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols if c not in keys],
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_is_left"),
        *[F.col(v).alias(f"_rv_{v}") for v in right_values],
    ).select(*left_cols, "_t", "_is_left", *[f"_rv_{v}" for v in right_values])

    unioned = l_tagged.unionByName(r_tagged)
    if direction == "backward":
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("_t").asc(), F.col("_is_left").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        fill = {v: F.last(F.col(f"_rv_{v}"), ignorenulls=True).over(w) for v in right_values}
    else:
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("_t").desc(), F.col("_is_left").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        fill = {v: F.last(F.col(f"_rv_{v}"), ignorenulls=True).over(w) for v in right_values}

    out = unioned.select(
        *left_cols, "_t", "_is_left", *[fill[v].alias(v) for v in right_values]
    )
    return out.filter(F.col("_is_left") == 1).drop("_t", "_is_left")


# ---------------------------------------------------------------------------
# Range join (point-in-interval), binned for scale
# ---------------------------------------------------------------------------

def range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_lo: str,
    right_hi: str,
    bin_width: float | None = None,
    equi_keys: Sequence[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join left rows whose ``left_point`` falls in [right_lo, right_hi].

    With ``bin_width`` the interval side is exploded into covering bins
    and the join becomes equi on (bin [, equi_keys]) + residual filter —
    turning an O(n·m) theta join into a bucketed hash join (the standard
    bin-and-filter strategy; Spark's own storage-partitioned range join
    optimization does the same). Without bin_width, a plain theta join
    (fine when one side broadcasts).
    """
    keys = list(equi_keys or [])
    cond_range = (F.col(left_point) >= F.col(right_lo)) & (F.col(left_point) <= F.col(right_hi))
    if bin_width is None:
        cond = cond_range
        for k in keys:
            cond = cond & (left[k] == right[k])
        return left.join(right, cond, how)

    lbin = F.floor(F.col(left_point) / F.lit(bin_width)).alias("_bin")
    l2 = left.withColumn("_bin", lbin)
    r2 = right.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(right_lo) / F.lit(bin_width)),
                F.floor(F.col(right_hi) / F.lit(bin_width)),
            )
        ),
    )
    on = ["_bin"] + keys
    return l2.join(r2, on, how).filter(cond_range).drop("_bin")


# ---------------------------------------------------------------------------
# Merge intervals (reference roadmap README.md:84-88 'Merge Intervals')
# ---------------------------------------------------------------------------

def merge_intervals(
    df: DataFrame, lo: str, hi: str, keys: Sequence[str] = (),
) -> DataFrame:
    """Coalesce overlapping/touching [lo, hi] intervals per key group
    into maximal disjoint intervals (+ count of merged members).

    Gaps-and-islands: an interval starts a new island iff its ``lo``
    exceeds the running max ``hi`` of everything before it. One window
    pass — scales as a sort within key partitions."""
    keys = list(keys)
    w_order = Window.partitionBy(*keys).orderBy(F.col(lo), F.col(hi))
    prev_max_hi = F.max(F.col(hi)).over(
        w_order.rowsBetween(Window.unboundedPreceding, -1))
    flagged = df.withColumn(
        "_new", F.when(prev_max_hi.isNull() | (F.col(lo) > prev_max_hi), 1).otherwise(0))
    gid = F.sum(F.col("_new")).over(
        w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    grouped = flagged.withColumn("_gid", gid)
    return (
        grouped.groupBy(*keys, "_gid")
        .agg(
            F.min(F.col(lo)).alias(lo),
            F.max(F.col(hi)).alias(hi),
            F.count(F.lit(1)).alias("n_merged"),
        )
        .drop("_gid")
    )


# ---------------------------------------------------------------------------
# Window-function helpers
# ---------------------------------------------------------------------------

def ranked(
    df: DataFrame,
    partition_by: Sequence[str | Column],
    order_by: Sequence[Column],
    fns: dict[str, Column] | None = None,
) -> DataFrame:
    """Attach window-function columns (row_number by default) over one
    window spec. ``fns`` maps output name -> window function (un-over'd);
    e.g. {'rn': F.row_number(), 'lag_v': F.lag('v', 1)}."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    fns = fns or {"rn": F.row_number()}
    out = df
    for name, fn in fns.items():
        out = out.withColumn(name, fn.over(w))
    return out


def top_n_per_group(
    df: DataFrame, partition_by: Sequence, order_by: Sequence[Column], n: int,
) -> DataFrame:
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )


# ---------------------------------------------------------------------------
# Grouping sets / cube / rollup
# ---------------------------------------------------------------------------

def rollup_agg(df: DataFrame, cols: Sequence[str], aggs: Sequence[Column]) -> DataFrame:
    return df.rollup(*cols).agg(*aggs)


def cube_agg(df: DataFrame, cols: Sequence[str], aggs: Sequence[Column]) -> DataFrame:
    return df.cube(*cols).agg(*aggs)


def grouping_sets_agg(
    df: DataFrame, sets: Sequence[Sequence[str]], all_cols: Sequence[str],
    aggs: Sequence[Column],
) -> DataFrame:
    """GROUPING SETS via the native API when available (Spark 4) else a
    unionByName of per-set aggregates with NULL-filled columns."""
    if hasattr(df, "groupingSets"):
        return df.groupingSets([list(s) for s in sets], *[F.col(c) for c in all_cols]).agg(*aggs)
    parts = []
    for s in sets:
        missing = [c for c in all_cols if c not in s]
        g = df.groupBy(*s).agg(*aggs)
        for c in missing:
            g = g.withColumn(c, F.lit(None).cast(df.schema[c].dataType))
        parts.append(g.select(*all_cols, *[a for a in g.columns if a not in all_cols]))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# Skew-mitigating salted join (100 TB technique; AQE skew-join handles
# moderate skew at runtime — explicit salting is for catastrophic
# single-key skew where one shuffle partition would exceed executor memory)
# ---------------------------------------------------------------------------

def salted_join(
    left: DataFrame, right: DataFrame, left_key: str, right_key: str,
    how: str = "inner", salt: int = 16,
) -> DataFrame:
    """Equi-join where the (large, skewed) left side is sharded into
    ``salt`` sub-keys and the (smaller) right side is replicated
    salt-fold, so a hot key's rows spread over ``salt`` reducers instead
    of melting one. Deterministic shard assignment (xxhash64 of the full
    left row), so results are stable across retries.

    Only ``inner`` and ``left`` semantics are correct under replication:
    with ``right``/``full`` every *unmatched* right row appears once per
    replica (``salt`` null-padded duplicates). Those shapes raise — use
    AQE skew-join handling for outer joins on the replicated side."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left' (got {how!r}): the "
            "replicated right side would duplicate unmatched rows")
    shard = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt))
    l2 = left.withColumn("_salt", shard)
    r2 = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<long>")))
    on = (F.col(left_key) == F.col(right_key)) & (l2["_salt"] == r2["_salt"])
    return l2.join(r2, on, how).drop("_salt")


# ---------------------------------------------------------------------------
# 2D skyline (Pareto frontier)
# ---------------------------------------------------------------------------

def skyline_2d(df: DataFrame, x: Column, y: Column,
               group_cols: Sequence[str] | None = None) -> DataFrame:
    """Rows not dominated in two minimized dimensions: keep a row
    unless some other row is <= in BOTH coordinates and strictly < in
    at least one ("cheaper and no bigger, or no costlier and smaller").
    Ties on the frontier are all kept — equal pairs do not dominate
    each other. Optional ``group_cols`` computes an independent
    frontier per group.

    Not the naive O(n²) dominance anti-join: collapse rows to one
    ``min(y)`` per distinct x (one hash aggregate), lag a running min
    over the x-ordered distinct-x table to get ``m(x) = min{y' : x' <
    x}``, and join the (distinct-x, m, min_y_at_x) table back. A row
    is dominated iff ``m(x) <= y`` (strictly cheaper, no bigger) or
    ``min_y_at_x < y`` (same price, strictly smaller). Two bounded
    exchanges; the only ordered pass runs over distinct x values. The
    distinct-x window is per-group — for an ungrouped frontier over
    extreme x-cardinality, pre-bucket x and stitch boundary buckets.
    """
    groups = list(group_cols or [])
    base = df.withColumn("_sx", x.cast("double")) \
             .withColumn("_sy", y.cast("double")) \
             .filter(F.col("_sx").isNotNull() & F.col("_sy").isNotNull())
    per_x = base.groupBy(*groups, "_sx").agg(F.min("_sy").alias("_myx"))
    w = (Window.partitionBy(*groups).orderBy("_sx")
         .rowsBetween(Window.unboundedPreceding, -1))
    prefix = per_x.withColumn("_m", F.min("_myx").over(w))
    joined = base.join(prefix, groups + ["_sx"])
    return (
        joined.filter(
            (F.col("_m").isNull() | (F.col("_m") > F.col("_sy")))
            & (F.col("_myx") >= F.col("_sy")))
        .drop("_sx", "_sy", "_m", "_myx")
    )


def interval_join(
    left: DataFrame, right: DataFrame,
    left_lo: str, left_hi: str, right_lo: str, right_hi: str,
    bin_width: float, equi_keys: Sequence[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Interval-OVERLAP join: pairs whose [lo, hi] ranges intersect
    (closed intervals; touching endpoints overlap) — the temporal /
    genomic companion of :func:`range_join`'s point-in-interval form.
    Column names must already be distinct across the two sides.

    Both sides explode into covering ``bin_width`` bins and equi-join
    on (bin [, equi_keys]) — candidate pairs grow with per-bin
    occupancy, never |L|×|R|. A pair of long intervals shares MANY
    bins; it is counted exactly once by keeping only the join row in
    the FIRST shared bin (``bin == max(floor(lo/w), floor(lo'/w))`` —
    the overlap's left edge), a predicate, not a distinct, so no
    dedup exchange is added. Pick ``bin_width`` near the typical
    interval length: too small multiplies the explode, too large
    piles unrelated intervals into one bucket."""
    keys = list(equi_keys or [])
    w = float(bin_width)
    l2 = left.withColumn(
        "_bin",
        F.explode(F.sequence(
            F.floor(F.col(left_lo) / F.lit(w)),
            F.floor(F.col(left_hi) / F.lit(w)))))
    r2 = right.withColumn(
        "_bin",
        F.explode(F.sequence(
            F.floor(F.col(right_lo) / F.lit(w)),
            F.floor(F.col(right_hi) / F.lit(w)))))
    overlap = (
        (F.col(left_lo) <= F.col(right_hi))
        & (F.col(right_lo) <= F.col(left_hi))
        & (F.col("_bin") == F.greatest(
            F.floor(F.col(left_lo) / F.lit(w)),
            F.floor(F.col(right_lo) / F.lit(w))))
    )
    on = ["_bin"] + keys
    return l2.join(r2, on, how).filter(overlap).drop("_bin")
