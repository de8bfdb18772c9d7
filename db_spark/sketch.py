"""Mergeable sketches: KMV (bottom-k distinct counts) and count-min
(frequency estimates / heavy hitters).

A KMV (k-minimum-values) sketch keeps the ``k`` smallest 32-bit hash
values of a column's distinct values; the distinct-count estimate is
``(k-1) * 2^32 / h_k`` where ``h_k`` is the k-th smallest kept hash
(Bar-Yossef et al. 2002, "Counting distinct elements in a data
stream"). Unlike HLL (whose register layouts differ per engine), KMV is
built from the repo's md5-derived ``h32`` hash family, so a SQL oracle
computes the *identical* sketch and estimate — and it is mergeable:
the sketch of a union is the k smallest of the concatenated sketches,
which makes per-partition / per-day sketches composable without
rescanning (the property a 100 TB rollup needs).

Scale shape: distinct (group, hash) is one hash-aggregate exchange;
top-k extraction is two bounded window passes — hashes are first
ranked within ``shards`` salt cells (each reducer sees ~1/shards of a
group's distinct hashes) and only the per-cell survivors (<= shards*k
rows per group) reach the final rank. No group ever funnels its full
distinct set through one reducer. The global (ungrouped) sketch uses
the same path via a constant group.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from db_spark.llm.dedup import h32

_TWO32 = 1 << 32


def kmv_sketch(
    df: DataFrame, value: Column, k: int = 64,
    group_cols: list[str] | None = None, shards: int = 32,
) -> DataFrame:
    """Bottom-k hash sketch: one row per kept hash, columns
    ``group_cols + [_h]``. Deterministic; collisions (two values, one
    32-bit hash) merge — the estimator's documented bias at extreme
    cardinalities (~2^16 distinct per group for 32-bit hashes).

    Sharded two-phase top-k: the k smallest of the per-shard k
    smallest are exactly the k smallest overall, so the result is
    value-identical to a single global rank while every window
    partition stays bounded."""
    groups = group_cols or []
    hashed = (
        df.select(*groups, h32(value.cast("string")).alias("_h"))
        # md5(NULL) is NULL, which would sort first and consume a sketch
        # slot, deflating the estimate for any group containing a null.
        .filter(F.col("_h").isNotNull())
        .distinct()
    )
    cell = Window.partitionBy(*groups, F.col("_h") % shards).orderBy("_h")
    survivors = (
        hashed.withColumn("_cr", F.row_number().over(cell))
        .filter(F.col("_cr") <= k)
    )
    final = Window.partitionBy(*groups).orderBy("_h")
    return (
        survivors.withColumn("_r", F.row_number().over(final))
        .filter(F.col("_r") <= k)
        .select(*groups, "_h")
    )


def kmv_merge(
    a: DataFrame, b: DataFrame, k: int = 64,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Union two sketches into the sketch of the unioned inputs:
    distinct hashes, keep the k smallest per group. The merge input is
    at most 2k rows per group, so a single rank pass is bounded."""
    groups = group_cols or []
    u = a.unionByName(b).distinct()
    w = Window.partitionBy(*groups).orderBy("_h")
    return (
        u.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= k)
        .select(*groups, "_h")
    )


def kmv_estimate(
    sketch: DataFrame, k: int = 64,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Distinct-count estimate per group: exact hash count when the
    sketch is not full (fewer than k distinct hashes seen), else
    ``(k-1) * 2^32 DIV h_k`` — integer arithmetic end to end, so the
    estimate is engine-identical."""
    groups = group_cols or []
    agg = sketch.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("_nk"), F.max("_h").alias("_hk"))
    est = F.when(
        F.col("_nk") < k, F.col("_nk"),
    ).otherwise(F.expr(f"CAST({(k - 1) * _TWO32} AS BIGINT) div _hk"))
    return agg.select(
        *groups,
        F.col("_nk").cast("long").alias("n_hashes"),
        est.cast("long").alias("est_distinct"),
    )


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005, "An improved data
# stream summary: the count-min sketch and its applications")
# ---------------------------------------------------------------------------

def _cm_cell(value: Column, d: int, width: int) -> Column:
    """Row d's cell index for a value: salted md5-family hash mod width —
    engine-reproducible (same SQL renders in the DuckDB oracle)."""
    return (h32(F.concat(F.lit(f"cm{d}:"), value.cast("string"))) % width)


def cm_sketch(
    df: DataFrame, value: Column, depth: int = 4, width: int = 1024,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Count-min frequency sketch: ``depth x width`` counters per group,
    one row per non-empty cell — columns ``group_cols + [_d, _w, _cnt]``.
    State is bounded (depth*width rows per group) no matter how many
    distinct values stream through: the 100 TB shape for "how often does
    X occur" when the value universe is too large to groupBy exactly.

    One explode (depth rows per input row) into one hash-aggregate
    exchange keyed by (group, _d, _w) — bounded cell cardinality, so the
    reduce side never scales with the corpus. NULL values are skipped
    (md5(NULL) is NULL). Deterministic: salted md5-family cell hashes,
    integer counts."""
    groups = group_cols or []
    cells = F.array(*[
        F.struct(F.lit(d).cast("int").alias("_d"),
                 _cm_cell(value, d, width).alias("_w"))
        for d in range(depth)
    ])
    ex = (
        df.filter(value.isNotNull())
        .select(*groups, F.explode(cells).alias("_c"))
        .select(*groups, F.col("_c._d").alias("_d"), F.col("_c._w").alias("_w"))
    )
    return ex.groupBy(*groups, "_d", "_w").agg(
        F.count(F.lit(1)).cast("long").alias("_cnt"))


def cm_merge(a: DataFrame, b: DataFrame,
             group_cols: list[str] | None = None) -> DataFrame:
    """Merge two count-min sketches (same depth/width/hash family):
    cell-wise counter sum — the sketch of the concatenated streams,
    exactly. Input is two bounded cell sets; one tiny aggregate."""
    groups = group_cols or []
    return (
        a.unionByName(b)
        .groupBy(*groups, "_d", "_w")
        .agg(F.sum("_cnt").cast("long").alias("_cnt"))
    )


def cm_estimate(
    sketch: DataFrame, probes: DataFrame, value_col: str,
    depth: int = 4, width: int = 1024,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Frequency estimate for each probe value: ``min`` over the sketch's
    depth rows of the value's cell counters (missing cell = 0). The
    estimate never undercounts (one-sided error +eps*N with probability
    1-delta; depth=ceil(ln 1/delta), width=ceil(e/eps)).

    Join shape: probes explode to depth rows and hash-join the bounded
    cell table — probe-cardinality work, independent of stream size."""
    groups = group_cols or []
    v = F.col(value_col)
    cells = F.array(*[
        F.struct(F.lit(d).cast("int").alias("_d"),
                 _cm_cell(v, d, width).alias("_w"))
        for d in range(depth)
    ])
    ex = (
        probes.filter(v.isNotNull())
        .select(*groups, v.alias(value_col), F.explode(cells).alias("_c"))
        .select(*groups, value_col,
                F.col("_c._d").alias("_d"), F.col("_c._w").alias("_w"))
    )
    joined = ex.join(sketch, on=[*groups, "_d", "_w"], how="left")
    return (
        joined.groupBy(*groups, value_col)
        .agg(F.min(F.coalesce(F.col("_cnt"), F.lit(0)))
             .cast("long").alias("est_count"))
    )


def cm_heavy_hitters(
    df: DataFrame, value: Column, min_count: int,
    depth: int = 4, width: int = 1024,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Values whose estimated frequency is >= min_count. Count-min never
    undercounts, so this is a superset of the true heavy hitters (the
    classic sketch guarantee — false positives possible at ~eps*N, no
    false negatives). Probes are the distinct values (vocabulary
    cardinality, not corpus); both sides of the join are bounded."""
    groups = group_cols or []
    sk = cm_sketch(df, value, depth=depth, width=width, group_cols=groups)
    probes = df.filter(value.isNotNull()).select(
        *groups, value.cast("string").alias("value")).distinct()
    est = cm_estimate(sk, probes, "value",
                      depth=depth, width=width, group_cols=groups)
    return est.filter(F.col("est_count") >= min_count)
