"""Mergeable distinct-count sketches (KMV / bottom-k).

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
