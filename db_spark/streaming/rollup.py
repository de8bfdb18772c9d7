"""Hypertable-style continuous aggregates (TimescaleDB pattern,
Spark-first).

A *rollup* is a materialized table of per-bucket partial aggregates
(count/sum/min/max — all decomposable). Queries over long time ranges
read the tiny rollup instead of raw events; the un-materialized tail
past the high-water mark is aggregated from raw and merged — partials
compose, so the merged result is exactly what a full scan would give.

Scale design:
- the rollup is hive-partitioned by bucket date → partition pruning
  turns "last 90 days" into 90 directory reads;
- ``refresh`` recomputes only buckets at/after a given instant and
  rewrites only those partitions (dynamic partition overwrite) — an
  incremental refresh touches new data only, never the history;
- merge cost is O(buckets), independent of raw row count;
- ``exact_decimals`` stores the sum partial as a scaled BIGINT
  (db_spark.functions.exact_sum semantics), so the merged total is
  bit-identical to a single-pass aggregate regardless of partial
  composition order — required for cross-engine verification.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _sum_partial(value_col: str, exact_decimals: int | None):
    if exact_decimals is None:
        return F.sum(F.col(value_col)).alias("_sum")
    scale = 10 ** exact_decimals
    return F.sum(F.round(F.col(value_col) * F.lit(scale)).cast("long")).alias("_sum")


def rollup_partials(
    df: DataFrame, ts_col: str, bucket: str, value_col: str,
    keys: list[str] | None = None, exact_decimals: int | None = None,
) -> DataFrame:
    """Per-bucket decomposable partials (one map-side-combined pass)."""
    keys = keys or []
    return (
        df.groupBy(
            F.window(F.col(ts_col), bucket).start.alias("bucket_start"), *keys)
        .agg(
            F.count(F.lit(1)).alias("_n"),
            _sum_partial(value_col, exact_decimals),
            F.min(F.col(value_col)).alias("_min"),
            F.max(F.col(value_col)).alias("_max"),
        )
    )


def rollup_materialize(
    df: DataFrame, path: str, ts_col: str, bucket: str, value_col: str,
    keys: list[str] | None = None, exact_decimals: int | None = None,
) -> None:
    """Full (re)build of the rollup table, partitioned by bucket date."""
    parts = rollup_partials(df, ts_col, bucket, value_col, keys,
                            exact_decimals).withColumn(
        "_bucket_date", F.to_date(F.col("bucket_start")))
    parts.write.mode("overwrite").partitionBy("_bucket_date").parquet(path)


def rollup_refresh(
    spark: SparkSession, df: DataFrame, path: str, ts_col: str, bucket: str,
    value_col: str, since, keys: list[str] | None = None,
    exact_decimals: int | None = None,
) -> None:
    """Incremental refresh: recompute buckets with ``bucket_start >=
    since`` from raw and rewrite ONLY those date partitions (dynamic
    partition overwrite). History partitions are untouched."""
    fresh = (
        rollup_partials(
            df.filter(F.col(ts_col) >= F.lit(since)), ts_col, bucket,
            value_col, keys, exact_decimals)
        .filter(F.col("bucket_start") >= F.lit(since))
        .withColumn("_bucket_date", F.to_date(F.col("bucket_start")))
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        fresh.write.mode("overwrite").partitionBy("_bucket_date").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def hypertable_agg(
    spark: SparkSession, rollup_path: str, raw_tail: DataFrame | None,
    ts_col: str, bucket: str, value_col: str,
    keys: list[str] | None = None, high_water=None,
    exact_decimals: int | None = None,
) -> DataFrame:
    """Final aggregate = merge(materialized partials ≤ high-water, raw
    partials > high-water). Identical to a full-scan aggregate because
    count/sum/min/max partials compose losslessly; avg derives at the
    end."""
    keys = keys or []
    parts = spark.read.parquet(rollup_path).drop("_bucket_date")
    if high_water is not None:
        parts = parts.filter(F.col("bucket_start") < F.lit(high_water))
    if raw_tail is not None:
        tail = raw_tail
        if high_water is not None:
            tail = tail.filter(F.col(ts_col) >= F.lit(high_water))
        parts = parts.unionByName(
            rollup_partials(tail, ts_col, bucket, value_col, keys,
                            exact_decimals))
    total = F.sum("_sum")
    if exact_decimals is not None:
        total = total / F.lit(float(10 ** exact_decimals))
    return (
        parts.groupBy("bucket_start", *keys)
        .agg(
            F.sum("_n").alias("n"),
            total.alias("total"),
            F.min("_min").alias("vmin"),
            F.max("_max").alias("vmax"),
        )
        .withColumn("vavg", F.col("total") / F.col("n"))
    )
