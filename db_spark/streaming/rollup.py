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


def _refresh_cutoff(spark: SparkSession, since, bucket):
    """Align ``since`` down so the refresh rewrites only *complete*
    units at both granularities it touches:

    - a ``since`` mid-bucket would recompute the straddling bucket from
      a partial row set (rows < since filtered out) or drop it entirely;
    - rewrites happen per ``_bucket_date`` partition (dynamic partition
      overwrite replaces whole partitions), so a ``since`` mid-day would
      replace that date's partition with only its later buckets,
      silently dropping the earlier ones.

    Returns the first bucket boundary >= midnight of the date of the
    bucket containing ``since`` — every recomputed bucket is then full,
    and every rewritten date partition is fully regenerated."""
    row = (
        spark.range(1)
        .select(F.window(F.lit(since).cast("timestamp"), bucket).start.alias("b0"))
        .select(F.to_timestamp(F.to_date(F.col("b0"))).alias("m"))
        .select("m", F.window(F.col("m"), bucket).start.alias("w"),
                F.window(F.col("m"), bucket).end.alias("e"))
        .collect()[0]
    )
    # m = midnight of the earliest rewritten date; w = boundary at/below
    # m; first boundary >= m is m itself when aligned, else w's bucket end.
    return row["m"] if row["w"] == row["m"] else row["e"]


def rollup_refresh(
    spark: SparkSession, df: DataFrame, path: str, ts_col: str, bucket: str,
    value_col: str, since, keys: list[str] | None = None,
    exact_decimals: int | None = None,
) -> None:
    """Incremental refresh: recompute buckets from ``since`` (aligned
    down to a safe cutoff, see ``_refresh_cutoff``) and rewrite ONLY the
    touched date partitions (dynamic partition overwrite). History
    partitions are untouched."""
    cutoff = _refresh_cutoff(spark, since, bucket)
    fresh = (
        rollup_partials(
            df.filter(F.col(ts_col) >= F.lit(cutoff)), ts_col, bucket,
            value_col, keys, exact_decimals)
        .filter(F.col("bucket_start") >= F.lit(cutoff))
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
    try:
        parts = spark.read.parquet(rollup_path).drop("_bucket_date")
    except Exception as exc:  # AnalysisException: no files to infer from
        if raw_tail is None or "UNABLE_TO_INFER_SCHEMA" not in str(exc):
            raise
        # A rollup materialized over an EMPTY history (every event past
        # the high-water mark) writes no parquet files — partitionBy
        # skips empty frames entirely, leaving a _SUCCESS-only dir.
        # Zero materialized partials is a legal store state; derive the
        # identical partials schema from the tail instead of failing.
        parts = rollup_partials(raw_tail.limit(0), ts_col, bucket,
                                value_col, keys, exact_decimals)
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
