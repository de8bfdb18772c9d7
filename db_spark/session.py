"""SparkSession factory with scale-oriented defaults.

The reference engine is single-threaded and embedded (reference:
src/storage/mod.rs, "Parallel execution" roadmap README.md:65); our
execution substrate is Spark, so the session carries the configuration
that matters at 100 TB: AQE (runtime re-planning, skew-join splitting,
partition coalescing), reasonable shuffle parallelism, and Arrow for any
Python<->JVM data movement.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# local[N] thread count for local testing; on a real cluster the master /
# executor topology comes from spark-submit and these are ignored.
_DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "db_spark",
    cpus: str | int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    Defaults are chosen for the driver's local[32] harness but every knob
    here is the one you would also set on a 1000-executor cluster:

    - AQE on: coalesces post-shuffle partitions (so ``shuffle_partitions``
      is an upper bound, not a fixed cost), splits skewed join partitions,
      and converts sort-merge joins to broadcast joins at runtime when one
      side turns out small.
    - ``autoBroadcastJoinThreshold`` left at default (10 MB) — dimension
      tables (region/nation/supplier/part at any SF) broadcast; fact-fact
      joins shuffle on their keys.
    - Arrow enabled so pandas UDFs / toPandas use columnar batch transfer.
    """
    cpus = str(cpus or _DEFAULT_CPUS)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or 32))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Pinned, not inherited: the default flipped between Spark 3.5
        # (off — int64 overflow wraps silently) and 4.x (on — it
        # throws). Every numeric contract in the engine is written to
        # produce the same result under either mode (width-pinned
        # decimal sums, regex-guarded casts inside CASE branches), and
        # tests/test_oracle_adversarial.py runs under both; the pin
        # makes the shipped behavior independent of the cluster's
        # Spark version.
        .config("spark.sql.ansi.enabled", "true")
        # size(NULL) is ANSI-coupled: -1 under ANSI off (the 3.5.x
        # legacy default), NULL under ANSI on. Pin it to NULL so token
        # counts over NULL text are mode-independent (caught by the
        # r9 ansi-off adversarial pass: text_stats/corpus_stats/
        # token_budget/regex_funcs diverged on the NULL-text probe).
        .config("spark.sql.legacy.sizeOfNull", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
