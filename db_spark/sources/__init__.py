"""Source connectors.

The reference's only source is its own log-file format
(src/operators/sourcing/table_scan.rs); our engine reads Parquet (the
log tables in db_spark.table plus external datasets), CSV/JSON/ORC via
the standard Spark readers, and handles format quirks here.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet read that tolerates TIMESTAMP(NANOS) columns (written by
    e.g. pandas/arrow with ns precision), which vanilla Spark rejects
    (PARQUET_TYPE_ILLEGAL). Nanos are read as raw INT64 and normalized to
    microsecond timestamps — matching DuckDB's µs TIMESTAMP semantics."""
    ns_cols = _nanos_columns(path)
    if not ns_cols:
        return spark.read.parquet(path)
    # The conf must remain set for the lifetime of the scan (it is consulted
    # at execution time, not just planning), so it stays on for the session;
    # it only affects files that actually contain NANOS columns.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for name in ns_cols:
        # integer DIV: ns values exceed 2^53, so float division would
        # round (off-by-1µs vs the truncation every other reader does)
        df = df.withColumn(
            name, F.timestamp_micros(F.expr(f"`{name}` div 1000"))
        )
    return df


def _nanos_columns(path: str) -> list[str]:
    """Columns stored as timestamp[ns], sniffed from one footer (cheap
    driver-side metadata read, no Spark job)."""
    import pyarrow.parquet as pq

    target = path
    if os.path.isdir(path):
        parts = sorted(f for f in os.listdir(path) if f.endswith(".parquet"))
        if not parts:
            return []
        target = os.path.join(path, parts[0])
    try:
        schema = pq.read_schema(target)
    except Exception:  # noqa: BLE001 - fall back to plain read
        return []
    return [f.name for f in schema if str(f.type) == "timestamp[ns]"]


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_parquet(spark, os.path.join(sf_dir, name + ".parquet"))


def read_csv(spark: SparkSession, path: str, schema=None, header: bool = True) -> DataFrame:
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_json(spark: SparkSession, path: str, schema=None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)
