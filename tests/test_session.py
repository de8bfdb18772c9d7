"""Session-contract pins: db_spark's numeric and NULL semantics are
written to be independent of the Spark version's shifting defaults, and
that only holds if get_spark pins the three version-coupled configs.
Each assertion here guards a diagnosed cross-engine failure:

- ansi.enabled flipped default between 3.5 (off: int64 SUM wraps
  silently) and 4.x (on: it throws) — the r8 json_agg driver hash-fail
  class; the engine pins ON and width-pins the sums that could
  overflow.
- legacy.sizeOfNull is ANSI-coupled (size(NULL) = -1 under ansi-off):
  diverged token counts over NULL text from the DuckDB oracles in four
  queries until pinned false (r9 ansi-off adversarial pass).
- session timeZone: UTC keeps the TIMESTAMP_NTZ doctrine stable under
  any host zone.
"""

from db_spark.session import get_spark


def test_version_coupled_configs_are_pinned(spark):
    assert spark.conf.get("spark.sql.ansi.enabled") == "true"
    assert spark.conf.get("spark.sql.legacy.sizeOfNull") == "false"
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"


def test_size_of_null_is_null_not_minus_one(spark):
    import pyspark.sql.functions as F

    row = (spark.createDataFrame([(None,)], "t string")
           .select(F.size(F.split(F.col("t"), " ")).alias("n"))
           .collect()[0])
    assert row.n is None, "size(NULL) must be NULL (not -1) on any Spark"
