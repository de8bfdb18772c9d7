"""Public plan-shape API."""

import pytest
from pyspark.sql import functions as F

from db_spark import plans


def test_plan_shape_counts_joins_and_exchanges(spark):
    a = spark.range(0, 1000).select(F.col("id").alias("k"),
                                    (F.col("id") % 7).alias("g"))
    b = spark.range(0, 10).select(F.col("id").alias("k"),
                                  F.lit("x").alias("name"))
    df = a.join(F.broadcast(b), "k").groupBy("g").count()
    shape = plans.plan_shape(df)
    assert shape["broadcast_hash_joins"] == 1
    assert shape["cartesian_products"] == 0
    assert shape["exchanges"] >= 1  # the groupBy shuffle


def test_assert_scale_safe_flags_cartesian(spark):
    a = spark.range(0, 5)
    b = spark.range(0, 5).select(F.col("id").alias("j"))
    # force the cartesian strategy (a tiny crossJoin would otherwise
    # plan as a broadcast nested loop, which the guard permits)
    cj = a.join(b.hint("shuffle_replicate_nl"), F.lit(True))
    with pytest.raises(AssertionError, match="CartesianProduct"):
        plans.assert_scale_safe(cj)


def test_assert_scale_safe_budget_and_smj(spark):
    a = spark.range(0, 100).select(F.col("id").alias("k"))
    shuffled = a.repartition(8, "k")
    ok = plans.assert_scale_safe(shuffled, max_exchanges=3)
    assert 1 <= ok["exchanges"] <= 3
    with pytest.raises(AssertionError, match="exchanges"):
        plans.assert_scale_safe(shuffled, max_exchanges=0)
