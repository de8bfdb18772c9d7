"""Optimizer rewrite rules (db_spark.optimizer) — the planner the
reference's declarative layer sketched but never wired
(src/query/mod.rs:20-26, SURVEY §3.2)."""

import pytest

from db_spark.conditions import Query, col, val
from db_spark.optimizer import FALSE, TRUE, is_false, is_true, optimize


def test_constant_folding():
    assert is_true(optimize(val(2) < val(3)))
    assert is_false(optimize(val("a") == val("b")))
    assert is_true(optimize(val("hello").like("h%o")))


def test_range_merge_tightens_bounds():
    c = optimize((col("x") > 3) & (col("x") > 5) & (col("x") <= 10))
    assert c.render() == "5 < x AND x <= 10"


def test_range_contradiction_folds_false():
    assert is_false(optimize((col("x") < 3) & (col("x") > 5)))
    assert is_false(optimize((col("x") == 1) & (col("x") == 2)))
    assert is_false(optimize((col("x") == 7) & (col("x") < 5)))


def test_point_in_range_keeps_equality():
    c = optimize((col("x") == 7) & (col("x") > 3) & (col("x") <= 10))
    assert c.render() == "x = 7"


def test_complement_detection():
    c = col("flag") == val(True)
    assert is_false(optimize(c & ~c))
    # OR direction intentionally NOT rewritten: under 3VL, `c OR NOT c`
    # is NULL (row filtered) when flag is NULL — TRUE would keep the row.
    assert not is_true(optimize(c | ~c))


def test_complement_or_preserves_null_semantics(spark):
    """filter((x == 1) | ~(x == 1)) on a nullable x must drop NULL rows —
    the optimized condition has to match Spark/DuckDB unoptimized."""
    df = spark.createDataFrame([(1,), (2,), (None,)], "x int")
    c = (col("x") == val(1)) | ~(col("x") == val(1))
    got = sorted(r["x"] for r in Query(df).filter(c).df.collect())
    want = sorted(r["x"] for r in df.filter((df.x == 1) | ~(df.x == 1)).collect())
    assert got == want == [1, 2]


def test_or_to_in():
    c = optimize((col("x") == 1) | (col("x") == 2) | (col("x") == 3))
    assert c.kind == "in" and set(c.value) == {1, 2, 3}


def test_or_to_in_mixed_columns_untouched():
    c = optimize((col("x") == 1) | (col("y") == 2))
    assert c.kind == "or"


def test_unsatisfiable_query_skips_scan(spark, tmp_path):
    d = str(tmp_path / "t")
    spark.createDataFrame([(i, i * 2) for i in range(100)], "x int, y int") \
        .write.parquet(d)
    df = spark.read.parquet(d)
    out = Query(df).filter((col("x") > 50) & (col("x") < 10)).df
    assert out.count() == 0
    assert out.inputFiles() == []  # no FileScan in the plan at all
    assert out.schema == df.schema


def test_satisfiable_query_filters(spark):
    df = spark.createDataFrame([(i,) for i in range(20)], "x int")
    got = Query(df).filter((col("x") > 3) & (col("x") > 10) & (col("x") <= 13)).collect()
    assert sorted(r["x"] for r in got) == [11, 12, 13]


def test_in_consolidation_executes(spark):
    df = spark.createDataFrame([(i,) for i in range(10)], "x int")
    got = Query(df).filter((col("x") == 1) | (col("x") == 4) | (col("x") == 9)).collect()
    assert sorted(r["x"] for r in got) == [1, 4, 9]


def test_dsl_filter_pushes_to_parquet_scan(spark, tmp_path):
    """The optimized conjuncts compile to Catalyst filters that reach the
    parquet reader (PushedFilters) — the pushdown the reference's
    declarative layer was designed for but never performed."""
    d = str(tmp_path / "push")
    spark.createDataFrame([(i, f"s{i}") for i in range(100)], "x int, s string") \
        .write.parquet(d)
    df = spark.read.parquet(d)
    out = Query(df).filter((col("x") > 3) & (col("x") > 5) & (col("s") == val("s7"))).df
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "GreaterThan(x,5)" in plan        # tightened bound, pushed
    assert "GreaterThan(x,3)" not in plan    # loose bound eliminated
    assert "EqualTo(s,s7)" in plan
