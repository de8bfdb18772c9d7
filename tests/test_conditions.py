"""Normalizer parity tests mirroring src/query/condition.rs:127-384 —
assertions on normalized string renderings (SURVEY §5.1)."""

from db_spark.conditions import col, val


def test_double_negation():
    c = ~(~(col("a") == val(1)))
    assert c.normalize().render() == "a = 1"


def test_not_equal_rewrite():
    c = col("a") != val(1)
    assert c.normalize().render() == "NOT (a = 1)"


def test_gt_flip():
    # a > b  ->  b < a  (binary_expression.rs:24-61)
    assert (col("a") > col("b")).normalize().render() == "b < a"
    assert (col("a") >= col("b")).normalize().render() == "b <= a"


def test_not_like_rewrite():
    c = col("a").not_like("x%")
    assert c.normalize().render() == "NOT (a LIKE 'x%')"


def test_de_morgan_and():
    # NOT(a AND b) -> NOT a OR NOT b (unary_expression.rs:24-51)
    a, b = col("a") == val(1), col("b") == val(2)
    got = (~(a & b)).normalize().render()
    assert got == "(NOT (a = 1) OR NOT (b = 2))"


def test_de_morgan_or():
    a, b = col("a") == val(1), col("b") == val(2)
    got = (~(a | b)).normalize().render()
    assert got == "NOT (a = 1) AND NOT (b = 2)"


def test_cnf_distribution():
    # (a AND c) OR b OR d -> (a OR b OR d) AND (b OR c OR d)
    # mirrors condition.rs:293-355 CNF output shape
    a = col("a") == val(1)
    b = col("b") == val(1)
    c = col("c") == val(1)
    d = col("d") == val(1)
    got = ((a & c) | b | d).normalize()
    assert got.kind == "and"
    clauses = [cl.render(False) for cl in got.children]
    assert clauses == sorted(clauses)  # canonical BTreeSet ordering
    assert len(clauses) == 2
    for cl in clauses:
        assert "b = 1" in cl and "d = 1" in cl


def test_dedup_in_set():
    a = col("a") == val(1)
    assert ((a | a) | a).normalize().render() == "a = 1"


def test_conjuncts_split():
    a, b = col("a") == val(1), col("b") == val(2)
    conj = (a & b).conjuncts()
    assert [c.render() for c in conj] == ["a = 1", "b = 2"]


def test_to_column_roundtrip(spark):
    df = spark.createDataFrame([(1, "x"), (2, "y"), (3, "z")], ["a", "s"])
    c = (col("a") > val(1)) & col("s").like("%y%")
    got = df.filter(c.to_column()).collect()
    assert [r["a"] for r in got] == [2]


def test_query_applies_conditions(spark):
    """The reference drops conditions at collect (src/query/mod.rs:52-54);
    our Query applies them — the completed design."""
    from db_spark.conditions import Query

    df = spark.createDataFrame([(i,) for i in range(10)], ["a"])
    rows = Query(df).filter((col("a") >= val(3)) & (col("a") < val(6))).collect()
    assert sorted(r["a"] for r in rows) == [3, 4, 5]


def test_between_and_isin_sugar(spark):
    from db_spark.conditions import Query, col

    df = spark.createDataFrame([(i,) for i in range(20)], "x int")
    got = Query(df).filter(col("x").between(5, 8)).collect()
    assert sorted(r["x"] for r in got) == [5, 6, 7, 8]
    got2 = Query(df).filter(col("x").isin(1, 3, 19)).collect()
    assert sorted(r["x"] for r in got2) == [1, 3, 19]
    # between composes with the range optimizer: bounds tighten
    from db_spark.optimizer import optimize
    c = optimize(col("x").between(5, 15) & (col("x") <= 10))
    assert c.render() == "5 <= x AND x <= 10"
