"""as-of join, range join, window helpers, grouping sets."""

import pytest
from pyspark.sql import functions as F

from db_spark import operators as ops


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame(
        [(1, 10, 100.0), (1, 20, 101.0), (2, 15, 50.0), (3, 5, 10.0)],
        "sym long, t long, px double",
    )


@pytest.fixture(scope="module")
def quotes(spark):
    return spark.createDataFrame(
        [(1, 8, 99.0), (1, 15, 100.5), (1, 20, 100.9), (2, 9, 49.5)],
        "sym long, t long, bid double",
    )


def test_asof_backward(trades, quotes):
    out = ops.asof_join(trades, quotes, on="sym", left_time="t", right_time="t",
                        right_values=["bid"], direction="backward")
    got = {(r["sym"], r["t"]): r["bid"] for r in out.collect()}
    assert got[(1, 10)] == 99.0       # quote@8
    assert got[(1, 20)] == 100.9      # tie: quote at same instant matches
    assert got[(2, 15)] == 49.5
    assert got[(3, 5)] is None        # no quote for sym 3 -> left join null


def test_asof_forward(trades, quotes):
    out = ops.asof_join(trades, quotes, on="sym", left_time="t", right_time="t",
                        right_values=["bid"], direction="forward")
    got = {(r["sym"], r["t"]): r["bid"] for r in out.collect()}
    assert got[(1, 10)] == 100.5      # next quote at 15
    assert got[(3, 5)] is None


def test_range_join_binned_equals_theta(spark):
    points = spark.createDataFrame([(i, float(i)) for i in range(50)], "pid long, v double")
    ivals = spark.createDataFrame(
        [(100, 0.0, 9.5), (200, 20.0, 25.0), (300, 48.0, 60.0)],
        "iid long, lo double, hi double",
    )
    theta = ops.range_join(points, ivals, "v", "lo", "hi")
    binned = ops.range_join(points, ivals, "v", "lo", "hi", bin_width=7.0)
    t = {(r["pid"], r["iid"]) for r in theta.collect()}
    b = {(r["pid"], r["iid"]) for r in binned.collect()}
    assert t == b and len(t) == 10 + 6 + 2


def test_ranked_and_topn(spark):
    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 30.0), ("a", 3, 20.0), ("b", 4, 5.0)],
        "grp string, id long, v double",
    )
    r = ops.ranked(df, ["grp"], [F.col("v").desc()],
                   {"rn": F.row_number(), "prev": F.lag("v", 1)})
    got = {r_["id"]: (r_["rn"], r_["prev"]) for r_ in r.collect()}
    assert got[2] == (1, None) and got[3] == (2, 30.0) and got[1] == (3, 20.0)
    top = ops.top_n_per_group(df, ["grp"], [F.col("v").desc()], 1)
    assert {r_["id"] for r_ in top.collect()} == {2, 4}


def test_rollup_cube_grouping_sets(spark):
    df = spark.createDataFrame(
        [("x", "p", 1), ("x", "q", 2), ("y", "p", 3)], "a string, b string, n long")
    roll = ops.rollup_agg(df, ["a", "b"], [F.sum("n").alias("s")])
    assert roll.count() == 3 + 2 + 1  # leaf rows + per-a + grand total
    cube = ops.cube_agg(df, ["a", "b"], [F.sum("n").alias("s")])
    assert cube.count() == 3 + 2 + 2 + 1
    gs = ops.grouping_sets_agg(df, [["a"], ["b"]], ["a", "b"], [F.sum("n").alias("s")])
    rows = {(r["a"], r["b"]): r["s"] for r in gs.collect()}
    assert rows[("x", None)] == 3 and rows[(None, "p")] == 4


def test_salted_join_matches_plain_join(spark):
    from db_spark.operators import salted_join

    left = spark.createDataFrame(
        [(1, f"r{i}") for i in range(500)] + [(2, "x"), (3, "y")],  # key 1 hot
        "k long, payload string")
    right = spark.createDataFrame([(1, "one"), (2, "two"), (4, "four")],
                                  "rk long, label string")
    got = salted_join(left, right, "k", "rk").select("k", "payload", "label")
    exp = left.join(right, F.col("k") == F.col("rk")).select("k", "payload", "label")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect()))
    assert got.count() == 501
    # left join: unmatched LEFT rows appear exactly once
    gl = salted_join(left, right, "k", "rk", how="left")
    assert gl.count() == 502 and gl.filter(F.col("label").isNull()).count() == 1
    # right/full would duplicate unmatched right rows across replicas
    import pytest

    with pytest.raises(ValueError):
        salted_join(left, right, "k", "rk", how="right")
    with pytest.raises(ValueError):
        salted_join(left, right, "k", "rk", how="full")


def test_bucketed_join_no_shuffle(spark, tmp_path):
    from db_spark.sources import write_bucketed

    a = spark.createDataFrame([(i, f"a{i}") for i in range(1000)], "k long, va string")
    b = spark.createDataFrame([(i, f"b{i}") for i in range(1000)], "k long, vb string")
    write_bucketed(a, "bk_a", ["k"], 8, path=str(tmp_path / "bk_a"))
    write_bucketed(b, "bk_b", ["k"], 8, path=str(tmp_path / "bk_b"))
    ta, tb = spark.table("bk_a"), spark.table("bk_b")
    # force a non-broadcast join so the co-location matters (at real
    # scale neither side fits the broadcast threshold anyway)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = ta.join(tb, "k")
        assert joined.count() == 1000
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # co-located: bucketing replaces the shuffle on both sides
    assert "ShuffleExchange" not in plan and "Exchange hashpartitioning" not in plan
    assert "Bucketed: true" in plan


def test_orc_round_trip(spark, tmp_path):
    from db_spark.sources import read_orc, write_orc

    df = spark.createDataFrame([(i, f"v{i}") for i in range(50)], "k long, v string")
    p = str(tmp_path / "orc")
    write_orc(df, p)
    back = read_orc(spark, p)
    assert back.schema == df.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


# ---------------------------------------------------------------------------
# 2D skyline
# ---------------------------------------------------------------------------

def test_skyline_matches_naive_dominance(spark):
    from db_spark.operators import skyline_2d
    from pyspark.sql import functions as F

    rows = [(i, float((i * 13) % 29), float((i * 7) % 23))
            for i in range(120)]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    got = {r["id"] for r in skyline_2d(df, F.col("x"), F.col("y")).collect()}
    pts = {i: (x, y) for i, x, y in rows}
    naive = {
        i for i, (x, y) in pts.items()
        if not any(
            (x2 <= x and y2 <= y and (x2 < x or y2 < y))
            for j, (x2, y2) in pts.items() if j != i)
    }
    assert got == naive and got


def test_skyline_keeps_frontier_ties_and_groups(spark):
    from db_spark.operators import skyline_2d
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("a", 1, 1.0, 5.0), ("a", 2, 1.0, 5.0),   # duplicate frontier pt
         ("a", 3, 1.0, 6.0),                       # same x, bigger y: out
         ("a", 4, 2.0, 4.0), ("a", 5, 3.0, 5.0),   # 5 dominated by 4
         ("b", 6, 9.0, 9.0)],                      # own group: kept
        "g string, id long, x double, y double")
    got = sorted(r["id"] for r in skyline_2d(
        df, F.col("x"), F.col("y"), group_cols=["g"]).collect())
    assert got == [1, 2, 4, 6]


def test_interval_join_matches_naive_overlap(spark):
    from db_spark.operators import interval_join
    from pyspark.sql import functions as F

    rows_a = [(i, float(i * 3), float(i * 3 + 5)) for i in range(40)]
    rows_b = [(100 + i, float(i * 7), float(i * 7 + 12)) for i in range(25)]
    a = spark.createDataFrame(rows_a, "ka long, a_lo double, a_hi double")
    b = spark.createDataFrame(rows_b, "kb long, b_lo double, b_hi double")
    got = {(r["ka"], r["kb"]) for r in interval_join(
        a, b, "a_lo", "a_hi", "b_lo", "b_hi", bin_width=4.0).collect()}
    naive = {(ka, kb)
             for ka, alo, ahi in rows_a for kb, blo, bhi in rows_b
             if alo <= bhi and blo <= ahi}
    assert got == naive and got
    # long intervals sharing many bins are counted exactly once: the
    # set equality above would fail on duplicates only if collected as
    # a list — assert explicitly
    cnt = interval_join(a, b, "a_lo", "a_hi", "b_lo", "b_hi",
                        bin_width=4.0).count()
    assert cnt == len(naive)


def test_interval_join_touching_endpoints_and_keys(spark):
    from db_spark.operators import interval_join

    a = spark.createDataFrame(
        [("g", 1, 0.0, 10.0)], "k string, ka long, a_lo double, a_hi double")
    b = spark.createDataFrame(
        [("g", 2, 10.0, 20.0), ("g", 3, 10.5, 20.0), ("h", 4, 0.0, 20.0)],
        "k string, kb long, b_lo double, b_hi double")
    got = {r["kb"] for r in interval_join(
        a, b, "a_lo", "a_hi", "b_lo", "b_hi", bin_width=8.0,
        equi_keys=["k"]).collect()}
    # touching endpoint overlaps (closed); disjoint doesn't; other key
    # group excluded even though ranges overlap
    assert got == {2}
