"""Declarative data-quality rules engine."""

from pyspark.sql import functions as F

from db_spark import quality as dq


def _df(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0, 100), (2, "b", -5.0, 100), (2, "a", 50.0, None),
         (4, "zz", 5.0, 999)],
        "id long, cat string, v double, fk long")


def test_dq_report_counts_every_kind(spark):
    parent = spark.createDataFrame([(100,), (200,)], "pk long")
    df = _df(spark)
    report = {r["rule"]: (r["violations"], r["passed"])
              for r in dq.dq_report(df, [
                  dq.not_null("fk_not_null", "fk"),
                  dq.accepted_values("cat_domain", "cat", ["a", "b"]),
                  dq.in_range("v_range", "v", 0.0, 100.0),
                  dq.unique("id_unique", "id"),
                  dq.foreign_key("fk_parent", "fk", parent, "pk"),
                  dq.custom("v_positive", F.col("v") > 0),
              ]).collect()}
    assert report["fk_not_null"] == (1, False)     # one NULL fk
    assert report["cat_domain"] == (1, False)      # 'zz'
    assert report["v_range"] == (1, False)         # -5.0
    assert report["id_unique"] == (1, False)       # id=2 twice -> 1 extra
    assert report["fk_parent"] == (1, False)       # 999 orphan; NULL skipped
    assert report["v_positive"] == (1, False)      # -5.0 fails predicate


def test_dq_report_clean_table_all_pass(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, cat string")
    report = dq.dq_report(df, [
        dq.not_null("id_nn", "id"),
        dq.unique("id_uq", "id"),
        dq.accepted_values("cat_dom", "cat", ["a", "b"]),
    ]).collect()
    assert all(r["passed"] and r["violations"] == 0 for r in report)
    assert len(report) == 3


def test_dq_unique_multi_column_and_custom_null(spark):
    df = spark.createDataFrame(
        [(1, "x", None), (1, "x", 5.0), (1, "y", 3.0)],
        "a long, b string, v double")
    report = {r["rule"]: r["violations"] for r in dq.dq_report(df, [
        dq.unique("ab_unique", "a", "b"),
        # NULL condition counts as violation (expectation not met)
        dq.custom("v_known_positive", F.col("v") > 0),
    ]).collect()}
    assert report["ab_unique"] == 1
    assert report["v_known_positive"] == 1


def test_dq_unique_null_keys_group_together(spark):
    # documented deviation from SQL UNIQUE: NULL keys compare equal
    df = spark.createDataFrame([(None,), (None,), (1,)], "k long")
    report = dq.dq_report(df, [dq.unique("k_unique", "k")]).collect()[0]
    assert report["violations"] == 1 and not report["passed"]


def test_dq_violations_drilldown_matches_report_counts(spark):
    parent = spark.createDataFrame([(100,), (200,)], "pk long")
    df = _df(spark)
    rules = [
        dq.not_null("fk_not_null", "fk"),
        dq.accepted_values("cat_domain", "cat", ["a", "b"]),
        dq.in_range("v_range", "v", 0.0, 100.0),
        dq.unique("id_unique", "id"),
        dq.foreign_key("fk_parent", "fk", parent, "pk"),
        dq.custom("v_positive", F.col("v") > 0),
    ]
    report = {r["rule"]: r["violations"]
              for r in dq.dq_report(df, rules).collect()}
    for rule in rules:
        rows = dq.dq_violations(df, rule, limit=100).collect()
        if rule.kind == "unique":
            # drill-down returns ALL rows of duplicated keys (both
            # copies are evidence); the report counts extras only
            assert len(rows) == report[rule.name] + 1
        else:
            assert len(rows) == report[rule.name], rule.name
    # the specific offenders
    assert dq.dq_violations(df, rules[1]).collect()[0]["cat"] == "zz"
    assert dq.dq_violations(df, rules[4]).collect()[0]["fk"] == 999
    # limit caps the extraction
    assert len(dq.dq_violations(df, rules[5], limit=0).collect()) == 0


def test_benford_audit_known_distribution(spark):
    from db_spark.quality import BENFORD_PPB, benford_audit

    # 100 values whose first digit IS Benford-distributed (30x 1.., 17x
    # 2.., ...) -> tiny chi2; plus sub-1 values that must be excluded
    counts = [30, 18, 12, 10, 8, 7, 6, 5, 4]
    rows = [(float(d) * 10 + 0.5,) for d, c in
            zip(range(1, 10), counts) for _ in range(c)]
    rows += [(0.2,), (0.9,)]  # |v| < 1: no leading digit
    df = spark.createDataFrame(rows, "v double")
    out = {r["digit"]: r for r in benford_audit(df, "v").collect()}
    assert len(out) == 9
    assert out[1]["n_obs"] == 30 and out[9]["n_obs"] == 4
    assert out[1]["share"] == 0.3
    assert out[1]["expected_share"] == round(BENFORD_PPB[0] / 1e9, 6)
    assert out[1]["chi2"] < 1.0  # near-Benford data: tiny statistic


def test_benford_audit_zero_cells_and_uniform_flags(spark):
    from db_spark.quality import benford_audit

    # all-9s data: digit 9 has everything, the other 8 cells are zero
    df = spark.createDataFrame([(9.5,)] * 50, "v double")
    out = {r["digit"]: r for r in benford_audit(df, "v").collect()}
    assert out[9]["n_obs"] == 50 and out[1]["n_obs"] == 0
    assert out[9]["chi2"] > 100  # wildly non-Benford


def test_skew_profile_flags_hot_key(spark):
    from db_spark.quality import skew_profile

    rows = [("hot",)] * 90 + [("k%d" % i,) for i in range(10)]
    df = spark.createDataFrame(rows, "k string")
    out = skew_profile(df, "k", top_k=3).collect()
    assert out[0]["k"] == "hot" and out[0]["n_rows"] == 90
    assert out[0]["share"] == 0.9
    # 100 rows / 11 keys ~ 9.09 avg -> hot is ~9.9x
    assert out[0]["avg_multiplier"] == round(90 / (100 / 11), 6)
    assert len(out) == 3 and out[1]["n_rows"] == 1


def test_skew_profile_ties_break_on_key(spark):
    from db_spark.quality import skew_profile

    df = spark.createDataFrame([("b",), ("a",)], "k string")
    out = skew_profile(df, "k", top_k=2).collect()
    assert [r["k"] for r in out] == ["a", "b"]
