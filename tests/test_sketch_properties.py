"""Property-based tests (hypothesis) for sketch merge laws: for ANY
inputs, merge(sketch(A), sketch(B)) must equal sketch(A ∪ B) and
estimates must respect their one-sided error contracts. Small example
counts — each example runs Spark jobs."""

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st_
from pyspark.sql import functions as F

from db_spark import sketch as sk

VALS = st_.lists(st_.integers(min_value=0, max_value=50), min_size=0, max_size=40)

_settings = settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture])


def _df(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "v int") if vals \
        else spark.createDataFrame([], "v int")


@given(a=VALS, b=VALS)
@_settings
def test_kmv_merge_law(spark, a, b):
    da, db_ = _df(spark, a), _df(spark, b)
    m = sk.kmv_merge(sk.kmv_sketch(da, F.col("v"), k=8),
                     sk.kmv_sketch(db_, F.col("v"), k=8), k=8)
    d = sk.kmv_sketch(da.unionByName(db_), F.col("v"), k=8)
    assert sorted(r["_h"] for r in m.collect()) == \
        sorted(r["_h"] for r in d.collect())


@given(a=VALS, b=VALS)
@_settings
def test_cm_merge_law_and_one_sided_error(spark, a, b):
    da, db_ = _df(spark, a), _df(spark, b)
    m = sk.cm_merge(sk.cm_sketch(da, F.col("v"), depth=2, width=16),
                    sk.cm_sketch(db_, F.col("v"), depth=2, width=16))
    d = sk.cm_sketch(da.unionByName(db_), F.col("v"), depth=2, width=16)
    assert sorted(map(tuple, m.collect())) == sorted(map(tuple, d.collect()))
    both = a + b
    if both:
        est = {r["value"]: r["est_count"] for r in sk.cm_heavy_hitters(
            _df(spark, both), F.col("v"), min_count=1,
            depth=2, width=16).collect()}
        for v in set(both):
            assert est[str(v)] >= both.count(v)


@given(a=VALS, b=VALS)
@_settings
def test_hist_merge_law(spark, a, b):
    da, db_ = _df(spark, a), _df(spark, b)
    m = sk.hist_merge(sk.hist_sketch(da, F.col("v"), 0.0, 50.0, 8),
                      sk.hist_sketch(db_, F.col("v"), 0.0, 50.0, 8))
    d = sk.hist_sketch(da.unionByName(db_), F.col("v"), 0.0, 50.0, 8)
    assert sorted(map(tuple, m.collect())) == sorted(map(tuple, d.collect()))


@given(a=VALS)
@_settings
def test_bloom_membership_total(spark, a):
    da = _df(spark, a)
    bf = sk.bloom_sketch(da, F.col("v"), bits=1 << 10, k=3)
    if a:
        got = {r["v"]: r["maybe_present"] for r in sk.bloom_contains(
            bf, da.distinct(), "v", bits=1 << 10, k=3).collect()}
        assert all(got.values())  # no false negatives, for any input


@given(a=VALS, b=VALS)
@_settings
def test_hll_merge_law(spark, a, b):
    da, db_ = _df(spark, a), _df(spark, b)
    m = sk.hll_merge(sk.hll_sketch(da, F.col("v"), p=4),
                     sk.hll_sketch(db_, F.col("v"), p=4))
    d = sk.hll_sketch(da.unionByName(db_), F.col("v"), p=4)
    assert sorted(map(tuple, m.collect())) == sorted(map(tuple, d.collect()))


@given(a=VALS, b=VALS)
@_settings
def test_kmv_set_estimate_exact_under_k(spark, a, b):
    """With k larger than any input cardinality the sketches are
    complete, so 'estimates' must be EXACT set sizes for any inputs —
    union, intersection, and Jaccard numerator alike."""
    da, db_ = _df(spark, a), _df(spark, b)
    sa = sk.kmv_sketch(da, F.col("v"), k=64)
    sb = sk.kmv_sketch(db_, F.col("v"), k=64)
    rows = sk.kmv_set_estimate(sa, sb, k=64).collect()
    sa_, sb_ = set(a), set(b)
    if not sa_ and not sb_:
        assert rows == []
        return
    row = rows[0]
    assert row["est_union"] == len(sa_ | sb_)
    assert row["n_both"] == len(sa_ & sb_)
    assert row["est_intersection"] == len(sa_ & sb_)
    if sa_ | sb_:
        assert abs(row["jaccard"]
                   - len(sa_ & sb_) / len(sa_ | sb_)) < 1e-12
