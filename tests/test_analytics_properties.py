"""Property-based tests (hypothesis) for the sequential-statistic
operators added in round 5: the CUSUM window identity (cumsum minus
running min == the reset-at-zero recursion) and the Holt in-row fold
(== the textbook Python recursion, bit-for-bit) are THEOREMS about the
implementations — test them like theorems, on arbitrary series.
Small example counts — each example runs Spark jobs."""

import math

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st_

from db_spark.analytics import cusum_changepoints, holt_forecast, linreg

_settings = settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture])

# integer-cent values: the operators' exact domain
SERIES = st_.lists(
    st_.integers(min_value=0, max_value=10_000), min_size=2, max_size=24)


@given(vals=SERIES)
@_settings
def test_cusum_window_form_equals_recursion(spark, vals):
    df = spark.createDataFrame(
        [("k", i, c / 100.0) for i, c in enumerate(vals)],
        "k string, t long, v double")
    out = cusum_changepoints(
        df, "k", "t", "v", threshold=1.0, alarms_only=False
    ).orderBy("t").collect()

    # direct reset-at-zero recursion over integer cents
    t0 = sum(vals) // len(vals)
    sp = sn = 0
    exp = []
    for c in vals:
        sp = max(0, sp + (c - t0))
        sn = max(0, sn + (t0 - c))
        exp.append((sp, sn))
    got = [(round(r["s_pos"] * 100), round(r["s_neg"] * 100)) for r in out]
    assert got == exp


@given(vals=SERIES)
@_settings
def test_holt_fold_equals_python_recursion(spark, vals):
    ys = [c / 100.0 for c in vals]
    df = spark.createDataFrame(
        [("k", i, y) for i, y in enumerate(ys)],
        "k string, t long, v double")
    r = holt_forecast(df, "k", "t", "v", horizon=2).collect()[0]

    l, t = ys[1], ys[1] - ys[0]
    for y in ys[2:]:
        nl = 0.5 * y + 0.5 * (l + t)
        t = 0.5 * (nl - l) + 0.5 * t
        l = nl
    assert r["level"] == round(l, 6)
    assert r["trend"] == round(t, 6)
    assert r["forecast"] == round(l + 2 * t, 6)


@given(pairs=st_.lists(
    st_.tuples(st_.integers(0, 1000), st_.integers(0, 1000)),
    min_size=3, max_size=20))
@_settings
def test_linreg_matches_reference_least_squares(spark, pairs):
    df = spark.createDataFrame(
        [("g", x / 10.0, y / 10.0) for x, y in pairs],
        "g string, x double, y double")
    r = linreg(df, ["g"], "x", "y").collect()[0]

    xs = [x / 10.0 for x, _ in pairs]
    ys = [y / 10.0 for _, y in pairs]
    n = len(pairs)
    mx, my = sum(xs) / n, sum(ys) / n
    sxx = sum((x - mx) ** 2 for x in xs)
    sxy = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    if math.isclose(sxx, 0.0):
        assert r["slope"] is None and r["intercept"] is None
    else:
        slope = sxy / sxx
        assert r["slope"] == pytest.approx(slope, abs=1e-5)
        assert r["intercept"] == pytest.approx(my - slope * mx, abs=1e-4)
