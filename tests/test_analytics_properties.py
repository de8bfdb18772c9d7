"""Property-based tests (hypothesis) for the sequential-statistic
operators added in round 5: the CUSUM window identity (cumsum minus
running min == the reset-at-zero recursion) and the Holt in-row fold
(== the textbook Python recursion, bit-for-bit) are THEOREMS about the
implementations — test them like theorems, on arbitrary series.
Small example counts — each example runs Spark jobs."""

import math
from decimal import ROUND_HALF_UP, Decimal

import pytest
from hypothesis import HealthCheck, example, given, settings, strategies as st_

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


def _round6_half_up(x):
    # Spark's F.round rounds HALF_UP on the decimal rendering of the
    # double; Python's round() is binary half-even, and the two disagree
    # exactly at decimal ties like 0.0634375 (vals=[0,0,29,0,0]).  The
    # engine contract is HALF_UP, so the reference must round the same way.
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"),
                                           rounding=ROUND_HALF_UP))


@given(vals=SERIES)
@example(vals=[0, 0, 29, 0, 0])  # HALF_UP vs half-even tie at 0.0634375
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
    assert r["level"] == _round6_half_up(l)
    assert r["trend"] == _round6_half_up(t)
    assert r["forecast"] == _round6_half_up(l + 2 * t)


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


@given(edges=st_.lists(
    st_.tuples(st_.integers(0, 6), st_.integers(0, 6),
               st_.integers(1, 9)),
    min_size=1, max_size=15).map(
        lambda es: [e for e in es if e[0] != e[1]]))
@_settings
def test_bellman_ford_matches_python_fixed_round_relaxation(spark, edges):
    from hypothesis import assume

    from db_spark.graph import bellman_ford

    assume(edges)
    df = spark.createDataFrame(edges, "src long, dst long, weight long")
    got = {r["node"]: r["dist"]
           for r in bellman_ford(df, 0, rounds=3).collect()}

    # reference: identical fixed-round synchronous relaxation
    best = {}
    for s, d, w in edges:
        best[(s, d)] = min(best.get((s, d), w), w)
    dist = {0: 0}
    for _ in range(3):
        relaxed = {}
        for (s, d), w in best.items():
            if s in dist:
                nd = dist[s] + w
                relaxed[d] = min(relaxed.get(d, nd), nd)
        for d, nd in relaxed.items():
            dist[d] = min(dist.get(d, nd), nd)
    assert got == dist


@given(perm=st_.permutations(list(range(5))))
@_settings
def test_rbo_bounds_and_self_agreement(spark, perm):
    from db_spark.llm.similarity import rbo

    k, p = 5, 0.5
    ident = [(1, i, r + 1) for r, i in enumerate(range(5))]
    other = [(1, i, r + 1) for r, i in enumerate(perm)]
    a = spark.createDataFrame(ident, "query_id long, vec_id long, rank long")
    b = spark.createDataFrame(other, "query_id long, vec_id long, rank long")
    max_rbo = round((1 - p) * sum(p ** (d - 1) for d in range(1, k + 1)), 6)
    r = rbo(a, b, k=k, p=p).collect()[0]["rbo"]
    assert 0.0 <= r <= max_rbo
    self_r = rbo(a, a, k=k, p=p).collect()[0]["rbo"]
    assert self_r == max_rbo
