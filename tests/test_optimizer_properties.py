"""Property-based checks: for ANY condition tree, the normalized and the
optimized forms are semantically identical to the original — evaluated
naively in Python over a small row domain (no Spark needed, so hypothesis
can run hundreds of cases)."""

from __future__ import annotations

import hypothesis.strategies as st
from hypothesis import given, settings

from db_spark.conditions import (
    EQ, LIKE, LT, LTE, NOT, LENGTH, Condition, col, val,
)
from db_spark.optimizer import optimize

COLS = ["a", "b"]
VALUES = [0, 1, 2, 5, 10]
ROWS = [{"a": x, "b": y} for x in VALUES for y in VALUES]


def _leaf_comparison(draw):
    c = draw(st.sampled_from(COLS))
    v = draw(st.sampled_from(VALUES))
    op = draw(st.sampled_from(["eq", "ne", "lt", "le", "gt", "ge"]))
    cc = col(c)
    return {
        "eq": lambda: cc == val(v),
        "ne": lambda: cc != val(v),
        "lt": lambda: cc < val(v),
        "le": lambda: cc <= val(v),
        "gt": lambda: cc > val(v),
        "ge": lambda: cc >= val(v),
    }[op]()


@st.composite
def condition_trees(draw, depth=3):
    if depth == 0 or draw(st.booleans()):
        return _leaf_comparison(draw)
    kind = draw(st.sampled_from(["and", "or", "not"]))
    if kind == "not":
        return ~(draw(condition_trees(depth=depth - 1)))
    left = draw(condition_trees(depth=depth - 1))
    right = draw(condition_trees(depth=depth - 1))
    return (left & right) if kind == "and" else (left | right)


def _eval(c: Condition, row: dict):
    if c.kind == "col":
        return row[c.name]
    if c.kind == "val":
        return c.value
    if c.kind == "bin":
        left, right = (_eval(x, row) for x in c.children)
        if c.op == EQ:
            return left == right
        if c.op == LT:
            return left < right
        if c.op == LTE:
            return left <= right
        if c.op == "!=":
            return left != right
        if c.op == ">":
            return left > right
        if c.op == ">=":
            return left >= right
        raise NotImplementedError(c.op)
    if c.kind == "un":
        if c.op == NOT:
            return not _eval(c.children[0], row)
        if c.op == LENGTH:
            return len(_eval(c.children[0], row))
    if c.kind == "in":
        return _eval(c.children[0], row) in c.value
    if c.kind == "and":
        return all(_eval(x, row) for x in c.children)
    if c.kind == "or":
        return any(_eval(x, row) for x in c.children)
    raise NotImplementedError(c.kind)


@given(condition_trees())
@settings(max_examples=300, deadline=None)
def test_normalize_preserves_semantics(cond):
    norm = cond.normalize()
    for row in ROWS:
        assert _eval(cond, row) == _eval(norm, row)


@given(condition_trees())
@settings(max_examples=300, deadline=None)
def test_optimize_preserves_semantics(cond):
    opt = optimize(cond)
    for row in ROWS:
        assert _eval(cond, row) == bool(_eval(opt, row))


@given(condition_trees())
@settings(max_examples=100, deadline=None)
def test_optimize_is_idempotent(cond):
    once = optimize(cond)
    twice = optimize(once)
    assert once.render() == twice.render()
