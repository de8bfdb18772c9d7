"""Catalyst-style rewrite rules over the Condition DSL.

The reference's declarative layer normalizes conditions to CNF and stops
there — ``Query::collect()`` drops them (src/query/mod.rs:52-54); the
canonical conjunct set was "the seed of a planner that was never
connected" (SURVEY §3.2). This module is that planner: a fixpoint
pipeline of semantic rewrites running *before* compilation to Catalyst
columns.

Catalyst itself performs constant folding and boolean simplification
after compilation, so the value here is what Catalyst cannot do from a
black-box expression:

- **Unsatisfiability proof → scan elimination.** A predicate that folds
  to FALSE means the query answers with an empty relation *without
  launching a job or touching storage* — at 100 TB that is the single
  biggest optimization there is. ``Query.df`` returns a local empty
  DataFrame (no FileScan in the plan, ``df.inputFiles() == []``).
- **Range intersection.** ``x > 3 AND x > 5 AND x <= 10`` becomes
  ``5 < x AND x <= 10``; contradictory ranges (``x < 3 AND x > 5``),
  conflicting points (``x = 1 AND x = 2``) and out-of-range points fold
  to FALSE. Fewer, tighter conjuncts → fewer parquet row-group stat
  comparisons per scan task.
- **OR→IN consolidation.** ``x = 1 OR x = 2 OR x = 3`` becomes
  ``x IN (1, 2, 3)`` — a single pushable In filter instead of an Or
  tree, which parquet dictionary/Bloom filters evaluate directly.
- **Complement detection.** ``c AND NOT c`` → FALSE — by canonical
  rendering, so it also catches syntactically different spellings
  normalized to the same form. The OR direction (``c OR NOT c`` → TRUE)
  is deliberately NOT applied: under SQL three-valued logic the clause
  evaluates to NULL (row filtered) when ``c`` is NULL on a nullable
  column, so the rewrite would return extra rows.

All rules are pure functions Condition → Condition; ``optimize``
iterates to a fixpoint (the lattice is finite: every rule strictly
shrinks the tree or leaves it unchanged).
"""

from __future__ import annotations

from typing import Any

from db_spark.conditions import (
    EQ, LIKE, LT, LTE, NOT,
    Condition, val,
)

TRUE = val(True)
FALSE = val(False)


def optimize(cond: Condition) -> Condition:
    """Normalize to CNF, then run the rewrite pipeline to fixpoint."""
    c = cond.normalize()
    for _ in range(10):
        before = c.render()
        c = _fold(c)
        c = _simplify_ranges(c)
        c = _or_to_in(c)
        c = _fold(c)
        if c.render() == before:
            break
    return c


def is_true(c: Condition) -> bool:
    return c.kind == "val" and c.value is True


def is_false(c: Condition) -> bool:
    return c.kind == "val" and c.value is False


# ---------------------------------------------------------------------------
# Rule 1: constant folding + boolean simplification + complement detection
# ---------------------------------------------------------------------------

def _like_match(s: str, pattern: str) -> bool:
    import re

    rx = re.escape(pattern).replace(r"%", ".*").replace(r"_", ".")
    return re.fullmatch(rx, s) is not None


def _fold(c: Condition) -> Condition:
    if c.kind == "bin":
        left, right = (_fold(x) for x in c.children)
        if left.kind == "val" and right.kind == "val":
            a, b = left.value, right.value
            try:
                if c.op == EQ:
                    return val(bool(a == b))
                if c.op == LT:
                    return val(bool(a < b))
                if c.op == LTE:
                    return val(bool(a <= b))
                if c.op == LIKE and isinstance(a, str) and isinstance(b, str):
                    return val(_like_match(a, b))
            except TypeError:
                pass  # incomparable literals: leave for runtime
        return Condition("bin", op=c.op, children=(left, right))
    if c.kind == "un" and c.op == NOT:
        child = _fold(c.children[0])
        if child.kind == "val" and isinstance(child.value, bool):
            return val(not child.value)
        return Condition("un", op=NOT, children=(child,))
    if c.kind in ("and", "or"):
        is_and = c.kind == "and"
        absorber, identity = (FALSE, TRUE) if is_and else (TRUE, FALSE)
        kept: list[Condition] = []
        for ch in (_fold(x) for x in c.children):
            if ch.render() == absorber.render():
                return absorber
            if ch.render() == identity.render():
                continue
            kept.append(ch)
        # Complement detection on canonical renderings — AND direction
        # only: `c AND NOT c` -> FALSE is sound under SQL three-valued
        # logic (NULL AND NULL filters the row exactly like FALSE), but
        # `c OR NOT c` -> TRUE is NOT (when c is NULL the clause
        # evaluates NULL and the row is filtered; TRUE would keep it).
        # Without column nullability metadata in the DSL the OR rewrite
        # cannot be proven safe, so it is never applied.
        if is_and:
            rendered = {k.render() for k in kept}
            for k in kept:
                neg = (k.children[0].render() if (k.kind == "un" and k.op == NOT)
                       else f"NOT ({k.render(False)})")
                if neg in rendered:
                    return absorber
        if not kept:
            return identity
        if len(kept) == 1:
            return kept[0]
        return Condition(c.kind, children=tuple(
            sorted(kept, key=lambda x: x.render())))
    return c


# ---------------------------------------------------------------------------
# Rule 2: per-column range intersection over top-level conjuncts
# ---------------------------------------------------------------------------

def _interval_of(conj: Condition):
    """(col_name, kind, value): kind in {'eq','lo','lo=','hi','hi='} for
    single-column comparisons against a literal; None otherwise.
    Normalized form has only EQ / LT / LTE with the column on either
    side (GT/GTE were flipped by the normalizer)."""
    if conj.kind != "bin" or conj.op not in (EQ, LT, LTE):
        return None
    left, right = conj.children
    if left.kind == "col" and right.kind == "val":
        kind = {EQ: "eq", LT: "hi", LTE: "hi="}[conj.op]
        return (left.name, kind, right.value)
    if left.kind == "val" and right.kind == "col":
        kind = {EQ: "eq", LT: "lo", LTE: "lo="}[conj.op]
        return (right.name, kind, left.value)
    return None


def _comparable(vals: list[Any]) -> bool:
    if not vals:
        return False
    if all(isinstance(v, (int, float)) and not isinstance(v, bool) for v in vals):
        return True
    if all(isinstance(v, str) for v in vals):
        return True
    return False


def _simplify_ranges(c: Condition) -> Condition:
    conjuncts = list(c.children) if c.kind == "and" else [c]
    by_col: dict[str, list[tuple[Condition, tuple]]] = {}
    passthrough: list[Condition] = []
    for conj in conjuncts:
        iv = _interval_of(conj)
        if iv is None:
            passthrough.append(conj)
        else:
            by_col.setdefault(iv[0], []).append((conj, iv))

    out: list[Condition] = list(passthrough)
    for name, items in by_col.items():
        vals = [iv[2] for _, iv in items]
        if len(items) == 1 or not _comparable(vals):
            out.extend(conj for conj, _ in items)
            continue
        lo, lo_strict, hi, hi_strict, points = None, False, None, False, set()
        for _, (_n, kind, v) in items:
            if kind == "eq":
                points.add(v)
            elif kind in ("lo", "lo="):
                strict = kind == "lo"
                if lo is None or v > lo or (v == lo and strict):
                    lo, lo_strict = v, strict
            else:
                strict = kind == "hi"
                if hi is None or v < hi or (v == hi and strict):
                    hi, hi_strict = v, strict
        if len(points) > 1:
            return FALSE  # x = a AND x = b, a != b
        if points:
            (p,) = points
            if lo is not None and (p < lo or (p == lo and lo_strict)):
                return FALSE
            if hi is not None and (p > hi or (p == hi and hi_strict)):
                return FALSE
            out.append(Condition("bin", op=EQ,
                                 children=(Condition.column(name), val(p))))
            continue
        if lo is not None and hi is not None:
            if lo > hi or (lo == hi and (lo_strict or hi_strict)):
                return FALSE
        if lo is not None:
            op = LT if lo_strict else LTE
            out.append(Condition("bin", op=op,
                                 children=(val(lo), Condition.column(name))))
        if hi is not None:
            op = LT if hi_strict else LTE
            out.append(Condition("bin", op=op,
                                 children=(Condition.column(name), val(hi))))
    if not out:
        return TRUE
    if len(out) == 1:
        return out[0]
    return Condition("and", children=tuple(sorted(out, key=lambda x: x.render())))


# ---------------------------------------------------------------------------
# Rule 3: OR-of-equalities → IN list (single pushable filter)
# ---------------------------------------------------------------------------

def _clause_to_in(clause: Condition) -> Condition:
    if clause.kind != "or":
        return clause
    name, vals = None, []
    for ch in clause.children:
        if ch.kind == "in" and ch.children[0].kind == "col":
            if name is None:
                name = ch.children[0].name
            if ch.children[0].name != name:
                return clause
            vals.extend(ch.value)
            continue
        iv = _interval_of(ch)
        if iv is None or iv[1] != "eq":
            return clause
        if name is None:
            name = iv[0]
        if iv[0] != name:
            return clause
        vals.append(iv[2])
    if name is None or len(vals) < 2:
        return clause
    uniq = tuple(dict.fromkeys(vals))
    return Condition("in", children=(Condition.column(name),), value=uniq)


def _or_to_in(c: Condition) -> Condition:
    if c.kind == "and":
        return Condition("and", children=tuple(
            sorted((_clause_to_in(ch) for ch in c.children),
                   key=lambda x: x.render())))
    return _clause_to_in(c)
