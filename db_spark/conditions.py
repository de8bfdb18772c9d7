"""Condition DSL + normalizer, mapped onto Spark ``Column`` expressions.

Reference parity: src/query/condition.rs (Condition tree over BTreeSet),
src/query/binary_expression.rs:24-61 (binary rewrites), and
src/query/unary_expression.rs:24-51 (double-negation / De Morgan). The
reference normalizes conditions to CNF but ``Query::collect()`` drops
them entirely (src/query/mod.rs:52-54) — the declarative layer was never
wired to execution. Here the design is completed: ``Condition.to_column()``
produces a Catalyst expression and ``Query.collect()`` applies every
conjunct as a ``.filter()``, so predicate pushdown / partition pruning
happen for real.

Normal form notes (SURVEY §2.2): the reference docstring says "DNF" but the
algorithm distributes OR over AND producing **CNF** (AND of ORs) — we
implement CNF, matching the reference's actual behavior and tests
(src/query/condition.rs:293-355).
"""

from __future__ import annotations

import uuid
from dataclasses import dataclass
from typing import Any, Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Node kinds
# ---------------------------------------------------------------------------

# binary operators (src/query/binary_expression.rs:13-22)
EQ, NEQ, LT, LTE, GT, GTE, LIKE, NOT_LIKE = (
    "=", "!=", "<", "<=", ">", ">=", "LIKE", "NOT LIKE",
)
# unary operators (src/query/unary_expression.rs:12-15)
NOT, LENGTH = "NOT", "LENGTH"


@dataclass(frozen=True)
class Condition:
    """Immutable condition-tree node.

    kind: 'col' | 'val' | 'bin' | 'un' | 'and' | 'or'
    """

    kind: str
    op: str | None = None
    children: tuple = ()
    name: str | None = None
    value: Any = None

    # -- constructors -------------------------------------------------------
    @staticmethod
    def column(name: str) -> "Condition":
        return Condition("col", name=name)

    @staticmethod
    def literal(value: Any) -> "Condition":
        return Condition("val", value=value)

    @staticmethod
    def all_of(conds: Iterable["Condition"]) -> "Condition":
        return _nary("and", conds)

    @staticmethod
    def any_of(conds: Iterable["Condition"]) -> "Condition":
        return _nary("or", conds)

    # -- operator sugar -----------------------------------------------------
    def _bin(self, op: str, other: Any) -> "Condition":
        return Condition("bin", op=op, children=(self, _coerce(other)))

    def __eq__(self, other):  # type: ignore[override]
        if isinstance(other, Condition) and self.kind in ("col", "val") or not isinstance(other, Condition):
            return self._bin(EQ, other)
        return NotImplemented

    def __ne__(self, other):  # type: ignore[override]
        return self._bin(NEQ, other)

    def __lt__(self, other):
        return self._bin(LT, other)

    def __le__(self, other):
        return self._bin(LTE, other)

    def __gt__(self, other):
        return self._bin(GT, other)

    def __ge__(self, other):
        return self._bin(GTE, other)

    def like(self, pattern: str) -> "Condition":
        return self._bin(LIKE, pattern)

    def between(self, lo: Any, hi: Any) -> "Condition":
        """Inclusive range — two conjuncts, so the optimizer's range rule
        can tighten them against other bounds."""
        return (self >= lo) & (self <= hi)

    def isin(self, *values: Any) -> "Condition":
        return Condition("in", children=(self,), value=tuple(values))

    def not_like(self, pattern: str) -> "Condition":
        return self._bin(NOT_LIKE, pattern)

    def length(self) -> "Condition":
        return Condition("un", op=LENGTH, children=(self,))

    def __and__(self, other: "Condition") -> "Condition":
        return _nary("and", (self, other))

    def __or__(self, other: "Condition") -> "Condition":
        return _nary("or", (self, other))

    def __invert__(self) -> "Condition":
        return Condition("un", op=NOT, children=(self,))

    def __hash__(self):
        return hash(self.render())

    # -- rendering (used for canonical BTreeSet-style ordering + tests) -----
    def render(self, top: bool = True) -> str:
        if self.kind == "col":
            return str(self.name)
        if self.kind == "val":
            return repr(self.value)
        if self.kind == "bin":
            left, right = self.children
            return f"{left.render(False)} {self.op} {right.render(False)}"
        if self.kind == "un":
            (child,) = self.children
            if self.op == LENGTH:
                return f"LENGTH({child.render(False)})"
            return f"NOT ({child.render(False)})"
        if self.kind == "in":
            (child,) = self.children
            vals = ", ".join(repr(v) for v in self.value)
            return f"{child.render(False)} IN ({vals})"
        sep = f" {self.kind.upper()} "
        body = sep.join(c.render(False) for c in self.children)
        return body if top and self.kind == "and" else f"({body})"

    def __repr__(self):
        return f"Condition<{self.render()}>"

    # -- normalization ------------------------------------------------------
    def normalize(self) -> "Condition":
        """Rewrite to CNF with canonicalized comparisons.

        Steps (mirroring the reference's actual behavior):
        1. binary rewrites: ``a != b -> NOT(a = b)``, ``NOT LIKE ->
           NOT(LIKE)``, ``a > b -> b < a``, ``a >= b -> b <= a``
           (src/query/binary_expression.rs:24-61);
        2. NOT pushdown: double-negation elimination + De Morgan
           (src/query/unary_expression.rs:24-51);
        3. distribute OR over AND -> CNF, flatten, dedup + canonical
           ordering (BTreeSet semantics, src/query/condition.rs:26-82).
        """
        return _to_cnf(_push_not(_rewrite_bin(self)))

    def conjuncts(self) -> list["Condition"]:
        """Top-level AND members of the normalized form (CNF clauses)."""
        n = self.normalize()
        return list(n.children) if n.kind == "and" else [n]

    # -- execution ----------------------------------------------------------
    def to_column(self) -> Column:
        """Compile to a Catalyst ``Column`` expression."""
        if self.kind == "col":
            return F.col(self.name)
        if self.kind == "val":
            v = self.value
            if isinstance(v, uuid.UUID):
                v = str(v)
            return F.lit(v)
        if self.kind == "bin":
            left, right = (c.to_column() for c in self.children)
            return {
                EQ: lambda: left == right,
                NEQ: lambda: left != right,
                LT: lambda: left < right,
                LTE: lambda: left <= right,
                GT: lambda: left > right,
                GTE: lambda: left >= right,
                LIKE: lambda: left.like(self.children[1].value),
                NOT_LIKE: lambda: ~left.like(self.children[1].value),
            }[self.op]()
        if self.kind == "un":
            if self.op == LENGTH:
                return F.length(self.children[0].to_column())
            return ~self.children[0].to_column()
        if self.kind == "in":
            vals = [str(v) if isinstance(v, uuid.UUID) else v for v in self.value]
            return self.children[0].to_column().isin(*vals)
        cols = [c.to_column() for c in self.children]
        out = cols[0]
        for c in cols[1:]:
            out = (out & c) if self.kind == "and" else (out | c)
        return out


def col(name: str) -> Condition:
    """Reference ``Condition::Column`` (src/query/condition.rs:19)."""
    return Condition.column(name)


def val(value: Any) -> Condition:
    """Reference ``Condition::Value`` (src/query/condition.rs:20)."""
    return Condition.literal(value)


def _coerce(x: Any) -> Condition:
    return x if isinstance(x, Condition) else Condition.literal(x)


def _nary(kind: str, conds: Iterable[Condition]) -> Condition:
    """Build an AND/OR node with BTreeSet semantics: flatten same-kind
    children, dedup, canonical order (by rendering)."""
    flat: list[Condition] = []
    for c in conds:
        if c.kind == kind:
            flat.extend(c.children)
        else:
            flat.append(c)
    uniq = {c.render(): c for c in flat}
    ordered = tuple(uniq[k] for k in sorted(uniq))
    if len(ordered) == 1:
        return ordered[0]
    return Condition(kind, children=ordered)


# ---------------------------------------------------------------------------
# Normalization passes
# ---------------------------------------------------------------------------

def _rewrite_bin(c: Condition) -> Condition:
    if c.kind == "bin":
        left, right = (_rewrite_bin(x) for x in c.children)
        if c.op == NEQ:
            return Condition("un", op=NOT, children=(Condition("bin", op=EQ, children=(left, right)),))
        if c.op == NOT_LIKE:
            return Condition("un", op=NOT, children=(Condition("bin", op=LIKE, children=(left, right)),))
        if c.op == GT:
            return Condition("bin", op=LT, children=(right, left))
        if c.op == GTE:
            return Condition("bin", op=LTE, children=(right, left))
        return Condition("bin", op=c.op, children=(left, right))
    if c.kind in ("and", "or"):
        return _nary(c.kind, (_rewrite_bin(x) for x in c.children))
    if c.kind == "un":
        return Condition("un", op=c.op, children=(_rewrite_bin(c.children[0]),))
    return c


def _push_not(c: Condition, negate: bool = False) -> Condition:
    if c.kind == "un" and c.op == NOT:
        return _push_not(c.children[0], not negate)
    if c.kind in ("and", "or"):
        kind = c.kind
        if negate:  # De Morgan
            kind = "or" if kind == "and" else "and"
        return _nary(kind, (_push_not(x, negate) for x in c.children))
    if negate:
        return Condition("un", op=NOT, children=(_push_not(c, False),))
    if c.kind == "un":  # LENGTH
        return Condition("un", op=c.op, children=(_push_not(c.children[0], False),))
    if c.kind == "bin":
        return Condition("bin", op=c.op, children=tuple(_push_not(x, False) for x in c.children))
    return c


def _to_cnf(c: Condition) -> Condition:
    if c.kind == "and":
        return _nary("and", (_to_cnf(x) for x in c.children))
    if c.kind == "or":
        children = [_to_cnf(x) for x in c.children]
        for i, ch in enumerate(children):
            if ch.kind == "and":
                rest = children[:i] + children[i + 1 :]
                distributed = [
                    _to_cnf(_nary("or", rest + [branch])) for branch in ch.children
                ]
                return _nary("and", distributed)
        return _nary("or", children)
    return c


# ---------------------------------------------------------------------------
# Declarative Query (reference entry point B — completed)
# ---------------------------------------------------------------------------

class Query:
    """Accumulates normalized conditions against a DataFrame source and —
    unlike the reference (src/query/mod.rs:52-54, conditions dropped) —
    actually applies them on collect/df.

    Conjuncts are applied as separate ``.filter()`` calls so Catalyst sees
    canonical top-level conjunctions for pushdown.
    """

    def __init__(self, df: DataFrame):
        self._df = df
        self._conjuncts: dict[str, Condition] = {}

    @staticmethod
    def from_collection(collection, txid=None) -> "Query":
        return Query(collection.table_scan(txid))

    def filter(self, cond: Condition) -> "Query":
        q = Query(self._df)
        q._conjuncts = dict(self._conjuncts)
        for conj in cond.conjuncts():
            q._conjuncts[conj.render()] = conj
        return q

    @property
    def df(self) -> DataFrame:
        from db_spark.optimizer import is_false, is_true, optimize

        if not self._conjuncts:
            return self._df
        combined = Condition.all_of(self._conjuncts.values())
        opt = optimize(combined)
        if is_false(opt):
            # unsatisfiable predicate: answer from an empty local relation
            # — no job, no FileScan, no I/O (df.inputFiles() == [])
            return self._df.sparkSession.createDataFrame([], self._df.schema)
        if is_true(opt):
            return self._df
        out = self._df
        for conj in (opt.children if opt.kind == "and" else [opt]):
            out = out.filter(conj.to_column())
        return out

    def collect(self):
        return self.df.collect()
