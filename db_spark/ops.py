"""Q — the chainable operator builder (reference operator parity layer).

The reference's whole physical algebra is the ``DBOperator`` trait plus
chaining constructors (reference: src/operators/mod.rs:11-86). ``Q``
exposes the same names over a ``DataFrame``; the "IR" is Catalyst's
logical plan, so construction stays lazy and the optimizer is free to
push down, prune, reorder and pick physical join strategies — the things
the reference's hand-built pipelines cannot do.

Operator map (SURVEY §2.1):
  table_scan      -> Collection.table_scan (MVCC snapshot, table.py)
  filter          -> Q.filter (Column / Condition DSL / SQL string)
  select          -> Q.select (projection) / select-with-aggregates
                     (builder callable -> groupBy().agg(); the reference's
                     sorted-input requirement disappears with hash agg)
  take / skip     -> Q.take / Q.skip  (limit / offset)
  nested_loop     -> Q.nested_loop  (inner equi-join; Catalyst picks the
                     physical strategy — capability parity, SURVEY #10)
  hash_match      -> Q.hash_match   (hash equi-join, optional broadcast
                     of the build side like the reference's hashed input)
  in_memory_sort  -> Q.in_memory_sort (external sort; we implement the
                     *named* semantics, not the reference's inverted
                     Ascending bug — in_memory_sort.rs:57-62)
  deserialize     -> Q.deserialize / to_pandas / collect
  concatenate / constant_scan / distinct  (roadmap ops README.md:76-108)
"""

from __future__ import annotations

import enum
from typing import Any, Callable, Iterable, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from db_spark.conditions import Condition
from db_spark.functions import truthy


class SortDirection(enum.Enum):
    """reference: src/operators/sorting/mod.rs:3-7."""

    ASCENDING = "ascending"
    DESCENDING = "descending"


_SORT_SUFFIXES = tuple(
    f" {d} NULLS {n}'>" for d in ("ASC", "DESC") for n in ("FIRST", "LAST"))


def _is_sort_order(c: Column) -> bool:
    """True when the Column already carries a SortOrder (``.asc()`` /
    ``.desc()`` applied) — re-wrapping one crashes codegen. Public-API
    detection via the canonical repr (``Column<'x DESC NULLS LAST'>``),
    which works under both classic and Connect sessions (the previous
    ``_jc`` introspection was JVM-only)."""
    return str(c).endswith(_SORT_SUFFIXES)


def _as_column(df: DataFrame, key: int | str | Column) -> Column:
    if isinstance(key, Column):
        return key
    if isinstance(key, int):
        return df[df.columns[key]]
    return df[key]


class Q:
    """Fluent, lazy query over a DataFrame. Every method returns a new Q."""

    def __init__(self, df: DataFrame):
        self._df = df

    # -- sources ------------------------------------------------------------
    @staticmethod
    def scan(df: DataFrame) -> "Q":
        return Q(df)

    @staticmethod
    def parquet(spark: SparkSession, path: str) -> "Q":
        return Q(spark.read.parquet(path))

    @staticmethod
    def constant_scan(spark: SparkSession, rows: list, schema) -> "Q":
        """Roadmap 'Constant Scan' (reference README.md:83)."""
        return Q(spark.createDataFrame(rows, schema=schema))

    @property
    def df(self) -> DataFrame:
        return self._df

    @property
    def columns(self) -> list[str]:
        return self._df.columns

    # -- linear operators ---------------------------------------------------
    def filter(self, predicate: Condition | Column | str) -> "Q":
        """reference: src/operators/linear/filter.rs:25-47. Accepts the
        Condition DSL (normalized, conjuncts applied separately so Catalyst
        sees canonical ANDs), a Spark Column, or a SQL expression string."""
        if isinstance(predicate, Condition):
            out = self._df
            for conj in predicate.conjuncts():
                out = out.filter(conj.to_column())
            return Q(out)
        return Q(self._df.filter(predicate))

    def select(self, *cols: int | str | Column, builder: Callable | None = None) -> "Q":
        """Projection, or — with ``builder`` — the reference's combined
        projection/aggregation operator (src/operators/linear/select.rs:32-76).

        ``builder`` receives a :class:`SelectBuilder`; if any aggregate
        field is added the result is ``groupBy(plain).agg(...)`` (hash
        aggregation — correct on unsorted input, unlike the reference's
        group-change streaming aggregate which requires group-sorted
        input; documented deviation SURVEY §2.1 #3).
        """
        if builder is not None:
            b = SelectBuilder(self._df)
            builder(b)
            return Q(b.build())
        exprs = [_as_column(self._df, c) for c in cols]
        return Q(self._df.select(*exprs))

    def take(self, n: int) -> "Q":
        """LIMIT n (reference: src/operators/linear/take.rs:23-49)."""
        return Q(self._df.limit(n))

    def skip(self, n: int) -> "Q":
        """OFFSET n (reference: src/operators/linear/skip.rs:22-34 — the
        reference version breaks plain ``collect``, SURVEY §2.1 #9; ours
        is a real offset)."""
        return Q(self._df.offset(n))

    def distinct(self, *cols: str) -> "Q":
        """Roadmap 'Distinct' (reference README.md:94)."""
        return Q(self._df.dropDuplicates(list(cols)) if cols else self._df.distinct())

    def concat(self, other: "Q | DataFrame") -> "Q":
        """Roadmap 'Concatenate' (reference README.md:82)."""
        o = other.df if isinstance(other, Q) else other
        return Q(self._df.unionByName(o))

    # -- set operations (beyond reference; SURVEY §2.3 gaps) ----------------
    def intersect(self, other: "Q | DataFrame") -> "Q":
        o = other.df if isinstance(other, Q) else other
        return Q(self._df.intersect(o))

    def except_all(self, other: "Q | DataFrame") -> "Q":
        o = other.df if isinstance(other, Q) else other
        return Q(self._df.exceptAll(o))

    # -- reshaping (beyond reference; SURVEY §2.3 gaps) ---------------------
    def pivot(
        self, group_cols: Sequence[str], pivot_col: str,
        values: Sequence, agg: Column,
    ) -> "Q":
        """Pivot ``pivot_col`` into one output column per value in
        ``values`` (explicit value list keeps the plan a single pass —
        no extra job to discover distinct values, which matters when the
        fact table is 100 TB)."""
        return Q(self._df.groupBy(*group_cols).pivot(pivot_col, list(values)).agg(agg))

    def unpivot(
        self, id_cols: Sequence[str], value_cols: Sequence[str],
        var_name: str = "metric", value_name: str = "value",
    ) -> "Q":
        """Melt ``value_cols`` into (``var_name``, ``value_name``) long
        form — narrow transform, no shuffle."""
        return Q(self._df.unpivot(list(id_cols), list(value_cols), var_name, value_name))

    # -- joins --------------------------------------------------------------
    def nested_loop(
        self, other: "Q | DataFrame", left_key: int | str, right_key: int | str,
        how: str = "inner",
    ) -> "Q":
        """Inner equi-join by column position/name (reference:
        src/operators/joining/nested_loop.rs:28-55). The reference rescans
        the inner input per outer row; we declare the equi-join and let
        Catalyst pick broadcast-hash/SMJ — same capability, scale-safe.
        Output column order = left fields ++ right fields
        (reference Row::combine, log_entry.rs:153-158)."""
        return self._equi_join(other, left_key, right_key, how)

    def hash_match(
        self, hashed: "Q | DataFrame", left_key: int | str, right_key: int | str,
        how: str = "inner", broadcast_build: bool = False,
    ) -> "Q":
        """Hash inner equi-join; the reference fully materializes and
        hashes the right ("hashed") input (src/operators/joining/
        hash_match.rs:54-119). ``broadcast_build=True`` reproduces that
        build-side choice explicitly when the build side is small."""
        o = hashed.df if isinstance(hashed, Q) else hashed
        if broadcast_build:
            o = F.broadcast(o)
        return self._equi_join(Q(o), left_key, right_key, how)

    def _equi_join(self, other, left_key, right_key, how) -> "Q":
        o = other.df if isinstance(other, Q) else other
        left, right = self._df, o
        lc, rc = _as_column(left, left_key), _as_column(right, right_key)
        joined = left.join(right, lc == rc, how)
        return Q(joined)

    def join(self, other: "Q | DataFrame", on, how: str = "inner") -> "Q":
        """General join surface: equi (list of names), theta (Column
        expression), or cross — outer/semi/anti variants included
        (capabilities absent from the reference, SURVEY §2.3)."""
        o = other.df if isinstance(other, Q) else other
        return Q(self._df.join(o, on, how))

    def cross_join(self, other: "Q | DataFrame") -> "Q":
        o = other.df if isinstance(other, Q) else other
        return Q(self._df.crossJoin(o))

    # -- sorting ------------------------------------------------------------
    def in_memory_sort(
        self, key: int | str | Column | Sequence, direction: SortDirection = SortDirection.ASCENDING,
    ) -> "Q":
        """reference: src/operators/sorting/in_memory_sort.rs:40-72.
        Spark's orderBy is a range-partitioned external sort (spills;
        cluster-wide) — strictly stronger than the reference's full
        in-memory materialization. We implement the *named* direction
        semantics (the reference's Ascending emits descending output —
        in_memory_sort.rs:57-62 quirk; documented deviation)."""
        keys = key if isinstance(key, (list, tuple)) else [key]
        cols = []
        for k in keys:
            if isinstance(k, Column):
                # Column keys may already carry a SortOrder (e.g. .desc());
                # only flip direction for plain positional/name keys.
                cols.append(k.desc() if direction is SortDirection.DESCENDING and not _is_sort_order(k) else k)
            else:
                c = _as_column(self._df, k)
                cols.append(c.desc() if direction is SortDirection.DESCENDING else c.asc())
        return Q(self._df.orderBy(*cols))

    def order_by(self, *cols: Column | str) -> "Q":
        return Q(self._df.orderBy(*cols))

    # -- grouping (idiomatic surface used by select-with-aggregates too) ----
    def group_agg(self, group_cols: Sequence, aggs: Sequence[Column]) -> "Q":
        gcols = [_as_column(self._df, c) for c in group_cols]
        return Q(self._df.groupBy(*gcols).agg(*aggs))

    # -- sinks --------------------------------------------------------------
    def collect(self):
        """reference: operators/mod.rs:62-74 (drives the pipeline)."""
        return self._df.collect()

    def deserialize(self, cls=None):
        """reference sink adapter src/operators/deserializing.rs:26-47 —
        positional struct mapping. Returns a list of ``cls`` built
        positionally from each row (or plain Rows if cls is None).

        Parity with the reference deserializer
        (src/objects/object_deserializer.rs:166-179): rows with *extra
        trailing* columns deserialize fine (the extras are ignored); rows
        with fewer columns than the struct requires raise."""
        rows = self._df.collect()
        if cls is None:
            return rows
        import inspect

        try:
            params = list(inspect.signature(cls).parameters.values())
        except (TypeError, ValueError):  # builtins without signatures
            return [cls(*row) for row in rows]
        if any(p.kind is inspect.Parameter.VAR_POSITIONAL for p in params):
            return [cls(*row) for row in rows]
        pos = [p for p in params if p.kind in (
            inspect.Parameter.POSITIONAL_ONLY,
            inspect.Parameter.POSITIONAL_OR_KEYWORD)]
        n_max = len(pos)
        n_req = sum(1 for p in pos if p.default is inspect.Parameter.empty)
        n_cols = len(self._df.columns)
        if n_cols < n_req:
            raise ValueError(
                f"deserialize: {cls.__name__} needs {n_req} fields, row has "
                f"{n_cols} (reference object_deserializer.rs:166-179 errors "
                "on missing fields)")
        return [cls(*row[:n_max]) for row in rows]

    def to_pandas(self):
        return self._df.toPandas()

    def count(self) -> int:
        return self._df.count()

    def explain(self, mode: str = "formatted"):
        return self._df.explain(mode)

    def cache(self) -> "Q":
        """Roadmap 'Table Spool' (reference README.md:84-88): cached
        re-iterable intermediate."""
        return Q(self._df.cache())

    # -- DBOperator trait tail (reference src/operators/mod.rs:11-40) -------

    def reset(self) -> "Q":
        """Reference ``reset()`` re-winds an operator for re-iteration
        (nested-loop rescans, operators/mod.rs:16-19). A DataFrame is a
        plan, not a cursor — every action re-executes it — so reset is
        the identity; spools (``cache``) retain their cache across
        resets, matching the trait's doc comment."""
        return self

    def size_hint(self) -> tuple[int, int | None]:
        """Reference ``size_hint() -> (usize, Option<usize>)``
        (operators/mod.rs:22-36): (lower, optional upper) row-count
        estimate used to preallocate ``collect``. We answer from
        Catalyst's cost model (optimized-plan statistics) — exact after
        ``ANALYZE``/AQE, else an upper estimate; (0, None) when the
        backend exposes no stats (e.g. Spark Connect)."""
        try:
            stats = self._df._jdf.queryExecution().optimizedPlan().stats()
            rc = stats.rowCount()
            upper = int(str(rc.get())) if rc.isDefined() else None
            return (upper if upper is not None else 0, upper)
        except Exception:  # pragma: no cover - connect/remote backends
            return (0, None)

    def cost_hint(self) -> float | None:
        """Reference ``cost_hint()`` is declared and never overridden by
        any operator — always ``None`` (operators/mod.rs:38-40). We keep
        the method for API parity but answer with Catalyst's sizeInBytes
        estimate when available, since our planner actually has one."""
        try:
            stats = self._df._jdf.queryExecution().optimizedPlan().stats()
            return float(str(stats.sizeInBytes()))
        except Exception:  # pragma: no cover - connect/remote backends
            return None


class SelectBuilder:
    """Parity surface for the reference's SelectBuilder
    (src/operators/linear/select.rs:227-268).

    Plain fields (``column``/``value``/``expr``) become group keys when at
    least one aggregate field (``sum_value``/``count``/``count_when``/
    ``max_value``/``min_value``) is present — the reference emits a row per
    *group change* on sorted input; hash aggregation gives the same groups
    on any input order.

    Known reference bugs intentionally not reproduced (SURVEY §7):
    ``min_value`` combining as Max (select.rs:195-201) and ``count_when``'s
    inverted decimal truthiness (select.rs:257).
    """

    def __init__(self, df: DataFrame):
        self._df = df
        self._fields: list[tuple[str, Column]] = []  # ('plain'|'agg', col)
        self._n = 0

    def _name(self, prefix: str) -> str:
        self._n += 1
        return f"{prefix}_{self._n}"

    def _resolve(self, expr: int | str | Column) -> Column:
        return _as_column(self._df, expr)

    # -- plain fields -------------------------------------------------------
    def column(self, i: int | str, alias: str | None = None) -> "SelectBuilder":
        c = self._resolve(i)
        self._fields.append(("plain", c.alias(alias) if alias else c))
        return self

    def value(self, v: Any, alias: str | None = None) -> "SelectBuilder":
        c = F.lit(v)
        self._fields.append(("plain", c.alias(alias or self._name("value"))))
        return self

    def expr(self, c: Column, alias: str | None = None) -> "SelectBuilder":
        self._fields.append(("plain", c.alias(alias) if alias else c))
        return self

    # -- aggregate fields ---------------------------------------------------
    def sum_value(self, expr: int | str | Column, alias: str | None = None) -> "SelectBuilder":
        self._fields.append(("agg", F.sum(self._resolve(expr)).alias(alias or self._name("sum"))))
        return self

    def count(self, alias: str | None = None) -> "SelectBuilder":
        self._fields.append(("agg", F.count(F.lit(1)).alias(alias or self._name("count"))))
        return self

    def count_when(self, expr: int | str | Column, alias: str | None = None) -> "SelectBuilder":
        c = self._resolve(expr)
        name = expr if isinstance(expr, str) else (
            self._df.columns[expr] if isinstance(expr, int) else None
        )
        dtype = dict(self._df.dtypes and [(f.name, f.dataType) for f in self._df.schema])[name] if name else None
        cond = truthy(c, dtype) if dtype is not None else c.cast("boolean")
        # Explicit BIGINT so external oracles (DuckDB SUM -> HUGEINT)
        # canonicalize to the same representation.
        self._fields.append(
            ("agg", F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(
                alias or self._name("count_when")))
        )
        return self

    def max_value(self, expr: int | str | Column, alias: str | None = None) -> "SelectBuilder":
        self._fields.append(("agg", F.max(self._resolve(expr)).alias(alias or self._name("max"))))
        return self

    def min_value(self, expr: int | str | Column, alias: str | None = None) -> "SelectBuilder":
        self._fields.append(("agg", F.min(self._resolve(expr)).alias(alias or self._name("min"))))
        return self

    # -- build --------------------------------------------------------------
    def build(self) -> DataFrame:
        plains = [c for k, c in self._fields if k == "plain"]
        aggs = [c for k, c in self._fields if k == "agg"]
        if not aggs:
            return self._df.select(*plains)
        if not plains:
            return self._df.agg(*aggs)
        return self._df.groupBy(*plains).agg(*aggs)
