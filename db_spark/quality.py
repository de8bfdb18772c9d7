"""Declarative data-quality checks — the dbt-tests / Great-Expectations
analog for this engine: a rule vocabulary (not-null, unique, accepted
values, range, referential integrity) evaluated in as few passes as the
rule mix allows, returning one row per rule with a verdict and a
violation count (never a sample of failing rows by default — at 100 TB
the *count* is the dashboard fact; failing-row retrieval is a filter
the caller writes when a rule trips).

Scale accounting: all row-local rules (not_null / accepted_values /
in_range) fold into ONE conditional-aggregate pass over the table —
adding a rule adds a column to the aggregate, not a scan. Each `unique`
rule is one hash aggregate on its key columns; each `foreign_key` is
one left-anti-style aggregate against the (usually broadcast) parent
key set. Deterministic by construction (counts and comparisons only),
so every report is oracle-checkable.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Window, functions as F


@dataclass(frozen=True)
class Rule:
    """One declarative expectation. ``kind`` ∈ {not_null, unique,
    accepted_values, in_range, foreign_key, custom}."""
    name: str
    kind: str
    cols: tuple[str, ...] = ()
    values: tuple = ()
    lo: float | None = None
    hi: float | None = None
    parent: DataFrame | None = field(default=None, compare=False)
    parent_col: str | None = None
    condition: Column | None = field(default=None, compare=False)


def not_null(name: str, col: str) -> Rule:
    return Rule(name, "not_null", (col,))


def unique(name: str, *cols: str) -> Rule:
    """Violations are rows beyond the first occurrence of each
    duplicated key. NULL keys group together (DataFrame groupBy
    NULL-equality), so two all-NULL keys count as a duplicate — unlike
    a SQL UNIQUE constraint, which ignores NULLs; pair with
    ``not_null`` when NULL keys are themselves invalid."""
    return Rule(name, "unique", tuple(cols))


def accepted_values(name: str, col: str, values) -> Rule:
    return Rule(name, "accepted_values", (col,), tuple(values))


def in_range(name: str, col: str, lo: float, hi: float) -> Rule:
    """Violations are non-NULL values outside [lo, hi] — NULLs are
    not_null's business, not a range violation."""
    return Rule(name, "in_range", (col,), lo=lo, hi=hi)


def foreign_key(name: str, col: str, parent: DataFrame,
                parent_col: str) -> Rule:
    """Violations are non-NULL child keys absent from the parent key
    set."""
    return Rule(name, "foreign_key", (col,), parent=parent,
                parent_col=parent_col)


def custom(name: str, condition: Column) -> Rule:
    """Violations are rows where ``condition`` is NOT true (false or
    NULL) — write the expectation, not the failure."""
    return Rule(name, "custom", condition=condition)


def dq_report(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Evaluate every rule; returns (rule, kind, violations BIGINT,
    passed BOOLEAN) — one row per rule, rule-list order not guaranteed
    (sort on read). Row-local rules share one scan; see module
    docstring for the per-kind pass accounting."""
    local_aggs = []
    local_meta = []
    parts = []

    def viol(cond: Column) -> Column:
        # count rows where the expectation does NOT hold; NULL-safe
        return F.sum(
            F.when(cond, F.lit(0)).otherwise(F.lit(1))).cast("long")

    for r in rules:
        if r.kind == "not_null":
            local_aggs.append(viol(F.col(r.cols[0]).isNotNull()))
            local_meta.append(r)
        elif r.kind == "accepted_values":
            c = F.col(r.cols[0])
            ok = c.isNull() | c.isin(*r.values)
            local_aggs.append(viol(ok))
            local_meta.append(r)
        elif r.kind == "in_range":
            c = F.col(r.cols[0])
            ok = c.isNull() | ((c >= F.lit(r.lo)) & (c <= F.lit(r.hi)))
            local_aggs.append(viol(ok))
            local_meta.append(r)
        elif r.kind == "custom":
            local_aggs.append(viol(r.condition))
            local_meta.append(r)
        elif r.kind == "unique":
            dup = (
                df.groupBy(*[F.col(c) for c in r.cols])
                .agg(F.count(F.lit(1)).alias("_n"))
                .filter(F.col("_n") > 1)
                # violations = rows beyond the first occurrence of each
                # duplicated key — 0 on a unique table however counted
                .agg(F.coalesce(F.sum(F.col("_n") - 1), F.lit(0))
                     .cast("long").alias("violations"))
                .select(F.lit(r.name).alias("rule"),
                        F.lit(r.kind).alias("kind"), "violations")
            )
            parts.append(dup)
        elif r.kind == "foreign_key":
            parents = (
                r.parent.select(F.col(r.parent_col).alias("_pk"))
                .distinct()
            )
            orphans = (
                df.select(F.col(r.cols[0]).alias("_ck"))
                .filter(F.col("_ck").isNotNull())
                .join(F.broadcast(parents), F.col("_ck") == F.col("_pk"),
                      "left_anti")
                .agg(F.count(F.lit(1)).cast("long").alias("violations"))
                .select(F.lit(r.name).alias("rule"),
                        F.lit(r.kind).alias("kind"), "violations")
            )
            parts.append(orphans)
        else:
            raise ValueError(f"unknown rule kind: {r.kind}")

    if local_meta:
        row = df.agg(*[a.alias(f"_v{i}")
                       for i, a in enumerate(local_aggs)])
        # explode the ONE aggregate row into per-rule rows — a union of
        # per-rule selects would re-execute the aggregate (and re-scan
        # the table) once per rule
        combos = F.array(*[
            F.struct(
                F.lit(r.name).alias("rule"), F.lit(r.kind).alias("kind"),
                F.coalesce(F.col(f"_v{i}"), F.lit(0)).cast("long")
                .alias("violations"))
            for i, r in enumerate(local_meta)
        ])
        stacked = (
            row.select(F.explode(combos).alias("_r"))
            .select("_r.rule", "_r.kind", "_r.violations")
        )
        parts.insert(0, stacked)

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn("passed", F.col("violations") == 0)


def dq_violations(df: DataFrame, rule: Rule, limit: int = 100) -> DataFrame:
    """The drill-down for ONE tripped rule: the offending rows
    themselves, capped at ``limit`` (a LIMIT, not a sort — grab *some*
    evidence cheaply; remove the cap for a full extraction). This is
    deliberately a separate call from :func:`dq_report`: the report is
    counts-only so monitoring never shuffles failing rows around the
    cluster — rows move only when a human asks for them."""
    if rule.kind == "not_null":
        bad = df.filter(F.col(rule.cols[0]).isNull())
    elif rule.kind == "accepted_values":
        c = F.col(rule.cols[0])
        bad = df.filter(c.isNotNull() & ~c.isin(*rule.values))
    elif rule.kind == "in_range":
        c = F.col(rule.cols[0])
        bad = df.filter(c.isNotNull()
                        & ((c < F.lit(rule.lo)) | (c > F.lit(rule.hi))))
    elif rule.kind == "custom":
        cond = rule.condition
        bad = df.filter(~F.coalesce(cond, F.lit(False)))
    elif rule.kind == "unique":
        keys = [F.col(c) for c in rule.cols]
        dups = (df.groupBy(*keys)
                .agg(F.count(F.lit(1)).alias("_n"))
                .filter(F.col("_n") > 1).drop("_n"))
        bad = df.join(dups, list(rule.cols), "left_semi")
    elif rule.kind == "foreign_key":
        parents = rule.parent.select(
            F.col(rule.parent_col).alias("_pk")).distinct()
        bad = (df.filter(F.col(rule.cols[0]).isNotNull())
               .join(F.broadcast(parents),
                     F.col(rule.cols[0]) == F.col("_pk"), "left_anti"))
    else:
        raise ValueError(f"unknown rule kind: {rule.kind}")
    return bad.limit(limit)


#: Benford expected first-digit shares as exact parts-per-billion
#: integer literals — log10(1 + 1/d) precomputed once in Python so
#: NEITHER engine evaluates a libm log at query time (constants are
#: exact by definition; libm ULP differences can't enter).
BENFORD_PPB = [301029996, 176091259, 124938737, 96910013, 79181246,
               66946790, 57991947, 51152522, 45757491]


def benford_audit(df: DataFrame, value_col: str) -> DataFrame:
    """Benford's-law first-digit audit — the classic fraud /
    data-fabrication screen for naturally-occurring positive amounts:
    observed first-digit shares vs log10(1+1/d), with a chi-square
    deviation statistic. Values with |v| < 1 are excluded (no integer
    leading digit); all 9 digits appear in the output even at zero
    observations. Chi-square terms nano-round into BIGINT before the
    total (the chi2/entropy order-independence discipline), and the
    expected shares are integer ppb literals, so the whole audit is
    engine-exact.

    Shape: one map-only digit extraction + a 9-cell aggregate;
    everything after runs on 9 rows. Returns (digit, n_obs, share,
    expected_share, chi2_term, chi2) rounded 6."""
    spark = df.sparkSession
    digit = F.substring(
        F.floor(F.abs(F.col(value_col))).cast("long").cast("string"),
        1, 1).cast("int")
    counts = (df.filter(F.abs(F.col(value_col)) >= 1)
              .select(digit.alias("digit"))
              .groupBy("digit")
              .agg(F.count(F.lit(1)).cast("long").alias("_c")))
    cells = spark.createDataFrame(
        [(d, BENFORD_PPB[d - 1]) for d in range(1, 10)],
        "digit int, _ppb long")
    j = (cells.join(counts, "digit", "left")
         .select("digit", "_ppb",
                 F.coalesce(F.col("_c"), F.lit(0)).cast("long")
                 .alias("n_obs")))
    w = Window.partitionBy()
    n = F.sum("n_obs").over(w).cast("double")
    exp = n * (F.col("_ppb").cast("double") / 1e9)
    term = (F.col("n_obs").cast("double") - exp) \
        * (F.col("n_obs").cast("double") - exp) / exp
    nano = F.round(term * 1e9).cast("long")
    return j.select(
        "digit", "n_obs",
        F.round(F.col("n_obs").cast("double") / n, 6).alias("share"),
        F.round(F.col("_ppb").cast("double") / 1e9, 6)
        .alias("expected_share"),
        F.round(term, 6).alias("chi2_term"),
        F.round(F.sum(nano).over(w).cast("double") / 1e9, 6).alias("chi2"),
    )


def skew_profile(
    df: DataFrame, key_col: str, top_k: int = 10,
) -> DataFrame:
    """Join-key skew profiler — the check to run BEFORE shuffling a
    100 TB table on a key: per-key frequencies reduced to the top-k
    hot keys plus the skew statistics that predict reducer imbalance
    (hot-key share of all rows, hot/average multiplier). A key whose
    max/avg multiplier is in the hundreds needs salting or an AQE
    skew-join before it becomes a straggler.

    Shape: one key-keyed count, one TakeOrderedAndProject for the
    top-k, one single-row total broadcast — never a global sort.
    Returns top-k rows: (key value, n_rows, share, avg_multiplier),
    ranked by count desc with key tiebreak."""
    counts = df.groupBy(F.col(key_col)).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"))
    totals = counts.agg(
        F.sum("n_rows").cast("long").alias("_total"),
        F.count(F.lit(1)).cast("long").alias("_nkeys"))
    ranked = (
        counts.crossJoin(F.broadcast(totals))
        .orderBy(F.desc("n_rows"), key_col).limit(top_k)
    )
    avg = F.col("_total").cast("double") / F.col("_nkeys").cast("double")
    return ranked.select(
        key_col, "n_rows",
        F.round(F.col("n_rows").cast("double")
                / F.col("_total").cast("double"), 6).alias("share"),
        F.round(F.col("n_rows").cast("double") / avg, 6)
        .alias("avg_multiplier"))
