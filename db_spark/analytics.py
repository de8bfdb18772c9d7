"""Event-sequence analytics over event streams: funnels and cohort
retention — the classic product-analytics asks layered on the same
events table the windowing/streaming tier serves (reference has no
event analytics; north-star surface alongside the hypertable rollups).

Both operators are cascades of filtered aggregates — no per-user event
arrays are ever materialized, so per-user state is O(1) and every
exchange is keyed by user over a *step-filtered* subset of events, not
the full stream. At 100 TB of events the shuffled volume per funnel
stage is only that stage's event type.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    events: DataFrame, steps: list[str],
    user_col: str = "user_id", type_col: str = "event_type",
    ts_col: str = "ts", max_gap_seconds: int | None = None,
) -> DataFrame:
    """Ordered-funnel completion: for each step k, the number of users
    whose earliest qualifying step-k event *strictly follows* their
    earliest qualifying step-(k-1) event. Returns (step, event_type,
    users), one row per step, step 0 = all users who did steps[0].

    ``max_gap_seconds`` adds the max-conversion-window form product
    analytics ships: step k must also land *within* that many seconds
    of the chosen step-(k-1) time (``<=`` on the boundary). Semantics
    are greedy first-touch: each frontier is the EARLIEST qualifying
    time, so a user whose only in-window step-k event follows a later
    step-(k-1) repeat is not counted — deterministic, one-pass, and
    expressible identically in ANSI SQL (the oracle runs the same
    cascade; a backtracking "any chain" definition would need a
    per-user sequence scan, which is exactly the per-user event-array
    materialization this shape avoids).

    Min-cascade shape: stage k is one shuffle keyed by user over ONLY
    the step-k events joined to the (user, t_{k-1}) frontier — the
    classic funnel is k small aggregates, never a per-user sort or
    event-array collect. Strict ``>`` ordering makes ties (same
    timestamp) non-qualifying on every engine identically. The gap
    bound is a residual on the existing join — timestamp arithmetic is
    exact microseconds on any engine, no extra shuffle."""
    cur = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col).agg(F.min(ts_col).alias("_t"))
    )
    stages = [(steps[0], cur)]
    for s in steps[1:]:
        nxt = (
            events.filter(F.col(type_col) == s)
            .join(cur.select(user_col, "_t"), user_col)
            .filter(F.col(ts_col) > F.col("_t"))
        )
        if max_gap_seconds is not None:
            nxt = nxt.filter(
                F.col(ts_col)
                <= F.col("_t") + F.expr(f"INTERVAL {int(max_gap_seconds)} SECOND")
            )
        cur = nxt.groupBy(user_col).agg(F.min(ts_col).alias("_t"))
        stages.append((s, cur))
    out = None
    for i, (s, frontier) in enumerate(stages):
        row = frontier.agg(
            F.count(F.lit(1)).cast("long").alias("users")
        ).select(
            F.lit(i).cast("int").alias("step"),
            F.lit(s).alias(type_col),
            "users",
        )
        out = row if out is None else out.unionByName(row)
    return out


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id", ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention: users grouped by the week of their first
    event; for each (cohort, week offset), how many of that cohort were
    active that week. Returns (cohort_week DATE, week_offset INT,
    users). week_offset 0 row = cohort size.

    Two aggregates + one join, all keyed by user or (cohort, offset):
    first-touch per user (one shuffle), distinct active weeks per user
    (one shuffle), then a user-keyed join and a |cohorts x offsets|-
    cardinality final aggregate. Week arithmetic is Monday-truncated
    timestamps whose difference is an exact multiple of 7 days —
    integer on any engine."""
    first = events.groupBy(user_col).agg(
        F.date_trunc("week", F.min(ts_col)).alias("_cohort"))
    active = events.select(
        user_col, F.date_trunc("week", F.col(ts_col)).alias("_wk")
    ).distinct()
    joined = active.join(first, user_col)
    return (
        joined.select(
            F.to_date("_cohort").alias("cohort_week"),
            (F.datediff(F.col("_wk"), F.col("_cohort")) / 7)
            .cast("int").alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).cast("long").alias("users"))
    )
