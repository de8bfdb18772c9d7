"""Plan-shape introspection as a public API — the counters the scale
story argues from (docs/SCALE.md, docs/PLAN_AUDIT.md), available to
users designing their own pipelines: "how many shuffles does this plan
pay, did my dimension broadcast, is there a cartesian hiding in here?"

The same counters drive `scripts/audit_plans.py` (the whole-registry
audit artifact) and the `tests/test_plan_shapes.py` regression guards;
exposing them keeps user pipelines auditable with the engine's own
vocabulary instead of eyeballing `explain()` output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """The physical (executed) plan as text — what actually runs,
    after AQE's initial planning; the string every counter below is
    derived from."""
    return df._jdf.queryExecution().executedPlan().toString()


def plan_shape(df: DataFrame) -> dict:
    """Shape counters for a DataFrame's physical plan:

    - ``exchanges``: Exchange operators (shuffles + broadcast
      materializations) — the expensive moves;
    - ``broadcast_hash_joins`` / ``sort_merge_joins`` /
      ``broadcast_nested_loop_joins``: join strategy mix (dims should
      broadcast; SMJ on a fact-dim join means a missed broadcast);
    - ``cartesian_products``: must be 0 in anything meant for scale;
    - ``top_k``: True when a LIMIT+ORDER planned as
      TakeOrderedAndProject (per-partition heads) instead of a global
      sort;
    - ``sorts``: Sort operators (window/SMJ sorts included — compare
      against expectation, not zero).
    """
    plan = executed_plan(df)
    return {
        "exchanges": plan.count("Exchange"),
        "broadcast_hash_joins": plan.count("BroadcastHashJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "broadcast_nested_loop_joins": plan.count("BroadcastNestedLoopJoin"),
        "cartesian_products": plan.count("CartesianProduct"),
        "top_k": "TakeOrderedAndProject" in plan,
        "sorts": plan.count("Sort "),
    }


def assert_scale_safe(df: DataFrame, max_exchanges: int | None = None,
                      allow_smj: bool = True) -> dict:
    """Raise ``AssertionError`` when the plan contains a scale killer:
    any CartesianProduct, optionally any SortMergeJoin
    (``allow_smj=False`` for plans where every join side should
    broadcast), optionally more than ``max_exchanges`` Exchanges.
    Returns the shape dict on success so callers can log it."""
    shape = plan_shape(df)
    if shape["cartesian_products"]:
        raise AssertionError(
            f"plan contains {shape['cartesian_products']} CartesianProduct"
            "(s) — add a join key, a blocking key, or broadcast a side")
    if not allow_smj and shape["sort_merge_joins"]:
        raise AssertionError(
            f"plan contains {shape['sort_merge_joins']} SortMergeJoin(s) "
            "where every join was expected to broadcast")
    if max_exchanges is not None and shape["exchanges"] > max_exchanges:
        raise AssertionError(
            f"plan pays {shape['exchanges']} exchanges "
            f"(budget {max_exchanges})")
    return shape
