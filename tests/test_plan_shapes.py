"""Plan-shape regression guard: the performance-critical physical-plan
properties of headline queries, asserted in pytest so a regression shows
up before any benchmark run. Shapes checked are the ones docs/SCALE.md
and docs/PLANS.md argue from: broadcast joins for dims, filter/column
pushdown to the scan, bounded exchange counts, no cartesian products."""

import os
import re

import pytest

import __spark_entry__ as E

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def _formatted(df, spark) -> str:
    """Formatted explain — unlike executedPlan().toString(), it does not
    truncate long PushedFilters lists."""
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    return df._jdf.queryExecution().explainString(mode)


def test_multi_join_broadcasts_all_dims(spark):
    plan = _plan(E.q_multi_join(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 3  # customer/nation/region
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan  # dims must not shuffle the fact


def test_filter_pushes_predicates_and_prunes_columns(spark):
    df = E.q_filter(spark, SF)
    scan = _plan(df)
    assert "PushedFilters: [" in scan
    assert re.search(r"PushedFilters: \[[^\]]*GreaterThanOrEqual\(l_discount",
                     scan), "range predicate must reach the parquet reader"
    m = re.search(r"ReadSchema: struct<([^>]*)>", scan)
    assert m and len(m.group(1).split(",")) == 4  # only projected columns read


def test_pricing_summary_single_exchange(spark):
    plan = _plan(E.q_pricing_summary(spark, SF))
    assert plan.count("Exchange") <= 2  # partial+final agg, one shuffle (+AQE read)
    assert "HashAggregate" in plan


def test_bm25_topk_avoids_global_sort(spark):
    # distributed top-k must be TakeOrderedAndProject (per-partition
    # heads + k-row merge), never a full global sort
    assert "TakeOrderedAndProject" in _plan(E.q_bm25_topk(spark, SF))


def test_cm_heavy_hitters_no_corpus_join(spark):
    plan = _plan(E.q_cm_heavy_hitters(spark, SF))
    assert "CartesianProduct" not in plan


def test_cosine_topk_broadcasts_queries(spark):
    plan = _plan(E.q_cosine_topk(spark, SF))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_decontaminate_broadcasts_eval_grams(spark):
    plan = _plan(E.q_decontaminate(spark, SF))
    assert "BroadcastExchange" in plan


def test_forecast_revenue_full_pushdown(spark):
    """TPC-H Q6: every predicate (date range, discount band, quantity
    cap) must reach the parquet reader; only the 4 referenced columns
    are read; no exchange beyond the single global-agg gather."""
    scan = _formatted(E.q_forecast_revenue(spark, SF), spark)
    for pushed in ("GreaterThanOrEqual(l_shipdate", "LessThan(l_shipdate",
                   "GreaterThanOrEqual(l_discount", "LessThanOrEqual(l_discount",
                   "LessThan(l_quantity"):
        assert pushed in scan, f"{pushed} not pushed to the scan"
    m = re.search(r"ReadSchema: struct<([^>]*)>", scan)
    assert m and len(m.group(1).split(",")) == 4


def test_market_share_broadcasts_every_dim(spark):
    plan = _plan(E.q_market_share(spark, SF))
    assert "SortMergeJoin" not in plan  # no dim may shuffle the fact
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 4  # part/cust/supp-nation/max


def test_gapfill_locf_window_on_grid_only(spark):
    # the LOCF window must run on the |types x hours| grid, never on
    # the event stream: the Window's child must not be the raw scan
    plan = _plan(E.q_gapfill_locf(spark, SF))
    assert "Window" in plan
    assert "CartesianProduct" not in plan


def test_fuzzy_join_runs_on_dictionary(spark):
    # similarity must join the aggregated DISTINCT-name dictionary
    # (HashAggregate below the join), not the raw part rows
    plan = _plan(E.q_fuzzy_join(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # dictionary-sized non-equi
    assert "HashAggregate" in plan


def test_zscore_outliers_broadcasts_moments(spark):
    plan = _plan(E.q_zscore_outliers(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_copurchase_topk_avoids_global_sort(spark):
    # orderBy + limit over the pair counts must plan as
    # TakeOrderedAndProject (per-partition heads + k-row merge)
    assert "TakeOrderedAndProject" in _plan(E.q_copurchase_pairs(spark, SF))


def test_salted_join_broadcasts_replicated_dim(spark):
    # the salt-replicated 3-row dim must broadcast — salting spreads the
    # hot keys WITHOUT forcing a sort-merge shuffle of the fact
    plan = _plan(E.q_salted_join_agg(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_no_cartesian_products_anywhere_in_window(spark):
    """The whole driver-checked window must be cartesian-free (broadcast
    nested-loop with a tiny side is acceptable; a real CartesianProduct
    is not). Smoke tier skips the eager-builder keys (minutes of
    materializing build work just to obtain a plan — see
    test_contract._EAGER_BUILD_KEYS); they are covered by the full-tier
    twin below and by docs/PLAN_AUDIT.md, regenerated every round over
    the whole registry."""
    from tests.test_contract import _EAGER_BUILD_KEYS

    bad = []
    for name, fn in list(E.queries().items())[:50]:
        if name in _EAGER_BUILD_KEYS:
            continue
        try:
            if "CartesianProduct" in _plan(fn(spark, SF)):
                bad.append(name)
        except Exception:  # noqa: BLE001 - runtime-only queries (mvcc builds)
            continue
    assert not bad, f"cartesian products in: {bad}"


@pytest.mark.full
def test_no_cartesian_products_in_window_eager_builders(spark):
    from tests.test_contract import _EAGER_BUILD_KEYS

    bad = []
    for name, fn in list(E.queries().items())[:50]:
        if name not in _EAGER_BUILD_KEYS:
            continue
        try:
            if "CartesianProduct" in _plan(fn(spark, SF)):
                bad.append(name)
        except Exception:  # noqa: BLE001 - runtime-only queries (mvcc builds)
            continue
    assert not bad, f"cartesian products in: {bad}"


def test_min_cost_supplier_broadcasts_dims_and_topk(spark):
    # TPC-H Q2: dims broadcast, top-100 is TakeOrderedAndProject,
    # supply agg is the only data-sized exchange (window repartition
    # of the already-aggregated supply rows is the second, bounded one)
    plan = _plan(E.q_min_cost_supplier(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
    assert "TakeOrderedAndProject" in plan


def test_excess_supply_single_lineitem_pass(spark):
    # Q20 shape: ONE scan of lineitem feeds both conditional sums —
    # a self-join would show two lineitem scans
    plan = _plan(E.q_excess_supply(spark, SF))
    assert plan.count("lineitem") <= 1
    assert "SortMergeJoin" not in plan


def test_sessionize_single_exchange(spark):
    # lag window, running sum, and session aggregate must share ONE
    # user-keyed exchange
    plan = _plan(E.q_sessionize(spark, SF))
    assert plan.count("Exchange") <= 1
    assert plan.count("Sort") <= 1


def test_scd2_single_sort(spark):
    # tie-dedup + change-collapse + lead: one exchange, bounded sorts,
    # no self-joins
    plan = _plan(E.q_scd2(spark, SF))
    assert plan.count("Exchange") <= 1
    assert "Join" not in plan


def test_ewma_one_window_sort(spark):
    # 8 lag terms must share a single window sort per key
    plan = _plan(E.q_ewma(spark, SF))
    assert plan.count("Exchange") <= 1
    assert plan.count("Window") == 1


def test_mad_outliers_broadcasts_medians(spark):
    plan = _plan(E.q_mad_outliers(spark, SF))
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_skyline_two_bounded_exchanges_no_cartesian(spark):
    # collapse-to-distinct-x + running min + join back: never a
    # cartesian dominance product; the join back may broadcast
    plan = _plan(E.q_skyline(spark, SF))
    assert "CartesianProduct" not in plan
    assert "Window" in plan  # the strict-prefix running min


def test_keywords_tfidf_broadcasts_vocab(spark):
    plan = _plan(E.q_keywords_tfidf(spark, SF))
    assert "BroadcastHashJoin" in plan  # df stats join the tf table
    assert "CartesianProduct" not in plan


def test_centroid_outliers_broadcasts_centroids(spark):
    plan = _plan(E.q_centroid_outliers(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # centroids must never shuffle vectors


def test_token_budget_broadcasts_cells(spark):
    # the |groups| x cells classification tables broadcast back onto
    # the docs; the boundary window is the only Window in the plan
    plan = _plan(E.q_token_budget(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_psi_drift_single_row_comparison(spark):
    # after two histogram scans everything runs on |buckets| rows:
    # the bucket spine joins must broadcast
    plan = _plan(E.q_psi_drift(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_kmv_set_ops_no_cartesian(spark):
    assert "CartesianProduct" not in _plan(E.q_kmv_set_ops(spark, SF))


def test_importance_sample_map_only(spark):
    # pure filter over the scan: no exchange, no join, no window
    plan = _plan(E.q_importance_sample(spark, SF))
    for op in ("Exchange", "Join", "Window", "CartesianProduct"):
        assert op not in plan, f"unexpected {op} in a map-only sampler"


def test_skipgram_counts_single_pair_join(spark):
    # offset explode + ONE equi-join on (doc, position): no cartesian,
    # no nested-loop pair enumeration
    plan = _plan(E.q_skipgram_counts(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cm_join_size_runs_on_cells_only(spark):
    # the estimate side joins two bounded cell tables; the only
    # data-sized stages are the two sketch builds
    plan = _plan(E.q_cm_join_size(spark, SF))
    assert "CartesianProduct" not in plan


def test_dq_report_row_local_rules_share_one_scan(spark):
    # 4 row-local rules + unique + FK + 1 lineitem-local rule must not
    # scan per rule: orders appears <= 3x (local agg, unique, FK
    # parent), lineitem <= 2x (FK child, local agg)
    plan = _plan(E.q_dq_report(spark, SF))
    assert "CartesianProduct" not in plan
    assert plan.count("Scan parquet") <= 6


def test_interval_join_binned_not_theta(spark):
    # the overlap join must plan as an equi hash/merge join on
    # (custkey, bin) with a residual filter - never a cartesian or a
    # pure-theta broadcast nested loop
    plan = _plan(E.q_interval_join(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def test_weighted_sample_map_only_topk(spark):
    """A-ES sampling must plan as map-only key computation + a top-k
    heap (TakeOrderedAndProject) — zero exchanges before it, never a
    global Sort."""
    plan = _plan(E.q_weighted_sample(spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan.split("TakeOrderedAndProject")[1] \
        if "TakeOrderedAndProject" in plan else True


def test_jaccard_join_no_cartesian_prefix_blocked(spark):
    """The exact similarity join must candidate-generate through the
    prefix self-join (equi-join on shingle), never a cartesian."""
    plan = _plan(E.q_jaccard_join(spark, SF))
    assert "CartesianProduct" not in plan


def test_curate_corpus_no_cartesian(spark):
    plan = _plan(E.q_curate_corpus(spark, SF))
    assert "CartesianProduct" not in plan


def test_assoc_rules_topk_no_global_sort(spark):
    plan = _plan(E.q_assoc_rules(spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_attribution_is_one_window_pass_no_self_join(spark):
    # the credited touch must come from a window, never a
    # conversions x touches self-join of the event table
    plan = _plan(E.q_attribution(spark, SF))
    assert "Window" in plan
    for join in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct"):
        assert join not in plan


def test_transitions_is_lag_window_plus_tiny_agg(spark):
    plan = _plan(E.q_transitions(spark, SF))
    assert "Window" in plan
    for join in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct"):
        assert join not in plan


def test_linreg_is_single_hash_aggregate(spark):
    # five 128-bit moment sums in ONE partial+final hash agg: no join,
    # no second scan, bounded exchanges
    plan = _plan(E.q_linreg(spark, SF))
    assert "HashAggregate" in plan
    assert plan.count("Exchange") <= 2
    for join in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct"):
        assert join not in plan


def test_cusum_windows_run_on_series_after_broadcast_target(spark):
    plan = _plan(E.q_cusum(spark, SF))
    assert "Window" in plan
    assert "BroadcastHashJoin" in plan  # |keys|-row target broadcast back
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_hybrid_rrf_rankers_stay_topk_shaped(spark):
    plan = _plan(E.q_hybrid_rrf(spark, SF))
    assert "TakeOrderedAndProject" in plan  # BM25 branch top-k
    assert "CartesianProduct" not in plan


def test_survival_and_funnel_latency_cartesian_free(spark):
    for q in (E.q_survival, E.q_funnel_latency, E.q_ab_test):
        assert "CartesianProduct" not in _plan(q(spark, SF))
