"""Dump .explain("formatted") for the r13 optimization-round query set
into plans/r13/<query>_<tag>.txt (tag = before/after).

Usage: python scripts/dump_r13_plans.py <tag> [query ...]
Defaults to the full r13 watchlist when no query names are given.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E
from db_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

# r13 watchlist: headline set + VERDICT/ADVICE optimization targets.
WATCHLIST = [
    # bench.py headline set (untouched; dumped for the noise-closure check)
    "scan", "filter", "pricing_summary", "hash_join_agg", "sort_topk",
    "multi_join",
    # r13 optimization targets (VERDICT r12 "Next round" + ADVICE)
    "winnow_spans", "winnow_overlap", "curate_corpus", "curate_corpus_v2",
    "ivfpq_recall", "ivfpq_topk", "ivfpq_index_topk", "ivf_kmeans_topk",
    "pq_sampled", "semantic_dedup", "embedding_decontaminate",
    "exact_percentiles", "winsorize", "mjpeg_features", "winnow_cut",
    "kcenter", "dbscan", "embedding_near_dup",
]

# bench.py-only entries that are not registry keys map to their
# underlying registry query for plan purposes
ALIASES = {
    "scan": "table_scan",
    "filter": "filter",
    "hash_join_agg": "hash_match",
    "sort_topk": "sort",
}


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    picks = sys.argv[2:] or WATCHLIST
    spark = get_spark(app_name="dump_r13_plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    outdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r13")
    os.makedirs(outdir, exist_ok=True)
    for name in picks:
        key = ALIASES.get(name, name)
        if key not in qs:
            print(f"skip {name}: no registry key {key}", file=sys.stderr)
            continue
        df = qs[key](spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"))
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} (registry key: {key}) @ {SF_DIR} — {tag}\n")
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")


if __name__ == "__main__":
    main()
