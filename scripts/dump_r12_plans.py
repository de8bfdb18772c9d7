"""Dump .explain("formatted") for the r12 optimization-round query set
into plans/r12/<query>_<tag>.txt (tag = before/after).

Usage: python scripts/dump_r12_plans.py <tag> [query ...]
Defaults to the full r12 watchlist when no query names are given.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E
from db_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

# Headline bench queries + the expensive LLM-tier tail (sf1 > ~0.8 s in
# docs/BENCH_LLM_r12_sf1.json) — the optimization-round watchlist.
WATCHLIST = [
    # bench.py headline set
    "scan", "filter", "pricing_summary", "hash_join_agg", "sort_topk",
    "multi_join",
    # LLM tier, ordered by sf1 cost
    "simhash_near_dup", "jaccard_join", "hashed_features", "winnow_spans",
    "jaccard_grouped", "mjpeg_features", "text_stats", "normalize_text",
    "ngram_jaccard", "winnow_cut", "minhash_lsh_pairs", "interval_join",
    "kcenter", "repetition_stats", "winnow_fingerprints", "winnow_overlap",
    "redact_pii", "chunk_docs", "embedding_near_dup", "keywords_tfidf",
    "entity_resolution",
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
    spark = get_spark(app_name="dump_r12_plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    outdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r12")
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
