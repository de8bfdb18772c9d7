"""r12 optimization-round profiler: for each picked query, time the
computation alone (noop sink, guide §1.4) AND the bench_llm-shaped
collect, so compute cost and driver-transfer cost are separated.

Usage: python scripts/profile_r12.py [sf_dir] [query ...]
Prints one JSON line {query: {"noop": s, "collect": s, "rows": n}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E
from db_spark.llm import dedup
from db_spark.session import get_spark

DEFAULT_PICKS = [
    "simhash_near_dup", "jaccard_join", "hashed_features", "winnow_spans",
    "jaccard_grouped", "text_stats", "normalize_text", "ngram_jaccard",
    "winnow_cut", "minhash_lsh_pairs", "interval_join", "repetition_stats",
    "winnow_fingerprints", "winnow_overlap", "redact_pii", "chunk_docs",
    "embedding_near_dup", "keywords_tfidf", "entity_resolution",
    "mjpeg_features", "kcenter",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".bench_scale/sf1"
    picks = sys.argv[2:] or DEFAULT_PICKS
    spark = get_spark(app_name="profile_r12", cpus=os.environ.get(
        "SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    out = {}
    for name in picks:
        if name not in qs:
            print(f"skip {name}", file=sys.stderr)
            continue
        df = qs[name](spark, sf_dir)
        spark.sparkContext.setJobDescription(f"r12-profile:{name}")
        # warm-up (untimed): parquet footers, codegen, plan caches
        df.write.format("noop").mode("overwrite").save()
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t_noop = time.perf_counter() - t0
        t0 = time.perf_counter()
        rows = df.collect()
        t_collect = time.perf_counter() - t0
        out[name] = {"noop": round(t_noop, 3), "collect": round(t_collect, 3),
                     "rows": len(rows)}
        print(f"  {name}: noop={t_noop:.2f}s collect={t_collect:.2f}s "
              f"rows={len(rows)}", file=sys.stderr)
        del rows
        dedup.unpersist_plan_caches()
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"sf_dir": sf_dir, "profile": out}))


if __name__ == "__main__":
    main()
