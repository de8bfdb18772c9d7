"""Targeted noop re-timing: N warm reps per named key (min + median),
for verifying straggler candidates the single-shot sweep flagged.

Usage: python scripts/time_keys.py sf_dir reps key [key ...]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E
from db_spark.llm import dedup
from db_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1]
    reps = int(sys.argv[2])
    keys = sys.argv[3:]
    spark = get_spark(app_name="time_keys",
                      cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    out = {}
    for name in keys:
        spark.sparkContext.setJobDescription(f"time:{name}")
        ts = []
        for _ in range(reps):
            # mirror sweep_noop's methodology per rep: fresh plan, one
            # warm-up write (materializes plan caches), one timed write,
            # then drop the caches
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()  # warm-up
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
            dedup.unpersist_plan_caches()
            spark.catalog.clearCache()
        out[name] = {"min": round(min(ts), 3),
                     "median": round(statistics.median(ts), 3),
                     "max": round(max(ts), 3)}
        print(f"  {name}: min={out[name]['min']} med={out[name]['median']} "
              f"max={out[name]['max']}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
