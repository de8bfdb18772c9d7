"""Full-registry noop-sink timing sweep (guide §1.4): time EVERY
``queries()`` entry's computation with the noop sink at one sf dir, so
the round's optimization checklist covers the whole registry, not just
the profiler picks. One warm-up, one timed run per query (the sweep is
a straggler detector, not a benchmark — bench.py / bench_llm.py carry
the methodology-grade numbers).

Usage: python scripts/sweep_noop.py [sf_dir] [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E
from db_spark.llm import dedup
from db_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    spark = get_spark(app_name="sweep_noop", cpus=os.environ.get(
        "SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    out: dict[str, float] = {}
    for name in sorted(qs):
        try:
            df = qs[name](spark, sf_dir)
            spark.sparkContext.setJobDescription(f"sweep:{name}")
            df.write.format("noop").mode("overwrite").save()  # warm-up
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            out[name] = round(time.perf_counter() - t0, 3)
            print(f"  {name}: {out[name]:.2f}s", file=sys.stderr)
        except Exception:
            out[name] = -1.0
            print(f"  {name}: ERROR", file=sys.stderr)
            traceback.print_exc()
        finally:
            dedup.unpersist_plan_caches()
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(None)
    # Host-health calibration (r13 — bench.py's probe discipline): the
    # measurement host's speed swings 2-3x across hours (observed
    # probe_ratio up to 3.3 on an in-VM-idle machine this round), so a
    # sweep's absolute seconds are only comparable to another sweep
    # whose probe reads similarly. Same probe as bench.py: the
    # data-invariant sf0.001 pricing_summary collect, prepared once,
    # one warm-up, timed 3x, run AFTER the sweep.
    import bench as _bench
    probe = _bench._calibration_probe(spark)
    doc = {"sf_dir": sf_dir, "noop_sec": out,
           "total": round(sum(v for v in out.values() if v > 0), 2),
           "calibration": probe}
    line = json.dumps(doc)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
