"""Scale-up generator for the bench's sf1 row: replicate the sf0.1
TPC-H tables REPLICAS times with per-replica key offsets so every
join keeps its original fan-out (each lineitem still matches exactly
one order/part/supplier; duplicating rows WITHOUT remapping would
square the join output instead of scaling it linearly).

Replica i adds ``i * (max_key + 1)`` to each table's primary key and
to every foreign key that references it. nation/region are true
dimensions (25 / 5 rows at every TPC-H scale factor) and are copied
once, unscaled — exactly how dbgen scales.

Idempotent: a ``_SCALE_OK`` marker with the (src, replicas) recipe
skips regeneration on later runs; a recipe change rewrites.

Usage: python scripts/gen_scale.py [src_dir dst_dir replicas]
"""

from __future__ import annotations

import json
import os
import shutil
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from db_spark import sources  # noqa: E402

# max key + 1 per table, read once from the source tables
_KEYED = {
    "customer": "c_custkey",
    "orders": "o_orderkey",
    "part": "p_partkey",
    "supplier": "s_suppkey",
    "documents": "doc_id",
    "embeddings": "vec_id",
    "events": "event_id",
    # events' user population is its own key space (no users table)
    "events_user": ("events", "user_id"),
}

# table -> {column: key-space it references}
# documents/embeddings replicate with fresh ids but IDENTICAL payloads:
# every text/vector appears `replicas` times under distinct ids — the
# duplicated-corpus stress case the dedup/near-dup tier exists for
# (pair cardinality is bounded by the tier's hot-bucket/max-df guards).
_FKS = {
    "customer": {"c_custkey": "customer"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "part": {"p_partkey": "part"},
    "supplier": {"s_suppkey": "supplier"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
    # timestamps replicate UNCHANGED: 10x event volume per hour, same
    # time range - the right scaling for the time-series tier
    "events": {"event_id": "events", "user_id": "events_user"},
}

_COPY = ["nation", "region"]


def ensure_scaled(spark, src_dir: str, dst_dir: str, replicas: int) -> bool:
    """Materialize the scaled dataset under dst_dir; returns True when
    (re)generated, False when the marker said it was already there."""
    marker = os.path.join(dst_dir, "_SCALE_OK")
    recipe = json.dumps({"src": src_dir, "replicas": replicas,
                         "tables": sorted([*_FKS, *_COPY])})
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read() == recipe:
                return False
    shutil.rmtree(dst_dir, ignore_errors=True)
    os.makedirs(dst_dir, exist_ok=True)

    spans = {}
    for t, k in _KEYED.items():
        src_t, col = (k if isinstance(k, tuple) else (t, k))
        df = sources.read_table(spark, src_dir, src_t)
        spans[t] = int(df.agg(F.max(col)).collect()[0][0]) + 1

    for t, fks in _FKS.items():
        df = sources.read_table(spark, src_dir, t)
        parts = []
        for i in range(replicas):
            rep = df
            for col, space in fks.items():
                dt = df.schema[col].dataType.simpleString()
                rep = rep.withColumn(
                    col, (F.col(col) + F.lit(i * spans[space])).cast(dt))
            parts.append(rep)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        # one output file per replica: keeps write cheap and gives the
        # scan a multi-task stage (the sf0.1 files are single-row-group)
        out.repartition(replicas).write.mode("overwrite").parquet(
            os.path.join(dst_dir, f"{t}.parquet"))

    for t in _COPY:
        sources.read_table(spark, src_dir, t) \
            .write.mode("overwrite").parquet(
                os.path.join(dst_dir, f"{t}.parquet"))

    with open(marker, "w") as f:
        f.write(recipe)
    return True


if __name__ == "__main__":
    from db_spark.session import get_spark

    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else \
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".bench_scale", "sf1")
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark(app_name="gen-scale", cpus="32", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    print("generated" if ensure_scaled(spark, src, dst, n) else "cached", dst)
