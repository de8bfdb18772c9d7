"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry through Spark AND its ``oracle_sql()`` through DuckDB
on the same sf dir; compare row count, column names, and exact values
(order-insensitive, columns sorted by name) — mirroring the driver's
value-hash comparison.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bool):
        return str(bool(v))
    if hasattr(v, "isoformat"):
        s = v.isoformat()
        return s.replace("+00:00", "")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def _normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return [cols[i] for i in order], sorted(out)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from db_spark.session import get_spark

    cpus = int(os.environ.get("ORACLE_SPARK_CPUS", "8"))
    spark = get_spark(app_name="oracle-check", cpus=cpus,
                      shuffle_partitions=cpus)
    con = duckdb.connect()
    # resource knobs for big-sf runs (several shards in parallel, or a
    # spill-heavy recursive oracle that needs most of the RAM solo)
    mem = os.environ.get("ORACLE_DUCKDB_MEM")
    if mem:
        con.execute(f"SET memory_limit='{mem}'")
    thr = os.environ.get("ORACLE_DUCKDB_THREADS")
    if thr:
        con.execute(f"SET threads TO {int(thr)}")
    for t in TABLES:
        p = os.path.join(sf_dir, t + ".parquet")
        if os.path.isdir(p):
            # Spark writes parquet "files" as directories of part files
            # (the generated sf1 dir); DuckDB needs the glob form
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    failures = []
    checked = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        checked += 1
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"ok?   {name}: rows-only check, {len(s_rows)} rows (no oracle)")
            continue
        try:
            rel = con.sql(oracles[name])
            d_cols = [c for c in rel.columns]
            d_rows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        sc, sv = _normalize(s_cols, s_rows)
        dc, dv = _normalize(d_cols, d_rows)
        if sc != dc:
            failures.append(name)
            print(f"FAIL  {name}: columns {sc} != {dc}")
            continue
        if len(sv) != len(dv):
            failures.append(name)
            print(f"FAIL  {name}: rowcount {len(sv)} != {len(dv)}")
            continue
        if sv != dv:
            failures.append(name)
            diff = [(a, b) for a, b in zip(sv, dv) if a != b][:3]
            print(f"FAIL  {name}: value mismatch, first diffs: {diff}")
            continue
        print(f"PASS  {name}: {len(sv)} rows")
    print(f"\n{checked - len(failures)}/{checked} pass")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
