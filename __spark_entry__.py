"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry is an operator/capability from SURVEY.md §2
expressed through the db_spark engine; ``oracle_sql()`` gives the
DuckDB-equivalent ANSI SQL run on the same parquet tables.

Determinism notes (so Spark and DuckDB value-hashes agree):
- double aggregates accumulate in DECIMAL (exact, order-independent)
  then present as DOUBLE — see db_spark.functions.money_sum;
- computed integer columns are cast to BIGINT on both sides;
- LIMIT queries carry a full deterministic ORDER BY tie-break.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from db_spark.ops import Q, SortDirection
from db_spark.conditions import col, val, Query
from db_spark.functions import money_sum, decimal_sum, truthy


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from db_spark.sources import read_table

    return read_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Core operator queries (SURVEY §2.1)
# ---------------------------------------------------------------------------

def q_table_scan(spark, sf_dir):
    """TableScan → collect (reference table_scan.rs:64-123)."""
    return Q(_t(spark, sf_dir, "region")).df


def q_filter(spark, sf_dir):
    """Filter operator (reference filter.rs:25-47) — predicate pushes to
    the parquet scan."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        Q(li)
        .filter((F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
                & (F.col("l_quantity") < 24.0))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
        .df
    )


def q_condition_dsl(spark, sf_dir):
    """Condition DSL normalized to CNF then compiled to Catalyst columns
    (completes reference src/query/mod.rs entry point B)."""
    part = _t(spark, sf_dir, "part")
    cond = (col("p_size") >= val(10)) & col("p_type").like("%STANDARD%") & ~(
        col("p_brand") == val("Brand#11")
    )
    return Query(part).filter(cond).df.select("p_partkey", "p_name", "p_brand", "p_size")


def q_projection(spark, sf_dir):
    """Select as pure projection with computed fields (select.rs:227-268)."""
    o = _t(spark, sf_dir, "orders")
    return Q(o).select(
        F.col("o_orderkey"),
        F.upper(F.col("o_orderpriority")).alias("prio"),
        F.year(F.col("o_orderdate")).cast("long").alias("order_year"),
        (F.col("o_totalprice") * 0.1).alias("commission"),
    ).df


def q_pricing_summary(spark, sf_dir):
    """Flagship: TPC-H Q1-style pricing summary — Select-with-aggregates
    (reference select.rs:32-128 streaming group-change agg → Spark hash
    aggregate with partial/final phases)."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    agg = (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money_sum(F.col("l_quantity"), "sum_qty"),
            money_sum(F.col("l_extendedprice"), "sum_base_price"),
            decimal_sum(disc_price, "sum_disc_price"),
            decimal_sum(charge, "sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
    return agg


def q_global_agg(spark, sf_dir):
    """SelectBuilder global aggregate (no group keys): single-row output."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        Q(li).select(builder=lambda b: b
                     .count("n_rows")
                     .max_value("l_quantity", "max_qty")
                     .min_value("l_shipdate", "first_ship"))
        .df
    )


def q_count_when(spark, sf_dir):
    """count_when with intended per-type truthiness (select.rs:247-263;
    decimal-inversion bug NOT reproduced — SURVEY §2.1 #6)."""
    ev = _t(spark, sf_dir, "events")
    return Q(ev).select(builder=lambda b: b
                        .count("n")
                        .count_when("value", "n_value_truthy")).df


def q_take(spark, sf_dir):
    """Take = LIMIT (take.rs:23-49); deterministic via full ORDER BY."""
    o = _t(spark, sf_dir, "orders")
    return (
        Q(o).in_memory_sort([F.col("o_totalprice").desc(), F.col("o_orderkey")])
        .take(10)
        .select("o_orderkey", "o_totalprice")
        .df
    )


def q_skip(spark, sf_dir):
    """Skip = OFFSET (skip.rs:22-34; real offset, not the reference's
    broken-under-collect variant — SURVEY §2.1 #9)."""
    o = _t(spark, sf_dir, "orders")
    return (
        Q(o.orderBy(F.col("o_orderkey")))
        .skip(100)
        .take(10)
        .select("o_orderkey", "o_custkey")
        .df
    )


def q_nested_loop(spark, sf_dir):
    """Inner equi-join by key position (nested_loop.rs:28-55); output is
    left fields ++ right fields."""
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        Q(nation).nested_loop(Q(region), "n_regionkey", "r_regionkey")
        .select("n_nationkey", "n_name", "r_name")
        .df
    )


def q_hash_match(spark, sf_dir):
    """Hash join + sort + group aggregate — the reference's headline
    composite bench (10K_hash_match.rs:72-107). Build side (customer)
    broadcast like the reference hashes its right input."""
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    joined = Q(orders).hash_match(Q(customer), "o_custkey", "c_custkey",
                                  broadcast_build=True)
    return (
        joined.group_agg(
            ["c_mktsegment"],
            [money_sum(F.col("o_totalprice"), "revenue"),
             F.count(F.lit(1)).alias("n_orders")],
        ).df
    )


def q_sort(spark, sf_dir):
    """InMemorySort named semantics (in_memory_sort.rs:40-72; inverted-
    Ascending quirk NOT reproduced) — external range-partitioned sort."""
    c = _t(spark, sf_dir, "customer")
    return (
        Q(c).in_memory_sort([F.col("c_acctbal").desc(), F.col("c_custkey")])
        .take(50)
        .select("c_custkey", "c_acctbal")
        .df
    )


def q_distinct(spark, sf_dir):
    """Roadmap Distinct (README.md:94)."""
    li = _t(spark, sf_dir, "lineitem")
    return Q(li).select("l_returnflag", "l_linestatus").distinct().df


def q_concat(spark, sf_dir):
    """Roadmap Concatenate (README.md:82)."""
    c = Q(_t(spark, sf_dir, "customer")).select(
        F.col("c_custkey").alias("key"), F.col("c_name").alias("name"))
    s = Q(_t(spark, sf_dir, "supplier")).select(
        F.col("s_suppkey").alias("key"), F.col("s_name").alias("name"))
    return c.concat(s).df


def q_constant_scan(spark, sf_dir):
    """Roadmap Constant Scan (README.md:83)."""
    return Q.constant_scan(
        spark, [(1, "a"), (2, "b"), (3, "c")], "id long, tag string"
    ).df


def q_semi_join(spark, sf_dir):
    """Left-semi join (capability beyond reference, SURVEY §2.3 gap)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        Q(c).join(o, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .df
    )


def q_anti_join(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        Q(c).join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .df
    )


def q_outer_join(spark, sf_dir):
    """Left outer join with null-preserving aggregation."""
    n = _t(spark, sf_dir, "nation")
    s = _t(spark, sf_dir, "supplier")
    return (
        Q(n).join(s, F.col("n_nationkey") == F.col("s_nationkey"), "left")
        .group_agg(["n_name"], [F.count(F.col("s_suppkey")).alias("n_suppliers")])
        .df
    )


def q_multi_join(spark, sf_dir):
    """Join chain across 4 tables (region→nation→customer→orders):
    broadcast dims, shuffle fact — TPC-H Q5 shape."""
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        Q(o)
        .hash_match(Q(c), "o_custkey", "c_custkey", broadcast_build=True)
        .hash_match(Q(n), "c_nationkey", "n_nationkey", broadcast_build=True)
        .hash_match(Q(r), "n_regionkey", "r_regionkey", broadcast_build=True)
        .group_agg(["r_name"], [money_sum(F.col("o_totalprice"), "revenue"),
                                F.count(F.lit(1)).alias("n_orders")])
        .df
    )


# ---------------------------------------------------------------------------
# Driver contract
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "table_scan": q_table_scan,
        "filter": q_filter,
        "condition_dsl": q_condition_dsl,
        "projection": q_projection,
        "pricing_summary": q_pricing_summary,
        "global_agg": q_global_agg,
        "count_when": q_count_when,
        "take": q_take,
        "skip": q_skip,
        "nested_loop": q_nested_loop,
        "hash_match": q_hash_match,
        "sort": q_sort,
        "distinct": q_distinct,
        "concat": q_concat,
        "constant_scan": q_constant_scan,
        "semi_join": q_semi_join,
        "anti_join": q_anti_join,
        "outer_join": q_outer_join,
        "multi_join": q_multi_join,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "table_scan": "SELECT * FROM region",
        "filter": """
            SELECT l_orderkey, l_linenumber, l_quantity, l_discount
            FROM lineitem
            WHERE l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24.0
        """,
        "condition_dsl": """
            SELECT p_partkey, p_name, p_brand, p_size
            FROM part
            WHERE p_size >= 10 AND p_type LIKE '%STANDARD%'
              AND NOT (p_brand = 'Brand#11')
        """,
        "projection": """
            SELECT o_orderkey,
                   upper(o_orderpriority) AS prio,
                   CAST(year(o_orderdate) AS BIGINT) AS order_year,
                   o_totalprice * 0.1 AS commission
            FROM orders
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
                   CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
                   CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(28,6))) AS DOUBLE) AS sum_charge,
                   COUNT(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "global_agg": """
            SELECT COUNT(*) AS n_rows,
                   MAX(l_quantity) AS max_qty,
                   MIN(l_shipdate) AS first_ship
            FROM lineitem
        """,
        "count_when": """
            SELECT COUNT(*) AS n,
                   SUM(CASE WHEN NOT isnan("value") AND abs("value") >= 0.000001
                            THEN 1 ELSE 0 END) AS n_value_truthy
            FROM events
        """,
        "take": """
            SELECT o_orderkey, o_totalprice
            FROM orders
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 10
        """,
        "skip": """
            SELECT o_orderkey, o_custkey
            FROM orders
            ORDER BY o_orderkey
            LIMIT 10 OFFSET 100
        """,
        "nested_loop": """
            SELECT n_nationkey, n_name, r_name
            FROM nation JOIN region ON n_regionkey = r_regionkey
        """,
        "hash_match": """
            SELECT c_mktsegment,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
                   COUNT(*) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment
        """,
        "sort": """
            SELECT c_custkey, c_acctbal
            FROM customer
            ORDER BY c_acctbal DESC, c_custkey
            LIMIT 50
        """,
        "distinct": "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
        "concat": """
            SELECT c_custkey AS key, c_name AS name FROM customer
            UNION ALL
            SELECT s_suppkey AS key, s_name AS name FROM supplier
        """,
        "constant_scan": """
            SELECT * FROM (VALUES (CAST(1 AS BIGINT), 'a'),
                                  (CAST(2 AS BIGINT), 'b'),
                                  (CAST(3 AS BIGINT), 'c')) AS t(id, tag)
        """,
        "semi_join": """
            SELECT c_custkey, c_name FROM customer
            WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        """,
        "anti_join": """
            SELECT c_custkey, c_name FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        """,
        "outer_join": """
            SELECT n_name, COUNT(s_suppkey) AS n_suppliers
            FROM nation LEFT JOIN supplier ON n_nationkey = s_nationkey
            GROUP BY n_name
        """,
        "multi_join": """
            SELECT r_name,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
                   COUNT(*) AS n_orders
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name
        """,
    }
