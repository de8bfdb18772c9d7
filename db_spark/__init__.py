"""db_spark — a PySpark-native analytics engine with the capabilities of
the michalusio/DB reference (embedded Rust database-as-a-library).

The reference (read-only snapshot at /root/reference) is a Volcano-style
pull-based operator pipeline over a log-structured MVCC store
(reference: src/operators/mod.rs:11-40, src/collection/mod.rs:15-21).
This package re-expresses the same *capabilities* Spark-first:

- ``Storage`` / ``Collection``  — MVCC upsert-log tables on Parquet
  (reference: src/storage/mod.rs:17-33, src/collection/mod.rs).
- ``Q``                         — the chainable operator/query builder
  (reference: src/operators/mod.rs:42-86 chaining constructors).
- ``cond`` DSL                  — the declarative Condition layer, actually
  wired to execution via Catalyst (reference: src/query/condition.rs —
  normalized but never executed there).
- ``db_spark.llm``              — large-scale training-data ops (dedup,
  similarity search, text analysis, multimodal) beyond the reference.

Everything is declarative DataFrame API so Catalyst/Tungsten handle
pushdown, pruning, join selection, codegen and shuffle planning.
"""

from db_spark.session import get_spark, stop_spark
from db_spark.engine import Storage
from db_spark.table import Collection, SchemaError
from db_spark.ops import Q, SelectBuilder, SortDirection
from db_spark.conditions import Condition, col, val, Query

__all__ = [
    "get_spark",
    "stop_spark",
    "Storage",
    "Collection",
    "SchemaError",
    "Q",
    "SelectBuilder",
    "SortDirection",
    "Condition",
    "col",
    "val",
    "Query",
]

__version__ = "0.1.0"
