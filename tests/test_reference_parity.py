"""Reference-parity integration scenarios: the three lib.rs tests
(SURVEY §5 layer 2) reproduced with seeded FIXTURES.md data through our
engine — bulk insert (lib.rs:66-89), scan+deserialize row count
(lib.rs:91-127), nested-loop join count (lib.rs:129-207)."""

import random
import time

import pytest
from pyspark.sql import functions as F

from db_spark.engine import Storage
from db_spark.ops import Q


@pytest.fixture()
def storage(spark, tmp_path):
    return Storage(spark, str(tmp_path))


def test_bulk_insert_10k(storage, spark):
    """lib.rs:66-89 — 10K-row 3-col (F1 basic3) bulk upsert; the
    reference logs the wall time, asserts success."""
    rows = [(f"name{i}", 26, 654.645) for i in range(10_000)]
    df = spark.createDataFrame(rows, "name string, age int, score double")
    c = storage.get_collection("bulk")
    t0 = time.perf_counter()
    c.set_objects(None, df)
    elapsed = time.perf_counter() - t0
    assert c.table_scan().count() == 10_000
    assert elapsed < 60  # sanity ceiling, not a benchmark


def test_scan_deserialize_9999(storage, spark):
    """lib.rs:91-127 — write 9,999 rows, scan + positional serde
    deserialize, assert the count."""

    class Person:
        def __init__(self, name, age, score):
            self.name, self.age, self.score = name, age, score

    rows = [(f"p{i}", i % 80, float(i)) for i in range(9_999)]
    c = storage.get_collection("people")
    c.set_objects(None, spark.createDataFrame(
        rows, "name string, age int, score double"))
    out = Q(c.table_scan().drop("_id")).deserialize(Person)
    assert len(out) == 9_999
    assert all(isinstance(p.name, str) and isinstance(p.score, float)
               for p in out[:10])


def test_nested_loop_join_10k_x_100(storage, spark):
    """lib.rs:129-207 / benches/10K_nested_loop.rs — 10K-row 6-col left
    (F3) joined to 100-row 2-col right (F4) on col3==col0; every left row
    matches exactly one right row => exactly 10,000 output rows."""
    rng = random.Random(42)
    left = spark.createDataFrame(
        [(i, f"fn{i}", f"ln{i}", rng.randrange(100), rng.random() * 1000,
          bool(i % 2)) for i in range(10_000)],
        "id int, first string, last string, country_id int, amount double, flag boolean",
    )
    right = spark.createDataFrame(
        [(i, f"country{i}") for i in range(100)], "cid int, country string")
    joined = Q(left).nested_loop(Q(right), "country_id", "cid")
    assert joined.count() == 10_000
    sample = joined.filter(F.col("id") == 0).collect()[0]
    assert sample["country"] == f"country{sample['country_id']}"
