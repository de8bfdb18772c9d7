"""docs/MIGRATION.md's translated README example, executed verbatim —
the reference's flagship chain (README.md:20-49) through our API:
table_scan -> hash_match by column index -> in_memory_sort desc ->
select(builder) with plain + aggregate fields -> collect."""

from db_spark.engine import Storage
from db_spark.functions import col_at
from db_spark.ops import Q, SortDirection
from db_spark.table import uuid7


def test_reference_readme_example_translates(spark, tmp_path):
    storage = Storage(spark, str(tmp_path / "db"))
    table1 = storage.get_collection("table")
    table2 = storage.get_collection("table2")

    # table1 rows: 9 payload columns (+_id); column 3 is the join key,
    # column 4 the sort/aggregate target.
    t1_rows = [(str(i), f"a{i}", f"b{i}", i % 3, 10 * i, i, i, i, i, i)
               for i in range(6)]
    schema1 = ("_id string, c1 string, c2 string, k int, v int, "
               "x1 int, x2 int, x3 int, c8 int, x4 int")
    table1.set_objects(None, spark.createDataFrame(t1_rows, schema1))
    # table2: column 0 after _id? — the reference joins on other.column(0);
    # our positional indices include _id at 0, matching table_scan output.
    t2_rows = [(str(100 + k), k) for k in range(3)]
    table2.set_objects(
        None, spark.createDataFrame(t2_rows, "_id string, k2 int"))

    tx = uuid7()
    t1 = table1.table_scan(tx)
    t2 = table2.table_scan(tx)
    rows = (
        Q(t1)
        .hash_match(Q(t2), 3, 1)              # t1.k (idx 3) == t2.k2 (idx 1)
        .in_memory_sort(4, SortDirection.DESCENDING)
        .select(builder=lambda b: b.column(1).column(2).column(8)
                .max_value(col_at(t1, 4).cast("int") * 3))
        .collect()
    )
    # one aggregate + three plain fields -> grouped by the plain fields;
    # every (c1, c2, c8) group is one source row, so max(v*3) = v*3
    assert len(rows) == 6
    by_c1 = {r[0]: r for r in rows}
    assert by_c1["a5"][3] == 150  # 10*5*3
    assert set(by_c1) == {f"a{i}" for i in range(6)}
