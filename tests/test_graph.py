"""Integer PageRank: determinism, mass accounting, known-graph ranks."""

from pyspark.sql import functions as F

from db_spark import graph


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_pagerank_star_graph_ranks_center_highest(spark):
    # spokes all point at the hub
    e = _edges(spark, [(1, 0), (2, 0), (3, 0), (4, 0)])
    out = {r["node"]: r["rank_scaled"]
           for r in graph.pagerank(e, iterations=5).collect()}
    assert out[0] > out[1]
    assert out[1] == out[2] == out[3] == out[4]
    # dangling hub contributes nothing back: spokes sit at base rank
    assert out[1] == 150_000


def test_pagerank_cycle_is_uniform_and_conserves_mass(spark):
    e = _edges(spark, [(0, 1), (1, 2), (2, 0)])
    out = graph.pagerank(e, iterations=8).collect()
    ranks = {r["rank_scaled"] for r in out}
    assert len(ranks) == 1  # symmetry -> identical ranks
    # no dangling nodes: total mass stays ~3 * SCALE (floor-div loss only)
    total = sum(r["rank_scaled"] for r in out)
    assert 3 * graph.SCALE - 100 <= total <= 3 * graph.SCALE


def test_pagerank_duplicate_edges_collapse(spark):
    a = graph.pagerank(_edges(spark, [(1, 2), (1, 2), (2, 1)]), 4)
    b = graph.pagerank(_edges(spark, [(1, 2), (2, 1)]), 4)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_pagerank_deterministic_across_partitionings(spark):
    pairs = [(i % 7, (i * 3) % 7) for i in range(30) if i % 7 != (i * 3) % 7]
    a = graph.pagerank(_edges(spark, pairs).repartition(1), 5)
    b = graph.pagerank(_edges(spark, pairs).repartition(13), 5)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
