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


# ---------------------------------------------------------------------------
# BFS hop distances
# ---------------------------------------------------------------------------

def test_bfs_directed_chain_with_cycle(spark):
    from db_spark.graph import bfs_distances

    # 1->2->3->1 cycle plus 3->4, 5 isolated-from-source
    e = _edges(spark, [(1, 2), (2, 3), (3, 1), (3, 4), (5, 1)])
    got = {r["node"]: r["dist"]
           for r in bfs_distances(e, 1, max_hops=5).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}  # 5 unreachable from 1


def test_bfs_undirected_reaches_backwards(spark):
    from db_spark.graph import bfs_distances

    e = _edges(spark, [(2, 1), (3, 2)])
    got = {r["node"]: r["dist"] for r in bfs_distances(
        e, 1, max_hops=3, directed=False).collect()}
    assert got == {1: 0, 2: 1, 3: 2}


def test_bfs_max_hops_cutoff_and_min_dist(spark):
    from db_spark.graph import bfs_distances

    # two routes to 4: 1->2->4 and 1->3->5->4 — min dist wins
    e = _edges(spark, [(1, 2), (2, 4), (1, 3), (3, 5), (5, 4), (4, 6)])
    got = {r["node"]: r["dist"]
           for r in bfs_distances(e, 1, max_hops=2).collect()}
    assert got == {1: 0, 2: 1, 3: 1, 4: 2, 5: 2}  # 6 beyond cutoff


def test_bfs_source_without_edges(spark):
    from db_spark.graph import bfs_distances

    e = _edges(spark, [(1, 2)])
    # source 99 has no edges at all: BFS returns nothing (not a crash)
    assert bfs_distances(e, 99, max_hops=3).count() == 0

# ---------------------------------------------------------------------------
# Label propagation communities
# ---------------------------------------------------------------------------

def test_lpa_triangle_converges_to_min_label(spark):
    # triangle: round 1 every node takes min(other two), round 2 the
    # min label (1) wins by count or tie-break, then stays stable
    e = _edges(spark, [(1, 2), (2, 3), (1, 3)])
    got = {r["node"]: r["community"]
           for r in graph.label_propagation(e, iterations=4).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_lpa_two_components_get_distinct_communities(spark):
    e = _edges(spark, [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12)])
    got = {r["node"]: r["community"]
           for r in graph.label_propagation(e, iterations=4).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}


def test_lpa_bipartite_pair_oscillates_but_is_defined(spark):
    # K2 oscillates with period 2 under synchronous LPA; a fixed even
    # iteration count must reproduce the initial self-labels exactly
    e = _edges(spark, [(1, 2)])
    got = {r["node"]: r["community"]
           for r in graph.label_propagation(e, iterations=4).collect()}
    assert got == {1: 1, 2: 2}
    odd = {r["node"]: r["community"]
           for r in graph.label_propagation(e, iterations=3).collect()}
    assert odd == {1: 2, 2: 1}


def test_lpa_duplicate_and_reversed_edges_collapse(spark):
    a = graph.label_propagation(
        _edges(spark, [(1, 2), (2, 1), (1, 2), (2, 3)]), 4)
    b = graph.label_propagation(_edges(spark, [(1, 2), (2, 3)]), 4)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_lpa_deterministic_across_partitionings(spark):
    pairs = [(i % 9, (i * 4) % 9) for i in range(40) if i % 9 != (i * 4) % 9]
    a = graph.label_propagation(_edges(spark, pairs).repartition(1), 4)
    b = graph.label_propagation(_edges(spark, pairs).repartition(16), 4)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

# ---------------------------------------------------------------------------
# K-core decomposition
# ---------------------------------------------------------------------------

def test_kcore_pendant_removed_k4_survives(spark):
    e = _edges(spark, [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
                       (1, 5)])
    got = {r["node"]: r["degree"] for r in graph.k_core(e, 2).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_kcore_chain_unravels_to_empty(spark):
    # endpoint removal cascades: no 2-core in a path graph
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert graph.k_core(e, 2).count() == 0


def test_kcore_fixed_rounds_synchronous_semantics(spark):
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    # one synchronous round strips only the current deg<2 nodes (1, 5)
    got = {r["node"]: r["degree"]
           for r in graph.k_core(e, 2, rounds=1).collect()}
    assert got == {2: 1, 3: 2, 4: 1}
    # enough fixed rounds reaches the fixpoint answer
    assert graph.k_core(e, 2, rounds=3).count() == 0


def test_kcore_k3_strips_attached_triangle_keeps_k4(spark):
    e = _edges(spark, [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
                       (4, 6), (4, 7), (6, 7)])
    got = {r["node"]: r["degree"] for r in graph.k_core(e, 3).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_kcore_deterministic_across_partitionings(spark):
    pairs = [(i % 11, (i * 5) % 11) for i in range(50)
             if i % 11 != (i * 5) % 11]
    a = graph.k_core(_edges(spark, pairs).repartition(1), 3)
    b = graph.k_core(_edges(spark, pairs).repartition(16), 3)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

# ---------------------------------------------------------------------------
# Bellman-Ford weighted shortest paths
# ---------------------------------------------------------------------------

def _wedges(spark, triples):
    return spark.createDataFrame(triples, "src long, dst long, weight long")


def test_bellman_ford_prefers_cheaper_longer_path(spark):
    # 1->3 direct costs 10; 1->2->3 costs 5
    e = _wedges(spark, [(1, 3, 10), (1, 2, 2), (2, 3, 3), (3, 4, 1)])
    got = {r["node"]: r["dist"]
           for r in graph.bellman_ford(e, 1, rounds=4).collect()}
    assert got == {1: 0, 2: 2, 3: 5, 4: 6}


def test_bellman_ford_round_budget_limits_path_length(spark):
    e = _wedges(spark, [(1, 2, 1), (2, 3, 1), (3, 4, 1)])
    got = {r["node"]: r["dist"]
           for r in graph.bellman_ford(e, 1, rounds=2).collect()}
    assert got == {1: 0, 2: 1, 3: 2}  # 4 is 3 hops away: unreached


def test_bellman_ford_duplicate_edges_keep_cheapest(spark):
    a = graph.bellman_ford(
        _wedges(spark, [(1, 2, 5), (1, 2, 3)]), 1, rounds=2)
    assert {r["node"]: r["dist"] for r in a.collect()} == {1: 0, 2: 3}


def test_bellman_ford_rejects_negative_weights(spark):
    import pytest as _pt

    with _pt.raises(ValueError, match="non-negative"):
        graph.bellman_ford(_wedges(spark, [(1, 2, -1)]), 1)


def test_bellman_ford_deterministic_across_partitionings(spark):
    triples = [(i % 8, (i * 3) % 8, (i * 7) % 5 + 1) for i in range(40)
               if i % 8 != (i * 3) % 8]
    a = graph.bellman_ford(_wedges(spark, triples).repartition(1), 0, 4)
    b = graph.bellman_ford(_wedges(spark, triples).repartition(16), 0, 4)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

# ---------------------------------------------------------------------------
# Personalized PageRank
# ---------------------------------------------------------------------------

def test_ppr_mass_starts_and_teleports_at_source(spark):
    # chain 0->1->2: personalized on 0, rank decays along the chain
    e = _edges(spark, [(0, 1), (1, 2)])
    got = {r["node"]: r["rank_scaled"]
           for r in graph.pagerank(e, iterations=5, source=0).collect()}
    assert got[0] == 150_000          # only source gets the base share
    assert got[0] > got[1] > got[2] or got[1] > got[2]
    # a node unreachable from source and not the source: rank 0
    e2 = _edges(spark, [(0, 1), (5, 6)])
    got2 = {r["node"]: r["rank_scaled"]
            for r in graph.pagerank(e2, iterations=3, source=0).collect()}
    assert got2[5] == 0 and got2[6] == 0


def test_ppr_deterministic_across_partitionings(spark):
    pairs = [(i % 7, (i * 3) % 7) for i in range(30) if i % 7 != (i * 3) % 7]
    a = graph.pagerank(_edges(spark, pairs).repartition(1), 5, source=1)
    b = graph.pagerank(_edges(spark, pairs).repartition(13), 5, source=1)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
