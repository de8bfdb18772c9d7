"""Graph algorithms as iterated DataFrame joins: PageRank (this
module), connected components (``db_spark.llm.dedup.cluster_pairs``
— min-label propagation), triangle counting and co-occurrence edges
(`__spark_entry__` query shapes). The reference has no graph tier;
this is north-star surface for entity-graph work over relational data.

PageRank here is INTEGER PageRank: ranks are scaled BIGINTs
(micro-units) and every update is integer arithmetic — ``contrib =
rank DIV out_degree``, ``rank' = base + (85 * sum(contrib)) DIV 100``
— so the fixed-iteration result is bit-identical on any engine and in
any partitioning / addition order (the float formulation's sum order
would drift), which makes a 5-iteration run SQL-oracle-checkable as
unrolled CTEs. The floor divisions lose < 1 micro-unit per edge per
round; at the default scale (1e6) that is < 1e-4 relative error
against float PageRank — noise next to the damping truncation itself.

Scale shape per iteration: one join of the edge list against the
(node, rank) table keyed by src (the rank side is |V|, broadcastable
for mid-sized graphs and AQE decides), one shuffle keyed by dst for
the contribution sum, and a left join back onto the node list so
sink-only nodes keep their base rank. Lineage is truncated with
``localCheckpoint`` every round — iterative loops otherwise nest the
plan one join deeper per iteration until plan explain recurses out of
stack. Dangling-node mass (out-degree 0) is dropped, not
redistributed — the classic simplification; totals shrink but the
ranking order is preserved (documented contract, mirrored in the
oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: rank scale: 1.0 of probability mass == SCALE micro-units
SCALE = 1_000_000
#: damping factor 0.85 expressed as integer percents
DAMP_PCT = 85


def pagerank(
    edges: DataFrame, iterations: int = 5,
    src_col: str = "src", dst_col: str = "dst", source=None,
) -> DataFrame:
    """Fixed-iteration integer PageRank over a directed edge list
    (duplicate edges collapse). Returns (node, rank_scaled BIGINT,
    rank DOUBLE) where rank = rank_scaled / 1e6; every node that
    appears as src or dst gets a row. Deterministic: integer ops only,
    identical under any execution order.

    ``source`` switches to PERSONALIZED PageRank: unit mass starts at
    the source and every teleport returns there — rank becomes
    "relevance to source through the link structure" (the
    random-walk-with-restart similarity used for recommendations).
    Same integer arithmetic, same unrollable oracle; only the init
    and base terms change."""
    e = edges.select(F.col(src_col).alias("_s"),
                     F.col(dst_col).alias("_d")).distinct()
    nodes = (
        e.select(F.col("_s").alias("node"))
        .unionByName(e.select(F.col("_d").alias("node")))
        .distinct()
    )
    deg = e.groupBy("_s").agg(F.count(F.lit(1)).cast("long").alias("_deg"))
    base = SCALE - DAMP_PCT * SCALE // 100  # 150_000: the (1-d) share
    if source is None:
        init = F.lit(SCALE)
        base_term = F.lit(base)
    else:
        init = F.when(F.col("node") == source, F.lit(SCALE)).otherwise(F.lit(0))
        base_term = F.when(F.col("node") == source, F.lit(base)) \
            .otherwise(F.lit(0))
    rank = nodes.select("node", init.cast("long").alias("_r"))
    rank = rank.localCheckpoint(eager=True)
    for _ in range(iterations):
        # `div` (not float division + cast): double rounding could land
        # exactly on an integer the true quotient sits just below
        contrib = (
            e.join(rank, e["_s"] == rank["node"])
            .join(deg, "_s")
            .select(F.col("_d").alias("node"),
                    F.expr("_r div _deg").cast("long").alias("_c"))
        )
        summed = contrib.groupBy("node").agg(
            F.sum("_c").cast("long").alias("_sc"))
        rank = (
            nodes.join(summed, "node", "left")
            .withColumn("_sc", F.coalesce(F.col("_sc"), F.lit(0)))
            .select(
                "node",
                (base_term
                 + F.expr(f"({DAMP_PCT} * _sc) div 100"))
                .cast("long").alias("_r"))
        )
        rank = rank.localCheckpoint(eager=True)
    return rank.select(
        "node",
        F.col("_r").alias("rank_scaled"),
        F.round(F.col("_r").cast("double") / SCALE, 6).alias("rank"),
    )


def bfs_distances(
    edges: DataFrame, source, max_hops: int = 3,
    src_col: str = "src", dst_col: str = "dst",
    directed: bool = True,
) -> DataFrame:
    """Breadth-first hop distances from ``source``: (node, dist) for
    every node reachable in <= ``max_hops`` hops, dist = minimum hop
    count (the source itself is dist 0). Deterministic — BFS level
    sets have no tie-breaking to drift.

    Frontier expansion, not path enumeration: each round joins the
    CURRENT FRONTIER (nodes first reached last round) against the edge
    list and anti-joins the visited set, so a node is expanded exactly
    once and the per-round shuffle is O(frontier-adjacent edges) — on
    a cyclic graph a path-walking formulation (the naive recursive-CTE
    shape) enumerates exponentially many walks, while this stays
    linear in |E| total across all rounds. Lineage is truncated with
    ``localCheckpoint`` per round (iterative-loop rule, see
    ``pagerank``); the loop exits early on an empty frontier — the
    one count() per round is a scalar driver fetch, not a collect.
    """
    e = edges.select(F.col(src_col).alias("_s"),
                     F.col(dst_col).alias("_d")).distinct()
    if not directed:
        e = e.unionByName(
            e.select(F.col("_d").alias("_s"), F.col("_s").alias("_d"))
        ).distinct()
    nodes = e.select(F.col("_s").alias("node")).unionByName(
        e.select(F.col("_d").alias("node"))).distinct()
    dist = nodes.filter(F.col("node") == source).withColumn(
        "dist", F.lit(0).cast("long"))
    dist = dist.localCheckpoint(eager=True)
    frontier = dist.select("node")
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["_s"])
            .select(F.col("_d").alias("node")).distinct()
            .join(dist.select("node"), "node", "left_anti")
            .withColumn("dist", F.lit(h).cast("long"))
        )
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            break
        dist = dist.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt.select("node")
    return dist


def label_propagation(
    edges: DataFrame, iterations: int = 4,
    src_col: str = "src", dst_col: str = "dst",
) -> DataFrame:
    """Fixed-iteration synchronous label-propagation communities over an
    undirected graph (edges are symmetrized, duplicates collapse).
    Every node starts labeled with itself; each round every node takes
    the most frequent label among its NEIGHBORS, ties toward the
    smallest label — exact integer votes + total-order tie-break, so a
    fixed number of rounds is bit-deterministic under any partitioning
    (synchronous LPA can oscillate on bipartite structures; fixed
    iterations make that a defined, reproducible answer rather than
    a convergence loop) and the whole run unrolls into SQL CTEs for
    the oracle, like ``pagerank``.

    Per round: one edge-keyed join against the |V|-sized label table,
    one (node, label) count, one node-keyed struct-argmax;
    ``localCheckpoint`` keeps the plan round-sized. Isolated nodes
    (none, after symmetrization of a non-empty edge list containing
    them) would keep their own label. Returns (node, community).
    """
    e = (
        edges.select(F.col(src_col).alias("_s"), F.col(dst_col).alias("_d"))
        .unionByName(
            edges.select(F.col(dst_col).alias("_s"),
                         F.col(src_col).alias("_d")))
        .filter(F.col("_s") != F.col("_d"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = e.select(F.col("_s").alias("node")).distinct() \
        .withColumn("_lbl", F.col("node")).localCheckpoint(eager=True)
    for _ in range(iterations):
        votes = (
            e.join(labels, e["_d"] == labels["node"])
            .groupBy(F.col("_s").alias("vnode"), "_lbl")
            .agg(F.count(F.lit(1)).cast("long").alias("_c"))
        )
        best = votes.groupBy("vnode").agg(
            F.max(F.struct(F.col("_c"), (-F.col("_lbl")).alias("_nl")))
            .alias("_b"))
        labels = best.select(
            F.col("vnode").alias("node"),
            (-F.col("_b._nl")).alias("_lbl")).localCheckpoint(eager=True)
    return labels.select("node", F.col("_lbl").alias("community"))


def k_core(
    edges: DataFrame, k: int, rounds: int | None = None,
    src_col: str = "src", dst_col: str = "dst",
) -> DataFrame:
    """K-core decomposition by synchronous peeling over an undirected
    graph (edges symmetrized, self-loops and duplicates dropped): each
    round removes every node whose CURRENT degree is < ``k``, then
    induces the subgraph on the survivors. Returns (node, degree) for
    nodes with >= 1 surviving edge, degree measured in the final
    induced subgraph.

    ``rounds=None`` (the scale path) peels to the fixpoint — the true
    k-core; termination is guaranteed because the node count strictly
    shrinks every non-final round, and the only driver-side value per
    round is one scalar count. ``rounds=N`` runs exactly N synchronous
    rounds with NO driver scalars (fully lazy), which makes the result
    SQL-oracle-checkable as unrolled CTEs like ``pagerank`` /
    ``label_propagation``; at fixpoint the two modes agree. Peeling is
    set arithmetic only — no tie-breaking anywhere — so the result is
    bit-deterministic under any partitioning in both modes.

    Per round: one node-keyed degree count and two semi-joins of the
    edge list against the |V|-sized survivor set; ``localCheckpoint``
    keeps the plan round-sized. The edge list only ever shrinks.
    """
    e = (
        edges.select(F.col(src_col).alias("_s"), F.col(dst_col).alias("_d"))
        .unionByName(
            edges.select(F.col(dst_col).alias("_s"),
                         F.col(src_col).alias("_d")))
        .filter(F.col("_s") != F.col("_d"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def peel(edge_df: DataFrame) -> DataFrame:
        deg = edge_df.groupBy("_s").agg(
            F.count(F.lit(1)).cast("long").alias("_deg"))
        keep = deg.filter(F.col("_deg") >= k) \
            .select(F.col("_s").alias("_keep"))
        return (
            edge_df
            .join(keep, edge_df["_s"] == keep["_keep"], "left_semi")
            .join(keep, edge_df["_d"] == keep["_keep"], "left_semi")
        )

    if rounds is not None:
        for _ in range(rounds):
            e = peel(e).localCheckpoint(eager=True)
    else:
        # symmetrized: distinct _s IS the node set
        prev = e.select("_s").distinct().count()
        while prev:
            e = peel(e).localCheckpoint(eager=True)
            n = e.select("_s").distinct().count()
            if n == prev:
                break
            prev = n
    return e.groupBy(F.col("_s").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("degree"))


def bellman_ford(
    edges: DataFrame, source, rounds: int = 4,
    src_col: str = "src", dst_col: str = "dst", weight_col: str = "weight",
) -> DataFrame:
    """Fixed-round Bellman-Ford single-source shortest paths over a
    directed weighted edge list (integer weights, duplicates keep the
    cheapest): after N relaxation rounds, (node, dist) holds the exact
    shortest-path cost over paths of <= N edges — integer min-merge
    arithmetic has NO tie-breaking to drift, so the result is
    bit-deterministic under any partitioning and the oracle unrolls
    the same rounds as CTEs (`kcore`/`communities` discipline). With
    rounds >= |V|-1 this is the true SSSP; fixed small N is the
    "reachable within N hops, cheapest way" ask. Negative weights are
    rejected (cycles would make fixed-round output path-length-
    dependent in a way users rarely intend).

    Per round: one join of the CURRENT distance table (|reached| rows,
    grows toward |V|) against the edge list keyed by src, one dst-keyed
    min, one full-outer min-merge with the previous table;
    ``localCheckpoint`` per round. Edges never move — only the
    distance table shuffles."""
    e = (edges.select(F.col(src_col).alias("_s"),
                      F.col(dst_col).alias("_d"),
                      F.col(weight_col).cast("long").alias("_w"))
         .groupBy("_s", "_d").agg(F.min("_w").alias("_w"))
         .localCheckpoint(eager=True))
    if not e.filter(F.col("_w") < 0).isEmpty():
        raise ValueError("bellman_ford requires non-negative weights")
    dist = e.sparkSession.createDataFrame(
        [(source, 0)], "node long, dist long").localCheckpoint(eager=True)
    for _ in range(rounds):
        relaxed = (
            dist.join(e, dist["node"] == e["_s"])
            .groupBy(F.col("_d").alias("node"))
            .agg(F.min(F.col("dist") + F.col("_w")).alias("_nd"))
        )
        dist = (
            dist.join(relaxed, "node", "full_outer")
            .select("node",
                    F.least(F.coalesce(F.col("dist"), F.col("_nd")),
                            F.coalesce(F.col("_nd"), F.col("dist")))
                    .alias("dist"))
            .localCheckpoint(eager=True)
        )
    return dist
