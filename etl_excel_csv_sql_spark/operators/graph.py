"""Graph analytics on edge DataFrames: PageRank and BFS reachability.

Spark-first Pregel emulation: a graph iteration is `edges ⋈ state on src
→ groupBy dst` — the same join+aggregate round the connected-components
operators use (dedup.py). Two algorithms with FIXED, deterministic round
counts so results are reproducible and ORACLE-CHECKABLE (the oracle
unrolls the same rounds as chained CTEs — no recursion needed):

- **PageRank** (``pagerank``): the simple power-iteration variant
  rank' = (1-d)/N + d·Σ rank(in)/outdeg(in). Dangling-node mass is NOT
  redistributed (documented choice — both engines drop it identically;
  feed a symmetrized edge list if every node must have out-edges).
  Intermediate ranks are rounded to 12dp each round ON BOTH ENGINES,
  which pins the tiny FP summation-order drift to zero instead of letting
  it compound across rounds.
- **BFS** (``bfs_distances``): minimum hop count from a seed set, frontier
  expansion, at most ``max_hops`` rounds.

Scale: per round the state frame is one row per vertex and the join
shuffles on the edge key — the edge list is checkpointed once and reused
every round (it is the big side; at 100 TB pre-partition it by src so
every round's join co-locates). State is checkpointed per round to keep
the plan linear in rounds, not exponential.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _edges(df: DataFrame, src_col: str, dst_col: str) -> DataFrame:
    return df.select(
        F.col(src_col).cast("string").alias("src"),
        F.col(dst_col).cast("string").alias("dst"),
    ).distinct()


def pagerank(
    edge_df: DataFrame,
    src_col: str,
    dst_col: str,
    iterations: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """(node, rank) after ``iterations`` rounds of simple power iteration.

    Vertices = distinct endpoints of the (deduplicated) edge list. Ranks
    start uniform at 1/N; each round every vertex emits rank/outdeg along
    its out-edges. Final rank rounded to 6dp (intermediates to 12dp, see
    module docstring).
    """
    edges = _edges(edge_df, src_col, dst_col).localCheckpoint(eager=True)
    vertices = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    # one row per vertex per round — N is an in-plan broadcast scalar
    n_row = vertices.agg(F.count("*").alias("n"))
    ranks = vertices.crossJoin(F.broadcast(n_row)).select(
        "node", (F.lit(1.0) / F.col("n")).alias("rank")
    )
    for _ in range(iterations):
        contribs = (
            edges.join(outdeg, "src")
            .join(ranks.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") / F.col("outdeg")).alias("contrib"))
        )
        ranks = (
            vertices.join(contribs, "node", "left")
            .crossJoin(F.broadcast(n_row))
            .select(
                "node",
                F.round(
                    (1.0 - damping) / F.col("n")
                    + damping * F.coalesce(F.col("contrib"), F.lit(0.0)),
                    12,
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)  # linear plan across rounds
        )
    return ranks.select("node", F.round("rank", 6).alias("rank"))


def bfs_distances(
    edge_df: DataFrame,
    src_col: str,
    dst_col: str,
    seeds: DataFrame,
    max_hops: int = 3,
) -> DataFrame:
    """(node, hops) minimum hop count from ``seeds`` (a one-column frame
    of node ids), reachable within ``max_hops`` rounds; seeds are hop 0.

    Frontier-optimized: each round expands only the vertices discovered
    in the previous round, so work per round is proportional to the
    frontier, not the visited set.
    """
    edges = _edges(edge_df, src_col, dst_col).localCheckpoint(eager=True)
    # distinct: a seed frame with repeats (e.g. built from an event scan)
    # would emit duplicate (node, 0) rows and double-count downstream —
    # same normalization personalized_pagerank applies to its seeds
    visited = seeds.select(
        F.col(seeds.columns[0]).cast("string").alias("node"),
        F.lit(0).alias("hops"),
    ).distinct().localCheckpoint(eager=True)
    frontier = visited
    for hop in range(1, max_hops + 1):
        neighbors = (
            edges.join(frontier.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"))
            .distinct()
        )
        frontier = (
            neighbors.join(visited.select("node"), "node", "left_anti")
            .select("node", F.lit(hop).alias("hops"))
            .localCheckpoint(eager=True)
        )
        if frontier.limit(1).count() == 0:
            break
        visited = visited.unionByName(frontier).localCheckpoint(eager=True)
    return visited


def personalized_pagerank(
    edge_df: DataFrame,
    src_col: str,
    dst_col: str,
    seeds: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
    weight_col: str | None = None,
) -> DataFrame:
    """Personalized (seed-restart) PageRank, optionally edge-WEIGHTED:
    the teleport mass returns to the SEED set instead of spreading
    uniformly — rank' = (1-d)·seed_share + d·Σ rank(in)·w/Σw(out) —
    so scores measure proximity to the seeds (the recommendation /
    related-items primitive). With ``weight_col`` the walk follows edge
    weights (e.g. co-purchase counts); weights are normalized by the
    source's total outgoing weight.

    Same Pregel-style round structure as :func:`pagerank` (checkpointed
    edges, per-round state checkpoint, 12dp intermediate rounding);
    seeds start with uniform 1/|seeds| mass, non-seeds with 0.
    """
    cols = [F.col(src_col).cast("string").alias("src"),
            F.col(dst_col).cast("string").alias("dst")]
    if weight_col is not None:
        cols.append(F.col(weight_col).cast("double").alias("w"))
        edges = (
            edge_df.select(*cols)
            .groupBy("src", "dst")
            .agg(F.sum("w").alias("w"))
            .localCheckpoint(eager=True)
        )
    else:
        edges = (
            edge_df.select(*cols)
            .distinct()
            .withColumn("w", F.lit(1.0))
            .localCheckpoint(eager=True)
        )
    seed_nodes = seeds.select(
        F.col(seeds.columns[0]).cast("string").alias("node")
    ).distinct()
    # Vertex set includes OUT-OF-GRAPH seeds: a seed with no edges still
    # receives its (1-d)·seed_share teleport mass every round (it just
    # never propagates). Without the union, isolated seeds vanished from
    # the output while n_seeds counted them — every rank deflated and
    # total teleport mass leaked (code-review r9 catch).
    vertices = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .unionByName(seed_nodes)
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_seeds = seed_nodes.agg(F.count("*").alias("ns"))  # broadcast scalar
    base = (
        vertices.join(seed_nodes.withColumn("is_seed", F.lit(1)), "node", "left")
        .crossJoin(F.broadcast(n_seeds))
        .select(
            "node",
            (F.coalesce(F.col("is_seed"), F.lit(0)) / F.col("ns")).alias(
                "seed_share"
            ),
        )
        .localCheckpoint(eager=True)
    )
    out_w = edges.groupBy("src").agg(F.sum("w").alias("out_w"))
    ranks = base.select("node", F.col("seed_share").alias("rank"))
    for _ in range(iterations):
        contribs = (
            edges.join(out_w, "src")
            .join(ranks.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") * F.col("w") / F.col("out_w")).alias("c"))
        )
        ranks = (
            base.join(contribs, "node", "left")
            .select(
                "node",
                F.round(
                    (1.0 - damping) * F.col("seed_share")
                    + damping * F.coalesce(F.col("c"), F.lit(0.0)),
                    12,
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("node", F.round("rank", 6).alias("rank"))


def label_propagation(
    edge_df: DataFrame,
    src_col: str,
    dst_col: str,
    rounds: int = 3,
) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan et
    al. 2007) with a DETERMINISTIC update: each round every node adopts
    the most frequent label among its in-neighbors, ties broken by the
    smallest label, isolated/in-edge-less nodes keep their own. A FIXED
    round count makes the result reproducible and oracle-checkable (the
    oracle unrolls the same rounds as chained CTEs), sidestepping
    async-LPA's run-to-run nondeterminism.

    Per round: edges ⋈ labels on src → groupBy (dst, label) count → the
    per-node argmax via a grouped min-struct aggregate ((-count, label)
    — bounded two-phase agg, NO row_number window), left-joined back so
    label-less nodes persist. Edge list checkpointed once; state
    checkpointed per round (plan linear in rounds). Feed a symmetrized
    edge list for undirected communities.

    Output: (node, community) — community ids are node ids (strings),
    stable within a build.
    """
    edges = _edges(edge_df, src_col, dst_col).localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = nodes.select("node", F.col("node").alias("label"))
    for _ in range(max(0, rounds)):
        counts = (
            edges.join(labels, edges["src"] == labels["node"])
            .groupBy(F.col("dst").alias("n"), "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        pick = counts.groupBy("n").agg(
            F.min(
                F.struct((-F.col("c")).alias("negc"), F.col("label"))
            )["label"].alias("new_label")
        )
        labels = (
            labels.join(pick, labels["node"] == pick["n"], "left")
            .select(
                "node",
                F.coalesce(F.col("new_label"), F.col("label")).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
    return labels.select("node", F.col("label").alias("community"))


def triangle_stats(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Exact triangle count + global clustering coefficient of an
    undirected graph, via the degree-ordered orientation (the
    MapReduce-era standard — Suri & Vassilvitskii, WWW'11 "Counting
    triangles and the curse of the last reducer"): orient every edge
    from its lower-(degree, id) endpoint to the higher one, so each
    triangle is counted EXACTLY once and — the scale point — every
    node's out-degree is O(√m), which bounds the wedge join against
    the hub-node blowup a naive a<b ordering suffers (the "last
    reducer" holding a celebrity node's entire neighborhood).

    Plan: symmetrize+dedup edges (one shuffle), degree aggregate (one
    shuffle), orient (broadcast degree join), wedge self-join on the
    middle vertex, close the wedge with a semi-ish inner join on the
    (lo, hi) edge set, then ONE global aggregate row:
    (n_nodes, n_edges, n_triangles, wedges, clustering) with
    clustering = 3·triangles / wedges (wedges = Σ deg·(deg−1)/2).

    The oracle counts the same triangles with the naive a<b<c
    three-way join — the driver value-proves the orientation rewrite.
    """
    sym = (
        _edges(edges, src_col, dst_col)
        .where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
        .localCheckpoint(eager=True)  # degrees + orientation + closure
    )
    deg = (
        sym.select(F.col("a").alias("v"))
        .unionAll(sym.select("b"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    oriented = (
        sym.join(deg.withColumnRenamed("v", "a").withColumnRenamed("deg", "da"), "a")
        .join(deg.withColumnRenamed("v", "b").withColumnRenamed("deg", "db"), "b")
        .select(
            F.when(
                (F.col("da") < F.col("db"))
                | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("u"), F.col("b").alias("w")),
            )
            .otherwise(F.struct(F.col("b").alias("u"), F.col("a").alias("w")))
            .alias("e")
        )
        .select(F.col("e.u").alias("u"), F.col("e.w").alias("w"))
        .localCheckpoint(eager=True)
    )
    # wedges u->w1, u->w2 (w1 < w2 fixes one counting order); the closing
    # edge (w1, w2) is looked up in the ORIENTED set in both directions
    # collapsed to its canonical (lo, hi) form
    w1 = oriented.select(F.col("u"), F.col("w").alias("w1"))
    w2 = oriented.select(F.col("u"), F.col("w").alias("w2"))
    wedge = w1.join(w2, "u").where(F.col("w1") < F.col("w2"))
    # the closing-edge set is just the canonical edge list itself
    closer = sym.select(F.col("a").alias("w1"), F.col("b").alias("w2"))
    tri = wedge.join(closer, ["w1", "w2"], "left_semi").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_triangles")
    )
    counts = sym.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    nodes_wedges = deg.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
        F.sum(F.col("deg") * (F.col("deg") - 1) / 2)
        .cast("bigint")
        .alias("wedges"),
    )
    return (
        tri.crossJoin(counts)
        .crossJoin(nodes_wedges)
        .select(
            "n_nodes",
            "n_edges",
            "n_triangles",
            "wedges",
            F.round(
                F.try_divide(3.0 * F.col("n_triangles"), F.col("wedges")), 6
            ).alias("clustering"),
        )
    )
