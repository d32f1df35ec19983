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
    visited = seeds.select(
        F.col(seeds.columns[0]).cast("string").alias("node"),
        F.lit(0).alias("hops"),
    ).localCheckpoint(eager=True)
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
    vertices = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    seed_nodes = seeds.select(
        F.col(seeds.columns[0]).cast("string").alias("node")
    ).distinct()
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
