from __future__ import annotations

import pytest

from etl_excel_csv_sql_spark.operators import graph


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["src", "dst"])


def _ref_pagerank(pairs, iterations=5, d=0.85):
    """Plain-Python reference: same simple variant, same 12dp rounding."""
    edges = sorted(set(pairs))
    nodes = sorted({x for e in edges for x in e})
    n = len(nodes)
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iterations):
        contrib = {v: 0.0 for v in nodes}
        for s, t in edges:
            contrib[t] += rank[s] / out[s]
        rank = {v: round((1 - d) / n + d * contrib[v], 12) for v in nodes}
    return {v: round(r, 6) for v, r in rank.items()}


CHAIN = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")]


def test_pagerank_matches_reference(spark):
    got = {
        r.node: r.rank
        for r in graph.pagerank(_edges(spark, CHAIN), "src", "dst").collect()
    }
    assert got == _ref_pagerank(CHAIN)


def test_pagerank_rank_mass_sane(spark):
    # cycle a->b->c->a: symmetric roles → equal ranks, sum == 1
    cyc = [("a", "b"), ("b", "c"), ("c", "a")]
    got = [
        r.rank
        for r in graph.pagerank(_edges(spark, cyc), "src", "dst").collect()
    ]
    assert len(set(got)) == 1
    assert sum(got) == pytest.approx(1.0, abs=5e-6)  # 3 ranks @ 6dp rounding


def test_pagerank_duplicate_edges_collapse(spark):
    got = {
        r.node: r.rank
        for r in graph.pagerank(
            _edges(spark, CHAIN + CHAIN), "src", "dst"
        ).collect()
    }
    assert got == _ref_pagerank(CHAIN)


def test_bfs_min_hops_and_frontier(spark):
    # a -> b -> c -> d -> e, plus shortcut a -> c
    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("a", "c")]
    seeds = spark.createDataFrame([("a",)], ["node"])
    got = {
        r.node: r.hops
        for r in graph.bfs_distances(
            _edges(spark, pairs), "src", "dst", seeds, max_hops=3
        ).collect()
    }
    # c reached at hop 1 via shortcut (min, not first-listed path)
    assert got == {"a": 0, "b": 1, "c": 1, "d": 2, "e": 3}


def test_bfs_early_exit_on_exhausted_frontier(spark):
    pairs = [("a", "b")]
    seeds = spark.createDataFrame([("a",)], ["node"])
    got = {
        r.node: r.hops
        for r in graph.bfs_distances(
            _edges(spark, pairs), "src", "dst", seeds, max_hops=10
        ).collect()
    }
    assert got == {"a": 0, "b": 1}


def test_personalized_pagerank_proximity_and_weights(spark):
    from pyspark.sql import functions as F

    # two communities bridged weakly; seeds in community A
    pairs = [
        ("a1", "a2", 5.0), ("a2", "a1", 5.0), ("a2", "a3", 5.0),
        ("a3", "a1", 5.0), ("a1", "a3", 5.0), ("a3", "a2", 5.0),
        ("a3", "b1", 0.1),  # weak bridge
        ("b1", "b2", 5.0), ("b2", "b1", 5.0),
    ]
    edges = spark.createDataFrame(pairs, ["src", "dst", "w"])
    seeds = spark.createDataFrame([("a1",)], ["node"])
    got = {
        r.node: r.rank
        for r in graph.personalized_pagerank(
            edges, "src", "dst", seeds, iterations=8, weight_col="w"
        ).collect()
    }
    # every A node outranks every B node (proximity to seed)
    assert min(got["a1"], got["a2"], got["a3"]) > max(got["b1"], got["b2"])
    # seed holds the most mass
    assert got["a1"] == max(got.values())

    # weights matter: boosting the bridge raises B's rank
    boosted = [(s, d, (5.0 if (s, d) == ("a3", "b1") else w)) for s, d, w in pairs]
    got2 = {
        r.node: r.rank
        for r in graph.personalized_pagerank(
            spark.createDataFrame(boosted, ["src", "dst", "w"]),
            "src", "dst", seeds, iterations=8, weight_col="w",
        ).collect()
    }
    assert got2["b1"] > got["b1"]


def test_personalized_pagerank_unweighted_equals_unit_weights(spark):
    pairs = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")]
    edges = spark.createDataFrame(pairs, ["src", "dst"])
    weighted = spark.createDataFrame(
        [(s, d, 1.0) for s, d in pairs], ["src", "dst", "w"]
    )
    seeds = spark.createDataFrame([("a",)], ["node"])
    r1 = sorted(
        (r.node, r.rank)
        for r in graph.personalized_pagerank(
            edges, "src", "dst", seeds, iterations=4
        ).collect()
    )
    r2 = sorted(
        (r.node, r.rank)
        for r in graph.personalized_pagerank(
            weighted, "src", "dst", seeds, iterations=4, weight_col="w"
        ).collect()
    )
    assert r1 == r2


def test_lpa_separates_disjoint_cliques(spark):
    """Two disjoint triangles must converge to two communities, each
    labeled by its smallest node id (deterministic tie-break)."""
    from etl_excel_csv_sql_spark.operators import graph

    tri1 = [("a", "b"), ("b", "c"), ("c", "a")]
    tri2 = [("x", "y"), ("y", "z"), ("z", "x")]
    edges = [(s, d) for s, d in tri1 + tri2] + [
        (d, s) for s, d in tri1 + tri2
    ]
    df = spark.createDataFrame(edges, "s string, d string")
    out = {
        r.node: r.community
        for r in graph.label_propagation(df, "s", "d", rounds=4).collect()
    }
    assert len({out["a"], out["b"], out["c"]}) == 1
    assert len({out["x"], out["y"], out["z"]}) == 1
    assert out["a"] != out["x"]


def test_lpa_isolated_node_keeps_own_label(spark):
    from etl_excel_csv_sql_spark.operators import graph

    # q has an out-edge but no in-edge: it keeps its own label forever.
    # (Sync LPA oscillates on bare 2-cycles — documented fixed-round
    # semantics, oracle-matched — so anchor the pair to a triangle.)
    tri = [("a", "b"), ("b", "c"), ("c", "a")]
    edges = tri + [(d, s) for s, d in tri] + [("q", "a")]
    df = spark.createDataFrame(edges, "s string, d string")
    out = {
        r.node: r.community
        for r in graph.label_propagation(df, "s", "d", rounds=4).collect()
    }
    assert out["q"] == "q"
    assert len({out["a"], out["b"], out["c"]}) == 1


# ------------------------------------------------------------- triangles


def test_triangle_stats_known_graph(spark):
    """K4 plus a pendant: K4 has 4 triangles; the pendant adds none.
    Wedges: deg(3,3,3,4... ) — compute explicitly."""
    from etl_excel_csv_sql_spark.operators import graph

    k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
          ("c", "d"), ("d", "e")]
    df = spark.createDataFrame(k4, "src string, dst string")
    r = graph.triangle_stats(df).collect()[0]
    assert r["n_nodes"] == 5 and r["n_edges"] == 7
    assert r["n_triangles"] == 4
    # degrees: a,b,c=3, d=4, e=1 -> wedges = 3*3 + 6 + 0 = 15
    assert r["wedges"] == 15
    assert r["clustering"] == pytest.approx(12 / 15)


def test_triangle_stats_triangle_free(spark):
    from etl_excel_csv_sql_spark.operators import graph

    star = [("c", f"x{i}") for i in range(5)]
    df = spark.createDataFrame(star, "src string, dst string")
    r = graph.triangle_stats(df).collect()[0]
    assert r["n_triangles"] == 0 and r["wedges"] == 10
    assert r["clustering"] == 0.0


def test_triangle_stats_ignores_duplicates_and_direction(spark):
    from etl_excel_csv_sql_spark.operators import graph

    df = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("b", "c"), ("c", "a"), ("a", "c"),
         ("a", "a")],
        "src string, dst string",
    )
    r = graph.triangle_stats(df).collect()[0]
    assert r["n_edges"] == 3 and r["n_triangles"] == 1


def test_personalized_pagerank_keeps_isolated_seeds(spark):
    """A seed with no edges must appear in the output and retain its
    teleport mass — previously it vanished while n_seeds counted it, so
    every rank deflated and total teleport mass leaked."""
    from pyspark.sql import functions as F

    from etl_excel_csv_sql_spark.operators import graph

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a")], ["src", "dst"]
    )
    seeds = spark.createDataFrame([("a",), ("zzz",)], ["node"])
    got = {
        r.node: r.rank
        for r in graph.personalized_pagerank(
            edges, "src", "dst", seeds, iterations=3, damping=0.85
        ).collect()
    }
    assert "zzz" in got and got["zzz"] > 0  # isolated seed kept
    # teleport shares used ns=2 AND the isolated seed holds its share
    assert abs(got["zzz"] - 0.15 * 0.5) < 1e-9


def test_bfs_distances_dedups_seeds(spark):
    from etl_excel_csv_sql_spark.operators import graph

    edges = spark.createDataFrame([("a", "b")], ["src", "dst"])
    seeds = spark.createDataFrame([("a",), ("a",)], ["node"])
    got = graph.bfs_distances(edges, "src", "dst", seeds, max_hops=2).collect()
    assert sorted((r.node, r.hops) for r in got) == [("a", 0), ("b", 1)]
