"""Similarity search over embedding columns (array<float>).

Two paths:
- brute_force_topk: exact cosine top-k. For a small query set this is a
  broadcast of the queries against a single streaming pass over the corpus
  — the right plan even at 100 TB when |queries| is small (the corpus never
  shuffles; per-executor partial top-k heaps merge at the end via
  TakeOrderedAndProject / window-per-query).
- ivf_topk: IVF-style approximate search — k-means-lite centroids assign
  each vector to a cell (narrow map); queries probe only the closest
  ``n_probe`` cells, cutting scanned rows by |cells|/n_probe. Centroids are
  sampled deterministically and broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_excel_csv_sql_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    exclude_self: bool = False,
) -> DataFrame:
    """Exact top-k neighbors per query by cosine.

    queries (small) is broadcast; corpus streams through map-side — the
    cross join never shuffles the corpus. Ranking uses row_number with a
    (cosine desc, id asc) total order so results are deterministic.
    ``exclude_self`` drops neighbor_id == query_id rows before ranking
    (for queries drawn from the corpus itself).
    Output: (query_id, neighbor_id, cosine, rank).
    """
    sim = cosine_similarity(F.col(vec_col), F.col(query_vec_col))
    scored = corpus.crossJoin(F.broadcast(queries)).select(
        F.col(query_id_col).alias("query_id"),
        F.col(id_col).alias("neighbor_id"),
        sim.alias("cosine"),
    )
    if exclude_self:
        scored = scored.filter(F.col("neighbor_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _centroids(corpus: DataFrame, id_col: str, vec_col: str, n_cells: int) -> DataFrame:
    """Deterministic centroid sample: the n_cells corpus vectors with the
    smallest xxhash64(id) — a seedable stand-in for k-means iterations
    (plug real KMeans in when MLlib is permitted; the plan shape — small
    broadcast table of (cell_id, centroid) — is identical)."""
    return (
        corpus.select(
            F.col(id_col).alias("cid"), F.col(vec_col).alias("centroid"),
            F.xxhash64(F.col(id_col)).alias("h"),
        )
        .orderBy("h", "cid")
        .limit(n_cells)
        .select(
            (F.row_number().over(Window.orderBy("h", "cid")) - 1).alias("cell_id"),
            "centroid",
        )
    )


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each corpus vector to its nearest centroid cell (narrow map
    over a broadcast centroid table). Output adds ``cell_id``. Persisting
    this result partitioned by cell_id turns every later probe into a
    partition-pruned scan."""
    scored = corpus.crossJoin(F.broadcast(centroids)).select(
        F.col(id_col),
        F.col(vec_col),
        F.col("cell_id"),
        cosine_similarity(F.col(vec_col), F.col("centroid")).alias("csim"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("csim").desc(), F.col("cell_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, vec_col, "cell_id")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """IVF approximate top-k: probe only the ``n_probe`` cells whose
    centroids are closest to the query. Scanned fraction ≈ n_probe/n_cells;
    recall grows with n_probe. Same output schema as brute_force_topk."""
    cents = _centroids(corpus, id_col, vec_col, n_cells)
    assigned = ivf_assign(corpus, cents, id_col, vec_col)

    qcells = queries.crossJoin(F.broadcast(cents)).select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).alias("query_vec"),
        F.col("cell_id"),
        cosine_similarity(F.col(query_vec_col), F.col("centroid")).alias("csim"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("csim").desc(), F.col("cell_id"))
    probes = (
        qcells.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "query_vec", "cell_id")
    )

    sim = cosine_similarity(F.col(vec_col), F.col("query_vec"))
    scored = assigned.join(F.broadcast(probes), "cell_id").select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        sim.alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
