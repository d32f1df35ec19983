"""Similarity search: exact correctness vs numpy, IVF recall vs brute
force, and physical-plan assertions for the scale invariants."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from etl_excel_csv_sql_spark.operators import similarity


@pytest.fixture(scope="module")
def emb(spark):
    rng = random.Random(5)
    rows = [
        (i, [rng.gauss(0, 1) for _ in range(12)]) for i in range(200)
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"]), rows


def _queries(emb_df, n=3):
    return emb_df.filter(F.col("vec_id") < n).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


def _numpy_topk(rows, qid, k, exclude_self=True):
    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return dot / (na * nb)

    qvec = dict(rows)[qid]
    scored = [
        (cos(v, qvec), vid)
        for vid, v in rows
        if not (exclude_self and vid == qid)
    ]
    scored.sort(key=lambda t: (-t[0], t[1]))
    return [vid for _score, vid in scored[:k]]


def test_brute_force_matches_reference_impl(spark, emb):
    emb_df, rows = emb
    got = similarity.brute_force_topk(
        emb_df, _queries(emb_df), k=5, exclude_self=True
    ).collect()
    by_query = {}
    for r in sorted(got, key=lambda r: (r.query_id, r.rank)):
        by_query.setdefault(r.query_id, []).append(r.neighbor_id)
    for qid in range(3):
        assert by_query[qid] == _numpy_topk(rows, qid, 5)
    # ranks are 1..k dense per query
    assert sorted(r.rank for r in got if r.query_id == 0) == [1, 2, 3, 4, 5]


def test_ivf_recall_vs_brute_force(spark, emb):
    emb_df, _rows = emb
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.brute_force_topk(
            emb_df, _queries(emb_df), k=10
        ).collect()
    }

    def recall(kmeans_iters):
        approx = {
            (r.query_id, r.neighbor_id)
            for r in similarity.ivf_topk(
                emb_df, _queries(emb_df), k=10, n_cells=8, n_probe=4,
                kmeans_iters=kmeans_iters,
            ).collect()
        }
        return len(approx & exact) / len(exact)

    # probing half the cells must beat the random-scan floor even with raw
    # hash-sampled seeds; Lloyd refinement must not degrade it
    r_sampled = recall(0)
    r_kmeans = recall(2)
    assert r_sampled >= 0.5, f"sampled-seed IVF recall {r_sampled:.2f}"
    assert r_kmeans >= max(0.6, r_sampled - 0.05), (
        f"kmeans IVF recall {r_kmeans:.2f} vs sampled {r_sampled:.2f}"
    )


def test_ivf_mllib_engine_recall_ab(spark, emb):
    """engine='mllib' (pyspark.ml KMeans centroids behind the same
    (cell_id, centroid) contract) must at least match the hand-rolled
    Lloyd path's recall at equal n_cells/n_probe (VERDICT r5 #6)."""
    emb_df, _rows = emb
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.brute_force_topk(
            emb_df, _queries(emb_df), k=10
        ).collect()
    }

    def recall(engine):
        approx = {
            (r.query_id, r.neighbor_id)
            for r in similarity.ivf_topk(
                emb_df, _queries(emb_df), k=10, n_cells=8, n_probe=4,
                kmeans_iters=2, engine=engine,
            ).collect()
        }
        return len(approx & exact) / len(exact)

    r_lloyd = recall("lloyd")
    r_mllib = recall("mllib")
    assert r_mllib >= r_lloyd, (
        f"mllib IVF recall {r_mllib:.2f} < lloyd {r_lloyd:.2f}"
    )
    with pytest.raises(ValueError, match="engine"):
        similarity.kmeans_centroids(emb_df, engine="bogus")


def test_mllib_centroids_contract(spark, emb):
    """MLlib engine output: exactly n_cells rows of (int cell_id,
    array<double> centroid) with the corpus dimensionality."""
    emb_df, _rows = emb
    cents = similarity.kmeans_centroids(
        emb_df, n_cells=6, iters=2, engine="mllib"
    )
    rows = cents.collect()
    assert len(rows) == 6
    assert sorted(r.cell_id for r in rows) == list(range(6))
    assert all(len(r.centroid) == 12 for r in rows)
    assert dict(cents.dtypes)["centroid"] == "array<double>"


def test_no_window_operator_in_plans(spark, emb):
    """The scale invariant from VERDICT r1: ranking must not shuffle all
    scored rows into one task per query. Assert the physical plans contain
    no Window operator (the bounded top-k replaces it)."""
    emb_df, _rows = emb
    for df in (
        similarity.brute_force_topk(emb_df, _queries(emb_df), k=5),
        similarity.ivf_topk(emb_df, _queries(emb_df), k=5, n_cells=8, n_probe=2),
        similarity.ivf_assign(
            emb_df, similarity._centroids(emb_df, "vec_id", "embedding", 8)
        ),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan, f"Window operator in plan:\n{plan[:2000]}"


def test_ivf_assign_covers_corpus_without_shuffle(spark, emb):
    emb_df, _rows = emb
    cents = similarity._centroids(emb_df, "vec_id", "embedding", 8)
    assigned = similarity.ivf_assign(emb_df, cents)
    assert assigned.count() == 200                   # every vector assigned
    assert assigned.select("cell_id").distinct().count() > 1
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    # corpus side must not exchange: only the single-row packed centroid
    # build may shuffle
    assert plan.count("Exchange") <= 2  # centroid agg + its broadcast prep


def test_ivf_index_build_query_prunes_partitions(spark, emb, tmp_path):
    emb_df, _rows = emb
    idx = similarity.IvfIndex(str(tmp_path / "ivf"))
    idx.build(emb_df, n_cells=8, kmeans_iters=1)
    res = idx.query(_queries(emb_df), k=10, n_probe=4)
    plan = res._jdf.queryExecution().executedPlan().toString()
    # the probe filter must land on the partition column, not the data
    assert "PartitionFilters: [cell_id" in plan.replace("\n", " ") or \
           "PartitionFilters" in plan and "cell_id" in plan
    got = {(r.query_id, r.neighbor_id) for r in res.collect()}
    # persisted-index probes == in-memory ivf_topk with same parameters
    live = {
        (r.query_id, r.neighbor_id)
        for r in similarity.ivf_topk(
            emb_df, _queries(emb_df), k=10, n_cells=8, n_probe=4, kmeans_iters=1
        ).collect()
    }
    assert got == live
    assert "Window" not in plan


def test_quantization_report_quality_and_edges(spark):
    from pyspark.sql import functions as F

    from etl_excel_csv_sql_spark.functions.vectors import (
        quantization_scale,
        quantize_codes,
    )
    from etl_excel_csv_sql_spark.operators.similarity import quantization_report

    df = spark.createDataFrame(
        [
            (1, [0.5, -1.0, 0.25, 0.0]),
            (2, [0.001, 0.002, -0.003, 0.004]),
            (3, [0.0, 0.0, 0.0, 0.0]),  # zero vector: scale 0, codes 0
        ],
        ["vec_id", "embedding"],
    )
    staged = df.select(
        "vec_id",
        quantization_scale("embedding", 8).alias("scale"),
        F.col("embedding"),
    )
    codes = {
        r.vec_id: r.c
        for r in staged.select(
            "vec_id", quantize_codes("embedding", F.col("scale")).alias("c")
        ).collect()
    }
    assert all(-127 <= c <= 127 for cs in codes.values() for c in cs)
    assert codes[1][1] == -127  # the max-|x| component saturates exactly
    assert codes[3] == [0, 0, 0, 0]

    rep = {r.id: r for r in quantization_report(df, "vec_id", "embedding").collect()}
    assert rep[1].cos_recon > 0.9999 and rep[1].mse < 1e-4
    assert rep[3].scale == 0.0 and rep[3].cos_recon is None  # zero norm

    # fewer bits -> strictly worse reconstruction on a non-trivial vector
    rep4 = {
        r.id: r
        for r in quantization_report(df, "vec_id", "embedding", bits=4).collect()
    }
    assert rep4[2].mse >= rep[2].mse


def test_ivf_provided_centroids_planted_geometry(spark, tmp_path):
    """The ann_ivf_persisted_topk oracle's safety pin (r12): on the
    planted one-hot cluster corpus with bring-your-own centroids,
    (a) the persisted IVF result equals exact brute force, and (b) both
    equal the closed-form literal the SQL oracle renders (neighbors
    q + 16j at cosine exactly 1.0, rank = j + 1)."""
    ids = spark.range(0, 320).withColumnRenamed("id", "vec_id")
    corpus = similarity.synth_cluster_embeddings(ids)
    idx = similarity.IvfIndex(str(tmp_path / "ivf_planted"))
    idx.build(
        corpus,
        n_cells=16,
        skip_if_exists=True,
        centroids=similarity.synth_cluster_centroids(spark),
    )
    queries = corpus.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    got = {
        (r.query_id, r.neighbor_id, r.cosine, r.rank)
        for r in idx.query(queries, k=10, n_probe=4).collect()
    }
    brute = {
        (r.query_id, r.neighbor_id, r.cosine, r.rank)
        for r in similarity.brute_force_topk(corpus, queries, k=10).collect()
    }
    literal = {
        (q, q + 16 * j, 1.0, j + 1) for q in range(5) for j in range(10)
    }
    assert got == brute == literal
    # changed centroid table voids build-once reuse
    import os

    mtime = os.path.getmtime(idx._manifest)
    idx.build(
        corpus,
        n_cells=16,
        skip_if_exists=True,
        centroids=similarity.synth_cluster_centroids(spark),
    )
    assert os.path.getmtime(idx._manifest) == mtime  # same centroids: reuse
    shifted = similarity.synth_cluster_centroids(spark).withColumn(
        "cell_id", F.col("cell_id") + 100
    )
    idx.build(
        corpus, n_cells=16, skip_if_exists=True, centroids=shifted
    )
    assert os.path.getmtime(idx._manifest) > mtime  # changed: rebuild


def test_ivf_skip_if_exists_fingerprints_corpus(spark, emb, tmp_path):
    """r4 ADVICE: build-once reuse must revalidate the corpus + params —
    a regenerated corpus or changed n_cells rebuilds; identical inputs
    skip."""
    import os

    emb_df, _rows = emb
    idx = similarity.IvfIndex(str(tmp_path / "ivf_fp"))
    idx.build(emb_df, n_cells=8, kmeans_iters=1)
    assert idx.is_built()
    mtime = os.path.getmtime(idx._manifest)

    # identical corpus + params → reuse (manifest untouched)
    idx.build(emb_df, n_cells=8, kmeans_iters=1, skip_if_exists=True)
    assert os.path.getmtime(idx._manifest) == mtime

    # changed build params → rebuild even with skip_if_exists
    idx.build(emb_df, n_cells=4, kmeans_iters=1, skip_if_exists=True)
    assert os.path.getmtime(idx._manifest) > mtime

    # changed corpus content → rebuild
    mtime = os.path.getmtime(idx._manifest)
    smaller = emb_df.filter(F.col("vec_id") < 100)
    idx.build(smaller, n_cells=4, kmeans_iters=1, skip_if_exists=True)
    assert os.path.getmtime(idx._manifest) > mtime


def test_label_cohesion_known_geometry(spark):
    """Label 10: {(1,0), (0,1)} → centroid (.5,.5), norm √.5, each member
    at cos 1/√2 to it. Label 20: {(2,0), (-2,0)} → members cancel, zero
    centroid, cosine undefined (null), but both vectors still counted."""
    df = spark.createDataFrame(
        [
            (1, 10, [1.0, 0.0]),
            (2, 10, [0.0, 1.0]),
            (3, 20, [2.0, 0.0]),
            (4, 20, [-2.0, 0.0]),
        ],
        ["vec_id", "label", "embedding"],
    )
    got = {
        r.label: r
        for r in similarity.label_cohesion_report(df).collect()
    }
    inv_sqrt2 = round(1 / math.sqrt(2), 6)
    assert got[10].n_vectors == 2
    assert got[10].centroid_norm == inv_sqrt2
    assert got[10].mean_cos_to_centroid == inv_sqrt2
    assert got[20].n_vectors == 2
    assert got[20].centroid_norm == 0.0
    assert got[20].mean_cos_to_centroid is None


def test_label_cohesion_broadcasts_centroids(spark):
    """The corpus-side cosine must come from a broadcast join — a second
    corpus shuffle would defeat the one-shuffle design."""
    df = spark.createDataFrame(
        [(i, i % 3, [float(i), 1.0]) for i in range(50)],
        ["vec_id", "label", "embedding"],
    )
    plan = (
        similarity.label_cohesion_report(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_label_cohesion_shuffle_fallback_same_result(spark):
    """broadcast_centroids=False (the high-label-cardinality path,
    ADVICE r5 #4) must produce identical numbers to the broadcast path."""
    df = spark.createDataFrame(
        [(i, i % 5, [float(i % 7) - 3.0, 1.0, float(i % 3)]) for i in range(60)],
        ["vec_id", "label", "embedding"],
    )
    rows_bc = sorted(
        map(tuple, similarity.label_cohesion_report(df).collect())
    )
    rows_sh = sorted(
        map(
            tuple,
            similarity.label_cohesion_report(
                df, broadcast_centroids=False
            ).collect(),
        )
    )
    assert rows_bc == rows_sh


def test_pq_codebook_contract(spark, emb):
    emb_df, _rows = emb
    cb = similarity.pq_train(emb_df, n_subspaces=4, n_codes=8, iters=2)
    rows = cb.collect()
    # dense codes per subspace, full geometry, right sub-dimension
    assert len(rows) == 4 * 8
    by_m = {}
    for r in rows:
        by_m.setdefault(r.m, []).append(r)
        assert len(r.centroid) == 12 // 4
    for m, rs in by_m.items():
        assert sorted(r.code for r in rs) == list(range(8))


def test_pq_train_rejects_bad_geometry(spark, emb):
    emb_df, _rows = emb
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not divisible"):
        similarity.pq_train(emb_df, n_subspaces=5, n_codes=8, iters=0)


def test_pq_encode_shape_and_no_corpus_shuffle(spark, emb):
    emb_df, _rows = emb
    cb = similarity.pq_train(emb_df, n_subspaces=4, n_codes=8, iters=1)
    enc = similarity.pq_encode(emb_df, cb)
    got = enc.collect()
    assert len(got) == emb_df.count()
    for r in got:
        assert len(r.codes) == 4
        assert all(0 <= c < 8 for c in r.codes)
    # encode is a pure narrow map over the corpus: the only Exchanges in
    # the plan belong to the broadcast codebook pack
    plan = enc._jdf.queryExecution().executedPlan().toString()
    probe_side = plan.split("BroadcastExchange")[0]
    assert "Exchange" not in probe_side, plan


def test_pq_provided_codebook_planted_geometry(spark):
    """The ann_pq_topk oracle's safety pin (r12): on the planted one-hot
    corpus with the closed-form bring-your-own codebook, (a) encode is
    EXACT (vector of class c carries code 1 + c%4 in subspace c//4 and
    the zero code everywhere else), and (b) both ADC-only and reranked
    pq_search equal exact brute force equal the literal the SQL oracle
    renders (neighbors q + 16j at cosine exactly 1.0, rank = j + 1)."""
    ids = spark.range(0, 320).withColumnRenamed("id", "vec_id")
    corpus = similarity.synth_cluster_embeddings(ids)
    book = similarity.synth_pq_codebook(spark)
    codes = {
        r["id"]: list(r["codes"])
        for r in similarity.pq_encode(corpus, book).collect()
    }
    assert len(codes) == 320
    for vid, cs in codes.items():
        c = vid % 16
        expect = [0] * 16
        expect[c // 4] = 1 + (c % 4)
        assert cs == expect, (vid, cs)
    queries = corpus.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    literal = {
        (q, q + 16 * j, 1.0, j + 1) for q in range(5) for j in range(10)
    }
    brute = {
        (r.query_id, r.neighbor_id, r.cosine, r.rank)
        for r in similarity.brute_force_topk(corpus, queries, k=10).collect()
    }
    adc_only = {
        (r.query_id, r.neighbor_id, r.approx_cosine, r.rank)
        for r in similarity.pq_search(
            corpus, queries, k=10, codebook=book
        ).collect()
    }
    reranked = {
        (r.query_id, r.neighbor_id, r.approx_cosine, r.rank)
        for r in similarity.pq_search(
            corpus, queries, k=10, rerank_factor=4, codebook=book
        ).collect()
    }
    assert adc_only == reranked == brute == literal


def test_pq_recall_and_rerank(spark, emb):
    emb_df, rows = emb
    queries = _queries(emb_df, 3)
    bf = {
        (r.query_id, r.neighbor_id)
        for r in similarity.brute_force_topk(emb_df, queries, k=10).collect()
    }
    adc = similarity.pq_search(
        emb_df, queries, k=10, n_subspaces=4, n_codes=32, iters=3
    ).collect()
    adc_set = {(r.query_id, r.neighbor_id) for r in adc}
    adc_recall = len(bf & adc_set) / len(bf)
    # measured 0.70 on this fixture; leave margin for HOF eval-order churn
    assert adc_recall >= 0.5
    # every query finds itself first even unreranked (self reconstruction
    # dominates on random data)
    assert all(
        r.query_id == r.neighbor_id for r in adc if r.rank == 1
    )
    rer = similarity.pq_search(
        emb_df, queries, k=10, n_subspaces=4, n_codes=32, iters=3,
        rerank_factor=4,
    ).collect()
    rer_set = {(r.query_id, r.neighbor_id) for r in rer}
    rer_recall = len(bf & rer_set) / len(bf)
    assert rer_recall >= max(0.9, adc_recall)  # measured 1.00
    # reranked scores are exact cosine: cross-check one against python
    by_q = {}
    for r in rer:
        by_q.setdefault(r.query_id, []).append(r)
    import math as _math

    vecs = dict(rows)
    for qid, rs in by_q.items():
        top = min(rs, key=lambda r: r.rank)
        a, b = vecs[qid], vecs[top.neighbor_id]
        dot = sum(x * y for x, y in zip(a, b))
        na = _math.sqrt(sum(x * x for x in a))
        nb = _math.sqrt(sum(x * x for x in b))
        assert abs(top.approx_cosine - dot / (na * nb)) < 1e-5


# ---------------------------------------------------------------------------
# distributed PCA (late r6)
# ---------------------------------------------------------------------------

def test_pca_matches_numpy_reference(spark, sf_dir):
    import numpy as np

    from etl_excel_csv_sql_spark.catalog import load_table
    from etl_excel_csv_sql_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    mean, comps, ratios = similarity.pca_analysis(emb, "embedding", k=5)

    x = np.stack(
        [np.array(r["embedding"], dtype=np.float64) for r in emb.collect()]
    )
    np_mean = x.mean(axis=0)
    cov = np.cov(x, rowvar=False, bias=True)
    evals = np.sort(np.linalg.eigvalsh(cov))[::-1]
    np_ratios = evals[:5] / evals.sum()

    assert np.allclose(mean, np_mean, atol=1e-8)
    assert np.allclose(ratios, np_ratios, atol=1e-6)
    # components orthonormal
    assert np.allclose(comps @ comps.T, np.eye(5), atol=1e-8)


def test_pca_partials_invariant_to_partitioning(spark, sf_dir):
    import numpy as np

    from etl_excel_csv_sql_spark.catalog import load_table
    from etl_excel_csv_sql_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    _, _, r1 = similarity.pca_analysis(emb, "embedding", k=4)
    _, _, r2 = similarity.pca_analysis(emb.repartition(7), "embedding", k=4)
    assert np.allclose(r1, r2, atol=1e-9)


def test_pca_projection_variance_decreases(spark, sf_dir):
    import numpy as np

    from etl_excel_csv_sql_spark.catalog import load_table
    from etl_excel_csv_sql_spark.operators import similarity
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    mean, comps, ratios = similarity.pca_analysis(emb, "embedding", k=3)
    proj = similarity.pca_project(emb, mean, comps)
    vals = np.stack(
        [np.array(r["pca"]) for r in proj.select("pca").collect()]
    )
    variances = vals.var(axis=0)
    # per-axis projected variance must rank like the eigenvalues
    assert variances[0] >= variances[1] >= variances[2]
    # and projections are centered
    assert np.allclose(vals.mean(axis=0), 0, atol=1e-8)


def test_drift_report_identical_corpora(spark, sf_dir):
    from etl_excel_csv_sql_spark.catalog import load_table
    from etl_excel_csv_sql_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    r = similarity.embedding_drift_report(emb, emb).first()
    assert r["mean_cosine"] == 1.0
    assert r["mean_l2_shift"] == 0.0
    assert r["mean_norm_ratio"] == 1.0


def test_drift_report_detects_planted_shift(spark, sf_dir):
    from pyspark.sql import functions as F

    from etl_excel_csv_sql_spark.catalog import load_table
    from etl_excel_csv_sql_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    # shift every dim by +1: the mean moves, cosine of means drops off 1
    shifted = emb.withColumn(
        "embedding",
        F.transform(F.col("embedding"), lambda v: v + F.lit(1.0)),
    )
    r = similarity.embedding_drift_report(emb, shifted).first()
    assert r["mean_l2_shift"] > 5.0  # sqrt(64) * 1 = 8 minus base means
    assert r["mean_cosine"] < 0.99


def test_standardize_embeddings_zscores(spark):
    from etl_excel_csv_sql_spark.operators import similarity

    rows = [(i, [float(i), 10.0, 5.0 + (i % 2)]) for i in range(8)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = similarity.standardize_embeddings(df, "embedding", dim=3)
    import numpy as np

    mat = np.array(
        [r.embedding_std for r in out.orderBy("vec_id").collect()]
    )
    # standardized dims: mean ~0, std ~1
    assert abs(mat[:, 0].mean()) < 1e-9 and abs(mat[:, 0].std() - 1) < 1e-9
    assert abs(mat[:, 2].mean()) < 1e-9 and abs(mat[:, 2].std() - 1) < 1e-9
    # zero-variance dim maps to 0, not NaN/inf
    assert (mat[:, 1] == 0).all()


def test_embedding_dim_stats_matches_numpy(spark, sf_dir):
    from etl_excel_csv_sql_spark.operators import similarity
    import numpy as np

    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    mat = np.array([r.embedding for r in df.collect()], dtype=np.float64)
    got = {
        r.dim: r
        for r in similarity.embedding_dim_stats(df, "embedding", dim=64).collect()
    }
    assert len(got) == 64
    for d in (0, 7, 63):
        assert got[d].mean == round(float(mat[:, d].mean()), 6)
        assert abs(got[d].std - float(mat[:, d].std())) < 2e-6
        assert got[d].min_val == float(mat[:, d].min())
        assert got[d].max_val == float(mat[:, d].max())


def test_dim_stats_constant_dim_yields_zero_std_not_nan(spark):
    """ADVICE r6: FP cancellation can push E[x²]−E[x]² epsilon-negative
    for (near-)constant dims — the clamp keeps std at 0.0, never NaN."""
    import math

    from etl_excel_csv_sql_spark.operators import similarity

    # a constant dim whose value is irrational in binary (maximal
    # cancellation exposure) plus a normal dim
    rows = [(i, [0.1 + 0.2, float(i)]) for i in range(1000)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r.dim: r for r in similarity.embedding_dim_stats(df).collect()}
    assert got[0].std == 0.0 and not math.isnan(got[0].std)
    assert got[1].std > 0.0

    std = similarity.standardize_embeddings(df).collect()
    assert all(not math.isnan(r.embedding_std[0]) for r in std)
    assert all(r.embedding_std[0] == 0.0 for r in std)


def test_infer_dim_raises_on_empty_or_all_null(spark):
    import pytest

    from etl_excel_csv_sql_spark.operators import similarity

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="cannot infer"):
        similarity.embedding_dim_stats(empty)
    nulls = spark.createDataFrame(
        [(1, None)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="cannot infer"):
        similarity.standardize_embeddings(nulls)


def test_semantic_dedup_recalls_injected_copies(spark, sf_dir):
    """SemDeDup: exact copies of corpus vectors (cosine 1.0) must all be
    caught — one survivor per copy-pair — while the keep rule never
    drops more than it marks."""
    from etl_excel_csv_sql_spark.catalog import load_table
    from etl_excel_csv_sql_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    copies = emb.filter(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding", "label"
    )
    corpus = emb.unionByName(copies)
    rep = similarity.semantic_dedup(corpus, threshold=0.999, n_cells=4)
    rows = {r.id: r for r in rep.collect()}
    assert len(rows) == corpus.count()
    # each injected copy-pair: exactly one member dropped, dup_of points
    # at the other member (both land in the same cell: identical vectors
    # share a nearest centroid)
    for vid in range(20):
        pair = [rows[vid], rows[vid + 1_000_000]]
        dropped = [r for r in pair if not r.keep]
        kept = [r for r in pair if r.keep]
        assert len(dropped) == 1 and len(kept) == 1, vid
        assert dropped[0].max_dup_cosine >= 0.999
        # the culprit is its twin unless a third identical vector exists
        assert dropped[0].dup_of is not None
    # untouched vectors far from any copy survive
    n_dropped = sum(1 for r in rows.values() if not r.keep)
    assert n_dropped <= 25  # the 20 copies + at most a few natural dups


def test_semantic_dedup_keeps_highest_centroid_rank(spark):
    """Deterministic keep rule: within a near-dup clique the highest
    centroid-similarity member survives; chain cliques keep >=1."""
    from etl_excel_csv_sql_spark.operators import similarity

    base = [1.0, 0.0, 0.0, 0.0]
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0], "a"),
        (2, [0.999, 0.001, 0.0, 0.0], "a"),
        (3, [0.998, 0.002, 0.0, 0.0], "a"),
        (10, [0.0, 1.0, 0.0, 0.0], "b"),
        (11, [0.0, 0.0, 1.0, 0.0], "c"),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    )
    rep = {
        r.id: r
        for r in similarity.semantic_dedup(
            df, threshold=0.999, n_cells=3, iters=2
        ).collect()
    }
    clique = [rep[1], rep[2], rep[3]]
    assert sum(1 for r in clique if r.keep) >= 1
    assert any(not r.keep for r in clique)  # 1-2 and 2-3 are >=0.999
    assert rep[10].keep and rep[11].keep  # orthogonal vectors untouched


def test_semantic_dedup_oversize_validated_without_max_cell(spark):
    """ADVICE r9: oversize is validated at entry, independent of
    max_cell — a typo'd 'splitt' with the default max_cell=None used to
    be silently ignored (caller believed skew-splitting was active)."""
    import pytest

    from etl_excel_csv_sql_spark.operators import similarity

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="oversize"):
        similarity.semantic_dedup(df, oversize="splitt")
    with pytest.raises(ValueError, match="oversize"):
        similarity.semantic_dedup(df, max_cell=10, oversize="splitt")


def test_semantic_dedup_split_bounds_hot_cell(spark):
    """oversize='split' (VERDICT r8 #4): a 90%-hot-direction corpus
    collapses into one k-means cell; the split guard must (a) bound
    every final cell near max_cell so the pair join stays Σ|cell|², (b)
    keep FULL coverage (every row classified — nothing dropped like
    oversize='drop' would), and (c) still catch planted exact copies
    that land in the same subcell."""
    import math
    import random

    from etl_excel_csv_sql_spark.operators import similarity

    rng = random.Random(7)
    rows = []
    for i in range(900):  # hot mass: one direction + small jitter
        v = [1.0 + rng.uniform(-0.01, 0.01), rng.uniform(-0.01, 0.01),
             rng.uniform(-0.01, 0.01), rng.uniform(-0.01, 0.01)]
        rows.append((i, v, "hot"))
    for i in range(900, 1000):  # cold tail: scattered
        v = [rng.uniform(-1, 1) for _ in range(4)]
        rows.append((i, v, "cold"))
    # planted exact copies inside the hot mass
    for i in range(5):
        rows.append((10_000 + i, list(rows[i][1]), "copy"))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    )
    rep = similarity.semantic_dedup(
        df, threshold=0.9999, n_cells=4, max_cell=200, oversize="split"
    )
    out = rep.collect()
    assert len(out) == len(rows)  # full coverage: no dropped cells
    by_cell: dict[int, int] = {}
    for r in out:
        by_cell[r.cell_id] = by_cell.get(r.cell_id, 0) + 1
    # k-means sub-split is not perfectly balanced; salt fallback bounds
    # the rest — allow slack but the 900-row whale must be gone
    assert max(by_cell.values()) <= 400, sorted(by_cell.values())[-5:]
    # exact copies: identical vectors share every centroid distance and
    # salt on id only when degenerate — when co-located they dedup
    rows_by_id = {r.id: r for r in out}
    caught = sum(
        1
        for i in range(5)
        if not rows_by_id[10_000 + i].keep or not rows_by_id[i].keep
    )
    assert caught >= 3  # most copy pairs stay co-located through splits


def test_semantic_dedup_split_with_realistic_large_ids(spark):
    """k-means cell ids are sampled corpus VECTOR ids, so the split-id
    scheme must survive realistic id magnitudes (snowflake/db ids far
    above 100k). The old fixed-offset scheme ((cid+1)·100_000 + sub·1_000)
    misclassified intact large-id cells as split cells — duplicating
    every row of those cells through a second centroid join — and
    collided sub bases across cells. Split ids now descend strictly
    below min(existing ids), provably disjoint."""
    import random

    from etl_excel_csv_sql_spark.operators import similarity

    rng = random.Random(11)
    rows = []
    base_id = 9_120_003_447  # realistic 64-bit id territory
    for i in range(500):  # hot mass -> oversized cell -> split path
        v = [1.0 + rng.uniform(-0.01, 0.01), rng.uniform(-0.01, 0.01),
             rng.uniform(-0.01, 0.01)]
        rows.append((base_id + i, v))
    for i in range(500, 600):  # cold scattered tail -> intact cells
        rows.append((base_id + i, [rng.uniform(-1, 1) for _ in range(3)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = similarity.semantic_dedup(
        df, threshold=0.9999, n_cells=4, max_cell=100, oversize="split"
    ).collect()
    # exactly one output row per input row: no duplicated intact cells,
    # no dropped rows
    assert len(out) == len(rows)
    assert len({r.id for r in out}) == len(rows)
    # the hot mass actually split (bound holds)
    counts: dict[int, int] = {}
    for r in out:
        counts[r.cell_id] = counts.get(r.cell_id, 0) + 1
    assert max(counts.values()) <= 200, sorted(counts.values())[-3:]


def test_ivf_index_upsert_incremental(spark, sf_dir, tmp_path):
    """Incremental IVF maintenance: replaced ids disappear from their
    old cell, new vectors are probeable, and UNTOUCHED partition files
    are not rewritten (the whole point at 100 TB)."""
    import glob
    import os
    import time

    from etl_excel_csv_sql_spark.catalog import load_table
    from etl_excel_csv_sql_spark.operators.similarity import IvfIndex

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") < 400)
    idx = IvfIndex(str(tmp_path / "ivf"))
    idx.build(base, n_cells=8, kmeans_iters=2)
    n_base = base.count()

    before = {
        p: os.path.getmtime(p)
        for p in glob.glob(str(tmp_path / "ivf" / "vectors" / "cell_id=*/*.parquet"))
    }
    time.sleep(1.1)  # mtime resolution guard

    # incoming: 50 brand-new ids + 10 REPLACED ids whose vector moved to
    # a (likely) different cell — steal another corpus vector's embedding
    newbies = emb.filter(
        (F.col("vec_id") >= 400) & (F.col("vec_id") < 450)
    ).select("vec_id", "embedding")
    moved = (
        emb.filter(F.col("vec_id") >= 450)
        .limit(10)
        .select(F.lit(None).alias("drop"), "embedding")
        .drop("drop")
        .limit(10)
    )
    import pandas as pd  # build the replacement frame deterministically

    moved_vecs = [r.embedding for r in moved.collect()]
    replaced = spark.createDataFrame(
        [(i, moved_vecs[i]) for i in range(10)],
        "vec_id long, embedding array<float>",
    )
    incoming = newbies.unionByName(replaced)
    report = idx.upsert(incoming)
    assert report["rows_written"] > 0

    stored = spark.read.parquet(str(tmp_path / "ivf" / "vectors"))
    # row count: base − 10 replaced + 10 replacements + 50 new
    assert stored.count() == n_base + 50
    # each replaced id appears exactly once, with the NEW vector
    for i in (0, 5, 9):
        rows = stored.filter(F.col("vec_id") == i).collect()
        assert len(rows) == 1
        assert [round(float(x), 5) for x in rows[0].embedding] == [
            round(float(x), 5) for x in moved_vecs[i]
        ]
    # untouched partitions were NOT rewritten
    after = {
        p: os.path.getmtime(p)
        for p in glob.glob(str(tmp_path / "ivf" / "vectors" / "cell_id=*/*.parquet"))
    }
    untouched = [p for p in before if p in after and before[p] == after[p]]
    rewritten_cells = report["cells_rewritten"]
    total_cells = len(
        glob.glob(str(tmp_path / "ivf" / "vectors" / "cell_id=*"))
    )
    assert rewritten_cells <= total_cells
    if rewritten_cells < total_cells:
        assert untouched, "expected at least one untouched partition file"

    # a new vector is probeable as its own exact neighbor
    probe = spark.createDataFrame(
        [(9001, moved_vecs[0])], "query_id long, query_vec array<float>"
    )
    res = idx.query(probe, k=3, n_probe=8).collect()
    assert res and res[0].cosine > 0.9999


def test_quantization_report_known_values(spark):
    from etl_excel_csv_sql_spark.operators import similarity

    # dim0 spans [0, 255] -> scale 1.0, integers reconstruct exactly;
    # dim1 constant -> scale 0, zero error
    rows = [([float(i), 5.0],) for i in range(256)]
    df = spark.createDataFrame(rows, "embedding array<float>")
    out = {
        r["dim"]: r
        for r in similarity.quantize_embeddings_report(
            df, dim=2, levels=256
        ).collect()
    }
    assert out[0]["scale"] == pytest.approx(1.0)
    assert out[0]["mse"] == pytest.approx(0.0, abs=1e-12)
    assert out[0]["max_abs_err"] == pytest.approx(0.0, abs=1e-12)
    assert out[1]["scale"] == 0.0
    assert out[1]["mse"] == 0.0 and out[1]["min_val"] == 5.0


def test_quantization_error_bounded_by_half_scale(spark, sf_dir):
    from etl_excel_csv_sql_spark.catalog import load_table
    from etl_excel_csv_sql_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    out = similarity.quantize_embeddings_report(emb, dim=64).collect()
    assert len(out) == 64
    for r in out:
        # affine quantization error can never exceed half a step
        assert r["max_abs_err"] <= r["scale"] / 2 + 1e-12


def test_ivf_upsert_emptied_cell_leaves_no_stale_rows(spark, tmp_path):
    """Dynamic partition overwrite only rewrites partitions present in
    the written data — a cell whose EVERY row was replaced-and-moved
    must have its directory dropped explicitly, or the stale copies
    survive and replaced ids exist twice in the index."""
    import numpy as np

    from etl_excel_csv_sql_spark.operators.similarity import IvfIndex

    rng = np.random.default_rng(5)
    rows = []
    # three orthogonal clusters so the index spreads over >= 2 cells
    for i in range(30):
        base = [0.0, 0.0, 0.0, 0.0]
        base[i % 3] = 1.0
        jitter = (rng.random(4) * 0.01).tolist()
        rows.append((i, [float(b + j) for b, j in zip(base, jitter)]))
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    idx = IvfIndex(str(tmp_path / "ivf_empty"))
    idx.build(corpus, n_cells=4, kmeans_iters=3)
    stored_before = spark.read.parquet(str(tmp_path / "ivf_empty" / "vectors"))
    cells_before = stored_before.select("cell_id").distinct().count()
    assert cells_before >= 2, "fixture must spread over several cells"

    # replace EVERY id with a vector in one tight direction -> all rows
    # land in a single cell, so every other previously-occupied cell
    # is emptied
    moved = [
        (i, [1.0, 1.0, 1.0, float(1.0 + 0.001 * i)]) for i in range(30)
    ]
    idx.upsert(
        spark.createDataFrame(moved, "vec_id long, embedding array<float>")
    )
    stored = spark.read.parquet(str(tmp_path / "ivf_empty" / "vectors"))
    assert stored.count() == 30  # no stale duplicates from emptied cells
    assert stored.select("vec_id").distinct().count() == 30
    # every stored vector is the NEW one (first component 1.0, not ~0/1 basis)
    mins = stored.select(F.min(F.element_at("embedding", 1))).collect()[0][0]
    assert mins is not None and float(mins) > 0.9


def test_pca_tolerates_null_embeddings(spark):
    """pca_analysis must skip null vectors like its sibling operators
    (np.stack on a batch containing None killed the whole job)."""
    import numpy as np

    from etl_excel_csv_sql_spark.operators import similarity

    rng = np.random.default_rng(3)
    rows = [(i, rng.random(4).tolist()) for i in range(40)]
    rows.append((998, None))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    mean, comps, ratios = similarity.pca_analysis(df, k=2)
    assert mean.shape == (4,) and comps.shape == (2, 4)
    assert np.isfinite(mean).all() and np.isfinite(comps).all()


def test_kmeans_mllib_cosine_and_null_tolerance(spark):
    """engine='mllib' must cluster by the same metric downstream
    assignment uses (cosine, not Euclidean magnitude) and tolerate
    null/zero vectors like the lloyd engine."""
    from etl_excel_csv_sql_spark.operators import similarity

    rows = []
    # two DIRECTIONS with wildly different magnitudes per member:
    # Euclidean k-means would split by magnitude, cosine by angle
    for i in range(20):
        scale = 0.1 if i % 2 == 0 else 100.0
        rows.append((i, [scale, 0.0]))
        rows.append((100 + i, [0.0, scale]))
    rows.append((998, None))
    rows.append((999, [0.0, 0.0]))  # zero norm: undefined cosine
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = similarity.kmeans_centroids(df, n_cells=2, iters=5, engine="mllib")
    got = {
        tuple(1 if abs(x) > 1e-9 else 0 for x in r.centroid)
        for r in cents.collect()
    }
    # one center per DIRECTION — magnitude did not drive the split
    assert got == {(1, 0), (0, 1)}, got


def test_pca_planted_spectrum_literal(spark):
    """Safety pin for the embedding_pca_variance oracle (r12): on the
    equal-mass planted one-hot corpus (320 = 16*20 ids), the covariance
    spectrum is closed-form — 15 equal eigenvalues of ratio exactly
    1/15 — and the report rows equal the oracle literal (0.066667,
    cumulative i/15) after the 6-decimal rounding."""
    ids = spark.range(0, 320).withColumnRenamed("id", "vec_id")
    corpus = similarity.synth_cluster_embeddings(ids)
    _, _, ratios = similarity.pca_analysis(corpus, "embedding", k=8)
    for r in ratios:
        assert abs(float(r) - 1.0 / 15.0) < 1e-9, ratios
    rows = similarity.pca_variance_report(corpus, "embedding", k=8).collect()
    got = [
        (r["component"], r["explained_variance_ratio"], r["cumulative_ratio"])
        for r in sorted(rows, key=lambda r: r["component"])
    ]
    want = [(i, 0.066667, round(i / 15.0, 6)) for i in range(1, 9)]
    assert got == want


def test_semantic_dedup_provided_centroids_planted(spark):
    """Safety pin for the semantic_dedup_report oracle (r12): on the
    planted one-hot corpus with bring-your-own centroids, every cell is
    one class of identical vectors, so exactly the class-minimum id
    survives and every other row drops with dup_of = the class min at
    max_dup_cosine exactly 1.0 — the closed form the SQL oracle
    renders. max_cell/oversize stay in the plan but never trigger."""
    ids = spark.range(0, 320).withColumnRenamed("id", "vec_id")
    corpus = similarity.synth_cluster_embeddings(ids)
    rows = similarity.semantic_dedup(
        corpus,
        threshold=0.93,
        max_cell=250,
        oversize="split",
        centroids=similarity.synth_cluster_centroids(spark),
    ).collect()
    assert len(rows) == 320
    for r in rows:
        assert r["cell_id"] == r["id"] % 16
        if r["id"] < 16:
            assert r["keep"] and r["dup_of"] is None
            assert r["max_dup_cosine"] is None
        else:
            assert not r["keep"]
            assert r["dup_of"] == r["id"] % 16
            assert r["max_dup_cosine"] == 1.0
