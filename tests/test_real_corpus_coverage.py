"""Real-corpus coverage for the r12 planted-fixture conversions
(ADVICE r12, low): the driver oracles for minhash/simhash/PQ/PCA/
semantic-dedup/BPE now run on SYNTHETIC closed-form fixtures, so this
battery re-exercises the same OPERATORS on the original documents /
embeddings parquet at sf0.001 and pins structural invariants that hold
on realistic data distributions (skew, long texts, non-separable
vectors) — the regressions the planted oracles can no longer catch.

Invariants only (no planted answers): symmetry/ordering of pair ids,
estimate and score bounds, keep-set sizes, spectrum monotonicity,
round-trip token identity. Each test names the converted query it
covers."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_excel_csv_sql_spark.catalog import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF, "documents").select(
        "doc_id", "text"
    ).localCheckpoint(eager=True)


@pytest.fixture(scope="module")
def embs(spark):
    return load_table(spark, SF, "embeddings").localCheckpoint(eager=True)


def test_minhash_lsh_pairs_real_docs(docs):
    """covers: minhash_lsh_pairs, dedup_pipeline_minhash (r12 synth)."""
    from etl_excel_csv_sql_spark.operators import dedup

    pairs = dedup.minhash_lsh_pairs(
        docs, "doc_id", "text", threshold=0.3
    ).collect()
    ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    for r in pairs:
        assert r["id_a"] < r["id_b"]
        assert r["id_a"] in ids and r["id_b"] in ids
        assert 0.0 <= r["jaccard"] <= 1.0
        assert r["jaccard"] >= 0.3  # verify stage enforced the cut
    # keep-first composes: kept set is corpus minus component losers
    kept = dedup.dedup_keep_first(
        docs,
        dedup.minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.3),
        "doc_id",
    )
    n_kept = kept.count()
    assert 0 < n_kept <= len(ids)
    losers = len(ids) - n_kept
    # every pair names >= 1 loser; losers never exceed pair endpoints
    assert losers <= len({r["id_b"] for r in pairs} | {r["id_a"] for r in pairs})


def test_simhash_pairs_real_docs(docs):
    """covers: simhash_pairs (r12 twin-synth conversion)."""
    from etl_excel_csv_sql_spark.operators import dedup

    pairs = dedup.simhash_pairs(docs, "doc_id", "text", max_hamming=8)
    rows = pairs.collect()
    for r in rows:
        assert r["id_a"] < r["id_b"]
        assert 0 <= r["hamming"] <= 8
    # output is n_blocks-invariant on the real corpus (the Manku
    # banding exactness claim, re-pinned on real text)
    alt = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in dedup.simhash_pairs(
            docs, "doc_id", "text", max_hamming=8, n_blocks=11
        ).collect()
    }
    assert {(r["id_a"], r["id_b"], r["hamming"]) for r in rows} == alt


def test_pq_real_embeddings(embs):
    """covers: ann_pq_topk (r12 BYO-codebook conversion) — train/encode/
    search on the REAL embedding distribution."""
    from etl_excel_csv_sql_spark.operators import similarity

    spark = embs.sparkSession
    q0 = embs.orderBy("vec_id").limit(1).collect()[0]
    queries = spark.createDataFrame(
        [(int(q0["vec_id"]), list(q0["embedding"]))],
        "query_id long, query_vec array<float>",
    )
    hits = (
        similarity.pq_search(
            embs, queries, k=10, n_subspaces=4, n_codes=16, iters=2,
            rerank_factor=4,
        )
        .orderBy("rank")
        .collect()
    )
    assert len(hits) == 10
    assert [r["rank"] for r in hits] == list(range(1, 11))
    scores = [r["approx_cosine"] for r in hits]
    assert scores == sorted(scores, reverse=True)
    assert all(-1.000001 <= s <= 1.000001 for s in scores)
    # under rerank, the query vector itself is its own top hit
    assert hits[0]["neighbor_id"] == q0["vec_id"]
    assert abs(scores[0] - 1.0) < 1e-5


def test_pca_variance_real_embeddings(embs):
    """covers: embedding_pca_variance (r12 closed-form conversion)."""
    from etl_excel_csv_sql_spark.operators import similarity

    rows = similarity.pca_variance_report(embs, "embedding", k=8).collect()
    assert [r["component"] for r in rows] == list(range(1, 9))
    ratios = [r["explained_variance_ratio"] for r in rows]
    # eigenvalues sort descending; ratios are a sub-unit partial sum
    assert all(
        ratios[i] >= ratios[i + 1] - 1e-9 for i in range(len(ratios) - 1)
    )
    assert all(0.0 <= r <= 1.0 for r in ratios)
    cums = [r["cumulative_ratio"] for r in rows]
    assert all(cums[i] <= cums[i + 1] + 1e-9 for i in range(len(cums) - 1))
    assert cums[-1] <= 1.000001


def test_semantic_dedup_real_embeddings(embs):
    """covers: semantic_dedup_report (r12 BYO-centroids conversion)."""
    from etl_excel_csv_sql_spark.operators import similarity

    out = similarity.semantic_dedup(
        embs, threshold=0.99, n_cells=8, iters=2
    )
    rows = out.collect()
    n = embs.count()
    kept = [r for r in rows if r["keep"]]
    dropped = [r for r in rows if not r["keep"]]
    assert len(rows) == n and kept
    for r in dropped:
        # every dropped row names a kept keeper with a qualifying score
        assert r["dup_of"] is not None
        assert r["max_dup_cosine"] >= 0.99 - 1e-9
    kept_ids = {r["id"] for r in kept}
    assert all(r["dup_of"] in kept_ids for r in dropped)


def test_bpe_roundtrip_real_docs(spark, docs):
    """covers: bpe_train_report, bpe_encode_tokens (r12 frequency-
    ladder conversion) — merges learned from REAL word frequencies,
    encode = reference sequential apply."""
    from etl_excel_csv_sql_spark.operators import bpe

    wf = bpe.word_frequency_table(docs, "text")
    merges = bpe.train_bpe(wf, n_merges=8)
    assert len(merges) == 8
    counts = [c for _, _, c in merges]
    assert all(c >= 1 for c in counts)
    subset = docs.orderBy("doc_id").limit(5)
    sample = [r["text"] for r in subset.collect()]
    enc = bpe.bpe_encode(subset, merges).orderBy("doc_id").collect()
    assert len(enc) == 5
    for row, text in zip(enc, sample):
        # detokenization identity: the flat symbol stream reproduces
        # the (lowercased) character stream minus whitespace, and every
        # learned merge actually fires somewhere or stays mergeable
        assert "".join(row["bpe_tokens"]) == "".join(text.lower().split())
        assert all(len(t) >= 1 for t in row["bpe_tokens"])
