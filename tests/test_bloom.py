"""Bloom-filter semi-join prefilter (relational.build_bloom /
bloom_prefilter_semi_join): exactness with verify on, no-false-negative
superset with verify off, filter geometry, and plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_excel_csv_sql_spark.operators import relational


def _frames(spark):
    big = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") * 7 % 97).alias("payload")
    )
    # keys: a scattered ~6% subset, including values absent from big
    keys = spark.range(0, 6000).filter(F.col("id") % 17 == 0).select(
        F.col("id").alias("key")
    )
    return big, keys


def test_exact_verify_equals_plain_semi_join(spark):
    big, keys = _frames(spark)
    got = relational.bloom_prefilter_semi_join(
        big, keys, "k", "key", n_bits=1 << 14, n_hashes=5
    )
    expected = big.join(keys, big.k == keys.key, "left_semi")
    assert sorted(r.k for r in got.collect()) == sorted(
        r.k for r in expected.collect()
    )
    # payload columns survive untouched
    assert set(got.columns) == {"k", "payload"}


def test_prefilter_only_is_superset_with_no_false_negatives(spark):
    big, keys = _frames(spark)
    candidates = {
        r.k
        for r in relational.bloom_prefilter_semi_join(
            big, keys, "k", "key", n_bits=1 << 14, n_hashes=5,
            exact_verify=False,
        ).collect()
    }
    true_matches = {
        r.k for r in big.join(keys, big.k == keys.key, "left_semi").collect()
    }
    assert true_matches <= candidates
    # generous sizing (2^14 bits for ~295 keys) → fp rate ~0: the
    # candidate set should stay close to the truth; allow slack for the
    # probabilistic tail but catch a broken filter (which would pass
    # everything or nothing)
    assert len(candidates) < len(true_matches) + 0.02 * 5000


def test_tiny_filter_still_exact_via_verify(spark):
    # deliberately undersized filter → many false positives, but the
    # verify join must restore exactness
    big, keys = _frames(spark)
    got = relational.bloom_prefilter_semi_join(
        big, keys, "k", "key", n_bits=1 << 6, n_hashes=2
    )
    expected = big.join(keys, big.k == keys.key, "left_semi")
    assert got.count() == expected.count()


def test_build_bloom_geometry_and_size(spark):
    _, keys = _frames(spark)
    row = relational.build_bloom(keys, "key", n_bits=1 << 12, n_hashes=3).collect()[0]
    assert row.n_bits == 1 << 12 and row.n_hashes == 3
    # at most n_bits/64 words, and every word index in range
    assert len(row.bloom_words) <= (1 << 12) // 64
    assert all(0 <= w < (1 << 12) // 64 for w in row.bloom_words)


def test_probe_side_has_no_shuffle_before_filter(spark):
    """The whole point: the big side must be scanned → bloom-filtered
    with NO Exchange in between (the filter rides a broadcast join).
    Exchanges in the plan belong to the build side (word groupBy + the
    single-row fold) only — prefilter-only mode has no other join."""
    big, keys = _frames(spark)
    out = relational.bloom_prefilter_semi_join(
        big, keys, "k", "key", n_bits=1 << 14, n_hashes=5,
        exact_verify=False,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    # the BNLJ prints the probe (streamed) side first, then the build
    # side under BroadcastExchange — everything before that marker is
    # the big table's scan path and must be shuffle-free
    probe_side = plan.split("BroadcastExchange")[0]
    assert "Exchange" not in probe_side, plan
