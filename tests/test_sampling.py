"""Split determinism / stability / leakage-safety and stratified rates."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_excel_csv_sql_spark.operators.sampling import (
    group_safe_split,
    hash_split,
    stratified_sample,
)


def _docs(spark, n=2000):
    return spark.createDataFrame(
        [(i, f"grp{i % 200}", "en" if i % 4 else "fr") for i in range(n)],
        ["doc_id", "grp", "lang"],
    )


def test_hash_split_fraction_and_determinism(spark):
    df = _docs(spark)
    s1 = {r.doc_id: r.split for r in hash_split(df, "doc_id", 0.1).collect()}
    s2 = {r.doc_id: r.split for r in hash_split(df, "doc_id", 0.1).collect()}
    assert s1 == s2  # bit-for-bit reproducible
    test_frac = sum(v == "test" for v in s1.values()) / len(s1)
    assert 0.06 <= test_frac <= 0.14  # binomial around 10%


def test_hash_split_membership_stable_under_growth(spark):
    small = hash_split(_docs(spark, 500), "doc_id", 0.1)
    big = hash_split(_docs(spark, 2000), "doc_id", 0.1)
    small_m = {r.doc_id: r.split for r in small.collect()}
    big_m = {r.doc_id: r.split for r in big.collect()}
    # adding rows never flips existing assignments
    assert all(big_m[k] == v for k, v in small_m.items())


def test_different_salt_draws_independent_split(spark):
    df = _docs(spark)
    a = {r.doc_id: r.split for r in hash_split(df, "doc_id", 0.5, salt="a").collect()}
    b = {r.doc_id: r.split for r in hash_split(df, "doc_id", 0.5, salt="b").collect()}
    agree = sum(a[k] == b[k] for k in a) / len(a)
    assert 0.35 <= agree <= 0.65  # ~independent coin flips


def test_group_safe_split_never_splits_a_group(spark):
    df = _docs(spark)
    out = group_safe_split(df, "grp", 0.3)
    sides_per_group = (
        out.groupBy("grp").agg(F.countDistinct("split").alias("n")).collect()
    )
    assert all(r.n == 1 for r in sides_per_group)


def test_stratified_sample_respects_fractions(spark):
    df = _docs(spark, 4000)
    out = stratified_sample(df, "lang", {"en": 0.2, "fr": 1.0}, seed=7)
    counts = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts["fr"] == 1000            # keep-all stratum is exact
    assert 400 <= counts["en"] <= 800      # ~600 expected of 3000


def test_kfold_assignment_properties(spark):
    from etl_excel_csv_sql_spark.operators.sampling import kfold_assignment

    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    got = {r.doc_id: r.fold for r in kfold_assignment(df, "doc_id", k=5).collect()}
    # folds cover 0..4 roughly uniformly
    from collections import Counter

    c = Counter(got.values())
    assert set(c) == {0, 1, 2, 3, 4}
    assert max(c.values()) < 1.3 * min(c.values())
    # growth-stable: a subset keeps identical assignments
    sub = {
        r.doc_id: r.fold
        for r in kfold_assignment(
            spark.range(0, 500).withColumnRenamed("id", "doc_id"), "doc_id", k=5
        ).collect()
    }
    assert all(got[i] == f for i, f in sub.items())
    # salt draws an independent assignment
    other = {
        r.doc_id: r.fold
        for r in kfold_assignment(df, "doc_id", k=5, salt="fold-v2").collect()
    }
    assert any(other[i] != got[i] for i in got)


def test_hash_split_fraction_one_marks_everything(spark):
    """split_threshold(1.0) used to return the 5-char hex '10000', which
    sorts BELOW most 4-char buckets lexicographically — fraction=1.0
    silently marked ~94% of rows train."""
    from etl_excel_csv_sql_spark.operators.sampling import hash_split

    df = spark.range(500).withColumnRenamed("id", "doc_id")
    got = hash_split(df, "doc_id", test_fraction=1.0)
    assert got.where(F.col("split") == "train").count() == 0
    assert hash_split(df, "doc_id", test_fraction=0.0).where(
        F.col("split") == "test"
    ).count() == 0


def test_stratified_exact_decimal_ceil_boundary(spark):
    """ceil(fraction*n) must be decimal-exact: 0.07*100 in doubles is
    7.000...001 -> ceil 8, one extra row kept and an oracle mismatch."""
    from etl_excel_csv_sql_spark.operators.sampling import stratified_exact

    df = spark.range(100).select(
        F.col("id").alias("doc_id"), F.lit("s").alias("g")
    )
    got = stratified_exact(df, ["g"], "doc_id", 0.07)
    assert got.count() == 7


def test_wswr_ignores_nan_weights(spark):
    """NaN > 0 is true in Spark and NaN sorts above every number — NaN
    weights used to pass eligibility and always win the sample."""
    import math

    from etl_excel_csv_sql_spark.operators.sampling import (
        weighted_sample_without_replacement,
    )

    rows = [(i, 1.0) for i in range(20)] + [
        (100 + i, float("nan")) for i in range(5)
    ]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = weighted_sample_without_replacement(df, "doc_id", "w", k=10)
    ids = [r.doc_id for r in got.collect()]
    assert len(ids) == 10 and all(i < 100 for i in ids)
