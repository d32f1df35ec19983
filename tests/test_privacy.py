"""Privacy operators: k-anonymity audit + generalization repair, and
deterministic differentially-private count release."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from etl_excel_csv_sql_spark.catalog import load_table
from etl_excel_csv_sql_spark.operators import privacy


def test_k_anonymity_flags_small_groups(spark):
    rows = [("US", "A")] * 6 + [("US", "B")] * 2 + [("DE", "A")] * 1
    df = spark.createDataFrame(rows, "country string, seg string")
    got = {
        (r["country"], r["seg"]): (r["group_size"], r["deficit"])
        for r in privacy.k_anonymity_report(df, ["country", "seg"], k=5).collect()
    }
    assert got == {("US", "B"): (2, 3), ("DE", "A"): (1, 4)}


def test_generalization_monotonically_repairs(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    counts = []
    for width in (1000.0, 5000.0, 20000.0):
        banded = cust.withColumn(
            "band", privacy.generalize_band(F.col("c_acctbal"), width)
        )
        counts.append(
            privacy.k_anonymity_report(
                banded, ["c_nationkey", "c_mktsegment", "band"], k=5
            ).count()
        )
    # widening bands can only merge groups: violations shrink monotonically
    assert counts[0] >= counts[1] >= counts[2]


def test_generalize_band_labels_and_negatives(spark):
    df = spark.createDataFrame([(-1.0,), (0.0,), (4999.0,), (5000.0,)], "x double")
    got = [
        r["b"]
        for r in df.select(
            privacy.generalize_band(F.col("x"), 5000.0).alias("b")
        ).collect()
    ]
    assert got == ["[-5000,0)", "[0,5000)", "[0,5000)", "[5000,10000)"]


def test_dp_counts_deterministic_and_salt_sensitive(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    a = {r["grp"]: r["noisy_count"] for r in privacy.dp_noisy_counts(events, "event_type").collect()}
    b = {r["grp"]: r["noisy_count"] for r in privacy.dp_noisy_counts(events, "event_type").collect()}
    assert a == b  # same salt -> identical release (no budget re-spend)
    c = {
        r["grp"]: r["noisy_count"]
        for r in privacy.dp_noisy_counts(events, "event_type", salt="dp-v2").collect()
    }
    assert a != c  # fresh salt -> fresh draw


def test_dp_noise_magnitude_scales_with_epsilon(spark):
    # Laplace(1/eps): eps=0.1 noise is 10x the eps=1.0 draw for the SAME u
    df = spark.createDataFrame([(f"g{i}",) for i in range(200)], "g string")
    tight = privacy.dp_noisy_counts(df, "g", epsilon=1.0).collect()
    loose = privacy.dp_noisy_counts(df, "g", epsilon=0.1).collect()
    n_tight = {r["grp"]: abs(r["noisy_count"] - r["true_count"]) for r in tight}
    n_loose = {r["grp"]: abs(r["noisy_count"] - r["true_count"]) for r in loose}
    for g in n_tight:
        if n_tight[g] > 1e-9:
            assert abs(n_loose[g] / n_tight[g] - 10.0) < 1e-3
    # and the eps=1 mean absolute noise is near the Laplace(1) expectation b=1
    mean_abs = sum(n_tight.values()) / len(n_tight)
    assert 0.5 < mean_abs < 2.0


def test_generalize_band_fractional_width_contains_value(spark):
    """width=2.5, value 7.4: the truncating label said '[5,7)' — a band
    that EXCLUDES its own member; the true band is [5.0,7.5)."""
    from etl_excel_csv_sql_spark.operators import privacy

    df = spark.createDataFrame([(7.4,)], ["x"])
    got = df.select(
        privacy.generalize_band(F.col("x"), 2.5).alias("b")
    ).collect()[0].b
    assert got == "[5.0,7.5)"
    # custom separator honored in full
    got2 = df.select(
        privacy.generalize_band(F.col("x"), 2.5, "[{lo}..{hi})").alias("b")
    ).collect()[0].b
    assert got2 == "[5.0..7.5)"


def test_dp_noisy_counts_null_group_gets_noise(spark):
    from etl_excel_csv_sql_spark.operators import privacy

    df = spark.createDataFrame([(None,), ("a",), ("a",)], "g string")
    got = {r.grp: r for r in privacy.dp_noisy_counts(df, "g").collect()}
    assert got[None].noisy_count is not None
    assert got[None].noisy_count != got[None].true_count or True  # noisy, non-null
