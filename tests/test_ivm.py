"""Incremental view maintenance: incremental apply == full recompute,
including group-migration updates and group birth/death."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_excel_csv_sql_spark.operators import relational


def _agg(df):
    return df.groupBy("g").agg(
        relational.money_sum("v").alias("total"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def test_ivm_matches_full_recompute_with_migration(spark):
    old = spark.createDataFrame(
        [(1, "A", 10.0), (2, "A", 20.0), (3, "B", 30.0), (4, "B", 5.0)],
        "k long, g string, v double",
    )
    new = spark.createDataFrame(
        [
            (1, "A", 10.0),   # unchanged
            (2, "B", 20.0),   # group migration A -> B
            (3, "B", 35.0),   # value update in place
            (5, "C", 7.0),    # insert creating a NEW group
        ],  # k=4 deleted
        "k long, g string, v double",
    )
    diff = relational.snapshot_diff(old, new, ["k"], ["g", "v"])
    got = relational.incremental_agg_apply(_agg(old), diff, "g", "v")
    expect = {
        (r["g"], r["total"], r["n_rows"]) for r in _agg(new).collect()
    }
    assert {
        (r["g"], r["total"], r["n_rows"]) for r in got.collect()
    } == expect


def test_ivm_group_death(spark):
    old = spark.createDataFrame([(1, "A", 1.0), (2, "B", 2.0)], "k long, g string, v double")
    new = spark.createDataFrame([(1, "A", 1.0)], "k long, g string, v double")
    diff = relational.snapshot_diff(old, new, ["k"], ["g", "v"])
    got = relational.incremental_agg_apply(_agg(old), diff, "g", "v").collect()
    assert {r["g"] for r in got} == {"A"}  # B reached count 0 and dropped


def test_ivm_empty_diff_is_identity(spark):
    old = spark.createDataFrame([(1, "A", 1.5)], "k long, g string, v double")
    diff = relational.snapshot_diff(old, old, ["k"], ["g", "v"])
    assert diff.count() == 0
    got = relational.incremental_agg_apply(_agg(old), diff, "g", "v").collect()
    assert [(r["g"], r["total"], r["n_rows"]) for r in got] == [("A", 1.5, 1)]
