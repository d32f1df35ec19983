"""Tests for cohort retention, Markov transitions, and CDC snapshot diff."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from etl_excel_csv_sql_spark.operators import events, relational


def _ts(day: int, hour: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, day, hour)


def test_cohort_retention_hand_computed(spark):
    # week of 2024-01-01 is a Monday; 2024-01-08 the next
    rows = [
        (1, 100, _ts(1)),   # u100 cohort wk0, active wk0
        (2, 100, _ts(9)),   # u100 active wk1
        (3, 101, _ts(2)),   # u101 cohort wk0, active wk0 only
        (4, 102, _ts(8)),   # u102 cohort wk1
        (5, 102, _ts(10)),  # same week — dedup to one active week
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp"
    )
    got = {
        (r["cohort_week"], r["week_offset"]): (
            r["active_users"],
            r["cohort_size"],
            r["retention_rate"],
        )
        for r in events.cohort_retention(df).collect()
    }
    assert got[("2024-01-01", 0)] == (2, 2, 1.0)
    assert got[("2024-01-01", 1)] == (1, 2, 0.5)
    assert got[("2024-01-08", 0)] == (1, 1, 1.0)
    assert len(got) == 3


def test_transition_matrix_hand_computed(spark):
    rows = [
        (1, 1, _ts(1, 1), "view"),
        (2, 1, _ts(1, 2), "click"),
        (3, 1, _ts(1, 3), "view"),
        (4, 2, _ts(1, 1), "view"),
        (5, 2, _ts(1, 2), "click"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    got = {
        (r["from_type"], r["to_type"]): (r["n"], r["probability"])
        for r in events.transition_matrix(df).collect()
    }
    assert got[("view", "click")] == (2, 1.0)
    assert got[("click", "view")] == (1, 1.0)
    assert len(got) == 2


def test_transition_matrix_tiebreak_on_event_id(spark):
    # identical timestamps: order must come from event_id, deterministically
    rows = [(1, 1, _ts(1), "a"), (2, 1, _ts(1), "b"), (3, 1, _ts(1), "c")]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    got = {(r["from_type"], r["to_type"]) for r in events.transition_matrix(df).collect()}
    assert got == {("a", "b"), ("b", "c")}


def test_snapshot_diff_all_ops(spark):
    old = spark.createDataFrame(
        [(1, 10.0, "A"), (2, 20.0, "A"), (3, 30.0, "A"), (5, None, "A")],
        "k long, price double, status string",
    )
    new = spark.createDataFrame(
        [(1, 10.0, "A"), (2, 25.0, "A"), (4, 40.0, "B"), (5, 5.0, "A")],
        "k long, price double, status string",
    )
    got = {
        r["k"]: r
        for r in relational.snapshot_diff(
            old, new, ["k"], ["price", "status"]
        ).collect()
    }
    assert 1 not in got  # unchanged suppressed
    assert got[2]["op"] == "U" and got[2]["old_price"] == 20.0 and got[2]["new_price"] == 25.0
    assert got[3]["op"] == "D" and got[3]["new_price"] is None
    assert got[4]["op"] == "I" and got[4]["old_price"] is None
    assert got[5]["op"] == "U"  # NULL -> value must register (null-safe)


def test_snapshot_diff_roundtrip_via_merge(spark):
    # applying the diff to the old snapshot must reproduce the new one
    old = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "k long, price double"
    )
    new = spark.createDataFrame(
        [(1, 10.0), (2, 25.0), (4, 40.0)], "k long, price double"
    )
    diff = relational.snapshot_diff(old, new, ["k"], ["price"])
    upserts = diff.where(F.col("op").isin("I", "U")).select(
        "k", F.col("new_price").alias("price")
    )
    deletes = diff.where(F.col("op") == "D").select("k")
    rebuilt = (
        old.join(diff.select("k"), "k", "left_anti")
        .unionByName(upserts)
        .join(deletes, "k", "left_anti")
    )
    assert sorted((r["k"], r["price"]) for r in rebuilt.collect()) == sorted(
        (r["k"], r["price"]) for r in new.collect()
    )


def test_attribution_last_touch_hand_computed(spark):
    rows = [
        (1, 1, _ts(1, 0), "click"),
        (2, 1, _ts(1, 5), "view"),
        (3, 1, _ts(1, 6), "purchase"),   # attributed to click at day1 0h
        (4, 1, _ts(2, 0), "click"),
        (5, 1, _ts(12, 0), "purchase"),  # click 10 days earlier: outside 7d
        (6, 2, _ts(3, 0), "purchase"),   # no touch at all
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    got = {r["conversion_id"]: r for r in events.attribute_last_touch(df).collect()}
    assert got[3]["attributed"] is True
    assert got[3]["last_touch_ts"] == "2024-01-01 00:00:00"
    assert got[3]["seconds_since_touch"] == 6 * 3600.0
    assert got[5]["attributed"] is False  # touch exists but stale
    assert got[5]["last_touch_ts"] == "2024-01-02 00:00:00"
    assert got[6]["attributed"] is False and got[6]["last_touch_ts"] is None
    assert len(got) == 3


def test_seasonal_anomalies_flags_planted_outlier(spark):
    # a tight cluster at hour 3 plus one wild value: only it flags
    rows = [(i, 1, _ts(1, 3), "view", 10.0 + (i % 3) * 0.1) for i in range(30)]
    rows.append((99, 1, _ts(2, 3), "view", 500.0))
    # another hour with identical values -> sigma 0, never flags
    rows += [(200 + i, 1, _ts(1, 5), "view", 7.0) for i in range(5)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )
    got = events.seasonal_anomalies(df).collect()
    assert [r["event_id"] for r in got] == [99]
    assert got[0]["hour_of_day"] == 3
    assert got[0]["zscore"] > 3.0


def test_apply_cdc_roundtrip_reproduces_new_snapshot(spark):
    """apply_cdc(old, snapshot_diff(old, new)) == new, including deletes
    (the leg ParquetMergeSink.upsert cannot express)."""
    from etl_excel_csv_sql_spark.operators import relational

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0),        # unchanged
         (2, "B", 20.0),        # update (string)
         (4, "d", 41.0),        # update (value)
         (5, "e", 50.0)],       # insert; 3 deleted
        "k long, s string, v double",
    )
    diff = relational.snapshot_diff(old, new, ["k"], ["s", "v"])
    ops = {r.k: r.op for r in diff.collect()}
    assert ops == {2: "U", 3: "D", 4: "U", 5: "I"}
    got = relational.apply_cdc(old, diff, ["k"], ["s", "v"])
    assert sorted(got.collect()) == sorted(new.collect())


def test_snapshot_diff_null_keys_roundtrip(spark):
    """NULL-key rows must diff correctly: presence used to be probed via
    key nullness, so an UNCHANGED null-key row emitted two spurious 'I'
    ops and broke apply_cdc(old, diff) == new."""
    from etl_excel_csv_sql_spark.operators.relational import snapshot_diff

    old = spark.createDataFrame(
        [(None, 1.0), ("a", 2.0)], "k string, v double"
    )
    new = spark.createDataFrame(
        [(None, 1.0), ("a", 3.0)], "k string, v double"
    )
    got = {(r.k, r.op): (r.old_v, r.new_v) for r in snapshot_diff(
        old, new, keys=("k",), compare=["v"]
    ).collect()}
    # the unchanged NULL-key row emits NOTHING; 'a' is a clean update
    assert got == {("a", "U"): (2.0, 3.0)}


def test_incremental_agg_merges_null_group(spark):
    from etl_excel_csv_sql_spark.operators.relational import (
        incremental_agg_apply,
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [(1, None, 10.0), (2, "g", 1.0)], "id int, grp string, v double"
    )
    new = spark.createDataFrame(
        [(1, None, 10.0), (2, "g", 1.0), (3, None, 5.0)],
        "id int, grp string, v double",
    )
    base = old.groupBy("grp").agg(
        F.sum("v").alias("sum_v"), F.count("*").alias("n")
    )
    diff = snapshot_diff(old, new, keys=["id"], compare=["grp", "v"])
    merged = incremental_agg_apply(base, diff, "grp", "v", "sum_v", "n")
    got = {r.grp: (r.sum_v, r.n) for r in merged.collect()}
    assert got[None] == (15.0, 2)  # base 10 + delta 5 MERGED, not two rows
    assert got["g"] == (1.0, 1)
