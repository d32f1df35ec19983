"""Physical-layout guarantees: partition pruning and shuffle-free
co-bucketed joins, asserted on the actual plans."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_excel_csv_sql_spark.io.warehouse import (
    cobucketed_join,
    write_bucketed_table,
    write_partitioned,
)


def test_partitioned_write_prunes_scan(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"2024-01-{(i % 3) + 1:02d}", i * 1.0) for i in range(300)],
        ["id", "day", "v"],
    )
    path = str(tmp_path / "events_by_day")
    write_partitioned(df, path, ["day"])

    q = spark.read.parquet(path).filter(F.col("day") == "2024-01-02")
    assert q.count() == 100
    plan = q._jdf.queryExecution().executedPlan().toString()
    # the day filter lands as a partition filter, not a data filter
    assert "PartitionFilters" in plan and "2024-01-02" in plan


def test_bucketed_write_survives_orphaned_location(spark):
    """Fresh-session idempotency (r4 verdict #2): a managed-table directory
    left in spark-warehouse/ by a PREVIOUS session (no catalog entry in
    this one) must not fail the write with LOCATION_ALREADY_EXISTS."""
    import os
    from urllib.parse import urlparse

    df = spark.createDataFrame([(i, i % 5) for i in range(100)], ["id", "k"])
    table = "b_orphan_check"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # simulate the leftover: location on disk, absent from the catalog
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    loc = os.path.join(wh, table)
    os.makedirs(loc, exist_ok=True)
    with open(os.path.join(loc, "part-orphan.parquet"), "wb") as f:
        f.write(b"stale")
    try:
        write_bucketed_table(df, table, ["k"], 4)  # must not raise
        assert spark.table(table).count() == 100
        # and plain re-runs in the SAME session stay idempotent too
        write_bucketed_table(df, table, ["k"], 4)
        assert spark.table(table).count() == 100
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_cobucketed_join_has_no_exchange(spark, tmp_path):
    orders = spark.createDataFrame(
        [(i, i % 50, i * 10.0) for i in range(2000)],
        ["o_id", "cust", "amount"],
    )
    customers = spark.createDataFrame(
        [(i, f"c{i}") for i in range(50)], ["cust_id", "name"]
    )
    write_bucketed_table(orders, "b_orders", ["cust"], 8, sort_cols=["cust"])
    write_bucketed_table(
        customers, "b_customers", ["cust_id"], 8, sort_cols=["cust_id"]
    )
    # at test size the planner would broadcast the small side and skip the
    # bucket layout entirely; disable auto-broadcast to expose the
    # bucketed path that matters when BOTH sides are huge
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", None)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        joined = cobucketed_join(spark, "b_orders", "b_customers", "cust", "cust_id")
        assert joined.count() == 2000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located buckets: a sort-merge join with NO shuffle on either side
        assert "Exchange" not in plan, plan[:1500]
        assert "Bucketed: true" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        if prev_aqe is not None:
            spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", prev_aqe)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customers")


def test_compact_small_files_collapses_and_preserves(spark, tmp_path):
    from etl_excel_csv_sql_spark.io.warehouse import (
        compact_small_files,
        parquet_file_stats,
    )

    src = str(tmp_path / "small")
    dst = str(tmp_path / "compacted")
    df = spark.range(0, 50_000).withColumn("v", F.col("id") * 2)
    df.repartition(40).write.parquet(src)
    assert len(parquet_file_stats(spark, src)) == 40

    report = {
        r.phase: r
        for r in compact_small_files(
            spark, src, dst, target_bytes=64 * 1024 * 1024
        ).collect()
    }
    assert report["before"].n_files == 40
    assert report["after"].n_files < report["before"].n_files
    assert report["after"].n_rows == report["before"].n_rows == 50_000
    # compacted data identical, not just counted
    a = sorted(r.id for r in spark.read.parquet(dst).collect())
    assert a == list(range(50_000))


def test_partitioned_read_prunes(spark, tmp_path):
    from etl_excel_csv_sql_spark.io.warehouse import write_partitioned

    path = str(tmp_path / "by_day")
    df = spark.createDataFrame(
        [(i, f"2024-01-{(i % 5) + 1:02d}") for i in range(100)], ["id", "day"]
    )
    write_partitioned(df, path, ["day"])
    rd = spark.read.parquet(path).filter(F.col("day") == "2024-01-03")
    plan = rd._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "2024-01-03" in plan
    assert rd.count() == 20


def test_compact_small_files_rejects_in_place_and_nested_dst(spark, tmp_path):
    """ADVICE r6: overwrite into (or under) the source would delete the
    files still being read — must refuse, not corrupt."""
    import pytest

    from etl_excel_csv_sql_spark.io.warehouse import compact_small_files

    src = str(tmp_path / "ds")
    spark.range(0, 100).write.parquet(src)
    with pytest.raises(ValueError, match="must not equal or nest"):
        compact_small_files(spark, src, src)
    with pytest.raises(ValueError, match="must not equal or nest"):
        compact_small_files(spark, src, src + "/sub")
    # sibling path with a shared name prefix is allowed (prefix check
    # must be path-component-aware, not a raw startswith)
    compact_small_files(spark, src, str(tmp_path / "ds_out")).collect()
