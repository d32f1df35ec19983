"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in etl_excel_csv_sql_spark.plans.registry; this module is
a thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001 (driver checks rows>0).

    The reference's invoice-search pattern (InvoiceFileSearchFromSQL.ps1)
    transplanted to the test schema: filter the 'unprocessed' key list →
    broadcast semi-join against the big table → aggregate → write-back
    frame with found/missing reconciliation. Exercises scan, filter,
    projection, broadcast semi join, update join, and aggregation in one
    plan (SURVEY.md §7.1).
    """
    from pyspark.sql import functions as F

    from etl_excel_csv_sql_spark.catalog import load_table
    from etl_excel_csv_sql_spark.operators import invoice

    sf_dir = "/root/testdata/sf0.001"
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")

    # "invoice list": BUILDING-segment customers awaiting processing
    pending = invoice.unprocessed(customer, "c_mktsegment", "nonexistent").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    # remote side: their orders (broadcast semi join — no shuffle of orders)
    matched = invoice.semi_join_matches(orders, pending, "o_custkey", "c_custkey")
    # write-back frame: per-customer found flag + order stats
    marked = invoice.mark_found(
        customer.withColumn("found", F.lit("")), matched, "c_custkey", "o_custkey"
    )
    stats = matched.groupBy("o_custkey").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("total_spend"),
    )
    return marked.join(
        stats, marked.c_custkey == stats.o_custkey, "left"
    ).select("c_custkey", "c_name", "found", "n_orders", "total_spend")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator (SURVEY.md §2 inventory)."""
    from etl_excel_csv_sql_spark.plans.registry import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted entries (hash-function-
    dependent operators: MinHash/SimHash candidates, IVF centroids,
    mapInPandas stubs) get the driver's rows-only check."""
    from etl_excel_csv_sql_spark.plans.registry import all_oracles

    return all_oracles()
