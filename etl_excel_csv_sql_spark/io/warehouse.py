"""Warehouse layout helpers: partitioning and bucketing for scan pruning
and shuffle-free joins.

The two physical-layout levers that matter most at 100 TB:

- **Partition columns** (directory-level): queries filtering on the
  partition column prune whole directories before any I/O
  (``PartitionFilters`` in the scan node). Date is the canonical choice
  for fact tables — the reference's per-day error logs and dated archives
  are the same idea applied to files.
- **Bucketing** (file-level hash layout): two tables bucketed by the same
  key into the same bucket count join WITHOUT a shuffle — each task reads
  matching buckets from both sides. This is how the reference's
  invoice⋈orders-shaped joins stay exchange-free when both sides are too
  big to broadcast and the join is recurring (pay the layout once, skip
  the shuffle every query).

Bucketed tables must go through the session catalog (``saveAsTable``) —
path-based parquet loses bucket metadata.
"""

from __future__ import annotations

import os
import shutil
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession


def _purge_stale_table(spark: SparkSession, table: str) -> None:
    """Make ``saveAsTable(mode="overwrite")`` idempotent ACROSS sessions.

    A managed table's directory can survive in ``spark.sql.warehouse.dir``
    while the catalog entry does not (in-memory catalog + a previous run's
    ``spark-warehouse/`` on disk). In that state ``saveAsTable`` refuses to
    write — LOCATION_ALREADY_EXISTS — because it will not claim a location
    it does not own. Drop whatever catalog entry exists (which removes the
    location it DOES own), then delete any orphaned directory left behind
    by an earlier session.

    Only local-filesystem warehouse dirs are purged (file:// or bare
    paths) — exactly the single-JVM case where the orphan problem exists;
    a persistent metastore over HDFS/S3 keeps catalog and location in
    sync, so the DROP alone suffices there.
    """
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir"))
    if wh.scheme not in ("", "file"):
        return
    loc = os.path.join(wh.path, table.split(".")[-1].lower())
    if os.path.isdir(loc):
        shutil.rmtree(loc, ignore_errors=True)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], fmt: str = "parquet"
) -> None:
    """Directory-partitioned write; readers filtering on ``partition_cols``
    scan only matching directories (dynamic + static pruning)."""
    (
        df.write.mode("overwrite")
        .partitionBy(*partition_cols)
        .format(fmt)
        .save(path)
    )


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
) -> None:
    """Hash-bucketed (and optionally sorted) managed table. Joins between
    tables sharing (bucket_cols, n_buckets) skip the exchange entirely;
    sorted buckets additionally skip the sort of a sort-merge join.

    Idempotent across sessions: a stale managed-table location from a
    previous run (on disk but absent from this session's catalog) is
    purged before the write instead of failing LOCATION_ALREADY_EXISTS."""
    _purge_stale_table(df.sparkSession, table)
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def cobucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket keys. With
    matching bucket layouts the physical plan contains no Exchange on
    either side (asserted by tests/test_warehouse.py)."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[left_key] == right[right_key], how)
