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
from pyspark.sql import functions as F


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
    # db-qualified managed tables live at <warehouse>/<db>.db/<table> —
    # purging <warehouse>/<table> for 'analytics.orders' deleted the
    # wrong path and saveAsTable still hit LOCATION_ALREADY_EXISTS
    # (code-review r9 catch)
    parts = table.lower().split(".")
    if len(parts) == 2:
        loc = os.path.join(wh.path, f"{parts[0]}.db", parts[1])
    else:
        loc = os.path.join(wh.path, parts[-1])
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


def parquet_file_stats(spark: SparkSession, path: str) -> list[tuple[str, int]]:
    """(file, bytes) for every parquet data file under ``path``, via the
    Hadoop FileSystem API — works against any supported filesystem
    (local, HDFS, object stores), not just local paths."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    out: list[tuple[str, int]] = []
    it = fs.listFiles(p, True)  # recursive
    while it.hasNext():
        st = it.next()
        name = st.getPath().toString()
        if name.endswith(".parquet"):
            out.append((name, st.getLen()))
    return out


def compact_small_files(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> DataFrame:
    """Rewrite a many-small-files parquet dataset into ~``target_bytes``
    files (the OPTIMIZE/compaction maintenance op every long-lived table
    needs: streaming sinks and over-parallel writers leave thousands of
    KB-sized files, and at 100 TB the per-file open/footer cost starts to
    dominate scans).

    File count is sized from the SOURCE byte total (compressed size is
    layout-independent to first order); ``repartition`` (round-robin)
    balances rows evenly so output files are uniform — a ``coalesce``
    would skip the shuffle but inherit the input's skew.

    Returns a 2-row report frame (phase, n_files, total_bytes, n_rows) —
    the before/after evidence.
    """
    import math

    def _local(p: str) -> str:
        # normalize URI-form local paths AND symlinks before comparing:
        # abspath('file:/tmp/data') is '<cwd>/file:/tmp/data', which let
        # compact(spark, 'file:/tmp/data', '/tmp/data') slip past the
        # guard and overwrite-delete the source mid-read (code-review r9
        # catch)
        u = urlparse(p)
        if u.scheme == "file":
            p = u.path
        return os.path.realpath(os.path.abspath(p))

    src_norm = _local(src_path)
    dst_norm = _local(dst_path)
    if dst_norm == src_norm or dst_norm.startswith(src_norm + os.sep):
        # mode("overwrite") deletes dst before writing — compacting in
        # place (or into a subdir of the source) would destroy the files
        # the rewrite is still reading. In-place compaction needs a
        # transactional table format (Delta/Iceberg OPTIMIZE); for plain
        # parquet, write aside then swap.
        raise ValueError(
            f"dst_path {dst_path!r} must not equal or nest under "
            f"src_path {src_path!r}: overwrite would delete the source "
            "while it is being read"
        )
    src_files = parquet_file_stats(spark, src_path)
    total = sum(b for _, b in src_files)
    n_out = max(1, math.ceil(total / target_bytes))
    from pyspark.sql import Observation

    # count source rows DURING the rewrite (Observation rides the write
    # job) — the original implementation re-scanned the source for the
    # before-count, doubling the read cost of the maintenance op
    obs = Observation("compact_src_rows")
    df = spark.read.parquet(src_path).observe(obs, F.count(F.lit(1)).alias("n"))
    df.repartition(n_out).write.mode("overwrite").parquet(dst_path)
    dst_files = parquet_file_stats(spark, dst_path)
    n_src_rows = int(obs.get["n"])
    n_dst_rows = spark.read.parquet(dst_path).count()
    return spark.createDataFrame(
        [
            ("before", len(src_files), int(total), n_src_rows),
            ("after", len(dst_files), int(sum(b for _, b in dst_files)), n_dst_rows),
        ],
        "phase string, n_files int, total_bytes long, n_rows long",
    )
