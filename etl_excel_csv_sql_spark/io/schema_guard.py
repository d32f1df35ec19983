"""Schema drift guard for file ingestion.

The reference validates nothing: a CSV whose columns moved or vanished
reaches SQL Server and fails row-by-row (SURVEY §1.2 "mismatches surface
as SQL errors"). The engine checks the header BEFORE the load and routes
drifted files to quarantine — turning silent per-row corruption into one
actionable file-level event.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from etl_excel_csv_sql_spark.io import csv_io
from etl_excel_csv_sql_spark.runner.folder_queue import FolderQueue


@dataclass(frozen=True)
class SchemaReport:
    missing: tuple[str, ...]     # expected but absent → load would null-fill
    unexpected: tuple[str, ...]  # present but unknown → silently dropped
    reordered: bool              # same set, different order

    @property
    def ok(self) -> bool:
        return not self.missing and not self.unexpected

    def describe(self) -> str:
        parts = []
        if self.missing:
            parts.append(f"missing columns {list(self.missing)}")
        if self.unexpected:
            parts.append(f"unexpected columns {list(self.unexpected)}")
        if self.reordered and not parts:
            parts.append("columns reordered (tolerated)")
        return "; ".join(parts) or "ok"


def check_header(
    actual: list[str], expected: list[str]
) -> SchemaReport:
    """Compare a header against the expected column set. Order changes are
    reported but tolerated (named access is order-independent); missing or
    unexpected columns are failures."""
    a, e = set(actual), set(expected)
    return SchemaReport(
        missing=tuple(sorted(e - a)),
        unexpected=tuple(sorted(a - e)),
        reordered=(a == e and actual != expected),
    )


def _member_files(path: str) -> list[str]:
    """CSV member files of a directory/glob path (empty list → treat
    ``path`` as a single file). Case-insensitive suffix, mirroring
    FolderQueue.pending()."""
    import glob as _glob
    import os

    if os.path.isdir(path):
        return sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.lower().endswith(".csv")
        )
    if any(ch in path for ch in "*?["):
        return sorted(_glob.glob(path))
    return []


def read_csv_checked(
    spark: SparkSession,
    path: str,
    expected_cols: list[str],
    queue: FolderQueue | None = None,
) -> DataFrame | None:
    """All-string CSV read gated on the header: on drift, quarantine the
    file (when a queue is given) and return None; on success return the
    frame projected to the EXPECTED column order (tolerating reorder).

    Directory/glob paths check EVERY member file's own header (r10
    review): Spark takes column names from the first file only and, with
    the default enforceSchema, silently skips the other files' header
    lines and maps their data POSITIONALLY — a reordered-column sibling
    file loaded with its values swapped into the wrong columns, exactly
    the silent corruption this guard exists to catch. Any drifted member
    fails the whole read (per-file quarantine stays the FolderQueue
    single-file flow)."""
    for member in _member_files(path):
        m_report = check_header(
            csv_io.read_csv_all_string(spark, member).columns, expected_cols
        )
        if not m_report.ok or m_report.reordered:
            # positional load would misplace a reordered member even
            # though reorder is tolerable for a single file
            if queue is not None:
                queue.quarantine(
                    member, f"schema drift: {m_report.describe()}"
                )
            return None
    df = csv_io.read_csv_all_string(spark, path)
    report = check_header(df.columns, expected_cols)
    if not report.ok:
        if queue is not None:
            queue.quarantine(path, f"schema drift: {report.describe()}")
        return None
    return df.select(*expected_cols)
