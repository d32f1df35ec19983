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


def read_csv_checked(
    spark: SparkSession,
    path: str,
    expected_cols: list[str],
    queue: FolderQueue | None = None,
) -> DataFrame | None:
    """All-string CSV read gated on the header: on drift, quarantine the
    file (when a queue is given) and return None; on success return the
    frame projected to the EXPECTED column order (tolerating reorder)."""
    df = csv_io.read_csv_all_string(spark, path)
    report = check_header(df.columns, expected_cols)
    if not report.ok:
        if queue is not None:
            queue.quarantine(path, f"schema drift: {report.describe()}")
        return None
    return df.select(*expected_cols)
