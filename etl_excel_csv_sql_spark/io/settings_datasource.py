"""`kv_settings` — the settings-file catalog as a REGISTERED Spark data
source (the Spark 4 Python DataSource API, pyspark.sql.datasource).

The reference's catalog is a folder of ``key=value`` text files
(ExcelToCSVexport.ps1:61-116, CSVtoSQLimport.ps1:96-150). io/settings.py
parses them driver-side; this module additionally exposes the SAME parser
through ``spark.read.format("kv_settings")`` so settings scans compose
with the engine like any other source: schema projection, filters, and
DISTRIBUTED reads — one input partition per settings file, so a catalog
of 100k files fans out across executors instead of looping on the driver.

    register_kv_settings(spark)
    df = (spark.read.format("kv_settings")
          .option("suffix", "_export_settings.txt")
          .load("/path/to/folder"))
    # → (source, file, key, value) rows

Long-form (one row per key) rather than one wide row per file: settings
keys vary per file, and long-form is what joins/pivots cleanly.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType


_SCHEMA = (
    "source string, file string, key string, value string"
)


class _SettingsFilePartition(InputPartition):
    def __init__(self, source: str, path: str):
        self.source = source
        self.path = path


class KvSettingsDataSource(DataSource):
    """Format name ``kv_settings``; options: ``path`` (folder),
    ``suffix`` (default ``_settings.txt``)."""

    @classmethod
    def name(cls) -> str:
        return "kv_settings"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema: StructType) -> "KvSettingsReader":
        return KvSettingsReader(self.options)


class KvSettingsReader(DataSourceReader):
    def __init__(self, options):
        self.folder = options.get("path")
        self.suffix = options.get("suffix", "_settings.txt")
        if not self.folder:
            raise ValueError("kv_settings requires a path (folder)")

    def partitions(self):
        # one partition per settings file — planned on the driver from a
        # LISTING ONLY (glob + basename strip); file CONTENT is read on
        # executors. discover_settings() would eagerly parse every file
        # on the driver and discard the values (r10 review) — for the
        # 100k-file catalogs this source exists for, planning alone
        # would cost more driver I/O than the loop it replaces.
        import glob as _glob
        import os

        paths = sorted(
            _glob.glob(
                os.path.join(_glob.escape(self.folder), f"*{self.suffix}")
            )
        )
        return [
            _SettingsFilePartition(
                (
                    os.path.basename(p).removesuffix(self.suffix)
                    if self.suffix
                    else os.path.basename(p)
                ),
                p,
            )
            for p in paths
        ]

    def read(self, partition: _SettingsFilePartition):
        from etl_excel_csv_sql_spark.io.settings import parse_settings_file
        import os

        values = parse_settings_file(partition.path)
        base = os.path.basename(partition.path)
        for key, value in values.items():
            yield (partition.source, base, key, value)


def register_kv_settings(spark) -> None:
    """Idempotent format registration (re-registering replaces)."""
    spark.dataSource.register(KvSettingsDataSource)
