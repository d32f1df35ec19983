"""Pipeline runner: the reference's filesystem-orchestration layer.

- errorlog: per-day error-log sink, Fatal/NotFatal (K5)
- watermark: mtime watermark store + commit ordering (S7, K7, P6, T1)
- folder_queue: drop-folder pickup / archive / error lifecycle (T2, K6)
- retention: age-based retention sweep (§2.11 — the intent
  FileHousekeeping.ps1 declares but never implements)
- copyplan: per-row idempotent file-copy side effects (K8)
- pipeline: the three reference entry points wired end-to-end (§3)
"""

from etl_excel_csv_sql_spark.runner.copyplan import execute_copy_plan

__all__ = ["execute_copy_plan"]
