"""etl_excel_csv_sql_spark — a PySpark-native analytics/ETL engine.

Capability-equivalent superset of the reference ETL toolkit
(borowiak-m/ETL.Excel_CSV_SQL, four PowerShell scripts: Excel→CSV export,
CSV→SQL import, invoice file search, file housekeeping), re-expressed
Spark-first:

- the relational core is plain DataFrame / Spark SQL so Catalyst handles
  pushdown, pruning, join selection and AQE re-planning;
- the reference's folder-queue / watermark / quarantine lifecycle maps to
  Structured Streaming file-source semantics (``streaming/``) plus a batch
  runner (``runner.py``);
- scalar behaviors (Excel serial dates, SQL sanitize, path scrub, …) are
  pure column expressions (``functions/``) — no Python UDFs in the hot path;
- large-scale training-data operators (dedup, similarity search, text
  analysis, multimodal plumbing) live in ``operators/``.

Layout:
    functions/   column-expression library (scalars, text, vectors)
    operators/   composable DataFrame transforms (joins, dedup, similarity, …)
    sources/     readers & writers (csv, excel, parquet, jdbc) with the
                 reference's lifecycle semantics
    plans/       pipeline spec / settings catalog / query registry
    streaming/   Structured Streaming equivalents of the folder-queue model
    runner.py    batch orchestration (watermark gate, archive, retention)
"""

from etl_excel_csv_sql_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
