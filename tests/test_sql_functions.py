"""SQL-defined function library == column-expression library, row for row."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_excel_csv_sql_spark.functions.scalars import (
    compose_filename,
    excel_serial_to_timestamp,
    format_timestamp,
    sanitize_sql_string,
    scrub_path_chars,
)
from etl_excel_csv_sql_spark.functions.sql_functions import (
    register_sql_functions,
)


def test_sql_functions_match_column_expressions(spark):
    names = register_sql_functions(spark)
    assert set(names) >= {
        "sanitize_str", "scrub_path", "excel_serial_ts",
        "fmt_archive_ts", "compose_name",
    }
    df = spark.createDataFrame(
        [
            (1, "it's; a DROP--test", "a/b\\c", 44000.5),
            (2, "select union exec", "plain", 1.25),
            (3, None, None, None),
        ],
        ["id", "s", "p", "serial"],
    )
    df.createOrReplaceTempView("probe")
    via_sql = spark.sql(
        """
        SELECT id, sanitize_str(s) AS s1, scrub_path(p) AS p1,
               fmt_archive_ts(excel_serial_ts(serial)) AS t1,
               compose_name(s, p, 'x') AS c1
        FROM probe
        """
    ).collect()
    via_expr = df.select(
        "id",
        sanitize_sql_string("s").alias("s1"),
        scrub_path_chars("p").alias("p1"),
        format_timestamp(excel_serial_to_timestamp("serial")).alias("t1"),
        compose_filename(F.col("s"), F.col("p"), F.lit("x")).alias("c1"),
    ).collect()
    assert sorted(map(tuple, via_sql)) == sorted(map(tuple, via_expr))


def test_sql_function_bodies_inline_no_python(spark):
    """Expression-bodied SQL functions must leave NO Python eval in the
    plan — they inline to the same Catalyst expressions."""
    register_sql_functions(spark)
    spark.range(3).selectExpr("CAST(id AS STRING) AS s").createOrReplaceTempView(
        "probe2"
    )
    plan = (
        spark.sql("SELECT sanitize_str(s) FROM probe2")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
