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


def test_sanitize_removes_reformed_comment_tokens(spark):
    """'-;-' must sanitize to '' — the single alternation pass removed
    only the ';' and left a live '--' comment token (the reference's
    sequential .Replace strips it)."""
    df = spark.createDataFrame([("-;-",), ("-'-",), ("a;b",)], ["s"])
    got = [r.c for r in df.select(sanitize_sql_string("s").alias("c")).collect()]
    assert got == ["", "", "ab"]
    for v in got:
        assert "--" not in v and "'" not in v and ";" not in v


def test_excel_serial_out_of_range_yields_null(spark):
    """A huge-but-numeric serial used to crash the whole batch in
    timestamp_seconds' long multiply; the reference's AddDays throws ->
    null, so must we."""
    df = spark.createDataFrame([("200000000",), ("45123.5",)], ["s"])
    got = df.select(
        excel_serial_to_timestamp("s").alias("t")
    ).collect()
    assert got[0].t is None
    assert got[1].t is not None


def test_compose_filename_null_renders_empty_segment(spark):
    """PowerShell's format operator renders null as an empty segment —
    concat_ws would silently skip it, composing a filename the
    reference system never wrote."""
    df = spark.createDataFrame(
        [("INV001", None, "f.pdf")], "a string, b string, c string"
    )
    got = df.select(
        compose_filename(F.col("a"), F.col("b"), F.col("c")).alias("f")
    ).collect()[0].f
    assert got == "INV001 -  - f.pdf"


def test_enclose_with_brackets_escapes_and_rewraps():
    from etl_excel_csv_sql_spark.functions.scalars import enclose_with_brackets

    assert enclose_with_brackets("my]table") == "[my]]table]"
    assert enclose_with_brackets("[ok]") == "[ok]"
    assert enclose_with_brackets("[a] [b]") == "[[a]] [b]]]"  # two tokens rewrap


def test_oracle_keyword_alternation_cannot_drift():
    """VERDICT r9 #1: two DuckDB oracles embed the sanitizer keyword
    contract; a scalar-library keyword extension once re-mirrored one
    and missed the other (the round's only local-gate red). Both oracles
    now render their alternation from _SQL_KEYWORDS — assert the
    rendered SQL carries every keyword in engine order, and that the
    leftmost-first pairs (EXECUTE/EXEC, TABLES/TABLE) keep the longer
    token first so the alternation brackets whole keywords."""
    from etl_excel_csv_sql_spark.functions.scalars import _SQL_KEYWORDS
    from etl_excel_csv_sql_spark.plans.registry import _REGISTRY

    alt = "|".join(_SQL_KEYWORDS)
    for name in ("sanitize_sql_string", "sql_defined_functions"):
        oracle = _REGISTRY[name].oracle
        assert alt in oracle, f"{name}: oracle alternation drifted"
    assert _SQL_KEYWORDS.index("EXECUTE") < _SQL_KEYWORDS.index("EXEC")
    assert _SQL_KEYWORDS.index("TABLES") < _SQL_KEYWORDS.index("TABLE")
    # the SQL-function library renders from the same constant
    from etl_excel_csv_sql_spark.functions.sql_functions import _KEYWORD_ALT

    assert _KEYWORD_ALT == alt
