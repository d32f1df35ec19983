"""The scalar library exposed to PURE SQL via SQL-defined functions
(Spark 4 ``CREATE FUNCTION ... RETURNS ... RETURN <expr>``).

The DataFrame API gets these behaviors from functions/scalars.py; SQL
users get the same behaviors as named functions without touching Python.
Because the bodies are EXPRESSIONS (not Python UDFs), Catalyst inlines
them at resolution time — the resulting plan is identical to writing the
expression by hand: fully codegen-resident, pushdown-eligible, zero
serialization overhead. This is the supported way to ship a scalar
function library to a SQL-only audience at 100 TB.

Bodies mirror functions/scalars.py exactly (same regexes, same Excel
epoch arithmetic); tests/test_sql_functions.py asserts SQL-function ==
column-expression output row-for-row.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from etl_excel_csv_sql_spark.functions.scalars import _SQL_KEYWORDS

_KEYWORD_ALT = "|".join(_SQL_KEYWORDS)

#: name → (signature, body) — temporary (session-scoped) functions.
_FUNCTIONS: dict[str, tuple[str, str]] = {
    "sanitize_str": (
        "(s STRING) RETURNS STRING",
        # SEQUENTIAL char removal (', then ;, then --) mirroring
        # sanitize_sql_string: a single alternation pass left live '--'
        # tokens whenever the removal itself formed them ("-;-" → "--")
        r"regexp_replace(replace(replace(replace(s, '\'', ''), ';', ''),"
        rf" '--', ''), '(?i)\\b({_KEYWORD_ALT})\\b', '[[$1]]')",
    ),
    "scrub_path": (
        "(s STRING) RETURNS STRING",
        r"regexp_replace(s, '[\\\\/]', ' ')",
    ),
    "excel_serial_ts": (
        "(serial DOUBLE) RETURNS TIMESTAMP",
        # true Excel epoch 1899-12-30; fractional days → nearest second;
        # range guard mirrors excel_serial_to_timestamp (out-of-DateTime
        # serials → null, never a long-multiply crash)
        "CASE WHEN try_cast(serial AS DOUBLE) IS NOT NULL"
        " AND try_cast(serial AS DOUBLE) BETWEEN -693593.0 AND 2958465.0"
        " THEN "
        "timestamp_seconds(unix_timestamp(to_timestamp('1899-12-30 00:00:00'))"
        " + CAST(round(try_cast(serial AS DOUBLE) * 86400.0) AS BIGINT)) END",
    ),
    "fmt_archive_ts": (
        "(t TIMESTAMP) RETURNS STRING",
        "date_format(t, 'yyyy.MM.dd HH.mm')",
    ),
    "compose_name": (
        "(a STRING, b STRING, c STRING) RETURNS STRING",
        # null parts render as EMPTY segments (the reference's format
        # operator), mirroring compose_filename — bare concat_ws SKIPS
        # nulls and composes names the reference never wrote
        "concat_ws(' - ', coalesce(a, ''), coalesce(b, ''), coalesce(c, ''))",
    ),
}


def register_sql_functions(spark: SparkSession) -> list[str]:
    """CREATE OR REPLACE TEMPORARY FUNCTION for the whole library;
    returns the registered names (idempotent — replace semantics)."""
    for name, (sig, body) in _FUNCTIONS.items():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{sig} RETURN {body}"
        )
    return list(_FUNCTIONS)
