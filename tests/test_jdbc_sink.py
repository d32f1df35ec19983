"""K4 full-refresh sink semantics + T3 row-level quarantine."""

from __future__ import annotations

from etl_excel_csv_sql_spark.io.jdbc import (
    JdbcFullRefreshSink,
    ParquetFullRefreshSink,
    quarantine_split,
)


def test_full_refresh_replaces_contents(spark, tmp_path):
    # TRUNCATE+INSERT: a second refresh leaves ONLY the new rows
    sink = ParquetFullRefreshSink(str(tmp_path / "tbl"))
    sink.full_refresh(spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"]))
    assert sink.read(spark).count() == 2
    sink.full_refresh(spark.createDataFrame([(9, "z")], ["id", "v"]))
    got = sink.read(spark).collect()
    assert [(r.id, r.v) for r in got] == [(9, "z")]


def test_jdbc_sink_brackets_identifier():
    sink = JdbcFullRefreshSink(url="jdbc:sqlserver://h;db=d", table="My Table")
    # EncloseWithBrackets semantics (CSVtoSQLimport.ps1:49-57) applied at
    # the writer; connection is never opened here
    from etl_excel_csv_sql_spark.functions.scalars import enclose_with_brackets

    assert enclose_with_brackets(sink.table) == "[My Table]"


def test_quarantine_split(spark):
    df = spark.createDataFrame(
        [
            ("1", "44000.5"),   # good: pk + valid serial
            ("2", None),        # good: null serial passes (reference nulls it)
            ("", "44001"),      # bad: empty pk (CSVtoSQLimport.ps1:229)
            ("4", "not-a-num"), # bad: poison datetime cell (:85-91)
        ],
        ["pk", "when"],
    )
    good, bad = quarantine_split(df, {"when": "double"}, pk="pk")
    good_rows = {r.pk for r in good.collect()}
    bad_rows = {r.pk: r._reject_reason for r in bad.collect()}
    assert good_rows == {"1", "2"}
    assert bad_rows == {"": "empty pk pk", "4": "cast(when as double)"}
    # good side carries the typed cast
    assert dict(good.dtypes)["when"] == "double"
