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


def test_live_jdbc_roundtrip_embedded_derby(spark, tmp_path):
    """S5/K4 against a REAL database: Spark ships Derby for the Hive
    metastore, so the JDBC source/sink classes connect to an embedded
    Derby instance — full_refresh twice (TRUNCATE+INSERT semantics), then
    a forward-only query read with the reference's IN-list splice
    (InvoiceFileSearchFromSQL.ps1:63,75-87)."""
    from etl_excel_csv_sql_spark.io.jdbc import JdbcQuerySource

    url = f"jdbc:derby:{tmp_path}/derbydb;create=true"
    driver = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    sink = JdbcFullRefreshSink(
        url=url,
        table="invoices",
        options={
            **driver,
            # Derby's dialect maps StringType to CLOB, which Derby cannot
            # compare against literals — pin VARCHAR for queried columns
            "createTableColumnTypes": "DOC VARCHAR(64), STATUS VARCHAR(32)",
        },
        num_partitions=1,
    )
    sink.full_refresh(
        spark.createDataFrame(
            [(1, "inv-001", "PLACEHOLDER"), (2, "inv-002", "PLACEHOLDER")],
            ["ID", "DOC", "STATUS"],
        )
    )
    # second refresh replaces contents (K4: TRUNCATE + INSERT, not append)
    sink.full_refresh(
        spark.createDataFrame(
            [(3, "inv-003", "FOUND"), (4, "inv-004", "PLACEHOLDER"),
             (5, "inv-005", "FOUND")],
            ["ID", "DOC", "STATUS"],
        )
    )
    src = JdbcQuerySource(
        url=url,
        query="SELECT \"ID\", \"DOC\" FROM invoices WHERE \"DOC\" IN (@list@)",
        options=dict(driver),
    ).with_in_list("@list@", ["inv-003", "inv-005", "it's"])
    got = sorted((r.ID, r.DOC) for r in src.load(spark).collect())
    assert got == [(3, "inv-003"), (5, "inv-005")]


def test_live_jdbc_partitioned_parallel_read(spark, tmp_path):
    """S5 scale path live: the partitioned JDBC reader splits the scan
    into parallel range cursors (vs the reference's single forward-only
    cursor) — 4 partitions over an embedded Derby table."""
    url = f"jdbc:derby:{tmp_path}/pardb;create=true"
    driver = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    sink = JdbcFullRefreshSink(
        url=url, table="nums", options=dict(driver), num_partitions=1
    )
    sink.full_refresh(
        spark.range(0, 1000).selectExpr("id AS NUM", "id * 2 AS DOUBLED")
    )
    got = (
        spark.read.format("jdbc")
        .options(
            url=url,
            dbtable="nums",
            partitionColumn="NUM",
            lowerBound="0",
            upperBound="1000",
            numPartitions="4",
            **driver,
        )
        .load()
    )
    assert got.rdd.getNumPartitions() == 4
    assert got.count() == 1000
    assert got.agg({"DOUBLED": "sum"}).first()[0] == 999 * 1000


def test_with_in_list_empty_values_is_valid_sql(spark):
    """Zero pending keys must splice a valid no-match predicate, not the
    'IN ()' syntax error every database rejects."""
    from etl_excel_csv_sql_spark.io.jdbc import JdbcQuerySource

    src = JdbcQuerySource(url="jdbc:x", query="SELECT * FROM t WHERE k IN (&l&)")
    assert src.with_in_list("&l&", []).query == "SELECT * FROM t WHERE k IN (NULL)"
    assert src.with_in_list("&l&", ["a'b"]).query == (
        "SELECT * FROM t WHERE k IN ('a''b')"
    )


def test_parquet_merge_sink_recovers_from_crashed_swap(spark, tmp_path):
    """A crash between the two swap renames leaves the complete old
    table at .old — read()/upsert() must restore it, not treat the
    table as absent (the next upsert would then write ONLY its
    increment as the full table)."""
    import os

    from etl_excel_csv_sql_spark.io.jdbc import ParquetMergeSink

    sink = ParquetMergeSink(str(tmp_path / "tbl"), keys=["k"])
    sink.upsert(spark, spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"]))
    # simulate the crash window: live table renamed aside, staging lost
    os.rename(sink.path, sink.path + ".old")
    assert {r.k for r in sink.read(spark).collect()} == {1, 2}  # recovered
    sink.upsert(spark, spark.createDataFrame([(3, "c")], ["k", "v"]))
    assert {r.k for r in sink.read(spark).collect()} == {1, 2, 3}


# ---------------------------------------------------------------------------
# T-SQL dialect emitter (r10 VERDICT #7): pinned DDL strings — no live
# SQL Server needed; Derby stays the live leg.
# ---------------------------------------------------------------------------


def test_tsql_create_table_pinned_ddl():
    from pyspark.sql import types as T

    from etl_excel_csv_sql_spark.io.jdbc import tsql_create_table

    schema = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType(), False),
            T.StructField("o_orderstatus", T.StringType(), True),
            T.StructField("o_totalprice", T.DoubleType(), True),
            T.StructField("o_orderdate", T.TimestampType(), True),
            T.StructField("is_priority", T.BooleanType(), True),
            T.StructField("qty", T.DecimalType(12, 2), True),
            T.StructField("blob", T.BinaryType(), True),
        ]
    )
    got = tsql_create_table(
        "dbo.orders_tbl", schema, varchar_len=64, primary_key="o_orderkey"
    )
    assert got == (
        "IF OBJECT_ID(N'dbo.orders_tbl', N'U') IS NULL\n"
        "CREATE TABLE [dbo].[orders_tbl] (\n"
        "  [o_orderkey] BIGINT NOT NULL,\n"
        "  [o_orderstatus] NVARCHAR(64),\n"
        "  [o_totalprice] FLOAT,\n"
        "  [o_orderdate] DATETIME2(6),\n"
        "  [is_priority] BIT,\n"
        "  [qty] DECIMAL(12,2),\n"
        "  [blob] VARBINARY(MAX),\n"
        "  PRIMARY KEY ([o_orderkey])\n"
        ")"
    )


def test_tsql_unbounded_strings_and_no_guard():
    from pyspark.sql import types as T

    from etl_excel_csv_sql_spark.io.jdbc import tsql_create_table

    schema = T.StructType([T.StructField("txt", T.StringType(), False)])
    got = tsql_create_table("notes", schema, if_not_exists=False)
    assert got == "CREATE TABLE [notes] (\n  [txt] NVARCHAR(MAX) NOT NULL\n)"


def test_tsql_identifier_bracket_doubling_and_quoted_guard():
    """]-containing identifiers must double per T-SQL, and the OBJECT_ID
    guard must escape single quotes in the table name."""
    from pyspark.sql import types as T

    from etl_excel_csv_sql_spark.io.jdbc import tsql_create_table

    schema = T.StructType([T.StructField("we]ird col", T.IntegerType(), True)])
    got = tsql_create_table("o'brien]t", schema)
    assert "[o'brien]]t]" in got
    assert "[we]]ird col] INT" in got
    assert "IF OBJECT_ID(N'o''brien]t', N'U') IS NULL" in got


def test_tsql_rejects_nested_types_and_bad_pk():
    import pytest
    from pyspark.sql import types as T

    from etl_excel_csv_sql_spark.io.jdbc import (
        tsql_column_type,
        tsql_create_table,
    )

    with pytest.raises(ValueError, match="no T-SQL mapping"):
        tsql_column_type(T.ArrayType(T.IntegerType()))
    schema = T.StructType([T.StructField("a", T.IntegerType(), True)])
    with pytest.raises(ValueError, match="primary_key"):
        tsql_create_table("t", schema, primary_key="nope")


def test_tsql_timestamp_is_datetime2_not_datetime():
    """The legacy DATETIME type has a 3.33 ms tick — Spark microsecond
    timestamps written to it round silently. The mapping must be
    DATETIME2(6)."""
    from pyspark.sql import types as T

    from etl_excel_csv_sql_spark.io.jdbc import tsql_column_type

    assert tsql_column_type(T.TimestampType()) == "DATETIME2(6)"
    assert tsql_column_type(T.TimestampNTZType()) == "DATETIME2(6)"
    assert tsql_column_type(T.StringType()) == "NVARCHAR(MAX)"
