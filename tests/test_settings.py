"""Settings catalog: S6 key=value parsing (both delimiters), S4 suffix
discovery, P7 required-param validation."""

from __future__ import annotations

from etl_excel_csv_sql_spark.io.settings import (
    discover_settings,
    parse_settings_text,
    require,
    split_list,
)


def test_parse_both_delimiters_and_comments():
    # ExcelToCSVexport.ps1 uses `=`, CSVtoSQLimport.ps1 uses `==`
    # (SURVEY §2.12#4) — one loader accepts both
    text = """
    # comment
    exportFilePath = D:\\data\\book.xlsx
    importTable==dbo.Orders
    importFieldNames == a,b , c
    empty=
    dup=1
    dup=2
    """
    got = parse_settings_text(text)
    assert got["exportFilePath"] == "D:\\data\\book.xlsx"
    assert got["importTable"] == "dbo.Orders"
    assert got["importFieldNames"] == "a,b , c"
    assert got["empty"] == ""
    assert got["dup"] == "2"  # later wins (hashtable assignment order)


def test_split_list_trims_and_drops_empties():
    assert split_list(" a , b ,, c ") == ["a", "b", "c"]
    assert split_list(None) == []


def test_discover_settings(tmp_path):
    (tmp_path / "orders_import_settings.txt").write_text("importTable==dbo.O")
    (tmp_path / "parts_import_settings.txt").write_text("importTable==dbo.P")
    (tmp_path / "unrelated.txt").write_text("x=1")
    entries = discover_settings(str(tmp_path), "_import_settings.txt")
    assert [e.source_name for e in entries] == ["orders", "parts"]
    assert entries[0].values == {"importTable": "dbo.O"}


def test_require_reports_missing():
    assert require({"a": "1", "b": " "}, ["a", "b", "c"]) == ["b", "c"]


def test_kv_settings_datasource(spark, tmp_path):
    from etl_excel_csv_sql_spark.io.settings_datasource import (
        register_kv_settings,
    )

    (tmp_path / "a_settings.txt").write_text("X=1\nY==2\nY==3\n#c\n")
    (tmp_path / "b_settings.txt").write_text("Z=9\n")
    (tmp_path / "skip.cfg").write_text("W=0\n")
    register_kv_settings(spark)
    df = (
        spark.read.format("kv_settings")
        .option("suffix", "_settings.txt")
        .load(str(tmp_path))
    )
    rows = {(r.source, r.key): r.value for r in df.collect()}
    assert rows == {("a", "X"): "1", ("a", "Y"): "3", ("b", "Z"): "9"}
    # one input partition per file
    assert df.rdd.getNumPartitions() == 2


def test_parse_settings_base64_padded_value():
    """'apiKey=YWJjZA==' must parse at the FIRST '=' — trying the '=='
    delimiter first split inside the value and lost the key entirely."""
    from etl_excel_csv_sql_spark.io.settings import parse_settings_text

    got = parse_settings_text(
        "apiKey=YWJjZA==\nname==value\nurl=http://x/a==b\n"
    )
    assert got == {
        "apiKey": "YWJjZA==",
        "name": "value",
        "url": "http://x/a==b",
    }


def test_discover_settings_glob_metachar_folder(tmp_path):
    from etl_excel_csv_sql_spark.io.settings import discover_settings

    folder = tmp_path / "run [prod]"
    folder.mkdir()
    (folder / "stock_import_settings.txt").write_text("a=1\n")
    got = discover_settings(str(folder), "_import_settings.txt")
    assert len(got) == 1 and got[0].source_name == "stock"
