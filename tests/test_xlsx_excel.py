"""Excel source: S1 sheet catalog, S2 header-offset scan, P5 matching.

Fixtures are written by the pure-stdlib xlsx writer and read back through
the full io.excel path (writer and reader share only the file format, so a
roundtrip exercises both)."""

from __future__ import annotations

import os

from etl_excel_csv_sql_spark.io import xlsx
from etl_excel_csv_sql_spark.io.excel import (
    excel_sheet_names,
    match_sheets,
    read_excel_sheet,
    stage_workbook_to_parquet,
)


def _workbook(tmp_path) -> str:
    path = os.path.join(tmp_path, "book.xlsx")
    xlsx.write_workbook(
        path,
        {
            "Invoices": [
                ["garbage banner row", None],          # row 1: pre-header junk
                ["InvoiceNumber", "Amount", "Note"],   # row 2: header
                ["INV-001", 12.5, "ok"],
                ["INV-002", 99, "has, comma"],
                ["INV-003", None, "Ünïcødé"],
            ],
            "Ignore Me": [["a"], ["1"]],
        },
    )
    return path


def test_sheet_names_in_order(tmp_path):
    assert excel_sheet_names(_workbook(tmp_path)) == ["Invoices", "Ignore Me"]


def test_match_sheets_case_insensitive_trimmed(tmp_path):
    # P5 + SURVEY §2.12#2: reference matching is case-insensitive -eq with
    # a broken trim; ours trims properly and preserves workbook order
    available = excel_sheet_names(_workbook(tmp_path))
    assert match_sheets(available, ["  invoices ", "IGNORE ME"]) == [
        "Invoices",
        "Ignore Me",
    ]
    assert match_sheets(available, ["nope"]) == []


def test_read_sheet_header_offset_all_string(spark, tmp_path):
    # S2: header at row 2 (StartRow semantics); everything comes back string
    df = read_excel_sheet(spark, _workbook(tmp_path), "Invoices", header_row=2)
    assert df.columns == ["InvoiceNumber", "Amount", "Note"]
    assert [f.dataType.simpleString() for f in df.schema.fields] == ["string"] * 3
    rows = {r["InvoiceNumber"]: r for r in df.collect()}
    assert rows["INV-001"]["Amount"] == "12.5"
    assert rows["INV-002"]["Amount"] == "99"      # integral float → no ".0"
    assert rows["INV-003"]["Amount"] is None
    assert rows["INV-003"]["Note"] == "Ünïcødé"


def test_stage_workbook_to_parquet(spark, tmp_path):
    out = stage_workbook_to_parquet(
        spark,
        _workbook(tmp_path),
        str(tmp_path / "staged"),
        sheets=["invoices"],
        header_row=2,
    )
    assert list(out) == ["Invoices"]
    staged = spark.read.parquet(out["Invoices"])
    assert staged.count() == 3


def test_stage_workbook_parallel_matches_serial(spark, tmp_path):
    """VERDICT r7 #7: thread-pooled staging must produce byte-identical
    sheet contents and the same workbook-ordered mapping as the serial
    path, on a many-sheet workbook."""
    from etl_excel_csv_sql_spark.io import xlsx

    n_sheets, n_rows = 10, 300
    sheets = {
        f"Sheet{i:02d}": [["id", "val"]]
        + [[f"r{i}-{j}", float(j)] for j in range(n_rows)]
        for i in range(n_sheets)
    }
    wb = str(tmp_path / "many.xlsx")
    xlsx.write_workbook(wb, sheets)
    serial = stage_workbook_to_parquet(
        spark, wb, str(tmp_path / "ser"), max_workers=1
    )
    par = stage_workbook_to_parquet(
        spark, wb, str(tmp_path / "par"), max_workers=8
    )
    arrow = stage_workbook_to_parquet(
        spark, wb, str(tmp_path / "arr"), max_workers=8, engine="arrow"
    )
    assert list(serial) == list(par) == list(arrow) == sorted(sheets)
    for name in sheets:
        a = {tuple(r) for r in spark.read.parquet(serial[name]).collect()}
        b = {tuple(r) for r in spark.read.parquet(par[name]).collect()}
        c = {tuple(r) for r in spark.read.parquet(arrow[name]).collect()}
        assert a == b == c and len(a) == n_rows, name
        # schema parity: all-string columns under both engines
        sch = spark.read.parquet(arrow[name]).schema
        assert [f.dataType.simpleString() for f in sch.fields] == ["string"] * 2


def test_stage_workbook_engine_switch_in_place(spark, tmp_path):
    """ADVICE r9: re-staging the SAME out_dir with the other engine must
    overwrite cleanly — spark leaves a parquet DIRECTORY per sheet,
    arrow a single file; switching used to crash (IsADirectoryError) or
    leave a stale mixed layout."""
    from etl_excel_csv_sql_spark.io import xlsx
    from etl_excel_csv_sql_spark.io.excel import stage_workbook_to_parquet

    wb = str(tmp_path / "sw.xlsx")
    xlsx.write_workbook(
        wb, {"S": [["id", "val"], ["a", 1.0], ["b", 2.0]]}
    )
    out_dir = str(tmp_path / "staged")
    # spark → arrow: pq.write_table onto an existing directory
    m1 = stage_workbook_to_parquet(spark, wb, out_dir, engine="spark")
    m2 = stage_workbook_to_parquet(spark, wb, out_dir, engine="arrow")
    assert list(m1) == list(m2) == ["S"]
    got = {tuple(r) for r in spark.read.parquet(m2["S"]).collect()}
    assert got == {("a", "1"), ("b", "2")}
    # arrow → spark: the directory write onto an existing single file
    m3 = stage_workbook_to_parquet(spark, wb, out_dir, engine="spark")
    got3 = {tuple(r) for r in spark.read.parquet(m3["S"]).collect()}
    assert got3 == got


def test_stage_workbook_arrow_rejects_empty_header(spark, tmp_path):
    """Both engines must FAIL on a header_row beyond the sheet: Spark
    refuses empty-schema parquet; the arrow worker raises the same
    contract error instead of landing a 0-column file Spark can't read."""
    import pytest

    from etl_excel_csv_sql_spark.io import xlsx
    from etl_excel_csv_sql_spark.io.excel import stage_workbook_to_parquet

    wb = str(tmp_path / "one.xlsx")
    xlsx.write_workbook(wb, {"S": [["a", "b"], ["1", "2"]]})
    with pytest.raises(Exception):
        stage_workbook_to_parquet(
            spark, wb, str(tmp_path / "sp"), header_row=99
        )
    with pytest.raises(ValueError, match="no columns"):
        stage_workbook_to_parquet(
            spark, wb, str(tmp_path / "ar"), header_row=99, engine="arrow",
            max_workers=1,
        )


def test_xlsx_rless_cells_and_phonetic_runs_and_abs_targets(tmp_path):
    """r10 review triplet: (a) cells without r attributes append
    sequentially instead of clobbering column A; (b) <rPh> phonetic
    (furigana) runs are excluded from shared strings; (c) absolute
    workbook-rels targets ('/xl/worksheets/sheet1.xml') resolve."""
    import zipfile

    from etl_excel_csv_sql_spark.io import xlsx

    wb = str(tmp_path / "crafted.xlsx")
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main"><sheetData>'
        '<row r="1"><c t="inlineStr"><is><t>a</t></is></c>'
        '<c t="inlineStr"><is><t>b</t></is></c>'
        '<c><v>3</v></c></row>'
        '<row r="2"><c r="A2" t="s"><v>0</v></c></row>'
        "</sheetData></worksheet>"
    )
    shared = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        "<si><r><t>東京</t></r><rPh><t>トウキョウ</t></rPh></si></sst>"
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        '<sheets><sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/worksheet" '
        'Target="/xl/worksheets/sheet1.xml"/></Relationships>'
    )
    with zipfile.ZipFile(wb, "w") as zf:
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", rels)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
        zf.writestr("xl/sharedStrings.xml", shared)
    rows = xlsx.read_rows(wb, "S")
    assert rows[0] == ["a", "b", 3.0]
    assert rows[1] == ["東京"]
