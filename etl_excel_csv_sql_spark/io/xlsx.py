"""Minimal .xlsx reader/writer on the Python standard library only.

An .xlsx workbook is a ZIP of XML parts (ECMA-376 / ISO 29500 "Office Open
XML"). The environment has no openpyxl/xlsxwriter, so this module implements
the small subset the engine needs:

- reader: worksheet names, and cell values of one sheet (shared strings,
  inline strings, numbers, booleans) — enough to replicate the reference's
  ``Get-ExcelSheetInfo`` / ``Import-Excel -StartRow`` behaviors
  (ExcelToCSVexport.ps1:171,192).
- writer: string/number cells via inline strings — used by tests and by
  fixture generation; NOT a full-fidelity Excel writer (no styles, dates
  as serial numbers must be provided pre-converted).

Driver-side, single-file, streaming row parse (iterparse) — the Spark-side
scale path stages sheets to parquet immediately (io.excel).
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

_NS = {
    "m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main",
    "r": "http://schemas.openxmlformats.org/officeDocument/2006/relationships",
    "pr": "http://schemas.openxmlformats.org/package/2006/relationships",
}

_CELL_REF = re.compile(r"([A-Z]+)(\d+)")


def _col_index(ref: str, default: int = 0) -> int:
    """'A1' → 0, 'B3' → 1, 'AA7' → 26 (0-based column index). A missing
    or unparseable ``r`` attribute returns ``default`` — ECMA-376 makes
    r optional, and a cell without one belongs at the next sequential
    position (the caller passes len(cells)); collapsing all r-less
    cells to column A silently overwrote them onto each other (r10
    review)."""
    m = _CELL_REF.match(ref)
    if not m:
        return default
    acc = 0
    for ch in m.group(1):
        acc = acc * 26 + (ord(ch) - ord("A") + 1)
    return acc - 1


def sheet_names(path: str) -> list[str]:
    """Worksheet names in workbook order (Get-ExcelSheetInfo equivalent,
    ExcelToCSVexport.ps1:171)."""
    with zipfile.ZipFile(path) as zf:
        return sheet_names_zf(zf)


def _sheet_target(zf: zipfile.ZipFile, sheet: str) -> str:
    """Resolve a worksheet name to its zip part via workbook rels."""
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rid = None
    for s in wb.findall("m:sheets/m:sheet", _NS):
        if s.get("name") == sheet:
            rid = s.get(f"{{{_NS['r']}}}id")
            break
    if rid is None:
        raise KeyError(f"worksheet {sheet!r} not found; have {sheet_names_zf(zf)}")
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    for rel in rels.findall("pr:Relationship", _NS):
        if rel.get("Id") == rid:
            target = rel.get("Target", "")
            # absolute targets ('/xl/worksheets/sheet1.xml') are legal
            # OOXML (some third-party writers emit them) and are
            # package-root-relative — prefixing them doubled the path
            # into xl//xl/... and KeyError'd a valid workbook (r10
            # review); relative targets resolve against xl/
            if target.startswith("/"):
                return target.lstrip("/")
            return target if target.startswith("xl/") else f"xl/{target}"
    raise KeyError(f"no relationship for sheet {sheet!r}")


def sheet_names_zf(zf: zipfile.ZipFile) -> list[str]:
    root = ET.fromstring(zf.read("xl/workbook.xml"))
    return [s.get("name", "") for s in root.findall("m:sheets/m:sheet", _NS)]


_T_TAG = f"{{{_NS['m']}}}t"
_RPH_TAG = f"{{{_NS['m']}}}rPh"


def _string_item_text(el) -> str:
    """Concatenated cell text of an <si>/<is> element: a single <t> or
    rich-text runs <r><t>, EXCLUDING phonetic runs — <rPh> holds
    furigana-style reading guides whose <t> children are not cell
    content (Excel and openpyxl exclude them; naive .iter(t) corrupted
    East Asian strings by appending the reading, r10 review)."""
    if el.tag == _RPH_TAG:
        return ""
    if el.tag == _T_TAG:
        return el.text or ""
    return "".join(_string_item_text(ch) for ch in el)


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        data = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    return [
        _string_item_text(si)
        for si in ET.fromstring(data).findall("m:si", _NS)
    ]


def read_rows(path: str, sheet: str) -> list[list[str | float | bool | None]]:
    """All populated rows of one worksheet as dense lists (gaps → None).

    Cell types handled: shared string (t="s"), inline string
    (t="inlineStr"), formula string (t="str"), boolean (t="b"), and
    numeric (default). Numbers come back as float — the reference's
    all-string model stringifies them downstream."""
    with zipfile.ZipFile(path) as zf:
        target = _sheet_target(zf, sheet)
        shared = _shared_strings(zf)
        rows: list[list] = []
        c_tag = f"{{{_NS['m']}}}c"
        v_tag = f"{{{_NS['m']}}}v"
        row_tag = f"{{{_NS['m']}}}row"
        with zf.open(target) as fh:
            for _event, el in ET.iterparse(fh):
                if el.tag != row_tag:
                    continue
                cells: list = []
                for c in el.iter(c_tag):
                    # r-less cells append sequentially (ECMA-376)
                    idx = _col_index(c.get("r", ""), default=len(cells))
                    while len(cells) <= idx:
                        cells.append(None)
                    ctype = c.get("t", "n")
                    if ctype == "inlineStr":
                        cells[idx] = _string_item_text(c)
                        continue
                    v = c.find(v_tag)
                    if v is None or v.text is None:
                        cells[idx] = None
                    elif ctype == "s":
                        cells[idx] = shared[int(v.text)]
                    elif ctype == "str":
                        cells[idx] = v.text
                    elif ctype == "b":
                        cells[idx] = v.text == "1"
                    else:
                        cells[idx] = float(v.text)
                rows.append(cells)
                el.clear()  # streaming: free parsed rows
        return rows


# ---------------------------------------------------------------------------
# Writer (tests / fixtures): inline strings, no styles.
# ---------------------------------------------------------------------------

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
{overrides}
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""


def _col_letter(idx: int) -> str:
    letters = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        letters = chr(ord("A") + rem) + letters
    return letters


def write_workbook(path: str, sheets: dict[str, list[list]]) -> None:
    """Write {sheet_name: rows} to ``path``. Row cells may be str, int,
    float, bool, or None; strings become inline strings, numbers numeric
    cells (Excel date semantics = caller provides serial numbers)."""
    overrides = []
    wb_sheets = []
    wb_rels = []
    parts: dict[str, str] = {}
    for i, (name, rows) in enumerate(sheets.items(), start=1):
        part = f"xl/worksheets/sheet{i}.xml"
        overrides.append(
            f'<Override PartName="/{part}" ContentType="application/vnd.'
            'openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        )
        wb_sheets.append(
            f'<sheet name="{escape(name, {chr(34): "&quot;"})}" sheetId="{i}" r:id="rId{i}"/>'
        )
        wb_rels.append(
            f'<Relationship Id="rId{i}" Type="http://schemas.openxmlformats.'
            'org/officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i}.xml"/>'
        )
        xml_rows = []
        for r, row in enumerate(rows, start=1):
            cells = []
            for ci, val in enumerate(row):
                if val is None:
                    continue
                ref = f"{_col_letter(ci)}{r}"
                if isinstance(val, bool):
                    cells.append(f'<c r="{ref}" t="b"><v>{int(val)}</v></c>')
                elif isinstance(val, (int, float)):
                    cells.append(f'<c r="{ref}"><v>{val}</v></c>')
                else:
                    cells.append(
                        f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
                        f"{escape(str(val))}</t></is></c>"
                    )
            xml_rows.append(f'<row r="{r}">{"".join(cells)}</row>')
        parts[part] = (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<worksheet xmlns="http://schemas.openxmlformats.org/'
            'spreadsheetml/2006/main"><sheetData>'
            + "".join(xml_rows)
            + "</sheetData></worksheet>"
        )

    parts["[Content_Types].xml"] = _CONTENT_TYPES.format(
        overrides="\n".join(overrides)
    )
    parts["_rels/.rels"] = _ROOT_RELS
    parts["xl/workbook.xml"] = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f'<sheets>{"".join(wb_sheets)}</sheets></workbook>'
    )
    parts["xl/_rels/workbook.xml.rels"] = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        + "".join(wb_rels)
        + "</Relationships>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        for part_name, content in parts.items():
            zf.writestr(part_name, content)
