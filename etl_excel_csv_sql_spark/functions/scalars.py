"""Scalar functions replicating the reference's per-cell behaviors.

Reference provenance (all PowerShell, /root/reference):
- SanitizeString            CSVtoSQLimport.ps1:59-78
- ConvertExcelDateToSQL     CSVtoSQLimport.ps1:80-92
- EncloseWithBrackets       CSVtoSQLimport.ps1:49-57
- CustomerRef path scrub    InvoiceFileSearchFromSQL.ps1:88-90
- filename composition      InvoiceFileSearchFromSQL.ps1:101-102
- timestamp formatting      ExcelToCSVexport.ps1:29-32, CSVtoSQLimport.ps1:258

All are pure column expressions (JVM-side); none require a UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Column | str

#: True Excel epoch (accounts for the 1900 leap-year bug): serial 1 is
#: 1899-12-31, serial 60 is the phantom 1900-02-29 — for serials > 60 the
#: 1899-12-30 origin yields the dates Excel displays.
EXCEL_ORIGIN_TRUE = "1899-12-30"
#: The origin the reference hard-codes (CSVtoSQLimport.ps1:84); off by two
#: days from Excel's displayed dates. Kept for byte-compat mode.
EXCEL_ORIGIN_REFERENCE = "1900-01-01"

#: Keywords the reference wraps in double brackets (CSVtoSQLimport.ps1:63-75).
_SQL_KEYWORDS = (
    "SELECT",
    "INSERT",
    "UPDATE",
    "DELETE",
    "DROP",
    "ALTER",
    "CREATE",
    # EXECUTE before EXEC: regex alternation is leftmost-first in both Java
    # regex (Spark) and RE2 (DuckDB oracle); the longer keyword must win.
    "EXECUTE",
    "EXEC",
    "UNION",
    "TRUNCATE",
)


def _col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


def excel_serial_to_timestamp(
    serial: ColumnOrName, origin: str = EXCEL_ORIGIN_TRUE
) -> Column:
    """Excel serial day number (double) → timestamp.

    Mirrors ConvertExcelDateToSQL (CSVtoSQLimport.ps1:80-92): fractional
    days become time-of-day, rounded to the nearest second; non-numeric /
    null input yields null (the reference logs and returns $null — callers
    quarantine nulls, see runner.quarantine_split).

    ``origin`` defaults to the true Excel epoch; pass
    ``EXCEL_ORIGIN_REFERENCE`` to reproduce the reference's +2-day skew.
    """
    # try_cast: malformed input → null (the reference's log-and-$null),
    # including under Spark 4's default ANSI mode where cast would throw
    serial_d = _col(serial).try_cast("double")
    seconds = F.round(serial_d * F.lit(86400.0)).cast("long")
    base = F.unix_timestamp(F.to_timestamp(F.lit(f"{origin} 00:00:00")))
    return F.when(serial_d.isNotNull(), F.timestamp_seconds(base + seconds))


def sanitize_sql_string(value: ColumnOrName) -> Column:
    """Reference-compatible cell sanitizer (CSVtoSQLimport.ps1:59-78):
    strip ``'``, ``;`` and ``--``, then wrap bare SQL keywords in ``[[...]]``.

    Unnecessary under typed/parameterized JDBC writes (the engine's default
    sink is injection-free by construction); exposed for byte-compat mode.
    """
    cleaned = F.regexp_replace(_col(value), r"--|'|;", "")
    keyword_alt = "|".join(_SQL_KEYWORDS)
    return F.regexp_replace(cleaned, rf"(?i)\b({keyword_alt})\b", r"[[$1]]")


def scrub_path_chars(value: ColumnOrName, replacement: str = " ") -> Column:
    """Replace path separators ``\\`` and ``/`` (user-typed fields used in
    filenames; InvoiceFileSearchFromSQL.ps1:88-90)."""
    return F.regexp_replace(_col(value), r"[\\/]", replacement)


def compose_filename(*parts: ColumnOrName, sep: str = " - ") -> Column:
    """``"{invnum} - {customerRef} - {fileName}"`` composition
    (InvoiceFileSearchFromSQL.ps1:101-102)."""
    return F.concat_ws(sep, *[_col(p).cast("string") for p in parts])


def format_timestamp(ts: ColumnOrName, fmt: str = "yyyy.MM.dd HH.mm") -> Column:
    """Timestamp → string in the reference's archive/log naming formats
    (``yyyy.MM.dd HH.mm`` CSVtoSQLimport.ps1:258, ``yyyyMMdd``
    ExcelToCSVexport.ps1:32)."""
    return F.date_format(_col(ts), fmt)


def enclose_with_brackets(identifier: str) -> str:
    """SQL identifier quoting (CSVtoSQLimport.ps1:49-57). The reference only
    brackets names containing spaces; we bracket whenever not already
    bracketed (strictly safer, same output for the reference's inputs).

    Driver-side helper (plain str), used by the JDBC sink when building DDL.
    """
    if identifier.startswith("[") and identifier.endswith("]"):
        return identifier
    return f"[{identifier}]"


# .NET ticks (the reference's watermark unit, ExcelToCSVexport.ps1:154,225):
# 100 ns intervals since 0001-01-01T00:00:00.
_TICKS_AT_UNIX_EPOCH = 621_355_968_000_000_000


def ticks_to_unix_seconds(ticks: int) -> float:
    return (ticks - _TICKS_AT_UNIX_EPOCH) / 10_000_000


def unix_seconds_to_ticks(seconds: float) -> int:
    return int(round(seconds * 10_000_000)) + _TICKS_AT_UNIX_EPOCH
