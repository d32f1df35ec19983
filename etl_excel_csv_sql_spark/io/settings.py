"""Key=value settings-file catalog (S4, S6 — the reference's "catalog").

The reference drives *which tables exist and how they load* from flat
``key=value`` text files discovered by suffix glob:

- parse: ``Get-Content | split`` with delimiter ``=``
  (ExcelToCSVexport.ps1:77-80, FileHousekeeping.ps1:48-51) or ``==``
  (CSVtoSQLimport.ps1:140-143, InvoiceFileSearchFromSQL.ps1:23-26) —
  an inconsistency we accept transparently (SURVEY §2.12#4): ``==`` is
  tried first so both formats parse with one loader.
- discover: ``Get-ChildItem -Filter *_export_settings.txt`` etc.
  (ExcelToCSVexport.ps1:61, CSVtoSQLimport.ps1:96, FileHousekeeping.ps1:18).
- derived source name: settings basename minus the suffix
  (``orders_import_settings.txt`` → ``orders``; CSVtoSQLimport.ps1:158,
  ExcelToCSVexport.ps1:114-115).
- comma-split list values with real trimming (fixing the malformed
  ``ForEach-Object trim($it)`` no-op, ExcelToCSVexport.ps1:111,
  SURVEY §2.12#2).
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass


def parse_settings_text(text: str) -> dict[str, str]:
    """One ``key=value`` (or ``key==value``) pair per line; blank lines and
    ``#`` comments ignored; later duplicates win (the reference's hashtable
    assignment order)."""
    out: dict[str, str] = {}
    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        # Delimiter rule: split at the FIRST '='; it is the '==' form
        # exactly when the character right after is ALSO '='. Trying
        # '==' first mis-parsed any single-'=' line whose VALUE contains
        # '==' — base64 padding ('apiKey=YWJjZA==') lost the key
        # entirely and require() reported the secret missing
        # (code-review r9 catch).
        eq = line.find("=")
        if eq < 0:
            continue
        if eq + 1 < len(line) and line[eq + 1] == "=":
            key, value = line[:eq], line[eq + 2:]
        else:
            key, value = line[:eq], line[eq + 1:]
        out[key.strip()] = value.strip()
    return out


def parse_settings_file(path: str) -> dict[str, str]:
    with open(path, encoding="utf-8") as fh:
        return parse_settings_text(fh.read())


def split_list(value: str | None) -> list[str]:
    """Comma-split + trim, dropping empties — the intended semantics of the
    reference's sheet/field lists (ExcelToCSVexport.ps1:111,
    CSVtoSQLimport.ps1:236)."""
    if not value:
        return []
    return [part.strip() for part in value.split(",") if part.strip()]


@dataclass(frozen=True)
class SettingsEntry:
    """One discovered settings file: its derived source name + parsed
    key/value map."""

    path: str
    source_name: str
    values: dict[str, str]


def discover_settings(folder: str, suffix: str) -> list[SettingsEntry]:
    """S4: every ``*<suffix>`` file in ``folder`` (sorted for determinism),
    parsed, with the source name derived by stripping the suffix from the
    basename (CSVtoSQLimport.ps1:158)."""
    entries = []
    # glob.escape: a folder named 'run [prod]' is a character class to
    # glob and every settings file in it would be silently skipped
    for path in sorted(
        glob.glob(os.path.join(glob.escape(folder), f"*{suffix}"))
    ):
        base = os.path.basename(path)
        entries.append(
            SettingsEntry(
                path=path,
                # removesuffix: base[:-len('')] is base[:0] — an empty
                # suffix used to collapse every source name to ''
                source_name=base.removesuffix(suffix) if suffix else base,
                values=parse_settings_file(path),
            )
        )
    return entries


def require(values: dict[str, str], keys: list[str]) -> list[str]:
    """P7: which required params are missing/empty
    (ExcelToCSVexport.ps1:87-90, CSVtoSQLimport.ps1:170-180). Returns the
    missing key names; caller decides skip-or-abort."""
    return [k for k in keys if not values.get(k, "").strip()]
