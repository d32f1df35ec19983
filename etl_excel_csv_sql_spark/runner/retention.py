"""Retention sweep (§2.11).

``FileHousekeeping.ps1`` states the intent — "If file is older than X
days, delete the file" over the monitored folders (FileHousekeeping.ps1:
3-13) — but its implementation stops after printing the folder list
(:39-85). This module implements the declared semantics: age by mtime,
delete past the horizon, with a dry-run mode and a report of what was (or
would be) removed.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass


@dataclass(frozen=True)
class SweptFile:
    path: str
    age_days: float
    deleted: bool


def retention_sweep(
    folders: list[str],
    max_age_days: float,
    delete: bool = True,
    now: float | None = None,
) -> list[SweptFile]:
    """Delete (or report, with ``delete=False``) every regular file under
    ``folders`` whose mtime is older than ``max_age_days``. Non-recursive,
    like the reference's per-folder monitoring list
    (FileHousekeeping.ps1:79). Missing folders are skipped silently (the
    reference guards each with Test-Path)."""
    now = time.time() if now is None else now
    horizon = now - max_age_days * 86400.0
    swept: list[SweptFile] = []
    for folder in folders:
        if not os.path.isdir(folder):
            continue
        for entry in sorted(os.scandir(folder), key=lambda e: e.path):
            if not entry.is_file():
                continue
            mtime = entry.stat().st_mtime
            if mtime >= horizon:
                continue
            deleted = delete
            if delete:
                # skip-and-report, like every other runner module (r10
                # review): one locked/permission-denied file used to
                # abort the whole sweep AND discard the partial report
                try:
                    os.remove(entry.path)
                except OSError:
                    deleted = False
            swept.append(
                SweptFile(
                    path=entry.path,
                    age_days=(now - mtime) / 86400.0,
                    deleted=deleted,
                )
            )
    return swept
