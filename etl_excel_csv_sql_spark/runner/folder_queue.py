"""Drop-folder queue lifecycle (T2, T3 file-level, K6).

The reference uses folders as a message queue: a source drops
``<name>.csv``; the import picks it up if present (CSVtoSQLimport.ps1:
164-168), processes it, then moves it to ``Processed/`` prefixed with a
``yyyy.MM.dd HH.mm`` timestamp (:257-264). Files that fail validation or
connection stay in place for the next cycle (:175-180,190-194) — an
at-least-once queue with archive-on-success.

Structured Streaming's file source + ``cleanSource=archive`` is the
built-in twin (streaming.file_source); this explicit runner provides the
same semantics for scheduled-batch deployments and for tests.
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass, field
from datetime import datetime
from enum import Enum
from typing import Callable

from etl_excel_csv_sql_spark.io.csv_io import collision_free_path as _collision_free
from etl_excel_csv_sql_spark.runner.errorlog import ErrorLog


class Outcome(str, Enum):
    PROCESSED = "processed"     # archived to Processed/
    SKIPPED = "skipped"         # precondition failed; left in place (T3)
    QUARANTINED = "quarantined" # moved to Error/ (poison file)


@dataclass
class FolderQueue:
    drop_dir: str
    processed_dir: str
    error_dir: str
    pattern: str = ".csv"
    errorlog: ErrorLog | None = field(default=None)
    #: paths the HANDLER quarantined mid-process_all (so the drain can
    #: report QUARANTINED instead of misfiling the vanished file as
    #: SKIPPED/"left for next cycle" when its archive move fails)
    _quarantined: set = field(default_factory=set, repr=False)

    def __post_init__(self) -> None:
        if self.errorlog is None:
            self.errorlog = ErrorLog(self.error_dir)

    def pending(self) -> list[str]:
        """Files currently waiting in the drop folder (sorted — stable
        processing order)."""
        if not os.path.isdir(self.drop_dir):
            return []
        # case-insensitive suffix match: the reference runs on NTFS where
        # '*.CSV' matches; a case-sensitive match here would leave such a
        # file invisible forever — never processed, never logged
        return sorted(
            os.path.join(self.drop_dir, f)
            for f in os.listdir(self.drop_dir)
            if f.lower().endswith(self.pattern.lower())
        )

    def archive(self, path: str, now: datetime | None = None) -> str:
        """K6: move to Processed/ as ``<yyyy.MM.dd HH.mm> <name>``
        (CSVtoSQLimport.ps1:257-264)."""
        os.makedirs(self.processed_dir, exist_ok=True)
        stamp = (now or datetime.now()).strftime("%Y.%m.%d %H.%M")
        dest = _collision_free(
            os.path.join(self.processed_dir, f"{stamp} {os.path.basename(path)}")
        )
        shutil.move(path, dest)
        return dest

    def quarantine(self, path: str, reason: str, now: datetime | None = None) -> str:
        """Move a poison FILE to Error/ with a timestamped name and log it
        (file-level T3; row-level quarantine is io.jdbc.quarantine_split)."""
        os.makedirs(self.error_dir, exist_ok=True)
        stamp = (now or datetime.now()).strftime("%Y.%m.%d %H.%M")
        dest = _collision_free(
            os.path.join(self.error_dir, f"{stamp} {os.path.basename(path)}")
        )
        self.errorlog.log(f"{reason}: {path} moved to {dest}", fatal=False)
        shutil.move(path, dest)
        self._quarantined.add(os.path.abspath(path))
        return dest

    def process_all(
        self, handler: Callable[[str], None], now: datetime | None = None
    ) -> dict[str, Outcome]:
        """At-least-once drain: for each pending file run ``handler``;
        success → archive (consume-once), exception → log NotFatal and
        LEAVE THE FILE IN PLACE for the next cycle (the reference's
        skip-and-continue, CSVtoSQLimport.ps1:175-180). Returns
        {path: outcome}."""
        results: dict[str, Outcome] = {}
        for path in self.pending():
            # a stale entry from a PRIOR iteration must not leak forward
            # (ADVICE r9): if the handler quarantined this path and THEN
            # raised, the except branch below never consumed the set
            # entry, and a later file dropped at the same path would be
            # misreported QUARANTINED — never archived, side effects
            # re-run every cycle. Each file's verdict starts clean.
            self._quarantined.discard(os.path.abspath(path))
            try:
                handler(path)
            except Exception as exc:  # log-and-continue semantics
                self.errorlog.log(f"{exc} (file {path} left for next cycle)")
                results[path] = Outcome.SKIPPED
                continue
            # handler quarantined the file itself: it is in Error/, not
            # pending — archiving the vanished path would raise and the
            # drain used to misreport it SKIPPED/"left for next cycle"
            if os.path.abspath(path) in self._quarantined:
                self._quarantined.discard(os.path.abspath(path))
                results[path] = Outcome.QUARANTINED
                continue
            try:
                self.archive(path, now)
            except OSError as exc:  # same contract for the move itself
                self.errorlog.log(
                    f"{exc} (archive failed; {path} left for next cycle)"
                )
                results[path] = Outcome.SKIPPED
                continue
            results[path] = Outcome.PROCESSED
        return results
