"""§2.11 retention sweep — the behavior FileHousekeeping.ps1 declares
(":3-13") but never implements."""

from __future__ import annotations

import os
import time

from etl_excel_csv_sql_spark.runner.retention import retention_sweep


def _touch(path, age_days, now):
    path.write_text("x")
    mtime = now - age_days * 86400
    os.utime(path, (mtime, mtime))


def test_sweep_deletes_only_old_files(tmp_path):
    now = time.time()
    _touch(tmp_path / "ancient.csv", 40, now)
    _touch(tmp_path / "fresh.csv", 1, now)
    (tmp_path / "subdir").mkdir()  # non-files are ignored (non-recursive)

    swept = retention_sweep([str(tmp_path)], max_age_days=30, now=now)
    assert [os.path.basename(s.path) for s in swept] == ["ancient.csv"]
    assert swept[0].deleted and swept[0].age_days > 30
    assert not (tmp_path / "ancient.csv").exists()
    assert (tmp_path / "fresh.csv").exists()


def test_dry_run_reports_without_deleting(tmp_path):
    now = time.time()
    _touch(tmp_path / "old.csv", 90, now)
    swept = retention_sweep([str(tmp_path)], 30, delete=False, now=now)
    assert len(swept) == 1 and not swept[0].deleted
    assert (tmp_path / "old.csv").exists()


def test_missing_folder_is_skipped(tmp_path):
    assert retention_sweep([str(tmp_path / "nope")], 1) == []
