"""Per-row file-copy side effects (K8).

The reference copies each matched invoice document to a destination under
a composed name, skipping already-copied files, and counts the copies
(InvoiceFileSearchFromSQL.ps1:99-114; note the reference as-shipped never
reaches this loop — stray ``exit`` at :80, SURVEY §2.12#1 — we implement
the intended semantics).

The plan (src_path, dst_name) is a DataFrame built by
operators.invoice.compose_copy_plan; execution runs on EXECUTORS via
foreachPartition so 10⁹ copies distribute across the cluster — nothing is
collected to the driver. Idempotent: existing destinations are skipped
(T4 re-run safety).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def execute_copy_plan(
    plan: DataFrame,
    src_root: str,
    dst_root: str,
    src_col: str = "src_path",
    dst_col: str = "dst_name",
) -> dict[str, int]:
    """Execute the copy manifest; returns
    ``{"found": n, "copied": n, "missing": n, "skipped": n}``.

    Counting uses Spark accumulators (the distributed twin of the
    reference's ``$foundFiles++``, InvoiceFileSearchFromSQL.ps1:99) so the
    tallies survive task retries' last-winner semantics well enough for
    reporting; exact once-only accounting would hash the manifest after
    the fact. ``src_root``/``dst_root`` must be visible to every executor
    (shared filesystem — same deployment assumption as the reference's
    SMB paths)."""
    sc = plan.sparkSession.sparkContext
    found = sc.accumulator(0)
    copied = sc.accumulator(0)
    missing = sc.accumulator(0)
    skipped = sc.accumulator(0)

    rows = plan.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )

    def run_partition(it):
        os.makedirs(dst_root, exist_ok=True)
        for row in it:
            src = os.path.join(src_root, row.src)
            dst = os.path.join(dst_root, row.dst)
            if not os.path.exists(src):
                missing.add(1)  # reference logs NotFatal and continues (:97)
                continue
            found.add(1)
            if os.path.exists(dst):
                skipped.add(1)  # idempotent re-run (:107)
                continue
            shutil.copyfile(src, dst)
            copied.add(1)

    rows.foreachPartition(run_partition)
    return {
        "found": found.value,
        "copied": copied.value,
        "missing": missing.value,
        "skipped": skipped.value,
    }
