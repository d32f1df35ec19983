"""VERDICT r9 #4: drive the Excel staging engines up the scale curve.

The r9 42x arrow-engine win was measured on a 16-sheet x 5k-row fixture;
this probe builds a many-sheet, deep-row workbook (default 50 x 40k —
25x the r9 cell count), stages it with the thread (spark-writer) and
process (arrow-writer) engines, verifies VALUE PARITY between the two
staged outputs, and appends an `excel_stage_bench` row to
.benchmarks/history.jsonl.

Usage: python tools/excel_stage_probe.py [n_sheets] [rows_per_sheet]
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_sheets = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    n_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 40_000

    from etl_excel_csv_sql_spark.io import xlsx
    from etl_excel_csv_sql_spark.io.excel import stage_workbook_to_parquet
    from etl_excel_csv_sql_spark.session import get_spark

    spark = get_spark(
        "excel_stage_probe",
        conf={"spark.sql.shuffle.partitions": "32", "spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    with tempfile.TemporaryDirectory() as tmp:
        wb = os.path.join(tmp, "big.xlsx")
        t0 = time.time()
        sheets = {
            f"Sheet{i:02d}": [["id", "val", "note"]]
            + [[f"r{i}-{j}", float(j), f"n{j % 97}"] for j in range(n_rows)]
            for i in range(n_sheets)
        }
        xlsx.write_workbook(wb, sheets)
        gen_sec = time.time() - t0
        wb_mb = os.path.getsize(wb) / 1e6
        del sheets
        print(f"workbook: {n_sheets} sheets x {n_rows} rows, "
              f"{wb_mb:.1f} MB, built in {gen_sec:.1f}s", flush=True)

        t0 = time.time()
        thr = stage_workbook_to_parquet(
            spark, wb, os.path.join(tmp, "thr"), max_workers=8,
            engine="spark",
        )
        threads8_sec = round(time.time() - t0, 3)
        print(f"threads8: {threads8_sec}s", flush=True)

        t0 = time.time()
        arr = stage_workbook_to_parquet(
            spark, wb, os.path.join(tmp, "arr"), max_workers=16,
            engine="arrow",
        )
        arrow16_sec = round(time.time() - t0, 3)
        print(f"arrow16:  {arrow16_sec}s", flush=True)

        # value parity across engines, checked distributed (no driver
        # materialization of 2M rows): row-hash aggregate per sheet
        from pyspark.sql import functions as F

        def sheet_fingerprint(path: str) -> tuple[int, int]:
            df = spark.read.parquet(path)
            # decimal sum: order-independent, duplicate-sensitive, and
            # immune to ANSI long-overflow on 40k 64-bit hashes
            row = df.select(
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    F.xxhash64(*df.columns).cast("decimal(38,0)")
                ).alias("h"),
            ).collect()[0]
            return row.n, row.h

        assert list(thr) == list(arr)
        mismatch = [
            s for s in thr
            if sheet_fingerprint(thr[s]) != sheet_fingerprint(arr[s])
        ]
        assert not mismatch, f"engine outputs differ: {mismatch}"
        print("value parity: OK", flush=True)

    row = {
        "ts": time.time(),
        "metric": "excel_stage_bench",
        "n_sheets": n_sheets,
        "n_rows_per_sheet": n_rows,
        "workbook_mb": round(wb_mb, 1),
        "threads8_sec": threads8_sec,
        "arrow16_sec": arrow16_sec,
        "speedup_arrow16_vs_threads8": round(threads8_sec / arrow16_sec, 2),
        "load1_start": os.getloadavg()[0],
    }
    with open(".benchmarks/history.jsonl", "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row))


if __name__ == "__main__":
    main()
