"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet dir, then compares row count, schema (column
names), and order-insensitive values. Usage:

    python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import sys
import time
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

from etl_excel_csv_sql_spark.catalog import TABLES  # noqa: E402


def non_scalar_columns(sdf) -> list[str]:
    """Columns the DRIVER's canonicalizer cannot hash (pandas sort_values →
    factorize dies on list/dict cells with `unhashable type`). The local
    gate must reject the exact same shapes or it masks driver failures —
    r4's `approx_quantiles_price` red row got through because norm_cell
    tuple-ized lists locally."""
    from pyspark.sql import types as T

    return [
        f"{f.name} ({f.dataType.simpleString()})"
        for f in sdf.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]


def norm_frame(df: pd.DataFrame) -> pd.DataFrame:
    # lowercase BEFORE sorting (r10 review): the schema gate compares
    # names case-insensitively, but a case-sensitive sort ('Z_total' <
    # 'a_key' in ASCII) paired mixed-case frames column-crosswise and
    # produced spurious mismatches (or masked real ones)
    lowered = [c.lower() for c in df.columns]
    # duplicate labels after lowercasing would make the rename produce
    # ambiguous pandas columns and a crosswise compare (r10 ADVICE) —
    # fail with a clear schema error instead
    assert len(set(lowered)) == len(lowered), (
        f"case-colliding column names: {sorted(df.columns)}"
    )
    df = df.rename(columns={c: c.lower() for c in df.columns})
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize cell values to comparable primitives — scalars only; the
    # non_scalar_columns() gate has already rejected array/map/struct
    # outputs, mirroring the driver's canonicalizer
    import numpy as np

    def norm_cell(v):
        # np.floating too (r10 review): Spark FloatType → np.float32,
        # which is NOT a float subclass — it skipped the 9-decimal
        # tolerance and false-mismatched against DuckDB doubles
        if isinstance(v, (float, np.floating)):
            return round(float(v), 9)
        if hasattr(v, "isoformat"):
            return v.isoformat()
        return v

    for c in df.columns:
        df[c] = df[c].map(norm_cell)
    rows = sorted(df.itertuples(index=False, name=None), key=lambda r: tuple(map(str, r)))
    return pd.DataFrame(rows, columns=df.columns)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from etl_excel_csv_sql_spark.session import get_spark

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures, passed, rows_only = [], 0, 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            frame = fn(spark, sf_dir)
            bad_cols = non_scalar_columns(frame)
            if bad_cols:
                failures.append(
                    (name, f"DRIVER-UNHASHABLE columns: {bad_cols} — the "
                     "driver's canonicalizer rejects array/map/struct "
                     "outputs; reshape to scalar columns (posexplode)")
                )
                print(f"  {name}: DRIVER-UNHASHABLE {bad_cols}")
                continue
            sdf = frame.toPandas()
        except Exception:
            failures.append((name, "SPARK ERROR:\n" + traceback.format_exc()))
            print(f"  {name}: SPARK ERROR")
            continue
        if name not in oracles:
            rows_only += 1
            print(f"  {name}: rows-only ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception:
            failures.append((name, "ORACLE ERROR:\n" + traceback.format_exc()))
            print(f"  {name}: ORACLE ERROR")
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"row count {len(sdf)} vs {len(odf)}")
        if sorted(map(str.lower, sdf.columns)) != sorted(map(str.lower, odf.columns)):
            problems.append(f"schema {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        if not problems:
            a, b = norm_frame(sdf), norm_frame(odf)
            b.columns = a.columns
            if not a.equals(b):
                neq = (a != b) & ~(a.isna() & b.isna())
                bad = neq.any(axis=1)
                diff = pd.concat(
                    [a[bad].head(5).add_suffix("_spark"), b[bad].head(5).add_suffix("_duck")],
                    axis=1,
                )
                problems.append(f"{int(bad.sum())} differing rows:\n{diff}")
        if problems:
            failures.append((name, "; ".join(str(p) for p in problems)))
            print(f"  {name}: MISMATCH ({time.time()-t0:.1f}s)")
        else:
            passed += 1
            print(f"  {name}: OK ({len(sdf)} rows, {time.time()-t0:.1f}s)")

    print(f"\n{passed} oracle-matched, {rows_only} rows-only, {len(failures)} failed")
    for name, msg in failures:
        print(f"\n=== {name} ===\n{msg[:3000]}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
