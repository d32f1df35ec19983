"""ORC source/sink roundtrip (io/orc_io.py): value fidelity including
timestamps, schema pinning, and predicate pushdown reaching the ORC scan."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from etl_excel_csv_sql_spark.io import orc_io


def test_orc_roundtrip_values_and_types(spark, tmp_path):
    src = spark.createDataFrame(
        [
            (1, "alpha", 1.5, datetime.datetime(2024, 3, 1, 12, 30)),
            (2, "beta", -2.25, datetime.datetime(2024, 3, 2, 0, 0)),
            (3, None, 0.0, None),
        ],
        "id bigint, name string, x double, ts timestamp",
    )
    path = str(tmp_path / "t_orc")
    orc_io.write_orc(src, path)
    back = orc_io.read_orc(
        spark, path, schema="id bigint, name string, x double, ts timestamp"
    )
    assert back.schema == src.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_orc_filter_pushdown_reaches_scan(spark, tmp_path):
    path = str(tmp_path / "big_orc")
    orc_io.write_orc(
        spark.range(0, 10000).select(
            F.col("id"), (F.col("id") % 13).alias("bucket")
        ),
        path,
    )
    df = orc_io.read_orc(spark, path, schema="id bigint, bucket bigint").filter(
        F.col("bucket") == 3
    ).select("id")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # native vectorized reader with the predicate pushed into the scan
    assert "PushedFilters: [" in plan and "bucket" in plan.split("PushedFilters")[1][:80]
    assert df.count() == 10000 // 13 + (1 if 3 < 10000 % 13 else 0)
