"""Catalog timestamp normalization: the driver's testdata timestamp
flavor changed between rounds (TIMESTAMP(NANOS) → naive micros, which
Spark 4 infers as TIMESTAMP_NTZ), and NTZ broke every event-time API
(withWatermark, unix_micros). load_table must hand every consumer a
plain TIMESTAMP regardless of which flavor a drop carries."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import types as T

from etl_excel_csv_sql_spark.catalog import TABLES, load_table


def test_events_ts_is_timestamp(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    assert isinstance(ev.schema["ts"].dataType, T.TimestampType)


def test_no_ntz_survives_any_table(spark, sf_dir):
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        ntz = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, T.TimestampNTZType)
        ]
        assert not ntz, f"{name} still exposes TIMESTAMP_NTZ: {ntz}"


def test_ntz_parquet_normalizes_with_identical_digits(spark, tmp_path):
    """Write an explicitly-NTZ parquet the way DuckDB/pandas would and
    prove the normalized read keeps the same wall-clock digits (UTC
    session tz pins the interpretation)."""
    src = str(tmp_path / "ntz_events")
    naive = datetime.datetime(2024, 3, 1, 12, 34, 56, 789000)
    spark.createDataFrame(
        [(1, naive)],
        T.StructType(
            [
                T.StructField("event_id", T.LongType()),
                T.StructField("ts", T.TimestampNTZType()),
            ]
        ),
    ).write.mode("overwrite").parquet(src)
    raw = spark.read.parquet(src)
    assert isinstance(raw.schema["ts"].dataType, T.TimestampNTZType)

    from etl_excel_csv_sql_spark.catalog import _normalize_timestamps

    out = _normalize_timestamps(raw)
    assert isinstance(out.schema["ts"].dataType, T.TimestampType)
    row = out.selectExpr("date_format(ts, 'yyyy-MM-dd HH:mm:ss.SSS') AS s").first()
    assert row.s == "2024-03-01 12:34:56.789"


def test_event_time_apis_work_on_loaded_events(spark, sf_dir):
    """The exact two APIs that rejected NTZ must work on catalog output."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    # unix_micros: the sessionize path
    assert ev.select(F.unix_micros("ts").alias("us")).first().us is not None
    # withWatermark analyzes eagerly enough to raise on NTZ even in batch
    ev.withWatermark("ts", "1 hour")


def test_unknown_table_raises(spark, sf_dir):
    with pytest.raises(KeyError):
        load_table(spark, sf_dir, "nope")


def test_events_transient_error_does_not_flip_nanos_conf(spark, tmp_path):
    """r10 ADVICE: a transient events-read failure (missing file here)
    must re-raise, NOT set spark.sql.legacy.parquet.nanosAsLong — the
    blanket except flipped legacy parquet semantics for the whole
    session on unrelated error paths."""
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    with pytest.raises(Exception) as exc_info:
        load_table(spark, str(tmp_path / "no_such_dir"), "events")
    assert "NANOS" not in str(exc_info.value)
    assert (
        spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
        == "false"
    )
