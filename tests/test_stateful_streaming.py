"""applyInPandasWithState: custom per-key state surviving query restarts."""

from __future__ import annotations

import os

from pyspark.sql.types import LongType, StructField, StructType

from etl_excel_csv_sql_spark.streaming.stateful import running_user_totals

_SCHEMA = StructType(
    [StructField("user_id", LongType()), StructField("value", LongType())]
)


def _drain(spark, drop_dir, ckpt, out_dir):
    # memory sink cannot recover from a checkpoint; foreachBatch can — and
    # is also the production shape for update-mode custom-state output
    stream = spark.readStream.schema(_SCHEMA).json(drop_dir)

    def sink(batch_df, _batch_id):
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        running_user_totals(stream)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return {
        (r.user_id): (r.batch_events, r.total_events)
        for r in spark.read.parquet(out_dir).collect()
    }


def test_state_accumulates_across_restarts(spark, tmp_path):
    drop = tmp_path / "drop"
    drop.mkdir()
    ckpt = str(tmp_path / "ckpt")
    (drop / "b1.json").write_text(
        '{"user_id": 1, "value": 10}\n'
        '{"user_id": 1, "value": 11}\n'
        '{"user_id": 2, "value": 20}\n'
    )
    first = _drain(spark, str(drop), ckpt, str(tmp_path / "out1"))
    assert first == {1: (2, 2), 2: (1, 1)}

    # restart the query (new run, same checkpoint) with a second batch:
    # per-batch deltas reset, lifetime totals continue from restored state
    (drop / "b2.json").write_text(
        '{"user_id": 1, "value": 12}\n'
        '{"user_id": 3, "value": 30}\n'
    )
    second = _drain(spark, str(drop), ckpt, str(tmp_path / "out2"))
    assert second == {1: (1, 3), 3: (1, 1)}
    assert os.path.isdir(os.path.join(ckpt, "state"))  # state store on disk


def test_running_totals_custom_key_column_and_schema(spark):
    """r10 review: the output key column follows user_col (it was
    hardcoded 'user_id'), keeps the input's type, and is declared
    nullable so a null grouping key cannot crash the Arrow boundary."""
    from etl_excel_csv_sql_spark.streaming.stateful import (
        running_user_totals,
    )

    events = spark.createDataFrame(
        [("a", 1), ("a", 2), (None, 3)], "account_id string, x int"
    )
    out = running_user_totals(events, user_col="account_id")
    assert out.columns == ["account_id", "batch_events", "total_events"]
    f = out.schema.fields[0]
    assert f.dataType.simpleString() == "string" and f.nullable
