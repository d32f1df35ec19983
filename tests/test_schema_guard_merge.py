"""Schema drift guard + incremental merge sink."""

from __future__ import annotations

import os

from etl_excel_csv_sql_spark.io.jdbc import ParquetMergeSink
from etl_excel_csv_sql_spark.io.schema_guard import check_header, read_csv_checked
from etl_excel_csv_sql_spark.runner.folder_queue import FolderQueue


def test_check_header_classifies_drift():
    r = check_header(["a", "c", "x"], ["a", "b", "c"])
    assert r.missing == ("b",) and r.unexpected == ("x",) and not r.ok
    assert "missing" in r.describe() and "unexpected" in r.describe()
    r2 = check_header(["b", "a"], ["a", "b"])
    assert r2.ok and r2.reordered
    assert check_header(["a", "b"], ["a", "b"]).describe() == "ok"


def test_read_csv_checked_tolerates_reorder_quarantines_drift(spark, tmp_path):
    good = tmp_path / "drop" / "good.csv"
    bad = tmp_path / "drop" / "bad.csv"
    good.parent.mkdir()
    good.write_text("b,a\n2,1\n")           # reordered but complete
    bad.write_text("a,zzz\n1,9\n")          # missing b, unexpected zzz
    queue = FolderQueue(
        drop_dir=str(tmp_path / "drop"),
        processed_dir=str(tmp_path / "Processed"),
        error_dir=str(tmp_path / "Error"),
    )

    ok = read_csv_checked(spark, str(good), ["a", "b"], queue)
    assert ok is not None and ok.columns == ["a", "b"]
    assert ok.first().a == "1"              # projected to expected order

    drifted = read_csv_checked(spark, str(bad), ["a", "b"], queue)
    assert drifted is None
    assert not bad.exists()                 # quarantined to Error/
    assert any("bad.csv" in f for f in os.listdir(tmp_path / "Error"))


def test_merge_sink_upserts_and_preserves(spark, tmp_path):
    sink = ParquetMergeSink(str(tmp_path / "tbl"), keys=["id"])
    sink.upsert(spark, spark.createDataFrame(
        [(1, "v1"), (2, "v1"), (3, "v1")], ["id", "val"]
    ))
    # second increment: update id=2, insert id=4
    sink.upsert(spark, spark.createDataFrame(
        [(2, "v2"), (4, "v2")], ["id", "val"]
    ))
    got = {r.id: r.val for r in sink.read(spark).collect()}
    assert got == {1: "v1", 2: "v2", 3: "v1", 4: "v2"}
    # idempotent re-apply of the same increment changes nothing
    sink.upsert(spark, spark.createDataFrame([(2, "v2")], ["id", "val"]))
    assert {r.id: r.val for r in sink.read(spark).collect()} == got
