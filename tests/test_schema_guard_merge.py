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


def test_scd2_apply_generations_and_close_missing(spark):
    from pyspark.sql import functions as F

    from etl_excel_csv_sql_spark.operators.relational import scd2_apply

    t0 = F.lit("2024-01-01 00:00:00").cast("timestamp")
    t1 = F.lit("2024-06-01 00:00:00").cast("timestamp")
    t2 = F.lit("2024-12-01 00:00:00").cast("timestamp")
    dim = spark.createDataFrame(
        [(1, "A"), (2, "B"), (3, None)], ["k", "attr"]
    ).select("k", "attr", t0.alias("valid_from"),
             F.lit(None).cast("timestamp").alias("valid_to"))

    # snapshot: 1 unchanged, 2 changed, 3 unchanged (null attr, null-safe),
    # 4 brand new
    snap1 = spark.createDataFrame(
        [(1, "A"), (2, "B2"), (3, None), (4, "D")], ["k", "attr"]
    )
    g1 = scd2_apply(dim, snap1, ["k"], ["attr"], t1)
    rows = {(r.k, r.attr, r.valid_to is None) for r in g1.collect()}
    assert (1, "A", True) in rows          # unchanged stays open
    assert (2, "B", False) in rows         # old version closed
    assert (2, "B2", True) in rows         # new version open
    assert (3, None, True) in rows         # null attr compares null-safe
    assert (4, "D", True) in rows          # new key
    assert len(rows) == 5

    # second generation: key 4 disappears; close_missing retires it
    snap2 = spark.createDataFrame([(1, "A"), (2, "B2"), (3, None)], ["k", "attr"])
    g2 = scd2_apply(g1, snap2, ["k"], ["attr"], t2, close_missing=True)
    got = {(r.k, r.attr): (r.valid_to is None) for r in g2.collect()
           if not (r.k == 2 and r.attr == "B")}
    assert got[(4, "D")] is False          # retired
    assert got[(1, "A")] and got[(2, "B2")] and got[(3, None)]
    # history row from generation 1 still present and closed
    hist = [r for r in g2.collect() if r.k == 2 and r.attr == "B"]
    assert len(hist) == 1 and hist[0].valid_to is not None


def test_scd2_apply_empty_tracked_cols(spark):
    """keys-only presence dimension: tracked_cols=[] used to raise
    TypeError (~None); matching keys must count as unchanged."""
    from pyspark.sql import functions as F

    from etl_excel_csv_sql_spark.operators.relational import scd2_apply

    dim = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", None)],
        "id int, valid_from string, valid_to string",
    ).select(
        "id",
        F.col("valid_from").cast("timestamp").alias("valid_from"),
        F.col("valid_to").cast("timestamp").alias("valid_to"),
    )
    snap = spark.createDataFrame([(1,), (2,)], "id int")
    out = scd2_apply(
        dim, snap, ["id"], [],
        effective_ts=F.to_timestamp(F.lit("2024-06-01 00:00:00")),
    )
    rows = {(r.id, r.valid_to is None) for r in out.collect()}
    # key 1 unchanged (still open), key 2 newly opened
    assert rows == {(1, True), (2, True)}


def test_read_csv_checked_multi_file_reordered_member_quarantined(
    spark, tmp_path
):
    """r10 review: with a directory path Spark takes the header from the
    FIRST file and maps sibling files' rows POSITIONALLY — a reordered
    sibling loaded with values swapped into the wrong columns while the
    guard reported ok. Every member file's own header is now checked."""
    import os

    from etl_excel_csv_sql_spark.io.schema_guard import read_csv_checked

    d = tmp_path / "feed"; d.mkdir()
    (d / "f1.csv").write_text("id,amount,date\n1,10,2024-01-01\n")
    (d / "f2.csv").write_text("id,date,amount\n2,2024-01-02,20\n")
    assert read_csv_checked(
        spark, str(d), ["id", "amount", "date"]
    ) is None

    # consistent members load fine
    (d / "f2.csv").write_text("id,amount,date\n2,20,2024-01-02\n")
    out = read_csv_checked(spark, str(d), ["id", "amount", "date"])
    rows = {r.id: r for r in out.collect()}
    assert rows["2"].amount == "20" and rows["2"].date == "2024-01-02"
    assert len(rows) == 2
    assert os.listdir(d)  # nothing quarantined
