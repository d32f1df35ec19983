"""Salted-join equivalence and streaming dedup semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_excel_csv_sql_spark.operators.relational import salted_join
from etl_excel_csv_sql_spark.streaming.dedup import dedupe_document_stream
from etl_excel_csv_sql_spark.streaming.file_source import (
    run_available_now_to_memory,
)


def test_salted_join_equals_plain_join(spark):
    # heavily skewed big side: 90% of rows share key 1
    big = spark.createDataFrame(
        [(1 if i % 10 else i, f"row{i}") for i in range(1000)], ["k", "payload"]
    )
    small = spark.createDataFrame(
        [(i, f"dim{i}") for i in range(0, 1000, 10)] + [(1, "dim1")],
        ["k2", "label"],
    )
    plain = (
        big.join(small, big.k == small.k2)
        .select("k", "payload", "label")
        .collect()
    )
    salted = salted_join(big, small, "k", "k2", salt=8).collect()
    assert sorted(map(tuple, salted)) == sorted(map(tuple, plain))
    # 900 hot-key (k=1) rows + the 100 multiple-of-10 rows
    assert len(salted) == 1000


def test_salted_join_left_keeps_unmatched(spark):
    big = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    small = spark.createDataFrame([(1, "dim")], ["k2", "label"])
    out = salted_join(big, small, "k", "k2", salt=4, how="left").collect()
    rows = {r.k: r.label for r in out}
    assert rows == {1: "dim", 2: None}


def test_streaming_document_dedup(spark, tmp_path):
    src = str(tmp_path / "docs_src")
    spark.createDataFrame(
        [
            ("2024-01-01 10:00:00", 1, "Hello   World"),
            ("2024-01-01 10:10:00", 2, "hello world"),   # dup after normalize
            ("2024-01-01 10:20:00", 3, "something else"),
        ],
        ["ts_s", "doc_id", "text"],
    ).select(
        F.col("ts_s").cast("timestamp").alias("ts"), "doc_id", "text"
    ).write.mode("overwrite").parquet(src)

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    stream = spark.readStream.schema(
        StructType(
            [
                StructField("ts", TimestampType()),
                StructField("doc_id", LongType()),
                StructField("text", StringType()),
            ]
        )
    ).parquet(src)
    deduped = dedupe_document_stream(stream, delay="1 hour")
    run_available_now_to_memory(deduped, "dedup_out", str(tmp_path / "ck"))
    got = sorted(r.doc_id for r in spark.table("dedup_out").collect())
    # one of doc 1/2 survives (whichever the batch saw first), doc 3 always
    assert len(got) == 2 and 3 in got and (1 in got or 2 in got)


def test_table_fingerprint_invariant_to_layout(spark):
    from etl_excel_csv_sql_spark.operators.relational import table_fingerprint

    df = spark.createDataFrame(
        [(i, f"v{i}", i * 1.5) for i in range(5000)], ["id", "s", "x"]
    )
    base = table_fingerprint(df).first()
    shuffled = table_fingerprint(
        df.repartition(17, "s").sortWithinPartitions("x")
    ).first()
    assert (base.n_rows, base.fingerprint) == (shuffled.n_rows, shuffled.fingerprint)
    # any content change moves the checksum
    mutated = table_fingerprint(
        df.withColumn("x", df.x + (df.id == 4999).cast("double"))
    ).first()
    assert mutated.fingerprint != base.fingerprint


def test_table_fingerprint_sees_null_position(spark):
    # xxhash64 skips NULL inputs, so without null-normalization
    # ('a', NULL) and (NULL, 'a') hash identically and NULL-position
    # corruption is invisible to a migration checksum (ADVICE r2).
    from etl_excel_csv_sql_spark.operators.relational import table_fingerprint

    a = spark.createDataFrame([("a", None)], "c1 string, c2 string")
    b = spark.createDataFrame([(None, "a")], "c1 string, c2 string")
    fa = table_fingerprint(a).first().fingerprint
    fb = table_fingerprint(b).first().fingerprint
    assert fa != fb


def test_salted_join_rejects_outer_and_semi(spark):
    """Under salting the small side exists in `salt` replicas: a
    right/full join would emit every unmatched replica and semi/anti
    drop the selected columns — all silently wrong, hence the guard."""
    import pytest

    from etl_excel_csv_sql_spark.operators.relational import salted_join

    big = spark.createDataFrame([(1, "x")], ["k", "v"])
    small = spark.createDataFrame([(1, "y")], ["k2", "w"])
    for how in ("full", "right", "left_semi", "left_anti"):
        with pytest.raises(ValueError, match="salted_join"):
            salted_join(big, small, "k", "k2", salt=4, how=how)
    assert salted_join(big, small, "k", "k2", salt=4).count() == 1
