from __future__ import annotations

from pyspark.sql import functions as F

from etl_excel_csv_sql_spark.operators import jsonops


def _frame(spark):
    return spark.createDataFrame(
        [
            (1, '{"k": 87, "tag": "x"}'),
            (2, "not json"),
            (3, None),
            (4, '{"k": null}'),
            (5, '{"other": 1}'),
        ],
        ["id", "props"],
    )


def test_is_valid_json_semantics(spark):
    rows = (
        _frame(spark)
        .select("id", jsonops.is_valid_json("props").alias("ok"))
        .orderBy("id")
        .collect()
    )
    assert [r.ok for r in rows] == [True, False, False, True, True]


def test_typed_extract_malformed_degrades_to_null(spark):
    out = jsonops.typed_extract(_frame(spark), "props", "k INT, tag STRING")
    rows = {r.id: (r.k, r.tag) for r in out.collect()}
    assert rows[1] == (87, "x")
    assert rows[2] == (None, None)  # malformed: null fields, no failure
    assert rows[3] == (None, None)
    assert rows[4] == (None, None)  # explicit null
    assert rows[5] == (None, None)  # field absent


def test_kv_explode_drops_invalid(spark):
    out = jsonops.kv_explode(_frame(spark), "id", "props")
    pairs = {(r.id, r.key): r.value for r in out.collect()}
    assert pairs[(1, "k")] == "87"
    assert pairs[(1, "tag")] == "x"
    assert (4, "k") in pairs and pairs[(4, "k")] is None
    assert pairs[(5, "other")] == "1"
    ids = {i for (i, _k) in pairs}
    assert 2 not in ids and 3 not in ids  # malformed + NULL vanish


def test_payload_profile_counts(spark):
    df = _frame(spark).withColumn("grp", F.lit("g"))
    out = jsonops.json_payload_profile(df, "grp", "props", "k").collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_events == 5
    assert r.n_malformed == 1  # only id=2 (NULL is absent, not malformed)
    assert r.n_with_field == 1  # only id=1 has a non-null k
    assert r.avg_field == 87.0 and r.min_field == 87 and r.max_field == 87


def test_kv_explode_plan_is_narrow(spark):
    """Parsing must not introduce a shuffle: the physical plan of the
    explode path over a parquet scan has no Exchange."""
    df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    plan = (
        jsonops.kv_explode(df, "event_id", "props")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_variant_extract_typed_and_malformed(spark):
    from etl_excel_csv_sql_spark.operators import jsonops

    out = {
        r.id: r
        for r in jsonops.variant_extract(
            _frame(spark), "id", "props",
            {"k_int": ("$.k", "int"), "tag": ("$.tag", "string")},
        ).collect()
    }
    assert out[1].is_valid and out[1].k_int == 87 and out[1].tag == "x"
    assert not out[2].is_valid and out[2].k_int is None  # malformed
    assert not out[3].is_valid  # NULL payload
    assert out[4].is_valid and out[4].k_int is None  # explicit null
    assert out[5].is_valid and out[5].k_int is None  # absent path


def test_typed_extract_parameterized_types(spark):
    """DDL with commas inside type parameters must not break field-name
    derivation (DECIMAL(10,2) regression guard)."""
    df = spark.createDataFrame([(1, '{"k": 3, "d": "12.345"}')], ["id", "props"])
    out = jsonops.typed_extract(df, "props", "k INT, d DECIMAL(10,2)").collect()[0]
    assert out.k == 3
    assert float(out.d) == 12.35  # decimal(10,2) rounds on parse


def test_is_valid_json_accepts_arrays_and_scalars(spark):
    """r10 review: DuckDB json_valid parity — arrays and scalar roots
    are valid JSON; the old map<string,string> parse called them
    malformed."""
    from pyspark.sql import functions as F

    from etl_excel_csv_sql_spark.operators.jsonops import is_valid_json

    vals = ['{"k":1}', "[1,2]", "123", '"s"', "null", "true", "{bad", "", None]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = {r.s: r.ok for r in df.select(
        "s", is_valid_json("s").alias("ok")).collect()}
    assert got['{"k":1}'] and got["[1,2]"] and got["123"]
    assert got['"s"'] and got["null"] and got["true"]
    assert not got["{bad"] and not got[""] and not got[None]
