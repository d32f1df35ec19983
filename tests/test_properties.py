"""Property-based round-trip tests (SURVEY §5.2): arbitrary content must
survive the CSV and Excel paths, and the scalar library must hold its
invariants. Each property batches its examples into ONE Spark job (a job
per hypothesis example would be minutes per property)."""

from __future__ import annotations

import os
from datetime import datetime, timedelta, timezone

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from etl_excel_csv_sql_spark.functions.scalars import (
    EXCEL_ORIGIN_TRUE,
    excel_serial_to_timestamp,
    sanitize_sql_string,
)
from etl_excel_csv_sql_spark.io import csv_io, xlsx
from etl_excel_csv_sql_spark.io.excel import read_excel_sheet

# r16 (VERDICT r15 #2 — suite must finish inside the driver's verify
# budget): the property batteries run 2 deterministic examples by
# default (derandomize pins hypothesis's generation seed, so the default
# run checks the SAME cases every time — a deterministic sample of the
# full battery) and the full 5-6 randomized examples under
# SPARK_GRAFT_FULL_TESTS=1. Every property/assertion is unchanged; only
# the example count per property scales. Measured: this module 270s ->
# ~110s at the default, the single largest suite line item.
FULL_BATTERY = os.environ.get("SPARK_GRAFT_FULL_TESTS") == "1"
_SETTINGS_KW = (
    dict(deadline=None, max_examples=6)
    if FULL_BATTERY
    else dict(deadline=None, max_examples=2, derandomize=True)
)

# XML 1.0 forbids most control chars; CSV additionally treats \r\n as row
# structure (quoted, but normalize for comparison stability).
_cell = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs", "Cc"), max_codepoint=0x2FFF
    ),
    max_size=40,
)


@settings(**_SETTINGS_KW)
@given(st.lists(st.tuples(_cell, _cell), min_size=1, max_size=8))
def test_csv_roundtrip_preserves_cells(spark, tmp_path_factory, rows):
    path = str(tmp_path_factory.mktemp("csvprop") / "t.csv")
    df = spark.createDataFrame(rows, ["a", "b"])
    csv_io.write_csv_single(df, path)
    back = csv_io.read_csv_all_string(spark, path).collect()
    # Spark CSV reads empty strings back as null — normalize both sides
    norm = lambda v: v if v not in ("", None) else None
    key = lambda t: tuple((x is None, x or "") for x in t)
    got = sorted(((norm(r.a), norm(r.b)) for r in back), key=key)
    want = sorted(((norm(a), norm(b)) for a, b in rows), key=key)
    assert got == want


@settings(**_SETTINGS_KW)
@given(st.lists(_cell, min_size=1, max_size=8))
def test_xlsx_roundtrip_preserves_strings(spark, tmp_path_factory, cells):
    path = str(tmp_path_factory.mktemp("xlsxprop") / "t.xlsx")
    xlsx.write_workbook(path, {"S": [["col"], *[[c] for c in cells]]})
    back = read_excel_sheet(spark, path, "S", header_row=1).collect()
    norm = lambda v: v if v not in ("", None) else None
    assert sorted(
        (norm(r.col) for r in back), key=lambda x: (x is None, x)
    ) == sorted((norm(c) for c in cells), key=lambda x: (x is None, x))


@settings(**_SETTINGS_KW)
@given(st.lists(_cell, min_size=1, max_size=16))
def test_sanitize_strips_injection_chars(spark, tmp_path_factory, values):
    df = spark.createDataFrame([(v,) for v in values], ["v"])
    out = [
        r.s
        for r in df.select(sanitize_sql_string(F.col("v")).alias("s")).collect()
    ]
    for s in out:
        if s is None:
            continue
        # the reference's invariant: no quotes, semicolons, or comment
        # markers survive sanitization (CSVtoSQLimport.ps1:59-78)
        assert "'" not in s and ";" not in s and "--" not in s


@settings(**_SETTINGS_KW)
@given(
    st.lists(
        st.floats(min_value=1.0, max_value=200_000.0, allow_nan=False),
        min_size=1,
        max_size=16,
    )
)
def test_excel_serial_roundtrips_within_a_second(spark, serials):
    df = spark.createDataFrame([(s,) for s in serials], ["serial"])
    got = df.select(
        "serial", excel_serial_to_timestamp(F.col("serial")).alias("ts")
    ).collect()
    origin = datetime.fromisoformat(EXCEL_ORIGIN_TRUE).replace(
        tzinfo=timezone.utc
    )
    for r in got:
        expected = origin + timedelta(days=r.serial)
        actual = r.ts.replace(tzinfo=timezone.utc)
        # conversion rounds to whole seconds
        assert abs((actual - expected).total_seconds()) <= 0.5001


@settings(**_SETTINGS_KW)
@given(
    st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False), min_size=1,
        max_size=12,
    ),
    st.lists(
        st.tuples(
            st.floats(min_value=-100, max_value=90, allow_nan=False),
            st.floats(min_value=0.5, max_value=40, allow_nan=False),
        ),
        min_size=1,
        max_size=6,
    ),
    st.floats(min_value=0.7, max_value=25, allow_nan=False),
)
def test_bucketed_range_join_matches_naive(spark, points, intervals, width):
    """The bucketized range join must equal the naive cross-join filter
    for ANY points/intervals/bucket_width."""
    from etl_excel_csv_sql_spark.operators.relational import bucketed_range_join

    pdf = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(points)], ["pid", "v"]
    )
    idf = spark.createDataFrame(
        [(j, float(lo), float(lo + w)) for j, (lo, w) in enumerate(intervals)],
        ["band", "lo", "hi"],
    )
    got = sorted(
        (r.pid, r.band)
        for r in bucketed_range_join(pdf, idf, "v", "lo", "hi", width).collect()
    )
    naive = sorted(
        (r.pid, r.band)
        for r in pdf.crossJoin(idf)
        .filter((F.col("v") >= F.col("lo")) & (F.col("v") < F.col("hi")))
        .collect()
    )
    assert got == naive


def test_profile_table_quotes_hostile_column_names(spark):
    """Generated stack()/agg identifiers are backtick-quoted and the name
    literal escaped: a column named with spaces, quotes, or backticks must
    profile cleanly instead of breaking the generated SQL (ADVICE r3)."""
    from etl_excel_csv_sql_spark.operators.relational import profile_table

    hostile = ["weird col", "it's", "tick`mark"]
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, None, 2.5)],
        "`weird col` int, `it's` string, `tick``mark` double",
    )
    out = {r.column_name: r for r in profile_table(df, hostile).collect()}
    assert set(out) == set(hostile)
    assert out["weird col"].n_null == 0 and out["it's"].n_null == 1
    assert out["tick`mark"].min_value == "1.5"


# ---------------------------------------------------------------------------
# late-r6 batch 3 properties
# ---------------------------------------------------------------------------

_key = st.integers(min_value=1, max_value=30)
_grp = st.sampled_from(["A", "B", "C"])
_val = st.floats(
    min_value=-1000, max_value=1000, allow_nan=False, allow_infinity=False
).map(lambda v: round(v, 4))


@settings(**_SETTINGS_KW)
@given(
    st.dictionaries(_key, st.tuples(_grp, _val), min_size=1, max_size=20),
    st.dictionaries(_key, st.tuples(_grp, _val), min_size=1, max_size=20),
)
def test_ivm_equals_recompute_on_arbitrary_snapshots(spark, old_map, new_map):
    """For ANY old/new snapshot pair (arbitrary inserts, deletes, value
    updates, group migrations), applying snapshot_diff incrementally must
    equal the full recompute exactly."""
    from etl_excel_csv_sql_spark.operators import relational

    old = spark.createDataFrame(
        [(k, g, v) for k, (g, v) in old_map.items()], "k long, g string, v double"
    )
    new = spark.createDataFrame(
        [(k, g, v) for k, (g, v) in new_map.items()], "k long, g string, v double"
    )

    def agg(df):
        return df.groupBy("g").agg(
            relational.money_sum("v").alias("total"),
            F.count(F.lit(1)).alias("n_rows"),
        )

    diff = relational.snapshot_diff(old, new, ["k"], ["g", "v"])
    got = {
        (r["g"], r["total"], r["n_rows"])
        for r in relational.incremental_agg_apply(
            agg(old), diff, "g", "v"
        ).collect()
    }
    want = {
        (r["g"], r["total"], r["n_rows"]) for r in agg(new).collect()
    }
    assert got == want


@settings(**_SETTINGS_KW)
@given(
    st.lists(
        st.floats(min_value=0.1, max_value=100, allow_nan=False),
        min_size=5,
        max_size=40,
        unique=True,
    ),
    st.integers(min_value=1, max_value=10),
)
def test_wswr_is_a_valid_sample(spark, weights, k):
    """Any draw: exactly min(k, n) distinct eligible rows, stable under
    re-partitioning."""
    from etl_excel_csv_sql_spark.operators import sampling

    rows = [(i, w) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows, "id long, w double")
    got = sampling.weighted_sample_without_replacement(df, "id", "w", k=k)
    ids = [r["id"] for r in got.collect()]
    assert len(ids) == len(set(ids)) == min(k, len(rows))
    ids2 = [
        r["id"]
        for r in sampling.weighted_sample_without_replacement(
            df.repartition(5), "id", "w", k=k
        ).collect()
    ]
    assert set(ids) == set(ids2)


@settings(**_SETTINGS_KW)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),   # group
            st.one_of(st.none(), st.floats(min_value=-100, max_value=100,
                                           allow_nan=False)),  # balance
        ),
        min_size=1,
        max_size=30,
    )
)
def test_golden_records_winner_is_rule_minimum(spark, rows):
    """For ANY frame, the survivor per group is exactly the min under the
    rule ordering (non-null first, largest balance, lowest id), and
    n_records is the true group size."""
    from etl_excel_csv_sql_spark.operators import relational

    data = [(i, g, b) for i, (g, b) in enumerate(rows)]
    df = spark.createDataFrame(data, "id long, g int, bal double")
    out = {
        r.match_key: r
        for r in relational.golden_records(
            df,
            F.col("g"),
            [
                F.when(F.col("bal").isNull(), 1).otherwise(0),
                F.coalesce(-F.col("bal"), F.lit(1e308)),
                F.col("id"),
            ],
            ["id", "bal"],
        ).collect()
    }
    groups: dict[int, list[tuple[int, float | None]]] = {}
    for i, g, b in data:
        groups.setdefault(g, []).append((i, b))
    for g, members in groups.items():
        want = min(
            members,
            key=lambda m: (
                m[1] is None,
                -(m[1] if m[1] is not None else -1e308),
                m[0],
            ),
        )
        assert out[g].n_records == len(members)
        assert out[g].id == want[0]


@settings(**_SETTINGS_KW)
@given(
    st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 8)),
        min_size=1,
        max_size=25,
    )
)
def test_pagerank_mass_bounded_and_dup_invariant(spark, pairs):
    """For ANY edge list: duplicate edges don't change ranks, every rank
    ≥ (1-d)/N, and total mass ≤ 1 (dangling mass only leaks out)."""
    from etl_excel_csv_sql_spark.operators import graph

    pairs = [(f"n{a}", f"n{b}") for a, b in pairs if a != b]
    if not pairs:
        return
    df1 = spark.createDataFrame(pairs, ["src", "dst"])
    df2 = spark.createDataFrame(pairs + pairs, ["src", "dst"])
    r1 = {r.node: r.rank for r in graph.pagerank(df1, "src", "dst", 3).collect()}
    r2 = {r.node: r.rank for r in graph.pagerank(df2, "src", "dst", 3).collect()}
    assert r1 == r2
    n = len({x for e in pairs for x in e})
    assert all(v >= round(0.15 / n, 6) - 1e-9 for v in r1.values())
    # each rank is rounded to 6dp, so the sum can exceed 1 by n*5e-7
    assert sum(r1.values()) <= 1.0 + n * 5e-7 + 1e-9


@settings(**_SETTINGS_KW)
@given(
    old_rows=st.lists(
        st.tuples(
            st.integers(0, 30),
            st.one_of(st.none(), st.text(max_size=4)),
            st.one_of(st.none(), st.integers(-5, 5)),
        ),
        max_size=25,
        unique_by=lambda t: t[0],
    ),
    new_rows=st.lists(
        st.tuples(
            st.integers(0, 30),
            st.one_of(st.none(), st.text(max_size=4)),
            st.one_of(st.none(), st.integers(-5, 5)),
        ),
        max_size=25,
        unique_by=lambda t: t[0],
    ),
)
def test_property_cdc_diff_apply_roundtrip(spark, old_rows, new_rows):
    """For ANY pair of keyed snapshots (nulls included):
    apply_cdc(old, snapshot_diff(old, new)) == new."""
    from etl_excel_csv_sql_spark.operators import relational

    schema = "k long, s string, v long"
    old = spark.createDataFrame(old_rows, schema)
    new = spark.createDataFrame(new_rows, schema)
    diff = relational.snapshot_diff(old, new, ["k"], ["s", "v"])
    got = relational.apply_cdc(old, diff, ["k"], ["s", "v"])
    assert sorted(map(tuple, got.collect())) == sorted(new_rows)


@settings(**_SETTINGS_KW)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 50), st.integers(0, 10_000)),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[1],
    ),
    n_parts=st.sampled_from([1, 3, 8]),
)
def test_global_row_number_is_partition_invariant(spark, rows, n_parts):
    """The distributed rank must equal the single-partition window
    row_number for ANY data and ANY range-partition count."""
    from pyspark.sql import Window as W

    from etl_excel_csv_sql_spark.operators.relational import global_row_number

    df = spark.createDataFrame(rows, "k long, uid long")
    order = [F.col("k").asc(), F.col("uid").asc()]
    got = global_row_number(df, order, out_col="rn", num_partitions=n_parts)
    want = df.withColumn("rn_w", F.row_number().over(W.orderBy(*order)))
    diff = got.join(want, ["k", "uid"]).where(F.col("rn") != F.col("rn_w"))
    assert diff.count() == 0


@settings(**_SETTINGS_KW)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 10_000),
                  st.integers(-100, 100)),
        min_size=1,
        max_size=50,
        unique_by=lambda t: t[1],
    ),
    n_parts=st.sampled_from([1, 4, 16]),
)
def test_global_prefix_sum_is_partition_invariant(spark, rows, n_parts):
    from pyspark.sql import Window as W

    from etl_excel_csv_sql_spark.operators.relational import global_prefix_sum

    df = spark.createDataFrame(rows, "k long, uid long, v long").withColumn(
        "v", F.col("v").cast("decimal(12,2)")
    )
    order = [F.col("k").asc(), F.col("uid").asc()]
    got = global_prefix_sum(
        df, order, "v", out_col="ps", num_partitions=n_parts
    )
    want = df.withColumn(
        "ps_w",
        F.sum("v").over(
            W.orderBy(*order).rowsBetween(W.unboundedPreceding, 0)
        ),
    )
    diff = got.join(want, ["k", "uid"]).where(F.col("ps") != F.col("ps_w"))
    assert diff.count() == 0


@settings(**_SETTINGS_KW)
@given(
    a=st.text(alphabet="abcXY 01", max_size=16),
    b=st.text(alphabet="abcXY 01", max_size=16),
)
def test_jaro_winkler_kernel_invariants(a, b):
    """Pure-Python property sweep (no Spark job per example): symmetry,
    range, identity, and the Winkler bonus never lowering the score."""
    from etl_excel_csv_sql_spark.operators.linkage import _jaro_winkler_py

    s = _jaro_winkler_py(a, b)
    assert 0.0 <= s <= 1.0
    assert s == _jaro_winkler_py(b, a)
    if a and a == b:
        assert s == 1.0
    if not a or not b:
        assert s == 0.0


@settings(**_SETTINGS_KW)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                blacklist_categories=("Cs", "Cc"), max_codepoint=0x2FFF
            ),
            max_size=60,
        ),
        min_size=1,
        max_size=12,
    )
)
def test_word_shingle_hashes_matches_string_shingles(spark, texts):
    """The key-only hash fold must agree with the string path on SET
    CARDINALITY for arbitrary unicode text (the invariant every hashed
    posting consumer relies on for exact Jaccard/containment values),
    and equal texts must produce equal hash sets. One Spark job per
    example batch."""
    from etl_excel_csv_sql_spark.functions.text import (
        word_shingle_hashes,
        word_shingles,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["id", "text"]
    )
    rows = df.select(
        "id",
        F.size(word_shingles("text", 3)).alias("n_str"),
        F.size(word_shingle_hashes("text", 3)).alias("n_hash"),
        F.sort_array(word_shingle_hashes("text", 3)).alias("hs"),
    ).collect()
    by_id = {r.id: r for r in rows}
    for r in rows:
        assert r.n_str == r.n_hash, (r.id, texts[r.id])
    for i, t in enumerate(texts):
        for j, u in enumerate(texts):
            if t == u:
                assert by_id[i].hs == by_id[j].hs
