"""Error-bound tests for the mergeable-sketch calibration reports."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_excel_csv_sql_spark.catalog import load_table
from etl_excel_csv_sql_spark.operators import sketches


def test_hll_calibration_error_bound(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    rep = sketches.distinct_count_calibration(
        events, "event_type", "user_id"
    ).collect()
    scopes = {r["scope"] for r in rep}
    assert "total" in scopes and len(scopes) >= 3
    for r in rep:
        # lg_k=12 → rsd ≈ 1.6%; 5% is a loose, stable bound
        assert r["rel_error"] < 0.05, (r["scope"], r["rel_error"])


def test_hll_union_equals_direct_sketch(spark):
    # merging per-group sketches must estimate ≈ sketching the whole
    # column directly (mergeability, the property rollups rely on)
    df = spark.range(0, 20000).select(
        (F.col("id") % 4).alias("g"), (F.col("id") % 7919).alias("v")
    )
    per_group = sketches.group_sketches(df, "g", "v")
    merged = sketches.merge_sketches(per_group).first()["approx_distinct"]
    direct = df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("v", F.lit(12)))
    ).first()[0]
    assert abs(merged - direct) / direct < 0.02
    assert abs(merged - 7919) / 7919 < 0.05


def test_quantile_calibration_rank_guarantee(spark, sf_dir):
    # Greenwald-Khanna's contract is on RANK, not value: the returned
    # point's exact rank must be within eps=1/accuracy of the target
    # quantile (value-space error can be large in a sparse tail — that is
    # the report's job to surface, not a sketch defect)
    events = load_table(spark, sf_dir, "events")
    rep = sketches.quantile_calibration(events, "event_type", "value").collect()
    assert {r["quantile"] for r in rep} == {0.5, 0.9, 0.99}
    groups = {
        r["event_type"]: r["vals"]
        for r in events.groupBy("event_type")
        .agg(F.sort_array(F.collect_list("value")).alias("vals"))
        .collect()
    }
    for r in rep:
        vals = groups[r["scope"]]
        n = len(vals)
        below = sum(1 for v in vals if v < r["approx_value"])
        at_or_below = sum(1 for v in vals if v <= r["approx_value"])
        eps = 1.0 / 10000 + 2.0 / n
        assert below / n - eps <= r["quantile"] <= at_or_below / n + eps, (
            r["scope"],
            r["quantile"],
            below / n,
            at_or_below / n,
        )


def test_set_overlap_known_sets(spark):
    # g=A: values 0..9999; g=B: 5000..14999 -> |A|=|B|=10000,
    # union=15000, intersection=5000, jaccard=1/3
    df = spark.range(0, 10000).selectExpr("'A' AS g", "id AS v").union(
        spark.range(5000, 15000).selectExpr("'B' AS g", "id AS v")
    )
    r = sketches.set_overlap_estimate(df, "g", "v").first()
    assert (r["group_a"], r["group_b"]) == ("A", "B")
    assert abs(r["approx_union"] - 15000) / 15000 < 0.05
    assert abs(r["approx_intersection"] - 5000) / 5000 < 0.10
    assert abs(r["jaccard"] - 1 / 3) < 0.05


def test_set_overlap_disjoint_and_identical(spark):
    df = (
        spark.range(0, 5000).selectExpr("'A' AS g", "id AS v")
        .union(spark.range(5000, 10000).selectExpr("'B' AS g", "id AS v"))
        .union(spark.range(0, 5000).selectExpr("'C' AS g", "id AS v"))
    )
    rows = {
        (r["group_a"], r["group_b"]): r
        for r in sketches.set_overlap_estimate(df, "g", "v").collect()
    }
    ab = rows[("A", "B")]
    ac = rows[("A", "C")]
    # disjoint: intersection ~0 relative to set sizes
    assert ab["approx_intersection"] < 0.05 * 5000
    # identical: jaccard ~1
    assert ac["jaccard"] > 0.95


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters
# ---------------------------------------------------------------------------

def _zipf_rows():
    # deterministic Zipf-ish stream: key i appears 2000//i times, i=1..60
    return [(f"k{i}",) for i in range(1, 61) for _ in range(2000 // i)]


def test_mg_partials_bounded_and_superset(spark):
    from etl_excel_csv_sql_spark.operators import sketches

    df = spark.createDataFrame(_zipf_rows(), ["key"]).repartition(7)
    width = 20
    partials = sketches.misra_gries_partials(df, "key", width).toPandas()
    # ≤ width rows per partition → ≤ 7 * width total
    assert len(partials) <= 7 * width
    # estimates never exceed true counts
    true = {f"k{i}": 2000 // i for i in range(1, 61)}
    merged = partials.groupby("key")["est"].sum()
    assert all(est <= true[k] for k, est in merged.items())


def test_phi_heavy_hitters_exact_on_zipf(spark):
    from etl_excel_csv_sql_spark.operators import sketches

    rows = _zipf_rows()
    n = len(rows)
    phi = 0.05
    df = spark.createDataFrame(rows, ["key"]).repartition(7)
    got = {
        r.key: (r.cnt, r.freq)
        for r in sketches.phi_heavy_hitters(df, "key", phi).collect()
    }
    true = {f"k{i}": 2000 // i for i in range(1, 61)}
    want = {k: c for k, c in true.items() if c >= phi * n}
    assert set(got) == set(want)
    for k, (cnt, freq) in got.items():
        assert cnt == want[k]  # exact counts, not estimates
        assert freq == round(want[k] / n, 6)


def test_phi_heavy_hitters_partitioning_invariant(spark):
    from etl_excel_csv_sql_spark.operators import sketches

    rows = _zipf_rows()
    a = sketches.phi_heavy_hitters(
        spark.createDataFrame(rows, ["key"]).repartition(1), "key", 0.03
    ).collect()
    b = sketches.phi_heavy_hitters(
        spark.createDataFrame(rows, ["key"]).repartition(13), "key", 0.03
    ).collect()
    assert sorted((r.key, r.cnt) for r in a) == sorted(
        (r.key, r.cnt) for r in b
    )


# -------------------------------------------------------------- Count-Min


def test_count_min_never_underestimates(spark, sf_dir):
    from etl_excel_csv_sql_spark.catalog import load_table
    from etl_excel_csv_sql_spark.operators import sketches

    li = load_table(spark, sf_dir, "lineitem")
    out = sketches.count_min_estimates(li, "l_partkey", top_k=50).collect()
    assert out, "expected rows"
    for r in out:
        assert r["est_count"] >= r["exact_count"]
        assert r["overestimate"] == r["est_count"] - r["exact_count"]


def test_count_min_error_bound_holds(spark):
    """eps = e/width with width 4096: overestimate <= eps*N for the
    vast majority of keys (the CMS (eps, delta) guarantee; delta =
    e^-3 ~ 5% per key)."""
    import math

    from etl_excel_csv_sql_spark.operators import sketches

    n = 50_000
    df = spark.range(0, n).select((F.col("id") % 997).alias("key"))
    out = sketches.count_min_estimates(
        df, "key", bucket_hex=3, depth=3, top_k=997
    ).collect()
    eps_n = math.e / 4096 * n
    bad = sum(1 for r in out if r["overestimate"] > eps_n)
    assert bad <= max(1, int(0.05 * len(out)))
    # with 997 keys in 4096 buckets the sketch must be near-exact for
    # most keys
    exactish = sum(1 for r in out if r["overestimate"] == 0)
    assert exactish > len(out) * 0.5


def test_phi_heavy_hitters_exact_boundary(spark):
    """A key at frequency EXACTLY phi is phi-heavy by definition; the
    double-arithmetic threshold (0.1*30 = 3.0000000000000004) used to
    exclude it, diverging from the decimal-exact oracle."""
    from etl_excel_csv_sql_spark.operators.sketches import phi_heavy_hitters

    rows = [("hot",)] * 3 + [(f"k{i}",) for i in range(27)]
    df = spark.createDataFrame(rows, "key string")
    got = {r.key for r in phi_heavy_hitters(df, "key", phi=0.1).collect()}
    assert "hot" in got
