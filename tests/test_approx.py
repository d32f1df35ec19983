"""Error bound for the approximate-distinct sketch vs the exact count."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_excel_csv_sql_spark.catalog import load_table


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    approx = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("n"))
        .collect()
    }
    assert set(exact) == set(approx)
    for etype, n in exact.items():
        rel_err = abs(approx[etype] - n) / max(n, 1)
        # rsd=0.02 is one standard deviation; 5x is a generous determinism-
        # safe bound (the sketch is deterministic for fixed input)
        assert rel_err <= 0.10, f"{etype}: {approx[etype]} vs {n}"


def test_approx_quantiles_rank_error_bounded(spark):
    """Greenwald-Khanna sketch rank error <= 1/accuracy of the exact rank."""
    from pyspark.sql import functions as F

    orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    approx = orders.agg(
        F.percentile_approx("o_totalprice", [0.25, 0.5, 0.75], 10000).alias("q")
    ).first().q
    vals = sorted(r.o_totalprice for r in orders.select("o_totalprice").collect())
    n = len(vals)
    import bisect

    for target, got in zip((0.25, 0.5, 0.75), approx):
        rank = bisect.bisect_left(vals, got) / n
        assert abs(rank - target) <= 1 / 10000 + 1 / n
