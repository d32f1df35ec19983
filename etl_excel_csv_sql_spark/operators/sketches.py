"""Mergeable approximate sketches: the sublinear-state path for
distinct-count and quantile rollups.

At 100 TB an exact COUNT(DISTINCT user) per dimension cell shuffles every
distinct value; the scalable pattern is a MERGEABLE sketch per cell —
build once map-side, persist as bytes, union sketches instead of
re-scanning raw data for any coarser rollup (day → month, source →
corpus). Spark ships Apache DataSketches HLL natively
(``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate`` —
SPARK-16452 lineage), so the whole path stays JVM-side with no UDF.

``distinct_count_calibration`` pairs the sketch estimate with the exact
count so the error is MEASURED, not assumed (the report is the test
harness; a production rollup keeps only the sketch column). Exactness of
the exact side is itself one distinct-aggregate pass — run it at
calibration scale, not corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_sketches(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Per-group HLL sketch (binary, mergeable) + its estimate. The
    sketch column is the artifact to persist: any union of groups can be
    estimated later WITHOUT the raw data (hll_union_agg)."""
    return df.groupBy(group_col).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias("sketch"),
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col(value_col), F.lit(lg_k))
        ).alias("approx_distinct"),
    )


def merge_sketches(sketches: DataFrame) -> DataFrame:
    """Roll sketches up to one global estimate — bytes in, no re-scan."""
    return sketches.agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col("sketch"))).alias(
            "approx_distinct"
        )
    )


def distinct_count_calibration(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Per-group AND global (sketch-estimate vs exact) distinct counts
    with relative error — one row per group plus a 'total' row whose
    approx side comes from UNIONING the per-group sketches (proving
    mergeability), not from re-aggregating the raw column.

    Output: (scope, approx_distinct, exact_distinct, rel_error).
    """
    per_group = df.groupBy(group_col).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias("sketch"),
        F.count_distinct(F.col(value_col)).alias("exact_distinct"),
    )
    group_rows = per_group.select(
        F.col(group_col).cast("string").alias("scope"),
        F.hll_sketch_estimate("sketch").cast("long").alias("approx_distinct"),
        "exact_distinct",
    )
    total_exact = df.agg(
        F.count_distinct(F.col(value_col)).alias("exact_distinct")
    )
    total_row = (
        per_group.agg(
            F.hll_sketch_estimate(F.hll_union_agg("sketch"))
            .cast("long")
            .alias("approx_distinct")
        )
        .crossJoin(total_exact)  # 1x1
        .select(F.lit("total").alias("scope"), "approx_distinct", "exact_distinct")
    )
    return group_rows.unionByName(total_row).select(
        "scope",
        "approx_distinct",
        "exact_distinct",
        F.round(
            F.abs(F.col("approx_distinct") - F.col("exact_distinct"))
            / F.col("exact_distinct").cast("double"),
            6,
        ).alias("rel_error"),
    )


def quantile_calibration(
    df: DataFrame,
    group_col: str,
    value_col: str,
    quantiles: list[float] = (0.5, 0.9, 0.99),
    accuracy: int = 10000,
) -> DataFrame:
    """Per-group approx_percentile vs exact percentile_disc-style values
    (exact via sort-based percentile on the group — calibration scale
    only). Output long-form: (scope, quantile, approx_value, exact_value,
    abs_error)."""
    qs = list(quantiles)
    agg = df.groupBy(group_col).agg(
        F.percentile_approx(
            F.col(value_col), F.lit(qs), F.lit(accuracy)
        ).alias("approx"),
        F.percentile(F.col(value_col), F.lit(qs)).alias("exact"),
    )
    pairs = F.arrays_zip(
        F.array(*[F.lit(q) for q in qs]).alias("q"),
        F.col("approx").alias("a"),
        F.col("exact").alias("e"),
    )
    return agg.select(
        F.col(group_col).cast("string").alias("scope"), F.explode(pairs).alias("p")
    ).select(
        "scope",
        F.col("p.q").alias("quantile"),
        F.col("p.a").cast("double").alias("approx_value"),
        F.round(F.col("p.e").cast("double"), 6).alias("exact_value"),
        F.round(F.abs(F.col("p.a") - F.col("p.e")).cast("double"), 6).alias(
            "abs_error"
        ),
    )
