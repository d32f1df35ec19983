"""Relational breadth operators (SURVEY.md §2.3-2.5, §2.7).

The reference implements only scattered filters/projections/counts; Spark
gives the rest natively. These wrappers exist to (a) name each capability
for the operator inventory, (b) pin scale-safe defaults (decimal-exact
money aggregation, deterministic top-k tie-breaks, broadcast hints for
dimension joins).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Exact money arithmetic: sum doubles via decimal(18,4) so results are
#: bit-identical regardless of partitioning / add order (a double sum is
#: order-dependent; a decimal sum is associative). Cast back to double at
#: the end for a stable output schema.
def money_sum(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast("decimal(18,4)")).cast("double")


def money_avg(col: str | Column) -> Column:
    """Exact-sum / count — deterministic under re-partitioning, unlike
    avg(double)."""
    c = F.col(col) if isinstance(col, str) else col
    return money_sum(c) / F.count(c)


def project(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """Configured column subset (CSVtoSQLimport.ps1:232-237). Catalyst
    pushes this into the scan (ReadSchema pruning)."""
    return df.select(*columns)


def filter_not_null_key(df: DataFrame, key: str) -> DataFrame:
    """PK-present filter (CSVtoSQLimport.ps1:229): skip rows whose key is
    null or empty string. Pushed into the source scan by Catalyst."""
    c = F.col(key)
    return df.filter(c.isNotNull() & (c.cast("string") != ""))


def top_k(
    df: DataFrame, order: Sequence[Column], k: int, tiebreak: Sequence[str] = ()
) -> DataFrame:
    """Deterministic global top-k. Spark plans orderBy+limit as
    TakeOrderedAndProject: per-partition heap of k rows, then a k-row merge
    on the driver — no global sort shuffle even at 100 TB."""
    full_order = list(order) + [F.col(c) for c in tiebreak]
    return df.orderBy(*full_order).limit(k)


def top_k_per_group(
    df: DataFrame,
    group: Sequence[str],
    order: Sequence[Column],
    k: int,
) -> DataFrame:
    """Top-k within each group via row_number window — one shuffle on the
    group keys; AQE handles group-count skew. ``order`` must be a total
    order (include a unique tiebreak column) for deterministic output."""
    w = Window.partitionBy(*group).orderBy(*order)
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def dedup_exact(df: DataFrame, keys: Sequence[str], order: Sequence[Column]) -> DataFrame:
    """Exact dedup keeping the first row per key under ``order`` (must be a
    total order). row_number-over-window: one shuffle on the keys; for a
    keep-any dedup prefer groupBy/first which enables map-side partial
    aggregation."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def broadcast_dim_join(
    fact: DataFrame, dim: DataFrame, on: Column | Sequence[str], how: str = "inner"
) -> DataFrame:
    """Fact ⋈ dimension with an explicit broadcast hint: the dimension is
    shipped to every executor and the fact table never shuffles. This is
    the join shape for region/nation/supplier/part at any scale factor."""
    return fact.join(F.broadcast(dim), on=on, how=how)
