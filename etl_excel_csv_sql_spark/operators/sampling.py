"""Sampling and dataset splitting for training-data pipelines.

- hash_split: deterministic, engine-portable train/test assignment from
  md5(salt || id) — reproducible across runs, clusters, and engines (the
  oracle recomputes the identical assignment), with no shuffle and no
  stored split table. Fixed-width lowercase hex compares lexicographically
  == numerically, so the threshold is a plain string compare inside
  codegen.
- group_safe_split: same, keyed on a GROUP column (e.g. a content
  fingerprint or domain) so correlated rows land in the same side — the
  leakage guard: near-duplicate documents must never straddle train/test.
- stratified_sample: per-stratum Bernoulli sampling (sampleBy) — keeps
  class balance when downsampling; seeded, map-side, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hash_bucket(key: Column, salt: str) -> Column:
    """First 4 hex chars of md5(salt || key): 65536 buckets, uniform,
    identical in any engine with md5."""
    return F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 4)


def split_threshold(fraction: float) -> str:
    """The 4-hex-digit cutoff selecting ~fraction of buckets."""
    n = max(0, min(65536, round(fraction * 65536)))
    return format(n, "04x")


def hash_split(
    df: DataFrame,
    id_col: str,
    test_fraction: float = 0.1,
    salt: str = "split-v1",
    split_col: str = "split",
) -> DataFrame:
    """Add ``split_col`` ∈ {'test','train'}: test iff the id's hash bucket
    falls under the fraction cutoff. Changing ``salt`` draws a fresh
    independent split; keeping it pins membership forever (new data joins
    the same assignment — the property a growing training corpus needs)."""
    bucket = _hash_bucket(F.col(id_col), salt)
    thr = split_threshold(test_fraction)
    return df.withColumn(
        split_col,
        F.when(bucket < F.lit(thr), F.lit("test")).otherwise(F.lit("train")),
    )


def group_safe_split(
    df: DataFrame,
    group_col: str,
    test_fraction: float = 0.1,
    salt: str = "split-v1",
    split_col: str = "split",
) -> DataFrame:
    """hash_split keyed on ``group_col``: every row of a group gets the
    same side. Pair with dedup fingerprints/components so near-duplicates
    cannot leak across the split."""
    return hash_split(df, group_col, test_fraction, salt, split_col)


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    fractions: dict,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum Bernoulli downsampling (e.g. cap the dominant language
    while keeping rare ones whole). Map-side filter per row — no shuffle;
    expected (not exact) per-stratum counts, like all Bernoulli sampling."""
    return df.sampleBy(stratum_col, fractions, seed)
