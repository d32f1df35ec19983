"""Privacy / data-governance operators: re-identification auditing and
noisy release — the governance layer next to PII redaction
(functions/text.py redact_pii).

All deterministic and engine-portable: the DP noise draw derives from
md5(salt || cell), the same reproducible-uniform trick the sampling
module pins (so the oracle recomputes the identical release, and a
re-run publishes the same numbers — important for idempotent pipelines;
rotate the salt to redraw).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def k_anonymity_report(
    df: DataFrame, quasi_cols: list[str], k: int = 5
) -> DataFrame:
    """Quasi-identifier combinations occurring fewer than ``k`` times —
    each is a re-identification risk (an attacker knowing those
    attributes isolates < k candidates). ONE groupBy on the quasi-
    identifier tuple; the violating groups are the output, ordered by
    exposure. Returns (quasi-cols..., group_size, deficit)."""
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("group_size"))
        .where(F.col("group_size") < k)
        .select(
            *quasi_cols,
            "group_size",
            (F.lit(k) - F.col("group_size")).alias("deficit"),
        )
    )


def generalize_band(col: Column, width: float, out_fmt: str = "[{lo},{hi})") -> Column:
    """Generalization: replace a numeric value by its band label (the
    standard k-anonymity repair — widen bands until groups reach k).
    Bands are [n*width, (n+1)*width). Integer widths keep integer
    labels ('[5,10)'); fractional widths label with the true fractional
    bounds — truncating them to longs published bands that EXCLUDED
    their own members (width=2.5, value 7.4 → '[5,7)' while the true
    band is [5.0,7.5) — code-review r9 catch). ``out_fmt`` is honored
    in full, including the text between {lo} and {hi}."""
    band = F.floor(col / F.lit(width))
    if float(width).is_integer():
        lo: Column = (band * F.lit(int(width))).cast("long").cast("string")
        hi: Column = ((band + 1) * F.lit(int(width))).cast("long").cast("string")
    else:
        lo = (band * F.lit(width)).cast("double").cast("string")
        hi = ((band + 1) * F.lit(width)).cast("double").cast("string")
    pre, rest = out_fmt.split("{lo}")
    mid, post = rest.split("{hi}")
    return F.concat(F.lit(pre), lo, F.lit(mid), hi, F.lit(post))


def _uniform_from_hash(cell: Column, salt: str) -> Column:
    """Deterministic u in (0,1): 13 md5 hex chars -> 52-bit integer
    (+0.5) / 2^52 — the engine-portable draw shared with
    sampling.weighted_sample_without_replacement."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(salt), cell)), 1, 13), 16, 10
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(1 << 52))


def dp_noisy_counts(
    df: DataFrame,
    group_col: str,
    epsilon: float = 1.0,
    salt: str = "dp-v1",
) -> DataFrame:
    """Counts released under Laplace(1/epsilon) noise — the epsilon-DP
    mechanism for a count query (sensitivity 1). The noise draw is
    DETERMINISTIC per (salt, group): inverse-CDF
    mu - b*sign(u-1/2)*ln(1-2|u-1/2|) from the md5-derived uniform, so
    re-running a publication releases the SAME noisy values (no privacy
    budget re-spend on retries) and the oracle reproduces them; rotating
    the salt draws fresh noise and spends budget.

    Output: (group, true_count withheld in production — included here
    for the calibration contract, noisy_count, epsilon)."""
    b = 1.0 / epsilon
    counts = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).alias("true_count")
    )
    # NULL group: concat(salt, NULL) is NULL → the whole noise draw
    # nulls out and the NULL group would publish its EXACT count with
    # noisy_count null. A sentinel no real stringified group can equal
    # keeps the draw deterministic and the release noisy.
    cell = F.coalesce(
        F.col("grp").cast("string"), F.lit("\x00__null_group__")
    )
    u = _uniform_from_hash(cell, salt)
    centered = u - F.lit(0.5)
    noise = (
        -F.lit(b)
        * F.signum(centered)
        * F.log(1.0 - 2.0 * F.abs(centered))
    )
    return counts.select(
        "grp",
        "true_count",
        F.round(F.col("true_count") + noise, 6).alias("noisy_count"),
        F.lit(float(epsilon)).alias("epsilon"),
    )
