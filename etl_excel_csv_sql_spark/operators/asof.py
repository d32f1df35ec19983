"""As-of (point-in-time) join — a custom operator Spark lacks natively.

For each left row, attach the single most recent right row with the same
key whose timestamp is at or before the left timestamp (trades→quotes,
orders→latest-event, feature lookups at label time).

Composition of built-in operators (no UDF, no window over unbounded
groups):

  1. equi-join on the key with the range predicate ``right_ts <= left_ts``
     — a shuffle-hash/sort-merge join on the KEY, so parallelism follows
     key cardinality; AQE splits skewed keys;
  2. per left-row argmax via ``max_by(right_struct, (right_ts, tiebreak))``
     — one aggregation with map-side partials, shuffling one row per
     (left row, matched partition).

The intermediate is |matches per key pair| rows, which is the honest cost
of an as-of join without a co-sorted storage layout; with iceberg/delta
tables bucketed+sorted by (key, ts) this becomes a merge within
co-located partitions. For bounded lookback use ``max_lookback`` — it
turns the range predicate into a band, cutting the intermediate from
all-history to the window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str] | None = None,
    tiebreak_col: str | None = None,
    max_lookback: Column | None = None,
    how: str = "left",
) -> DataFrame:
    """Attach the latest right row at-or-before each left row's timestamp.

    ``right_value_cols``: right columns to surface (default: all except
    key/ts). ``tiebreak_col``: right column breaking equal-timestamp ties
    (max wins; REQUIRED for deterministic output when right timestamps can
    tie). ``max_lookback``: e.g. ``F.expr("INTERVAL 7 DAYS")`` bounds how
    far back a match may be — ALWAYS set it at scale: without a band the
    key-range join materializes each left row against its key's ENTIRE
    right history, with it only against the window. ``how='left'`` keeps
    unmatched left rows with nulls; ``'inner'`` drops them.

    Internals: the left frame gets a surrogate ``monotonically_increasing_id``
    row id, the argmax groups on THAT (a narrow long shuffle key instead of
    every left column — wide left rows never become shuffle keys), and the
    payload is re-attached by id afterwards. The id join is null-safe by
    construction (ids are never null, unlike arbitrary left columns under a
    USING join) and keeps duplicate left rows distinct in both modes.
    """
    # `is not None`: an explicit [] means "surface only asof_ts" — the
    # falsy-empty `or` default silently surfaced ALL right columns
    value_cols = (
        list(right_value_cols)
        if right_value_cols is not None
        else [c for c in right.columns if c not in (right_key, right_ts)]
    )
    # The id column is consumed by TWO branches (the narrow join input and
    # the final payload re-join). monotonically_increasing_id is
    # nondeterministic, so each branch recomputing it from scratch could
    # disagree after a task retry or AQE re-plan — checkpoint lazily so the
    # first action materializes ONE id assignment that both branches read.
    lid = left.withColumn(
        "__lid", F.monotonically_increasing_id()
    ).localCheckpoint(eager=False)
    narrow = lid.select(
        "__lid",
        F.col(left_key).alias("__lk"),
        F.col(left_ts).alias("__lts"),
    )
    # the tiebreak column rides in the narrow right projection even when
    # the caller didn't surface it as a value column (it used to be
    # unresolvable → AnalysisException)
    extra = (
        [F.col(tiebreak_col)]
        if tiebreak_col and tiebreak_col not in value_cols
        and tiebreak_col not in (right_key, right_ts)
        else []
    )
    r = right.select(
        F.col(right_key).alias("__rk"),
        F.col(right_ts).alias("__rts"),
        *[F.col(c) for c in value_cols],
        *extra,
    )
    cond = (F.col("__lk") == F.col("__rk")) & (
        F.col("__rts") <= F.col("__lts")
    )
    if max_lookback is not None:
        cond = cond & (F.col("__rts") >= F.col("__lts") - max_lookback)

    joined = narrow.join(r, on=cond, how="inner")
    order_key = (
        F.struct(F.col("__rts"), F.col(tiebreak_col))
        if tiebreak_col
        else F.struct(F.col("__rts"))
    )
    # ONE max_by accumulator carrying all value columns + the matched ts
    picked = joined.groupBy("__lid").agg(
        F.max_by(
            F.struct(*[F.col(c) for c in value_cols], F.col("__rts")),
            order_key,
        ).alias("__best")
    )
    out_cols = [F.col(c) for c in left.columns] + [
        F.col("__best").getField(c).alias(f"asof_{c}") for c in value_cols
    ] + [F.col("__best").getField("__rts").alias("asof_ts")]
    return lid.join(picked, "__lid", how).select(*out_cols)


def asof_join_directional(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    direction: str = "nearest",
    tolerance: Column | None = None,
    right_value_cols: list[str] | None = None,
    tiebreak_col: str | None = None,
    how: str = "left",
) -> DataFrame:
    """pandas ``merge_asof``-complete as-of join: ``direction`` picks the
    latest at-or-before match ('backward', = :func:`asof_join`), the
    earliest at-or-after ('forward'), or the temporally closest either
    side ('nearest', exact ties resolve BACKWARD, matching pandas).

    Same plan shape as :func:`asof_join` (narrow surrogate-id band join
    + one argmin/argmax aggregate + payload re-join); ``tolerance``
    (e.g. ``F.expr("INTERVAL 1 DAY")``) bounds the band on the active
    side(s) — as with max_lookback, ALWAYS set it at scale or a key's
    whole history is the intermediate. Deterministic tie rules, all
    mirrored by the oracle: equal-|Δt| → backward; equal timestamps on
    one side → max ``tiebreak_col``.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction: {direction!r}")
    value_cols = (
        list(right_value_cols)
        if right_value_cols is not None
        else [c for c in right.columns if c not in (right_key, right_ts)]
    )
    lid = left.withColumn(
        "__lid", F.monotonically_increasing_id()
    ).localCheckpoint(eager=False)
    narrow = lid.select(
        "__lid",
        F.col(left_key).alias("__lk"),
        F.col(left_ts).alias("__lts"),
    )
    extra = (
        [F.col(tiebreak_col)]
        if tiebreak_col and tiebreak_col not in value_cols
        and tiebreak_col not in (right_key, right_ts)
        else []
    )
    r = right.select(
        F.col(right_key).alias("__rk"),
        F.col(right_ts).alias("__rts"),
        *[F.col(c) for c in value_cols],
        *extra,
    )
    cond = F.col("__lk") == F.col("__rk")
    lts, rts = F.col("__lts"), F.col("__rts")
    if direction == "backward":
        cond = cond & (rts <= lts)
        if tolerance is not None:
            cond = cond & (rts >= lts - tolerance)
    elif direction == "forward":
        cond = cond & (rts >= lts)
        if tolerance is not None:
            cond = cond & (rts <= lts + tolerance)
    else:
        if tolerance is not None:
            cond = cond & (rts >= lts - tolerance) & (rts <= lts + tolerance)
    joined = narrow.join(r, on=cond, how="inner")
    payload = F.struct(*[F.col(c) for c in value_cols], F.col("__rts"))
    tb = (
        F.col(tiebreak_col)
        if tiebreak_col
        else F.lit(0)
    )
    # For forward/nearest the "smallest wins" keys are inverted inside a
    # max_by rather than negating the tiebreak: -tb would silently cast a
    # non-numeric tiebreak_col (e.g. a string label) to double, nulling it
    # out; the timestamp/delta keys are always numeric, so they carry the
    # negation and tb keeps its natural ordering for any orderable type.
    # unix_micros rejects TIMESTAMP_NTZ and non-timestamp types; the
    # cast makes forward/nearest accept the same inputs backward does
    # (NTZ parquet, plain comparisons) — a no-op for tz-aware columns
    lts_us = F.unix_micros(lts.cast("timestamp"))
    rts_us = F.unix_micros(rts.cast("timestamp"))
    if direction == "backward":
        agg = F.max_by(payload, F.struct(rts, tb))
    elif direction == "forward":
        # earliest timestamp wins; among equal timestamps the MAX tiebreak
        agg = F.max_by(payload, F.struct(-rts_us, tb))
    else:
        delta = F.abs(lts_us - rts_us)
        backward_pref = F.when(rts <= lts, 1).otherwise(0)
        agg = F.max_by(payload, F.struct(-delta, backward_pref, tb))
    picked = joined.groupBy("__lid").agg(agg.alias("__best"))
    out_cols = [F.col(c) for c in left.columns] + [
        F.col("__best").getField(c).alias(f"asof_{c}") for c in value_cols
    ] + [F.col("__best").getField("__rts").alias("asof_ts")]
    return lid.join(picked, "__lid", how).select(*out_cols)
