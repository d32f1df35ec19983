"""Sequence packing: FFD invariants on random lengths, the planted
closed-form contract the SQL oracle renders, and the report arithmetic."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from etl_excel_csv_sql_spark.operators import packing

CAP = 1000


@pytest.fixture(scope="module")
def random_lengths(spark):
    rng = random.Random(12)
    rows = [(i, rng.randint(1, 900)) for i in range(400)]
    # a few oversize docs: must each take a dedicated bin, never wedge
    rows += [(1000 + i, CAP + 1 + 37 * i) for i in range(3)]
    return spark.createDataFrame(rows, ["doc_id", "n_tokens"]), dict(rows)


def test_ffd_invariants_on_random_lengths(spark, random_lengths):
    df, lengths = random_lengths
    out = packing.pack_sequences_ffd(
        df, capacity=CAP, n_buckets=8
    ).collect()
    assert len(out) == len(lengths)  # every doc assigned exactly once
    assert len({r["doc_id"] for r in out}) == len(lengths)
    fills: dict[tuple[int, int], int] = {}
    docs_per_bin: dict[tuple[int, int], int] = {}
    for r in out:
        assert r["n_tokens"] == lengths[r["doc_id"]]
        key = (r["bucket"], r["bin_id"])
        fills[key] = fills.get(key, 0) + r["n_tokens"]
        docs_per_bin[key] = docs_per_bin.get(key, 0) + 1
    for key, fill in fills.items():
        if fill > CAP:  # only a dedicated oversize doc may exceed
            assert docs_per_bin[key] == 1
    # packing must beat one-doc-per-bin by a wide margin on this mix
    assert len(fills) < len(lengths) * 0.75


def test_ffd_deterministic_across_partitioning(spark, random_lengths):
    df, _ = random_lengths
    a = {
        (r["doc_id"], r["bucket"], r["bin_id"])
        for r in packing.pack_sequences_ffd(
            df, capacity=CAP, n_buckets=8
        ).collect()
    }
    b = {
        (r["doc_id"], r["bucket"], r["bin_id"])
        for r in packing.pack_sequences_ffd(
            df.repartition(13), capacity=CAP, n_buckets=8
        ).collect()
    }
    assert a == b


def test_ffd_planted_contract_matches_literal(spark):
    """The sequence_packing_ffd oracle's safety pin: on the planted
    4096/2048 length geometry with bucket = id % 16, fulls take their
    own bins in id-rank order and halves pair up behind them."""
    n = 480
    docs = spark.range(0, n).select(
        F.col("id").alias("doc_id"),
        F.when(F.pmod("id", F.lit(3)) == 0, F.lit(4096))
        .otherwise(F.lit(2048))
        .alias("n_tokens"),
    )
    got = {
        r["doc_id"]: (r["bucket"], r["bin_id"])
        for r in packing.pack_sequences_ffd(
            docs, capacity=4096, bucket=F.pmod(F.col("doc_id"), F.lit(16))
        ).collect()
    }
    by_bucket: dict[int, list[int]] = {}
    for d in range(n):
        by_bucket.setdefault(d % 16, []).append(d)
    want = {}
    for b, ids in by_bucket.items():
        fulls = [d for d in ids if d % 3 == 0]
        halves = [d for d in ids if d % 3 != 0]
        for i, d in enumerate(fulls):
            want[d] = (b, i)
        for i, d in enumerate(halves):
            want[d] = (b, len(fulls) + i // 2)
    assert got == want


def test_packing_report_arithmetic(spark):
    rows = [(0, 600), (1, 400), (2, 700), (3, CAP + 50)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
    out = packing.pack_sequences_ffd(
        df, capacity=CAP, bucket=F.lit(0)
    )
    rep = packing.packing_report(out, capacity=CAP).collect()[0]
    # FFD: 700 -> bin0, 600 -> bin1, 400 -> bin1 (600+400=1000), and
    # the oversize doc alone in its own (flagged) bin
    assert rep["n_docs"] == 4
    assert rep["n_bins"] == 3
    assert rep["n_oversized_bins"] == 1
    assert rep["mean_fill_frac"] == round((0.7 + 1.0) / 2, 6)
    assert rep["waste_frac"] == round(300 / 2000, 6)


def test_null_and_negative_lengths_raise(spark):
    df = spark.createDataFrame(
        [(0, 10), (1, None)], "doc_id long, n_tokens long"
    )
    with pytest.raises(Exception, match="null/negative"):
        packing.pack_sequences_ffd(df, capacity=CAP).collect()
    df2 = spark.createDataFrame([(0, 10), (1, -5)], ["doc_id", "n_tokens"])
    with pytest.raises(Exception, match="null/negative"):
        packing.pack_sequences_ffd(df2, capacity=CAP).collect()
    with pytest.raises(ValueError, match="capacity"):
        packing.pack_sequences_ffd(df2, capacity=0)


def test_segment_tree_first_fit_equals_naive_scan(spark):
    """The O(n log n) segment-tree descent must place every item in
    EXACTLY the bin the textbook O(n·bins) first-fit scan would pick
    (the tree is an index, not a heuristic) — fuzzed over random
    length mixes including exact fits and oversize docs."""
    rng = random.Random(99)
    for trial in range(5):
        rows = [
            (i, rng.choice([1, 7, 100, 250, 333, 500, 999, 1000, 1400]))
            for i in range(200)
        ]
        df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
        got = {
            r["doc_id"]: r["bin_id"]
            for r in packing.pack_sequences_ffd(
                df, capacity=CAP, bucket=F.lit(0)
            ).collect()
        }
        fills: list[int] = []
        want = {}
        for ln, did in sorted(
            ((ln, did) for did, ln in rows), key=lambda t: (-t[0], t[1])
        ):
            placed = None
            if ln <= CAP:
                for i, fill in enumerate(fills):
                    if fill + ln <= CAP:
                        placed = i
                        break
            if placed is None:
                placed = len(fills)
                fills.append(ln)
            else:
                fills[placed] += ln
            want[did] = placed
        assert got == want, f"trial {trial}"
