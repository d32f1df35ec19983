from __future__ import annotations

from itertools import combinations

from etl_excel_csv_sql_spark.operators import itemsets

BASKETS = {
    1: {"a", "b", "c"},
    2: {"a", "b"},
    3: {"a", "c"},
    4: {"b", "c"},
    5: {"a", "b", "c", "d"},
    6: {"d"},
}


def _df(spark):
    rows = [(b, i) for b, its in BASKETS.items() for i in its]
    # duplicate facts must not inflate counts (distinct inside operator)
    rows += rows[:3]
    return spark.createDataFrame(rows, ["basket", "item"])


def _brute_counts():
    single: dict[str, int] = {}
    pair: dict[tuple[str, str], int] = {}
    for its in BASKETS.values():
        for i in its:
            single[i] = single.get(i, 0) + 1
        for a, b in combinations(sorted(its), 2):
            pair[(a, b)] = pair.get((a, b), 0) + 1
    return single, pair


def test_pair_rules_exact(spark):
    single, pair = _brute_counts()
    out = {
        (r.item_a, r.item_b): r
        for r in itemsets.pair_association_rules(
            _df(spark), "basket", "item", min_pair_count=1
        ).collect()
    }
    assert set(out) == set(pair)
    n = len(BASKETS)
    for (a, b), r in out.items():
        assert r.pair_count == pair[(a, b)]
        assert r.count_a == single[a] and r.count_b == single[b]
        assert r.support == round(pair[(a, b)] / n, 6)
        assert r.confidence_a_to_b == round(pair[(a, b)] / single[a], 6)
        assert r.confidence_b_to_a == round(pair[(a, b)] / single[b], 6)
        assert r.lift == round(pair[(a, b)] * n / (single[a] * single[b]), 6)


def test_pair_rules_max_basket_cap(spark):
    out = itemsets.pair_association_rules(
        _df(spark), "basket", "item", min_pair_count=1, max_basket=3
    ).collect()
    # basket 5 (size 4) dropped: no pair involving 'd' survives, and
    # a-b/a-c/b-c lose one co-occurrence each
    assert all("d" not in (r.item_a, r.item_b) for r in out)
    ab = next(r for r in out if (r.item_a, r.item_b) == ("a", "b"))
    assert ab.pair_count == 2


def test_fpgrowth_matches_brute_force(spark):
    single, pair = _brute_counts()
    out = {
        r.itemset: r.freq
        for r in itemsets.frequent_itemsets(
            _df(spark), "basket", "item", min_support=0.3
        ).collect()
    }
    n = len(BASKETS)
    want = {i: c for i, c in single.items() if c / n >= 0.3}
    want |= {f"{a}|{b}": c for (a, b), c in pair.items() if c / n >= 0.3}
    # triple a|b|c appears twice (baskets 1, 5): support 1/3 ≥ 0.3
    want["a|b|c"] = 2
    assert out == want


# ------------------------------------------------------------- PrefixSpan


def _contains_subseq(seq: list[str], pat: list[str]) -> bool:
    it = iter(seq)
    return all(any(s == p for s in it) for p in pat)


def test_sequential_patterns_brute_force_parity(spark):
    """PrefixSpan output == brute-force subsequence counts over every
    candidate pattern up to the max length, on a corpus small enough to
    enumerate."""
    import datetime
    import itertools

    from etl_excel_csv_sql_spark.operators import itemsets

    day0 = datetime.datetime(2024, 1, 1)
    seqs = {
        1: ["a", "b", "c"],
        2: ["a", "c"],
        3: ["b", "a", "b"],
        4: ["a", "b"],
        5: ["c"],
    }
    rows = []
    eid = 0
    for u, items in seqs.items():
        for i, it_ in enumerate(items):
            eid += 1
            rows.append((eid, u, day0 + datetime.timedelta(minutes=i), it_))
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    min_support = 0.4  # >= 2 of 5 sequences
    got = {
        r["pattern"]: r["freq"]
        for r in itemsets.sequential_patterns(
            df, min_support=min_support, max_pattern_length=3
        ).collect()
    }
    alphabet = ["a", "b", "c"]
    expected = {}
    for ln in (1, 2, 3):
        for pat in itertools.product(alphabet, repeat=ln):
            freq = sum(
                1 for s in seqs.values() if _contains_subseq(s, list(pat))
            )
            if freq >= min_support * len(seqs):
                expected[" > ".join(pat)] = freq
    assert got == expected


def test_sequential_patterns_counts_sequence_once(spark):
    """A pattern repeated inside one sequence still counts that
    sequence once (support is sequence-level, not occurrence-level)."""
    import datetime

    from etl_excel_csv_sql_spark.operators import itemsets

    day0 = datetime.datetime(2024, 3, 1)
    rows = [
        (i + 1, 1, day0 + datetime.timedelta(minutes=i), t)
        for i, t in enumerate(["x", "y", "x", "y", "x", "y"])
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    out = {
        r["pattern"]: (r["freq"], r["support"])
        for r in itemsets.sequential_patterns(
            df, min_support=0.5, max_pattern_length=2
        ).collect()
    }
    assert out["x > y"] == (1, 1.0)
    assert out["x"] == (1, 1.0)


def test_sequential_patterns_configurable_id_col(spark):
    """Regression (ADVICE r7): the in-group sort tiebreak hardcoded
    F.col('event_id'), so a frame without that column failed analysis
    despite the configurable user/ts/item API. id_col now parameterizes
    it, and id_col=None falls back to the item itself."""
    import datetime

    from etl_excel_csv_sql_spark.operators import itemsets

    day0 = datetime.datetime(2024, 3, 1)
    rows = [
        (7, day0 + datetime.timedelta(minutes=i), t, i + 100)
        for i, t in enumerate(["a", "b", "c"])
    ]
    df = spark.createDataFrame(
        rows, "uid long, when timestamp, action string, row_id long"
    )
    # custom id column
    out = {
        r["pattern"]: r["freq"]
        for r in itemsets.sequential_patterns(
            df, min_support=0.9, max_pattern_length=3,
            user_col="uid", ts_col="when", item_col="action",
            id_col="row_id",
        ).collect()
    }
    assert out["a > b > c"] == 1
    # no id column at all
    out2 = {
        r["pattern"]: r["freq"]
        for r in itemsets.sequential_patterns(
            df.drop("row_id"), min_support=0.9, max_pattern_length=3,
            user_col="uid", ts_col="when", item_col="action",
            id_col=None,
        ).collect()
    }
    assert out2["a > b > c"] == 1
