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
