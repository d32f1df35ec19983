"""Market-basket / frequent-itemset mining over (basket, item) facts.

Two paths, by contract strength:

- **Exact pair rules** (``pair_association_rules``): co-occurrence counts,
  support, confidence and lift for item PAIRS. The pair generation is a
  self-join *keyed on the basket id*, so the blow-up is sum(basket_size²)
  — bounded by the max basket size (TPC-H order baskets are ≤7 lines;
  ``max_basket`` caps pathological baskets in-plan, the same skew-cap
  pattern as linkage blocking). Everything downstream is plain aggregates
  + joins; the single-row basket count enters the plan as a broadcast
  scalar (no driver action).
- **Full frequent itemsets** (``frequent_itemsets``): MLlib's distributed
  FP-Growth (Li et al., PFP, RecSys'08 — the published parallel
  algorithm behind ``pyspark.ml.fpm.FPGrowth``) for itemsets of ANY size
  at a support fraction. Output reshaped to scalar columns (itemset
  joined to a sorted string) so results are hashable/comparable.

At 100 TB: the exact-pair path shuffles (basket, item) once for the
self-join and pairs once for the count — both key-partitioned; the
FP-Growth path samples nothing (exact algorithm) and distributes by
group-dependent transactions. min-support prunes the lattice on both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pair_association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 2,
    max_basket: int | None = None,
) -> DataFrame:
    """Directed association rules over item pairs (a → b, a < b kept
    once with both directions' confidence).

    Output: (item_a, item_b, pair_count, count_a, count_b, support,
    confidence_a_to_b, confidence_b_to_a, lift) — support/conf/lift
    rounded to 6dp; counts are basket counts (item multiplicity within a
    basket ignored, the standard basket-model semantics).
    """
    items = (
        df.select(
            F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
        )
        .distinct()
    )
    if max_basket is not None:
        # in-plan skew cap: drop baskets larger than max_basket entirely
        # (a degenerate mega-basket contributes size² pair rows)
        sizes = items.groupBy("basket").agg(F.count("*").alias("bsz"))
        items = (
            items.join(sizes.filter(F.col("bsz") <= max_basket), "basket")
            .drop("bsz")
        )
    items = items.localCheckpoint(eager=False)  # feeds 3 consumers

    n_baskets = items.agg(
        F.count_distinct("basket").alias("n_baskets")
    )  # 1 row → broadcast scalar
    counts = items.groupBy(F.col("item")).agg(F.count("*").alias("cnt"))

    a = items.alias("a")
    b = items.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.basket") == F.col("b.basket"))
            & (F.col("a.item") < F.col("b.item")),
        )
        .groupBy(
            F.col("a.item").alias("item_a"), F.col("b.item").alias("item_b")
        )
        .agg(F.count("*").alias("pair_count"))
        .filter(F.col("pair_count") >= min_pair_count)
    )
    ca = counts.select(F.col("item").alias("item_a"), F.col("cnt").alias("count_a"))
    cb = counts.select(F.col("item").alias("item_b"), F.col("cnt").alias("count_b"))
    nb = F.col("n_baskets").cast("double")
    return (
        pairs.join(ca, "item_a")
        .join(cb, "item_b")
        .crossJoin(F.broadcast(n_baskets))  # 1×1 scalar
        .select(
            "item_a",
            "item_b",
            "pair_count",
            "count_a",
            "count_b",
            F.round(F.col("pair_count") / nb, 6).alias("support"),
            F.round(F.col("pair_count") / F.col("count_a"), 6).alias(
                "confidence_a_to_b"
            ),
            F.round(F.col("pair_count") / F.col("count_b"), 6).alias(
                "confidence_b_to_a"
            ),
            F.round(
                (F.col("pair_count") * nb)
                / (F.col("count_a") * F.col("count_b")),
                6,
            ).alias("lift"),
        )
    )


def frequent_itemsets(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: float = 0.002,
) -> DataFrame:
    """All frequent itemsets at ``min_support`` via distributed FP-Growth.

    Output: (itemset, set_size, freq, support) with the itemset rendered
    as a '|'-joined sorted string (scalar, driver-hashable).
    """
    from pyspark.ml.fpm import FPGrowth

    baskets = (
        df.groupBy(F.col(basket_col).alias("basket"))
        .agg(F.collect_set(F.col(item_col).cast("string")).alias("items"))
        .localCheckpoint(eager=True)  # consumed by fit() AND count()
    )
    model = FPGrowth(
        itemsCol="items", minSupport=min_support, minConfidence=0.1
    ).fit(baskets)
    n = baskets.count()
    return model.freqItemsets.select(
        F.array_join(F.array_sort("items"), "|").alias("itemset"),
        F.size("items").alias("set_size"),
        F.col("freq"),
        F.round(F.col("freq") / F.lit(float(n)), 6).alias("support"),
    )


def sequential_patterns(
    events: DataFrame,
    min_support: float = 0.2,
    max_pattern_length: int = 3,
    user_col: str = "user_id",
    ts_col: str = "ts",
    item_col: str = "event_type",
    id_col: str | None = "event_id",
) -> DataFrame:
    """Frequent sequential patterns over per-(user, day) event-type
    sequences via distributed PrefixSpan (Pei et al., ICDE 2001 —
    ``pyspark.ml.fpm.PrefixSpan``, the projected-database algorithm:
    work divides across frequent prefixes, each executor mines its
    projected postfix DB locally).

    Sequence construction is one shuffle on (user, day): events sort
    WITHIN the group via sort_array over (ts, id, item) structs —
    deterministic total order, partitions bounded by daily activity,
    never whole-user history. ``id_col`` is the within-timestamp
    tiebreak (default ``event_id``); pass ``id_col=None`` for frames
    without a row id — the item itself then breaks ties, which is
    still a deterministic total order because equal (ts, item) rows
    are interchangeable in the rendered sequence. A pattern is counted once per sequence
    containing it as a subsequence (gaps allowed — the PrefixSpan
    contract, brute-force-verified in tests).

    Output renders patterns scalar for the driver: steps joined by
    ' > ' (single-item steps here — each event is one itemset), with
    (pattern, n_steps, freq, support). support = freq / #sequences.
    """
    from pyspark.ml.fpm import PrefixSpan

    day = F.to_date(F.col(ts_col))
    item = F.col(item_col).cast("string")
    tiebreak = F.col(id_col) if id_col is not None else item
    seqs = (
        events.groupBy(F.col(user_col).alias("u"), day.alias("d"))
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col(ts_col).alias("ts"),
                        tiebreak.alias("tb"),
                        item.alias("item"),
                    )
                )
            ).alias("evs")
        )
        .select(
            F.transform(F.col("evs"), lambda e: F.array(e["item"])).alias(
                "sequence"
            )
        )
        .localCheckpoint(eager=True)  # consumed by the miner AND count()
    )
    n_seq = seqs.count()
    patterns = PrefixSpan(
        minSupport=min_support,
        maxPatternLength=max_pattern_length,
        sequenceCol="sequence",
    ).findFrequentSequentialPatterns(seqs)
    return patterns.select(
        F.array_join(
            F.transform(
                F.col("sequence"),
                lambda step: F.array_join(F.array_sort(step), "&"),
            ),
            " > ",
        ).alias("pattern"),
        F.size("sequence").alias("n_steps"),
        F.col("freq"),
        F.round(F.col("freq") / F.lit(float(n_seq)), 6).alias("support"),
    )
