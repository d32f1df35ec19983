"""Record linkage: blocked fuzzy matching (entity resolution).

The classic data-cleaning join the reference family of ETL scripts
eventually needs (matching free-text names across systems; the reference
matches Excel sheet names only by trimmed case-insensitive equality,
ExcelDataImportToSQL.ps1 — this is the approximate generalization).

Scale design — the standard three-stage entity-resolution funnel, each
stage shrinking the candidate space before the expensive comparator:

1. **Canonicalize exact duplicates** (one groupBy on the normalized
   string): at corpus scale most strings repeat; comparing distinct
   strings instead of rows turns an O(rows²) problem into O(distinct²)
   and the cluster assignment back to rows is a cheap hash join.
2. **Blocking**: candidate pairs are generated ONLY within a block key
   (a cheap deterministic function of the string — last token, prefix,
   phonetic code, length band). The self-join shuffles on the block key,
   so cost is Σ|block|², never n². Skewed mega-blocks are the known
   failure mode: ``max_block`` drops blocks above a size cap (counted
   in-plan, no driver action) the same way ngram-Jaccard drops
   stop-shingles via max_df (operators/dedup.py).
3. **Comparator**: Levenshtein edit distance (JVM built-in, codegen'd —
   no Python) with a threshold, plus a normalized similarity. Pairs are
   emitted once (id_a < id_b).

Multi-pass blocking (union of pairs from several block functions,
distinct) raises recall when one key misses matches; compose by calling
``fuzzy_self_pairs`` per key and unioning — each pass stays Σ|block|².
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def canonicalize_exact(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Collapse exact duplicates of ``text_col``: one row per distinct
    string with the min id as representative and the member count."""
    return df.groupBy(F.col(text_col).alias("text")).agg(
        F.min(id_col).alias("rep_id"), F.count(F.lit(1)).alias("n_members")
    )


def fuzzy_self_pairs(
    distinct_df: DataFrame,
    block: Column,
    max_dist: int = 2,
    max_block: int | None = None,
    text_col: str = "text",
    id_col: str = "rep_id",
) -> DataFrame:
    """Blocked approximate-duplicate pairs among distinct strings.

    ``distinct_df`` is the output of :func:`canonicalize_exact` (or any
    frame with a unique ``id_col`` per distinct ``text_col``). Returns
    (id_a, id_b, text_a, text_b, dist, similarity) with id_a < id_b,
    dist <= max_dist, similarity = 1 - dist/max(len_a, len_b).
    """
    # checkpoint the distinct-string frame: the self-join consumes it on
    # both sides (plus the block-size guard), and Catalyst would otherwise
    # recompute the upstream canonicalization groupBy per consumer
    sides = distinct_df.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("t"), block.alias("blk")
    ).localCheckpoint(eager=True)
    if max_block is not None:
        # in-plan block-size guard: count per block, keep small blocks —
        # the skew cap that keeps Σ|block|² bounded on adversarial data
        sizes = sides.groupBy("blk").agg(F.count(F.lit(1)).alias("__bn"))
        sides = (
            sides.join(sizes.where(F.col("__bn") <= max_block), "blk", "left_semi")
        )
    a = sides.select(
        F.col("blk"), F.col("id").alias("id_a"), F.col("t").alias("text_a")
    )
    b = sides.select(
        F.col("blk"), F.col("id").alias("id_b"), F.col("t").alias("text_b")
    )
    dist = F.levenshtein("text_a", "text_b")
    return (
        a.join(b, "blk")
        .where(F.col("id_a") < F.col("id_b"))
        .where(dist <= F.lit(max_dist))
        .select(
            "id_a",
            "id_b",
            "text_a",
            "text_b",
            dist.alias("dist"),
            F.round(
                1.0
                - dist.cast("double")
                / F.greatest(F.length("text_a"), F.length("text_b")),
                6,
            ).alias("similarity"),
        )
    )


def last_token_block(text_col: str = "text") -> Column:
    """Block on the final whitespace token (the head noun in noun-phrase
    names) — cheap, language-light, and stable under adjective edits."""
    return F.element_at(F.split(F.col(text_col), " "), -1)


def prefix_length_block(text_col: str = "text", prefix: int = 1) -> Column:
    """Block on (first chars, length band) — the complementary pass that
    catches suffix edits last-token blocking misses."""
    return F.concat_ws(
        "|",
        F.substring(F.col(text_col), 1, prefix),
        (F.length(text_col) / F.lit(4)).cast("int").cast("string"),
    )
