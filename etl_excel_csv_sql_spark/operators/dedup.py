"""Deduplication operators for training-data pipelines.

Five strategies, all shuffle-lean by construction:

- exact_dedup_fingerprint: md5 over normalized text → groupBy. One shuffle
  on the 128-bit fingerprint (tiny rows: id + hash), never on the text.
- minhash_lsh_pairs: shingle → k minhashes → band buckets → candidate join
  → exact-Jaccard verify. The classic MinHash+LSH plan; the only shuffle
  keys are (band, band_hash) buckets, and verification joins back to
  shingle sets only for candidate pairs.
- simhash_pairs: 64-bit SimHash + Hamming-ball banding.
- ngram_jaccard_pairs: exact Jaccard via shingle inverted index (posting-
  list self-join). Quadratic only within identical-shingle groups.
- embedding_dup_pairs: cosine ≥ τ pairs via LSH signature bucketing (see
  similarity.py for the brute-force baseline).

All return pair frames (id_a < id_b) so callers can build connected
components or keep-first filters downstream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_excel_csv_sql_spark.functions.text import (
    normalize_text,
    word_shingles,
)
from etl_excel_csv_sql_spark.functions.vectors import (
    cosine_similarity,
    random_hyperplane_signature,
)


def exact_dedup_fingerprint(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(fingerprint, dup_count, keeper_id): md5 of normalized text, groups
    with their min-id keeper. Shuffles only (fingerprint, id) pairs — at
    100 TB the text column never leaves the map side."""
    fp = df.select(
        F.col(id_col).alias("id"), F.md5(normalize_text(text_col)).alias("fingerprint")
    )
    return fp.groupBy("fingerprint").agg(
        F.count("*").alias("dup_count"), F.min("id").alias("keeper_id")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via an inverted index:

    explode distinct shingles → self-join on shingle (id_a < id_b) →
    |intersection| per pair → Jaccard. The self-join shuffles on the
    shingle hash; hot shingles are the skew risk, so extremely common
    shingles (df > ~10k) should be dropped as stopword-shingles at real
    scale — AQE skew-join splits the rest.

    Exact (not approximate): use minhash_lsh_pairs when the candidate set
    must stay subquadratic.
    """
    shingled = df.select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles(text_col, n)).alias("shingle"),
    )
    sizes = shingled.groupBy("id").agg(F.count("*").alias("set_size"))

    a = shingled.alias("a")
    b = shingled.alias("b")
    inter = (
        a.join(b, on=(F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter_size"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("set_size").alias("size_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("set_size").alias("size_b"))
    jac: Column = F.col("inter_size") / (
        F.col("size_a") + F.col("size_b") - F.col("inter_size")
    )
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, num_hashes: int = 32, n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """(id, signature array<long>): signature[i] = min over shingles of
    xxhash64(seed, i, shingle). Pure expressions — the per-row cost is
    O(shingles × num_hashes) inside codegen, no shuffle."""
    shingles = word_shingles(text_col, n)
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(
            F.transform(shingles, lambda s: F.xxhash64(F.lit(seed), i, s))
        ),
    )
    return df.select(F.col(id_col).alias("id"), sig.alias("signature"))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
    threshold: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """MinHash + LSH banding near-dup pairs, exact-Jaccard verified.

    Plan shape (the scale path — subquadratic candidate generation):
      1. signatures: narrow map, no shuffle
      2. explode into ``bands`` (band_id, hash(band slice)) bucket keys
      3. self-join within buckets → candidate pairs (shuffle on bucket key;
         bucket sizes are the skew knob — more bands → smaller buckets)
      4. distinct candidates, then exact Jaccard verify via the shingle
         inverted index restricted to candidates (broadcast of the
         candidate id set when small, else a semi join)

    Probability a pair with Jaccard j becomes a candidate:
    1-(1-j^(num_hashes/bands))^bands — 32 hashes / 8 bands ≈ r=4 rows per
    band, catching j≥0.5 with p≈0.63, j≥0.7 with p≈0.95.
    """
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, n, seed)
    banded = sigs.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice(F.col("signature"), b * rows_per_band + 1, rows_per_band),
                                lambda v: v.cast("string"),
                            ),
                        )
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    a = banded.alias("a")
    b = banded.alias("b")
    candidates = (
        a.join(
            b,
            on=(F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )

    # Exact verify: Jaccard on the candidate pairs only.
    shingled = df.select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles(text_col, n)).alias("shingle"),
    )
    sizes = shingled.groupBy("id").agg(F.count("*").alias("set_size"))
    sa = shingled.select(F.col("id").alias("id_a"), F.col("shingle"))
    sb = shingled.select(
        F.col("id").alias("sb_id"), F.col("shingle").alias("shingle_b")
    )
    inter = (
        candidates.join(sa, "id_a")
        .join(
            sb,
            (F.col("id_b") == F.col("sb_id"))
            & (F.col("shingle") == F.col("shingle_b")),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter_size"))
    )
    za = sizes.select(F.col("id").alias("id_a"), F.col("set_size").alias("size_a"))
    zb = sizes.select(F.col("id").alias("id_b"), F.col("set_size").alias("size_b"))
    return (
        inter.join(za, "id_a")
        .join(zb, "id_b")
        .withColumn(
            "jaccard",
            F.col("inter_size")
            / (F.col("size_a") + F.col("size_b") - F.col("inter_size")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash64(text_col: str | Column, n: int = 3, seed: int = 42) -> Column:
    """64-bit SimHash over word shingles: per bit, sum ±1 weighted by
    whether xxhash64(shingle) has that bit set; sign → bit. Expressed as 64
    aggregate() folds — heavy but fully codegen'd; for very wide use cases
    prefer a pandas_udf doing the bit math vectorized."""
    shingles = word_shingles(text_col, n)
    hashes = F.transform(shingles, lambda s: F.xxhash64(F.lit(seed), s))
    bits = []
    for bit in range(64):
        tally = F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(F.shiftright(h, bit).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )
        bits.append(
            F.when(tally >= 0, F.lit(2).cast("decimal(38,0)") ** bit).otherwise(
                F.lit(0).cast("decimal(38,0)")
            )
        )
    total = bits[0]
    for b in bits[1:]:
        total = total + b
    # decimal accumulation avoids long overflow on bit 63; wrap to long range
    two_63 = F.lit(str(2**63)).cast("decimal(38,0)")
    return (total - two_63).cast("long")


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    max_hamming: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Near-dup pairs with SimHash Hamming distance ≤ max_hamming.

    Banding per Manku et al. (detecting near-duplicates for web crawling):
    split the 64-bit hash into (max_hamming+1) blocks — any pair within the
    Hamming ball agrees exactly on ≥1 block, so an equi-join per block finds
    all candidates; verify with popcount on XOR. Shuffles only (block,
    block_bits) keys.
    """
    blocks = max_hamming + 1
    width = 64 // blocks
    sh = df.select(
        F.col(id_col).alias("id"), simhash64(text_col, n, seed).alias("simhash")
    )
    banded = sh.select(
        "id",
        "simhash",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(blocks - 1)),
                lambda blk: F.struct(
                    blk.alias("block"),
                    F.shiftrightunsigned(F.col("simhash"), blk * width)
                    .bitwiseAND(F.lit((1 << width) - 1))
                    .alias("key"),
                ),
            )
        ).alias("bk"),
    ).select("id", "simhash", F.col("bk.block").alias("block"), F.col("bk.key").alias("key"))
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            on=(F.col("a.block") == F.col("b.block"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def embedding_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    n_planes: int = 0,
    seed: int = 42,
) -> DataFrame:
    """Embedding near-dup pairs: cosine ≥ threshold.

    ``n_planes=0`` → exact all-pairs (self-join; fine to ~10⁵ vectors,
    quadratic beyond). ``n_planes>0`` → LSH-bucketed approximate: only
    pairs sharing a random-hyperplane signature are compared, turning the
    shuffle key into the signature and the complexity into Σ bucket².
    """
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    if n_planes > 0:
        base = base.withColumn(
            "sig", random_hyperplane_signature("vec", n_planes, seed)
        )
        join_cond = (F.col("a.sig") == F.col("b.sig")) & (F.col("a.id") < F.col("b.id"))
    else:
        join_cond = F.col("a.id") < F.col("b.id")
    a, b = base.alias("a"), base.alias("b")
    sim = cosine_similarity(F.col("a.vec"), F.col("b.vec"))
    return (
        a.join(b, on=join_cond)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            sim.alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
