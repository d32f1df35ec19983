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
