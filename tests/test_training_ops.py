"""Training-pipeline operators: contamination, packing, PII redaction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_excel_csv_sql_spark.functions.text import redact_pii
from etl_excel_csv_sql_spark.operators.textstats import (
    contamination_check,
    pack_documents,
)


def test_contamination_detects_normalized_dup(spark):
    train = spark.createDataFrame(
        [(1, "The  Quick FOX"), (2, "unique content"), (3, "the quick fox")],
        ["doc_id", "text"],
    )
    evalset = spark.createDataFrame([(100, "the quick fox")], ["doc_id", "text"])
    hits = contamination_check(train, evalset).collect()
    # docs 1 and 3 normalize to the eval doc's fingerprint; doc 2 is clean
    assert sorted(r.train_id for r in hits) == [1, 3]
    assert all(r.n_eval_matches == 1 for r in hits)


def _pack_reference(docs, budget):
    """Single-threaded reference of the packing contract: per shard,
    concatenate docs in (md5-bucket, id) order, chunk every `budget`
    tokens. docs: list of (id, shard, n_tokens)."""
    import hashlib

    def bucket(i):
        return hashlib.md5(f"pack-v1{i}".encode()).hexdigest()[:2]

    out = {}
    for shard in {s for _, s, _ in docs}:
        stream = sorted(
            ((bucket(i), i, n) for i, s, n in docs if s == shard),
        )
        cum = 0
        for b, i, n in stream:
            out[i] = (shard, cum // budget, cum % budget)
            cum += n
    return out


def test_pack_documents_concat_and_chunk(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * 30)) for i in range(1, 8)],  # 7 docs × 30 tokens
        ["doc_id", "text"],
    )
    packed = {
        r.id: (None, r.bin_id, r.bin_offset)
        for r in pack_documents(docs, 100).collect()
    }
    assert packed == _pack_reference([(i, None, 30) for i in range(1, 8)], 100)


def test_pack_documents_sharded(spark):
    docs = spark.createDataFrame(
        [(1, "a", "x x x"), (2, "b", "y y"), (3, "a", "z")],
        ["doc_id", "lang", "text"],
    )
    packed = pack_documents(docs, 4, shard_col="lang").collect()
    by_id = {r.id: (r.shard, r.bin_id, r.bin_offset) for r in packed}
    assert by_id == _pack_reference([(1, "a", 3), (2, "b", 2), (3, "a", 1)], 4)


def test_pack_documents_single_shard_fans_out(spark):
    """The 100 TB property (VERDICT r2 #5): a SINGLE-shard corpus must not
    become a one-task global sort. The two-level scan spreads the window
    across 16^2 = 256 hash buckets (> 32 = one per local core), and the
    bucket-offset reconciliation keeps the stream exact: offsets over the
    whole shard are a contiguous 0..total_tokens chunking."""
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, "en", " ".join(["w"] * (1 + i % 7))) for i in range(1000)],
        ["doc_id", "lang", "text"],
    )
    packed = pack_documents(docs, 64, shard_col="lang")
    n_buckets = packed.select("bucket").distinct().count()
    assert n_buckets > 32, f"only {n_buckets} window groups for one shard"
    rows = packed.collect()
    # exactness: global stream positions are the cumsum in (bucket, id) order
    stream = sorted(rows, key=lambda r: (r.bucket, r.id))
    cum = 0
    for r in stream:
        assert (r.bin_id, r.bin_offset) == (cum // 64, cum % 64), r
        cum += r.n_tokens


def test_redact_pii_placeholders(spark):
    df = spark.createDataFrame(
        [
            ("write a.b-c_d@mail.example.org today",),
            ("call +44 (0)20 7946-0958 now",),
            ("server at 192.168.1.250 up",),
            ("no pii here",),
        ],
        ["text"],
    )
    out = [r.red for r in df.select(redact_pii("text").alias("red")).collect()]
    assert out[0] == "write <EMAIL> today"
    assert out[1] == "call <PHONE> now"
    assert out[2] == "server at <IPV4> up"
    assert out[3] == "no pii here"


def test_repetition_signals_known_values(spark):
    from etl_excel_csv_sql_spark.operators.textstats import repetition_signals

    df = spark.createDataFrame(
        [
            (1, "spam spam spam ham"),              # top token 3/4
            (2, "line\nline\nother"),               # dup line 1/3
            (3, "call 555 9999"),                   # digits 7/11 non-space
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r for r in repetition_signals(df).collect()}
    assert got[1].top_token_fraction == 0.75
    assert abs(got[2].dup_line_fraction - (1 - 2 / 3)) < 1e-6
    assert got[1].mean_word_len == 3.75  # (4+4+4+3)/4
    assert abs(got[3].digit_fraction - 7 / 11) < 1e-6


def test_lexical_diversity_known_values(spark):
    import math

    from etl_excel_csv_sql_spark.operators.textstats import lexical_diversity

    df = spark.createDataFrame(
        [
            (1, "a a a a"),          # zero entropy, ttr 1/4
            (2, "a b"),              # one bit, ttr 1
            (3, "A a b b"),          # case-folds: {a:2, b:2} → 1 bit, ttr 1/2
            (4, "x y z w"),          # uniform 4 → 2 bits
        ],
        ["doc_id", "text"],
    )
    got = {r.doc: r for r in lexical_diversity(df).collect()}
    assert got[1].n_tokens == 4 and got[1].n_types == 1
    assert got[1].unigram_entropy == 0.0 and got[1].ttr == 0.25
    assert got[2].unigram_entropy == 1.0 and got[2].ttr == 1.0
    assert got[3].n_types == 2 and got[3].unigram_entropy == 1.0
    assert got[4].unigram_entropy == 2.0
    # non-uniform: {a:2, b:1, c:1} → H = 1.5 exactly
    df2 = spark.createDataFrame([(9, "a a b c")], ["doc_id", "text"])
    row = lexical_diversity(df2).first()
    assert math.isclose(row.unigram_entropy, 1.5)


def test_duplicate_ngram_spans_counts(spark):
    from etl_excel_csv_sql_spark.operators.dedup import duplicate_ngram_spans

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over it"),
            (2, "said the quick brown fox jumps again"),
            (3, "totally different words live here now"),
            (4, "tiny"),  # shorter than n -> whole-text gram
        ],
        ["doc_id", "text"],
    )
    got = {
        r.gram: (r.n_docs, r.n_occurrences)
        for r in duplicate_ngram_spans(df, "doc_id", "text", n=5).collect()
    }
    # the only 5-gram shared across docs 1 and 2
    assert got == {"the quick brown fox jumps": (2, 2)}


def test_duplicate_ngram_spans_within_doc_occurrences(spark):
    from etl_excel_csv_sql_spark.operators.dedup import duplicate_ngram_spans

    boiler = "one two three four five"
    df = spark.createDataFrame(
        [(1, boiler + " x " + boiler), (2, boiler)], ["doc_id", "text"]
    )
    got = {
        r.gram: (r.n_docs, r.n_occurrences)
        for r in duplicate_ngram_spans(df, "doc_id", "text", n=5).collect()
    }
    # positional counting: doc 1 contains the boilerplate twice
    assert got["one two three four five"] == (2, 3)


def test_duplicate_span_coverage_bounds_and_zero(spark):
    from etl_excel_csv_sql_spark.operators.dedup import duplicate_span_coverage

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over it"),
            (2, "said the quick brown fox jumps again"),
            (3, "totally different words live here now"),
        ],
        ["doc_id", "text"],
    )
    got = {r.id: r for r in duplicate_span_coverage(df, "doc_id", "text", n=5).collect()}
    assert got[3].n_dup_positions == 0 and got[3].dup_coverage == 0.0
    # doc 1: 3 positions, 1 duplicated
    assert got[1].n_positions == 3 and got[1].n_dup_positions == 1
    for r in got.values():
        assert 0.0 <= r.dup_coverage <= 1.0


def test_strip_duplicate_spans_removes_boilerplate(spark):
    from etl_excel_csv_sql_spark.operators.dedup import strip_duplicate_spans

    boiler = "one two three four five"
    df = spark.createDataFrame(
        [
            (1, "intro words " + boiler + " outro words"),
            (2, boiler + " unrelated tail text here"),
            (3, "totally different words live here now"),
        ],
        ["doc_id", "text"],
    )
    got = {
        r.id: r
        for r in strip_duplicate_spans(df, "doc_id", "text", n=5).collect()
    }
    # the shared 5-gram disappears from BOTH carriers, surrounding prose stays
    assert got[1].cleaned_text == "intro words outro words"
    assert got[1].n_removed == 5 and got[1].n_tokens == 9
    assert got[2].cleaned_text == "unrelated tail text here"
    # untouched doc passes through verbatim
    assert got[3].n_removed == 0
    assert got[3].cleaned_text == "totally different words live here now"


def test_strip_duplicate_spans_hash_gram_parity(spark):
    """hash_grams=True (the default 8-byte-key plan) must reproduce the
    string-key path row-for-row — span detection counts and the rewrite
    are invariant under an injective gram hash."""
    import random

    from etl_excel_csv_sql_spark.operators.dedup import strip_duplicate_spans

    rng = random.Random(11)
    vocab = "aa bb cc dd ee ff gg hh ii jj".split()
    boiler = "one two three four five six"
    rows = []
    for i in range(30):
        words = [rng.choice(vocab) for _ in range(20)]
        if i % 3 == 0:  # a third of the docs carry the boilerplate
            at = rng.randrange(len(words))
            words[at:at] = boiler.split()
        rows.append((i, " ".join(words)))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    by_hash = {
        r.id: (r.n_tokens, r.n_removed, r.cleaned_text)
        for r in strip_duplicate_spans(
            df, "doc_id", "text", n=5, hash_grams=True
        ).collect()
    }
    by_str = {
        r.id: (r.n_tokens, r.n_removed, r.cleaned_text)
        for r in strip_duplicate_spans(
            df, "doc_id", "text", n=5, hash_grams=False
        ).collect()
    }
    assert by_hash == by_str
    assert any(v[1] > 0 for v in by_str.values())  # something was stripped


def test_strip_duplicate_spans_empty_short_null_docs(spark):
    """Regression (ADVICE r7): sequence(0, size-1) on an empty token array
    yields the DESCENDING [0,-1] (Spark defaults step to -1), whose -1
    entry drives element_at(toks, 0) → INVALID_INDEX_OF_ZERO; one blank
    doc used to kill the whole job."""
    from pyspark.sql import types as T

    from etl_excel_csv_sql_spark.operators.dedup import strip_duplicate_spans

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    boiler = "one two three four five"
    df = spark.createDataFrame(
        [
            (1, ""),  # empty
            (2, "     "),  # whitespace-only (spaces: F.trim and the
            # DuckDB oracle's trim() both strip only 0x20)
            (3, None),  # null
            (4, "tiny doc"),  # shorter than n, unique -> kept whole
            (5, boiler),  # exactly n, repeated verbatim -> empties itself
            (6, boiler),
        ],
        schema,
    )
    got = {
        r.id: r
        for r in strip_duplicate_spans(df, "doc_id", "text", n=5).collect()
    }
    for i in (1, 2, 3):
        assert got[i].n_tokens == 0 and got[i].n_removed == 0
        assert got[i].cleaned_text == ""
    assert got[4].cleaned_text == "tiny doc" and got[4].n_removed == 0
    # short docs repeated verbatim empty themselves (whole-text gram)
    assert got[5].cleaned_text == "" and got[5].n_removed == 5
    assert got[6].cleaned_text == "" and got[6].n_tokens == 5


def test_source_capped_sample_deterministic_cap(spark):
    from etl_excel_csv_sql_spark.operators.sampling import source_capped_sample

    rows = [(i, f"src{i % 3}") for i in range(60)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = source_capped_sample(df, "doc_id", "source", cap=5)
    per_src = {
        r.source: r.cnt
        for r in out.groupBy("source").agg(F.count("*").alias("cnt")).collect()
    }
    assert per_src == {"src0": 5, "src1": 5, "src2": 5}
    # deterministic: same ids on a rerun
    ids1 = sorted(r.doc_id for r in out.collect())
    ids2 = sorted(
        r.doc_id for r in source_capped_sample(df, "doc_id", "source", cap=5).collect()
    )
    assert ids1 == ids2
    # a different salt draws a different sample
    ids3 = sorted(
        r.doc_id
        for r in source_capped_sample(
            df, "doc_id", "source", cap=5, salt="cap-v2"
        ).collect()
    )
    assert ids1 != ids3


def test_corpus_mixture_weights_shares_sum_to_one(spark):
    from etl_excel_csv_sql_spark.operators.sampling import corpus_mixture_weights

    df = spark.createDataFrame(
        [("en", "a", 100), ("en", "a", 300), ("fr", "b", 200), ("de", "c", 400)],
        ["lang", "source", "n_chars"],
    )
    rows = corpus_mixture_weights(df, ["lang", "source"], F.col("n_chars")).collect()
    got = {(r.lang, r.source): r for r in rows}
    assert got[("en", "a")].group_weight == 400 and got[("en", "a")].n_rows == 2
    assert abs(sum(r.actual_share for r in rows) - 1.0) < 1e-6
    # uniform target: weight > 1 upsamples under-represented groups
    assert got[("fr", "b")].uniform_weight > 1.0 > got[("de", "c")].uniform_weight


def test_duplicate_ngram_spans_hashed_path_agrees(spark):
    from etl_excel_csv_sql_spark.operators.dedup import duplicate_ngram_spans

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over it"),
            (2, "said the quick brown fox jumps again"),
            (3, "totally different words live here now"),
        ],
        ["doc_id", "text"],
    )
    text_counts = sorted(
        (r.n_docs, r.n_occurrences)
        for r in duplicate_ngram_spans(df, "doc_id", "text", n=5).collect()
    )
    hashed = duplicate_ngram_spans(df, "doc_id", "text", n=5, hash_grams=True)
    assert "gram_hash" in hashed.columns and "gram" not in hashed.columns
    hash_counts = sorted((r.n_docs, r.n_occurrences) for r in hashed.collect())
    assert text_counts == hash_counts


def test_tfidf_builds_without_driver_action(spark):
    """idf sizing is in-plan: constructing the tfidf frame must launch NO
    Spark job (the old shape ran df.count() on the driver — a whole extra
    corpus pass before the real query). The N constant rides in as a
    cross-broadcast single-row aggregate instead."""
    from etl_excel_csv_sql_spark.operators.textstats import tfidf_top_terms

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta delta"), (3, "alpha zeta")],
        ["doc_id", "text"],
    )
    group = "tfidf-lazy-build-probe"
    spark.sparkContext.setJobGroup(group, "tfidf construction must be lazy")
    try:
        out = tfidf_top_terms(docs, k=2, max_df_ratio=0.9)
    finally:
        spark.sparkContext.setJobGroup(None, None)
    tracker = spark.sparkContext.statusTracker()
    assert tracker.getJobIdsForGroup(group) == [], (
        "tfidf_top_terms launched a job during construction"
    )
    rows = {(r.doc, r.term) for r in out.collect()}
    # 'alpha' has df == 3 > floor(0.9 * 3) → dropped as a stop term
    assert all(term != "alpha" for _, term in rows)
    assert (1, "beta") in rows or (1, "gamma") in rows


def test_lang_id_script_stage_and_stopwords(spark):
    """Two-stage lang-ID goldens: script detection for non-Latin scripts
    (kana outranks Han for ja), stopword argmax for Latin languages,
    default for no-signal text."""
    from etl_excel_csv_sql_spark.functions.text import lang_id

    rows = [
        (1, "の 猫 は かわいい です ね こんにちは 世界", "ja"),  # kana + kanji
        (2, "안녕하세요 세계 오늘 날씨가 좋다 한국어 문장", "ko"),
        (3, "的 是 了 在 和 有 我 不 这 人 中文 文本", "zh"),
        (4, "привет мир это русский текст для проверки", "ru"),
        (5, "مرحبا بالعالم هذا نص عربي للاختبار", "ar"),
        (6, "γειά σου κόσμε αυτό είναι ελληνικό κείμενο", "el"),
        (7, "שלום עולם זהו טקסט עברי לבדיקה", "he"),
        (8, "the cat is on the mat and it is happy", "en"),
        (9, "der Hund ist ein guter Freund und die Katze", "de"),
        (10, "il gatto che dorme sono della casa anche oggi non qui", "it"),
        (11, "o gato do vizinho em um dia para com os amigos das festas", "pt"),
        (12, "het is een mooie dag en ik denk dat zijn ook maar goed", "nl"),
        (13, "xyzzy qwerty 12345", "en"),  # no signal → default
    ]
    df = spark.createDataFrame([(i, t) for i, t, _ in rows], ["doc_id", "text"])
    got = {r.doc_id: r.pred for r in df.select("doc_id", lang_id("text").alias("pred")).collect()}
    want = {i: lang for i, _, lang in rows}
    assert got == want


def test_lang_id_expression_is_linear(spark):
    """The argmax must not nest exponentially: the generated plan for a
    lang_id projection stays small (the old when/otherwise chain produced
    a >1 MiB task binary at 8 languages)."""
    from etl_excel_csv_sql_spark.functions.text import lang_id

    df = spark.createDataFrame([(1, "hello world")], ["doc_id", "text"])
    tree = df.select(lang_id("text").alias("p"))._jdf.queryExecution().optimizedPlan().toString()
    assert len(tree) < 200_000, f"lang_id expression tree blew up: {len(tree)} chars"


def test_compression_ratio_byte_exact(spark):
    """Ratios must match direct zlib calls byte-for-byte (same level)."""
    import zlib

    from etl_excel_csv_sql_spark.operators.textstats import compression_ratio

    texts = {
        1: "a" * 400,                       # degenerate repetition
        2: "the quick brown fox jumps over the lazy dog — twice! " * 3,
        3: "",                              # empty → null ratio
        4: None,                            # null text → null row stats
        5: "héllo wörld ünïcode",           # multi-byte utf-8
    }
    df = spark.createDataFrame(
        list(texts.items()), "doc_id: long, text: string"
    )
    got = {r.id: r for r in compression_ratio(df).collect()}
    for i, t in texts.items():
        if t is None:
            assert got[i].n_bytes is None and got[i].compression_ratio is None
            continue
        raw = t.encode("utf-8")
        assert got[i].n_bytes == len(raw)
        assert got[i].n_compressed == len(zlib.compress(raw, 6))
        if raw:
            assert got[i].compression_ratio == round(
                len(zlib.compress(raw, 6)) / len(raw), 6
            )
        else:
            assert got[i].compression_ratio is None
    # the repetitive doc must compress far better than natural text
    assert got[1].compression_ratio < 0.1 < got[2].compression_ratio


def test_quality_filter_keeps_top_fraction(spark):
    from etl_excel_csv_sql_spark.operators.textstats import quality_filter

    good = "the cat sat on the mat and it is a fine day for all of us here"
    bad = "!!! ??? *** !!!"
    rows = [(i, good) for i in range(8)] + [(i, bad) for i in range(8, 10)]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    kept = quality_filter(df, keep_fraction=0.6).collect()
    # the 8 good docs share the top quality level; threshold lands on it,
    # so exactly the good docs survive and every row carries the cut
    assert sorted(r.id for r in kept) == list(range(8))
    assert len({r.threshold for r in kept}) == 1
    assert all(r.quality >= r.threshold for r in kept)


def test_jsonl_corrupt_line_capture(spark, tmp_path):
    import os

    from etl_excel_csv_sql_spark.io import jsonl

    path = os.path.join(str(tmp_path), "mixed.jsonl")
    with open(path, "w") as fh:
        fh.write('{"doc_id": 1, "text": "ok"}\n')
        fh.write("this is not json\n")
        fh.write('{"doc_id": 2, "text": "also ok"}\n')
    out = jsonl.read_jsonl(
        spark, path, schema="doc_id bigint, text string", capture_corrupt=True
    ).collect()
    good = [r for r in out if r[jsonl.CORRUPT_COL] is None]
    bad = [r for r in out if r[jsonl.CORRUPT_COL] is not None]
    assert sorted(r.doc_id for r in good) == [1, 2]
    assert len(bad) == 1 and bad[0][jsonl.CORRUPT_COL] == "this is not json"
    assert bad[0].doc_id is None


def test_chunk_windows_shapes_and_reassembly(spark):
    from etl_excel_csv_sql_spark.operators.textstats import chunk_windows

    words = [f"w{i}" for i in range(10)]
    df = spark.createDataFrame(
        [(1, " ".join(words)), (2, "solo"), (3, "")],
        "doc_id bigint, text string",
    )
    out = chunk_windows(df, chunk_size=4, stride=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 1: 10 tokens, starts 0,3,6,9 → sizes 4,4,4,1
    c1 = sorted(by_doc[1], key=lambda r: r.start_token)
    assert [r.start_token for r in c1] == [0, 3, 6, 9]
    assert [r.chunk_id for r in c1] == [0, 1, 2, 3]
    assert [r.n_tokens for r in c1] == [4, 4, 4, 1]
    assert c1[0].chunk_text == "w0 w1 w2 w3"
    assert c1[-1].chunk_text == "w9"
    # overlap: consecutive chunks share chunk_size - stride tokens
    assert c1[0].chunk_text.split()[3:] == c1[1].chunk_text.split()[:1]
    # single-token and empty docs chunk without error
    assert [r.n_tokens for r in by_doc[2]] == [1]
    assert len(by_doc[3]) == 1  # one degenerate chunk, never zero rows


def test_chunk_windows_covers_every_token(spark):
    from etl_excel_csv_sql_spark.operators.textstats import chunk_windows

    n = 257  # not a multiple of either parameter
    df = spark.createDataFrame(
        [(7, " ".join(str(i) for i in range(n)))], "doc_id bigint, text string"
    )
    rows = chunk_windows(df, chunk_size=64, stride=48).collect()
    covered = set()
    for r in rows:
        covered.update(range(r.start_token, r.start_token + r.n_tokens))
    assert covered == set(range(n))


def test_stratified_exact_counts_and_determinism(spark):
    from etl_excel_csv_sql_spark.operators.sampling import stratified_exact

    rows = [(i, "a" if i % 3 else "b") for i in range(100)]
    df = spark.createDataFrame(rows, "id bigint, stratum string")
    out = stratified_exact(df, ["stratum"], "id", 0.25)
    counts = {
        r.stratum: r.n
        for r in out.groupBy("stratum").agg(F.count("*").alias("n")).collect()
    }
    # strata: a has 66 rows → ceil(16.5)=17; b has 34 → ceil(8.5)=9
    assert counts == {"a": 17, "b": 9}
    # deterministic under repartitioning
    ids1 = sorted(r.id for r in out.collect())
    ids2 = sorted(
        r.id
        for r in stratified_exact(
            df.repartition(7), ["stratum"], "id", 0.25
        ).collect()
    )
    assert ids1 == ids2


def test_temperature_weights_limits(spark):
    from etl_excel_csv_sql_spark.operators.sampling import temperature_weights

    rows = [(i, "en" if i < 80 else ("fr" if i < 95 else "sw")) for i in range(100)]
    df = spark.createDataFrame(rows, "id bigint, lang string")
    # alpha=1 → natural distribution, weight 1 everywhere
    nat = temperature_weights(df, ["lang"], alpha=1.0).collect()
    assert all(abs(r.resample_weight - 1.0) < 1e-6 for r in nat)
    # alpha=0 → uniform target: q = 1/3 per stratum
    uni = temperature_weights(df, ["lang"], alpha=0.0).collect()
    assert all(abs(r.prob_temp - 1 / 3) < 1e-6 for r in uni)
    # alpha in between upweights the tail, downweights the head,
    # and q still sums to 1
    mid = {r.lang: r for r in temperature_weights(df, ["lang"], alpha=0.3).collect()}
    assert mid["sw"].resample_weight > 1.0 > mid["en"].resample_weight
    assert abs(sum(r.prob_temp for r in mid.values()) - 1.0) < 1e-5


def test_resample_ffill_gaps_and_carry(spark):
    import datetime as dt

    from etl_excel_csv_sql_spark.operators.events import resample_ffill

    t0 = dt.datetime(2024, 1, 1, 0, 15)
    rows = [
        (1, "a", t0, 10.0),
        (2, "a", t0 + dt.timedelta(minutes=20), 20.0),  # same hour
        # hours 1-2 silent, then one more event in hour 3
        (3, "a", t0 + dt.timedelta(hours=3), 40.0),
        (4, "b", t0, 7.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, event_type string, ts timestamp, value double"
    )
    out = {
        (r.event_type, r.hour): r
        for r in resample_ffill(df, "event_type", "ts", "value").collect()
    }
    # key a spans 4 hourly buckets: observed, gap, gap, observed
    a = [out[("a", f"2024-01-01 0{h}:00:00")] for h in range(4)]
    assert [r.n_events for r in a] == [2, 0, 0, 1]
    assert a[0].value_ffill == 15.0          # (10+20)/2
    assert a[1].value_ffill == 15.0          # carried across the gap
    assert a[2].value_ffill == 15.0
    assert a[3].value_ffill == 40.0          # new observation resets
    # key b: single bucket, no spine beyond its own span
    assert [k for k in out if k[0] == "b"] == [("b", "2024-01-01 00:00:00")]


def test_mad_anomalies_flags_only_outliers(spark):
    import datetime as dt

    from etl_excel_csv_sql_spark.operators.events import mad_anomalies

    base = dt.datetime(2024, 1, 1)
    vals = [10.0, 11.0, 9.0, 10.5, 9.5, 10.2, 9.8, 1000.0]
    rows = [(i, "m", base, v) for i, v in enumerate(vals)]
    # a constant-valued key (MAD 0) must produce no flags, not div-by-zero
    rows += [(100 + i, "flat", base, 5.0) for i in range(5)]
    df = spark.createDataFrame(
        rows, "event_id bigint, event_type string, ts timestamp, value double"
    )
    got = mad_anomalies(df, "event_type", "event_id", "value", 3.5).collect()
    assert [r.event_id for r in got] == [7]
    assert got[0].mod_zscore > 100


def test_tfidf_doc_similarity_geometry(spark):
    from etl_excel_csv_sql_spark.operators.textstats import (
        tfidf_doc_similarity,
    )

    docs = spark.createDataFrame(
        [
            (0, "apple banana cherry"),
            (1, "apple banana cherry"),      # identical to 0 → cosine 1
            (2, "apple banana plum"),        # shares 2/3 terms
            (3, "xylo zebra quark"),         # disjoint
        ],
        "doc_id bigint, text string",
    )
    out = tfidf_doc_similarity(docs, F.col("doc_id") == 0, k=3).collect()
    by_rank = {r.rank: r for r in out}
    assert by_rank[1].similar_doc == 1 and abs(by_rank[1].cosine - 1.0) < 1e-6
    assert by_rank[2].similar_doc == 2 and 0 < by_rank[2].cosine < 1
    # doc 3 shares no terms → never appears (inverted index emits no pair)
    assert {r.similar_doc for r in out} == {1, 2}


def test_tfidf_doc_similarity_max_df_cuts_hot_terms(spark):
    from etl_excel_csv_sql_spark.operators.textstats import (
        tfidf_doc_similarity,
    )

    # "the" appears in all 4 docs; with max_df_ratio=0.9 it is dropped and
    # docs sharing ONLY "the" lose their pairing
    docs = spark.createDataFrame(
        [
            (0, "the apple"),
            (1, "the apple"),
            (2, "the zebra"),
            (3, "the quark"),
        ],
        "doc_id bigint, text string",
    )
    out = tfidf_doc_similarity(
        docs, F.col("doc_id") == 0, k=3, max_df_ratio=0.9
    ).collect()
    assert {r.similar_doc for r in out} == {1}


def test_normalize_unicode_nfc(spark):
    from etl_excel_csv_sql_spark.operators import textstats

    df = spark.createDataFrame(
        [(1, "café"), (2, "plain"), (3, None)], ["doc_id", "text"]
    )
    out = {
        r.id: r for r in textstats.normalize_unicode(df, "doc_id", "text").collect()
    }
    assert out[1].text_norm == "café"  # composed
    assert out[1].len_raw == 5 and out[1].len_norm == 4
    assert out[2].text_norm == "plain" and out[2].len_norm == 5
    assert out[3].text_norm is None and out[3].len_norm is None


# --------------------------------------------------------- bigram surprisal


def test_bigram_surprisal_hand_computed(spark):
    """Corpus: doc1 = "a b", doc2 = "a b", doc3 = "a c", doc4 = "x".

    Bigrams: (a,b) x2, (a,c) x1 -> c1(a)=3, V={a,b,c}, k=0.5.
    P(b|a) = 2.5/4.5; P(c|a) = 1.5/4.5. doc4 has no bigrams -> absent.
    """
    import math

    from etl_excel_csv_sql_spark.operators import textstats

    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a c"), (4, "x")],
        "doc_id long, text string",
    )
    out = {
        r["doc"]: r
        for r in textstats.bigram_surprisal(df, k=0.5).collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[1]["n_bigrams"] == 1
    assert out[1]["bits_per_bigram"] == pytest.approx(
        -math.log2(2.5 / 4.5), abs=1e-6
    )
    assert out[3]["bits_per_bigram"] == pytest.approx(
        -math.log2(1.5 / 4.5), abs=1e-6
    )


def test_bigram_surprisal_flags_word_salad(spark, sf_dir):
    """A shuffled copy of a repetitive fluent doc must score strictly
    higher (more surprising) than the fluent original."""
    from etl_excel_csv_sql_spark.operators import textstats

    fluent = "the cat sat on the mat " * 20
    salad = "mat the on sat cat the sat the mat on cat the " * 10
    df = spark.createDataFrame(
        [(1, fluent), (2, fluent), (3, fluent), (4, salad)],
        "doc_id long, text string",
    )
    out = {
        r["doc"]: r["bits_per_bigram"]
        for r in textstats.bigram_surprisal(df).collect()
    }
    assert out[4] > out[1]


# ----------------------------------------------------------------- DSIR


def test_importance_weights_separates_domains(spark):
    """Docs sharing the target slice's vocabulary must score higher
    than docs from the off-target vocabulary, and a doc mixing both
    sits between."""
    from etl_excel_csv_sql_spark.operators import textstats

    rows = [
        (1, "alpha beta gamma", "en"),
        (2, "alpha gamma beta alpha", "en"),
        (3, "rouge noir vert", "fr"),
        (4, "noir vert rouge rouge", "fr"),
        (5, "alpha beta noir vert", "de"),  # mixed, off-target label
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {
        r["doc"]: r["llr_per_token"]
        for r in textstats.importance_weights(
            df, target=F.col("lang") == "en"
        ).collect()
    }
    assert out[1] > out[5] > out[3]
    assert out[3] < 0 < out[1]


def test_importance_weights_n_tokens(spark):
    from etl_excel_csv_sql_spark.operators import textstats

    df = spark.createDataFrame(
        [(1, "one two three", "en"), (2, "four", "fr")],
        "doc_id long, text string, lang string",
    )
    out = {
        r["doc"]: r["n_tokens"]
        for r in textstats.importance_weights(
            df, target=F.col("lang") == "en"
        ).collect()
    }
    assert out == {1: 3, 2: 1}


# ---------------------------------------------------------- Gopher rules


def test_gopher_rules_each_rule_toggles(spark):
    from etl_excel_csv_sql_spark.operators import textstats

    good = "the quick brown fox jumps over a lazy dog " * 3  # 30 words
    rows = [
        (1, good),
        (2, "short text only"),  # < 20 words
        (3, "zz " * 25),  # no stopwords
        (4, ("#tag " * 10) + good),  # symbol ratio > 0.1
        (5, ""),  # empty
        (6, ("12345 " * 30)),  # no alphabetic words, no stopwords
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc"]: r for r in textstats.gopher_rules(df).collect()}
    assert out[1]["keep"] is True
    assert out[2]["rule_word_count"] is False and out[2]["keep"] is False
    assert out[3]["rule_stopwords"] is False and out[3]["keep"] is False
    assert out[4]["rule_symbol_ratio"] is False and out[4]["keep"] is False
    assert out[5]["n_words"] == 0 and out[5]["keep"] is False
    assert out[6]["rule_alpha_frac"] is False and out[6]["keep"] is False


def test_gopher_rules_reports_counts(spark):
    from etl_excel_csv_sql_spark.operators import textstats

    df = spark.createDataFrame(
        [(1, "the cat and the hat")], "doc_id long, text string"
    )
    r = textstats.gopher_rules(df).collect()[0]
    assert r["n_words"] == 5
    assert r["stopword_hits"] == 3  # the, and, the
    assert abs(r["mean_word_len"] - 15 / 5) < 1e-9


# ---------------------------------------------------------- datacard/vocab


def test_corpus_datacard_known_values(spark):
    from etl_excel_csv_sql_spark.operators import textstats

    df = spark.createDataFrame(
        [
            (1, "a b c", "en", "s1"),
            (2, "a b c", "en", "s1"),  # exact dup
            (3, "d e", "fr", "s2"),
            (4, "", "fr", "s2"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    out = {r["metric"]: r["value"] for r in textstats.corpus_datacard(df).collect()}
    assert out["n_docs"] == 4.0
    assert out["n_tokens"] == 8.0
    assert out["min_tokens"] == 0.0 and out["max_tokens"] == 3.0
    assert out["exact_dup_rate"] == pytest.approx(0.25)
    assert out["lang_frac_en"] == pytest.approx(0.5)
    assert out["n_sources"] == 2.0


def test_vocab_coverage_monotone_and_exact_on_small_vocab(spark):
    from etl_excel_csv_sql_spark.operators import textstats

    # 3 types: x appears 6 times, y 3, z 1
    df = spark.createDataFrame(
        [(1, "x x x y"), (2, "x x x y y z")], "doc_id long, text string"
    )
    out = {
        r["vocab_size"]: r
        for r in textstats.vocab_coverage_report(df, ks=(1, 2, 3)).collect()
    }
    assert out[1]["occurrence_coverage"] == pytest.approx(0.6)
    assert out[2]["occurrence_coverage"] == pytest.approx(0.9)
    assert out[3]["occurrence_coverage"] == pytest.approx(1.0)
    assert out[3]["types_used"] == 3


def test_mad_anomalies_degenerate_mad_fallback(spark):
    """MAD = 0 (>= half the group identical) must fall back to the
    Iglewicz-Hoaglin mean-absolute-deviation form instead of silently
    suppressing the group's anomalies — the [5,5,5,5,huge] corruption
    shape is exactly what the screen exists to catch."""
    from etl_excel_csv_sql_spark.operators import events as ev_ops

    df = spark.createDataFrame(
        [(i, "k", 5.0) for i in range(8)] + [(99, "k", 1_000_000.0)],
        "event_id long, event_type string, value double",
    )
    got = ev_ops.mad_anomalies(df, "event_type", "event_id", "value", 3.5)
    rows = got.collect()
    assert [r.event_id for r in rows] == [99]
    # all-identical group: nothing flags (no spread at all)
    flat = spark.createDataFrame(
        [(i, "k", 5.0) for i in range(6)],
        "event_id long, event_type string, value double",
    )
    assert ev_ops.mad_anomalies(flat, "event_type", "event_id", "value").count() == 0


def test_acf_daily_calendar_gaps_keep_weekly_lag(spark):
    """A weekday-only series (calendar gaps every weekend) must still
    spike at lag 7, not lag 5 — lead() over the observed-days frame
    turned day-lags into row-lags before the day-spine densification."""
    import datetime

    from etl_excel_csv_sql_spark.operators import events as ev_ops

    rows = []
    d0 = datetime.datetime(2024, 1, 1)  # a Monday
    for day in range(56):
        dt = d0 + datetime.timedelta(days=day)
        if dt.weekday() >= 5:
            continue  # no weekend events at all
        # strong weekly cycle on weekdays: Monday high, Friday low
        v = 100.0 - 20.0 * dt.weekday()
        rows.append((day, dt, v))
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    acf = {r.lag: r.acf for r in ev_ops.acf_daily(df, "value", "ts", 7).collect()}
    assert acf[7] > 0.8, acf  # weekly cycle lands at CALENDAR lag 7
    # (the biased estimator's full-series denominator caps it below 1)
    assert acf[7] > acf[5] + 0.2, acf  # and not at row-lag 5


def test_compression_ratio_keeps_string_ids(spark):
    """A hardcoded cast('long') used to null every string/UUID id."""
    from etl_excel_csv_sql_spark.operators.textstats import compression_ratio

    df = spark.createDataFrame(
        [("doc-aa", "hello hello hello hello"), ("doc-bb", "xyz")],
        ["doc_id", "text"],
    )
    got = {r.id: r.compression_ratio for r in compression_ratio(df).collect()}
    assert set(got) == {"doc-aa", "doc-bb"}
    assert all(v > 0 for v in got.values())


def test_quality_classifier_planted_separable(spark):
    """The quality_classifier_predictions oracle's safety pin: on the
    planted (id%7, id%5, id%3) geometry with label = [f1+f2 >= 6]
    (linearly separable with a full unit of margin), 50 L-BFGS
    iterations classify EVERY point by the planted rule, predictions
    are repartition-invariant, and the keep_threshold path filters to
    exactly the predicted-quality side."""
    from pyspark.sql import functions as F

    from etl_excel_csv_sql_spark.operators import textstats

    feats = ["f1", "f2", "f3"]
    docs = (
        spark.range(0, 500)
        .select(
            F.col("id").alias("doc_id"),
            F.pmod("id", F.lit(7)).cast("double").alias("f1"),
            F.pmod("id", F.lit(5)).cast("double").alias("f2"),
            F.pmod("id", F.lit(3)).cast("double").alias("f3"),
        )
        .withColumn(
            "label", ((F.col("f1") + F.col("f2")) >= 6).cast("double")
        )
    )
    model = textstats.train_quality_classifier(docs, feats, "label")
    got = {
        r["doc_id"]: r["prediction"]
        for r in textstats.classify_quality(model, docs, feats).collect()
    }
    want = {d: (1.0 if (d % 7) + (d % 5) >= 6 else 0.0) for d in range(500)}
    assert got == want
    got_repart = {
        r["doc_id"]: r["prediction"]
        for r in textstats.classify_quality(
            model, docs.repartition(13), feats
        ).collect()
    }
    assert got_repart == want
    kept = {
        r["doc_id"]
        for r in textstats.classify_quality(
            model, docs, feats, keep_threshold=0.5
        ).collect()
    }
    assert kept == {d for d, p in want.items() if p == 1.0}
