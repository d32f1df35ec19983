"""Tests for the data-quality suite, record linkage, unigram surprisal,
and weighted sampling (r6 batch 3)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from etl_excel_csv_sql_spark.catalog import load_table
from etl_excel_csv_sql_spark.operators import linkage, quality as dq, sampling


# ---------------------------------------------------------------------------
# quality: deequ-lite constraint suite
# ---------------------------------------------------------------------------

def test_dq_check_suite_values(spark):
    df = spark.createDataFrame(
        [
            (1, 10.0, "A", "x"),
            (2, 10.0, "A", "y"),
            (2, 200.0, "B", None),  # dup id, out-of-range, bad set member
            (None, 5.0, "A", "zz"),  # null id
        ],
        "id int, amount double, flag string, ref string",
    )
    dim = spark.createDataFrame([("x",), ("y",)], "k string")
    rep = dq.run_checks(
        df,
        "t",
        checks=[
            dq.not_null("id"),
            dq.in_range("amount", 0.0, 100.0),
            dq.in_set("flag", ["A"]),
            dq.matches("ref", "^[a-z]$"),
        ],
        uniques=[dq.Unique(("id",))],
        refs=[dq.RefIntegrity("ref", dim, "k", "dim")],
    ).collect()
    got = {r["constraint"]: (r["violations"], r["total"], r["passed"]) for r in rep}
    assert got["not_null(id)"] == (1, 4, False)
    assert got["in_range(amount,0.0,100.0)"] == (1, 4, False)
    assert got["in_set(flag)"] == (1, 4, False)
    # NULL ref passes matches (three-valued logic); 'zz' fails the regex
    assert got["matches(ref)"] == (1, 4, False)
    # ids: 1, 2, 2, NULL -> 4 rows, 3 distinct tuples (NULL counts as a
    # distinct group under count_distinct? no — count_distinct skips NULL)
    assert got["unique(id)"][0] >= 1
    # refs: non-null refs are x, y, zz -> zz orphan
    assert got["ref(ref->dim.k)"] == (1, 4, False)


def test_dq_all_green_on_clean_frame(spark):
    df = spark.createDataFrame([(1, "A"), (2, "B")], "id int, f string")
    rep = dq.run_checks(
        df,
        "clean",
        checks=[dq.not_null("id"), dq.in_set("f", ["A", "B"])],
        uniques=[dq.Unique(("id",))],
    ).collect()
    assert all(r["passed"] for r in rep)
    assert {r["constraint"] for r in rep} == {
        "not_null(id)",
        "in_set(f)",
        "unique(id)",
    }


# ---------------------------------------------------------------------------
# linkage: blocked fuzzy matching
# ---------------------------------------------------------------------------

def test_fuzzy_self_pairs_basic(spark):
    df = spark.createDataFrame(
        [
            (1, "cold widget"),
            (2, "bold widget"),   # dist 1 from cold widget
            (3, "small widget"),  # dist 4 from cold widget
            (4, "cold gear"),     # different block
            (5, "cold widget"),   # exact dup of 1 — canonicalized away
        ],
        "id int, name string",
    )
    distinct = linkage.canonicalize_exact(df, "id", "name")
    assert distinct.count() == 4
    members = {
        r["text"]: r["n_members"] for r in distinct.collect()
    }
    assert members["cold widget"] == 2

    pairs = linkage.fuzzy_self_pairs(
        distinct, linkage.last_token_block(), max_dist=2
    ).collect()
    assert len(pairs) == 1
    p = pairs[0]
    assert {p["text_a"], p["text_b"]} == {"cold widget", "bold widget"}
    assert p["dist"] == 1
    assert abs(p["similarity"] - (1 - 1 / 11)) < 1e-6


def test_fuzzy_max_block_cap_drops_mega_blocks(spark):
    rows = [(i, f"name{i:02d} common") for i in range(20)] + [
        (100, "alpha rare"),
        (101, "alphb rare"),
    ]
    df = spark.createDataFrame(rows, "id int, name string")
    distinct = linkage.canonicalize_exact(df, "id", "name")
    pairs = linkage.fuzzy_self_pairs(
        distinct, linkage.last_token_block(), max_dist=2, max_block=10
    ).collect()
    # the 20-name 'common' block exceeds the cap and is dropped entirely;
    # only the rare-block pair survives
    assert len(pairs) == 1
    assert {pairs[0]["text_a"], pairs[0]["text_b"]} == {"alpha rare", "alphb rare"}


def test_multi_pass_blocking_raises_recall(spark):
    # suffix edit: last-token blocking misses it, prefix blocking finds it
    df = spark.createDataFrame(
        [(1, "abcdef gears"), (2, "abcdef gearz")], "id int, name string"
    )
    distinct = linkage.canonicalize_exact(df, "id", "name")
    p1 = linkage.fuzzy_self_pairs(distinct, linkage.last_token_block(), 2)
    p2 = linkage.fuzzy_self_pairs(distinct, linkage.prefix_length_block(), 2)
    assert p1.count() == 0
    union = p1.unionByName(p2).dropDuplicates(["id_a", "id_b"])
    assert union.count() == 1


# ---------------------------------------------------------------------------
# unigram surprisal
# ---------------------------------------------------------------------------

def test_unigram_surprisal_hand_computed(spark):
    from etl_excel_csv_sql_spark.operators import textstats

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id int, text string"
    )
    # corpus counts: a=2, b=2, c=1, N=5
    out = {
        r["doc"]: r for r in textstats.unigram_surprisal(df).collect()
    }
    exp1 = -(2 * math.log2(2 / 5) + math.log2(2 / 5)) / 3
    exp2 = -(math.log2(2 / 5) + math.log2(1 / 5)) / 2
    assert out[1]["n_tokens"] == 3
    assert abs(out[1]["bits_per_token"] - exp1) < 1e-6
    assert abs(out[2]["bits_per_token"] - exp2) < 1e-6


def test_unigram_surprisal_flags_outlier_docs(spark, sf_dir):
    from etl_excel_csv_sql_spark.operators import textstats

    docs = load_table(spark, sf_dir, "documents")
    scored = textstats.unigram_surprisal(docs)
    stats = scored.agg(
        F.min("bits_per_token"), F.max("bits_per_token")
    ).first()
    # corpus is drawn from one vocab: scores are finite, positive, spread
    assert 0 < stats[0] <= stats[1] < 30


# ---------------------------------------------------------------------------
# weighted sampling without replacement
# ---------------------------------------------------------------------------

def test_wswr_exact_k_and_deterministic(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    s1 = sampling.weighted_sample_without_replacement(
        orders, "o_orderkey", "o_totalprice", k=50
    )
    ids1 = {r["o_orderkey"] for r in s1.collect()}
    ids2 = {
        r["o_orderkey"]
        for r in sampling.weighted_sample_without_replacement(
            orders.repartition(7), "o_orderkey", "o_totalprice", k=50
        ).collect()
    }
    assert len(ids1) == 50
    assert ids1 == ids2  # partitioning-invariant draw
    ids3 = {
        r["o_orderkey"]
        for r in sampling.weighted_sample_without_replacement(
            orders, "o_orderkey", "o_totalprice", k=50, salt="other"
        ).collect()
    }
    assert ids1 != ids3  # fresh salt redraws


def test_wswr_weight_bias(spark):
    # two strata: weight 100 vs weight 1 — the heavy stratum must dominate
    rows = [(i, 100.0 if i < 50 else 1.0) for i in range(1000)]
    df = spark.createDataFrame(rows, "id int, w double")
    got = sampling.weighted_sample_without_replacement(df, "id", "w", k=50)
    heavy = got.where(F.col("w") == 100.0).count()
    # E[heavy] ≈ 46 of 50 under A-ES; anything ≥ 30 shows the bias works
    assert heavy >= 30


def test_wswr_excludes_nonpositive_weights(spark):
    df = spark.createDataFrame(
        [(1, 0.0), (2, -5.0), (3, None), (4, 2.0)], "id int, w double"
    )
    got = sampling.weighted_sample_without_replacement(df, "id", "w", k=10)
    assert [r["id"] for r in got.collect()] == [4]


def test_fuzzy_join_best_match_and_block_reanchoring(spark):
    """Cross-table linkage: typo'd feed names resolve to their canonical
    record; best_only picks min (dist, right_id) deterministically; the
    block builder re-anchors per side (different text column names)."""
    from etl_excel_csv_sql_spark.operators import linkage

    canon = spark.createDataFrame(
        [(1, "blue widget"), (2, "red widget"), (3, "green gadget")],
        "rep_id long, text string",
    )
    dirty = spark.createDataFrame(
        [(100, "blu widget"), (101, "redd widget"), (102, "green gizmo")],
        "id long, feed_name string",
    )
    out = {
        r.left_id: r
        for r in linkage.fuzzy_join(
            dirty,
            canon,
            block=linkage.last_token_block,
            max_dist=2,
            left_text="feed_name",
            best_only=True,
        ).collect()
    }
    assert out[100].right_id == 1 and out[100].dist == 1
    assert out[101].right_id == 2 and out[101].dist == 1
    assert 102 not in out  # different last token: never a candidate


def test_fuzzy_join_max_block_drops_hot_canonical_block(spark):
    from etl_excel_csv_sql_spark.operators import linkage

    canon = spark.createDataFrame(
        [(i, f"name{i} hot") for i in range(10)] + [(99, "cold alpha")],
        "rep_id long, text string",
    )
    dirty = spark.createDataFrame(
        [(1000, "name1 hot"), (1001, "colt alpha")], "id long, text string"
    )
    out = linkage.fuzzy_join(
        dirty, canon, block=linkage.last_token_block, max_dist=2,
        max_block=5, best_only=True,
    ).collect()
    ids = {r.left_id for r in out}
    assert 1000 not in ids  # hot block dropped by the cap
    assert 1001 in ids  # small block unaffected


# ------------------------------------------------------------ Jaro-Winkler


def test_jaro_winkler_kernel_matches_duckdb_fuzz():
    """The whole oracle strategy rests on bit-parity of the Python
    kernel with DuckDB's jaro_winkler_similarity — fuzz it directly."""
    import random

    import duckdb

    from etl_excel_csv_sql_spark.operators.linkage import _jaro_winkler_py

    con = duckdb.connect()
    rng = random.Random(1234)
    cases = [
        ("", ""), ("a", ""), ("", "b"), ("martha", "marhta"),
        ("dixon", "dicksonx"), ("same", "same"),
    ]
    for _ in range(2000):
        n1, n2 = rng.randint(0, 14), rng.randint(0, 14)
        cases.append((
            "".join(rng.choice("abcdE 9") for _ in range(n1)),
            "".join(rng.choice("abcdE 9") for _ in range(n2)),
        ))
    for s1, s2 in cases:
        duck = con.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [s1, s2]
        ).fetchone()[0]
        assert abs(duck - _jaro_winkler_py(s1, s2)) < 1e-12, (s1, s2)


def test_jaro_winkler_vectorized_matches_scalar_fuzz():
    """The mapInPandas scorer now runs the NumPy batch kernel (VERDICT
    r7 #4); it must be BIT-equal to the scalar reference (which is
    itself fuzz-pinned to DuckDB above) on every batch shape: empties,
    equal strings, transpositions, mixed lengths, unicode, and the
    NUL-fallback rows."""
    import random

    from etl_excel_csv_sql_spark.operators.linkage import (
        _jaro_winkler_np,
        _jaro_winkler_py,
    )

    rng = random.Random(4321)
    cases = [
        ("", ""), ("a", ""), ("", "b"), ("martha", "marhta"),
        ("dixon", "dicksonx"), ("same", "same"), ("ab", "ba"),
        ("наука", "наука"), ("a\x00b", "ab"),  # NUL fallback row
    ]
    for _ in range(3000):
        n1, n2 = rng.randint(0, 20), rng.randint(0, 20)
        cases.append((
            "".join(rng.choice("abcdE 9ü水") for _ in range(n1)),
            "".join(rng.choice("abcdE 9ü水") for _ in range(n2)),
        ))
    # long / mixed-length pairs: lengths 50-150 on each side exercise
    # (a) the L2 > 63 boolean-matrix branch, and (b) the bit-parallel
    # branch's window-past-end edge (l1 >= 128 vs short l2 drives the
    # raw window lower bound past bit 63 — the r8 shift-UB site; the
    # kernel must clamp, not rely on platform shift semantics)
    for _ in range(300):
        n1, n2 = rng.randint(50, 150), rng.randint(50, 150)
        cases.append((
            "".join(rng.choice("abcdE 9ü水") for _ in range(n1)),
            "".join(rng.choice("abcdE 9ü水") for _ in range(n2)),
        ))
    got = _jaro_winkler_np([a for a, _ in cases], [b for _, b in cases])
    for (s1, s2), g in zip(cases, got):
        assert g == _jaro_winkler_py(s1, s2), (s1, s2)
    # dedicated bit-parallel batch: the kernel branches on the BATCH max
    # of len(s2), so every s2 here stays <= 63 while s1 runs 128-160 —
    # the exact shape where i - window exceeds 63 inside the uint64 path
    bit_cases = []
    for _ in range(400):
        bit_cases.append((
            "".join(rng.choice("abcd") for _ in range(rng.randint(128, 160))),
            "".join(rng.choice("abcd") for _ in range(rng.randint(1, 63))),
        ))
    got_bits = _jaro_winkler_np(
        [a for a, _ in bit_cases], [b for _, b in bit_cases]
    )
    for (s1, s2), g in zip(bit_cases, got_bits):
        assert g == _jaro_winkler_py(s1, s2), (s1, s2)
    # batch invariance: a sub-batch scores identically to the full batch
    sub = _jaro_winkler_np([cases[3][0]], [cases[3][1]])
    assert sub[0] == got[3]
    assert list(_jaro_winkler_np([], [])) == []


def test_jaro_winkler_pairs_finds_transposed_names(spark):
    from etl_excel_csv_sql_spark.operators import linkage

    df = spark.createDataFrame(
        [
            (1, "chartreuse metallic anchor"),
            (2, "chartruese metallic anchor"),  # transposition typo
            (3, "completely different anchor"),
            (4, "lone wolf"),
        ],
        "rep_id long, text string",
    )
    out = linkage.jaro_winkler_pairs(
        df, linkage.last_token_block(), threshold=0.9, max_block=100
    ).collect()
    pairs = {(r.id_a, r.id_b) for r in out}
    assert (1, 2) in pairs
    assert all(p != (1, 3) and p != (2, 3) for p in pairs)
    sim = {(r.id_a, r.id_b): r.similarity for r in out}[(1, 2)]
    assert 0.9 <= sim < 1.0


def test_jaro_winkler_pairs_respects_block_cap(spark):
    from etl_excel_csv_sql_spark.operators import linkage

    rows = [(i, f"name{i} hot") for i in range(10)] + [
        (100, "cold alpha"),
        (101, "colt alpha"),
    ]
    df = spark.createDataFrame(rows, "rep_id long, text string")
    out = linkage.jaro_winkler_pairs(
        df, linkage.last_token_block(), threshold=0.8, max_block=5
    ).collect()
    ids = {i for r in out for i in (r.id_a, r.id_b)}
    assert ids == {100, 101}  # the hot block never generated candidates


# ----------------------------------------------------------------- UDTF


def test_diff_spans_reconstruction_invariant(spark):
    """Applying the emitted edit script to `a` must rebuild `b`, and
    the opcodes must equal difflib's directly."""
    import difflib

    from etl_excel_csv_sql_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    pairs = [
        ("promo burnished copper", "promo burnishes copper"),
        ("abc", "xbc"),
        ("same same", "same same"),
        ("", "new"),
    ]
    df = spark.createDataFrame(pairs, "a string, b string")
    df.createOrReplaceTempView("__diff_in")
    rows = spark.sql(
        """
        SELECT i.a, i.b, d.op, d.a_start, d.a_end, d.b_start, d.b_end,
               d.a_seg, d.b_seg
        FROM __diff_in i, LATERAL diff_spans(i.a, i.b) d
        """
    ).collect()
    by_pair = {}
    for r in rows:
        by_pair.setdefault((r["a"], r["b"]), []).append(r)
    assert set(by_pair) == set(pairs)
    for (a, b), ops in by_pair.items():
        ops.sort(key=lambda r: r["a_start"])
        rebuilt = "".join(
            r["b_seg"] if r["op"] != "equal" else a[r["a_start"]:r["a_end"]]
            for r in sorted(ops, key=lambda r: (r["a_start"], r["b_start"]))
        )
        assert rebuilt == b, (a, b)
        expect = difflib.SequenceMatcher(a=a, b=b, autojunk=False).get_opcodes()
        got = [
            (r["op"], r["a_start"], r["a_end"], r["b_start"], r["b_end"])
            for r in sorted(ops, key=lambda r: (r["a_start"], r["b_start"]))
        ]
        assert got == expect, (a, b)


def test_jaro_winkler_pairs_string_ids(spark):
    """The mapInPandas output schema must carry the INPUT id type —
    a hardcoded LongType crashed Arrow conversion on string ids."""
    from etl_excel_csv_sql_spark.operators import linkage

    df = spark.createDataFrame(
        [("a1", "jellyfish"), ("b2", "jellyfish"), ("c3", "smellyfish")],
        ["id", "name"],
    )
    got = {
        (r.id_a, r.id_b): r.similarity
        for r in linkage.jaro_winkler_pairs(
            df, block=F.substring("name", -4, 4), threshold=0.5,
            text_col="name", id_col="id",
        ).collect()
    }
    assert got and all(isinstance(k[0], str) for k in got)
    assert got[("a1", "b2")] == 1.0


def test_fuzzy_join_empty_vs_empty_similarity(spark):
    """dist=0 on two empty strings must yield similarity 1.0, not the
    NULL a 0/0 division produces."""
    from etl_excel_csv_sql_spark.operators import linkage

    left = spark.createDataFrame([(1, "")], ["lid", "ltext"])
    right = spark.createDataFrame([(10, "")], ["rid", "rtext"])
    got = linkage.fuzzy_join(
        left, right, block=F.lit("k"), max_dist=2,
        left_id="lid", left_text="ltext", right_id="rid", right_text="rtext",
    ).collect()
    assert len(got) == 1
    assert got[0].dist == 0 and got[0].similarity == 1.0


def test_run_checks_refs_only_suite(spark):
    """A referential-integrity-only suite (no row checks, no uniques) is
    a legal configuration — inline(array()) used to crash it."""
    from etl_excel_csv_sql_spark.operators import quality as dq

    df = spark.createDataFrame([(1,), (2,), (99,)], "fk int")
    dim = spark.createDataFrame([(1,), (2,)], "k int")
    got = dq.run_checks(
        df, "t", refs=[dq.RefIntegrity("fk", dim, "k", "dim")]
    ).collect()
    assert len(got) == 1
    assert got[0].violations == 1 and got[0].total == 3 and not got[0].passed


def test_run_checks_duplicate_names_raise(spark):
    from etl_excel_csv_sql_spark.operators import quality as dq

    df = spark.createDataFrame([("a",)], "ref string")
    import pytest

    with pytest.raises(ValueError, match="duplicate constraint names"):
        dq.run_checks(
            df, "t",
            checks=[dq.matches("ref", "^[a-z]+$"), dq.matches("ref", "^x")],
        )
    # explicit names disambiguate
    got = dq.run_checks(
        df, "t",
        checks=[
            dq.matches("ref", "^[a-z]+$"),
            dq.matches("ref", "^x", name="matches(ref,starts_x)"),
        ],
    ).collect()
    assert len(got) == 2
