"""URL hygiene operators: the normalization contract's edge cases, the
eTLD+1 heuristic table, and the dedup keeper shape — all pure-Catalyst,
so one small frame exercises every branch."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_excel_csv_sql_spark.operators import urls


def _norm(spark, raw: list[str]) -> list[str]:
    df = spark.createDataFrame([(u,) for u in raw], "url string")
    return [
        r["n"]
        for r in df.select(urls.normalize_url("url").alias("n")).collect()
    ]


def test_normalize_url_contract(spark):
    cases = [
        # scheme + host lowercase; path case preserved
        ("HTTP://EXAMPLE.COM/PaTh", "http://example.com/PaTh"),
        # default ports strip per scheme
        ("http://example.com:80/a", "http://example.com/a"),
        ("https://example.com:443/a", "https://example.com/a"),
        # NON-default ports survive
        ("https://example.com:8443/a", "https://example.com:8443/a"),
        # http :443 is NOT default — survives
        ("http://example.com:443/a", "http://example.com:443/a"),
        # fragment drops, whitespace trims
        ("  https://example.com/a#frag  ", "https://example.com/a"),
        # trailing slashes collapse without a query...
        ("https://example.com/a///", "https://example.com/a"),
        ("https://example.com/", "https://example.com"),
        # ...but a query string freezes the path
        ("https://example.com/a/?q=1", "https://example.com/a/?q=1"),
        # query values keep their case
        ("https://example.com/a?Q=Vv", "https://example.com/a?Q=Vv"),
        # userinfo keeps its case (RFC 3986 §3.2.1); only the HOST
        # lowercases — 'User' and 'user' are different credentials
        ("https://User:Pw@EXAMPLE.com/a", "https://User:Pw@example.com/a"),
        # idempotence fixture
        ("https://example.com/a", "https://example.com/a"),
        # RFC 3986 §6.2.2 percent normalization (r14): unreserved
        # escapes decode, surviving escapes re-uppercase, reserved
        # escapes never decode, stray '%' survives verbatim
        ("https://example.com/a%6fb%2fc", "https://example.com/aob%2Fc"),
        ("https://example.com/%7Euser", "https://example.com/~user"),
        ("https://example.com/x?q=%41%25", "https://example.com/x?q=A%25"),
        ("https://example.com/100%", "https://example.com/100%"),
        ("https://example.com/a%zzb", "https://example.com/a%zzb"),
        # %2F must NOT collapse into a path separator, and an encoded
        # trailing slash must NOT strip
        ("https://example.com/a%2F", "https://example.com/a%2F"),
        # scheme-less input passes through trimmed + defragmented
        # instead of minting a corrupted '://...' key (ADVICE r13)
        ("example.com/x", "example.com/x"),
        ("  example.com/x#frag ", "example.com/x"),
        ("/relative/path", "/relative/path"),
        ("", ""),
    ]
    got = _norm(spark, [c[0] for c in cases])
    for (raw, want), out in zip(cases, got):
        assert out == want, raw
    # idempotent: normalizing the normalized form is a fixpoint
    again = _norm(spark, [c[1] for c in cases])
    assert again == [c[1] for c in cases]


def test_host_and_registrable_domain(spark):
    cases = [
        ("https://sub.example.co.uk/x", "sub.example.co.uk", "example.co.uk"),
        ("https://www.example.com/x", "www.example.com", "example.com"),
        ("https://example.org/x", "example.org", "example.org"),
        # port and userinfo strip from host
        ("https://user:pw@example.com:8443/x", "example.com", "example.com"),
        # 2-letter-TLD registrar rule needs >= 3 labels
        ("https://example.ac/x", "example.ac", "example.ac"),
        ("https://deep.a.b.example.gov.br/x", "deep.a.b.example.gov.br",
         "example.gov.br"),
        # single label (intranet host) passes through
        ("https://localhost/x", "localhost", "localhost"),
        # .com is not a 2-letter TLD: last TWO labels only
        ("https://a.co.com/x", "a.co.com", "co.com"),
        # --- r14 PSL snapshot lanes (VERDICT r13 #3) ---
        # private-section suffix: every github.io site is its own
        # registrable domain
        ("https://u.github.io/x", "u.github.io", "u.github.io"),
        ("https://deep.u.github.io/x", "deep.u.github.io", "u.github.io"),
        # 3-letter ccTLD SLD the old heuristic missed
        ("https://www.biz.com.au/x", "www.biz.com.au", "biz.com.au"),
        # 4-label US locality rule
        ("https://www.sch.pvt.k12.ma.us/x", "www.sch.pvt.k12.ma.us",
         "sch.pvt.k12.ma.us"),
        # 3-label US locality (k12.<state>.us)
        ("https://hs.k12.ca.us/x", "hs.k12.ca.us", "hs.k12.ca.us"),
        ("https://a.hs.k12.ca.us/x", "a.hs.k12.ca.us", "hs.k12.ca.us"),
        # wildcard ccTLD *.ck: foo.ck is itself a public suffix, so
        # shop.foo.ck is the registrable domain...
        ("https://shop.foo.ck/x", "shop.foo.ck", "shop.foo.ck"),
        ("https://a.shop.foo.ck/x", "a.shop.foo.ck", "shop.foo.ck"),
        # ...with the !www.ck exception punched through
        ("https://sub.www.ck/x", "sub.www.ck", "www.ck"),
        # deep private wildcard: *.compute.amazonaws.com
        ("https://ec2-1.us-east-1.compute.amazonaws.com/x",
         "ec2-1.us-east-1.compute.amazonaws.com",
         "ec2-1.us-east-1.compute.amazonaws.com"),
        # a bare public suffix returns itself (total key)
        ("https://github.io/x", "github.io", "github.io"),
        ("https://co.uk/x", "co.uk", "co.uk"),
        # heuristic fallback still covers unlisted 2-letter ccTLDs
        ("https://x.co.xx/x", "x.co.xx", "x.co.xx"),
        # --- r15 snapshot additions (VERDICT r14 #3) ---
        # 3-label private suffix nested under an ICANN 2-label one:
        # blogspot.co.uk outranks co.uk (most-labels wins)
        ("https://blog.me.blogspot.co.uk/x", "blog.me.blogspot.co.uk",
         "me.blogspot.co.uk"),
        ("https://me.blogspot.co.uk/x", "me.blogspot.co.uk",
         "me.blogspot.co.uk"),
        # newly-snapshotted 2-label private suffixes
        ("https://dev.app.trycloudflare.com/x", "dev.app.trycloudflare.com",
         "app.trycloudflare.com"),
        ("https://site.notion.site/x", "site.notion.site",
         "site.notion.site"),
        ("https://env.elasticbeanstalk.com/x", "env.elasticbeanstalk.com",
         "env.elasticbeanstalk.com"),
        # 3-label private suffix service.gov.uk (vs ICANN gov.uk)
        ("https://apply.visa.service.gov.uk/x", "apply.visa.service.gov.uk",
         "visa.service.gov.uk"),
        ("https://www.gov.uk/x", "www.gov.uk", "www.gov.uk"),
    ]
    df = spark.createDataFrame([(c[0],) for c in cases], "url string")
    rows = df.select(
        urls.normalize_url("url").alias("n")
    ).select(
        urls.url_host("n").alias("h")
    ).select(
        "h", urls.registrable_domain("h").alias("e")
    ).collect()
    for (raw, host, etld), r in zip(cases, rows):
        assert r["h"] == host, raw
        assert r["e"] == etld, raw


def test_url_key_dedup_keeper_shape(spark):
    df = spark.createDataFrame(
        [
            (1, "https://example.com/a"),
            (2, "HTTPS://EXAMPLE.COM/a"),
            (3, "https://example.com:443/a/"),
            (4, "https://example.com/b"),
        ],
        "doc_id long, url string",
    )
    rows = {
        r["url_norm"]: r
        for r in urls.url_key_dedup(df, "doc_id", "url").collect()
    }
    assert rows["https://example.com/a"]["keeper_doc_id"] == 1
    assert rows["https://example.com/a"]["n_dups"] == 3
    assert rows["https://example.com/b"]["keeper_doc_id"] == 4
    assert rows["https://example.com/b"]["n_dups"] == 1
    assert rows["https://example.com/a"]["etld1"] == "example.com"


def test_url_ops_stay_in_codegen(spark):
    """No Python stage anywhere: the whole dedup plan must be Catalyst
    exprs + one hash aggregate (the 100 TB scan-speed claim)."""
    df = spark.createDataFrame(
        [(1, "https://example.com/a")], "doc_id long, url string"
    )
    plan = (
        urls.url_key_dedup(df, "doc_id", "url")
        ._jdf.queryExecution().executedPlan().toString()
    )
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                   "FlatMapGroupsInPandas"):
        assert marker not in plan


def test_fetch_schedule_rate_invariant(spark):
    import pytest as _pytest

    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(f"https://h{i % 3}.com/p{i:02d}", f"h{i % 3}.com")
         for i in range(10)],
        "url_norm string, host string",
    )
    out = urls.fetch_schedule(df, rate_per_wave=2).collect()
    by_host_wave = {}
    for r in out:
        by_host_wave.setdefault((r["host"], r["wave"]), []).append(r)
        assert r["wave"] == r["slot"] // 2
    # the politeness invariant: never more than rate URLs per host+wave
    assert all(len(v) <= 2 for v in by_host_wave.values())
    # slots are dense 0..n-1 per host in url order
    for h in ("h0.com", "h1.com", "h2.com"):
        rows = sorted(
            (r for r in out if r["host"] == h), key=lambda r: r["slot"]
        )
        assert [r["slot"] for r in rows] == list(range(len(rows)))
        assert [r["url_norm"] for r in rows] == sorted(
            r["url_norm"] for r in rows
        )
    with _pytest.raises(ValueError, match="rate_per_wave"):
        urls.fetch_schedule(df, rate_per_wave=0)


def test_fetch_schedule_bucketed_whale_proof(spark):
    """Bucket-and-stitch scheduling: per-host slots are a dense
    permutation 0..n-1 (exactly what the plain per-host window gives,
    under a different deterministic order), waves respect the rate,
    and no window in the plan is unpartitioned."""
    rows = [
        (f"https://whale.com/p{i:03d}", "whale.com") for i in range(60)
    ] + [(f"https://tail{i}.com/x", f"tail{i}.com") for i in range(5)]
    df = spark.createDataFrame(rows, "url_norm string, host string")
    out = urls.fetch_schedule_bucketed(
        df, rate_per_wave=4, n_buckets=8
    ).collect()
    by_host: dict = {}
    for r in out:
        by_host.setdefault(r["host"], []).append(r)
    assert sorted(r["slot"] for r in by_host["whale.com"]) == list(range(60))
    for rs in by_host.values():
        for r in rs:
            assert r["wave"] == r["slot"] // 4
    # the whale's per-(host,bucket) groups are all smaller than the host
    from collections import Counter

    c = Counter((r["host"], r["bucket"]) for r in by_host["whale.com"])
    assert max(c.values()) < 60
    # deterministic: same input -> same slots
    again = {
        (r["url_norm"], r["slot"])
        for r in urls.fetch_schedule_bucketed(
            df, rate_per_wave=4, n_buckets=8
        ).collect()
    }
    assert again == {(r["url_norm"], r["slot"]) for r in out}
    # plan: every Window partitions (no single-task global ordering)
    plan = (
        urls.fetch_schedule_bucketed(df, n_buckets=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    import re

    for m in re.finditer(r"Window \[[^\]]*\], \[([^\]]*)\]", plan):
        assert m.group(1).strip(), "unpartitioned window in plan"


def test_fetch_schedule_delays_dedupes_dim(spark):
    """ADVICE r14: duplicate host rows in the delays dim must not
    multiply frontier rows — the dim aggregates to one row per host
    (max wins, the most conservative published delay), so slots stay a
    dense permutation and eta_s = slot * delay."""
    frontier = spark.createDataFrame(
        [(f"https://a.com/p{i}", "a.com") for i in range(4)]
        + [("https://b.com/x", "b.com")],
        "url_norm string, host string",
    )
    delays = spark.createDataFrame(
        # a.com appears TWICE with different delays; 5.0 must win
        [("a.com", 2.0), ("a.com", 5.0)],
        "host string, crawl_delay_s double",
    )
    out = urls.fetch_schedule_delays(frontier, delays).collect()
    assert len(out) == 5  # no row multiplication
    a = sorted((r for r in out if r["host"] == "a.com"),
               key=lambda r: r["slot"])
    assert [r["slot"] for r in a] == [0, 1, 2, 3]
    assert all(r["crawl_delay_s"] == 5.0 for r in a)
    assert [r["eta_s"] for r in a] == [0.0, 5.0, 10.0, 15.0]
    (b,) = [r for r in out if r["host"] == "b.com"]
    assert b["crawl_delay_s"] == 1.0  # default


def test_crawl_revisit_diff_null_fp_presence(spark):
    """ADVICE r14: presence comes from explicit markers, not fp
    nullness. A prev row with a NULL fp is PRESENT (gone if absent
    from curr, changed if curr minted a fp); both-NULL fps on a URL
    present in both snapshots is unchanged."""
    prev = spark.createDataFrame(
        [("u1", None), ("u2", None), ("u3", None), ("u4", "f4")],
        "url_norm string, fp string",
    )
    curr = spark.createDataFrame(
        [("u1", None), ("u2", "f2"), ("u4", "f4"), ("u5", None)],
        "url_norm string, fp string",
    )
    got = {
        r["url"]: r["status"]
        for r in urls.crawl_revisit_diff(prev, curr).collect()
    }
    assert got == {
        "u1": "unchanged",  # both present, both fps NULL
        "u2": "changed",    # NULL -> f2
        "u3": "gone",       # present in prev despite NULL fp
        "u4": "unchanged",
        "u5": "new",        # NULL fp in curr is still present
    }
