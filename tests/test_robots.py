"""robots.txt politeness filter: parser groups/edge cases, the
longest-match / tie-break / missing-host semantics, and the
Python-free plan pin."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_excel_csv_sql_spark.operators import robots


def test_parse_robots_text_groups_and_edges():
    body = """
# comment line
User-agent: googlebot
Disallow: /g-only

User-agent: *
Disallow: /private   # trailing comment
Allow: /private/ok
Disallow:
Crawl-delay: 10

User-agent: a
User-agent: b
Disallow: /shared
"""
    assert robots.parse_robots_text(body) == [
        ("disallow", "/private"),
        ("allow", "/private/ok"),
    ]
    assert robots.parse_robots_text(body, agent="googlebot") == [
        ("disallow", "/g-only"),
    ]
    # stacked user-agent lines share one group
    assert robots.parse_robots_text(body, agent="A") == [
        ("disallow", "/shared"),
    ]
    # unknown agent falls back to *
    assert robots.parse_robots_text(body, agent="nobody") == [
        ("disallow", "/private"),
        ("allow", "/private/ok"),
    ]
    # no groups at all → empty rules (everything allowed)
    assert robots.parse_robots_text("just text, no directives") == []


def test_url_path_extraction(spark):
    df = spark.createDataFrame(
        [
            ("https://h.com/a/b?q=1",),
            ("https://h.com",),
            ("https://h.com/",),
        ],
        "u string",
    )
    got = [r["p"] for r in df.select(robots.url_path("u").alias("p")).collect()]
    assert got == ["/a/b?q=1", "/", "/"]


def test_filter_crawlable_semantics(spark):
    urls = spark.createDataFrame(
        [
            (1, "https://a.com/public/x", "a.com"),
            (2, "https://a.com/private/x", "a.com"),
            (3, "https://a.com/private/ok/x", "a.com"),
            (4, "https://a.com/private", "a.com"),
            (5, "https://blocked.com/anything", "blocked.com"),
            (6, "https://norules.com/x", "norules.com"),
        ],
        "doc_id long, url_norm string, host string",
    )
    rules = spark.createDataFrame(
        [
            ("a.com", "disallow", "/private"),
            ("a.com", "allow", "/private/ok"),
            ("blocked.com", "disallow", "/"),
            # equal-length tie on /tie: allow wins
            ("a.com", "disallow", "/tie"),
            ("a.com", "allow", "/tie"),
        ],
        "host string, rule string, path string",
    )
    out = {
        r["doc_id"]: r
        for r in robots.filter_crawlable(urls, rules).collect()
    }
    assert out[1]["allowed"] and out[1]["rule_path"] is None
    assert not out[2]["allowed"] and out[2]["rule_path"] == "/private"
    assert out[3]["allowed"] and out[3]["rule_path"] == "/private/ok"
    assert not out[4]["allowed"]
    assert not out[5]["allowed"] and out[5]["rule_path"] == "/"
    assert out[6]["allowed"] and out[6]["rule_path"] is None
    # the tie lane: same frame, a /tie URL
    tie = spark.createDataFrame(
        [(7, "https://a.com/tie/x", "a.com")],
        "doc_id long, url_norm string, host string",
    )
    trow = robots.filter_crawlable(tie, rules).collect()[0]
    assert trow["allowed"] and trow["rule_path"] == "/tie"


def test_compile_rule_pattern(spark):
    """RFC 9309 §2.2.3 pattern compile: * → .*, single trailing $ →
    end anchor, everything else escaped byte-literal."""
    cases = [
        ("/private", "^/private"),
        ("/*ivate", "^/.*ivate"),
        ("/private$", "^/private$"),
        ("/a*b*c", "^/a.*b.*c"),
        # regex metachars in real paths escape: dots, plus, parens
        ("/p.(x)+q", r"^/p\.\(x\)\+q"),
        # a $ NOT at the end is a literal byte
        ("/pa$th", r"^/pa\$th"),
        # double trailing $$: one anchor, one literal
        ("/p$$", r"^/p\$$"),
        ("*", "^.*"),
    ]
    df = spark.createDataFrame([(p,) for p, _ in cases], "path string")
    got = [
        r["c"]
        for r in df.select(
            robots.compile_rule_pattern("path").alias("c")
        ).collect()
    ]
    assert got == [want for _, want in cases]


def test_filter_crawlable_wildcard_semantics(spark):
    """Wildcard rules match per RFC 9309 §2.2.3 instead of degrading
    to literal prefixes (VERDICT r13 #1): mid-path *, $-anchored exact
    match, wildcard-vs-literal specificity, and the equal-length
    wildcard tie."""
    urls = spark.createDataFrame(
        [
            (1, "https://w.com/private/x", "w.com"),
            (2, "https://w.com/private/ok/x", "w.com"),
            (3, "https://w.com/public/x", "w.com"),
            (4, "https://x.com/private", "x.com"),
            (5, "https://x.com/private/x", "x.com"),
            (6, "https://y.com/a/deep/b", "y.com"),
            (7, "https://y.com/a/b2", "y.com"),
            (8, "https://z.com/docs/page.pdf", "z.com"),
            (9, "https://z.com/docs/page.pdfx", "z.com"),
            (10, "https://t.com/tie/x", "t.com"),
        ],
        "doc_id long, url_norm string, host string",
    )
    rules = spark.createDataFrame(
        [
            # wildcard disallow vs LONGER literal allow (11 > 7 octets)
            ("w.com", "disallow", "/*ivate"),
            ("w.com", "allow", "/private/ok"),
            # $-anchored: exact path only
            ("x.com", "disallow", "/private$"),
            # mid-path wildcard spanning multiple segments
            ("y.com", "disallow", "/a/*/b"),
            # suffix match: *.pdf$ blocks .pdf, not .pdfx
            ("z.com", "disallow", "/*.pdf$"),
            # EQUAL-length wildcard tie: allow wins
            ("t.com", "disallow", "/ti*"),
            ("t.com", "allow", "/*ie"),
        ],
        "host string, rule string, path string",
    )
    out = {
        r["doc_id"]: r
        for r in robots.filter_crawlable(urls, rules).collect()
    }
    assert not out[1]["allowed"] and out[1]["rule_path"] == "/*ivate"
    assert out[2]["allowed"] and out[2]["rule_path"] == "/private/ok"
    assert out[3]["allowed"] and out[3]["rule_path"] is None
    assert not out[4]["allowed"] and out[4]["rule_path"] == "/private$"
    assert out[5]["allowed"]  # anchored rule does not prefix-match
    assert not out[6]["allowed"] and out[6]["rule_path"] == "/a/*/b"
    assert out[7]["allowed"]  # /a/b2 has no middle segment
    assert not out[8]["allowed"] and out[8]["rule_path"] == "/*.pdf$"
    assert out[9]["allowed"]  # $ anchors: .pdfx survives
    assert out[10]["allowed"] and out[10]["rule_path"] == "/*ie"


def test_filter_crawlable_plan_is_python_free(spark):
    urls = spark.createDataFrame(
        [(1, "https://a.com/x", "a.com")],
        "doc_id long, url_norm string, host string",
    )
    rules = spark.createDataFrame(
        [("a.com", "disallow", "/y")], "host string, rule string, path string"
    )
    plan = (
        robots.filter_crawlable(urls, rules)
        ._jdf.queryExecution().executedPlan().toString()
    )
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan
    assert "Window" not in plan  # one max_by aggregation, no window


def test_filter_crawlable_narrow_shuffle_and_duplicates(spark):
    """VERDICT r14 #5: the rule join + verdict aggregation run on a
    narrow (url, host) projection — payload columns never ride the
    per-rule multiply — and duplicate input URLs each keep their row
    (verdict shared per URL) instead of collapsing."""
    urls_df = spark.createDataFrame(
        [
            (1, "https://a.com/x", "a.com", "B" * 10),
            (2, "https://a.com/x", "a.com", "C" * 10),
            (3, "https://a.com/y/deep", "a.com", "D" * 10),
        ],
        "doc_id long, url_norm string, host string, payload_blob string",
    )
    rules = spark.createDataFrame(
        [("a.com", "disallow", "/y")], "host string, rule string, path string"
    )
    out = robots.filter_crawlable(urls_df, rules).collect()
    assert len(out) == 3  # duplicate URL rows preserved
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[1]["allowed"] and by_id[2]["allowed"]
    assert not by_id[3]["allowed"] and by_id[3]["rule_path"] == "/y"
    plan = (
        robots.filter_crawlable(urls_df, rules)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the narrow lane: every node touching the __u verdict key —
    # the dedup/aggregation exchanges and the max_by aggregates —
    # must not carry the payload column
    narrow_lines = [
        ln
        for ln in plan.splitlines()
        if "hashpartitioning(__u" in ln or "max_by" in ln
    ]
    assert narrow_lines, "expected a __u-keyed narrow lane in the plan"
    for ln in narrow_lines:
        assert "payload_blob" not in ln, ln


def test_parse_robots_sitemaps():
    body = """
User-agent: *
Disallow: /x
Sitemap: https://a.com/sitemap.xml
sitemap: https://a.com/sitemap2.xml.gz  # case-insensitive
Sitemap:
"""
    assert robots.parse_robots_sitemaps(body) == [
        "https://a.com/sitemap.xml",
        "https://a.com/sitemap2.xml.gz",
    ]


def test_parse_robots_crawl_delay():
    body = """
User-agent: fastbot
Crawl-delay: 0.5
Disallow: /x

User-agent: *
Crawl-delay: 10
Disallow: /y

User-agent: silentbot
Disallow: /z

User-agent: junkbot
Crawl-delay: not-a-number
Crawl-delay: -3
"""
    assert robots.parse_robots_crawl_delay(body, "fastbot") == 0.5
    assert robots.parse_robots_crawl_delay(body) == 10.0
    # a group with no delay of its own falls back to the * group
    assert robots.parse_robots_crawl_delay(body, "silentbot") == 10.0
    # garbage values are ignored -> fallback
    assert robots.parse_robots_crawl_delay(body, "junkbot") == 10.0
    # no delays anywhere -> None
    assert robots.parse_robots_crawl_delay("User-agent: *\nDisallow: /") is None


def test_parse_robots_crawl_delay_last_group_wins():
    """ADVICE r14: repeated groups for the same agent — the LAST
    group's delay wins (plain assignment), consistent with
    parse_robots_text merging all matching groups."""
    body = """
User-agent: bot
Crawl-delay: 1

User-agent: other
Disallow: /x

User-agent: bot
Crawl-delay: 7
"""
    assert robots.parse_robots_crawl_delay(body, "bot") == 7.0
    # within one group, later directives also win
    body2 = "User-agent: *\nCrawl-delay: 2\nCrawl-delay: 3\n"
    assert robots.parse_robots_crawl_delay(body2) == 3.0
