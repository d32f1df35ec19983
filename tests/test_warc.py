"""WARC reader: byte-exact framing roundtrips (plain + gzip members),
the Spark reader kernel contract, and the quarantine battery."""

from __future__ import annotations

import os

import pytest

from etl_excel_csv_sql_spark.io import warc


def _recs(n):
    return [
        {
            "uri": f"https://example.org/doc/{i}",
            "status": 404 if i % 7 == 3 else 200,
            "body_text": f"doc-{i}-" + "x" * (i % 50),
        }
        for i in range(n)
    ]


@pytest.mark.parametrize("gz", [False, True])
def test_warc_roundtrip_framing(gz):
    payload = warc.encode_warc(_recs(40), gzip_members=gz)
    parsed = warc.parse_warc(payload)
    assert parsed[0]["warc_type"] == "warcinfo"
    assert len(parsed) == 41
    for i, rec in enumerate(parsed[1:]):
        assert rec["warc_type"] == "response"
        assert rec["target_uri"] == f"https://example.org/doc/{i}"
        status, body = warc.http_response_fields(rec["body"])
        assert status == (404 if i % 7 == 3 else 200)
        assert body == (f"doc-{i}-" + "x" * (i % 50)).encode()


def test_warc_body_may_contain_record_lookalikes():
    """Content-Length framing must carry a body that CONTAINS a fake
    record boundary — a scanner that searched for 'WARC/1.0' instead
    of honoring the length would split the record."""
    evil = "prefix\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n\r\nsuffix"
    payload = warc.encode_warc(
        [{"uri": "u", "status": 200, "body_text": evil}]
    )
    parsed = warc.parse_warc(payload)
    assert len(parsed) == 2
    _, body = warc.http_response_fields(parsed[1]["body"])
    assert body.decode() == evil


def test_warc_quarantine_battery():
    good = warc.encode_warc(_recs(3), gzip_members=True)
    plain = warc.encode_warc(_recs(3))
    for bad in (
        b"",
        b"WARC/1.0\r\n",                      # header never terminated
        b"HTTP/1.1 200 OK\r\n\r\n",           # not a WARC at all
        plain[:-9],                            # truncated body/trailer
        good[:-7],                             # truncated gzip member
        b"\x1f\x8bXX",                         # corrupt gzip header
        plain.replace(b"Content-Length", b"X-Length", 1),
    ):
        with pytest.raises(ValueError):
            warc.parse_warc(bad)
    with pytest.raises(ValueError, match="status"):
        warc.http_response_fields(b"not http\r\n\r\n")


def test_read_warc_kernel_contract(spark, tmp_path):
    """The warc_crawl_catalog oracle's safety pin: the Spark reader
    yields one row per record with the id-contract values; lenient
    mode nulls a corrupt FILE's row, strict raises."""
    p = str(tmp_path / "crawl-00000.warc.gz")
    with open(p, "wb") as f:
        f.write(warc.encode_warc(_recs(30), gzip_members=True))
    rows = warc.read_warc(spark, p, strict=True).collect()
    assert len(rows) == 31
    resp = {
        int(r["target_uri"].rsplit("/", 1)[1]): r
        for r in rows
        if r["warc_type"] == "response"
    }
    assert len(resp) == 30
    for i, r in resp.items():
        assert r["http_status"] == (404 if i % 7 == 3 else 200)
        assert r["n_body_bytes"] == 5 + len(str(i)) + i % 50
        assert r["text_head"] == f"doc-{i}-" + "x" * (i % 50)
        assert r["record_idx"] == i + 1  # after the warcinfo record
    info = [r for r in rows if r["warc_type"] == "warcinfo"][0]
    assert info["http_status"] is None and info["text_head"] is None

    bad = str(tmp_path / "bad.warc")
    with open(bad, "wb") as f:
        f.write(b"not a warc file at all")
    lax = warc.read_warc(spark, bad).collect()
    assert len(lax) == 1 and lax[0]["warc_type"] is None
    assert os.path.basename(lax[0]["file"].replace("file:", "")) or True
    with pytest.raises(Exception, match="WARC"):
        warc.read_warc(spark, bad, strict=True).collect()


def test_html_to_text_contract_and_leniency():
    """The warc_web_text_extract oracle's extraction-contract pin, plus
    browser-grade leniency (no quarantine lane for HTML: garbage still
    yields its visible text)."""
    from etl_excel_csv_sql_spark.operators.webtext import html_to_text

    for i in (0, 1, 2, 3, 7, 11):
        links = "".join(f"<a href='/l{j}'>l</a>" for j in range(i % 4))
        html = (
            f"<html><head><title>Doc {i}</title>"
            f"<script>var x = 1; if (x < 2) {{}}</script></head>"
            f"<body><h1>H{i}</h1><p>para {i} content</p>{links}</body>"
            f"</html>"
        )
        want = f"H{i} para {i} content" + " l" * (i % 4)
        assert html_to_text(html) == (f"Doc {i}", want, i % 4), i
    # style/noscript/template subtrees drop; head text is metadata
    assert html_to_text(
        "<head>meta junk</head><style>p{}</style><noscript>n</noscript>"
        "<template>t</template>body text"
    ) == (None, "body text", 0)
    # anchors without href are not links; entities decode
    assert html_to_text("<a name='x'>anchor</a> &amp; more") == (
        None, "anchor & more", 0
    )
    # unclosed garbage still extracts
    assert html_to_text("just <b>bold no closing") == (
        None, "just bold no closing", 0
    )
    # whitespace runs collapse across nodes
    assert html_to_text("<p>  a\n\n b </p>\t<p>c</p>") == (None, "a b c", 0)


def test_extract_web_text_kernel_nulls_and_values(spark):
    from etl_excel_csv_sql_spark.operators import webtext

    df = spark.createDataFrame(
        [
            (1, "<title>T</title><body>hello <b>world</b></body>"),
            (2, None),
        ],
        "doc_id long, text_head string",
    )
    rows = {
        r["doc_id"]: r
        for r in webtext.extract_web_text(df).collect()
    }
    assert rows[1]["title"] == "T"
    assert rows[1]["text"] == "hello world"
    assert rows[1]["n_links"] == 0 and rows[1]["n_chars"] == 11
    assert rows[2]["text"] is None and rows[2]["n_chars"] is None
