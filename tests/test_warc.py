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


def test_lenient_quarantine_is_file_atomic(spark, tmp_path):
    """ADVICE r12 (medium): a file whose Nth record carries a malformed
    embedded HTTP status must yield ONLY the sentinel row — not rows
    for records 0..N-1 plus the sentinel (double-counting the file as
    both partially ingested and quarantined)."""
    good = warc.encode_warc(_recs(2))
    # corrupt the LAST response record's HTTP status line, leaving the
    # WARC framing itself intact (Content-Length unchanged)
    bad = good.replace(b"HTTP/1.1 200 OK", b"XTTP/1.1 200 OK", 2)
    bad = bad.replace(b"XTTP/1.1 200 OK", b"HTTP/1.1 200 OK", 1)
    assert bad.count(b"XTTP") == 1 and bad != good
    p = str(tmp_path / "partial.warc")
    with open(p, "wb") as f:
        f.write(bad)
    rows = warc.read_warc(spark, p).collect()
    assert len(rows) == 1
    assert rows[0]["warc_type"] is None and rows[0]["file"]
    with pytest.raises(Exception, match="HTTP status"):
        warc.read_warc(spark, p, strict=True).collect()


def test_detect_charset_precedence():
    """header > meta > BOM > default, with unknown labels falling
    through to the next source (real crawls declare charset=garbage)."""
    body = b'<html><head><meta charset="shift_jis"></head>x</html>'
    assert warc.detect_charset(
        {"content-type": "text/html; charset=windows-1251"}, body
    ) == ("cp1251", "header")
    assert warc.detect_charset({"content-type": "text/html"}, body) == (
        "shift_jis", "meta",
    )
    assert warc.detect_charset(
        {"content-type": 'text/html; charset="utf-8"'}, b"plain"
    ) == ("utf-8", "header")
    # meta http-equiv form
    assert warc.detect_charset(
        {},
        b'<meta http-equiv="Content-Type" '
        b'content="text/html; charset=gbk">',
    ) == ("gbk", "meta")
    # unknown header label falls through to the meta tag
    assert warc.detect_charset(
        {"content-type": "text/html; charset=bogus-enc"}, body
    ) == ("shift_jis", "meta")
    assert warc.detect_charset({}, b"\xef\xbb\xbfhello") == ("utf-8", "bom")
    assert warc.detect_charset({}, b"\xff\xfeh\x00") == ("utf-16", "bom")
    assert warc.detect_charset({}, b"just bytes") == ("utf-8", "default")
    # meta sniff window is bounded: a tag past 4 KiB is ignored
    far = b" " * 5000 + b'<meta charset="shift_jis">'
    assert warc.detect_charset({}, far) == ("utf-8", "default")


def test_read_warc_full_text_and_charsets(spark, tmp_path):
    """The warc_charset_bodies oracle's safety pin: full-body `text`
    (no head truncation) decoded per the detected charset."""
    cyr = "кириллица " + "ю" * 150
    sjs = '<html><head><meta charset="shift_jis"></head><body>日本語</body></html>'
    long_plain = "plain " + "x" * 300
    recs = [
        {"uri": "u0", "status": 200, "body_text": long_plain},
        {
            "uri": "u1", "status": 200,
            "body_bytes": cyr.encode("cp1251"),
            "http_content_type": "text/html; charset=windows-1251",
        },
        {
            "uri": "u2", "status": 200,
            "body_bytes": sjs.encode("shift_jis"),
            "http_content_type": "text/html",
        },
    ]
    p = str(tmp_path / "charset.warc.gz")
    with open(p, "wb") as f:
        f.write(warc.encode_warc(recs, gzip_members=True))
    rows = {
        r["target_uri"]: r
        for r in warc.read_warc(spark, p, strict=True).collect()
        if r["warc_type"] == "response"
    }
    assert rows["u0"]["text"] == long_plain          # NOT head-truncated
    assert rows["u0"]["text_head"] == long_plain[:120]
    assert rows["u0"]["charset_source"] == "default"
    assert rows["u1"]["text"] == cyr
    assert rows["u1"]["charset"] == "cp1251"
    assert rows["u1"]["charset_source"] == "header"
    assert rows["u1"]["n_body_bytes"] == len(cyr)    # 1 byte per char
    assert rows["u2"]["text"] == sjs
    assert rows["u2"]["charset"] == "shift_jis"
    assert rows["u2"]["charset_source"] == "meta"
    assert rows["u2"]["n_body_bytes"] == len(sjs) + 3  # 2-byte kanji ×3


def test_wet_conversion_records_decode(spark, tmp_path):
    """The wet_text_catalog oracle's safety pin: conversion records
    (the WET layout) decode through the charset lane, the UTF-8 BOM
    strips when it was the signal, and non-text conversion records
    stay null."""
    recs = [
        {"uri": "u0", "status": 200, "record_type": "conversion",
         "body_bytes": b"\xef\xbb\xbfbom text"},
        {"uri": "u1", "status": 200, "record_type": "conversion",
         "body_bytes": "текст".encode("cp1251"),
         "http_content_type": "text/plain; charset=windows-1251"},
        {"uri": "u2", "status": 200, "record_type": "conversion",
         "body_text": "plain wet"},
        {"uri": "u3", "status": 200, "record_type": "conversion",
         "body_bytes": b"\x00\x01binary",
         "http_content_type": "application/octet-stream"},
    ]
    p = str(tmp_path / "f.warc.wet.gz")
    with open(p, "wb") as f:
        f.write(warc.encode_warc(recs, gzip_members=True))
    rows = {
        r["target_uri"]: r
        for r in warc.read_warc(spark, p, strict=True).collect()
        if r["warc_type"] == "conversion"
    }
    assert rows["u0"]["text"] == "bom text"        # BOM char stripped
    assert rows["u0"]["charset_source"] == "bom"
    assert rows["u1"]["text"] == "текст"
    assert rows["u1"]["charset"] == "cp1251"
    assert rows["u2"]["text"] == "plain wet"
    assert rows["u2"]["charset_source"] == "default"
    assert rows["u3"]["text"] is None              # not text/*
    assert rows["u3"]["n_body_bytes"] == 8


def test_iter_warc_records_is_streaming():
    """The memory contract: records come out of the generator as the
    buffer fills — the whole payload is never re-materialized (the r12
    shape held decompressed-stream + all bodies ≈ 2× peak)."""
    recs = _recs(200)
    payload = warc.encode_warc(recs, gzip_members=True)
    it = warc.iter_warc_records(payload)
    first = next(it)
    assert first["warc_type"] == "warcinfo"
    # generator equivalence with the materialized surface
    rest = list(it)
    assert [r["target_uri"] for r in rest] == [r["uri"] for r in recs]
    assert warc.parse_warc(payload) == [first] + rest


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
    # ADVICE r12: anchors inside skipped subtrees or <head> are
    # invisible boilerplate — NOT out-degree
    assert html_to_text(
        "<noscript><a href='/n'>n</a></noscript>"
        "<template><a href='/t'>t</a></template>"
        "<head><a href='/h'>h</a></head>"
        "<body><a href='/v'>visible</a></body>"
    ) == (None, "visible", 1)
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


def test_extract_web_links_kernel_and_resolution(spark):
    from etl_excel_csv_sql_spark.operators import webtext

    df = spark.createDataFrame(
        [
            (1, "<a href='/a'>a</a><a href='b/c'>b</a>",
             "https://h.com/dir/page.html"),
            (2, None, "https://h.com/"),
            (3, "<a name='no-href'>x</a>", "https://h.com/"),
        ],
        "doc_id long, text string, target_uri string",
    )
    plain = webtext.extract_web_links(df).collect()
    assert {(r["doc_id"], r["href"]) for r in plain} == {
        (1, "/a"), (1, "b/c")
    }
    resolved = webtext.extract_web_links(
        df, base_col="target_uri"
    ).collect()
    assert {(r["doc_id"], r["url"]) for r in resolved} == {
        (1, "https://h.com/a"), (1, "https://h.com/dir/b/c")
    }


def test_stream_batch_parity(spark, tmp_path):
    """stream_warc and read_warc share one kernel — rows must be
    identical on the same files, including the lenient sentinel for a
    corrupt file mixed into the drop folder."""
    import os as _os

    drop = str(tmp_path / "drop")
    _os.makedirs(drop)
    for shard in range(2):
        with open(f"{drop}/c-{shard}.warc.gz", "wb") as f:
            f.write(
                warc.encode_warc(
                    _recs(10)[shard::2], gzip_members=True
                )
            )
    with open(f"{drop}/bad.warc", "wb") as f:
        f.write(b"not a warc")
    batch = warc.read_warc(spark, drop + "/*")
    stream = warc.stream_warc(
        spark, drop, max_files_per_trigger=1
    )
    sink = "warc_parity_sink"
    (
        stream.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    def canon(rows):
        return sorted(
            (r["file"].rsplit("/", 1)[-1],) + tuple(
                r[c] for c in (
                    "record_idx", "warc_type", "target_uri",
                    "http_status", "n_body_bytes", "text",
                )
            )
            for r in rows
        )
    assert canon(spark.table(sink).collect()) == canon(batch.collect())
    # the corrupt file contributed exactly one sentinel in BOTH paths
    sentinels = [
        r for r in spark.table(sink).collect() if r["warc_type"] is None
    ]
    assert len(sentinels) == 1


def test_html_main_text_link_density_rule():
    """Boilerplate contract: length bar AND link-density bar both
    enforced; inline link text inside kept prose survives; nested
    anchors count once per char; all-boilerplate pages yield ''. """
    from etl_excel_csv_sql_spark.operators.webtext import html_main_text

    nav = "<div><a href='/1'>Home</a> <a href='/2'>About</a></div>"
    prose = "<p>A sufficiently long paragraph of real prose content.</p>"
    linky = (
        "<p>A sufficiently long paragraph where "
        "<a href='/x'>most of the visible characters live inside "
        "this enormous anchor element right here</a> ok.</p>"
    )
    text, kept, dropped = html_main_text(nav + prose + linky)
    assert text == "A sufficiently long paragraph of real prose content."
    assert kept == 1 and dropped == 2
    # all boilerplate -> empty
    assert html_main_text(nav) == ("", 0, 1)
    # threshold knobs are honored
    assert html_main_text(nav, max_link_ratio=1.0)[1] == 0  # still short
    assert html_main_text(
        nav, min_block_chars=5, max_link_ratio=1.0
    ) == ("Home About", 1, 0)


def test_wat_envelope_roundtrip_and_catalog(spark, tmp_path):
    """WAT lane (r14): metadata+application/json records through the
    same kernel; from_json shapes the CC envelope into columns."""
    from etl_excel_csv_sql_spark.io import warc

    pages = [
        {
            "uri": f"https://ex.org/p/{i}",
            "title": f"T{i}" if i != 2 else None,  # titleless page
            "links": [
                {"url": f"https://ex.org/l/{i}/{k}", "text": f"link {k}"}
                for k in range(i % 4)
            ],
            "metas": [
                {"name": f"m{k}", "content": f"c{k}"} for k in range(i % 3)
            ],
        }
        for i in range(6)
    ]
    path = str(tmp_path / "seg-00000.warc.wat.gz")
    with open(path, "wb") as f:
        f.write(warc.encode_wat(pages))
    cat = {
        r["page_uri"]: r
        for r in warc.wat_page_catalog(
            warc.read_warc(spark, path, strict=True)
        ).collect()
    }
    assert len(cat) == 6
    for i in range(6):
        row = cat[f"https://ex.org/p/{i}"]
        assert row["title"] == (f"T{i}" if i != 2 else None)
        assert row["n_links"] == i % 4
        assert row["n_metas"] == i % 3
        assert row["first_link_url"] == (
            f"https://ex.org/l/{i}/0" if i % 4 else None
        )


def test_wat_links_match_web_link_graph(spark, tmp_path):
    """The WAT link edges must agree with the edges extracted from
    the raw WARC HTML by extract_web_links — the triad's artifacts
    describe the SAME crawl (VERDICT r13 #7 done-criterion)."""
    from etl_excel_csv_sql_spark.io import warc
    from etl_excel_csv_sql_spark.operators.webtext import extract_web_links

    def hrefs(i):
        return [f"https://ex.org/l/{i}/{k}" for k in range(1 + i % 3)]

    html_recs, wat_pages = [], []
    for i in range(8):
        body = (
            f"<html><head><title>T{i}</title></head><body>"
            + "".join(
                f'<a href="{h}">link {k}</a> text'
                for k, h in enumerate(hrefs(i))
            )
            + "</body></html>"
        )
        html_recs.append({
            "uri": f"https://ex.org/p/{i}",
            "status": 200,
            "body_text": body,
            "http_content_type": "text/html",
        })
        wat_pages.append({
            "uri": f"https://ex.org/p/{i}",
            "title": f"T{i}",
            "links": [
                {"url": h, "text": f"link {k}"}
                for k, h in enumerate(hrefs(i))
            ],
        })
    warc_path = str(tmp_path / "seg.warc.gz")
    wat_path = str(tmp_path / "seg.warc.wat.gz")
    with open(warc_path, "wb") as f:
        f.write(warc.encode_warc(html_recs, gzip_members=True))
    with open(wat_path, "wb") as f:
        f.write(warc.encode_wat(wat_pages))

    from pyspark.sql import functions as F

    raw = warc.read_warc(spark, warc_path, strict=True).filter(
        F.col("warc_type") == "response"
    ).select(
        F.regexp_extract("target_uri", r"/p/(\d+)$", 1)
        .cast("long").alias("doc_id"),
        "text",
    )
    from_html = sorted(
        (r["doc_id"], r["href"])
        for r in extract_web_links(raw).collect()
    )
    from_wat = sorted(
        (int(r["src"].rsplit("/", 1)[1]), r["url"])
        for r in warc.wat_links(
            warc.read_warc(spark, wat_path, strict=True)
        ).collect()
    )
    assert from_html == from_wat and len(from_html) == sum(
        1 + i % 3 for i in range(8)
    )


def test_chunked_transfer_decoding(spark, tmp_path):
    """RFC 9112 chunked bodies de-chunk in http_response_parts (r14):
    crawls archive responses as sent, so the reader must reassemble
    the body instead of feeding chunk-size framing into the text
    pipeline. Covers multi-chunk, chunk extensions, trailers, and the
    malformed battery."""
    from pyspark.sql import functions as F

    from etl_excel_csv_sql_spark.io import warc

    text = "chunked body reassembles exactly " * 4
    recs = [
        {"uri": "https://ex.org/c1", "status": 200, "body_text": text,
         "chunked": True},
        {"uri": "https://ex.org/c2", "status": 200, "body_text": text,
         "chunked": True, "chunk_size": 7, "chunk_ext": True,
         "trailer": True},
        {"uri": "https://ex.org/plain", "status": 200, "body_text": text},
    ]
    payload = warc.encode_warc(recs, gzip_members=True)
    # unit level: parse one record directly
    rows = [r for r in warc.parse_warc(payload)
            if r["warc_type"] == "response"]
    for r in rows:
        status, headers, body = warc.http_response_parts(r["body"])
        assert status == 200
        assert body.decode() == text
    # kernel level: text column equals the plain record's
    path = str(tmp_path / "chunked.warc.gz")
    with open(path, "wb") as f:
        f.write(payload)
    got = {
        r["target_uri"]: r
        for r in warc.read_warc(spark, path, strict=True)
        .filter(F.col("warc_type") == "response")
        .collect()
    }
    assert got["https://ex.org/c1"]["text"] == text
    assert got["https://ex.org/c2"]["text"] == text
    assert got["https://ex.org/c1"]["n_body_bytes"] == len(text)
    # malformed battery: every framing violation raises ValueError
    ok = b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
    for bad in (
        b"zz\r\nhello\r\n0\r\n\r\n",        # non-hex size
        b"5\r\nhelloX\r\n0\r\n\r\n",        # chunk not CRLF-terminated
        b"ff\r\nshort\r\n0\r\n\r\n",        # chunk overruns body
        b"5\r\nhello\r\n",                   # missing zero chunk
    ):
        import pytest as _pytest
        with _pytest.raises(ValueError):
            warc.http_response_parts(ok + bad)


def test_content_encoding_decoding(spark, tmp_path):
    """Content-Encoding gzip/deflate bodies inflate in
    http_response_parts (r14) — composed with chunked framing the way
    the wire actually layers them (chunked OUTSIDE, gzip INSIDE).
    Unknown codings and truncated streams quarantine."""
    import zlib

    from pyspark.sql import functions as F

    from etl_excel_csv_sql_spark.io import warc

    text = "compressed body reassembles exactly " * 5
    recs = [
        {"uri": "https://ex.org/gz", "status": 200, "body_text": text,
         "content_encoding": "gzip"},
        {"uri": "https://ex.org/df", "status": 200, "body_text": text,
         "content_encoding": "deflate"},
        {"uri": "https://ex.org/dfraw", "status": 200, "body_text": text,
         "content_encoding": "deflate-raw"},
        {"uri": "https://ex.org/both", "status": 200, "body_text": text,
         "content_encoding": "gzip", "chunked": True, "chunk_size": 11},
    ]
    payload = warc.encode_warc(recs, gzip_members=True)
    for r in warc.parse_warc(payload):
        if r["warc_type"] != "response":
            continue
        status, headers, body = warc.http_response_parts(r["body"])
        assert body.decode() == text, r
    # kernel level through a file
    path = str(tmp_path / "ce.warc.gz")
    with open(path, "wb") as f:
        f.write(payload)
    got = {
        r["target_uri"]: r["text"]
        for r in warc.read_warc(spark, path, strict=True)
        .filter(F.col("warc_type") == "response")
        .collect()
    }
    assert all(v == text for v in got.values()) and len(got) == 4
    # quarantine lanes
    import pytest as _pytest

    head = b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n"
    gz = zlib.compressobj(6, zlib.DEFLATED, 31)
    full = gz.compress(text.encode()) + gz.flush()
    with _pytest.raises(ValueError, match="truncated compressed"):
        warc.http_response_parts(head + full[:-5])
    with _pytest.raises(ValueError, match="corrupt gzip"):
        warc.http_response_parts(head + b"\x1f\x8b garbage here")
    brhead = b"HTTP/1.1 200 OK\r\nContent-Encoding: br\r\n\r\n"
    with _pytest.raises(ValueError, match="unsupported Content-Encoding"):
        warc.http_response_parts(brhead + b"anything")


def test_quarantine_reason_taxonomy(spark, tmp_path):
    """r15 (VERDICT r14 #8): the lenient sentinel row's
    quarantine_reason column classifies the loss so operators can
    measure rates per cause — the brotli fence
    (content_encoding_unsupported, a BY-DESIGN loss: stdlib Python
    has no brotli) must be distinguishable from corrupt data, bad
    framing, and truncation. One file per class, one pass, counted
    via a plain groupBy."""
    import zlib

    from pyspark.sql import functions as F

    from etl_excel_csv_sql_spark.io import warc

    text = "body " * 20
    good = warc.encode_warc(
        [{"uri": "https://ex.org/ok", "status": 200, "body_text": text}]
    )

    def ce_file(coding: str, body: bytes) -> bytes:
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            b"Content-Encoding: " + coding.encode() + b"\r\n\r\n" + body
        )
        rec = (
            b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"WARC-Target-URI: https://ex.org/x\r\n"
            b"Content-Type: application/http; msgtype=response\r\n"
            b"Content-Length: " + str(len(http)).encode() + b"\r\n\r\n"
            + http + b"\r\n\r\n"
        )
        return rec

    gz = zlib.compressobj(6, zlib.DEFLATED, 31)
    gz_body = gz.compress(text.encode()) + gz.flush()
    cases = {
        "br.warc": (ce_file("br", b"brotli bytes"),
                    "content_encoding_unsupported"),
        "trunc.warc": (ce_file("gzip", gz_body[:-5]),
                       "content_encoding_truncated"),
        "corrupt.warc": (ce_file("gzip", b"\x1f\x8b garbage"),
                         "content_encoding_corrupt"),
        "status.warc": (good.replace(b"HTTP/1.1", b"XTTP/1.1"),
                        "http_framing"),
        "version.warc": (good.replace(b"WARC/1.0", b"XARC/1.0"),
                         "warc_framing"),
        "good.warc": (good, None),
    }
    for name, (payload, _) in cases.items():
        with open(tmp_path / name, "wb") as f:
            f.write(payload)
    rows = warc.read_warc(spark, str(tmp_path / "*.warc")).collect()
    got = {}
    for r in rows:
        fname = r["file"].rsplit("/", 1)[-1]
        got[fname] = r["quarantine_reason"]
    assert got == {k: v for k, (_, v) in cases.items()}
    # the countable lane: a one-line loss report
    report = (
        warc.read_warc(spark, str(tmp_path / "*.warc"))
        .groupBy("quarantine_reason").agg(F.count("*").alias("n"))
        .collect()
    )
    by_reason = {r["quarantine_reason"]: r["n"] for r in report}
    assert by_reason["content_encoding_unsupported"] == 1
    assert by_reason[None] >= 1  # good rows carry NULL


def test_quarantine_class_mapping_is_pinned():
    """Message → class table: first-match order matters (chunk
    violations mention 'HTTP body'; the bomb guard mentions both)."""
    from etl_excel_csv_sql_spark.io import warc

    cases = [
        ("unsupported Content-Encoding 'br'",
         "content_encoding_unsupported"),
        ("truncated compressed HTTP body (no final block)",
         "content_encoding_truncated"),
        ("corrupt gzip HTTP body: Error -3", "content_encoding_corrupt"),
        ("HTTP body exceeds the inflate guard", "inflate_guard"),
        ("chunk overruns the HTTP body", "http_chunked_framing"),
        ("non-hex chunk size b'xy'", "http_chunked_framing"),
        ("malformed HTTP status line b'...'", "http_framing"),
        ("truncated gzip member in WARC.gz chain", "gzip_member"),
        ("expected WARC/x.y version line", "warc_framing"),
        ("WARC record body overruns payload", "warc_framing"),
        ("something else entirely", "other"),
    ]
    for msg, want in cases:
        assert warc._quarantine_class(msg) == want, msg
