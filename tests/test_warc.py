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
