"""Sitemap ingest: roundtrips (urlset + index, plain + gz), the
quarantine battery, and the reader kernel contract."""

from __future__ import annotations

import pytest

from etl_excel_csv_sql_spark.io import sitemap


def _entries(n):
    return [
        {
            "loc": f"https://example.org/p/{i}",
            "lastmod": f"2026-01-{1 + i % 28:02d}",
            "changefreq": "daily" if i % 2 else None,
            "priority": round(0.1 + (i % 9) / 10, 1),
        }
        for i in range(n)
    ]


def test_roundtrip_escapes_query_string_urls():
    """ADVICE r13: a loc with '&' (any query-string URL) must render
    entity-escaped per the sitemaps.org spec — the raw byte produced
    malformed XML that parse_sitemap then rejected. ElementTree
    unescapes on parse, so the round-trip is exact."""
    entries = [
        {"loc": "https://example.org/s?a=1&b=<2>"},
        {"loc": "https://example.org/plain"},
    ]
    rows = sitemap.parse_sitemap(sitemap.encode_sitemap(entries))
    assert [r["loc"] for r in rows] == [
        "https://example.org/s?a=1&b=<2>",
        "https://example.org/plain",
    ]


@pytest.mark.parametrize("gz", [False, True])
def test_roundtrip_urlset(gz):
    payload = sitemap.encode_sitemap(_entries(20), gzip_payload=gz)
    rows = sitemap.parse_sitemap(payload)
    assert len(rows) == 20
    for i, r in enumerate(rows):
        assert r["kind"] == "url"
        assert r["loc"] == f"https://example.org/p/{i}"
        assert r["lastmod"] == f"2026-01-{1 + i % 28:02d}"
        assert r["changefreq"] == ("daily" if i % 2 else None)
        assert r["priority"] == round(0.1 + (i % 9) / 10, 1)


def test_roundtrip_sitemapindex():
    payload = sitemap.encode_sitemap(
        [{"loc": f"https://example.org/sm/{i}.xml.gz"} for i in range(3)],
        index=True,
    )
    rows = sitemap.parse_sitemap(payload)
    assert [r["kind"] for r in rows] == ["sitemap"] * 3
    assert rows[2]["loc"] == "https://example.org/sm/2.xml.gz"


def test_quarantine_battery():
    good = sitemap.encode_sitemap(_entries(3))
    for bad in (
        b"",
        b"not xml at all",
        b"<html><body>wrong doc</body></html>",
        good[:-20],                               # truncated XML
        good.replace(b"<loc>", b"<lok>", 1),      # entry missing loc
        good.replace(b"<priority>", b"<priority>x", 1),
        sitemap.encode_sitemap(_entries(2), gzip_payload=True)[:-5],
    ):
        with pytest.raises(ValueError):
            sitemap.parse_sitemap(bad)


def test_unknown_elements_are_ignored():
    good = sitemap.encode_sitemap(_entries(2)).decode()
    spliced = good.replace(
        "</urlset>", "  <extension>ignored</extension>\n</urlset>"
    )
    assert len(sitemap.parse_sitemap(spliced.encode())) == 2


def test_read_sitemap_kernel_contract(spark, tmp_path):
    p = str(tmp_path / "sitemap-0.xml.gz")
    with open(p, "wb") as f:
        f.write(sitemap.encode_sitemap(_entries(10), gzip_payload=True))
    rows = sitemap.read_sitemap(spark, p, strict=True).collect()
    assert len(rows) == 10
    assert {r["loc"] for r in rows} == {
        f"https://example.org/p/{i}" for i in range(10)
    }
    bad = str(tmp_path / "bad.xml")
    with open(bad, "wb") as f:
        f.write(b"<urlset><url></url>")
    lax = sitemap.read_sitemap(spark, bad).collect()
    assert len(lax) == 1 and lax[0]["kind"] is None and lax[0]["file"]
    with pytest.raises(Exception, match="sitemap|XML"):
        sitemap.read_sitemap(spark, bad, strict=True).collect()
