"""Sitemap XML ingest (sitemaps.org protocol) — where a polite crawl's
URL frontier actually comes from: robots.txt names the sitemaps, the
sitemaps name the URLs, and the frontier pipeline (normalize → robots
filter → URL-key dedup) runs from there.

Read path mirrors io/warc.py: ``binaryFile`` lists and distributes the
FILES (a sitemap is ≤50k URLs / 50 MB by protocol — the file is the
natural task unit), one Arrow ``mapInPandas`` pass parses executor-side
with stdlib ``xml.etree`` (no external deps). Both document kinds emit:
``<urlset>`` rows carry kind='url' with loc/lastmod/changefreq/
priority; ``<sitemapindex>`` rows carry kind='sitemap' with loc/lastmod
(the fetch-next pointers). ``.xml.gz`` single-member gzip inflates
in-kernel with a size cap (the protocol's own 50 MB bound) as the
decompression-bomb guard.

Quarantine contract matches the WARC reader: malformed XML, a foreign
root element, or an entry missing its required ``<loc>`` raises
ValueError; lenient mode quarantines the whole FILE to one null
sentinel row (file-atomic — XML parses whole-document, so there are no
partial rows by construction), strict raises.
"""

from __future__ import annotations

import zlib
from typing import Iterator
from xml.etree import ElementTree

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

MAX_SITEMAP_BYTES = 50 << 20  # the protocol's own uncompressed bound


def _strip_ns(tag: str) -> str:
    return tag.rsplit("}", 1)[-1] if "}" in tag else tag


def parse_sitemap(payload: bytes) -> list[dict]:
    """Sitemap bytes (plain or gzip) → row dicts ``kind loc lastmod
    changefreq priority``. kind='url' for <urlset>, 'sitemap' for
    <sitemapindex>."""
    if payload[:2] == b"\x1f\x8b":
        d = zlib.decompressobj(47)
        try:
            payload = d.decompress(payload, MAX_SITEMAP_BYTES + 1)
        except zlib.error as exc:
            raise ValueError(f"corrupt gzip sitemap: {exc}")
        if len(payload) > MAX_SITEMAP_BYTES:
            raise ValueError("sitemap exceeds the 50 MB protocol bound")
        if not d.eof:
            # a cut trailer still yields complete-looking XML — the
            # member must close or the file is truncated
            raise ValueError("truncated gzip sitemap")
    try:
        root = ElementTree.fromstring(payload)
    except ElementTree.ParseError as exc:
        raise ValueError(f"malformed sitemap XML: {exc}")
    root_tag = _strip_ns(root.tag)
    if root_tag == "urlset":
        kind, entry_tag = "url", "url"
    elif root_tag == "sitemapindex":
        kind, entry_tag = "sitemap", "sitemap"
    else:
        raise ValueError(f"not a sitemap document: <{root_tag}>")
    rows = []
    for entry in root:
        if _strip_ns(entry.tag) != entry_tag:
            continue  # spec: unknown elements are ignored
        fields = {
            _strip_ns(child.tag): (child.text or "").strip()
            for child in entry
        }
        loc = fields.get("loc")
        if not loc:
            raise ValueError(f"sitemap <{entry_tag}> missing <loc>")
        priority = fields.get("priority")
        if priority is not None:
            try:
                priority = float(priority)
            except ValueError:
                raise ValueError(f"non-numeric priority {priority!r}")
        rows.append(
            {
                "kind": kind,
                "loc": loc,
                "lastmod": fields.get("lastmod") or None,
                "changefreq": fields.get("changefreq") or None,
                "priority": priority,
            }
        )
    return rows


SITEMAP_SCHEMA = (
    "file string, kind string, loc string, lastmod string, "
    "changefreq string, priority double"
)
_COLS = tuple(f.split(" ")[0] for f in SITEMAP_SCHEMA.split(", "))


def read_sitemap(
    spark: SparkSession, path_glob: str, strict: bool = False
) -> DataFrame:
    """Sitemap/.xml.gz files → one row per <url> / <sitemap> entry.
    Lenient mode quarantines a malformed FILE to one null sentinel."""
    binary = spark.read.format("binaryFile").load(path_glob).select(
        "path", "content"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {k: [] for k in _COLS}
            for file, content in zip(pdf["path"], pdf["content"]):
                try:
                    rows = parse_sitemap(bytes(content))
                except ValueError:
                    if strict:
                        raise
                    rows = [dict.fromkeys(_COLS[1:])]
                for r in rows:
                    out["file"].append(file)
                    for k in _COLS[1:]:
                        out[k].append(r.get(k))
            yield pd.DataFrame(out)

    return binary.mapInPandas(batches, SITEMAP_SCHEMA)


def encode_sitemap(
    entries: list[dict], index: bool = False, gzip_payload: bool = False
) -> bytes:
    """Fixture writer: entries (``loc`` required; optional ``lastmod
    changefreq priority``) → a namespaced <urlset> (or <sitemapindex>
    when ``index``) document, optionally gzipped."""
    root_tag, entry_tag = (
        ("sitemapindex", "sitemap") if index else ("urlset", "url")
    )
    parts = [
        '<?xml version="1.0" encoding="UTF-8"?>\n',
        f'<{root_tag} xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n',
    ]
    # Values must be XML-escaped: a loc with '&' (any query-string URL)
    # would otherwise render malformed XML that parse_sitemap rejects
    # (ADVICE r13) — the sitemaps.org spec requires entity-escaped locs.
    from xml.sax.saxutils import escape

    for e in entries:
        parts.append(f"  <{entry_tag}>\n")
        parts.append(f"    <loc>{escape(str(e['loc']))}</loc>\n")
        for k in ("lastmod", "changefreq", "priority"):
            if e.get(k) is not None:
                parts.append(f"    <{k}>{escape(str(e[k]))}</{k}>\n")
        parts.append(f"  </{entry_tag}>\n")
    parts.append(f"</{root_tag}>\n")
    raw = "".join(parts).encode()
    if gzip_payload:
        co = zlib.compressobj(6, zlib.DEFLATED, 31)
        return co.compress(raw) + co.flush()
    return raw
