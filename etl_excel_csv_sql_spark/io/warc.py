"""WARC (Web ARChive, ISO 28500) — the container a real 100 TB text
corpus actually arrives in: Common Crawl publishes ~90k WARC files per
monthly snapshot, each ~1 GB of gzip members, one member per record.

Read path, Spark-first: ``spark.read.format("binaryFile")`` lists and
distributes the FILES (WARC.gz is a chain of per-record gzip members —
not block-splittable, so the file is the parallelism unit, exactly how
Common Crawl sizes its segments), then one Arrow ``mapInPandas`` pass
parses records executor-side: WARC header block (named fields,
case-insensitive, CRLF-framed), exact ``Content-Length`` body read, and
for ``response`` records the embedded HTTP/1.x status line + headers.
No Python object ever round-trips through the driver; a 1000-executor
cluster reads 90k files as 90k independent tasks.

Quarantine contract matches the media codecs: a malformed record
(bad version line, missing Content-Length, truncated body, broken gzip
member) raises ValueError — lenient mode nulls the FILE's rows rather
than killing the batch, strict raises.

Cited reference scope: the reference engine reads CSV/Excel/SQL only
(SURVEY §2.1); WARC is the LLM-pipeline superset's crawl-ingest lane,
next to the jsonl/fixed-width/ORC sources.
"""

from __future__ import annotations

import zlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

_CRLF = b"\r\n"
TEXT_HEAD_CHARS = 120


def split_gzip_members(payload: bytes) -> bytes:
    """Decompress a chain of gzip members (the WARC.gz layout: one
    member per record) into one plain byte stream. Non-gzip input
    passes through untouched; a truncated/corrupt member raises."""
    if payload[:2] != b"\x1f\x8b":
        return payload
    out = bytearray()
    rest = payload
    while rest:
        d = zlib.decompressobj(47)
        try:
            out += d.decompress(rest)
            out += d.flush()
        except zlib.error as exc:  # quarantine contract: ValueError only
            raise ValueError(f"corrupt gzip member in WARC.gz: {exc}")
        if not d.eof:
            raise ValueError("truncated gzip member in WARC.gz chain")
        rest = d.unused_data
    return bytes(out)


def parse_warc(payload: bytes) -> list[dict]:
    """WARC bytes (plain or gzip-member chain) → list of record dicts:
    ``warc_type target_uri warc_date content_type content_length body``.
    Exact Content-Length framing — bodies may contain anything,
    including things that look like record boundaries."""
    data = split_gzip_members(payload)
    records = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record blank lines
        while data[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        eol = data.find(_CRLF, pos)
        if eol < 0:
            raise ValueError("WARC version line not CRLF-terminated")
        version = data[pos:eol]
        if not version.startswith(b"WARC/"):
            raise ValueError(
                f"expected WARC/x.y version line at byte {pos}"
            )
        pos = eol + 2
        fields: dict[str, str] = {}
        while True:
            eol = data.find(_CRLF, pos)
            if eol < 0:
                raise ValueError("WARC header block not terminated")
            line = data[pos:eol]
            pos = eol + 2
            if not line:
                break
            name, sep, value = line.partition(b":")
            if not sep:
                raise ValueError(f"malformed WARC header line {line!r}")
            fields[name.strip().lower().decode("ascii")] = (
                value.strip().decode("utf-8", "replace")
            )
        try:
            length = int(fields["content-length"])
        except (KeyError, ValueError):
            raise ValueError("WARC record missing a valid Content-Length")
        if length < 0 or pos + length > n:
            raise ValueError("WARC record body overruns payload")
        body = data[pos : pos + length]
        pos += length
        if data[pos : pos + 4] != _CRLF + _CRLF:
            raise ValueError("WARC record not followed by CRLF CRLF")
        pos += 4
        records.append(
            {
                "warc_type": fields.get("warc-type"),
                "target_uri": fields.get("warc-target-uri"),
                "warc_date": fields.get("warc-date"),
                "content_type": fields.get("content-type"),
                "content_length": length,
                "body": body,
            }
        )
    if not records:
        raise ValueError("WARC payload has no records")
    return records


def http_response_fields(body: bytes) -> tuple[int, bytes]:
    """(status_code, http_body) from an embedded HTTP/1.x response
    (the payload of a WARC ``response`` record with
    ``application/http`` content type)."""
    eol = body.find(_CRLF)
    if eol < 0:
        raise ValueError("HTTP status line not CRLF-terminated")
    parts = body[:eol].split(b" ", 2)
    if len(parts) < 2 or not parts[0].startswith(b"HTTP/"):
        raise ValueError(f"malformed HTTP status line {body[:eol]!r}")
    try:
        status = int(parts[1])
    except ValueError:
        raise ValueError(f"non-integer HTTP status {parts[1]!r}")
    sep = body.find(_CRLF + _CRLF, eol)
    if sep < 0:
        raise ValueError("HTTP header block not terminated")
    return status, body[sep + 4 :]


WARC_SCHEMA = (
    "file string, record_idx int, warc_type string, target_uri string, "
    "warc_date string, content_type string, http_status int, "
    "n_body_bytes long, text_head string"
)


def read_warc(
    spark: SparkSession,
    path_glob: str,
    strict: bool = False,
    head_chars: int = TEXT_HEAD_CHARS,
) -> DataFrame:
    """WARC/WARC.gz files → one row per record. ``http_status`` and
    ``text_head`` (first ``head_chars`` chars, UTF-8 with
    replacement) are populated for ``response`` records carrying an
    embedded HTTP response; other record types leave them null.
    ``n_body_bytes`` is the HTTP body size for responses, else the
    record Content-Length. Lenient mode nulls a malformed FILE's
    columns (one sentinel row) instead of failing the batch."""
    binary = spark.read.format("binaryFile").load(path_glob).select(
        "path", "content"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: dict[str, list] = {
                k: []
                for k in (
                    "file", "record_idx", "warc_type", "target_uri",
                    "warc_date", "content_type", "http_status",
                    "n_body_bytes", "text_head",
                )
            }

            def emit(file, idx, rec):
                status = None
                head = None
                nbytes = rec["content_length"]
                if rec["warc_type"] == "response" and (
                    rec["content_type"] or ""
                ).startswith("application/http"):
                    status, http_body = http_response_fields(rec["body"])
                    nbytes = len(http_body)
                    head = http_body[: 4 * head_chars].decode(
                        "utf-8", "replace"
                    )[:head_chars]
                rows["file"].append(file)
                rows["record_idx"].append(idx)
                rows["warc_type"].append(rec["warc_type"])
                rows["target_uri"].append(rec["target_uri"])
                rows["warc_date"].append(rec["warc_date"])
                rows["content_type"].append(rec["content_type"])
                rows["http_status"].append(status)
                rows["n_body_bytes"].append(nbytes)
                rows["text_head"].append(head)

            for file, content in zip(pdf["path"], pdf["content"]):
                try:
                    for idx, rec in enumerate(parse_warc(bytes(content))):
                        emit(file, idx, rec)
                except ValueError:
                    if strict:
                        raise
                    for k in rows:
                        rows[k].append(file if k == "file" else None)
            yield pd.DataFrame(rows)

    return binary.mapInPandas(batches, WARC_SCHEMA)


def encode_warc(records: list[dict], gzip_members: bool = False) -> bytes:
    """Fixture writer: a warcinfo header record plus one ``response``
    record per input dict (``uri``, ``status``, ``body_text``,
    optional ``date``) — byte-exact WARC/1.0 framing; gzip_members
    emits the Common Crawl one-member-per-record layout."""

    def record(rtype: str, fields: dict, body: bytes) -> bytes:
        head = [b"WARC/1.0"]
        head.append(f"WARC-Type: {rtype}".encode())
        for k, v in fields.items():
            head.append(f"{k}: {v}".encode())
        head.append(f"Content-Length: {len(body)}".encode())
        raw = _CRLF.join(head) + _CRLF + _CRLF + body + _CRLF + _CRLF
        if gzip_members:
            co = zlib.compressobj(6, zlib.DEFLATED, 31)
            return co.compress(raw) + co.flush()
        return raw

    out = bytearray()
    out += record(
        "warcinfo",
        {"Content-Type": "application/warc-fields",
         "WARC-Date": "2026-01-01T00:00:00Z"},
        b"software: etl-excel-csv-sql-spark\r\n",
    )
    for r in records:
        body_text = r["body_text"].encode()
        http = (
            f"HTTP/1.1 {r['status']} "
            f"{'OK' if r['status'] == 200 else 'NOT-OK'}\r\n"
            f"Content-Type: text/plain\r\n"
            f"Content-Length: {len(body_text)}\r\n\r\n"
        ).encode() + body_text
        out += record(
            "response",
            {
                "WARC-Target-URI": r["uri"],
                "WARC-Date": r.get("date", "2026-01-01T00:00:00Z"),
                "Content-Type": "application/http; msgtype=response",
            },
            http,
        )
    return bytes(out)
