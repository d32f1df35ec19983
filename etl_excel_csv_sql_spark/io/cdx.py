"""CDX(J) crawl-index ingest — the fourth Common Crawl artifact next
to WARC/WET/WAT (io/warc.py).

Every Common Crawl snapshot ships a CDXJ index (``cc-index``): one
line per capture, ``<urlkey> <timestamp> <json>``, where urlkey is the
SURT (Sort-friendly URI Reordering Transform) of the capture URL and
the JSON block carries the record locator — the containing
``filename`` plus byte ``offset``/``length`` of the gzip member inside
it — alongside url/mime/status/digest. Production pipelines read the
INDEX to plan ranged fetches instead of scanning whole segments; at
100 TB the index is the only affordable way to subset a crawl by
host, mime, or status.

Spark-first shape: the reader is ``spark.read.text`` (splittable,
.gz transparent) + ONE Catalyst projection — ``substring_index`` for
the two head tokens and ``from_json`` for the JSON block, so column
pruning reaches the JSON parse (unread fields are never materialized)
and predicate pushdown on urlkey/timestamp stays JVM-side. No Python
anywhere.

``surt_key`` is the Catalyst twin of the urlkey format: scheme
dropped, host lowercased, leading ``www.`` stripped, labels reversed
and comma-joined, ``)`` before the path, path lowercased, query
params sorted (the sort CDX relies on for prefix range scans). The
reference has no crawl-index reader; this lane follows the public
CDXJ format (pywb CDXJ spec / Common Crawl cc-index layout) —
implemented from the format description, no third-party code.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# The locator fields every CC cdx line carries; from_json prunes to
# whatever the query actually selects.
CDX_JSON_SCHEMA = (
    "url string, mime string, status string, digest string, "
    "length string, offset string, filename string, "
    "languages string, encoding string"
)


def surt_key(url) -> Column:
    """SURT urlkey of ``url`` as a Catalyst expression: lowercase,
    scheme dropped, leading ``www.`` stripped, host labels reversed
    and comma-joined, ``)`` separates host from path, query params
    sorted byte-wise (fragment dropped). ``https://www.Ex.org/A/b?z=1&a=2``
    → ``org,ex)/a/b?a=2&z=1``."""
    u = F.lower(url if isinstance(url, Column) else F.col(url))
    u = F.regexp_replace(u, r"#.*$", "")          # fragment
    u = F.regexp_replace(u, r"^[a-z][a-z0-9+.-]*://", "")  # scheme
    u = F.regexp_replace(u, r"^www\.", "")
    authority = F.substring_index(F.substring_index(u, "/", 1), "?", 1)
    # the port stays attached to the LAST label after reversal
    # (com,example:8080)/ — splitting labels with the port glued to
    # the final one would corrupt the reversal
    host = F.substring_index(authority, ":", 1)
    port = F.when(
        authority.contains(":"),
        F.concat(F.lit(":"), F.substring_index(authority, ":", -1)),
    ).otherwise(F.lit(""))
    # path+query = everything past the host; a bare host normalizes
    # to '/', a query-only URL (host?q=..) to '/?q=..'
    path_and_query = F.substring(u, F.length(authority) + 1, 1 << 30)
    path_and_query = F.when(
        F.length(path_and_query) == 0, F.lit("/")
    ).when(
        path_and_query.startswith("?"),
        F.concat(F.lit("/"), path_and_query),
    ).otherwise(path_and_query)
    path = F.substring_index(path_and_query, "?", 1)
    query = F.when(
        path_and_query.contains("?"),
        F.substring(
            path_and_query,
            F.length(path) + 2,
            1 << 30,
        ),
    )
    sorted_query = F.array_join(
        F.array_sort(F.split(query, "&")), "&"
    )
    rev_host = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    return F.concat(
        rev_host,
        port,
        F.lit(")"),
        path,
        F.coalesce(
            F.when(
                query.isNotNull(),
                F.concat(F.lit("?"), sorted_query),
            ),
            F.lit(""),
        ),
    )


def _project_cdx(lines: DataFrame) -> DataFrame:
    """The one shared CDXJ projection behind the batch and streaming
    readers — one closure so the two paths can never drift. Blank
    lines (trailing newlines, shard concatenation seams) drop instead
    of yielding phantom empty-key rows."""
    lines = lines.filter(F.length(F.trim(F.col("value"))) > 0)
    head = F.substring_index(F.col("value"), " {", 1)
    js = F.when(
        F.col("value").contains(" {"),
        F.concat(
            F.lit("{"), F.substring_index(F.col("value"), " {", -1)
        ),
    )
    parsed = lines.select(
        F.substring_index(head, " ", 1).alias("urlkey"),
        F.substring_index(
            F.substring_index(head, " ", 2), " ", -1
        ).alias("ts"),
        F.from_json(js, CDX_JSON_SCHEMA).alias("j"),
    )
    return parsed.select(
        "urlkey",
        "ts",
        F.col("j.url").alias("url"),
        F.col("j.mime").alias("mime"),
        F.col("j.status").cast("int").alias("status"),
        F.col("j.digest").alias("digest"),
        F.col("j.length").cast("long").alias("length"),
        F.col("j.offset").cast("long").alias("offset"),
        F.col("j.filename").alias("filename"),
    )


def read_cdx(spark: SparkSession, path_glob: str) -> DataFrame:
    """CDXJ index files (plain or .gz) → one row per capture:
    ``urlkey``, ``ts`` (14-digit capture timestamp string), plus the
    JSON locator fields (url, mime, status int, digest,
    length/offset longs, filename). Lines that do not carry a JSON
    block (comments, the cluster.idx pointer format) yield null
    locator fields — countable, never a crash. One text scan + one
    projection; from_json prunes unread fields."""
    return _project_cdx(spark.read.text(path_glob))


def stream_cdx(
    spark: SparkSession,
    drop_dir: str,
    path_glob: str = "*.gz",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """The STREAMING twin of :func:`read_cdx` — cc-index shards land
    in a drop folder (Common Crawl publishes new cdx shards per
    snapshot) and each is consumed exactly once (the checkpoint
    tracks processed paths) through the SAME projection, so batch and
    streaming rows are identical by construction. Compose with
    ``fetch_cdx_records`` in foreachBatch for incremental
    index-driven ingest: each new shard fetches only ITS members."""
    reader = (
        spark.readStream.format("text")
        .schema("value string")
        .option("pathGlobFilter", path_glob)
    )
    if max_files_per_trigger is not None:
        reader = reader.option(
            "maxFilesPerTrigger", str(max_files_per_trigger)
        )
    return _project_cdx(reader.load(drop_dir))


def cdx_fetch_plan(cdx: DataFrame) -> DataFrame:
    """Ranged-fetch plan from an index subset: per WARC file, the
    record count, total bytes, and the covering byte span — what a
    fetch scheduler turns into HTTP Range requests. One hash
    aggregation on filename; at index scale this is the reduction
    that makes subsetting a 100 TB crawl by host/mime affordable
    (fetch only the members you need, merge adjacent ranges
    client-side)."""
    return (
        cdx.filter(F.col("filename").isNotNull())
        .groupBy("filename")
        .agg(
            F.count("*").alias("n_records"),
            F.sum("length").alias("total_bytes"),
            F.min("offset").alias("span_start"),
            F.max(F.col("offset") + F.col("length")).alias("span_end"),
        )
    )


def encode_cdx(rows: list[dict]) -> bytes:
    """Fixture writer: CDXJ lines from dicts carrying urlkey, ts, and
    locator fields (the json block serializes in a fixed key order so
    fixtures are byte-deterministic)."""
    import json

    out = []
    for r in rows:
        j = {
            k: r[k]
            for k in (
                "url", "mime", "status", "digest",
                "length", "offset", "filename",
            )
            if k in r
        }
        out.append(
            "%s %s %s"
            % (r["urlkey"], r["ts"], json.dumps(j, sort_keys=True))
        )
    return ("\n".join(out) + "\n").encode()


CDX_FETCH_SCHEMA = (
    "urlkey string, url string, status int, text string, "
    "n_body_bytes long"
)


def fetch_cdx_records(cdx: DataFrame, base_dir: str) -> DataFrame:
    """Index-driven ranged ingest — the production way to subset a
    100 TB crawl: filter the CDX index (pure Catalyst, pushed down),
    then fetch ONLY the referenced gzip members by byte range and
    decode them. Each (filename, offset, length) locator reads one
    member (seek + exact-length read — the local-filesystem twin of an
    HTTP/S3 Range GET), inflates it with a completeness check, parses
    the single WARC record, and decodes the embedded HTTP response
    with the same charset-aware path as ``read_warc``.

    Partitioning: locators repartition by filename and sort by offset
    within partitions, so each task touches few files and reads each
    sequentially — at crawl scale this is the difference between
    ranged reads and a random-I/O storm. One Arrow pass; malformed
    members raise ValueError (strict — a corrupt index entry should
    fail the subset job, not silently shrink it)."""
    import os
    import zlib
    from typing import Iterator

    import pandas as pd

    from etl_excel_csv_sql_spark.io import warc as warc_io

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "urlkey": [], "url": [], "status": [],
                "text": [], "n_body_bytes": [],
            }
            for fname, grp in pdf.groupby("filename", sort=False):
                with open(os.path.join(base_dir, fname), "rb") as f:
                    for row in grp.sort_values("offset").itertuples():
                        f.seek(row.offset)
                        member = f.read(row.length)
                        if len(member) != row.length:
                            raise ValueError(
                                "CDX locator overruns "
                                f"{fname} at offset {row.offset}"
                            )
                        d = zlib.decompressobj(47)
                        try:
                            raw = d.decompress(member)
                        except zlib.error as exc:
                            raise ValueError(
                                f"corrupt gzip member at CDX locator "
                                f"{fname}:{row.offset}: {exc}"
                            )
                        if not d.eof or d.unused_data:
                            raise ValueError(
                                "CDX locator does not frame exactly "
                                f"one gzip member ({fname}:{row.offset})"
                            )
                        recs = warc_io.parse_warc(raw)
                        if len(recs) != 1:
                            raise ValueError(
                                "CDX locator member holds "
                                f"{len(recs)} records, expected 1"
                            )
                        rec = recs[0]
                        status, headers, body = (
                            warc_io.http_response_parts(rec["body"])
                        )
                        _, _, text = warc_io.decode_body_text(
                            headers, body
                        )
                        out["urlkey"].append(row.urlkey)
                        out["url"].append(row.url)
                        out["status"].append(status)
                        out["text"].append(text)
                        out["n_body_bytes"].append(len(body))
            yield pd.DataFrame(out)

    locs = cdx.select(
        "urlkey", "url", "filename", "offset", "length"
    ).filter(F.col("filename").isNotNull())
    return (
        locs.repartition("filename")
        .sortWithinPartitions("offset")
        .mapInPandas(batches, CDX_FETCH_SCHEMA)
    )


def read_cluster_idx(spark: SparkSession, path_glob: str) -> DataFrame:
    """``cluster.idx`` — the SECOND-level index Common Crawl ships
    over its ~300 cdx shards: one TSV line per 3000-line cdx block,
    ``<surt> <ts>\\t<shard>\\t<offset>\\t<length>\\t<seq>``, sorted by
    key. Reading it answers "which cdx shards could contain keys for
    this host?" without touching any shard. ``sort_key`` keeps the
    full ``surt ts`` string the file is ordered by (range math runs
    on it); urlkey/ts are its split halves."""
    lines = spark.read.text(path_glob)
    parts = F.split(F.col("value"), "\t")
    return lines.select(
        parts.getItem(0).alias("sort_key"),
        F.substring_index(parts.getItem(0), " ", 1).alias("urlkey"),
        F.substring_index(parts.getItem(0), " ", -1).alias("ts"),
        parts.getItem(1).alias("cdx_shard"),
        parts.getItem(2).cast("long").alias("offset"),
        parts.getItem(3).cast("long").alias("length"),
        parts.getItem(4).cast("long").alias("seq"),
    )


def cdx_shard_lookup(cluster: DataFrame, surt_prefix: str) -> DataFrame:
    """Blocks whose key range could hold keys with ``surt_prefix`` —
    the shard/offset list a subset job then range-reads from the cdx
    (two index levels before any WARC byte moves). Block i covers
    [sort_key_i, sort_key_{i+1}); the successor key comes from a
    self-join on the ``seq`` column (seq+1), NOT a global window —
    partition-parallel, no single-task sort. The preceding block is
    included when its range straddles the prefix start; the last
    block's open end treats as +inf."""
    nxt = cluster.select(
        (F.col("seq") - F.lit(1)).alias("seq"),
        F.col("sort_key").alias("__next_key"),
    )
    hi = surt_prefix + "￿"
    return (
        cluster.join(nxt, "seq", "left")
        .filter(
            (F.col("sort_key") < F.lit(hi))
            & (
                F.col("__next_key").isNull()
                | (F.col("__next_key") > F.lit(surt_prefix))
            )
        )
        .select(
            "urlkey", "ts", "cdx_shard", "offset", "length", "seq"
        )
    )


def encode_cluster_idx(rows: list[dict]) -> bytes:
    """Fixture writer: cluster.idx TSV lines from dicts carrying
    urlkey, ts, cdx_shard, offset, length, seq."""
    out = [
        "%s %s\t%s\t%d\t%d\t%d"
        % (
            r["urlkey"], r["ts"], r["cdx_shard"],
            r["offset"], r["length"], r["seq"],
        )
        for r in rows
    ]
    return ("\n".join(out) + "\n").encode()


def fetch_cdx_blocks(blocks: DataFrame, base_dir: str) -> DataFrame:
    """Ranged reads of CDX SHARD BLOCKS — the middle hop of the
    production three-level access path (cluster.idx → cdx blocks →
    WARC members). Real cc-index shards are chains of independently
    gzipped ~3000-line blocks precisely so cluster.idx offsets
    support ranged decompression: each (cdx_shard, offset, length)
    locator reads ONE gzip member, inflates it with a completeness
    check, and yields its lines — feed the result to the same shared
    projection as the full-shard readers. Partitioning mirrors
    ``fetch_cdx_records``: repartition by shard, offsets sorted
    within partitions."""
    import os
    import zlib
    from typing import Iterator

    import pandas as pd

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            vals: list[str] = []
            for fname, grp in pdf.groupby("cdx_shard", sort=False):
                with open(os.path.join(base_dir, fname), "rb") as f:
                    for row in grp.sort_values("offset").itertuples():
                        f.seek(row.offset)
                        member = f.read(row.length)
                        if len(member) != row.length:
                            raise ValueError(
                                "cluster.idx locator overruns "
                                f"{fname} at offset {row.offset}"
                            )
                        d = zlib.decompressobj(47)
                        try:
                            raw = d.decompress(member)
                        except zlib.error as exc:
                            raise ValueError(
                                "corrupt cdx block at "
                                f"{fname}:{row.offset}: {exc}"
                            )
                        if not d.eof or d.unused_data:
                            raise ValueError(
                                "cluster.idx locator does not frame "
                                "exactly one gzip member "
                                f"({fname}:{row.offset})"
                            )
                        vals.extend(
                            raw.decode("utf-8", "replace").splitlines()
                        )
            yield pd.DataFrame({"value": vals})

    return (
        blocks.select("cdx_shard", "offset", "length")
        .repartition("cdx_shard")
        .sortWithinPartitions("offset")
        .mapInPandas(batches, "value string")
    )


def parse_cdx_lines(lines: DataFrame) -> DataFrame:
    """Public face of the shared CDXJ projection for line frames that
    did not come from a file scan (e.g. ``fetch_cdx_blocks`` output)."""
    return _project_cdx(lines)


def encode_cdx_sharded(
    rows: list[dict], block_lines: int, blocks_per_shard: int
) -> tuple[dict[str, bytes], list[dict]]:
    """Fixture writer for the REAL cc-index shard layout: cdx lines
    (must arrive sorted by their ``urlkey ts`` key) chunked into
    independently gzipped blocks, blocks chained into
    ``cdx-{k:05d}.gz`` shards, plus the matching cluster.idx row per
    block (first key, shard, true offset/length, seq). Returns
    (shard_name → payload, cluster_rows)."""
    import gzip as _gzip
    import io as _io

    shards: dict[str, bytearray] = {}
    cluster: list[dict] = []
    seq = 0
    for b0 in range(0, len(rows), block_lines):
        block = rows[b0 : b0 + block_lines]
        shard_name = "cdx-%05d.gz" % (seq // blocks_per_shard)
        payload = shards.setdefault(shard_name, bytearray())
        buf = _io.BytesIO()
        with _gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
            g.write(encode_cdx(block))
        member = buf.getvalue()
        cluster.append(
            {
                "urlkey": block[0]["urlkey"],
                "ts": block[0]["ts"],
                "cdx_shard": shard_name,
                "offset": len(payload),
                "length": len(member),
                "seq": seq,
            }
        )
        payload += member
        seq += 1
    return {k: bytes(v) for k, v in shards.items()}, cluster
