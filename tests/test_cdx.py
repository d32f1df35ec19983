"""CDX(J) crawl-index lane (io/cdx.py): SURT keys, the CDXJ reader,
and the ranged-fetch plan."""

import gzip
import os

import pytest
from pyspark.sql import functions as F

from etl_excel_csv_sql_spark.io import cdx


def test_surt_key_shapes(spark):
    cases = {
        "https://www.Ex.org/A/b?z=1&a=2": "org,ex)/a/b?a=2&z=1",
        "http://sub.site.com": "com,site,sub)/",
        "https://h.net/p?one": "net,h)/p?one",
        "https://q.io?x=2#frag": "io,q)/?x=2",
        "https://ex.org/": "org,ex)/",
        "ex.org/path": "org,ex)/path",          # scheme-less
        "https://www.ex.org": "org,ex)/",        # www + bare host
        "https://ex.org/p#only-frag": "org,ex)/p",
        # the port stays glued to the LAST label after reversal
        "https://ex.org:8080/P?b=2&a=1": "org,ex:8080)/p?a=1&b=2",
        "http://h.net:80": "net,h:80)/",
    }
    df = spark.createDataFrame(
        [(u,) for u in cases], ["url"]
    ).select("url", cdx.surt_key("url").alias("k"))
    got = {r["url"]: r["k"] for r in df.collect()}
    assert got == cases


def test_cdx_roundtrip_and_null_locator_lane(spark, tmp_path):
    rows = [
        {"urlkey": "org,ex)/a", "ts": "20260101000000",
         "url": "https://ex.org/a", "mime": "text/html",
         "status": "200", "digest": "sha1:AAA", "length": "1200",
         "offset": "0", "filename": "crawl-00000.warc.gz"},
        {"urlkey": "org,ex)/b", "ts": "20260102000000",
         "url": "https://ex.org/b", "mime": "application/pdf",
         "status": "404", "digest": "sha1:BBB", "length": "800",
         "offset": "1200", "filename": "crawl-00000.warc.gz"},
    ]
    payload = cdx.encode_cdx(rows)
    # a cluster.idx-style pointer line carries no JSON block: the
    # reader must yield null locator fields, never crash
    payload += b"org,ex)/c 20260103000000\tcdx-00001.gz\t77\t99\t2\n"
    with gzip.open(tmp_path / "cdx-00000.gz", "wb") as f:
        f.write(payload)
    out = cdx.read_cdx(spark, str(tmp_path / "*.gz")).collect()
    assert len(out) == 3
    by_key = {r["urlkey"]: r for r in out}
    a = by_key["org,ex)/a"]
    assert (a["ts"], a["status"], a["length"], a["offset"],
            a["filename"]) == (
        "20260101000000", 200, 1200, 0, "crawl-00000.warc.gz"
    )
    assert by_key["org,ex)/b"]["mime"] == "application/pdf"
    c = by_key["org,ex)/c"]
    assert c["url"] is None and c["filename"] is None


def test_cdx_fetch_plan(spark, tmp_path):
    rows = []
    for i in range(10):
        rows.append(
            {"urlkey": f"org,ex)/p{i}", "ts": "20260101000000",
             "url": f"https://ex.org/p{i}", "mime": "text/html",
             "status": "200", "digest": f"sha1:{i}",
             "length": str(100 + i), "offset": str(i * 1000),
             "filename": f"crawl-{i % 2:05d}.warc.gz"}
        )
    (tmp_path / "cdx-0").write_bytes(cdx.encode_cdx(rows))
    plan = cdx.cdx_fetch_plan(
        cdx.read_cdx(spark, str(tmp_path / "cdx-0"))
    ).collect()
    by_file = {r["filename"]: r for r in plan}
    f0 = by_file["crawl-00000.warc.gz"]  # i = 0,2,4,6,8
    assert f0["n_records"] == 5
    assert f0["total_bytes"] == sum(100 + i for i in (0, 2, 4, 6, 8))
    assert f0["span_start"] == 0
    assert f0["span_end"] == 8000 + 108


def test_cdx_plan_is_jvm_only_with_pruned_json(spark, tmp_path):
    """The reader must stay whole-stage-codegen (no Python stage) and
    from_json must prune to the selected fields (ReadSchema shows the
    projection reaching the text scan)."""
    (tmp_path / "cdx-0").write_bytes(
        cdx.encode_cdx([
            {"urlkey": "org,ex)/a", "ts": "20260101000000",
             "url": "https://ex.org/a", "mime": "text/html",
             "status": "200", "digest": "sha1:AAA", "length": "10",
             "offset": "0", "filename": "f.warc.gz"},
        ])
    )
    df = cdx.read_cdx(spark, str(tmp_path / "cdx-0")).select(
        "urlkey", "status"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "InPandas" not in plan and "PythonUDF" not in plan
    assert "BatchEvalPython" not in plan
    # pruning witness: the from_json schema carries ONLY the selected
    # field — unread locator fields never materialize
    assert "StructField(status" in plan
    for dropped in ("digest", "filename", "offset"):
        assert f"StructField({dropped}" not in plan, dropped


def test_fetch_cdx_records_ranged_and_selective(spark, tmp_path):
    """fetch_cdx_records reads ONLY the members the index subset
    names, by true byte range, and decodes them with the read_warc
    HTTP path; malformed locators raise, never silently shrink."""
    from etl_excel_csv_sql_spark.io import warc

    recs = [
        {"uri": f"https://ex.org/doc/{i}", "status": 200,
         "body_text": f"member {i}", "http_content_type": "text/html"}
        for i in range(6)
    ]
    payload, entries = warc.encode_warc_with_index(recs)
    (tmp_path / "seg-00000.warc.gz").write_bytes(payload)
    rows = [
        {"urlkey": f"org,ex)/doc/{i}", "ts": "20260101000000",
         "url": e["uri"], "mime": "text/html", "status": "200",
         "digest": f"sha1:{i}", "length": str(e["length"]),
         "offset": str(e["offset"]), "filename": "seg-00000.warc.gz"}
        for i, e in enumerate(entries)
    ]
    (tmp_path / "cdx-0").write_bytes(cdx.encode_cdx(rows))
    idx = cdx.read_cdx(spark, str(tmp_path / "cdx-0"))
    # subset: even ids only
    subset = idx.filter(F.col("urlkey").rlike(r"/doc/[024]$"))
    got = {
        r["urlkey"]: r
        for r in cdx.fetch_cdx_records(subset, str(tmp_path)).collect()
    }
    assert sorted(got) == [f"org,ex)/doc/{i}" for i in (0, 2, 4)]
    for i in (0, 2, 4):
        r = got[f"org,ex)/doc/{i}"]
        assert (r["status"], r["text"]) == (200, f"member {i}")
    # corrupt locator lanes: shifted offset / wrong length
    bad_rows = [dict(rows[1], offset=str(int(rows[1]["offset"]) + 3))]
    (tmp_path / "cdx-bad").write_bytes(cdx.encode_cdx(bad_rows))
    bad = cdx.read_cdx(spark, str(tmp_path / "cdx-bad"))
    with pytest.raises(Exception, match="corrupt gzip member"):
        cdx.fetch_cdx_records(bad, str(tmp_path)).collect()
    short_rows = [dict(rows[1], length=str(int(rows[1]["length"]) - 4))]
    (tmp_path / "cdx-short").write_bytes(cdx.encode_cdx(short_rows))
    short = cdx.read_cdx(spark, str(tmp_path / "cdx-short"))
    with pytest.raises(Exception, match="exactly one gzip member"):
        cdx.fetch_cdx_records(short, str(tmp_path)).collect()


def test_cluster_idx_lookup_ranges(spark, tmp_path):
    """Two-level index: blocks whose [key, next_key) range intersects
    the SURT prefix — including the straddling PREDECESSOR block and
    the open-ended last block."""
    rows = [
        {"urlkey": f"org,h{j:03d})/page", "ts": "20260101000000",
         "cdx_shard": f"cdx-{j // 10:05d}.gz", "offset": j * 5000,
         "length": 5000, "seq": j}
        for j in range(40)
    ]
    (tmp_path / "cluster.idx").write_bytes(cdx.encode_cluster_idx(rows))
    cl = cdx.read_cluster_idx(spark, str(tmp_path / "cluster.idx"))
    hit = cdx.cdx_shard_lookup(cl, "org,h01").collect()
    assert sorted(r["seq"] for r in hit) == list(range(9, 20))
    assert {r["cdx_shard"] for r in hit} == {
        "cdx-00000.gz", "cdx-00001.gz"
    }
    # prefix past the last block: only the open-ended final block
    tail = cdx.cdx_shard_lookup(cl, "org,h999").collect()
    assert [r["seq"] for r in tail] == [39]
    # prefix before the first block: only block 0 (starts above the
    # prefix but below its ceiling) — nothing else
    head = cdx.cdx_shard_lookup(cl, "com,a").collect()
    assert [r["seq"] for r in head] == []
    # no Python stage, no Window in the plan
    plan = (
        cdx.cdx_shard_lookup(cl, "org,h01")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "InPandas" not in plan and "Window" not in plan


def test_surt_key_property_vs_python_reference(spark):
    """Property check: the Catalyst surt_key agrees with an
    independent pure-Python SURT implementation over generated URL
    shapes (hypothesis strategies drawn once, evaluated in ONE Spark
    job)."""
    from hypothesis import strategies as st

    label = st.text(
        alphabet="abcdefghijklmnopqrstuvwxyz0123456789-", min_size=1,
        max_size=8,
    ).filter(lambda s: not s.startswith("-") and not s.endswith("-"))
    seg = st.text(
        alphabet="abcdefghijklmnopqrstuvwxyz0123456789._-",
        min_size=1, max_size=6,
    )
    param = st.tuples(seg, seg).map(lambda kv: f"{kv[0]}={kv[1]}")

    def build(parts):
        scheme, www, labels, port, path_segs, params, frag = parts
        host = ".".join(labels)
        url = (f"{scheme}://" if scheme else "")
        url += ("www." if www else "") + host
        if port:
            url += f":{port}"
        if path_segs:
            url += "/" + "/".join(path_segs)
        if params:
            url += "?" + "&".join(params)
        if frag:
            url += "#frag"
        return url

    urls = st.tuples(
        st.sampled_from(["http", "https", ""]),
        st.booleans(),
        st.lists(label, min_size=1, max_size=4),
        st.sampled_from([None, 80, 8080]),
        st.lists(seg, min_size=0, max_size=3),
        st.lists(param, min_size=0, max_size=3),
        st.booleans(),
    ).map(build)

    def py_surt(url: str) -> str:
        u = url.lower()
        u = u.split("#", 1)[0]
        for sch in ("http://", "https://"):
            if u.startswith(sch):
                u = u[len(sch):]
                break
        if u.startswith("www."):
            u = u[4:]
        authority = u.split("/", 1)[0].split("?", 1)[0]
        rest = u[len(authority):]
        if not rest:
            rest = "/"
        elif rest.startswith("?"):
            rest = "/" + rest
        host, _, port = authority.partition(":")
        path, qmark, query = rest.partition("?")
        out = ",".join(reversed(host.split(".")))
        if port:
            out += ":" + port
        out += ")" + path
        if qmark:
            out += "?" + "&".join(sorted(query.split("&")))
        return out

    # draw a deterministic batch of examples and evaluate in one job
    sample = list({
        urls.example() for _ in range(120)
    })
    df = spark.createDataFrame(
        [(u,) for u in sample], ["url"]
    ).select("url", cdx.surt_key("url").alias("k"))
    got = {r["url"]: r["k"] for r in df.collect()}
    for u in sample:
        assert got[u] == py_surt(u), (u, got[u], py_surt(u))


def test_blank_lines_and_crlf_tolerated(spark, tmp_path):
    """Blank lines drop (no phantom empty-key rows); CRLF line
    endings parse — the trailing CR is JSON whitespace."""
    payload = (
        b"\n"
        + cdx.encode_cdx([
            {"urlkey": "org,ex)/a", "ts": "20260101000000",
             "url": "https://ex.org/a", "mime": "text/html",
             "status": "200", "digest": "d", "length": "10",
             "offset": "0", "filename": "f.warc.gz"},
        ]).replace(b"\n", b"\r\n")
        + b"\r\n\r\n"
    )
    (tmp_path / "cdx-0").write_bytes(payload)
    out = cdx.read_cdx(spark, str(tmp_path / "cdx-0")).collect()
    assert len(out) == 1
    assert out[0]["urlkey"] == "org,ex)/a"
    assert out[0]["status"] == 200 and out[0]["filename"] == "f.warc.gz"


def test_fetch_cdx_blocks_ranged_and_malformed(spark, tmp_path):
    """The middle hop: cluster.idx locators range-read cdx shard
    blocks (independently gzipped members); corrupt/misframed
    locators raise."""
    rows = [
        {"urlkey": f"org,h{j:03d})/p", "ts": "20260101000000",
         "url": f"https://h{j:03d}.org/p", "mime": "text/html",
         "status": "200", "digest": f"sha1:{j}", "length": "10",
         "offset": "0", "filename": "seg.warc.gz"}
        for j in range(25)
    ]
    shards, cluster = cdx.encode_cdx_sharded(
        rows, block_lines=5, blocks_per_shard=3
    )
    for name, payload in shards.items():
        (tmp_path / name).write_bytes(payload)
    (tmp_path / "cluster.idx").write_bytes(
        cdx.encode_cluster_idx(cluster)
    )
    cl = cdx.read_cluster_idx(spark, str(tmp_path / "cluster.idx"))
    hit = cdx.cdx_shard_lookup(cl, "org,h012")
    parsed = cdx.parse_cdx_lines(
        cdx.fetch_cdx_blocks(hit, str(tmp_path))
    ).collect()
    # the hit block(s) over-approximate; the target key must be there
    keys = {r["urlkey"] for r in parsed}
    assert "org,h012)/p" in keys
    assert all(k.startswith("org,h") for k in keys)
    # corrupt locator: shifted offset
    bad = cl.withColumn("offset", F.col("offset") + F.lit(3)).limit(1)
    with pytest.raises(Exception, match="corrupt cdx block"):
        cdx.fetch_cdx_blocks(bad, str(tmp_path)).collect()
