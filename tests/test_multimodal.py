"""Multimodal plumbing: Arrow mapInPandas shape, strict-mode contract,
frame-sample explode. Decoders are declared stubs (no codec libs in the
container); the tests pin the CONTRACT a real decoder drops into."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_excel_csv_sql_spark.io.jdbc import JdbcQuerySource
from etl_excel_csv_sql_spark.operators import multimodal


@pytest.fixture()
def media(spark):
    df = spark.createDataFrame(
        [(1, b"\x89PNG\r\n payload"), (2, b"\xff\xd8\xff\xe0 jpeg"), (3, None)],
        ["doc_id", "blob"],
    )
    return multimodal.to_media_column(df, "doc_id", "blob", "image")


def test_media_column_shape(media):
    rows = {r.media_id: r for r in media.collect()}
    assert rows[1].magic == "89504E47"      # PNG magic, hex
    assert rows[2].magic == "FFD8FFE0"      # JPEG/JFIF
    assert rows[1].byte_len == len(b"\x89PNG\r\n payload")
    assert rows[3].payload is None and rows[3].byte_len is None


def test_extract_image_meta_fake_decoder(media):
    out = multimodal.extract_image_meta(media)
    assert out.schema == multimodal.MEDIA_META_SCHEMA
    rows = {r.media_id: r for r in out.collect()}
    assert len(rows) == 3
    # deterministic fake dims inside plausible bounds; null payload → (0,0)
    assert 64 <= rows[1].width <= 64 + 1920 and 64 <= rows[1].height <= 64 + 1080
    assert (rows[3].width, rows[3].height) == (0, 0)
    # determinism: same payload → same dims on re-run
    rows2 = {r.media_id: r for r in multimodal.extract_image_meta(media).collect()}
    assert (rows2[1].width, rows2[1].height) == (rows[1].width, rows[1].height)


def test_strict_mode_refuses_fake_decode(media):
    with pytest.raises(NotImplementedError, match="codec"):
        multimodal.extract_image_meta(media, strict=True)


def test_frame_sample_plan_explodes_by_duration(media):
    plan = multimodal.frame_sample_plan(media.filter(F.col("payload").isNotNull()))
    rows = plan.groupBy("media_id").count().collect()
    assert {r.media_id: r["count"] for r in rows} == {1: 1, 2: 1}  # tiny payloads → 1 frame
    assert plan.columns == ["media_id", "frame_idx", "sample_ts_s"]


def test_jdbc_query_source_in_list_splice():
    # S5/F7: the reference's IN-list template splice with quote escaping
    src = JdbcQuerySource(
        url="jdbc:sqlserver://host;databaseName=db",
        query="SELECT invnum FROM pods WHERE invnum IN (INVOICE_NUMBERS)",
    )
    spliced = src.with_in_list("INVOICE_NUMBERS", ["A-1", "B'2"])
    assert spliced.query == (
        "SELECT invnum FROM pods WHERE invnum IN ('A-1','B''2')"
    )
    # original untouched (immutable splice)
    assert "INVOICE_NUMBERS" in src.query


def test_resize_images_plumbing(spark):
    import pytest

    from etl_excel_csv_sql_spark.operators.multimodal import (
        resize_images,
        to_media_column,
    )

    df = spark.createDataFrame(
        [(1, bytearray(b"\x89PNG" + b"x" * 100)), (2, bytearray(b"\xff\xd8\xff\xe0y" * 8))],
        ["doc_id", "img"],
    )
    media = to_media_column(df, "doc_id", "img")
    out = {r.media_id: r for r in resize_images(media, max_side=128).collect()}
    assert len(out) == 2
    for r in out.values():
        # aspect preserved (±1 rounding) and bounded by max_side
        assert max(r.dst_width, r.dst_height) <= 128
        assert r.payload is not None  # binary round-trips through Arrow
        assert abs(r.dst_width / r.dst_height - r.src_width / r.src_height) < 0.05
    with pytest.raises(NotImplementedError):
        resize_images(media, strict=True)


def test_extract_audio_meta_plumbing(spark):
    import pytest

    from etl_excel_csv_sql_spark.operators.multimodal import (
        extract_audio_meta,
        to_media_column,
    )

    df = spark.createDataFrame(
        [(7, bytearray(b"RIFFxxxxWAVE" * 40))], ["doc_id", "clip"]
    )
    media = to_media_column(df, "doc_id", "clip", media_type="audio")
    row = extract_audio_meta(media).collect()[0]
    assert row.media_id == 7 and row.sample_rate % 8000 == 0
    assert row.n_samples == row.byte_len * 4
    assert row.duration_s == row.n_samples // row.sample_rate
    with pytest.raises(NotImplementedError):
        extract_audio_meta(media, strict=True)
