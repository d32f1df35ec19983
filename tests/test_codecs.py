"""Golden tests for the pure-stdlib media codecs (no Spark session).

Covers: BMP/PNG/PPM encode→decode pixel-identity roundtrips, top-down
BMP row order, PNG rows filtered with every filter type (1-4) decoded
back to the original pixels, RGBA PNG alpha-drop, JPEG SOF dimension
walk, WAV chunk-walk metadata, and nearest-neighbor resize geometry."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from etl_excel_csv_sql_spark.operators import codecs as C


@pytest.fixture()
def arr() -> np.ndarray:
    rng = np.random.RandomState(7)
    return rng.randint(0, 256, (13, 17, 3), dtype=np.uint8)


@pytest.mark.parametrize("fmt", ["bmp", "png", "ppm"])
def test_image_roundtrip_pixel_identity(arr, fmt):
    enc = C.encode_image(arr, fmt)
    assert C.sniff_format(enc) == fmt
    assert C.image_meta(enc) == (fmt, 17, 13)
    got_fmt, dec = C.decode_image(enc)
    assert got_fmt == fmt
    assert np.array_equal(dec, arr)


def test_bmp_top_down_rows(arr):
    # height < 0 ⇒ rows stored top-down; decoder must not flip them
    bmp = bytearray(C.encode_bmp(arr))
    struct.pack_into("<i", bmp, 22, -13)
    row_size = (3 * 17 + 3) // 4 * 4
    pix = np.frombuffer(bytes(bmp[54:]), np.uint8).reshape(13, row_size)[::-1].tobytes()
    assert np.array_equal(C.decode_bmp(bytes(bmp[:54]) + pix), arr)


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def test_png_unfilter_all_types(arr):
    """Rows filtered with Sub/Up/Average/Paeth (cycling) must decode back
    to the original pixels — exercises every branch of _png_unfilter."""
    h, w = arr.shape[:2]
    stride = 3 * w
    raws, prev = [], np.zeros(stride, np.int32)
    for y in range(h):
        line = arr[y].reshape(-1).astype(np.int32)
        ft = 1 + (y % 4)
        filt = np.zeros(stride, np.int32)
        for i in range(stride):
            a = line[i - 3] if i >= 3 else 0
            b = prev[i]
            c = prev[i - 3] if i >= 3 else 0
            if ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            filt[i] = (line[i] - pred) & 0xFF
        raws.append(bytes([ft]) + bytes(filt.astype(np.uint8)))
        prev = line
    png = (
        C.PNG_MAGIC
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + _png_chunk(b"IDAT", zlib.compress(b"".join(raws)))
        + _png_chunk(b"IEND", b"")
    )
    assert np.array_equal(C.decode_png(png), arr)


def test_png_rgba_alpha_dropped(arr):
    h, w = arr.shape[:2]
    rgba = np.dstack([arr, np.full((h, w), 200, np.uint8)])
    raw = np.zeros((h, 1 + 4 * w), np.uint8)
    raw[:, 1:] = rgba.reshape(h, -1)
    png = (
        C.PNG_MAGIC
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0))
        + _png_chunk(b"IDAT", zlib.compress(raw.tobytes()))
        + _png_chunk(b"IEND", b"")
    )
    assert np.array_equal(C.decode_png(png), arr)


def test_ppm_header_comments():
    arr = np.zeros((2, 3, 3), np.uint8)
    body = b"P6\n# a comment\n3 2\n# another\n255\n" + arr.tobytes()
    assert C.ppm_meta(body) == (3, 2)
    assert np.array_equal(C.decode_ppm(body), arr)


def test_decode_guards_reject_decompression_bombs():
    """A crafted header claiming huge dims must raise ValueError FAST
    (quarantine) instead of allocating gigabytes (executor OOM): the
    one-bad-row-kills-the-batch class, but for memory."""
    import resource, struct as _s, time, zlib as _z

    # 60000x60000 claims ~10 GB decoded; the guard must fire pre-alloc
    bomb_png = (
        C.PNG_MAGIC
        + _png_chunk(b"IHDR", _s.pack(">IIBBBBB", 60000, 60000, 8, 2, 0, 0, 0))
        + _png_chunk(b"IDAT", _z.compress(b"\x00" * 100))
        + _png_chunk(b"IEND", b"")
    )
    bomb_gif = (
        b"GIF89a" + _s.pack("<HHBBB", 60000, 60000, 0xF0, 0, 0)
        + bytes(6)  # 2-entry GCT
        + b"\x2c" + _s.pack("<HHHHB", 0, 0, 60000, 60000, 0)
        + bytes((2, 1, 0x4C, 0x00)) + b"\x3b"
    )
    bomb_bmp = bytearray(C.encode_bmp(np.zeros((4, 4, 3), np.uint8)))
    _s.pack_into("<ii", bomb_bmp, 18, 60000, 60000)
    bomb_ppm = b"P6\n60000 60000\n255\n" + b"\x00" * 48
    bomb_jpg = C.encode_jpeg_header_only(60000, 60000)
    arr8 = np.zeros((8, 8, 3), np.uint8)
    bomb_seq = bytearray(C.encode_jpeg_baseline(arr8))
    sof = bomb_seq.find(b"\xff\xc0")
    _s.pack_into(">HH", bomb_seq, sof + 5, 60000, 60000)
    bomb_prog = bytearray(C.encode_jpeg_progressive(arr8))
    sof2 = bomb_prog.find(b"\xff\xc2")
    _s.pack_into(">HH", bomb_prog, sof2 + 5, 60000, 60000)
    # a real zlib bomb INSIDE sane dims: 4x4 PNG whose IDAT inflates 1 MB
    bomb_inflate = (
        C.PNG_MAGIC
        + _png_chunk(b"IHDR", _s.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0))
        + _png_chunk(b"IDAT", _z.compress(b"\x00" * 1_000_000))
        + _png_chunk(b"IEND", b"")
    )
    for name, payload in (
        ("png", bomb_png), ("gif", bomb_gif), ("bmp", bytes(bomb_bmp)),
        ("ppm", bomb_ppm), ("jpeg-hdr", bomb_jpg),
        ("jpeg-seq", bytes(bomb_seq)), ("jpeg-prog", bytes(bomb_prog)),
        ("png-inflate", bomb_inflate),
    ):
        t0 = time.perf_counter()
        rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        with pytest.raises(ValueError):
            C.decode_image(payload)
        dt = time.perf_counter() - t0
        drss_mb = (
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss - rss0
        ) / 1024
        assert dt < 1.0, (name, dt)
        assert drss_mb < 256, (name, drss_mb)


def test_decoders_raise_only_valueerror_on_garbage_and_mutations():
    """Quarantine contract fuzz: random bytes and bit-flipped valid
    payloads must either decode or raise ValueError — never any other
    exception class (lenient-mode kernels catch ValueError only; a
    stray KeyError/TypeError would kill the whole Arrow batch)."""
    rng = np.random.RandomState(1234)
    arr = ((np.arange(16)[:, None] * 9 + np.arange(24)[None, :] * 5) % 256)
    arr = np.stack([arr, (arr + 31) % 256, (arr + 62) % 256], axis=2).astype(
        np.uint8
    )
    valids = [
        C.encode_bmp(arr), C.encode_png(arr),
        C.encode_png(arr, interlace=True), C.encode_ppm(arr),
        C.encode_gif(arr), C.encode_tiff(arr, strips=3),
        C.encode_jpeg_baseline(arr),
        C.encode_jpeg_baseline(arr, subsampling="4:2:0", restart_interval=2),
        C.encode_jpeg_progressive(arr),
    ]
    trials = ok = quarantined = 0
    # pure-garbage payloads with valid magics spliced in
    magics = [b"BM", C.PNG_MAGIC, b"P6", b"GIF89a", b"\xff\xd8"]
    for _ in range(60):
        blob = rng.bytes(rng.randint(0, 120))
        for m in magics:
            trials += 1
            try:
                C.decode_image(m + blob)
                ok += 1
            except ValueError:
                quarantined += 1
    # mutation fuzz over every codec: flip 1-4 bytes / truncate
    for payload in valids:
        for _ in range(80):
            buf = bytearray(payload)
            if rng.rand() < 0.3:
                buf = buf[: rng.randint(1, len(buf))]
            for _ in range(rng.randint(1, 5)):
                if buf:
                    buf[rng.randint(0, len(buf))] = rng.randint(0, 256)
            trials += 1
            try:
                C.decode_image(bytes(buf))
                ok += 1
            except ValueError:
                quarantined += 1
    assert trials == ok + quarantined  # no other exception escaped
    assert quarantined > 0  # the fuzz actually hit malformed shapes


def _handbuilt_gray_tiff(gray: np.ndarray, photometric: int) -> bytes:
    h, w = gray.shape
    bo = "<"
    n_entries = 9
    data_off = 8 + 2 + n_entries * 12 + 4

    def entry(tag, typ, count, value):
        return struct.pack(bo + "HHI", tag, typ, count) + value.ljust(4, b"\x00")

    ifd = struct.pack(bo + "H", n_entries)
    ifd += entry(256, 4, 1, struct.pack(bo + "I", w))
    ifd += entry(257, 4, 1, struct.pack(bo + "I", h))
    ifd += entry(258, 3, 1, struct.pack(bo + "H", 8))
    ifd += entry(259, 3, 1, struct.pack(bo + "H", 1))
    ifd += entry(262, 3, 1, struct.pack(bo + "H", photometric))
    ifd += entry(273, 4, 1, struct.pack(bo + "I", data_off))
    ifd += entry(277, 3, 1, struct.pack(bo + "H", 1))
    ifd += entry(278, 4, 1, struct.pack(bo + "I", h))
    ifd += entry(279, 4, 1, struct.pack(bo + "I", w * h))
    ifd += struct.pack(bo + "I", 0)
    return (
        b"II" + struct.pack(bo + "H", 42) + struct.pack(bo + "I", 8)
        + ifd + gray.tobytes()
    )


def test_tiff_roundtrip_strips_and_byte_orders():
    s = (np.arange(24)[:, None] * 7 + np.arange(32)[None, :] * 3) % 256
    arr = np.stack([s, (s + 31) % 256, (s + 62) % 256], axis=2).astype(np.uint8)
    for bo in ("<", ">"):
        for strips in (1, 3, 24):
            t = C.encode_tiff(arr, strips=strips, byte_order=bo)
            assert C.sniff_format(t) == "tiff"
            assert C.tiff_meta(t) == (32, 24)
            assert C.image_meta(t) == ("tiff", 32, 24)
            assert np.array_equal(C.decode_tiff(t), arr), (bo, strips)
    f, d = C.decode_image(C.encode_image(arr, "tiff"))
    assert f == "tiff" and np.array_equal(d, arr)


def test_tiff_grayscale_both_photometrics_handbuilt():
    """Decoder pinned independently of our encoder: 8-bit grayscale with
    PhotometricInterpretation 1 (black-is-zero) and 0 (inverted)."""
    g = ((np.arange(64).reshape(8, 8) * 4) % 256).astype(np.uint8)
    d1 = C.decode_tiff(_handbuilt_gray_tiff(g, 1))
    assert np.array_equal(d1[:, :, 0], g) and np.array_equal(d1[:, :, 1], g)
    d0 = C.decode_tiff(_handbuilt_gray_tiff(g, 0))
    assert np.array_equal(d0[:, :, 0], 255 - g)


def test_tiff_rejects_unsupported_and_bombs():
    arr = np.zeros((4, 4, 3), np.uint8)
    base = C.encode_tiff(arr)
    with pytest.raises(ValueError, match="not a TIFF"):
        C.tiff_meta(b"IX\x2a\x00" + base[4:])
    # LZW compression tag -> quarantine
    buf = bytearray(base)
    # entry 4 (Compression) value at ifd_off + 2 + 3*12 + 8
    struct.pack_into("<H", buf, 8 + 2 + 3 * 12 + 8, 5)
    with pytest.raises(ValueError, match="uncompressed"):
        C.decode_tiff(bytes(buf))
    # bomb dims raise pre-allocation
    buf = bytearray(base)
    struct.pack_into("<I", buf, 8 + 2 + 8, 60000)
    struct.pack_into("<I", buf, 8 + 2 + 12 + 8, 60000)
    with pytest.raises(ValueError):
        C.decode_tiff(bytes(buf))
    # strip pointing outside the payload
    buf = bytearray(base)
    struct.pack_into("<I", buf, 8 + 2 + 5 * 12 + 8, len(base) + 100)
    with pytest.raises(ValueError):
        C.decode_tiff(bytes(buf))


def test_mp3_meta_frame_walk():
    for kbps in (32, 128, 320):
        for sr in (44100, 48000, 32000):
            p = C.encode_mp3_headers(7, kbps, sr, id3_title="t")
            assert C.mp3_meta(p) == (kbps, sr, 7, 7 * 1152 * 1000 // sr, True)
    # VBR: mean bitrate over real frames
    p = b"".join(C.encode_mp3_headers(1, k, 44100) for k in (128, 192, 128, 192))
    assert C.mp3_meta(p)[:3] == (160, 44100, 4)
    # trailing ID3v1 tag tolerated; no ID3v2 -> has_id3 False
    p = C.encode_mp3_headers(3, 128, 44100) + b"TAG" + bytes(125)
    assert C.mp3_meta(p)[2] == 3 and C.mp3_meta(p)[4] is False
    # ID3v2.4 footer flag (header byte 5, bit 4): the 10-byte '3DI'
    # footer is NOT counted in the syncsafe size — the skip must add it
    # or the frame-sync walk quarantines a valid stream (ADVICE r11)
    body = bytes(20)
    size_bytes = bytes((0, 0, len(body) >> 7, len(body) & 0x7F))
    tag = b"ID3\x04\x00\x10" + size_bytes + body + b"3DI\x04\x00\x10" + size_bytes
    p = tag + C.encode_mp3_headers(5, 192, 48000)
    assert C.mp3_meta(p) == (192, 48000, 5, 5 * 1152 * 1000 // 48000, True)


def test_mp3_meta_rejects_malformed():
    good = C.encode_mp3_headers(2, 128, 44100)
    for bad in (b"", b"\xff\xfb", bytes(20), good[:-10]):
        with pytest.raises(ValueError):
            C.mp3_meta(bad)
    # mid-stream sample-rate change
    p = C.encode_mp3_headers(1, 128, 44100) + C.encode_mp3_headers(1, 128, 48000)
    with pytest.raises(ValueError, match="sample rate changes"):
        C.mp3_meta(p)
    # MPEG-2 version bits
    buf = bytearray(good)
    buf[1] = 0xF3  # version 10 (MPEG-2)
    with pytest.raises(ValueError, match="MPEG-1"):
        C.mp3_meta(bytes(buf))
    # free-format bitrate index
    buf = bytearray(good)
    buf[2] &= 0x0F
    with pytest.raises(ValueError, match="bitrate index"):
        C.mp3_meta(bytes(buf))


def test_mp4_meta_box_walk():
    p = C.encode_mp4_headers(
        "isom", 90000, 90000 * 7 + 123,
        [{"handler": "vide", "codec": "avc1", "width": 640, "height": 360},
         {"handler": "soun", "codec": "mp4a"}],
    )
    assert C.mp4_meta(p) == ("isom", 90000, 7001, 2, 640, 360, "avc1")
    # audio-only: NULL dims/codec
    p = C.encode_mp4_headers("mp42", 1000, 2500,
                             [{"handler": "soun", "codec": "mp4a"}])
    assert C.mp4_meta(p) == ("mp42", 1000, 2500, 1, None, None, None)
    # 64-bit largesize box wrapping moov is walked transparently
    p = C.encode_mp4_headers("avc1", 600, 1200,
                             [{"handler": "vide", "codec": "hev1",
                               "width": 16, "height": 16}])
    i = p.index(b"moov") - 4
    import struct as _s
    (size,) = _s.unpack_from(">I", p, i)
    big = (p[:i] + _s.pack(">I", 1) + b"moov" + _s.pack(">Q", size + 8)
           + p[i + 8 : i + size] + p[i + size :])
    assert C.mp4_meta(big) == ("avc1", 600, 2000, 1, 16, 16, "hev1")
    # mvhd v1 (64-bit duration): rebuild the mvhd body by hand
    v1_body = _s.pack(">B3x QQ I Q", 1, 0, 0, 1000, 3750)
    v1 = _s.pack(">I", 8 + len(v1_body)) + b"mvhd" + v1_body
    moov = _s.pack(">I", 8 + len(v1)) + b"moov" + v1
    ftyp = p[:i]
    assert C.mp4_meta(ftyp + moov)[:4] == ("avc1", 1000, 3750, 0)


def test_mp4_meta_rejects_malformed():
    good = C.encode_mp4_headers(
        "isom", 600, 600, [{"handler": "soun", "codec": "mp4a"}]
    )
    for bad in (b"", b"\x00\x00\x00\x08ftyp", bytes(32), good[:-6],
                good[: good.index(b"moov") - 4]):
        with pytest.raises(ValueError):
            C.mp4_meta(bad)
    # a box whose declared size overruns the payload
    buf = bytearray(good)
    import struct as _s
    _s.pack_into(">I", buf, good.index(b"moov") - 4, len(good) * 2)
    with pytest.raises(ValueError, match="overruns"):
        C.mp4_meta(bytes(buf))
    # timescale 0 divides somewhere downstream -> must quarantine here
    buf = bytearray(good)
    mvhd = good.index(b"mvhd") + 4
    _s.pack_into(">I", buf, mvhd + 12, 0)
    with pytest.raises(ValueError, match="timescale"):
        C.mp4_meta(bytes(buf))


def test_flac_meta_streaminfo():
    p = C.encode_flac_headers(44100, 2, 16, 44100 * 3 + 7,
                              vorbis_comment="title=x")
    assert C.flac_meta(p) == (44100, 2, 16, 132307, 3000, True)
    p = C.encode_flac_headers(192000, 8, 32, 12345)
    assert C.flac_meta(p) == (192000, 8, 32, 12345, 64, False)
    # 36-bit total-samples boundary
    p = C.encode_flac_headers(96000, 1, 24, (1 << 36) - 1)
    assert C.flac_meta(p)[3] == (1 << 36) - 1


def test_flac_meta_rejects_malformed():
    good = C.encode_flac_headers(48000, 2, 16, 48000)
    for bad in (b"", b"fLaC", bytes(40), good[:-4]):
        with pytest.raises(ValueError):
            C.flac_meta(bad)
    # STREAMINFO must come first
    buf = bytearray(good)
    buf[4] = 0x84  # relabel the first block as last VORBIS_COMMENT
    with pytest.raises(ValueError, match="STREAMINFO"):
        C.flac_meta(bytes(buf))
    # rate 0 (the 20-bit field all-zero)
    with pytest.raises(ValueError):
        C.encode_flac_headers(0, 2, 16, 100)
    buf = bytearray(good)
    buf[4 + 4 + 10] = 0
    buf[4 + 4 + 11] = 0
    buf[4 + 4 + 12] &= 0x0F
    with pytest.raises(ValueError, match="sample rate"):
        C.flac_meta(bytes(buf))


def test_every_public_parser_wears_the_valueerror_decorator():
    """An insertion once split a decorator from its def (jpeg_meta lost
    @_malformed_as_valueerror while the orphaned decorator wrapped the
    function below it) — struct.error then escaped the quarantine
    contract. Pin the full coverage set."""
    for name in (
        "decode_bmp", "bmp_meta", "decode_png", "png_meta", "decode_ppm",
        "ppm_meta", "decode_gif", "gif_meta", "decode_jpeg", "jpeg_meta",
        "decode_wav", "wav_meta", "avi_frames", "avi_meta", "exif_meta",
        "image_meta", "decode_image", "decode_dib_frame", "tiff_meta",
        "decode_tiff", "mp3_meta", "mp4_meta", "flac_meta",
        "aac_adts_meta", "webm_meta", "webp_meta", "ogg_opus_meta",
        "sniff_container",
    ):
        assert hasattr(getattr(C, name), "__wrapped__"), name


def test_container_parsers_raise_only_valueerror_and_stay_fast():
    """WAV/AVI/EXIF mutation fuzz: same quarantine contract as images,
    plus a wall-clock cap per call — the r11 fuzz found a mutated EXIF
    count of ~2^32 spending minutes building a struct format string
    (algorithmic DoS from a 100-byte payload)."""
    import time

    rng = np.random.RandomState(7)
    pcm = (np.arange(2048) % 251 - 125).astype(np.int16)
    wav = C.encode_wav(pcm, 8000, 1)
    mj = C.encode_mjpeg_avi(
        16, 16, 10, [C.encode_jpeg_baseline(np.zeros((16, 16, 3), np.uint8))] * 2
    )
    dib = C.encode_dib_avi(16, 16, 10, [np.zeros((16, 16, 3), np.uint8)] * 2)
    app1 = C.build_exif_app1(6, "Mk", "Mdl", "2024:01:02 03:04:05", 320, 240)
    base = C.encode_jpeg_baseline(np.zeros((16, 16, 3), np.uint8))
    exifed = base[:2] + app1 + base[2:]
    fns = (C.decode_wav, C.wav_meta, C.avi_frames, C.avi_meta,
           C.exif_meta, C.jpeg_meta, C.mp3_meta, C.mp4_meta, C.flac_meta,
           C.aac_adts_meta, C.webm_meta, C.webp_meta, C.ogg_opus_meta)
    trials = quarantined = 0
    mp3 = C.encode_mp3_headers(6, 128, 44100, id3_title="x")
    mp4 = C.encode_mp4_headers(
        "isom", 90000, 90000 * 3,
        [{"handler": "vide", "codec": "avc1", "width": 320, "height": 240},
         {"handler": "soun", "codec": "mp4a"}],
    )
    flac = C.encode_flac_headers(44100, 2, 16, 44100, vorbis_comment="t=x")
    aac = C.encode_adts_frames(8, 48000, 2, profile="lc", crc=True)
    webm = C.encode_webm_headers(
        "webm", 1_000_000, 4321,
        [{"handler": "vide", "codec": "V_VP9", "width": 320, "height": 240},
         {"handler": "soun", "codec": "A_OPUS"}],
    )
    webp = C.encode_webp_headers("extended", 320, 240, alpha=True)
    ogg = C.encode_ogg_opus(2, 312, 48000, 3, 96000)
    for payload in (wav, mj, dib, exifed, mp3, mp4, flac, aac, webm,
                    webp, ogg):
        for _ in range(60):
            buf = bytearray(payload)
            if rng.rand() < 0.3:
                buf = buf[: rng.randint(1, len(buf))]
            for _ in range(rng.randint(1, 6)):
                if buf:
                    buf[rng.randint(0, len(buf))] = rng.randint(0, 256)
            b = bytes(buf)
            for fn in fns:
                trials += 1
                t0 = time.perf_counter()
                try:
                    fn(b)
                except ValueError:
                    quarantined += 1
                assert time.perf_counter() - t0 < 1.0, fn.__name__
    assert quarantined > 0 and trials > 1000


def _gif_descriptor_pos(gif: bytes) -> int:
    """Position of the 0x2C image descriptor (fixed header + GCT)."""
    depth = (gif[10] & 0x07) + 1
    return 13 + (2 << (depth - 1)) * 3


def test_gif_roundtrip_exact_palette():
    arr = ((np.arange(24 * 32 * 3).reshape(24, 32, 3) // 3 * 7) % 256).astype(
        np.uint8
    )
    # force <=256 distinct colors: quantize to a byte-keyed gradient
    s = (np.arange(24)[:, None] * 7 + np.arange(32)[None, :] * 3) % 256
    arr = np.stack([s, (s + 31) % 256, (s + 62) % 256], axis=2).astype(np.uint8)
    gif = C.encode_gif(arr)
    assert C.sniff_format(gif) == "gif"
    assert C.gif_meta(gif) == (32, 24)
    assert C.image_meta(gif) == ("gif", 32, 24)
    assert np.array_equal(C.decode_gif(gif), arr)


def test_gif_lzw_dict_overflow_clear_codes():
    """A 300x300 random 256-color image forces the LZW dictionary past
    4096 entries — the encoder must emit CLEAR and the decoder must
    reset mid-stream."""
    rng = np.random.RandomState(11)
    pal = rng.randint(0, 256, (256, 3)).astype(np.uint8)
    arr = pal[rng.randint(0, 256, (300, 300))]
    assert np.array_equal(C.decode_gif(C.encode_gif(arr)), arr)


def test_gif_decode_handbuilt_independent_of_encoder():
    """2x1 GIF hand-assembled bit by bit (min_code=2: codes clear=4,
    eoi=5; pixel indices 1, 2 → LSB-first packed stream 0x8C 0x0A)."""
    gct = bytes((0, 0, 0, 10, 20, 30, 40, 50, 60, 70, 80, 90))
    gif = (
        b"GIF89a"
        + struct.pack("<HHBBB", 2, 1, 0xF1, 0, 0)
        + gct
        + b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 1, 0)
        + bytes((2, 2, 0x8C, 0x0A, 0x00))
        + b"\x3b"
    )
    dec = C.decode_gif(gif)
    assert dec.shape == (1, 2, 3)
    assert dec[0, 0].tolist() == [10, 20, 30]
    assert dec[0, 1].tolist() == [40, 50, 60]


def test_gif_interlaced_decode():
    """Interlaced GIF: rows stored in 4-pass order decode back to
    natural order (patch the descriptor's interlace bit on a stream
    whose rows were pre-permuted into pass order)."""
    s = (np.arange(8)[:, None] * 37 + np.arange(8)[None, :] * 5) % 256
    arr = np.stack([s, s, s], axis=2).astype(np.uint8)
    perm = [0, 4, 2, 6, 1, 3, 5, 7]  # pass order for h=8
    gif = bytearray(C.encode_gif(arr[perm]))
    dpos = _gif_descriptor_pos(bytes(gif))
    assert gif[dpos] == 0x2C
    gif[dpos + 9] |= 0x40  # interlace flag
    assert np.array_equal(C.decode_gif(bytes(gif)), arr)


def test_gif_animated_first_frame_and_extensions():
    """89a extensions (graphic control, application) are skipped and
    only the FIRST frame decodes; a frame smaller than the logical
    screen composites onto the background color."""
    arr = np.full((4, 4, 3), 200, np.uint8)
    base = C.encode_gif(arr)
    dpos = _gif_descriptor_pos(base)
    gce = bytes((0x21, 0xF9, 4, 0, 0, 0, 0, 0))
    app = (
        bytes((0x21, 0xFF, 11)) + b"NETSCAPE2.0" + bytes((3, 1, 0, 0, 0))
    )
    frame_block = base[dpos:-1]  # descriptor..data, sans trailer
    spliced = base[:dpos] + gce + app + frame_block + frame_block + b"\x3b"
    assert np.array_equal(C.decode_gif(spliced), arr)


def test_gif_rejects_malformed():
    arr = np.zeros((6, 6, 3), np.uint8)
    gif = C.encode_gif(arr)
    with pytest.raises(ValueError, match="not a GIF"):
        C.gif_meta(b"NOTAGIF" + gif)
    with pytest.raises(ValueError):
        C.decode_gif(gif[:20])  # truncated mid-GCT/descriptor
    with pytest.raises(ValueError):
        C.decode_gif(gif[:-8])  # truncated pixel stream
    grad = np.zeros((32, 32, 3), np.uint8)
    grad[:, :, 0] = (np.arange(32)[:, None] * 8) % 256
    grad[:, :, 1] = (np.arange(32)[None, :] * 8) % 256
    grad[:, :, 2] = ((np.arange(32)[:, None] + np.arange(32)[None, :]) * 4) % 256
    with pytest.raises(ValueError, match="256"):
        C.encode_gif(grad)


def test_jpeg_sof_dimension_walk():
    sof = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", 99, 123) + b"\x03"
    jpg = b"\xff\xd8" + b"\xff\xe0" + struct.pack(">H", 4) + b"JF" + sof + b"\xff\xd9"
    assert C.jpeg_meta(jpg) == (123, 99)
    assert C.image_meta(jpg) == ("jpeg", 123, 99)
    with pytest.raises(ValueError, match="truncated SOF"):
        C.decode_image(jpg)  # truncated header-only stream: dims parse, pixels don't


def test_wav_roundtrip_mono_and_stereo():
    pcm = (np.arange(1000) % 251 - 125).astype(np.int16)
    assert C.wav_meta(C.encode_wav(pcm, 16000, 1)) == (16000, 1, 16, 1000)
    stereo = np.stack([pcm, -pcm], axis=1)
    assert C.wav_meta(C.encode_wav(stereo, 44100, 2)) == (44100, 2, 16, 1000)


def test_resize_nearest_geometry():
    arr = np.arange(4 * 8 * 3, dtype=np.uint8).reshape(4, 8, 3)
    out = C.resize_nearest(arr, 4, 2)
    assert out.shape == (2, 4, 3)
    # integer source-index map: dst (y, x) ← src ((y*4)//2, (x*8)//4)
    assert np.array_equal(out[0, 0], arr[0, 0])
    assert np.array_equal(out[1, 3], arr[2, 6])


def test_undecodable_payload_raises():
    with pytest.raises(ValueError, match="undecodable"):
        C.image_meta(b"\x00\x01\x02\x03 garbage")
    assert C.sniff_format(None) is None
    assert C.sniff_format(b"") is None


def test_avi_roundtrip_and_validation():
    from etl_excel_csv_sql_spark.operators import codecs

    b = codecs.encode_avi(640, 480, 30, 90)
    assert codecs.sniff_format(b) == "avi"
    assert codecs.avi_meta(b) == (640, 480, 30, 90)
    # fps comes from strh dwRate/dwScale, exact for non-integer-microsec
    # rates like 24
    assert codecs.avi_meta(codecs.encode_avi(16, 16, 24, 7))[2] == 24
    import pytest

    with pytest.raises(ValueError):
        codecs.avi_meta(b"RIFF\x04\x00\x00\x00WAVE")  # wrong form type
    with pytest.raises(ValueError):
        codecs.avi_meta(b[:50])  # truncated chunk run
    # header chunks present but fields out of range → ValueError (the
    # lenient-mode quarantine contract), never ZeroDivision/garbage
    import struct

    zero_scale = bytearray(codecs.encode_avi(16, 16, 25, 4))
    strh_at = zero_scale.find(b"strh")
    struct.pack_into("<II", zero_scale, strh_at + 8 + 20, 0, 25)
    with pytest.raises(ValueError):
        codecs.avi_meta(bytes(zero_scale))


def test_wav_meta_rejects_out_of_range_fmt():
    import struct

    import pytest

    from etl_excel_csv_sql_spark.operators import codecs
    import numpy as np

    good = bytearray(
        codecs.encode_wav(np.zeros((8, 1), dtype=np.int16), 8000, 1)
    )
    fmt_at = good.find(b"fmt ")
    # zero channels must raise ValueError, not ZeroDivisionError
    struct.pack_into("<H", good, fmt_at + 8 + 2, 0)
    with pytest.raises(ValueError):
        codecs.wav_meta(bytes(good))


def test_bmp_meta_rejects_core_header():
    import struct

    import pytest

    from etl_excel_csv_sql_spark.operators import codecs

    # BITMAPCOREHEADER: 12-byte DIB with 16-bit dims — meta must refuse
    # rather than unpack garbage from the INFOHEADER layout
    core = b"BM" + struct.pack("<IHHI", 26, 0, 0, 26) + struct.pack(
        "<IHHHH", 12, 7, 9, 1, 24
    )
    with pytest.raises(ValueError):
        codecs.bmp_meta(core)


# ---------------------------------------------------------------------------
# EXIF / TIFF IFD
# ---------------------------------------------------------------------------

def test_exif_roundtrip_both_byte_orders():
    for bo in ("<", ">"):
        app1 = C.build_exif_app1(
            6, "CameraCo", "ModelX-Long-Name-9000", "2024:01:05 10:30:00",
            640, 480, byte_order=bo,
        )
        jp = C.encode_jpeg_header_only(640, 480, app1)
        assert C.jpeg_meta(jp) == (640, 480)
        m = C.exif_meta(jp)
        assert m["orientation"] == 6
        assert m["make"] == "CameraCo"  # ≤4+null? no: offset-stored
        assert m["model"] == "ModelX-Long-Name-9000"
        assert m["datetime"] == "2024:01:05 10:30:00"
        assert (m["exif_width"], m["exif_height"]) == (640, 480)


def test_exif_inline_short_ascii():
    # "abc" + NUL is exactly 4 bytes → stored inline, not by offset
    app1 = C.build_exif_app1(1, "abc", "xy", "2024:01:01 00:00:00", 8, 8)
    m = C.exif_meta(C.encode_jpeg_header_only(8, 8, app1))
    assert m["make"] == "abc" and m["model"] == "xy"


def test_exif_missing_and_corrupt():
    plain = C.encode_jpeg_header_only(32, 16)
    assert C.jpeg_meta(plain) == (32, 16)
    with pytest.raises(ValueError):
        C.exif_meta(plain)  # no APP1
    with pytest.raises(ValueError):
        C.exif_meta(b"\x00\x01not a jpeg")
    # corrupt TIFF magic
    app1 = bytearray(
        C.build_exif_app1(1, "a", "b", "2024:01:01 00:00:00", 8, 8)
    )
    app1[12] = 99  # clobber the 42 magic (after FFE1 len 'Exif\0\0' II)
    with pytest.raises(ValueError):
        C.exif_meta(C.encode_jpeg_header_only(8, 8, bytes(app1)))


# ---------------------------------------------------------------------------
# AVI frame-level walk (VERDICT r9 #5: MJPEG-in-AVI frame extraction)
# ---------------------------------------------------------------------------


def test_mjpeg_avi_frames_roundtrip():
    jf = [C.encode_jpeg_header_only(32 + i, 24 + 2 * i) for i in range(5)]
    avi = C.encode_mjpeg_avi(64, 48, 25, jf)
    assert C.avi_meta(avi) == (64, 48, 25, 5)
    frames = C.avi_frames(avi)
    assert [(i, k) for i, k, _ in frames] == [(i, "dc") for i in range(5)]
    # each frame's dims come from its OWN SOF header, not the container
    assert [C.jpeg_meta(b) for _, _, b in frames] == [
        (32 + i, 24 + 2 * i) for i in range(5)
    ]


def test_mjpeg_avi_rejects_non_jpeg_frame():
    with pytest.raises(ValueError, match="not a JPEG"):
        C.encode_mjpeg_avi(8, 8, 10, [b"garbage"])


def test_dib_avi_frames_pixel_roundtrip():
    rng = np.random.default_rng(11)
    frames = [
        rng.integers(0, 256, (12, 10, 3)).astype(np.uint8) for _ in range(3)
    ]
    avi = C.encode_dib_avi(10, 12, 30, frames)
    assert C.avi_meta(avi) == (10, 12, 30, 3)
    for i, kind, body in C.avi_frames(avi):
        assert kind == "db"
        assert np.array_equal(C.decode_dib_frame(body, 10, 12), frames[i])


def test_dib_frame_size_mismatch_raises():
    with pytest.raises(ValueError, match="bytes"):
        C.decode_dib_frame(b"\x00" * 10, 10, 12)


def test_avi_frames_legacy_empty_chunks_and_rec_list():
    # metadata-only fixture: empty 00db chunks still enumerate
    old = C.encode_avi(16, 16, 10, 3)
    assert C.avi_frames(old) == [(0, "db", b""), (1, "db", b""), (2, "db", b"")]
    # 'rec ' grouping LIST inside movi is descended
    import struct as _s

    jf = C.encode_jpeg_header_only(9, 7)
    inner = b"00dc" + _s.pack("<I", len(jf)) + jf + (b"\x00" if len(jf) & 1 else b"")
    rec = b"LIST" + _s.pack("<I", 4 + len(inner)) + b"rec " + inner
    base = C.encode_mjpeg_avi(16, 16, 10, [jf])
    # splice: rebuild movi with the rec-wrapped frame
    movi_at = base.find(b"movi")
    assert movi_at > 0
    head = base[: movi_at - 8]
    new_movi = b"LIST" + _s.pack("<I", 4 + len(rec)) + b"movi" + rec
    riff_body = head[12:] + new_movi
    avi = b"RIFF" + _s.pack("<I", 4 + len(riff_body)) + b"AVI " + riff_body
    frames = C.avi_frames(avi)
    assert len(frames) == 1 and frames[0][1] == "dc"
    assert C.jpeg_meta(frames[0][2]) == (9, 7)


def test_avi_frames_rejects_non_avi():
    with pytest.raises(ValueError):
        C.avi_frames(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError):
        C.avi_frames(b"nonsense")


def test_decode_wav_roundtrip_and_contract():
    pcm = ((np.arange(6000) * 7) % 251 - 125).astype(np.int16).reshape(3000, 2)
    wav = C.encode_wav(pcm, 22050, 2)
    dec, rate = C.decode_wav(wav)
    assert rate == 22050
    assert np.array_equal(dec, pcm)
    mono = ((np.arange(100) * 3) % 199 - 99).astype(np.int16)
    dec_m, rate_m = C.decode_wav(C.encode_wav(mono, 8000, 1))
    assert rate_m == 8000 and dec_m.shape == (100, 1)
    assert np.array_equal(dec_m[:, 0], mono)
    with pytest.raises(ValueError):
        C.decode_wav(b"RIFF\x04\x00\x00\x00AVI ")
    # truncated data chunk must raise, not wrap around
    trunc = bytearray(C.encode_wav(mono, 8000, 1))
    bad = bytes(trunc[:-50])
    with pytest.raises(ValueError):
        C.decode_wav(bad)


# ---------------------------------------------------------------------------
# r11 (VERDICT r10 #5): Adam7 interlaced PNG decode + SOF2 progressive
# JPEG dims — the two most common real-image shapes the decoder used to
# quarantine.
# ---------------------------------------------------------------------------


def test_adam7_roundtrip_many_shapes():
    """Adam7 encode -> decode is identity across edge dims (sub-8x8
    images exercise empty passes; odd dims exercise ceil arithmetic)."""
    rng = np.random.default_rng(7)
    for w, h in ((1, 1), (2, 2), (3, 5), (5, 3), (7, 7), (8, 8),
                 (9, 10), (16, 17), (33, 21)):
        arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        png = C.encode_png(arr, interlace=True)
        assert C.png_meta(png)[:2] == (w, h)
        assert png[28] == 1  # IHDR interlace byte
        fmt, dec = C.decode_image(png)
        assert fmt == "png" and np.array_equal(dec, arr), (w, h)
        # interlaced and sequential encodings of the same pixels decode
        # identically (the pHash fmt-invariance argument extends here)
        assert np.array_equal(dec, C.decode_png(C.encode_png(arr)))


def test_adam7_manual_stream_independent_of_encoder():
    """Decoder correctness independent of our own encoder: a 2x2 Adam7
    stream is hand-built from the spec pass grid — pass 1 carries (0,0),
    pass 6 carries (0,1), pass 7 carries row y=1; passes 2-5 are empty
    and contribute NO bytes. Pass 7 uses filter type 2 (Up) to prove the
    per-pass unfilter resets its previous-row state (Up at a pass's
    first row must predict from zeros)."""
    import struct
    import zlib

    px = np.array(
        [[[10, 20, 30], [40, 50, 60]], [[70, 80, 90], [100, 110, 120]]],
        dtype=np.uint8,
    )
    p1 = b"\x00" + bytes(px[0, 0])            # filter None
    p6 = b"\x00" + bytes(px[0, 1])
    p7 = b"\x02" + bytes(px[1].reshape(6))    # filter Up over zero prev
    raw = zlib.compress(p1 + p6 + p7)

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    png = (
        C.PNG_MAGIC
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1))
        + chunk(b"IDAT", raw)
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(C.decode_png(png), px)


def test_adam7_truncated_stream_raises():
    arr = np.zeros((9, 9, 3), dtype=np.uint8)
    png = bytearray(C.encode_png(arr, interlace=True))
    # flip the interlace byte on a SEQUENTIAL stream: sizes mismatch loud
    seq = bytearray(C.encode_png(arr))
    seq[28] = 1
    with pytest.raises(ValueError):
        C.decode_png(bytes(seq))
    # unknown interlace method
    png[28] = 2
    with pytest.raises(ValueError, match="interlace"):
        C.decode_png(bytes(png))


def test_progressive_jpeg_sof2_dims():
    jpg = C.encode_jpeg_header_only(640, 480, progressive=True)
    assert jpg[2:4] == b"\xff\xc2"
    assert C.jpeg_meta(jpg) == (640, 480)
    assert C.image_meta(jpg) == ("jpeg", 640, 480)


# ---------------------------------------------------------------------------
# Baseline JPEG entropy codec (r10 VERDICT missing-#1: MJPEG pixels)
# ---------------------------------------------------------------------------


def test_jpeg_solid_color_dc_only_roundtrip():
    """A solid color is a pure-DC image: every coefficient block is
    DC-only, so the round-trip error is bounded by the DC quantizer
    rounding alone (<= 1 code value per channel after color convert)."""
    for color in ((0, 0, 0), (255, 255, 255), (120, 64, 200)):
        arr = np.full((16, 24, 3), color, dtype=np.uint8)
        for sub in ("4:4:4", "4:2:2", "4:2:0"):
            enc = C.encode_jpeg_baseline(arr, quality=90, subsampling=sub)
            assert C.sniff_format(enc) == "jpeg"
            assert C.jpeg_meta(enc) == (24, 16)
            dec = C.decode_jpeg(enc)
            assert dec.shape == (16, 24, 3)
            assert np.abs(dec.astype(int) - arr.astype(int)).max() <= 1


def test_jpeg_gradient_roundtrip_quality_ladder():
    x = np.linspace(0, 255, 64)
    g = np.zeros((64, 64, 3), np.uint8)
    g[:, :, 0] = x[None, :]
    g[:, :, 1] = x[:, None]
    g[:, :, 2] = 128
    prev_bytes = 0
    for q in (50, 75, 90, 95):
        enc = C.encode_jpeg_baseline(g, quality=q)
        dec = C.decode_jpeg(enc)
        err = np.abs(dec.astype(int) - g.astype(int))
        assert err.max() <= 12 and err.mean() < 3.0
        assert len(enc) > prev_bytes  # higher quality → more bits
        prev_bytes = len(enc)


def test_jpeg_nonmultiple_dims_and_restart_markers():
    """37x51 at 4:2:0 forces edge padding + crop on both axes; a restart
    interval of 3 exercises RSTn segmentation and DC-predictor resets.
    Flat 8x8 blocks make the content JPEG-stable so the comparison is
    tight even at 4:2:0."""
    rng = np.random.default_rng(3)
    base = rng.integers(0, 256, (7, 7, 3), dtype=np.uint8)
    arr = np.repeat(np.repeat(base, 8, axis=0), 8, axis=1)[:37, :51]
    for ri in (0, 1, 3, 7):
        enc = C.encode_jpeg_baseline(
            arr, quality=95, subsampling="4:2:0", restart_interval=ri
        )
        dec = C.decode_jpeg(enc)
        assert dec.shape == (37, 51, 3)
        err = np.abs(dec.astype(int) - arr.astype(int))
        # interior of each flat block must be near-exact; edges of the
        # 8-grid see chroma averaging across block boundaries
        assert err.mean() < 6.0
    # restart segmentation must not change the decoded pixels at all
    d0 = C.decode_jpeg(C.encode_jpeg_baseline(arr, quality=95, restart_interval=0))
    d3 = C.decode_jpeg(C.encode_jpeg_baseline(arr, quality=95, restart_interval=3))
    assert np.array_equal(d0, d3)


def test_jpeg_ff_byte_stuffing_survives():
    """White (Y=255 → DC magnitude with long 1-runs) plus high quality
    reliably produces 0xFF entropy bytes; the stuffed stream must decode
    and must contain at least one FF00 to prove the path was exercised."""
    arr = np.full((32, 32, 3), 255, dtype=np.uint8)
    arr[::9, ::7] = 0  # pepper to densify the entropy stream
    enc = C.encode_jpeg_baseline(arr, quality=97)
    scan = enc[enc.find(b"\xff\xda") :]
    assert b"\xff\x00" in scan
    dec = C.decode_jpeg(enc)
    assert np.abs(dec.astype(int) - arr.astype(int)).mean() < 30


def test_jpeg_decode_handbuilt_grayscale_independent_of_encoder():
    """Decoder correctness independent of our own encoder: a DC-only
    8x8 single-component JPEG hand-assembled bit by bit. Quant table all
    ones; Huffman DC table: symbol t at code length t+1... simplest
    canonical set {0:'0', 4:'10xxxx' style}. DC diff = 8 (t=4, bits
    1000), so the sample plane decodes to round(8/8)+128-ish: IDCT of
    DC=8 with all-ones quant = 8/8 = 1.0 scaled by basis → flat
    128 + 8 * (1/8) = 129."""
    # canonical table: bits counts = one symbol of length 1 (symbol 0),
    # one of length 2 (symbol 4): codes 0b0, 0b10
    dht_bits = bytes([1, 1] + [0] * 14)
    dht_vals = bytes([0, 4])
    dqt = b"\x00" + bytes([1] * 64)  # Tq=0, all-ones (zigzag irrelevant)
    sof = struct.pack(">BHHB", 8, 8, 8, 1) + bytes((1, 0x11, 0))
    sos = bytes((1, 1, 0x00, 0, 63, 0))
    # entropy: DC symbol 4 -> code '10', then 4 magnitude bits '1000'
    # (=8); AC table needed too: give it the same table; first AC symbol
    # read will be code '0' -> symbol 0 = EOB. Stream: 10 1000 0 -> bits
    # 1010000 + pad 1 -> 0b10100001 = 0xA1
    def seg(marker, body):
        return bytes((0xFF, marker)) + struct.pack(">H", len(body) + 2) + body

    jpg = (
        b"\xff\xd8"
        + seg(0xDB, dqt)
        + seg(0xC0, sof)
        + seg(0xC4, b"\x00" + dht_bits + dht_vals)   # DC table 0
        + seg(0xC4, b"\x10" + dht_bits + dht_vals)   # AC table 0
        + seg(0xDA, sos)
        + b"\xa1"
        + b"\xff\xd9"
    )
    dec = C.decode_jpeg(jpg)
    assert dec.shape == (8, 8, 3)
    # DC coeff 8 * quant 1 → IDCT flat value 8 * 1/8 = 1 → 128 + 1
    assert np.all(dec == 129)


def test_jpeg_grayscale_declared_sampling_not_upsampled():
    """A single-component frame that DECLARES 2x2 sampling factors must
    decode at full resolution (T.81 A.2: non-interleaved scans ignore
    the interleave geometry) — the regression was a 2x zoom of the
    top-left quadrant. Hand-built 16x16 with a left/right brightness
    split so the zoom is detectable."""
    dht_bits = bytes([1, 1] + [0] * 14)
    dht_vals = bytes([0, 4])
    dqt = b"\x00" + bytes([1] * 64)
    sof = struct.pack(">BHHB", 8, 16, 16, 1) + bytes((1, 0x22, 0))
    sos = bytes((1, 1, 0x00, 0, 63, 0))

    def seg(marker, body):
        return bytes((0xFF, marker)) + struct.pack(">H", len(body) + 2) + body

    # 4 blocks raster order; DC diffs: 8, 0, 0, 0 -> right column blocks
    # equal the left (predictor carries), all flat 129. Make block (0,1)
    # differ: diffs 8, -8? -8 needs t=4 code '10' then low bits 0111.
    # Stream per block: [sym4 '10' + 4 bits][EOB '0'].
    # b0: 10 1000 0 | b1: 10 0111 0 | b2: 10 1000 0 | b3: 10 0111 0
    bits = "1010000" + "1001110" + "1010000" + "1001110"
    bits += "1" * (-len(bits) % 8)
    entropy = int(bits, 2).to_bytes(len(bits) // 8, "big")
    jpg = (
        b"\xff\xd8"
        + seg(0xDB, dqt)
        + seg(0xC0, sof)
        + seg(0xC4, b"\x00" + dht_bits + dht_vals)
        + seg(0xC4, b"\x10" + dht_bits + dht_vals)
        + seg(0xDA, sos)
        + entropy
        + b"\xff\xd9"
    )
    dec = C.decode_jpeg(jpg)
    assert dec.shape == (16, 16, 3)
    # left 8 cols bright (DC 8 -> 129), right 8 cols back to 0 -> 128
    assert np.all(dec[:, :8] == 129) and np.all(dec[:, 8:] == 128)


def test_jpeg_scan_order_does_not_swap_chroma():
    """Component identity comes from SOF order, not scan order: re-list
    the SOS components as (Y, Cr, Cb) with the entropy data interleaved
    in that same order — decoded colors must be unchanged."""
    arr = np.zeros((8, 8, 3), np.uint8)
    arr[:, :, 0] = 200  # strongly red
    base = C.encode_jpeg_baseline(arr)
    ref = C.decode_jpeg(base)

    # rebuild with swapped scan: same quant/huffman, blocks re-encoded
    # in scan order Y, Cr, Cb and SOS listing ids 1, 3, 2
    idx = base.find(b"\xff\xda")
    (slen,) = struct.unpack_from(">H", base, idx + 2)
    # decode the three blocks from the original scan, then re-emit
    # swapped by re-encoding from the decoded planes is circular;
    # instead run the encoder's own pieces directly:
    from etl_excel_csv_sql_spark.operators.codecs import (
        _JPEG_AC_CHROMA_BITS, _JPEG_AC_CHROMA_VALS, _JPEG_AC_LUMA_BITS,
        _JPEG_AC_LUMA_VALS, _JPEG_DC_CHROMA_BITS, _JPEG_DC_CHROMA_VALS,
        _JPEG_DC_LUMA_BITS, _JPEG_DC_LUMA_VALS, _JpegBitWriter,
        _encode_block, _huff_encode_table, _plane_blocks, _quality_scale,
        JPEG_QUANT_CHROMA, JPEG_QUANT_LUMA,
    )

    r = arr[:, :, 0].astype(np.float64)
    g = arr[:, :, 1].astype(np.float64)
    b = arr[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    ql = _quality_scale(JPEG_QUANT_LUMA, 90)
    qc = _quality_scale(JPEG_QUANT_CHROMA, 90)
    yb = _plane_blocks(y, ql)
    cbb = _plane_blocks(cb, qc)
    crb = _plane_blocks(cr, qc)
    dc_l = _huff_encode_table(_JPEG_DC_LUMA_BITS, _JPEG_DC_LUMA_VALS)
    ac_l = _huff_encode_table(_JPEG_AC_LUMA_BITS, _JPEG_AC_LUMA_VALS)
    dc_c = _huff_encode_table(_JPEG_DC_CHROMA_BITS, _JPEG_DC_CHROMA_VALS)
    ac_c = _huff_encode_table(_JPEG_AC_CHROMA_BITS, _JPEG_AC_CHROMA_VALS)
    bwr = _JpegBitWriter()
    _encode_block(bwr, yb[0], 0, dc_l, ac_l)
    _encode_block(bwr, crb[0], 0, dc_c, ac_c)  # Cr FIRST in the scan
    _encode_block(bwr, cbb[0], 0, dc_c, ac_c)
    bwr.flush()
    header = base[:idx]  # SOI..DHT unchanged
    sos = bytes((3, 1, 0x00, 3, 0x11, 2, 0x11, 0, 63, 0))
    jpg = (
        header
        + bytes((0xFF, 0xDA))
        + struct.pack(">H", len(sos) + 2)
        + sos
        + bytes(bwr.out)
        + b"\xff\xd9"
    )
    dec = C.decode_jpeg(jpg)
    assert np.array_equal(dec, ref)
    assert dec[4, 4, 0] > 150 > dec[4, 4, 2]  # still red, not blue


def test_jpeg_decode_rejects_unsupported_shapes():
    arr = np.zeros((8, 8, 3), np.uint8)
    enc = C.encode_jpeg_baseline(arr)
    # header-only fixtures have no scan data (progressive or not)
    with pytest.raises(ValueError, match="no SOS"):
        C.decode_jpeg(C.encode_jpeg_header_only(8, 8, progressive=True))
    with pytest.raises(ValueError, match="no SOS"):
        C.decode_jpeg(C.encode_jpeg_header_only(8, 8))
    with pytest.raises(ValueError):
        C.decode_jpeg(enc[:-20])  # truncated entropy stream
    with pytest.raises(ValueError, match="not a JPEG"):
        C.decode_jpeg(b"RIFF....")
    with pytest.raises(ValueError, match="subsampling"):
        C.encode_jpeg_baseline(arr, subsampling="4:1:1")


def test_jpeg_decode_image_dispatch_and_resize_reencode():
    arr = np.repeat(np.repeat(np.array(
        [[[200, 30, 90]], [[10, 220, 120]]], dtype=np.uint8), 16, axis=0), 32, axis=1)
    enc = C.encode_jpeg_baseline(arr, quality=92)
    fmt, dec = C.decode_image(enc)
    assert fmt == "jpeg" and dec.shape == arr.shape
    assert np.abs(dec.astype(int) - arr.astype(int)).max() <= 4
    # encode_image dispatch
    re = C.encode_image(dec, "jpeg")
    assert C.jpeg_meta(re) == (32, 32)


def test_jpeg_progressive_decodes_bit_identical_to_baseline():
    """SOF2 progressive decode (T.81 Annex G: spectral selection +
    successive approximation, DC and AC refinement): the progressive
    encoder quantizes identically to the baseline encoder, so decode
    must match the baseline decode BIT-FOR-BIT. Noise exercises dense-
    coefficient refinement; flat/gradient content exercises EOB runs."""
    rng = np.random.RandomState(3)
    cases = [
        rng.randint(0, 256, (33, 41, 3)).astype(np.uint8),  # dense ACs
        np.full((48, 64, 3), 130, np.uint8),  # all-zero ACs: max EOB runs
    ]
    s = (np.arange(40)[:, None] // 8 * 29 + np.arange(56)[None, :] // 8 * 13) % 256
    cases.append(np.stack([s, s, s], axis=2).astype(np.uint8))  # sparse
    for arr in cases:
        for sub in ("4:4:4", "4:2:2", "4:2:0"):
            for q in (10, 90):
                base = C.decode_jpeg(
                    C.encode_jpeg_baseline(arr, quality=q, subsampling=sub)
                )
                prog_bytes = C.encode_jpeg_progressive(
                    arr, quality=q, subsampling=sub
                )
                assert C.jpeg_meta(prog_bytes) == (arr.shape[1], arr.shape[0])
                assert np.array_equal(C.decode_jpeg(prog_bytes), base), (
                    arr.shape, sub, q,
                )


def test_jpeg_progressive_is_really_sof2():
    p = C.encode_jpeg_progressive(np.zeros((8, 8, 3), np.uint8))
    assert b"\xff\xc2" in p and b"\xff\xc0" not in p
    # six+ scans: DC first, 6 AC firsts, 6 AC refines, DC refine
    assert p.count(b"\xff\xda") == 14


def test_mjpeg_avi_real_pixel_frames_roundtrip():
    """MJPEG AVI built from REAL baseline-encoded frames: every frame
    decodes back through avi_frames + decode_jpeg to its source pixels
    (flat-block content, quality 95 → tight bound)."""
    rng = np.random.default_rng(5)
    frames_px = [
        np.repeat(np.repeat(rng.integers(0, 256, (3, 4, 3), dtype=np.uint8), 8, 0), 8, 1)
        for _ in range(4)
    ]
    jpegs = [C.encode_jpeg_baseline(f, quality=95) for f in frames_px]
    avi = C.encode_mjpeg_avi(32, 24, 10, jpegs)
    assert C.avi_meta(avi) == (32, 24, 10, 4)
    got = C.avi_frames(avi)
    assert [(i, k) for i, k, _ in got] == [(i, "dc") for i in range(4)]
    for (_, _, body), src in zip(got, frames_px):
        dec = C.decode_jpeg(body)
        assert dec.shape == (24, 32, 3)
        assert np.abs(dec.astype(int) - src.astype(int)).mean() < 3.0


def test_aac_adts_meta_contract_cycle():
    """Round-trip the full synth id cycle (both header widths, all 13
    frequency indexes, profiles, channel configs) and check duration
    arithmetic against the 1024-samples-per-raw-block rule."""
    for mid in range(60):
        rate = C._ADTS_RATES[mid % 13]
        ch = 1 + mid % 7
        prof = ("main", "lc", "ssr")[mid % 3]
        nf = 1 + mid % 40
        crc = mid % 4 == 0
        p = C.encode_adts_frames(nf, rate, ch, profile=prof, crc=crc)
        assert C.aac_adts_meta(p) == (
            prof, rate, ch, nf, nf * 1024 * 1000 // rate, crc
        )


def test_aac_adts_meta_rejects_malformed():
    good = C.encode_adts_frames(3, 44100, 2)
    with pytest.raises(ValueError, match="sync"):
        C.aac_adts_meta(b"\x00" + good)
    with pytest.raises(ValueError, match="truncated"):
        C.aac_adts_meta(good[:-4])
    with pytest.raises(ValueError, match="no frames"):
        C.aac_adts_meta(b"")
    # reserved frequency index 13 (0b1101 in bits 2-5 of byte 2)
    buf = bytearray(good)
    buf[2] = (buf[2] & 0xC3) | (13 << 2)
    with pytest.raises(ValueError, match="frequency index"):
        C.aac_adts_meta(bytes(buf))
    # channel-config 0 (PCE-carried layout)
    buf = bytearray(good)
    buf[2] &= 0xFE
    buf[3] &= 0x3F
    with pytest.raises(ValueError, match="PCE"):
        C.aac_adts_meta(bytes(buf))
    # layer bits must be 00
    buf = bytearray(good)
    buf[1] |= 0x06
    with pytest.raises(ValueError, match="layer"):
        C.aac_adts_meta(bytes(buf))
    # parameter change mid-stream: splice a 48 kHz frame after 44.1 kHz
    other = C.encode_adts_frames(1, 48000, 2)
    with pytest.raises(ValueError, match="mid-stream"):
        C.aac_adts_meta(good + other)


def test_webm_meta_contract_cycle():
    """Round-trip the synth id cycle: both doctypes, all timescales,
    video-first and audio-only track layouts, integer duration-ms
    arithmetic through the float Duration element."""
    for mid in range(60):
        ts = (1_000_000, 500_000, 2_000_000, 100_000)[mid % 4]
        ticks = 1000 * (1 + mid % 30) + mid % 97
        ntr = 1 + mid % 3
        audio_only = mid % 4 == 1
        w, h = 160 + 8 * (mid % 120), 120 + 8 * (mid % 68)
        vc = ("V_VP8", "V_VP9", "V_AV1")[(mid % 5) % 3]
        tracks = []
        if not audio_only:
            tracks.append(
                {"handler": "vide", "codec": vc, "width": w, "height": h}
            )
        while len(tracks) < ntr:
            tracks.append({"handler": "soun", "codec": "A_OPUS"})
        dt = ("webm", "matroska")[mid % 2]
        p = C.encode_webm_headers(dt, ts, ticks, tracks)
        want = (
            dt, ts, ticks * ts // 1_000_000, ntr,
            None if audio_only else w,
            None if audio_only else h,
            None if audio_only else vc,
        )
        assert C.webm_meta(p) == want, mid


def test_webm_meta_rejects_malformed():
    good = C.encode_webm_headers(
        "webm", 1_000_000, 1234,
        [{"handler": "vide", "codec": "V_VP9", "width": 64, "height": 48}],
    )
    with pytest.raises(ValueError, match="EBML"):
        C.webm_meta(b"\x00\x00\x00\x00")
    with pytest.raises(ValueError, match="header"):
        C.webm_meta(b"\x1aEx" + good[3:])
    # truncation inside the Segment
    with pytest.raises(ValueError, match="overrun|truncated"):
        C.webm_meta(good[:-6])
    # unknown-size sentinel on the Segment size vint (1-byte 0xFF)
    seg_at = good.index(bytes.fromhex("18538067"))
    buf = bytearray(good)
    buf[seg_at + 4] = 0xFF
    with pytest.raises(ValueError, match="unknown-size|overrun"):
        C.webm_meta(bytes(buf))
    # a header without DocType
    no_doctype = C._ebml_elt(0x1A45DFA3, b"") + good[good.index(
        bytes.fromhex("18538067")
    ):]
    with pytest.raises(ValueError, match="DocType"):
        C.webm_meta(no_doctype)
    # Duration element of invalid width (5 bytes) — composed bottom-up
    # so every parent size stays consistent (a bytes.replace would
    # desynchronize the Info/Segment lengths and fail earlier)
    header = C._ebml_elt(0x1A45DFA3, C._ebml_elt(0x4282, b"webm"))
    info = C._ebml_elt(
        0x1549A966, C._ebml_elt(0x4489, b"\x00\x00\x00\x00\x00")
    )
    bad_dur = header + C._ebml_elt(
        0x18538067, info + C._ebml_elt(0x1654AE6B, b"")
    )
    with pytest.raises(ValueError, match="width"):
        C.webm_meta(bad_dur)


def test_webp_meta_contract_cycle():
    """Round-trip the synth id cycle across all three WebP container
    forms (lossy has no alpha bit; animation only on extended)."""
    for mid in range(45):
        fmt = ("lossy", "lossless", "extended")[mid % 3]
        w, h = 16 + (mid % 120) * 8, 16 + (mid % 68) * 8
        alpha = mid % 2 == 0 and fmt != "lossy"
        anim = fmt == "extended" and mid % 5 == 0
        p = C.encode_webp_headers(fmt, w, h, alpha=alpha, animation=anim)
        assert C.webp_meta(p) == (fmt, w, h, alpha, anim), mid


def test_webp_meta_rejects_malformed():
    good = C.encode_webp_headers("lossy", 64, 48)
    with pytest.raises(ValueError, match="not a WebP"):
        C.webp_meta(b"RIFX" + good[4:])
    with pytest.raises(ValueError, match="overrun"):
        C.webp_meta(good[:-6])
    # non-keyframe first frame (tag bit 0 set)
    buf = bytearray(good)
    buf[20] |= 0x01
    with pytest.raises(ValueError, match="keyframe"):
        C.webp_meta(bytes(buf))
    # broken VP8 start code
    buf = bytearray(good)
    buf[23] = 0x00
    with pytest.raises(ValueError, match="start code"):
        C.webp_meta(bytes(buf))
    # VP8L version bits must be zero
    lossless = bytearray(C.encode_webp_headers("lossless", 64, 48))
    lossless[21 + 3] |= 0xE0  # top 3 bits of the packed LE word
    with pytest.raises(ValueError, match="version"):
        C.webp_meta(bytes(lossless))
    with pytest.raises(ValueError, match="unsupported WebP chunk"):
        bad = bytearray(good)
        bad[12:16] = b"ALPH"
        C.webp_meta(bytes(bad))


def test_ogg_opus_meta_contract_cycle():
    """Round-trip the synth id cycle: page counts include both header
    pages, duration = (final granule - pre-skip) at the fixed 48 kHz
    granule rate regardless of the input sample rate."""
    for mid in range(40):
        ch = 1 + mid % 8
        ps = 312 + mid % 100
        ir = (48000, 44100, 16000, 8000)[mid % 4]
        npg = 1 + mid % 9
        samp = 48000 * (1 + mid % 10) + mid % 997
        p = C.encode_ogg_opus(ch, ps, ir, npg, samp)
        assert C.ogg_opus_meta(p) == (
            ch, ps, ir, npg + 2, samp * 1000 // 48000
        ), mid


def test_ogg_opus_meta_rejects_malformed():
    good = C.encode_ogg_opus(2, 100, 48000, 2, 48000)
    with pytest.raises(ValueError, match="capture pattern"):
        C.ogg_opus_meta(b"OggX" + good[4:])
    with pytest.raises(ValueError, match="overrun|truncated"):
        C.ogg_opus_meta(good[:-3])
    with pytest.raises(ValueError, match="no pages"):
        C.ogg_opus_meta(b"")
    # stream-structure version must be 0
    buf = bytearray(good)
    buf[4] = 1
    with pytest.raises(ValueError, match="version"):
        C.ogg_opus_meta(bytes(buf))
    # a first packet that is not OpusHead (e.g. Vorbis) quarantines
    vorbis = bytearray(good)
    head_at = vorbis.index(b"OpusHead")
    vorbis[head_at : head_at + 8] = b"\x01vorbis\x00"
    with pytest.raises(ValueError, match="OpusHead"):
        C.ogg_opus_meta(bytes(vorbis))
    # OpusHead version must be 1
    buf = bytearray(good)
    buf[buf.index(b"OpusHead") + 8] = 9
    with pytest.raises(ValueError, match="version 9"):
        C.ogg_opus_meta(bytes(buf))


def test_sniff_container_every_family_and_ambiguity():
    """Magic-byte sniffing routes EVERY encoder's output to its own
    family — including the 0xFF-sync MP3-vs-ADTS ambiguity (layer
    bits) and the three RIFF forms — and quarantines unknown magics."""
    img = np.zeros((8, 8, 3), np.uint8)
    pcm = (np.arange(256) % 251 - 125).astype(np.int16)
    cases = {
        "bmp": C.encode_bmp(img),
        "png": C.encode_png(img),
        "gif": C.encode_gif(img),
        "jpeg": C.encode_jpeg_baseline(img),
        "tiff": C.encode_tiff(img),
        "ppm": C.encode_ppm(img),
        "wav": C.encode_wav(pcm, 8000, 1),
        "avi": C.encode_mjpeg_avi(
            8, 8, 10, [C.encode_jpeg_baseline(img)] * 2
        ),
        "mp3": C.encode_mp3_headers(3, 128, 44100),
        "adts": C.encode_adts_frames(3, 44100, 2),
        "mp4": C.encode_mp4_headers(
            "isom", 600, 1200, [{"handler": "soun", "codec": "mp4a"}]
        ),
        "flac": C.encode_flac_headers(44100, 2, 16, 44100),
        "webm": C.encode_webm_headers(
            "webm", 1_000_000, 100, [{"handler": "soun", "codec": "A_OPUS"}]
        ),
        "ogg": C.encode_ogg_opus(2, 100, 48000, 1, 4800),
        "webp": C.encode_webp_headers("lossy", 64, 48),
    }
    for fam, payload in cases.items():
        assert C.sniff_container(payload) == fam, fam
    # an ID3-prefixed MP3 still sniffs as mp3
    assert C.sniff_container(
        C.encode_mp3_headers(3, 128, 44100, id3_title="x")
    ) == "mp3"
    # r13: PDF documents route to the text lane
    from etl_excel_csv_sql_spark.operators import pdf as _pdf

    assert C.sniff_container(_pdf.encode_pdf([["x"]])) == "pdf"
    for bad in (b"", b"zz", b"\x00\x01\x02\x03", b"RIFF1234ZZZZ",
                b"\xff\xf7garbage"):
        with pytest.raises(ValueError):
            C.sniff_container(bad)


def test_r12_review_fixes_codecs():
    """Pins for the r12 review catches: (a) song-length ADTS streams
    parse (the borrowed 10k walk cap quarantined ~4-minute clips),
    (b) chained/concatenated Ogg quarantines instead of reporting the
    first stream's params over the second stream's granules,
    (c) fractional Matroska Duration ticks scale BEFORE truncation,
    (d) encode_adts_frames rejects bodies that overflow the 13-bit
    frame-length field instead of corrupting byte 3."""
    long_adts = C.encode_adts_frames(10_500, 44100, 2)
    prof, rate, ch, nf, dur, crc = C.aac_adts_meta(long_adts)
    assert nf == 10_500 and dur == 10_500 * 1024 * 1000 // 44100

    a = C.encode_ogg_opus(2, 100, 48000, 2, 48000)
    b = C.encode_ogg_opus(6, 900, 24000, 3, 480000)
    with pytest.raises(ValueError, match="chained|serial|bos"):
        C.ogg_opus_meta(a + b)

    header = C._ebml_elt(0x1A45DFA3, C._ebml_elt(0x4282, b"webm"))
    info = C._ebml_elt(
        0x1549A966,
        C._ebml_elt(0x2AD7B1, (1_000_000_000).to_bytes(4, "big"))
        + C._ebml_elt(0x4489, struct.pack(">d", 1.9)),
    )
    frac = header + C._ebml_elt(
        0x18538067, info + C._ebml_elt(0x1654AE6B, b"")
    )
    assert C.webm_meta(frac)[2] == 1900  # was 1000 under int(ticks)*scale

    with pytest.raises(ValueError, match="13-bit"):
        C.encode_adts_frames(1, 44100, 2, body_bytes=8200)


def test_mvhd_v1_truncated_body_quarantines():
    """r12 review catch: a version-1 mvhd whose body stops mid-duration
    (28-31 bytes) must raise, not read 4 bytes of the NEXT box's header
    into the 64-bit duration (observed as a ~248-day clip)."""
    import struct as _s

    p = C.encode_mp4_headers(
        "avc1", 600, 1200,
        [{"handler": "vide", "codec": "hev1", "width": 16, "height": 16}],
    )
    ftyp = p[: p.index(b"moov") - 4]
    # v1 body cut to 28 bytes: version/flags + 8+8 (times) + 4 (scale)
    # — the 8-byte duration is missing
    cut_body = _s.pack(">B3x QQ I", 1, 0, 0, 1000)
    cut = _s.pack(">I", 8 + len(cut_body)) + b"mvhd" + cut_body
    # a sibling box right after supplies the bytes the old bound read
    sibling = _s.pack(">I", 16) + b"free" + bytes(8)
    moov = _s.pack(">I", 8 + len(cut) + len(sibling)) + b"moov" + cut + sibling
    with pytest.raises(ValueError, match="mvhd v1 truncated"):
        C.mp4_meta(ftyp + moov)
    # intact v1 still parses
    ok_body = _s.pack(">B3x QQ I Q", 1, 0, 0, 1000, 3750)
    ok = _s.pack(">I", 8 + len(ok_body)) + b"mvhd" + ok_body
    moov = _s.pack(">I", 8 + len(ok)) + b"moov" + ok
    assert C.mp4_meta(ftyp + moov)[:4] == ("avc1", 1000, 3750, 0)
