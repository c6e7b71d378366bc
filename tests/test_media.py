"""Multimodal tests: metadata extraction is pure column expressions; the
decode stage is a REAL stdlib PNG codec (kernels/png.py) run in Arrow
batches — round-trips, all five scanline filters, and failure isolation."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from pdf_parse_bench_spark.kernels.png import decode_png, encode_png
from pdf_parse_bench_spark.operators.media import decode_media, media_features


def test_media_features_parse_geometry(spark, fx_smoke):
    spans = spark.read.parquet(str(fx_smoke / "golden_spans.parquet"))
    feats = media_features(spans)
    row = feats.first()
    assert row.media_ref == f"page_{row.x}_{row.y}_{row.w}_{row.h}.png"
    assert row.area == row.w * row.h
    assert feats.where(F.col("w") <= 0).isEmpty()


def test_png_roundtrip_gray_and_rgb():
    rng = np.random.default_rng(3)
    gray = rng.integers(0, 256, (17, 23), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(gray)), gray)
    rgb = rng.integers(0, 256, (11, 9, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(rgb)), rgb)
    rgba = rng.integers(0, 256, (6, 7, 4), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(rgba)), rgba)


def test_png_decode_all_filters():
    """Decode Average(3) and Paeth(4) rows, which our encoder never emits —
    build the IDAT by hand so the decoder's filter coverage is real."""
    import struct
    import zlib
    from pdf_parse_bench_spark.kernels.png import _SIG, _chunk

    w, h = 4, 5
    img = (np.arange(w * h, dtype=np.uint8).reshape(h, w) * 7) % 256
    raw = bytearray()
    prev = np.zeros(w, np.int32)
    for y, ft in enumerate([0, 1, 2, 3, 4]):
        row = img[y].astype(np.int32)
        out = np.zeros(w, np.int32)
        for i in range(w):
            a = int(row[i - 1]) if i >= 1 else 0
            b = int(prev[i])
            c = int(prev[i - 1]) if i >= 1 else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out[i] = (int(row[i]) - pred) % 256
        raw.append(ft)
        raw += out.astype(np.uint8).tobytes()
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    png = (_SIG + _chunk(b"IHDR", ihdr)
           + _chunk(b"IDAT", zlib.compress(bytes(raw))) + _chunk(b"IEND", b""))
    assert np.array_equal(decode_png(png), img)


def test_decode_media_real_png_batches(spark):
    from pdf_parse_bench_spark.fixtures import _mk_jpeg_bytes

    img1 = np.full((4, 6), 255, dtype=np.uint8)          # all-white gray
    img2 = np.zeros((3, 5, 3), dtype=np.uint8)           # all-black RGB
    df = spark.createDataFrame(
        [("d1", 0, "a.png", bytearray(encode_png(img1))),
         ("d2", 1, "b.png", bytearray(encode_png(img2))),
         ("d3", 2, "c.jpg", bytearray(_mk_jpeg_bytes(640, 480, 3))),
         ("d4", 3, "junk.png", bytearray(b"not a png"))],
        "doc_id string, offset int, media_ref string, media_bytes binary",
    )
    out = {r.media_ref: r for r in decode_media(df).collect()}
    a = out["a.png"]
    assert (a.width, a.height, a.channels, a.mean_intensity, a.status) == (
        6, 4, 1, 1.0, "ok")
    b = out["b.png"]
    assert (b.width, b.height, b.channels, b.mean_intensity, b.status) == (
        5, 3, 3, 0.0, "ok")
    c = out["c.jpg"]  # JPEG: SOF metadata, no pixel decode
    assert (c.width, c.height, c.channels, c.status) == (
        640, 480, 3, "metadata_only")
    assert c.mean_intensity is None
    # X4 + error-image fallback: corrupt payload gets the DETERMINISTIC
    # placeholder artifact stats, never all-null, never a task abort
    j = out["junk.png"]
    assert j.status == "decode_error" and j.n_bytes == 9
    assert (j.width, j.height, j.channels) == (64, 64, 1)
    assert j.mean_intensity is not None


def test_jpeg_dims_progressive_and_malformed():
    from pdf_parse_bench_spark.fixtures import _mk_jpeg_bytes
    from pdf_parse_bench_spark.kernels.jpeg import jpeg_dims

    import pytest
    # SOF2 (progressive) parses the same frame header
    jpg = bytearray(_mk_jpeg_bytes(123, 45, 1))
    sof = jpg.index(b"\xff\xc0")
    jpg[sof + 1] = 0xC2
    assert jpeg_dims(bytes(jpg)) == (123, 45, 1)
    with pytest.raises(ValueError):
        jpeg_dims(b"\xff\xd8\xff\xd9")  # SOI+EOI, no frame
    with pytest.raises(ValueError):
        jpeg_dims(b"GIF89a....")


def test_decode_media_matches_fixture_golden(spark, fx_smoke):
    files = spark.read.parquet(str(fx_smoke / "media_files.parquet"))
    golden = spark.read.parquet(str(fx_smoke / "golden_media_stats.parquet"))
    got = decode_media(files)
    assert got.exceptAll(golden).isEmpty()
    assert golden.exceptAll(got).isEmpty()


def test_render_formula_artifacts_ok_and_error(spark):
    """S7 render sink: valid formulas get glyph-box PNGs with closed-form
    geometry; invalid ones (unbalanced brace, empty inner) get the
    deterministic placeholder with status='render_error' — and every
    png_bytes round-trips through the real decoder."""
    from pdf_parse_bench_spark.operators.media import (
        error_placeholder, render_formula_artifacts)

    rows = [("d1", 0, "$x_{1}^{2}$"),      # inner = 'x_{1}^{2}' (9 chars)
            ("d1", 1, "$x_{1$"),           # unbalanced brace
            ("d2", 0, "$$   $$")]          # empty inner
    df = spark.createDataFrame(
        rows, "doc_id string, offset int, formula string")
    out = {(r.doc_id, r.offset): r
           for r in render_formula_artifacts(df).collect()}
    ok = out[("d1", 0)]
    assert ok.status == "ok"
    assert (ok.width, ok.height) == (8 + 6 * 9, 20)
    img = decode_png(bytes(ok.png_bytes))
    assert img.shape == (20, 62)
    assert (img == 40).sum() == 72 * 9  # 9 non-space glyph boxes
    for key in (("d1", 1), ("d2", 0)):
        err = out[key]
        assert err.status == "render_error"
        assert (err.width, err.height) == (64, 64)
        assert np.array_equal(decode_png(bytes(err.png_bytes)),
                              error_placeholder())


def test_jpeg_decode_gray_flat_block_exact():
    """Baseline grayscale decode is bit-exact for flat-block content with
    an all-ones quant table (DC = 8*(v-128) exactly; zero AC): the fixture
    encoder and the kernel decoder must roundtrip every pixel, including
    non-multiple-of-8 edge cropping."""
    import numpy as np

    from pdf_parse_bench_spark.fixtures import _mk_gray_jpeg
    from pdf_parse_bench_spark.kernels.jpeg import jpeg_decode_gray, jpeg_dims

    rng = np.random.default_rng(20260816)
    for _ in range(10):
        bh, bw = int(rng.integers(1, 5)), int(rng.integers(1, 5))
        blocks = rng.integers(0, 256, (bh, bw))
        w = bw * 8 - int(rng.integers(0, 8))
        h = bh * 8 - int(rng.integers(0, 8))
        data = _mk_gray_jpeg(blocks, w, h)
        img = jpeg_decode_gray(data)
        expect = np.repeat(np.repeat(blocks, 8, 0), 8, 1)[:h, :w]
        assert img.shape == (h, w)
        assert (img == expect).all()
        assert jpeg_dims(data) == (w, h, 1)


def test_jpeg_decode_gray_ac_runlength_and_zrl():
    """AC path: hand-assemble a one-block scan carrying AC coefficients
    (with a >16 zero run forcing ZRL and a negative value exercising
    EXTEND), using a test-local Huffman table; expected pixels computed by
    an independent textbook IDCT double loop (ISO 10918-1 A.3.3), not the
    kernel's basis matrix."""
    import numpy as np

    from pdf_parse_bench_spark.fixtures import _JpegBitWriter
    from pdf_parse_bench_spark.kernels.jpeg import _ZIGZAG, jpeg_decode_gray

    # quantized zigzag-position coefficients: DC then sparse AC
    coefs = {0: 40, 3: -5, 5: 7, 28: -12, 50: 3}  # pos 29..49 run = ZRL+4
    # canonical tables: DC cats 0..11 at len 4; AC symbols all at len 6
    ac_syms = [0x00, 0xF0]  # EOB, ZRL
    # (run,size) symbols in stream order
    def cat(v):
        return abs(v).bit_length()
    stream = []
    pos = sorted(k for k in coefs if k > 0)
    prev = 0
    for p in pos:
        run = p - prev - 1
        while run > 15:
            stream.append(("ZRL", None))
            run -= 16
        sym = (run << 4) | cat(coefs[p])
        if sym not in ac_syms:
            ac_syms.append(sym)
        stream.append((sym, coefs[p]))
        prev = p
    stream.append(("EOB", None))
    ac_counts = [0] * 16
    ac_counts[5] = len(ac_syms)  # all AC codes at length 6
    ac_code = {s: i for i, s in enumerate(sorted(ac_syms))}

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + (67).to_bytes(2, "big") + b"\x00" + bytes(
        [(i % 7) + 1 for i in range(64)])  # non-trivial quant table
    out += (b"\xff\xc0" + (11).to_bytes(2, "big") + b"\x08"
            + (8).to_bytes(2, "big") + (8).to_bytes(2, "big")
            + bytes([1, 0x01, 0x11, 0x00]))
    out += (b"\xff\xc4" + (19 + 12).to_bytes(2, "big") + b"\x00"
            + bytes([0, 0, 0, 12] + [0] * 12) + bytes(range(12)))
    out += (b"\xff\xc4" + (19 + len(ac_syms)).to_bytes(2, "big") + b"\x10"
            + bytes(ac_counts) + bytes(sorted(ac_syms)))
    out += b"\xff\xda" + (8).to_bytes(2, "big") + bytes([1, 0x01, 0x00, 0, 63, 0])
    bw = _JpegBitWriter()
    t = cat(coefs[0])
    bw.write(t, 4)
    bw.write(coefs[0] if coefs[0] >= 0 else coefs[0] + (1 << t) - 1, t)
    for sym, val in stream:
        if sym == "ZRL":
            bw.write(ac_code[0xF0], 6)
            continue
        if sym == "EOB":
            bw.write(ac_code[0x00], 6)
            continue
        bw.write(ac_code[sym], 6)
        s = sym & 0x0F
        bw.write(val if val >= 0 else val + (1 << s) - 1, s)
    out += bw.flush() + b"\xff\xd9"

    img = jpeg_decode_gray(bytes(out))

    # independent reference: dequantize into raster order, textbook IDCT
    qt = [(i % 7) + 1 for i in range(64)]
    block = np.zeros((8, 8))
    for zz, v in coefs.items():
        block.flat[_ZIGZAG[zz]] = v * qt[zz]
    ref = np.zeros((8, 8))
    for y in range(8):
        for x in range(8):
            acc = 0.0
            for u in range(8):
                for v_ in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v_ == 0 else 1.0
                    acc += (cu * cv * block[u, v_]
                            * np.cos((2 * x + 1) * v_ * np.pi / 16)
                            * np.cos((2 * y + 1) * u * np.pi / 16))
            ref[y, x] = acc / 4
    expect = np.clip(np.round(ref + 128), 0, 255).astype(np.uint8)
    assert img.shape == (8, 8)
    assert (img == expect).all()


def test_jpeg_decode_color_420_and_444_exact():
    """Baseline COLOR decode: flat-MCU YCbCr JPEGs in both 4:2:0 and
    4:4:4 sampling decode to exactly the generator's expected RGB
    (channels exact under the all-ones quant table; the only arithmetic
    is the shared JFIF/BT.601 conversion spec), including
    non-multiple-of-MCU edge cropping and chroma upsampling."""
    import numpy as np

    from pdf_parse_bench_spark.fixtures import _mk_color_jpeg
    from pdf_parse_bench_spark.kernels.jpeg import jpeg_decode, jpeg_dims

    rng = np.random.default_rng(42)
    for subsample in (True, False):
        mcu = 16 if subsample else 8
        bh, bw = 2, 3
        y = rng.integers(0, 256, (bh, bw))
        cb = rng.integers(0, 256, (bh, bw))
        cr = rng.integers(0, 256, (bh, bw))
        w, h = bw * mcu - 3, bh * mcu - 5
        data = _mk_color_jpeg(y, cb, cr, w, h, subsample)
        img = jpeg_decode(data)
        assert img.shape == (h, w, 3)
        assert jpeg_dims(data) == (w, h, 3)
        ypx = np.repeat(np.repeat(y, mcu, 0), mcu, 1)[:h, :w].astype(float)
        cbp = np.repeat(np.repeat(cb, mcu, 0), mcu, 1)[:h, :w] - 128.0
        crp = np.repeat(np.repeat(cr, mcu, 0), mcu, 1)[:h, :w] - 128.0
        expect = np.clip(np.round(np.stack([
            ypx + 1.402 * crp,
            ypx - 0.344136 * cbp - 0.714136 * crp,
            ypx + 1.772 * cbp], axis=-1)), 0, 255).astype(np.uint8)
        assert (img == expect).all()


def test_thumbnail_media_matches_fixture_golden(spark, fx_smoke):
    from pdf_parse_bench_spark.operators.media import thumbnail_media

    files = spark.read.parquet(str(fx_smoke / "media_files.parquet"))
    golden = spark.read.parquet(str(fx_smoke / "golden_thumb_stats.parquet"))
    got = thumbnail_media(files)
    assert got.exceptAll(golden).isEmpty()
    assert golden.exceptAll(got).isEmpty()


def test_shrink_pixels_block_average_spec():
    """Hand-computed anchor for the thumbnail arithmetic: a 65x3 gray
    image (k=ceil(65/32)=3) shrinks to 22x1; the last row-cell covers
    only 2 rows (edge cells average existing pixels); k=1 inputs pass
    through untouched."""
    import numpy as np

    from pdf_parse_bench_spark.operators.media import shrink_pixels

    img = np.arange(65 * 3, dtype=np.uint8).reshape(65, 3)
    t = shrink_pixels(img, 32)
    assert t.shape == (22, 1)
    # cell (0,0): rows 0-2, cols 0-2 -> mean of 0..8 = 4
    assert t[0, 0] == 4
    # last cell: rows 63-64, cols 0-2 -> mean of 189..194 = 191.5 -> 192
    assert t[21, 0] == 192
    small = np.full((10, 20, 3), 7, dtype=np.uint8)
    assert shrink_pixels(small, 32) is small


def test_wav_parse_and_audio_features(spark, fx_smoke):
    """WAV kernel: PCM-16 roundtrip (hand-built samples -> parse ->
    identical array + metadata), float-format metadata_only, truncated
    decode_error; and the audio_features operator matches the fixture
    golden for every audio row."""
    import numpy as np
    import pytest

    from pdf_parse_bench_spark.fixtures import _mk_wav
    from pdf_parse_bench_spark.kernels.wav import parse_wav
    from pdf_parse_bench_spark.operators.media import audio_features

    samples = np.array([[100, -200], [32767, -32768], [0, 5]],
                       dtype=np.int16)
    meta = parse_wav(_mk_wav(16000, samples))
    assert (meta["channels"], meta["sample_rate"], meta["bits"]) == (2, 16000, 16)
    assert meta["n_samples"] == 3 and (meta["samples"] == samples).all()
    f32 = parse_wav(_mk_wav(8000, samples, audio_format=3))
    assert f32["samples"] is None  # metadata-only profile
    with pytest.raises(ValueError):
        parse_wav(b"RIFF\x10\x00\x00\x00WAVEfmt ")

    files = spark.read.parquet(str(fx_smoke / "audio_files.parquet"))
    golden = spark.read.parquet(str(fx_smoke / "golden_audio_stats.parquet"))
    got = audio_features(files)
    assert got.exceptAll(golden).isEmpty()
    assert golden.exceptAll(got).isEmpty()


def test_y4m_parse_and_video_frames(spark, fx_smoke):
    """Y4M kernel roundtrip (synthetic clip -> parse -> identical luma
    planes + header fields, both colorspaces), truncated-payload
    rejection, and operator-vs-golden equality for every video row."""
    import numpy as np
    import pytest

    from pdf_parse_bench_spark.fixtures import _mk_y4m
    from pdf_parse_bench_spark.kernels.y4m import parse_y4m
    from pdf_parse_bench_spark.operators.media import video_frames

    frames = np.arange(2 * 4 * 6, dtype=np.uint8).reshape(2, 4, 6)
    for cs in ("420", "444"):
        v = parse_y4m(_mk_y4m(6, 4, frames, cs))
        assert (v["width"], v["height"], v["n_frames"]) == (6, 4, 2)
        assert v["colorspace"] == cs
        for a, b in zip(v["frames"], frames):
            assert (a == b).all()
    with pytest.raises(ValueError):
        parse_y4m(b"YUV4MPEG2 W8 H8 F25:1 C420\nFRAME\nxx")

    files = spark.read.parquet(str(fx_smoke / "video_files.parquet"))
    golden = spark.read.parquet(str(fx_smoke / "golden_video_stats.parquet"))
    got = video_frames(files)
    assert got.exceptAll(golden).isEmpty()
    assert golden.exceptAll(got).isEmpty()


def test_jpeg_progressive_roundtrip():
    """Progressive (SOF2) profile: five-scan successive-approximation
    streams (DC first/refine, AC first/refine with EOB runs and
    correction bits, EOB tail band) must decode bit-exactly to the
    closed-form IDCT golden, across block grids, edge crops, AC value
    mixes and in-scan restart intervals."""
    import numpy as np

    from pdf_parse_bench_spark.fixtures import (
        _mk_progressive_gray_jpeg_with_stats)
    from pdf_parse_bench_spark.kernels.jpeg import jpeg_decode, jpeg_dims

    for did in range(24):
        data, stats, px = _mk_progressive_gray_jpeg_with_stats(did)
        img = jpeg_decode(data)
        assert img.shape == px.shape
        assert (img == px).all(), f"did={did}"
        assert jpeg_dims(data) == (stats["width"], stats["height"], 1)


def test_jpeg_restart_interval_roundtrip():
    """Baseline DRI/RSTn: the decoder must byte-align at each restart
    marker, verify the 0-7 cycle, and reset DC predictors — wrong
    predictor handling shifts every block after the first marker."""
    import numpy as np

    from pdf_parse_bench_spark.fixtures import _mk_gray_jpeg
    from pdf_parse_bench_spark.kernels.jpeg import jpeg_decode_gray

    rng = np.random.default_rng(20260817)
    for _ in range(8):
        bh, bw = int(rng.integers(2, 5)), int(rng.integers(2, 6))
        blocks = rng.integers(0, 256, (bh, bw))
        w = bw * 8 - int(rng.integers(0, 8))
        h = bh * 8 - int(rng.integers(0, 8))
        ri = int(rng.integers(1, bh * bw + 1))
        data = _mk_gray_jpeg(blocks, w, h, restart_interval=ri)
        img = jpeg_decode_gray(data)
        expect = np.repeat(np.repeat(blocks, 8, 0), 8, 1)[:h, :w]
        assert (img == expect).all()


def test_jpeg_restart_desync_rejected():
    """A restart marker with the wrong 0-7 sequence number must raise
    (silent desync corrupts all later blocks)."""
    import numpy as np
    import pytest

    from pdf_parse_bench_spark.fixtures import _mk_gray_jpeg
    from pdf_parse_bench_spark.kernels.jpeg import jpeg_decode_gray

    blocks = np.arange(6).reshape(2, 3) * 40
    data = bytearray(_mk_gray_jpeg(blocks, 24, 16, restart_interval=1))
    # corrupt the first RSTn (0xFFD0) into RST3 (0xFFD3)
    i = data.find(b"\xff\xd0")
    assert i > 0
    data[i + 1] = 0xD3
    with pytest.raises(ValueError):
        jpeg_decode_gray(bytes(data))


def test_jpeg_422_440_sampling_roundtrip():
    """4:2:2 and 4:4:0 chroma layouts (the remaining common photo
    profiles) decode bit-exactly: flat-MCU encodes vs the closed-form
    BT.601 conversion of the exact channel values."""
    import numpy as np

    from pdf_parse_bench_spark.fixtures import _mk_color_jpeg
    from pdf_parse_bench_spark.kernels.jpeg import jpeg_decode

    for mode, (mw, mh) in (("422", (16, 8)), ("440", (8, 16))):
        bh, bw = 2, 3
        yy, xx = np.mgrid[0:bh, 0:bw]
        y_m = (40 + xx * 30 + yy * 50).astype(np.int64)
        cb_m = (100 + xx * 20).astype(np.int64)
        cr_m = (90 + yy * 25).astype(np.int64)
        w, h = bw * mw - 3, bh * mh - 2
        img = jpeg_decode(_mk_color_jpeg(y_m, cb_m, cr_m, w, h, mode))
        ypx = np.repeat(np.repeat(y_m, mh, 0), mw, 1)[:h, :w].astype(
            np.float64)
        cbpx = np.repeat(np.repeat(cb_m, mh, 0), mw, 1)[:h, :w] - 128.0
        crpx = np.repeat(np.repeat(cr_m, mh, 0), mw, 1)[:h, :w] - 128.0
        exp = np.clip(np.round(np.stack(
            [ypx + 1.402 * crpx,
             ypx - 0.344136 * cbpx - 0.714136 * crpx,
             ypx + 1.772 * cbpx], axis=-1)), 0, 255).astype(np.uint8)
        assert np.array_equal(img, exp), mode


def test_jpeg_cmyk_ycck_roundtrip():
    """4-component Adobe CMYK (transform 0) and YCCK (transform 2)
    streams composite to the exact closed-form RGB: channels are exact
    under the all-ones quant table, so the only arithmetic is the
    documented inverted-CMYK multiplicative composite (plus the BT.601
    step for YCCK)."""
    import numpy as np

    from pdf_parse_bench_spark.fixtures import _mk_cmyk_jpeg_with_stats
    from pdf_parse_bench_spark.kernels.jpeg import jpeg_decode, jpeg_dims

    for did in range(6):  # alternating CMYK / YCCK, varied dims
        data, stats, golden = _mk_cmyk_jpeg_with_stats(did)
        assert jpeg_dims(data)[2] == 4
        img = jpeg_decode(data)
        assert img.shape == golden.shape and img.shape[2] == 3
        assert np.array_equal(img, golden), did


def test_jpeg_cmyk_no_adobe_marker_direct_ink():
    """A 4-component stream WITHOUT the APP14 marker carries direct
    (non-inverted) ink samples: all-zero samples mean no ink -> white."""
    import numpy as np

    from pdf_parse_bench_spark.fixtures import _mk_cmyk_jpeg
    from pdf_parse_bench_spark.kernels.jpeg import jpeg_decode

    z = np.zeros((1, 2), dtype=np.int64)
    data = _mk_cmyk_jpeg(z, z, z, z, 16, 8, transform=0)
    # strip the APP14 segment: marker (2) + 14-byte segment after SOI
    assert data[2:4] == b"\xff\xee"
    stripped = data[:2] + data[18:]
    assert stripped[2:4] == b"\xff\xdb"
    img = jpeg_decode(stripped)
    assert img.shape == (8, 16, 3)
    assert np.array_equal(img, np.full((8, 16, 3), 255, np.uint8))
    # with the marker the same samples are Adobe-inverted: full ink
    assert np.array_equal(jpeg_decode(data),
                          np.zeros((8, 16, 3), np.uint8))
