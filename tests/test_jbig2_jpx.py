"""JBIG2 (T.88) and JPEG-2000-header kernels + their in-PDF wiring.

Reference parity: the reference reaches embedded bilevel/JPX figures
through fitz pixmaps (parsers/dots_ocr/__main__.py:111-118); here the
JBIG2 generic-region profile decodes from scratch (kernels/jbig2) and
JPXDecode degrades to decoded=False WITH true dims read from the
stream's own SIZ/ihdr headers (kernels/jpx) — VERDICT r5 items 5/10.
"""

import numpy as np
import pytest

from pdf_parse_bench_spark.kernels.jbig2 import (
    _TEMPLATES,
    _decode_generic,
    _encode_generic,
    jbig2_decode,
    jbig2_dims,
    jbig2_encode,
)
from pdf_parse_bench_spark.kernels.jpx import jpx_dims
from tests.test_pdftext import _mini_pdf


def test_mq_generic_region_roundtrip_all_templates():
    """The MQ coder pair + generic-region templates 0-3, with and
    without TPGDON, over varied densities and non-multiple-of-8 dims:
    decode(encode(bm)) must be bit-exact."""
    rng = np.random.default_rng(20260817)
    for template in (0, 1, 2, 3):
        for tpgdon in (False, True):
            for _ in range(3):
                h = int(rng.integers(5, 40))
                w = int(rng.integers(5, 70))
                bm = (rng.random((h, w)) < rng.random()).astype(np.uint8)
                if h > 6:  # duplicate rows exercise TPGDON copy rows
                    bm[5] = bm[4]
                at = _TEMPLATES[template][1]
                body = _encode_generic(bm, template, at, tpgdon)
                out = _decode_generic(body, w, h, template, at, tpgdon)
                assert np.array_equal(out, bm), (template, tpgdon)


def test_jbig2_embedded_format_mq_and_mmr():
    """Embedded-format stream (page info + immediate generic region +
    end-of-page): dims from the headers, decode bit-exact, for both the
    MQ and the MMR (T.6-inside-JBIG2) coding paths."""
    img = np.full((16, 40), 255, np.uint8)
    img[3:9, 5:30] = 0
    img[12:14, 0:40:2] = 0
    for mmr in (False, True):
        data = jbig2_encode(img, mmr=mmr)
        assert jbig2_dims(data) == (40, 16)
        assert np.array_equal(jbig2_decode(data), img), mmr


def test_jbig2_out_of_profile_raises_but_dims_survive():
    """A symbol-dictionary segment (type 0) is outside the generic-
    region decode profile -> ValueError; jbig2_dims still reads the
    page-info dims — the degradation row's real-geometry contract."""
    from pdf_parse_bench_spark.kernels.jbig2 import _segment
    import struct

    page_info = struct.pack(">IIII", 123, 45, 0, 0) + b"\x01\x00\x00"
    data = (_segment(0, 48, 1, page_info)
            + _segment(1, 0, 1, b"\x00" * 12)   # symbol dictionary
            + _segment(2, 49, 1, b""))
    assert jbig2_dims(data) == (123, 45)
    with pytest.raises(ValueError):
        jbig2_decode(data)


def test_jpx_dims_raw_codestream_and_jp2_box():
    """SIZ (raw J2K) and ihdr (JP2 container) both yield the true dims;
    non-JPX bytes raise."""
    from pdf_parse_bench_spark.fixtures import _mk_jpx_stub

    for jp2 in (False, True):
        data = _mk_jpx_stub(97, 55, jp2=jp2)
        assert jpx_dims(data) == (97, 55, 3), jp2
    with pytest.raises(ValueError):
        jpx_dims(b"\x89PNG\r\n\x1a\nnot a jp2 stream....")
    with pytest.raises(ValueError):
        jpx_dims(b"")


def _image_pdf(objs_img: bytes, name: bytes, w: int, h: int,
               place: bytes) -> bytes:
    body = (b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (Cap.) Tj ET\n" + place)
    return _mini_pdf([
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 "
        b"/MediaBox [0 0 595 842] /Resources << "
        b"/Font << /F1 6 0 R >> /XObject << /" + name + b" 4 0 R >> >>"
        b" >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>",
        objs_img,
        b"<< /Length %d >>\nstream\n%s\nendstream" % (len(body), body),
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ])


def test_embedded_jbig2_image_stats_and_raster():
    """A /JBIG2Decode Image XObject decodes inside the PDF:
    pdf_image_stats reports the true bilevel dims + mean, and the
    rasterizer inks the decoded pixels (ink present inside the figure
    rect)."""
    from pdf_parse_bench_spark.kernels.pdftext import (
        pdf_image_stats, rasterize_pdf)

    img = np.full((20, 48), 255, np.uint8)
    img[2:18, 4:44] = 0
    data = jbig2_encode(img, mmr=False, template=0, tpgdon=True)
    xobj = (b"<< /Type /XObject /Subtype /Image /Width 48 /Height 20 "
            b"/ColorSpace /DeviceGray /BitsPerComponent 1 "
            b"/Filter /JBIG2Decode /Length %d >>\nstream\n%s\nendstream"
            % (len(data), data))
    pdf = _image_pdf(xobj, b"ImB", 48, 20,
                     b"q 192 0 0 80 100 400 cm /ImB Do Q")
    rows = pdf_image_stats(pdf)
    assert len(rows) == 1
    r = rows[0]
    assert r["decoded"] and (r["px_w"], r["px_h"]) == (48, 20)
    exp_mean = float(img.astype(np.float64).mean()) / 255.0
    assert r["mean_intensity"] == pytest.approx(exp_mean, abs=1e-6)
    # raster: the placed rect (100..292 x, y_top 362..442) must carry ink
    (_pg, _png, w_px, h_px, ink), = list(rasterize_pdf(pdf))
    assert ink > 0.02  # mostly-black 192x80 rect on a 595x842 page


def test_embedded_jpx_degrades_with_true_dims():
    """A /JPXDecode Image XObject is out of decode profile: the stats
    row is decoded=False with NULL mean, but px_w/px_h carry the TRUE
    dims read from the stream's headers — and deliberately NOT the PDF
    dict's (lying) /Width //Height claim."""
    from pdf_parse_bench_spark.fixtures import _mk_jpx_stub
    from pdf_parse_bench_spark.kernels.pdftext import pdf_image_stats

    for jp2 in (False, True):
        data = _mk_jpx_stub(80, 64, jp2=jp2)
        # dict claims 999x999 — the data's own headers must win
        xobj = (b"<< /Type /XObject /Subtype /Image /Width 999 "
                b"/Height 999 /ColorSpace /DeviceRGB /BitsPerComponent 8 "
                b"/Filter /JPXDecode /Length %d >>\nstream\n%s\nendstream"
                % (len(data), data))
        pdf = _image_pdf(xobj, b"ImX", 80, 64,
                         b"q 160 0 0 128 80 300 cm /ImX Do Q")
        rows = pdf_image_stats(pdf)
        assert len(rows) == 1
        r = rows[0]
        assert not r["decoded"]
        assert (r["px_w"], r["px_h"]) == (80, 64), jp2
        assert r["mean_intensity"] is None


def test_jbig2_offpage_region_clips():
    """T.88 permits a region extending past the page: the composite must
    clip instead of raising (ADVICE r6)."""
    import numpy as np
    import struct
    from pdf_parse_bench_spark.kernels import jbig2 as J

    img = np.full((8, 8), 255, dtype=np.uint8)
    img[1::2, ::2] = 0
    data = J.jbig2_encode(img, mmr=True)
    # shrink the page-info dims so the 8x8 region overhangs a 6x5 page:
    # page info payload starts right after the 11-byte segment header of
    # segment 1 (the page-information segment, type 48)
    idx = data.index(struct.pack(">II", 8, 8))
    patched = data[:idx] + struct.pack(">II", 5, 6) + data[idx + 8:]
    out = J.jbig2_decode(patched)
    assert out.shape == (6, 5)
    ref = ((1 - (img[:6, :5] == 0).astype(np.uint8)) * 255).astype(np.uint8)
    assert (out == ref).all()


def test_jbig2_mq_budget_guard():
    """Generic regions above the MQ pixel budget degrade via ValueError
    (dims-only rows downstream), never a minutes-long per-pixel loop."""
    import pytest
    from pdf_parse_bench_spark.kernels import jbig2 as J

    with pytest.raises(ValueError, match="MQ decode budget"):
        J._decode_generic(b"", 4096, 4096, 0, [(3, -1), (-3, -1), (2, -2),
                                               (-2, -2)], False)
