"""Unit tests for the real-PDF surface of kernels/pdftext.py.

Hand-built minimal PDFs (NOT produced by fixtures.generate_pdf) mirroring
pypdf ``extract_text`` behavior (reference parsers/pypdf/__main__.py:30-32):
TJ arrays with kerning, hex strings, multi-show BT/ET blocks with Td/TD/T*,
octal escapes, nested parens, WinAnsi + /Differences encodings, inherited
MediaBox, /Contents arrays, and the xref-less fallback.
"""

import zlib

from pdf_parse_bench_spark.kernels.pdftext import extract_pdf_text


def _mk_pdf(objs: list[bytes], root: int = 1) -> bytes:
    """Assemble numbered objects + xref + trailer into a PDF byte string."""
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n0000000000 65535 f \n" % (len(objs) + 1)
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (b"trailer\n<< /Size %d /Root %d 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % (len(objs) + 1, root, xref_at))
    return bytes(out)


def _one_page(stream: bytes, font_extra: bytes = b"",
              media: bytes = b"[0 0 595 842]") -> bytes:
    """Catalog + Pages + single Page + content + /F1 font."""
    return _mk_pdf([
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox " + media + b" >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R"
        b" /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length %d >>\nstream\n%s\nendstream" % (len(stream), stream),
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica" + font_extra + b" >>",
    ])


def test_tj_array_kerning_and_hex():
    # kerning <= -150 implies a space; small positive kerning implies nothing
    s = b"BT /F1 12 Tf 1 0 0 1 72 700 Tm [(Hel) 20 (lo) -250 <776F726C64>] TJ ET"
    assert extract_pdf_text(_one_page(s)) == "Hello world"


def test_hex_string_tj_odd_digits():
    # <48656C6C6F> = Hello ; odd-length hex pads trailing 0: <4> -> 0x40 '@'
    s = b"BT /F1 12 Tf 1 0 0 1 72 700 Tm <48656C6C6F> Tj 0 -20 Td <4> Tj ET"
    assert extract_pdf_text(_one_page(s)) == "Hello\n@"


def test_multi_show_td_tdcap_tstar_lines():
    s = (b"BT /F1 12 Tf 1 0 0 1 72 760 Tm (line one) Tj"
         b" 0 -14 TD (line two) Tj T* (line three) Tj"
         b" 0 -14 Td (line four) Tj ET")
    assert extract_pdf_text(_one_page(s)) == "line one\nline two\nline three\nline four"


def test_quote_operators_use_leading():
    s = (b"BT /F1 12 Tf 14 TL 1 0 0 1 72 760 Tm (first) Tj"
         b" (second) ' 1 2 (third) \" ET")
    assert extract_pdf_text(_one_page(s)) == "first\nsecond\nthird"


def test_octal_escapes_nested_parens_continuation():
    s = (b"BT /F1 12 Tf 1 0 0 1 72 760 Tm (\\101\\102C) Tj"
         b" 0 -14 Td (a (nested) paren) Tj"
         b" 0 -14 Td (con\\\ntinued) Tj ET")
    assert extract_pdf_text(_one_page(s)) == "ABC\na (nested) paren\ncontinued"


def test_same_position_shows_concatenate():
    s = b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (Hel) Tj (lo) Tj ET"
    assert extract_pdf_text(_one_page(s)) == "Hello"


def test_winansi_encoding():
    # 0x93/0x94 are curly quotes in cp1252, 0x97 is em dash
    s = b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (\x93quoted\x94 \x97 dash) Tj ET"
    pdf = _one_page(s, font_extra=b" /Encoding /WinAnsiEncoding")
    assert extract_pdf_text(pdf) == "“quoted” — dash"


def test_differences_encoding():
    enc = (b" /Encoding << /BaseEncoding /WinAnsiEncoding"
           b" /Differences [ 128 /bullet /emdash 200 /eacute ] >>")
    s = b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (\x80 item \x81 caf\xc8) Tj ET"
    assert extract_pdf_text(_one_page(s, font_extra=enc)) == "• item — café"


def test_tf_switches_font_encoding():
    pdf = _mk_pdf([
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 595 842] >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R"
        b" /Resources << /Font << /F1 5 0 R /F2 6 0 R >> >> >>",
        b"<< /Length 94 >>\nstream\n"
        b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (\x80) Tj"
        b" /F2 12 Tf 0 -14 Td (\x80) Tj ET\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
        b" /Encoding /WinAnsiEncoding >>",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
        b" /Encoding << /Differences [ 128 /bullet ] >> >>",
    ])
    assert extract_pdf_text(pdf) == "€\n•"  # cp1252 0x80 = €; F2 remaps to •


def test_contents_array_and_indirect_length():
    s1 = b"BT /F1 12 Tf 1 0 0 1 72 760 Tm (part one) Tj ET"
    s2 = b"BT /F1 12 Tf 1 0 0 1 72 740 Tm (part two) Tj ET"
    pdf = _mk_pdf([
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 595 842] >>",
        b"<< /Type /Page /Parent 2 0 R /Contents [4 0 R 6 0 R]"
        b" /Resources << /Font << /F1 7 0 R >> >> >>",
        b"<< /Length 5 0 R >>\nstream\n" + s1 + b"\nendstream",
        b"%d" % len(s1),
        b"<< /Length %d >>\nstream\n%s\nendstream" % (len(s2), s2),
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ])
    assert extract_pdf_text(pdf) == "part one\npart two"


def test_mediabox_letter_and_flate():
    # Letter height 792: y=700 still upper half; decompresses FlateDecode
    raw = b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (letter page) Tj ET"
    z = zlib.compress(raw)
    pdf = _mk_pdf([
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 4 0 R"
        b" /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream" % (len(z), z),
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ])
    assert extract_pdf_text(pdf) == "letter page"


def test_two_column_reading_order():
    # right column higher on page, but XY-cut orders left column first
    s = (b"BT /F1 12 Tf 1 0 0 1 320 760 Tm (R1) Tj 0 -14 Td (R2) Tj ET\n"
         b"BT /F1 12 Tf 1 0 0 1 72 760 Tm (L1) Tj 0 -14 Td (L2) Tj ET")
    assert extract_pdf_text(_one_page(s)) == "L1\nL2\nR1\nR2"


def test_page_tree_order_and_nesting():
    s1 = b"BT /F1 12 Tf 1 0 0 1 72 760 Tm (page A) Tj ET"
    s2 = b"BT /F1 12 Tf 1 0 0 1 72 760 Tm (page B) Tj ET"
    pdf = _mk_pdf([
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R 4 0 R] /Count 2 /MediaBox [0 0 595 842]"
        b" /Resources << /Font << /F1 7 0 R >> >> >>",
        b"<< /Type /Pages /Parent 2 0 R /Kids [5 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 6 0 R >>",
        b"<< /Type /Page /Parent 3 0 R /Contents 8 0 R >>",
        b"<< /Length %d >>\nstream\n%s\nendstream" % (len(s2), s2),
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        b"<< /Length %d >>\nstream\n%s\nendstream" % (len(s1), s1),
    ])
    # nested Pages node (kid 5 = page A) comes first in /Kids order
    assert extract_pdf_text(pdf) == "page A\npage B"


def test_xrefless_fallback_scan():
    body = _one_page(b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (rescued) Tj ET")
    truncated = body[:body.index(b"xref")]  # strip xref + trailer
    assert extract_pdf_text(truncated) == "rescued"


def test_tounicode_cmap_bfchar_and_bfrange():
    """/ToUnicode CMap decode: bfchar singles, bfrange with dst-start
    increment, bfrange with dst array; CMap wins over /Encoding."""
    cmap = (b"/CIDInit /ProcSet findresource begin\n"
            b"begincmap\n1 begincodespacerange <00> <FF> endcodespacerange\n"
            b"3 beginbfchar\n<A0> <03B1>\n<A1> <03B2>\n<A2> <2211>\nendbfchar\n"
            b"1 beginbfrange\n<B0> <B2> <2460>\nendbfrange\n"
            b"1 beginbfrange\n<C0> <C1> [<0393> <0394>]\nendbfrange\n"
            b"endcmap\nend")
    s = b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (\xa0\xa1\xa2 \xb0\xb1\xb2 \xc0\xc1) Tj ET"
    pdf = _mk_pdf([
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 595 842] >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R"
        b" /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length %d >>\nstream\n%s\nendstream" % (len(s), s),
        b"<< /Type /Font /Subtype /TrueType /BaseFont /Custom"
        b" /Encoding /WinAnsiEncoding /ToUnicode 6 0 R >>",
        b"<< /Length %d >>\nstream\n%s\nendstream" % (len(cmap), cmap),
    ])
    assert extract_pdf_text(pdf) == "αβ∑ ①②③ ΓΔ"


def test_type0_identity_h_cid_font():
    """Composite Type0 font with 2-byte codes: ToUnicode-mapped CJK plus
    identity fallback for unmapped codes."""
    cmap = (b"begincmap\n"
            b"2 beginbfchar\n<0001> <4E2D>\n<0002> <6587>\nendbfchar\n"
            b"1 beginbfrange\n<0020> <007E> <0020>\nendbfrange\n"
            b"endcmap")
    # codes: 0001 0002 0020 'doc' (via ascii identity range) 0020 4E94(unmapped)
    codes = "".join(f"{c:04X}" for c in
                    [1, 2, 0x20, ord("d"), ord("o"), ord("c"), 0x20, 0x4E94])
    s = b"BT /F1 12 Tf 1 0 0 1 72 700 Tm <" + codes.encode() + b"> Tj ET"
    pdf = _mk_pdf([
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 595 842] >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R"
        b" /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length %d >>\nstream\n%s\nendstream" % (len(s), s),
        b"<< /Type /Font /Subtype /Type0 /BaseFont /SynthCID"
        b" /Encoding /Identity-H /ToUnicode 6 0 R >>",
        b"<< /Length %d >>\nstream\n%s\nendstream" % (len(cmap), cmap),
    ])
    assert extract_pdf_text(pdf) == "中文 doc 五"


def test_form_xobject_do_recursion():
    """Text inside Form XObjects must be extracted (Do operator recursion);
    the form inherits page resources when it has none, and nested forms
    work."""
    inner = b"BT /F1 12 Tf 1 0 0 1 72 720 Tm (inner form text) Tj ET"
    outer = (b"BT /F1 12 Tf 1 0 0 1 72 760 Tm (outer form text) Tj ET\n"
             b"/Fm2 Do")
    page = b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (page text) Tj ET\n/Fm1 Do"
    pdf = _mk_pdf([
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 595 842] >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R /Resources "
        b"<< /Font << /F1 5 0 R >> /XObject << /Fm1 6 0 R /Fm2 7 0 R >> >> >>",
        b"<< /Length %d >>\nstream\n%s\nendstream" % (len(page), page),
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        b"<< /Type /XObject /Subtype /Form /Length %d >>\nstream\n%s\nendstream"
        % (len(outer), outer),
        b"<< /Type /XObject /Subtype /Form /Length %d >>\nstream\n%s\nendstream"
        % (len(inner), inner),
    ])
    # y-order: outer (760) > inner (720) > page (700)
    assert extract_pdf_text(pdf) == "outer form text\ninner form text\npage text"


def test_incremental_update_prev_chain():
    """An appended incremental update (new xref with /Prev to the old one)
    must win: the updated content stream replaces the original object."""
    base = _one_page(b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (old text) Tj ET")
    assert extract_pdf_text(base) == "old text"
    old_xref_at = base.index(b"xref")
    s2 = b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (new text) Tj ET"
    out = bytearray(base)
    new_obj_at = len(out)
    out += (b"4 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj\n"
            % (len(s2), s2))
    new_xref_at = len(out)
    out += b"xref\n4 1\n%010d 00000 n \n" % new_obj_at
    out += (b"trailer\n<< /Size 6 /Root 1 0 R /Prev %d >>\nstartxref\n%d\n%%%%EOF\n"
            % (old_xref_at, new_xref_at))
    assert extract_pdf_text(bytes(out)) == "new text"


def test_rasterize_pages_geometry_and_ink():
    """M5 pixmap: page-sized canvas at dpi, ink exactly where runs sit,
    deterministic across calls, PNG round-trips."""
    import numpy as np
    from pdf_parse_bench_spark.kernels.pdftext import rasterize_pdf
    from pdf_parse_bench_spark.kernels.png import decode_png

    s = (b"BT /F1 12 Tf 1 0 0 1 72 770 Tm (ten chars!) Tj ET")
    pdf = _one_page(s)  # A4: 595x842
    pages = list(rasterize_pdf(pdf, dpi=72))
    assert len(pages) == 1
    page_no, png, w, h, ink = pages[0]
    assert (page_no, w, h) == (0, 595, 842)
    img = decode_png(png)
    assert img.shape == (842, 595)
    # run box: x=72..72+10*6, y_top = 842-770-12=60 .. 72
    assert (img[60:72, 72:132] < 128).all()
    assert img[0:50].min() == 255  # empty margin stays white
    assert 0 < ink < 0.01
    again = list(rasterize_pdf(pdf, dpi=72))[0]
    assert again[1] == png and again[4] == ink  # deterministic
    # higher dpi scales the canvas
    _, _, w2, h2, _ = list(rasterize_pdf(pdf, dpi=144))[0]
    assert (w2, h2) == (1190, 1684)
    # independent ink anchor (golden_raster_stats is a pin of the kernel;
    # THIS derives the expected ratio from the spec arithmetic instead):
    # one 10-char run at 12pt -> box 60x12 px on a 595x842 canvas
    expect = 60 * 12 / (595.0 * 842.0)
    assert ink == float(np.floor(expect * 1e6 + 0.5)) / 1e6


def test_rasterize_ink_from_known_boxes_two_runs():
    """Hand-computed golden for a two-run page at mixed font sizes: ink =
    sum of run boxes (no overlap), each box = (0.5*size*len) x size px at
    72 dpi — anchors the raster spec independently of the fixture pin."""
    import numpy as np
    from pdf_parse_bench_spark.kernels.pdftext import rasterize_pdf

    s = (b"BT /F1 12 Tf 1 0 0 1 72 770 Tm (abcd) Tj ET\n"
         b"BT /F1 10 Tf 1 0 0 1 300 500 Tm (xyzxyz) Tj ET")
    pdf = _one_page(s)
    _, _, w, h, ink = list(rasterize_pdf(pdf, dpi=72))[0]
    # run1: 4 chars @12pt -> 24x12; run2: 6 chars @10pt -> 30x10
    expect = (24 * 12 + 30 * 10) / (595.0 * 842.0)
    assert ink == float(np.floor(expect * 1e6 + 0.5)) / 1e6


def _mk_modern_pdf(content: bytes, predictor: bool) -> bytes:
    """PDF 1.5 layout: catalog/pages/page/font packed in an /ObjStm; xref is
    a cross-reference stream (type-2 entries for packed objects), optionally
    with the conventional /Predictor 12 (PNG Up) row encoding."""
    import zlib
    packed = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 595 842]"
            b" /Resources << /Font << /F1 4 0 R >> >> >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>"),
        (4, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"),
    ]
    bodies = b" ".join(b for _, b in packed)
    header = []
    off = 0
    for num, b in packed:
        header.append(b"%d %d" % (num, off))
        off += len(b) + 1
    hdr = b" ".join(header) + b" "
    objstm_body = hdr + bodies
    out = bytearray(b"%PDF-1.5\n")
    offsets = {}
    # obj 6 = ObjStm, obj 5 = content stream, obj 7 = xref stream
    offsets[5] = len(out)
    out += (b"5 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj\n"
            % (len(content), content))
    z = zlib.compress(objstm_body)
    offsets[6] = len(out)
    out += (b"6 0 obj\n<< /Type /ObjStm /N %d /First %d /Length %d"
            b" /Filter /FlateDecode >>\nstream\n%s\nendstream\nendobj\n"
            % (len(packed), len(hdr), len(z), z))
    # xref stream entries, W=[1,4,2], for objects 0..7
    rows = []
    for num in range(8):
        if num == 0:
            rows.append(bytes([0]) + (0).to_bytes(4, "big") + (0xFFFF).to_bytes(2, "big"))
        elif num in (1, 2, 3, 4):
            idx = [p[0] for p in packed].index(num)
            rows.append(bytes([2]) + (6).to_bytes(4, "big") + idx.to_bytes(2, "big"))
        elif num in (5, 6):
            rows.append(bytes([1]) + offsets[num].to_bytes(4, "big") + (0).to_bytes(2, "big"))
        else:  # the xref stream itself
            rows.append(bytes([1]) + len(out).to_bytes(4, "big") + (0).to_bytes(2, "big"))
    if predictor:
        enc = bytearray()
        prev = bytes(7)
        for r in rows:
            enc += b"\x02" + bytes((r[k] - prev[k]) & 0xFF for k in range(7))
            prev = r
        xdata = zlib.compress(bytes(enc))
        parms = b" /DecodeParms << /Predictor 12 /Columns 7 >>"
    else:
        xdata = zlib.compress(b"".join(rows))
        parms = b""
    xref_at = len(out)
    out += (b"7 0 obj\n<< /Type /XRef /Size 8 /W [1 4 2] /Index [0 8]"
            b" /Root 1 0 R /Filter /FlateDecode%s /Length %d >>\nstream\n%s"
            b"\nendstream\nendobj\n" % (parms, len(xdata), xdata))
    out += b"startxref\n%d\n%%%%EOF\n" % xref_at
    return bytes(out)


def test_xref_stream_and_objstm():
    content = b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (modern layout) Tj ET"
    assert extract_pdf_text(_mk_modern_pdf(content, predictor=False)) \
        == "modern layout"


def test_xref_stream_with_png_predictor():
    content = b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (predicted xref) Tj ET"
    assert extract_pdf_text(_mk_modern_pdf(content, predictor=True)) \
        == "predicted xref"


def _lzw_pack(codes: list[int], width: int = 9) -> bytes:
    acc = nbits = 0
    out = bytearray()
    for c in codes:
        acc = (acc << width) | c
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def test_lzw_decode_filter():
    from pdf_parse_bench_spark.kernels.pdftext import _lzw_decode
    raw = b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (lzw text) Tj ET"
    # minimal conforming stream: clear before every literal, then EOD
    codes = [256]
    for b in raw:
        codes.extend([b, 256])
    codes[-1] = 257
    packed = _lzw_pack(codes)
    assert _lzw_decode(packed) == raw
    # table-building path: repeated pattern exercises the KwKwK case
    pat = b"ababababab"
    codes2 = [256, ord("a"), ord("b"), 258, 260, 259, 257]
    # 258='ab' 259='ba' 260='aba' -> a b ab aba ba = 'ababababa'... build
    assert _lzw_decode(_lzw_pack(codes2)) == b"abababa" + b"ba"
    s = packed
    pdf2 = _mk_pdf([
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 595 842] >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R"
        b" /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length %d /Filter /LZWDecode >>\nstream\n%s\nendstream" % (len(s), s),
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ])
    assert extract_pdf_text(pdf2) == "lzw text"


def test_hybrid_xref_chain_classic_plus_stream_update():
    """Incremental update whose xref is a STREAM (/Prev pointing at the
    original classic table, W=[1,2,1] default-ish widths) — the chain mixes
    both xref flavors, newest entry wins."""
    import zlib
    base = _one_page(b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (v1 text) Tj ET")
    old_xref_at = base.index(b"xref")
    s2 = b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (v2 text) Tj ET"
    out = bytearray(base)
    new_obj_at = len(out)
    out += (b"4 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj\n"
            % (len(s2), s2))
    # xref stream covering only object 4 (Index [4 1]) + itself (obj 8)
    rows = (bytes([1]) + new_obj_at.to_bytes(2, "big") + bytes([0]))
    xref_at = len(out)
    rows2 = bytes([1]) + xref_at.to_bytes(2, "big") + bytes([0])
    xdata = zlib.compress(rows + rows2)
    out += (b"8 0 obj\n<< /Type /XRef /Size 9 /W [1 2 1] /Index [4 1 8 1]"
            b" /Root 1 0 R /Prev %d /Filter /FlateDecode /Length %d >>"
            b"\nstream\n%s\nendstream\nendobj\n"
            % (old_xref_at, len(xdata), xdata))
    out += b"startxref\n%d\n%%%%EOF\n" % xref_at
    assert extract_pdf_text(bytes(out)) == "v2 text"


def test_garbage_returns_empty():
    assert extract_pdf_text(b"%PDF-1.4\nnot a real pdf") == ""
    assert extract_pdf_text(b"") == ""


def test_comment_and_inline_image_skipped():
    s = (b"% leading comment\nBT /F1 12 Tf 1 0 0 1 72 700 Tm (kept) Tj ET\n"
         b"BI /W 1 /H 1 ID \x00\x01\x02 EI\n"
         b"BT /F1 12 Tf 1 0 0 1 72 680 Tm (after image) Tj ET")
    assert extract_pdf_text(_one_page(s)) == "kept\nafter image"


def test_pdf_spans_inline_vs_display_classification():
    """A math-font run sharing a baseline with prose is inline-formula; a
    math-only baseline is display-formula; CMR-ish short lines sandwiched
    between formula lines are absorbed into the display block."""
    from pdf_parse_bench_spark.kernels.pdftext import extract_pdf_spans

    body = (
        b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (The value ) Tj ET\n"
        b"BT /Fm 12 Tf 1 0 0 1 140 700 Tm (x+y) Tj ET\n"          # inline
        b"BT /F1 12 Tf 1 0 0 1 170 700 Tm ( is small.) Tj ET\n"
        b"BT /Fm 12 Tf 1 0 0 1 200 650 Tm (E = mc) Tj ET\n"       # display
        b"BT /F1 12 Tf 1 0 0 1 236 656 Tm (2) Tj ET\n"            # superscript
        b"BT /Fm 12 Tf 1 0 0 1 200 622 Tm (+ V) Tj ET\n"
        b"BT /F1 12 Tf 1 0 0 1 72 560 Tm (Closing prose paragraph here.) Tj ET"
    )
    pdf = _one_page_with_fonts(body)
    sp = extract_pdf_spans(pdf)
    kinds = [(s["kind"], s["text"]) for s in sp]
    assert kinds[0][0] == "text" and "The value" in kinds[0][1]
    assert kinds[1] == ("inline-formula", "x+y")
    assert kinds[2][0] == "text" and "is small." in kinds[2][1]
    disp = next(s for s in sp if s["kind"] == "display-formula")
    assert "E = mc" in disp["text"] and "2" in disp["text"] \
        and "+ V" in disp["text"]
    assert kinds[-1][0] == "text" and "Closing prose" in kinds[-1][1]


def _one_page_with_fonts(body: bytes) -> bytes:
    """Minimal PDF with a prose face (/F1 Helvetica) and a math face
    (/Fm CMMI12 BaseFont)."""
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 "
        b"/MediaBox [0 0 595 842] /Resources << /Font "
        b"<< /F1 4 0 R /Fm 5 0 R >> >> >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 6 0 R >>",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /TEST+CMMI12 >>",
        b"<< /Length %d >>\nstream\n%s\nendstream" % (len(body), body),
    ]
    out = bytearray(b"%PDF-1.4\n")
    offs = []
    for i, b in enumerate(objs, start=1):
        offs.append(len(out))
        out += b"%d 0 obj\n" % i + b + b"\nendobj\n"
    xref = len(out)
    out += b"xref\n0 %d\n0000000000 65535 f \n" % (len(objs) + 1)
    for o in offs:
        out += b"%010d 00000 n \n" % o
    out += (b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % (len(objs) + 1, xref))
    return bytes(out)


def test_pdf_spans_image_xobject_from_ctm():
    """M11: an Image XObject painted via `q .. cm /Im Do Q` must surface as
    a kind='image' span with media_ref page_<x>_<y>_<w>_<h>.png computed
    from the CTM (top-left origin) — NOT from the XObject's /Width//Height
    pixel dims — positioned between the baselines above and below it, and
    it must split the merge of the surrounding text spans. CTM composition
    under q/Q nesting is exercised by a translate-then-scale pair."""
    from pdf_parse_bench_spark.kernels.pdftext import extract_pdf_spans

    body = (
        b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (Above the figure.) Tj ET\n"
        # translate then scale in separate cm ops: composed CTM places the
        # 150x100 rect at (80, 560)
        b"q 1 0 0 1 80 560 cm 150 0 0 100 0 0 cm /Im9 Do Q\n"
        b"BT /F1 12 Tf 1 0 0 1 72 520 Tm (Below the figure.) Tj ET"
    )
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 "
        b"/MediaBox [0 0 595 842] /Resources << "
        b"/Font << /F1 4 0 R >> /XObject << /Im9 5 0 R >> >> >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 6 0 R >>",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        b"<< /Type /XObject /Subtype /Image /Width 4 /Height 4 "
        b"/ColorSpace /DeviceGray /BitsPerComponent 8 /Length 16 >>"
        b"\nstream\n0123456789abcdef\nendstream",
        b"<< /Length %d >>\nstream\n%s\nendstream" % (len(body), body),
    ]
    out = bytearray(b"%PDF-1.4\n")
    offs = []
    for i, b in enumerate(objs, start=1):
        offs.append(len(out))
        out += b"%d 0 obj\n" % i + b + b"\nendobj\n"
    xref = len(out)
    out += b"xref\n0 %d\n0000000000 65535 f \n" % (len(objs) + 1)
    for o in offs:
        out += b"%010d 00000 n \n" % o
    out += (b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % (len(objs) + 1, xref))

    sp = extract_pdf_spans(bytes(out))
    got = [(s["kind"], s["text"], s["media_ref"]) for s in sp]
    # image rect: x=80, y_top = 842 - 560 - 100 = 182, w=150, h=100
    assert got == [
        ("text", "Above the figure.", ""),
        ("image", "", "page_80_182_150_100.png"),
        ("text", "Below the figure.", ""),
    ], got


def _assemble_pdf(objs: list[bytes]) -> bytes:
    out = bytearray(b"%PDF-1.4\n")
    offs = []
    for i, b in enumerate(objs, start=1):
        offs.append(len(out))
        out += b"%d 0 obj\n" % i + b + b"\nendobj\n"
    xref = len(out)
    out += b"xref\n0 %d\n0000000000 65535 f \n" % (len(objs) + 1)
    for o in offs:
        out += b"%010d 00000 n \n" % o
    out += (b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % (len(objs) + 1, xref))
    return bytes(out)


def test_type0_embedded_cmap_mixed_code_widths():
    """A non-Identity Type0 font whose /Encoding is an embedded CMap
    STREAM with mixed 1-byte and 2-byte codespace ranges (the
    Adobe-Japan1 shell shape): 1-byte codes <20>-<7E> pass through a
    partial /ToUnicode; 2-byte codes <8140>-<9FFC> resolve through a
    cidrange to CID codepoints. The show string interleaves both widths —
    the decoder must consume the right number of bytes per code
    (VERDICT r3 item 5)."""
    from pdf_parse_bench_spark.kernels.pdftext import extract_pdf_text

    cmap = (b"/CIDInit /ProcSet findresource begin\n"
            b"begincmap\n"
            b"2 begincodespacerange\n<20> <7e>\n<8140> <9ffc>\nendcodespacerange\n"
            b"1 begincidrange\n<8140> <9ffc> 9000\nendcidrange\n"
            b"endcmap\nend")
    # ToUnicode keyed by CODE: maps the 1-byte codes to letters
    tounicode = (b"begincmap\n"
                 b"3 beginbfchar\n<41> <0058>\n<42> <0059>\n<20> <0020>\n"
                 b"endbfchar\nendcmap")
    # show: 'A' ' ' <8141 -> cid 9001> 'B'  (1,1,2,1 bytes)
    body = (b"BT /F6 12 Tf 1 0 0 1 72 700 Tm <412081414220> Tj ET")
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 595 842] "
        b"/Resources << /Font << /F6 4 0 R >> >> >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 7 0 R >>",
        b"<< /Type /Font /Subtype /Type0 /BaseFont /SynthJ "
        b"/Encoding 5 0 R /ToUnicode 6 0 R >>",
        b"<< /Length %d >>\nstream\n%s\nendstream" % (len(cmap), cmap),
        b"<< /Length %d >>\nstream\n%s\nendstream" % (len(tounicode), tounicode),
        b"<< /Length %d >>\nstream\n%s\nendstream" % (len(body), body),
    ]
    text = extract_pdf_text(_assemble_pdf(objs))
    # 0x8141 -> cid 9000 + (0x8141-0x8140) = 9001 -> chr(9001) = '〈'
    assert text == "X " + chr(9001) + "Y" + chr(0x20), text


def test_type3_font_charprocs_differences():
    """A /Type3 font (no BaseFont) whose /Encoding /Differences maps codes
    to its /CharProcs glyph names: the names decode through the AGL table
    (bullet, emdash) exactly like a Differences-encoded simple font — and
    with zero replacement characters (VERDICT r3 item 5)."""
    from pdf_parse_bench_spark.kernels.pdftext import extract_pdf_text

    glyph = b"10 0 0 10 0 0 d1"  # trivial CharProc body
    body = b"BT /F7 12 Tf 1 0 0 1 72 700 Tm (\x01\x02\x01) Tj ET"
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 595 842] "
        b"/Resources << /Font << /F7 4 0 R >> >> >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 6 0 R >>",
        b"<< /Type /Font /Subtype /Type3 "
        b"/FontBBox [0 0 10 10] /FontMatrix [0.001 0 0 0.001 0 0] "
        b"/CharProcs << /bullet 5 0 R /emdash 5 0 R >> "
        b"/Encoding << /Differences [ 1 /bullet /emdash ] >> "
        b"/FirstChar 1 /LastChar 2 >>",
        b"<< /Length %d >>\nstream\n%s\nendstream" % (len(glyph), glyph),
        b"<< /Length %d >>\nstream\n%s\nendstream" % (len(body), body),
    ]
    text = extract_pdf_text(_assemble_pdf(objs))
    assert text == "•—•", repr(text)
    assert "�" not in text


def test_page_chrome_header_footer_suppressed():
    """North-star boilerplate strip on the raw-PDF path: a running header
    (same text, fixed offset from the top edge — detected by y-coordinate
    clustering + cross-page repetition) and bare page-number footers are
    suppressed; body text with digits and a one-page-only line in the
    band survive."""
    from pdf_parse_bench_spark.kernels.pdftext import extract_pdf_text

    def page(pg: int, extra: str = "") -> bytes:
        ops = (
            f"BT /F1 9 Tf 1 0 0 1 72 814 Tm (Journal of Tests Vol. {pg}) Tj ET\n"
            f"BT /F1 12 Tf 1 0 0 1 72 700 Tm (Body {pg} line one.) Tj ET\n"
            f"BT /F1 12 Tf 1 0 0 1 72 680 Tm (Numbers 42 stay {pg}.) Tj ET\n"
            f"{extra}"
            f"BT /F1 9 Tf 1 0 0 1 300 24 Tm ({pg + 1}) Tj ET"
        )
        return ops.encode()

    # page 2 carries a one-off caption inside the bottom band — must stay
    bodies = [page(0), page(1), page(2, "BT /F1 9 Tf 1 0 0 1 72 30 Tm "
                                        "(Unique caption drifted low.) Tj ET\n")]
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        (b"<< /Type /Pages /Kids [3 0 R 4 0 R 5 0 R] /Count 3 "
         b"/MediaBox [0 0 595 842] /Resources << /Font "
         b"<< /F1 6 0 R >> >> >>"),
        b"<< /Type /Page /Parent 2 0 R /Contents 7 0 R >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 8 0 R >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 9 0 R >>",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ] + [b"<< /Length %d >>\nstream\n%s\nendstream" % (len(b), b)
         for b in bodies]
    pdf = _assemble_pdf(objs)
    text = extract_pdf_text(pdf)
    assert "Journal of Tests" not in text          # header (digit-folded)
    assert "\n1\n" not in text and not text.endswith("3")  # page numbers
    assert "Body 0 line one." in text and "Body 2 line one." in text
    assert "Numbers 42 stay 1." in text            # body digits untouched
    assert "Unique caption drifted low." in text   # one-off band line kept


def test_inline_image_becomes_image_span():
    """A BI..EI inline image paints the unit square through the CTM like
    an Image XObject (§8.9.7) and must surface as a kind='image' span
    with the CTM-derived figure ref."""
    from pdf_parse_bench_spark.kernels.pdftext import extract_pdf_spans

    body = (
        b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (Before.) Tj ET\n"
        b"q 120 0 0 90 100 500 cm BI /W 2 /H 2 /CS /G /BPC 8 ID "
        b"\x00\x01\x02\x03 EI Q\n"
        b"BT /F1 12 Tf 1 0 0 1 72 460 Tm (After.) Tj ET"
    )
    pdf = _one_page_with_fonts(body)
    got = [(s["kind"], s["media_ref"]) for s in extract_pdf_spans(pdf)]
    # rect: x=100, y_top = 842 - 500 - 90 = 252, w=120, h=90
    assert got == [("text", ""), ("image", "page_100_252_120_90.png"),
                   ("text", "")], got


def test_asciihex_ascii85_runlength_filters():
    """§7.4 filter coverage: AHx / A85 / RL content streams (and an
    AHx+Fl chain) all decode to the same shown text."""
    import base64
    import zlib as _z

    content = b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (filter test) Tj ET"

    def page(body: bytes, filt: bytes) -> bytes:
        return _mk_pdf([
            b"<< /Type /Catalog /Pages 2 0 R >>",
            b"<< /Type /Pages /Kids [3 0 R] /Count 1"
            b" /MediaBox [0 0 595 842] >>",
            b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R"
            b" /Resources << /Font << /F1 5 0 R >> >> >>",
            b"<< /Length %d /Filter %s >>\nstream\n%s\nendstream"
            % (len(body), filt, body),
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        ])

    ahx = content.hex().encode() + b">"
    assert extract_pdf_text(page(ahx, b"/ASCIIHexDecode")) == "filter test"
    a85 = base64.a85encode(content) + b"~>"
    assert extract_pdf_text(page(a85, b"/ASCII85Decode")) == "filter test"
    rl = b""
    for at in range(0, len(content), 100):
        chunk = content[at:at + 100]
        rl += bytes([len(chunk) - 1]) + chunk
    rl += bytes([128])
    assert extract_pdf_text(page(rl, b"/RunLengthDecode")) == "filter test"
    # chain: deflate then hex-armor (decode order: AHx first, then Fl)
    chain = _z.compress(content).hex().encode() + b">"
    assert extract_pdf_text(
        page(chain, b"[/ASCIIHexDecode /FlateDecode]")) == "filter test"


def test_tc_tw_tz_affect_advance_geometry():
    """§9.3 text-state params: char/word spacing widen runs, horizontal
    scaling narrows them — run WIDTH must reflect all three (geometry
    feeds the XY-cut), while extracted text is unchanged."""
    from pdf_parse_bench_spark.kernels.pdftext import _PdfDoc, _page_runs

    def runs_for(prefix: bytes):
        pdf = _one_page(b"BT /F1 12 Tf " + prefix
                        + b" 1 0 0 1 72 700 Tm (aa bb) Tj ET")
        doc = _PdfDoc(pdf)
        (content, fonts, xobj, w, h), = list(doc.pages())
        return _page_runs(content, fonts, xobj)

    base = runs_for(b"")
    wide_tc = runs_for(b"5 Tc")
    wide_tw = runs_for(b"20 Tw")
    narrow = runs_for(b"50 Tz")
    assert base[0][4] == wide_tc[0][4] == narrow[0][4]  # same text
    assert wide_tc[0][2] > base[0][2]   # +5pt per glyph
    assert wide_tw[0][2] > base[0][2]   # +20pt for the space
    assert abs(narrow[0][2] - base[0][2] / 2) < 1e-6  # Tz 50 halves width


def _mini_pdf(objs):
    out = bytearray(b"%PDF-1.4\n")
    offs = []
    for i, b in enumerate(objs, start=1):
        offs.append(len(out))
        out += b"%d 0 obj\n" % i + b + b"\nendobj\n"
    xref = len(out)
    out += b"xref\n0 %d\n0000000000 65535 f \n" % (len(objs) + 1)
    for o in offs:
        out += b"%010d 00000 n \n" % o
    out += (b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % (len(objs) + 1, xref))
    return bytes(out)


def test_embedded_jpeg_inks_raster_and_reports_stats():
    """A DCTDecode Image XObject must DECODE inside the PDF (baseline and
    progressive JPEG alike): pdf_image_stats reports its true pixel dims
    and mean, and rasterize_pdf inks the figure rect — the ink ratio is
    checked against a closed-form expectation (dark image area /
    page area), not against the rasterizer itself."""
    import numpy as np

    from pdf_parse_bench_spark.fixtures import (
        _mk_gray_jpeg, _mk_progressive_gray_jpeg_with_stats)
    from pdf_parse_bench_spark.kernels.pdftext import (
        pdf_image_stats, rasterize_pdf)

    # all-dark baseline JPEG: 2x2 blocks of value 10 (< 128 everywhere)
    blocks = np.full((2, 2), 10, dtype=np.int64)
    jpg = _mk_gray_jpeg(blocks, 16, 16)
    # paint it over a 200x100 rect at (50, 600) on an A4 page
    body = b"q 200 0 0 100 50 600 cm /ImJ Do Q"
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 "
        b"/MediaBox [0 0 595 842] /Resources << "
        b"/XObject << /ImJ 4 0 R >> >> >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>",
        b"<< /Type /XObject /Subtype /Image /Width 16 /Height 16 "
        b"/ColorSpace /DeviceGray /BitsPerComponent 8 "
        b"/Filter /DCTDecode /Length %d >>\nstream\n%s\nendstream"
        % (len(jpg), jpg),
        b"<< /Length %d >>\nstream\n%s\nendstream" % (len(body), body),
    ]
    pdf = _mini_pdf(objs)

    rows = pdf_image_stats(pdf)
    assert rows == [{
        "page_no": 0, "seq": 0, "media_ref": "page_50_142_200_100.png",
        "px_w": 16, "px_h": 16,
        "mean_intensity": float(np.floor(10 / 255.0 * 1e6 + 0.5)) / 1e6,
        "decoded": True}]

    pages = list(rasterize_pdf(pdf))
    assert len(pages) == 1
    _no, _png, w, h, ink = pages[0]
    # dark pixels = the painted rect only: 200x100 pt at 72 dpi
    expect = (200 * 100) / (595 * 842)
    assert abs(ink - expect) < 0.002

    # progressive JPEG embeds decode too
    pjpg, pstats, ppx = _mk_progressive_gray_jpeg_with_stats(7)
    body = b"q 120 0 0 60 100 500 cm /ImP Do Q"
    objs[1] = objs[1].replace(b"/ImJ", b"/ImP")
    objs[3] = (b"<< /Type /XObject /Subtype /Image /Width %d /Height %d "
               b"/ColorSpace /DeviceGray /BitsPerComponent 8 "
               b"/Filter /DCTDecode /Length %d >>\nstream\n%s\nendstream"
               % (pstats["width"], pstats["height"], len(pjpg), pjpg))
    objs[4] = b"<< /Length %d >>\nstream\n%s\nendstream" % (len(body), body)
    rows = pdf_image_stats(_mini_pdf(objs))
    assert len(rows) == 1 and rows[0]["decoded"]
    assert rows[0]["px_w"] == pstats["width"]
    assert rows[0]["px_h"] == pstats["height"]
    assert rows[0]["mean_intensity"] == pstats["mean_intensity"]


def test_ccitt_roundtrip_and_known_bits():
    """CCITT G4/G3-1D codec: encoder<->decoder round-trips over noise,
    blocky, striped, and all-black images at both byte alignments, a
    >2560-pixel run chains make-up codes, and a hand-coded MH line
    (white-4 black-3 white-1 -> 1011 10 000111) pins the common table
    entries independently of the encoder."""
    import numpy as np

    from pdf_parse_bench_spark.kernels.ccitt import (
        ccittfax_decode, ccittfax_encode)

    rng = np.random.default_rng(20260817)
    for trial in range(16):
        h, w = int(rng.integers(1, 30)), int(rng.integers(1, 90))
        style = trial % 4
        if style == 0:
            img = (rng.random((h, w)) < 0.5).astype(np.uint8) * 255
        elif style == 1:
            img = np.kron((rng.random((max(1, h // 4), max(1, w // 8)))
                           < 0.5), np.ones((4, 8)))[:h, :w]
            img = img.astype(np.uint8) * 255
        elif style == 2:
            img = np.full((h, w), 255, np.uint8)
            img[:, ::7] = 0
        else:
            img = np.zeros((h, w), np.uint8)
        H, W = img.shape
        for k in (-1, 0):
            for ba in (False, True):
                data = ccittfax_encode(img, k=k, byte_align=ba)
                dec = ccittfax_decode(data, W, H, k=k, byte_align=ba)
                assert (dec == img).all(), (trial, k, ba)
    long = np.full((3, 6000), 255, np.uint8)
    long[1, 100:5800] = 0
    for k in (-1, 0):
        dec = ccittfax_decode(ccittfax_encode(long, k=k), 6000, 3, k=k)
        assert (dec == long).all()
    kat = ccittfax_encode(
        np.array([[255] * 4 + [0] * 3 + [255]], np.uint8), k=0)
    assert "".join(f"{b:08b}" for b in kat).startswith("101110000111")


def test_parse_and_span_paths_never_decode_image_pixels(monkeypatch):
    """Lazy-decode pin (VERDICT r5 item 6): text/span extraction pays
    only Do-site geometry — `_image_pixels` (the expensive JPEG/CCITT
    decode) must NEVER run on the extract_pdf_text / extract_pdf_spans
    path. Only pdf_image_stats and the rasterizer may force the thunk.
    Any future regression re-eagerizing the decode fails here, not in a
    bench delta."""
    import numpy as np

    from pdf_parse_bench_spark.fixtures import _mk_gray_jpeg
    from pdf_parse_bench_spark.kernels import pdftext as pt

    calls = []
    real = pt._PdfDoc._image_pixels
    monkeypatch.setattr(
        pt._PdfDoc, "_image_pixels",
        lambda self, ref, d, w, h: (calls.append(1),
                                    real(self, ref, d, w, h))[1])

    jpg = _mk_gray_jpeg(np.full((2, 2), 10, dtype=np.int64), 16, 16)
    body = (b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (Above.) Tj ET\n"
            b"q 200 0 0 100 50 500 cm /ImJ Do Q\n"
            b"BT /F1 12 Tf 1 0 0 1 72 450 Tm (Below.) Tj ET")
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 "
        b"/MediaBox [0 0 595 842] /Resources << "
        b"/Font << /F1 6 0 R >> /XObject << /ImJ 4 0 R >> >> >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>",
        b"<< /Type /XObject /Subtype /Image /Width 16 /Height 16 "
        b"/ColorSpace /DeviceGray /BitsPerComponent 8 "
        b"/Filter /DCTDecode /Length %d >>\nstream\n%s\nendstream"
        % (len(jpg), jpg),
        b"<< /Length %d >>\nstream\n%s\nendstream" % (len(body), body),
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    pdf = _mini_pdf(objs)

    text = pt.extract_pdf_text(pdf)
    assert "Above." in text and "Below." in text
    assert calls == [], "extract_pdf_text forced an image decode"
    spans = pt.extract_pdf_spans(pdf)
    assert any(s["kind"] == "image" for s in spans)
    assert calls == [], "extract_pdf_spans forced an image decode"
    # sanity: the patch intercepts the real decode path
    rows = pt.pdf_image_stats(pdf)
    assert rows and rows[0]["decoded"] and calls, \
        "counter never saw the stats-path decode — pin is vacuous"


def test_embedded_ccitt_image_stats():
    """A /CCITTFaxDecode Image XObject (G4 + EncodedByteAlign) must
    decode inside the PDF: pdf_image_stats reports the true bilevel
    dims/mean, and BlackIs1 inverts the rendering."""
    import numpy as np

    from pdf_parse_bench_spark.kernels.ccitt import ccittfax_encode
    from pdf_parse_bench_spark.kernels.pdftext import pdf_image_stats

    img = np.full((16, 48), 255, np.uint8)
    img[4:12, 8:40] = 0  # a black bar: mean known in closed form
    data = ccittfax_encode(img, k=-1, byte_align=True)
    mean = float(np.floor(img.mean() / 255.0 * 1e6 + 0.5)) / 1e6

    def mk(extra_parms=b""):
        body = b"q 96 0 0 32 60 700 cm /ImC Do Q"
        objs = [
            b"<< /Type /Catalog /Pages 2 0 R >>",
            b"<< /Type /Pages /Kids [3 0 R] /Count 1 "
            b"/MediaBox [0 0 595 842] /Resources << "
            b"/XObject << /ImC 4 0 R >> >> >>",
            b"<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>",
            b"<< /Type /XObject /Subtype /Image /Width 48 /Height 16 "
            b"/ColorSpace /DeviceGray /BitsPerComponent 1 "
            b"/Filter /CCITTFaxDecode /DecodeParms << /K -1 /Columns 48 "
            b"/Rows 16 /EncodedByteAlign true" + extra_parms + b" >> "
            b"/Length %d >>\nstream\n%s\nendstream" % (len(data), data),
            b"<< /Length %d >>\nstream\n%s\nendstream"
            % (len(body), body),
        ]
        return _mini_pdf(objs)

    rows = pdf_image_stats(mk())
    assert len(rows) == 1 and rows[0]["decoded"]
    assert (rows[0]["px_w"], rows[0]["px_h"]) == (48, 16)
    assert rows[0]["mean_intensity"] == mean

    inv_mean = float(np.floor(
        (255 - img).mean() / 255.0 * 1e6 + 0.5)) / 1e6
    rows = pdf_image_stats(mk(b" /BlackIs1 true"))
    assert rows[0]["mean_intensity"] == inv_mean


def test_raw_1bit_4bit_gray_image_pixels():
    """Filterless 1-bit and 4-bit DeviceGray rasters decode to true
    pixel stats (bit unpack / nibble expansion with row byte padding)."""
    import numpy as np

    from pdf_parse_bench_spark.kernels.pdftext import pdf_image_stats

    def mk(img_obj):
        body = b"q 60 0 0 30 60 700 cm /ImR Do Q"
        return _mini_pdf([
            b"<< /Type /Catalog /Pages 2 0 R >>",
            b"<< /Type /Pages /Kids [3 0 R] /Count 1 "
            b"/MediaBox [0 0 595 842] /Resources << "
            b"/XObject << /ImR 4 0 R >> >> >>",
            b"<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>",
            img_obj,
            b"<< /Length %d >>\nstream\n%s\nendstream"
            % (len(body), body),
        ])

    # 1-bit: 10x3, alternating columns -> bits 1010... row-padded
    w, h = 10, 3
    bits = np.tile((np.arange(w) % 2 == 0).astype(np.uint8), (h, 1))
    packed = np.packbits(bits, axis=1).tobytes()
    obj = (b"<< /Type /XObject /Subtype /Image /Width 10 /Height 3 "
           b"/ColorSpace /DeviceGray /BitsPerComponent 1 /Length %d >>"
           b"\nstream\n%s\nendstream" % (len(packed), packed))
    rows = pdf_image_stats(mk(obj))
    exp = float(np.floor((bits * 255).mean() / 255.0 * 1e6 + 0.5)) / 1e6
    assert rows[0]["decoded"] and rows[0]["mean_intensity"] == exp
    assert (rows[0]["px_w"], rows[0]["px_h"]) == (10, 3)

    # 4-bit: 5x2 gradient, odd width -> padded nibble per row
    sam = np.array([[0, 3, 7, 11, 15], [15, 12, 8, 4, 0]], np.uint8)
    rb = []
    for r in sam:
        row = list(r) + [0]  # pad to even
        rb += [(row[i] << 4) | row[i + 1] for i in range(0, 6, 2)]
    data = bytes(rb)
    obj = (b"<< /Type /XObject /Subtype /Image /Width 5 /Height 2 "
           b"/ColorSpace /DeviceGray /BitsPerComponent 4 /Length %d >>"
           b"\nstream\n%s\nendstream" % (len(data), data))
    rows = pdf_image_stats(mk(obj))
    exp = float(np.floor((sam * 17).mean() / 255.0 * 1e6 + 0.5)) / 1e6
    assert rows[0]["decoded"] and rows[0]["mean_intensity"] == exp
