"""Never-crash fuzz: every parser kernel must degrade gracefully on
arbitrary/corrupt input (X4 isolation starts at the kernel boundary — a
raised exception inside an Arrow batch would fail a whole task)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from pdf_parse_bench_spark.kernels.htmldoc import parse_html
from pdf_parse_bench_spark.kernels.markdown import parse_markdown
from pdf_parse_bench_spark.kernels.pdftext import extract_pdf_text, rasterize_pdf
from pdf_parse_bench_spark.kernels.teidoc import parse_tei


@settings(max_examples=80, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_pdf_never_raises_on_garbage(data):
    out = extract_pdf_text(b"%PDF-1.4\n" + data)
    assert isinstance(out, str)
    for page in rasterize_pdf(b"%PDF-1.4\n" + data):
        assert len(page) == 5


@settings(max_examples=80, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_pdf_never_raises_on_corrupt_valid_prefix(data):
    """A valid PDF with trailing corruption (truncated update) still parses
    the intact part or returns empty — never raises."""
    from tests.test_pdftext import _one_page
    base = _one_page(b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (x) Tj ET")
    out = extract_pdf_text(base + data)
    assert isinstance(out, str)


@settings(max_examples=80, deadline=None)
@given(st.text(max_size=400))
def test_markdown_html_tei_never_raise(text):
    for fn in (parse_markdown, parse_html, parse_tei):
        spans = fn(text)
        assert isinstance(spans, list)
        for s in spans:
            assert set(s) == {"kind", "text", "media_ref", "offset"}


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=120))
def test_jpeg_dims_never_crashes_unexpectedly(data):
    """jpeg_dims raises ValueError (only) on arbitrary garbage — the X4
    contract decode_media relies on."""
    from pdf_parse_bench_spark.kernels.jpeg import jpeg_dims

    try:
        w, h, c = jpeg_dims(b"\xff\xd8" + data)
        assert w > 0 and h > 0 and c > 0
    except ValueError:
        pass


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=80))
def test_render_formula_never_raises(s):
    from pdf_parse_bench_spark.kernels.render import render_formula

    img = render_formula(s)
    assert img is None or (img.ndim == 2 and img.shape[0] == 20)


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=400))
def test_pdf_spans_never_raises(data):
    from pdf_parse_bench_spark.kernels.pdftext import extract_pdf_spans

    for s in extract_pdf_spans(b"%PDF-1.4\n" + data):
        assert s["kind"] in ("text", "inline-formula", "display-formula")


@settings(max_examples=40, deadline=None)
@given(st.text("abcdefg XYZ09().-", min_size=0, max_size=60),
       st.sampled_from(["rc4-40", "rc4-128", "aes-128", "aes-256"]),
       st.integers(min_value=0, max_value=2**31 - 1))
def test_encrypted_roundtrip_property(body, variant, seed):
    """Encryption is invisible to extraction: for ANY show-text content
    and ANY supported scheme, encrypt_pdf -> extract equals the
    unencrypted extraction (the decrypt path can never alter bytes)."""
    from pdf_parse_bench_spark.kernels.pdfcrypt import encrypt_pdf
    from tests.test_pdftext import _one_page

    esc = body.replace("\\", "").replace("(", "").replace(")", "")
    pdf = _one_page(b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (%s) Tj ET"
                    % esc.encode("latin-1"))
    assert extract_pdf_text(encrypt_pdf(pdf, variant, seed=seed)) \
        == extract_pdf_text(pdf)


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=300))
def test_encrypted_garbage_never_raises(data):
    """Corrupt bytes carrying an /Encrypt marker still fall to the
    damaged-file path, never an exception (X4 at the kernel boundary)."""
    out = extract_pdf_text(
        b"%PDF-1.4\n" + data
        + b"\ntrailer\n<< /Encrypt << /V 4 /R 4 >> >>\n")
    assert isinstance(out, str)
