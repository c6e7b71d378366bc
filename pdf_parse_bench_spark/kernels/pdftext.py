"""Pure-Python PDF content-stream text tokenizer (the M2 analog).

The reference's cheapest deterministic backend is pypdf's per-page
``extract_text`` (parsers/pypdf/__main__.py:30-32). This kernel re-implements
that capability from scratch for uncompressed content streams: it scans
``stream … endstream`` sections, tokenizes ``Tm``-positioned ``Tj`` text
runs, converts PDF bottom-up y into top-down layout boxes, and re-uses the
XY-cut reading order so multi-column pages come out column-major.

Designed to run inside ``mapInPandas`` over Arrow batches of PDF bytes —
no driver-side loops (north_rule: batched byte-stream tokenization).
"""

from __future__ import annotations

import re
import zlib

import numpy as np

from pdf_parse_bench_spark.kernels.layout import reading_order

# object dict + stream; body sliced by /Length when present (a compressed
# body may legitimately contain the bytes "endstream")
_OBJ_STREAM_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n", re.S)
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)")
_ENDSTREAM_RE = re.compile(rb"\r?\nendstream")
_TJ_RE = re.compile(
    rb"(-?[\d.]+)\s+(-?[\d.]+)\s+Tm\s*\(((?:\\.|[^\\()])*)\)\s*Tj"
)
_TD_RE = re.compile(rb"(-?[\d.]+)\s+(-?[\d.]+)\s+Td\s*\(((?:\\.|[^\\()])*)\)\s*Tj")

_UNESCAPE = {b"\\\\": b"\\", b"\\(": b"(", b"\\)": b")",
             b"\\n": b"\n", b"\\t": b"\t", b"\\r": b"\r"}
_ESC_RE = re.compile(rb"\\[\\()ntr]")

PAGE_H = 842.0
_LINE_H = 12.0
_RUN_W = 200.0


def _unescape(raw: bytes) -> str:
    return _ESC_RE.sub(lambda m: _UNESCAPE[m.group()], raw).decode(
        "latin-1", errors="replace"
    )


def _iter_stream_bodies(pdf_bytes: bytes):
    """Yield decoded content-stream bodies. Supports raw and
    /Filter /FlateDecode (zlib) streams; /Length-aware slicing so
    compressed bodies containing 'endstream' bytes don't truncate."""
    for om in _OBJ_STREAM_RE.finditer(pdf_bytes):
        obj_dict = om.group(1)
        start = om.end()
        lm = _LENGTH_RE.search(obj_dict)
        if lm:
            body = pdf_bytes[start:start + int(lm.group(1))]
        else:
            em = _ENDSTREAM_RE.search(pdf_bytes, start)
            if not em:
                continue
            body = pdf_bytes[start:em.start()]
        if b"FlateDecode" in obj_dict:
            try:
                body = zlib.decompress(body)
            except zlib.error:
                continue
        yield body


def extract_pdf_text(pdf_bytes: bytes) -> str:
    """Extract text runs from all content streams, reading-ordered.

    Each content stream is a page (reference pypdf path: per-page
    ``extract_text`` then join, parsers/pypdf/__main__.py:30-32): XY-cut
    orders runs *within* a page; pages concatenate in document order."""
    pages: list[str] = []
    for body in _iter_stream_bodies(pdf_bytes):
        runs: list[tuple[float, float, str]] = []  # (x, y_pdf, text)
        for m in _TJ_RE.finditer(body):
            # `a b c d x y Tm` — we match the trailing translate pair; the
            # fixture (and most simple producers) emit identity CTMs.
            runs.append((float(m.group(1)), float(m.group(2)),
                         _unescape(m.group(3))))
        for m in _TD_RE.finditer(body):
            runs.append((float(m.group(1)), float(m.group(2)),
                         _unescape(m.group(3))))
        if not runs:
            continue
        bboxes = np.array(
            [[x, PAGE_H - y, x + _RUN_W, PAGE_H - y + _LINE_H]
             for x, y, _ in runs]
        )
        order = reading_order(bboxes)
        pages.append("\n".join(runs[i][2] for i in order))
    return "\n".join(pages)
