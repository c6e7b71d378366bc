"""Deterministic formula→image renderer (the S7 render-sink analog).

The reference renders LaTeX formulas to PNG via pdflatex+magick with an
error-image fallback (utilities/formula_renderer.py:67-101 render,
:119-164 fallback). Neither binary exists in this sandbox, so the
reproducible surface is (a) a deterministic glyph-box render — one 6x12
dark box per non-space character of the delimiter-stripped formula on a
white canvas with 4px padding — and (b) the EXACT error contract: an
invalid formula (empty inner, unbalanced braces) yields None and the
caller emits the deterministic placeholder artifact instead of failing.

The geometry is a closed-form function of the formula text
(width = 8 + 6*len(inner), height = 20, ink = 72 * n_nonspace), so the
DuckDB oracle recomputes every artifact's metadata from the text alone —
the render is held to an arithmetic spec, not a pin.
"""

from __future__ import annotations

import numpy as np

from pdf_parse_bench_spark.kernels.textnorm import strip_delimiters

GLYPH_W = 6
GLYPH_H = 12
PAD = 4
INK = 40


def render_formula(text: str) -> np.ndarray | None:
    """Glyph-box render of one formula; None if the formula is invalid
    (the caller's signal to emit the error-placeholder artifact):
    empty inner after delimiter strip, or '{'/'}' counts differ."""
    _, inner, _ = strip_delimiters(text.strip())
    if not inner.strip():
        return None
    if inner.count("{") != inner.count("}"):
        return None
    n = len(inner)
    w = PAD * 2 + GLYPH_W * n
    h = PAD * 2 + GLYPH_H
    img = np.full((h, w), 255, dtype=np.uint8)
    for i, ch in enumerate(inner):
        if ch != " ":
            x0 = PAD + GLYPH_W * i
            img[PAD:PAD + GLYPH_H, x0:x0 + GLYPH_W] = INK
    return img
