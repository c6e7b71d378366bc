"""Deterministic span-level fixture generator.

Mirrors the reference's synthetic-corpus semantics (ground truth *by
construction*: /root/reference/src/pdf_parse_bench/synth_pdf/content.py:36-115,
interleaved text/inline-formula runs synth_pdf/latex.py:337-364, seeded config
synth_pdf/latex_config.py:127-163) without LaTeX: every fixture row is derived
deterministically from the driver tables at /root/testdata/sf*/ (seed mixing
doc_id, so the corpus is stable across runs and platforms).

Generated per scale-factor directory (``fixtures/<sfname>/``):

  spans_documents.parquet    the BASELINE.json `input_hint` table:
                             (doc_id, spans: array<struct<kind,text,media_ref,offset>>)
  golden_spans.parquet       exploded oracle (doc_id, offset, kind, text,
                             media_ref, complexity)
  parsed_markdown.parquet    per-doc markdown with *recoverable* parser-style
                             perturbations (delimiter swaps $$<->\\[..\\],
                             whitespace churn, grouped formulas, boilerplate
                             header/footer lines) — the extraction pipeline
                             must invert these exactly
  layout_blocks.parquet      shuffled dots.ocr-style blocks (doc_id, page_no,
                             bbox, category, text); only XY-cut recovers order
  golden_layout_spans.parquet  expected output of the layout path
  pdf_docs.parquet           (doc_id, pdf_bytes) minimal single-page PDFs
  golden_pdf_text.parquet    expected text of the PDF tokenizer path
  extraction_scores.parquet  scores fixture for aggregates/leaderboard

All perturbation classes are bounded so the deterministic kernels can recover
the golden sequence exactly (the reference's 15% edit-distance tolerance,
segment_extractor.py:631, is exercised separately in unit tests).
"""

from __future__ import annotations

import os
import random
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

GLOBAL_SEED = 20260816
FIXTURE_VERSION = "v44"  # bump to force regeneration

REPO_ROOT = Path(__file__).resolve().parent.parent
FIXTURES_ROOT = REPO_ROOT / "fixtures"

# Markdown rendering of grouped display-formula runs (reference groups
# consecutive formulas in aligned/gathered envs; segment_extractor.py:433-604
# splits them back). Our deterministic split inverts exactly these forms.
_ALIGNED_OPEN = "\\begin{aligned}"
_ALIGNED_CLOSE = "\\end{aligned}"

# Safe LaTeX inline-formula templates (no '$', no '\\\\' row separators so the
# grouped split on '\\\\' is unambiguous; cf. content.py:54-72 emission).
_INLINE_TEMPLATES = (
    "x_{{{a}}}^{{{b}}}",
    "\\alpha _{{{a}}}+\\beta _{{{b}}}",
    "e^{{-{a}\\lambda }}",
    "{{\\frac {{a_{{{a}}}}}{{b_{{{b}}}}}}}",
    "\\sum _{{k=0}}^{{{a}}}k^{{{b}}}",
    "\\langle \\sigma _{{{a}}}\\rangle ",
    "o(h_{{{a}}})/h\\rightarrow {b}",
    "Z\\cup \\{{x_{{{a}}}\\}}\\cup \\{{y_{{{b}}}\\}}",
    # raw-unicode dialect a sloppy parser emits — exercises the F1 long
    # tail (Greek, symbols, precomposed + combining accents,
    # sub/superscript digits; formula_renderer.py:33-65 semantics)
    "α_{{{a}}}×β^{{{b}}}",
    "π²+θ₃≤∞",
    "é_{{{a}}}≈é^{{{b}}}",
    "ü_{{{a}}}≠ü·Ω_{{{b}}}",
    # r4 long-tail ranges: Latin Extended precomposed, arrows,
    # relations, letterlike (branches of the extended map)
    "ā_{{{a}}}⊕šč^{{{b}}}⟶ℓ∘ø",
    "x≪ℏ⊗λ{a}∥ý↦ż≳{b}′",
    # r4b long-tail completion: blackboard/calligraphic, negated
    # relations, floors, big ops, typographic, dingbats, sub/sup letters
    "ℝⁿ∋x{a}⊔⌊yₖ⌋≰ℚ{b}",
    "“µΩ{a}”–€⨁ϑ□✓{b}",
    "đĝş{a}⟹ņǎį⊲ℋ{b}",
)

_DISPLAY_TEMPLATES = (
    "\\sum _{{i=0}}^{{{a}}}w_{{i}}x^{{i}}={b}",
    "\\int _{{0}}^{{{a}}}f(t)\\,dt=F({a})-F(0)+{b}",
    "\\lim _{{n\\to \\infty }}\\left(1+{{\\frac {{{a}}}{{n}}}}\\right)^{{n}}=e^{{{a}}}_{{{b}}}",
    "\\prod _{{j=1}}^{{{a}}}(1-q^{{j}})^{{{b}}}",
    "\\nabla \\cdot \\mathbf {{E}} ={{\\frac {{\\rho _{{{a}}}}}{{\\varepsilon _{{{b}}}}}}}",
)


def _doc_rng(doc_id: int) -> np.random.Generator:
    return np.random.default_rng([GLOBAL_SEED, int(doc_id)])


def _mk_text(words: list[str], rng: np.random.Generator) -> str:
    n = int(rng.integers(5, 13))
    start = int(rng.integers(0, max(1, len(words))))
    picked = [words[(start + i) % len(words)] for i in range(n)]
    s = " ".join(picked)
    return s[0].upper() + s[1:] + "."


def _mk_inline(rng: np.random.Generator) -> str:
    t = _INLINE_TEMPLATES[int(rng.integers(0, len(_INLINE_TEMPLATES)))]
    return "$" + t.format(a=int(rng.integers(0, 10)), b=int(rng.integers(0, 10))) + "$"


def _mk_display(rng: np.random.Generator) -> str:
    t = _DISPLAY_TEMPLATES[int(rng.integers(0, len(_DISPLAY_TEMPLATES)))]
    return "$$" + t.format(a=int(rng.integers(0, 10)), b=int(rng.integers(0, 10))) + "$$"


def _mk_table(rng: np.random.Generator, words: list[str]) -> tuple[str, str]:
    n_rows = int(rng.integers(2, 9))
    n_cols = int(rng.integers(2, 5))
    spec = "l" + "c" * (n_cols - 1)
    header = " & ".join(
        "\\textbf{%s}" % words[int(rng.integers(0, len(words)))].capitalize()
        for _ in range(n_cols)
    )
    rows = []
    for _ in range(n_rows):
        cells = [words[int(rng.integers(0, len(words)))].capitalize()]
        cells += [str(int(rng.integers(0, 1000))) for _ in range(n_cols - 1)]
        rows.append(" & ".join(cells) + " \\\\")
    body = "\n".join(rows)
    tab = (
        "\\begin{tabular}{%s}\n\\hline\n%s \\\\\n\\hline\n%s\n\\hline\n\\end{tabular}"
        % (spec, header, body)
    )
    complexity = "simple" if n_rows <= 3 else ("moderate" if n_rows <= 6 else "complex")
    return tab, complexity


def _mk_image(rng: np.random.Generator) -> str:
    # olmOCR figure-ref convention: page_<x>_<y>_<w>_<h>.png
    # (/root/reference/parsers/olmocr/__main__.py:59-61)
    x, y = int(rng.integers(0, 500)), int(rng.integers(0, 700))
    w, h = int(rng.integers(50, 400)), int(rng.integers(50, 300))
    return f"page_{x}_{y}_{w}_{h}.png"


def _mk_image_bytes(media_ref: str, doc_id: int) -> tuple[bytes, dict, "np.ndarray"]:
    """Deterministic PNG payload + pre-computed golden decode stats.

    Pixels are a gradient pattern seeded by the ref geometry and doc_id;
    encode→decode is lossless, so stats computed here on the raw array are
    the exact decode_media output (the formula_renderer.py:119-164 analog
    surface)."""
    from pdf_parse_bench_spark.kernels.png import encode_png

    x, y, w, h = (int(v) for v in media_ref[5:-4].split("_"))
    W = min(48, max(8, w // 8))
    H = min(40, max(8, h // 8))
    xx, yy = np.meshgrid(np.arange(W), np.arange(H))
    base = ((xx * 3 + yy * 7 + x + y + doc_id) % 256).astype(np.uint8)
    if (x + y + doc_id) % 2 == 0:
        img = base  # grayscale
    else:
        img = np.stack([base, (base.astype(int) * 2 + 13) % 256,
                        (base.astype(int) * 5 + 31) % 256], axis=-1
                       ).astype(np.uint8)
    png = encode_png(img)
    mean = float(img.mean()) / 255.0
    stats = {
        "width": W, "height": H,
        "channels": 1 if img.ndim == 2 else 3,
        "n_bytes": len(png),
        "mean_intensity": float(np.floor(mean * 1e6 + 0.5)) / 1e6,
        "status": "ok",
    }
    return png, stats, img


def _mk_jpeg_bytes(w: int, h: int, ch: int) -> bytes:
    """Minimal well-formed JPEG header stream (SOI + JFIF APP0 + SOF0 + EOI)
    carrying the given frame dimensions — enough for decode_media's
    metadata_only path (kernels/jpeg.py reads only the SOF segment)."""
    app0 = (b"\xff\xe0" + (16).to_bytes(2, "big")
            + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    comps = b"".join(bytes([i + 1, 0x11, 0]) for i in range(ch))
    sof0 = (b"\xff\xc0" + (8 + 3 * ch).to_bytes(2, "big") + b"\x08"
            + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([ch])
            + comps)
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


# canonical Huffman tables for the fixture baseline-JPEG encoder: all 12 DC
# categories at code length 4, AC table carrying only EOB (flat blocks have
# no AC coefficients) — legal per Annex C, trivially prefix-free
_JDC_COUNTS = bytes([0, 0, 0, 12] + [0] * 12)
_JDC_SYMS = bytes(range(12))
_JAC_COUNTS = bytes([0, 1] + [0] * 14)
_JAC_SYMS = bytes([0x00])


class _JpegBitWriter:
    """MSB-first bit packer with 0xFF byte stuffing and 1-bit padding."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, val: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((val >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def align(self) -> None:
        while self.n:
            self.write(1, 1)

    def marker(self, m: int) -> None:
        """Byte-align and emit a bare marker (RSTn) into the stream."""
        self.align()
        self.out += bytes([0xFF, m])

    def flush(self) -> bytes:
        self.align()
        return bytes(self.out)


def _mk_gray_jpeg(blocks: "np.ndarray", w: int, h: int,
                  restart_interval: int = 0) -> bytes:
    """Real baseline-DCT grayscale JPEG (SOF0, single scan) whose pixel
    content is flat 8x8 blocks. With an all-ones quant table a flat block
    is EXACTLY representable (DC = 8*(v-128), integer; all AC zero), so the
    decode is bit-exact to the pre-encode array — the golden mean in
    golden_media_stats is computed from that array, holding the kernel
    decoder (kernels/jpeg.py:jpeg_decode_gray) to real pixel output.
    `w`/`h` may be non-multiples of 8 to exercise decoder edge cropping.
    `restart_interval` > 0 emits a DRI segment and RSTn markers every
    that many MCUs (predictor reset, 0-7 cycling) — the web-crawl
    resync profile."""
    bh, bw = blocks.shape
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + (67).to_bytes(2, "big") + b"\x00" + bytes([1] * 64)
    out += (b"\xff\xc0" + (11).to_bytes(2, "big") + b"\x08"
            + h.to_bytes(2, "big") + w.to_bytes(2, "big")
            + bytes([1, 0x01, 0x11, 0x00]))
    out += (b"\xff\xc4" + (19 + len(_JDC_SYMS)).to_bytes(2, "big")
            + b"\x00" + _JDC_COUNTS + _JDC_SYMS)
    out += (b"\xff\xc4" + (19 + len(_JAC_SYMS)).to_bytes(2, "big")
            + b"\x10" + _JAC_COUNTS + _JAC_SYMS)
    if restart_interval:
        out += (b"\xff\xdd" + (4).to_bytes(2, "big")
                + restart_interval.to_bytes(2, "big"))
    out += b"\xff\xda" + (8).to_bytes(2, "big") + bytes([1, 0x01, 0x00, 0, 63, 0])
    bwr = _JpegBitWriter()
    pred = 0
    rst = 0
    done = 0
    total = bh * bw
    for by in range(bh):
        for bx in range(bw):
            dc = 8 * (int(blocks[by, bx]) - 128)
            d = dc - pred
            pred = dc
            t = abs(d).bit_length()
            bwr.write(t, 4)  # DC category: canonical code == symbol here
            if t:
                bwr.write(d if d >= 0 else d + (1 << t) - 1, t)
            bwr.write(0b00, 2)  # EOB
            done += 1
            if (restart_interval and done < total
                    and done % restart_interval == 0):
                bwr.marker(0xD0 + rst)
                rst = (rst + 1) & 0x07
                pred = 0
    out += bwr.flush() + b"\xff\xd9"
    return bytes(out)


# AC Huffman table for the progressive fixture encoder: EOBn symbols
# (r<<4 | 0, r = 0..14) plus the low AC categories / refinement
# new-significant symbols 0x01..0x03, all at code length 5 (canonical
# code == symbol index)
_JPAC_SYMS = bytes([r << 4 for r in range(15)] + [0x01, 0x02, 0x03])
_JPAC_COUNTS = bytes([0, 0, 0, 0, len(_JPAC_SYMS)] + [0] * 11)


def _jpac_write(bwr: "_JpegBitWriter", sym: int) -> None:
    idx = (sym >> 4) if (sym & 0x0F) == 0 else 14 + (sym & 0x0F)
    bwr.write(idx, 5)


def _mk_progressive_gray_jpeg(blocks: "np.ndarray", ac1: "np.ndarray",
                              w: int, h: int,
                              restart_interval: int = 0) -> bytes:
    """Progressive (SOF2) grayscale JPEG: flat 8x8 blocks plus one AC
    coefficient per block (zigzag position 1 — raster (0,1)), delivered
    over five scans exercising every progressive decode path of
    kernels/jpeg.py:

      1. DC initial        Ss=0 Se=0  Ah=0 Al=1 (successive approx)
      2. AC initial band   Ss=1 Se=5  Ah=0 Al=1 (EOB runs)
      3. DC refinement     Ss=0 Se=0  Ah=1 Al=0 (one bit per block)
      4. AC refinement     Ss=1 Se=5  Ah=1 Al=0 (correction bits,
         newly-significant +-1 coefficients, EOB runs with corrections)
      5. AC initial band   Ss=6 Se=63 Ah=0 Al=0 (pure EOB-run tail)

    With the all-ones quant table every coefficient is exactly
    representable, so the decode equals the documented IDCT arithmetic
    applied to (8*(v-128), ac) — the golden stats derive from that
    closed form, never from the decoder. `restart_interval` > 0 adds
    DRI/RSTn resync inside every scan."""
    bh, bw = blocks.shape
    total = bh * bw
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + (67).to_bytes(2, "big") + b"\x00" + bytes([1] * 64)
    out += (b"\xff\xc2" + (11).to_bytes(2, "big") + b"\x08"
            + h.to_bytes(2, "big") + w.to_bytes(2, "big")
            + bytes([1, 0x01, 0x11, 0x00]))
    out += (b"\xff\xc4" + (19 + len(_JDC_SYMS)).to_bytes(2, "big")
            + b"\x00" + _JDC_COUNTS + _JDC_SYMS)
    out += (b"\xff\xc4" + (19 + len(_JPAC_SYMS)).to_bytes(2, "big")
            + b"\x10" + _JPAC_COUNTS + _JPAC_SYMS)
    if restart_interval:
        out += (b"\xff\xdd" + (4).to_bytes(2, "big")
                + restart_interval.to_bytes(2, "big"))

    def sos_header(ss, se, ah, al):
        return (b"\xff\xda" + (8).to_bytes(2, "big")
                + bytes([1, 0x01, 0x00, ss, se, (ah << 4) | al]))

    dcs = [8 * (int(blocks[by, bx]) - 128)
           for by in range(bh) for bx in range(bw)]
    acs = [int(ac1[by, bx]) for by in range(bh) for bx in range(bw)]

    def scan(body):
        """Run `body(bwr, emit_restart)` per block index with restart
        bookkeeping; returns the entropy bytes."""
        bwr = _JpegBitWriter()
        rst = [0]

        def boundary(done):
            if (restart_interval and done < total
                    and done % restart_interval == 0):
                bwr.marker(0xD0 + rst[0])
                rst[0] = (rst[0] + 1) & 0x07
                return True
            return False

        body(bwr, boundary)
        return bwr.flush()

    def flush_eob(bwr, eob):
        while eob:
            run = min(eob, 32767)
            r = run.bit_length() - 1
            _jpac_write(bwr, r << 4)
            if r:
                bwr.write(run - (1 << r), r)
            eob -= run
        return 0

    # scan 1: DC initial, Al=1 (point transform = arithmetic shift)
    def dc_first(bwr, boundary):
        pred = 0
        for i, dc in enumerate(dcs):
            dct = dc >> 1
            d = dct - pred
            pred = dct
            t = abs(d).bit_length()
            bwr.write(t, 4)
            if t:
                bwr.write(d if d >= 0 else d + (1 << t) - 1, t)
            if boundary(i + 1):
                pred = 0
    out += sos_header(0, 0, 0, 1) + scan(dc_first)

    # scan 2: AC initial, band 1..5, Al=1
    def ac_first(bwr, boundary):
        eob = 0
        for i, v in enumerate(acs):
            v1 = (abs(v) >> 1) * (1 if v >= 0 else -1)
            if v1:
                eob = flush_eob(bwr, eob)
                t = abs(v1).bit_length()
                _jpac_write(bwr, t)  # run 0, category t
                bwr.write(v1 if v1 >= 0 else v1 + (1 << t) - 1, t)
            eob += 1  # band positions 2..5 are zero -> block ends in EOB
            if i + 1 < total and (restart_interval
                                  and (i + 1) % restart_interval == 0):
                eob = flush_eob(bwr, eob)
                boundary(i + 1)
        flush_eob(bwr, eob)
    out += sos_header(1, 5, 0, 1) + scan(ac_first)

    # scan 3: DC refinement, one bit per block
    def dc_refine(bwr, boundary):
        for i, dc in enumerate(dcs):
            bwr.write(dc & 1, 1)
            boundary(i + 1)
    out += sos_header(0, 0, 1, 0) + scan(dc_refine)

    # scan 4: AC refinement, band 1..5, Ah=1 Al=0
    def ac_refine(bwr, boundary):
        eob = 0
        pend = []  # correction bits owed after the next EOBn symbol

        def flush():
            nonlocal eob, pend
            eob = flush_eob(bwr, eob)
            for b in pend:
                bwr.write(b, 1)
            pend = []

        for i, v in enumerate(acs):
            hist = abs(v) >> 1
            if hist:  # already-nonzero: one correction bit, in EOB run
                eob += 1
                pend.append(abs(v) & 1)
            elif abs(v) == 1:  # newly significant at this precision
                flush()
                _jpac_write(bwr, 0x01)
                bwr.write(1 if v > 0 else 0, 1)  # sign
                eob += 1  # band 2..5 zero -> EOB
            else:
                eob += 1
            if i + 1 < total and (restart_interval
                                  and (i + 1) % restart_interval == 0):
                flush()
                boundary(i + 1)
        flush()
    out += sos_header(1, 5, 1, 0) + scan(ac_refine)

    # scan 5: AC initial, band 6..63, Al=0 — all zero, pure EOB runs
    def ac_tail(bwr, boundary):
        eob = 0
        for i in range(total):
            eob += 1
            if i + 1 < total and (restart_interval
                                  and (i + 1) % restart_interval == 0):
                eob = flush_eob(bwr, eob)
                boundary(i + 1)
        flush_eob(bwr, eob)
    out += sos_header(6, 63, 0, 0) + scan(ac_tail)

    out += b"\xff\xd9"
    return bytes(out)


# column profile added by a unit AC coefficient at zigzag position 1:
# A.T @ C @ A with only C[0,1] set gives sqrt(1/8)*0.5*cos((2j+1)pi/16)
# per column j, constant down rows (orthonormal IDCT closed form)
def _ac1_column_profile() -> "np.ndarray":
    j = np.arange(8)
    return np.sqrt(0.125) * 0.5 * np.cos((2 * j + 1) * np.pi / 16)


def _mk_progressive_gray_jpeg_with_stats(
        did: int) -> tuple[bytes, dict, "np.ndarray"]:
    """Deterministic progressive grayscale JPEG + golden decode stats.
    Expected pixels come from the closed-form IDCT of the exact
    coefficients (flat DC + one AC at zigzag 1): px[i,j] =
    clip(round(v + ac * colprofile[j])). AC values cycle through
    positive/negative, odd/even, +-1 and 0 so every refinement path
    (correction bit 0/1, newly-significant sign, EOB runs with and
    without pending bits) appears in the stream."""
    bh, bw = 2 + did % 3, 2 + (did // 3) % 4
    yy, xx = np.mgrid[0:bh, 0:bw]
    blocks = ((did * 19 + xx * 9 + yy * 5) % 200 + 20).astype(np.int64)
    ac_vals = np.array([0, 5, -3, 1, -1, 7, 0, -6], dtype=np.int64)
    ac1 = ac_vals[(did + yy * bw + xx) % 8]
    w, h = bw * 8 - did % 8, bh * 8 - (did * 5) % 8
    ri = (did // 2) % 3  # 0 / 1 / 2-MCU restart interval
    data = _mk_progressive_gray_jpeg(blocks, ac1, w, h,
                                     restart_interval=ri)
    col = _ac1_column_profile()
    # per-block: v + ac * col (constant down rows)
    px = np.zeros((bh * 8, bw * 8), dtype=np.float64)
    for by in range(bh):
        for bx in range(bw):
            px[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = (
                float(blocks[by, bx]) + float(ac1[by, bx]) * col[None, :])
    px = np.clip(np.round(px[:h, :w]), 0, 255)
    mean = float(px.mean()) / 255.0
    return data, {
        "width": w, "height": h, "channels": 1, "n_bytes": len(data),
        "mean_intensity": float(np.floor(mean * 1e6 + 0.5)) / 1e6,
        "status": "ok",
    }, px.astype(np.uint8)


def _mk_color_jpeg(y_mcu: "np.ndarray", cb_mcu: "np.ndarray",
                   cr_mcu: "np.ndarray", w: int, h: int,
                   subsample: bool) -> bytes:
    """Baseline YCbCr color JPEG with flat per-MCU channels (exact under
    the all-ones quant table, like _mk_gray_jpeg). `subsample` picks the
    chroma layout: True = 4:2:0 (2x2 Y blocks per MCU), False = 4:4:4,
    "422" = 4:2:2 (2x1), "440" = 4:4:0 (1x2). Arrays are
    (mcu_rows, mcu_cols) of channel values 0..255."""
    bh, bw = y_mcu.shape
    ys, xs = {True: (2, 2), False: (1, 1),
              "422": (1, 2), "440": (2, 1)}[subsample]
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + (67).to_bytes(2, "big") + b"\x00" + bytes([1] * 64)
    sof_comp = bytes([1, (xs << 4) | ys, 0, 2, 0x11, 0, 3, 0x11, 0])
    out += (b"\xff\xc0" + (17).to_bytes(2, "big") + b"\x08"
            + h.to_bytes(2, "big") + w.to_bytes(2, "big") + b"\x03"
            + sof_comp)
    out += (b"\xff\xc4" + (19 + len(_JDC_SYMS)).to_bytes(2, "big")
            + b"\x00" + _JDC_COUNTS + _JDC_SYMS)
    out += (b"\xff\xc4" + (19 + len(_JAC_SYMS)).to_bytes(2, "big")
            + b"\x10" + _JAC_COUNTS + _JAC_SYMS)
    out += (b"\xff\xda" + (12).to_bytes(2, "big")
            + bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    bwr = _JpegBitWriter()
    preds = [0, 0, 0]

    def put_block(comp: int, v: int) -> None:
        dc = 8 * (int(v) - 128)
        d = dc - preds[comp]
        preds[comp] = dc
        t = abs(d).bit_length()
        bwr.write(t, 4)
        if t:
            bwr.write(d if d >= 0 else d + (1 << t) - 1, t)
        bwr.write(0b00, 2)  # EOB

    for my in range(bh):
        for mx in range(bw):
            for _ in range(ys * xs):  # flat MCU: all Y blocks identical
                put_block(0, y_mcu[my, mx])
            put_block(1, cb_mcu[my, mx])
            put_block(2, cr_mcu[my, mx])
    out += bwr.flush() + b"\xff\xd9"
    return bytes(out)


def _mk_color_jpeg_with_stats(did: int) -> tuple[bytes, dict, "np.ndarray"]:
    """Deterministic flat-MCU color JPEG + golden decode stats. The
    expected RGB is the DECODER'S arithmetic spec applied to the exact
    YCbCr values (JFIF/BT.601 full-range, np.round, clip) — the channels
    are exact under the all-ones quant table, so the only arithmetic is
    the documented color conversion."""
    subsample = did % 2 == 0
    bh, bw = 1 + did % 3, 1 + (did // 2) % 3
    yy, xx = np.mgrid[0:bh, 0:bw]
    y_m = ((did * 17 + xx * 5 + yy * 3) % 256).astype(np.int64)
    cb_m = ((did * 7 + xx * 11) % 256).astype(np.int64)
    cr_m = ((did * 13 + yy * 9) % 256).astype(np.int64)
    mcu = 16 if subsample else 8
    w = bw * mcu - did % 5
    h = bh * mcu - (did * 3) % 5
    data = _mk_color_jpeg(y_m, cb_m, cr_m, w, h, subsample)
    # pixel-level expected channels (flat per MCU)
    ypx = np.repeat(np.repeat(y_m, mcu, 0), mcu, 1)[:h, :w].astype(np.float64)
    cbpx = np.repeat(np.repeat(cb_m, mcu, 0), mcu, 1)[:h, :w].astype(np.float64) - 128.0
    crpx = np.repeat(np.repeat(cr_m, mcu, 0), mcu, 1)[:h, :w].astype(np.float64) - 128.0
    r = ypx + 1.402 * crpx
    g = ypx - 0.344136 * cbpx - 0.714136 * crpx
    b = ypx + 1.772 * cbpx
    rgb = np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255)
    mean = float(rgb.mean()) / 255.0
    return data, {
        "width": w, "height": h, "channels": 3, "n_bytes": len(data),
        "mean_intensity": float(np.floor(mean * 1e6 + 0.5)) / 1e6,
        "status": "ok",
    }, rgb.astype(np.uint8)


def _mk_cmyk_jpeg(p0: "np.ndarray", p1: "np.ndarray", p2: "np.ndarray",
                  p3: "np.ndarray", w: int, h: int,
                  transform: int = 0) -> bytes:
    """Baseline 4-component Adobe JPEG (CMYK transform=0 or YCCK
    transform=2) with flat per-block channels, exact under the all-ones
    quant table like _mk_gray_jpeg. Arrays are (block_rows, block_cols)
    of STORED sample values 0..255 (Adobe-inverted convention — the
    APP14 marker is always written). All components 4:4:4:4."""
    bh, bw = p0.shape
    out = bytearray(b"\xff\xd8")
    # APP14 Adobe: 'Adobe' ver(2) flags0(2) flags1(2) transform(1)
    out += (b"\xff\xee" + (14).to_bytes(2, "big") + b"Adobe"
            + (100).to_bytes(2, "big") + b"\x00\x00\x00\x00"
            + bytes([transform]))
    out += b"\xff\xdb" + (67).to_bytes(2, "big") + b"\x00" + bytes([1] * 64)
    sof_comp = bytes([1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0, 4, 0x11, 0])
    out += (b"\xff\xc0" + (20).to_bytes(2, "big") + b"\x08"
            + h.to_bytes(2, "big") + w.to_bytes(2, "big") + b"\x04"
            + sof_comp)
    out += (b"\xff\xc4" + (19 + len(_JDC_SYMS)).to_bytes(2, "big")
            + b"\x00" + _JDC_COUNTS + _JDC_SYMS)
    out += (b"\xff\xc4" + (19 + len(_JAC_SYMS)).to_bytes(2, "big")
            + b"\x10" + _JAC_COUNTS + _JAC_SYMS)
    out += (b"\xff\xda" + (14).to_bytes(2, "big")
            + bytes([4, 1, 0x00, 2, 0x00, 3, 0x00, 4, 0x00, 0, 63, 0]))
    bwr = _JpegBitWriter()
    preds = [0, 0, 0, 0]

    def put_block(comp: int, v: int) -> None:
        dc = 8 * (int(v) - 128)
        d = dc - preds[comp]
        preds[comp] = dc
        t = abs(d).bit_length()
        bwr.write(t, 4)
        if t:
            bwr.write(d if d >= 0 else d + (1 << t) - 1, t)
        bwr.write(0b00, 2)  # EOB
    for by in range(bh):
        for bx in range(bw):
            for comp, plane in enumerate((p0, p1, p2, p3)):
                put_block(comp, plane[by, bx])
    out += bwr.flush() + b"\xff\xd9"
    return bytes(out)


def _mk_cmyk_jpeg_with_stats(did: int) -> tuple[bytes, dict, "np.ndarray"]:
    """Deterministic flat-block CMYK (even did) / YCCK (odd did) JPEG +
    golden decode stats. Expected RGB is the decoder's documented
    arithmetic applied to the exact stored channel values (channels are
    exact under the all-ones quant table): Adobe-inverted multiplicative
    composite R=(255-C)(255-K)/255 == s0*s3/255, with the BT.601 step
    first for YCCK."""
    ycck = did % 2 == 1
    bh, bw = 1 + did % 3, 1 + (did // 3) % 3
    yy, xx = np.mgrid[0:bh, 0:bw]
    p0 = ((did * 19 + xx * 7 + yy * 5) % 256).astype(np.int64)
    p1 = ((did * 11 + xx * 13) % 256).astype(np.int64)
    p2 = ((did * 23 + yy * 17) % 256).astype(np.int64)
    p3 = ((did * 29 + xx * 3 + yy * 7) % 256).astype(np.int64)
    w, h = bw * 8 - did % 5, bh * 8 - (did * 7) % 5
    data = _mk_cmyk_jpeg(p0, p1, p2, p3, w, h, transform=2 if ycck else 0)

    def px(p):
        return np.repeat(np.repeat(p, 8, 0), 8, 1)[:h, :w].astype(np.float64)
    s0, s1, s2, s3 = px(p0), px(p1), px(p2), px(p3)
    if ycck:
        y, cb, cr = s0, s1 - 128.0, s2 - 128.0
        s0 = y + 1.402 * cr
        s1 = y - 0.344136 * cb - 0.714136 * cr
        s2 = y + 1.772 * cb
    s0, s1, s2 = (np.clip(p, 0, 255) for p in (s0, s1, s2))
    rgb = np.clip(np.round(
        np.stack([s0 * s3, s1 * s3, s2 * s3], axis=-1) / 255.0), 0, 255)
    mean = float(rgb.mean()) / 255.0
    # channels = 3: the decoder composites CMYK to RGB, and decode_media
    # reports the decoded array's shape (not the SOF component count)
    return data, {
        "width": w, "height": h, "channels": 3, "n_bytes": len(data),
        "mean_intensity": float(np.floor(mean * 1e6 + 0.5)) / 1e6,
        "status": "ok",
    }, rgb.astype(np.uint8)


def _mk_jbig2_with_stats(did: int) -> tuple[bytes, int, int, float]:
    """Deterministic bilevel page behind JBIG2 (the non-CCITT scanned-PDF
    profile): (embedded-format bytes, w, h, mean). Rotates through the
    MQ generic-region templates 0-3 with TPGDON alternating, plus the
    MMR (T.6 inside JBIG2) variant — every profile kernels/jbig2
    decodes. Mean is exact from the pre-encode array."""
    from pdf_parse_bench_spark.kernels.jbig2 import jbig2_encode
    h, w = 12 + 2 * (did % 4), 28 + 4 * (did % 5)
    yy, xx = np.mgrid[0:h, 0:w]
    img = (((xx // (2 + did % 4) + yy // 3 + did) % 2) * 255).astype(
        np.uint8)
    if did % 2:  # duplicate rows give TPGDON real copy-row work
        img[1::4] = img[0::4][: img[1::4].shape[0]]
    if did % 5 == 0:
        data = jbig2_encode(img, mmr=True)
    else:
        data = jbig2_encode(img, mmr=False, template=did % 4,
                            tpgdon=did % 2 == 1)
    return data, w, h, float(img.astype(np.float64).mean()) / 255.0


def _mk_jpx_stub(w: int, h: int, jp2: bool) -> bytes:
    """JPEG 2000 stream with REAL headers (SIZ / ihdr carrying the true
    dims) and an undecodable body — the JPXDecode degradation fixture:
    pdf_image_stats must report decoded=False WITH these dims (read from
    the data, not the PDF dict). `jp2` picks the box container form;
    otherwise a raw codestream."""
    import struct as _struct
    nc = 3
    siz = (b"\xff\x4f\xff\x51"
           + _struct.pack(">HH", 38 + 3 * nc, 0)
           + _struct.pack(">IIII", w, h, 0, 0)      # Xsiz Ysiz XOsiz YOsiz
           + _struct.pack(">IIII", w, h, 0, 0)      # tile grid
           + _struct.pack(">H", nc)
           + b"\x07\x01\x01" * nc                   # 8-bit unsigned, 1x1
           + b"\xff\x93" + b"\x00" * 16)            # SOD then junk body
    if not jp2:
        return siz
    sig = b"\x00\x00\x00\x0cjP  \r\n\x87\n"
    ftyp = _struct.pack(">I", 20) + b"ftypjp2 " + b"\x00" * 4 + b"jp2 "
    ihdr = (_struct.pack(">I", 22) + b"ihdr"
            + _struct.pack(">IIH", h, w, nc) + b"\x07\x07\x00\x00")
    jp2h = _struct.pack(">I", 8 + len(ihdr)) + b"jp2h" + ihdr
    jp2c = _struct.pack(">I", 8 + len(siz)) + b"jp2c" + siz
    return sig + ftyp + jp2h + jp2c


def _mk_gray_jpeg_with_stats(did: int) -> tuple[bytes, dict, "np.ndarray"]:
    """Deterministic flat-block grayscale JPEG + its golden decode stats
    (mean from the pre-encode pixel array — exact, see _mk_gray_jpeg)."""
    bh, bw = 2 + did % 3, 2 + did % 4
    yy, xx = np.mgrid[0:bh, 0:bw]
    blocks = ((did * 13 + xx * 7 + yy * 11) % 256).astype(np.int64)
    w, h = bw * 8 - did % 8, bh * 8 - (did * 3) % 8
    data = _mk_gray_jpeg(blocks, w, h)
    px = np.repeat(np.repeat(blocks, 8, 0), 8, 1)[:h, :w]
    mean = float(px.mean()) / 255.0
    return data, {
        "width": w, "height": h, "channels": 1, "n_bytes": len(data),
        "mean_intensity": float(np.floor(mean * 1e6 + 0.5)) / 1e6,
        "status": "ok",
    }, px.astype(np.uint8)


def _placeholder_stats(n_bytes: int) -> dict:
    """Golden stats of decode_media's deterministic error-placeholder
    (64x64 mid-gray, 1px black border), computed INDEPENDENTLY from the
    spec arithmetic — 62*62 interior pixels at 128, border at 0 — not by
    calling the operator."""
    side, interior = 64, 62
    mean = 128.0 * interior * interior / (side * side) / 255.0
    return {
        "width": side, "height": side, "channels": 1, "n_bytes": n_bytes,
        "mean_intensity": float(np.floor(mean * 1e6 + 0.5)) / 1e6,
        "status": "decode_error",
    }


_THUMB_SIDE = 32  # mirrors operators/media.THUMB_SIDE


def _thumb_stats(img: "np.ndarray", status: str = "ok") -> dict:
    """Golden thumbnail stats, computed INDEPENDENTLY of the operator:
    the spec is k = ceil(max(h,w)/32) block-average with edge cells
    averaging only existing pixels, half-up uint8 rounding. Implemented
    here via np.add.reduceat (the operator uses an explicit cell loop) so
    operator and golden share only the documented arithmetic, not code.
    PNG byte counts use the shared kernels/png codec (established for the
    media fixtures)."""
    from pdf_parse_bench_spark.kernels.png import encode_png

    h, w = img.shape[:2]
    k = -(-max(h, w) // _THUMB_SIDE)
    chans = img if img.ndim == 3 else img[:, :, None]
    if k > 1:
        f = chans.astype(np.float64)
        iy = np.arange(0, h, k)
        ix = np.arange(0, w, k)
        tot = np.add.reduceat(np.add.reduceat(f, iy, axis=0), ix, axis=1)
        cy = np.minimum(iy + k, h) - iy
        cx = np.minimum(ix + k, w) - ix
        thumb = np.floor(tot / np.outer(cy, cx)[:, :, None] + 0.5
                         ).astype(np.uint8)
    else:
        thumb = chans.astype(np.uint8)
    if img.ndim == 2:
        thumb = thumb[:, :, 0]
    mean = float(thumb.astype(np.float64).mean()) / 255.0
    return {
        "thumb_w": int(thumb.shape[1]), "thumb_h": int(thumb.shape[0]),
        "thumb_mean": float(np.floor(mean * 1e6 + 0.5)) / 1e6,
        "thumb_png_bytes": len(encode_png(thumb)),
        "status": status,
    }


def _placeholder_px() -> "np.ndarray":
    """The error-placeholder pixel spec (64x64 mid-gray, 1px black
    border), re-stated here for golden computation."""
    img = np.full((64, 64), 128, dtype=np.uint8)
    img[0, :] = img[-1, :] = img[:, 0] = img[:, -1] = 0
    return img


def _mk_wav(sr: int, samples: "np.ndarray",
            audio_format: int = 1) -> bytes:
    """Minimal RIFF/WAVE writer (independent of kernels/wav.py): fmt +
    word-aligned data chunk; samples (n, ch) int16 little-endian."""
    import struct

    data = samples.astype("<i2").tobytes()
    ch = samples.shape[1]
    bits = 16
    block = ch * 2
    fmt = struct.pack("<HHIIHH", audio_format, ch, sr, sr * block,
                      block, bits)
    chunks = (b"fmt " + len(fmt).to_bytes(4, "little") + fmt
              + b"data" + len(data).to_bytes(4, "little") + data
              + (b"\x00" if len(data) & 1 else b""))
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


def _mk_wav_with_stats(did: int) -> tuple[bytes, dict]:
    """Deterministic PCM-16 WAV + golden stats computed here from the raw
    sample array (integer sums — the audio_features arithmetic spec)."""
    sr = (8000, 16000, 44100)[did % 3]
    ch = 1 + did % 2
    nf = 100 + (did * 37) % 1900
    t = np.arange(nf * ch, dtype=np.int64).reshape(nf, ch)
    samples = (((did * 7 + t * 13) % 4001) - 2000).astype(np.int16)
    a = np.abs(samples.astype(np.int64))
    mean_abs = float(a.sum()) / a.size
    return _mk_wav(sr, samples), {
        "channels": ch, "sample_rate": sr, "bits": 16,
        "n_samples": nf, "duration_ms": (nf * 1000) // sr,
        "mean_abs": float(np.floor(mean_abs * 1e3 + 0.5)) / 1e3,
        "peak": int(a.max()), "status": "ok",
    }


def _mk_y4m(w: int, h: int, frames: "np.ndarray",
            colorspace: str = "420") -> bytes:
    """Minimal YUV4MPEG2 writer (independent of kernels/y4m.py): frames
    is (n, h, w) uint8 luma; chroma planes written mid-gray (128)."""
    out = bytearray(b"YUV4MPEG2 W%d H%d F25:1 Ip A1:1 C%s\n"
                    % (w, h, colorspace.encode()))
    if colorspace == "420":
        chroma = bytes([128]) * (2 * ((w // 2) * (h // 2)))
    else:
        chroma = bytes([128]) * (2 * w * h)
    for f in frames:
        out += b"FRAME\n" + f.astype(np.uint8).tobytes() + chroma
    return bytes(out)


def _mk_y4m_with_stats(did: int) -> tuple[bytes, list[dict]]:
    """Deterministic Y4M clip + golden per-sampled-frame rows (stride 5,
    luma mean computed here from the raw planes — the video_frames
    arithmetic spec)."""
    cs = "420" if did % 2 == 0 else "444"
    w, h = 16 + 2 * (did % 5), 12 + 2 * (did % 4)
    nf = 3 + did % 17
    t = np.arange(nf)[:, None, None]
    yy = np.arange(h)[None, :, None]
    xx = np.arange(w)[None, None, :]
    frames = ((did * 29 + t * 31 + yy * 7 + xx * 3) % 256).astype(np.uint8)
    rows = []
    for fno in range(0, nf, 5):
        mean = float(frames[fno].astype(np.int64).sum()) / (w * h) / 255.0
        rows.append({"frame_no": fno, "width": w, "height": h,
                     "n_frames": nf, "fps_num": 25, "fps_den": 1,
                     "y_mean": float(np.floor(mean * 1e6 + 0.5)) / 1e6,
                     "status": "ok"})
    return _mk_y4m(w, h, frames, cs), rows


def _mk_web_text(doc_id: int, text: str) -> str:
    """Dirty web-crawl text for the PII-scrub surface: corpus words with
    deterministically injected emails / URLs / IPv4s / phone numbers
    (did-mod rules; some docs stay clean)."""
    words = text.split()[:30] or ["lorem"]
    bits = [" ".join(words[:10])]
    if doc_id % 2 == 0:
        bits.append(f"contact user{doc_id}@example{doc_id % 7}.org now")
    if doc_id % 3 == 0:
        # path repeats mod 7 (so distinct docs share a canonical URL —
        # the url_dedup surface); the query string keeps the full id,
        # which canonicalization must strip
        bits.append(f"see https://site{doc_id % 13}.example.com"
                    f"/p/{doc_id % 7}?q={doc_id} there")
    if doc_id % 5 == 0:
        bits.append(f"host 10.{doc_id % 256}.{(doc_id * 7) % 256}.{doc_id % 250} up")
    if doc_id % 4 == 0:
        bits.append(f"call +4{doc_id % 10} 555 01{doc_id % 10} 4{doc_id % 10}32 today")
    bits.append(" ".join(words[10:20]))
    return " ".join(b for b in bits if b)


_KIND_CODES = ("text", "inline-formula", "display-formula", "table", "image")
_KIND_P = np.array([0.46, 0.24, 0.14, 0.09, 0.07])


def generate_doc_spans(doc_id: int, text: str) -> list[dict]:
    """Ordered span sequence for one document (ground truth by construction)."""
    rng = _doc_rng(doc_id)
    words = text.split() or ["lorem"]
    n = int(rng.integers(10, 41))
    if doc_id % 101 == 0:  # skew fixture: ~1% of docs get ~50x the median
        n = int(rng.integers(1150, 1350))
    spans = []
    for i in range(n):
        kind = "text" if i == 0 else str(rng.choice(_KIND_CODES, p=_KIND_P))
        if kind == "text":
            spans.append({"kind": kind, "text": _mk_text(words, rng),
                          "media_ref": "", "complexity": None})
        elif kind == "inline-formula":
            spans.append({"kind": kind, "text": _mk_inline(rng),
                          "media_ref": "", "complexity": None})
        elif kind == "display-formula":
            spans.append({"kind": kind, "text": _mk_display(rng),
                          "media_ref": "", "complexity": None})
        elif kind == "table":
            tab, cx = _mk_table(rng, words)
            spans.append({"kind": kind, "text": tab,
                          "media_ref": "", "complexity": cx})
        else:
            spans.append({"kind": kind, "text": "",
                          "media_ref": _mk_image(rng), "complexity": None})
    for i, s in enumerate(spans):
        s["offset"] = i
    return spans


# ---------------------------------------------------------------------------
# Markdown rendering with recoverable perturbations
# ---------------------------------------------------------------------------

def _boilerplate_lines(source: str) -> tuple[str, str]:
    header = f"{source} preprint series — working draft"
    footer = f"page 1 · {source} · all rights reserved"
    return header, footer


def render_markdown(doc_id: int, spans: list[dict], source: str) -> str:
    """Render spans to parser-style markdown; every perturbation is invertible
    by the extraction kernel (delimiter normalization M7, grouped split J5,
    boilerplate strip P2, whitespace churn F2/F3)."""
    rng = np.random.default_rng([GLOBAL_SEED, 7, int(doc_id)])
    blocks: list[str] = []
    i = 0
    n = len(spans)
    while i < n:
        s = spans[i]
        k = s["kind"]
        if k == "text":
            # paragraph: text followed by alternating inline/text run
            parts = [s["text"]]
            j = i + 1
            while j < n:
                kj = spans[j]["kind"]
                prev = spans[j - 1]["kind"]
                joinable = (
                    (prev == "text" and kj == "inline-formula")
                    or (prev == "inline-formula" and kj in ("inline-formula", "text"))
                )
                if not joinable:
                    break
                parts.append(spans[j]["text"])
                j += 1
            blocks.append(" ".join(parts))
            i = j
        elif k == "inline-formula":
            blocks.append(s["text"])  # own paragraph
            i += 1
        elif k == "display-formula":
            # collect the run of consecutive display formulas
            j = i
            while j < n and spans[j]["kind"] == "display-formula":
                j += 1
            run = [sp["text"][2:-2] for sp in spans[i:j]]  # inner content
            if len(run) >= 2 and rng.random() < 0.5:
                # grouped (reference: aligned/gathered envs, J5)
                joined = " \\\\ ".join(run)
                if rng.random() < 0.5:
                    joined = f"{_ALIGNED_OPEN} {joined} {_ALIGNED_CLOSE}"
                blocks.append(_render_display(joined, rng))
            else:
                for content in run:
                    blocks.append(_render_display(content, rng))
            i = j
        elif k == "table":
            blocks.append(s["text"])
            i += 1
        else:  # image
            alt = "figure" if rng.random() < 0.7 else ""
            blocks.append(f"![{alt}]({s['media_ref']})")
            i += 1
    header, footer = _boilerplate_lines(source)
    body_blocks = []
    if rng.random() < 0.8:
        body_blocks.append(header)
    body_blocks.extend(blocks)
    if rng.random() < 0.8:
        body_blocks.append(footer)
    seps = ["\n\n", "\n\n\n", "\n \n"]
    out = []
    for b in body_blocks:
        out.append(b)
        out.append(seps[int(rng.integers(0, 3))])
    return "".join(out).rstrip() + "\n"


def _render_display(content: str, rng: np.random.Generator) -> str:
    """Perturbed display-math rendering: \\[..\\] vs $$..$$, padding churn."""
    pad = " " if rng.random() < 0.5 else "\n"
    if rng.random() < 0.4:
        return f"\\[{pad}{content}{pad}\\]"
    return f"$${pad}{content}{pad}$$" if rng.random() < 0.5 else f"$${content}$$"


# ---------------------------------------------------------------------------
# Noisy-markdown fixture: exercises the fuzzy alignment path (J2) end-to-end.
# ~35% of formula spans get in-formula character noise bounded well under the
# 15% edit-distance tolerance (segment_extractor.py:631). The GUIDED aligner
# must return the *markdown's* (noisy) variant — golden_noisy_spans records
# exactly that expectation, so the oracle is exact.
# ---------------------------------------------------------------------------

_NOISE_CHARS = "abcxyz019+-"


def _perturb_formula(content: str, rng: np.random.Generator) -> str:
    """Bounded character noise on safe positions (never touches '$', '\\',
    '{', '}' so delimiters/macros stay intact and normalization-for-matching
    still lands within tolerance)."""
    chars = list(content)
    safe = [i for i, ch in enumerate(chars)
            if ch not in "\\${}[]" and not ch.isspace()]
    if not safe:
        return content
    n_edits = max(1, int(0.06 * len(safe)))
    for _ in range(n_edits):
        i = safe[int(rng.integers(0, len(safe)))]
        op = rng.random()
        if op < 0.5:  # substitute
            chars[i] = _NOISE_CHARS[int(rng.integers(0, len(_NOISE_CHARS)))]
        else:  # insert after
            chars[i] = chars[i] + _NOISE_CHARS[int(rng.integers(0, len(_NOISE_CHARS)))]
    return "".join(chars)


def render_noisy(doc_id: int, spans: list[dict]) -> tuple[str, list[dict]]:
    """Markdown with in-formula noise + the expected guided-alignment output
    (noisy formulas verbatim; text/table/image spans unchanged). No grouped
    runs, no boilerplate — isolates the fuzzy path."""
    rng = np.random.default_rng([GLOBAL_SEED, 53, int(doc_id)])
    expected: list[dict] = []
    blocks: list[str] = []
    i, n = 0, len(spans)
    while i < n:
        s = spans[i]
        k = s["kind"]
        if k == "text":
            parts = [s["text"]]
            exp_run = [dict(s)]
            j = i + 1
            while j < n:
                kj = spans[j]["kind"]
                prev = spans[j - 1]["kind"]
                joinable = (
                    (prev == "text" and kj == "inline-formula")
                    or (prev == "inline-formula" and kj in ("inline-formula", "text"))
                )
                if not joinable:
                    break
                sj = dict(spans[j])
                if kj == "inline-formula" and rng.random() < 0.35:
                    inner = _perturb_formula(sj["text"][1:-1], rng)
                    sj = {**sj, "text": "$" + inner + "$"}
                parts.append(sj["text"])
                exp_run.append(sj)
                j += 1
            blocks.append(" ".join(parts))
            expected.extend(exp_run)
            i = j
        elif k == "inline-formula":
            sj = dict(s)
            if rng.random() < 0.35:
                sj["text"] = "$" + _perturb_formula(s["text"][1:-1], rng) + "$"
            blocks.append(sj["text"])
            expected.append(sj)
            i += 1
        elif k == "display-formula":
            sj = dict(s)
            if rng.random() < 0.35:
                sj["text"] = "$$" + _perturb_formula(s["text"][2:-2], rng) + "$$"
            blocks.append(sj["text"])
            expected.append(sj)
            i += 1
        elif k == "table":
            blocks.append(s["text"])
            expected.append(dict(s))
            i += 1
        else:
            blocks.append(f"![fig]({s['media_ref']})")
            expected.append(dict(s))
            i += 1
    for idx, e in enumerate(expected):
        e["offset"] = idx
    return "\n\n".join(blocks) + "\n", expected


# ---------------------------------------------------------------------------
# HTML rendering (structured-markup entry, M4/GROBID analog) — invertible by
# kernels/htmldoc.parse_html: boilerplate as header/nav/footer/script tags,
# math in class-tagged spans/divs, tables in <pre class="tabular">.
# ---------------------------------------------------------------------------

def render_html(doc_id: int, spans: list[dict], source: str) -> str:
    import html as _html

    rng = np.random.default_rng([GLOBAL_SEED, 37, int(doc_id)])
    esc = _html.escape
    header, footer = _boilerplate_lines(source)
    seps = ["\n", "\n  \n", "\n\n"]

    def sep() -> str:
        return seps[int(rng.integers(0, 3))]

    parts = [
        f"<html><head><title>{esc(source)}</title>",
        "<style>body { margin: 0; }</style>",
        "<script>var tracker = 1;</script></head>",
        "<body>",
    ]
    if rng.random() < 0.85:
        parts.append(f"<header>{esc(header)}</header>")
    if rng.random() < 0.7:
        parts.append('<nav><a href="#">home</a> <a href="#">about</a></nav>')
    parts.append("<main>")
    i, n = 0, len(spans)
    while i < n:
        s = spans[i]
        k = s["kind"]
        if k == "text":
            pieces = [esc(s["text"])]
            j = i + 1
            while j < n:
                kj = spans[j]["kind"]
                prev = spans[j - 1]["kind"]
                joinable = (
                    (prev == "text" and kj == "inline-formula")
                    or (prev == "inline-formula" and kj in ("inline-formula", "text"))
                )
                if not joinable:
                    break
                if kj == "inline-formula":
                    pieces.append(f'<span class="math">{esc(spans[j]["text"])}</span>')
                else:
                    pieces.append(esc(spans[j]["text"]))
                j += 1
            parts.append("<p>" + " ".join(pieces) + "</p>")
            i = j
        elif k == "inline-formula":
            parts.append(f'<p><span class="math">{esc(s["text"])}</span></p>')
            i += 1
        elif k == "display-formula":
            inner = s["text"][2:-2]
            pad = " " if rng.random() < 0.5 else "\n"
            body = (
                f"\\[{pad}{inner}{pad}\\]" if rng.random() < 0.3
                else f"$${pad}{inner}{pad}$$"
            )
            parts.append(f'<div class="math">{esc(body)}</div>')
            i += 1
        elif k == "table":
            parts.append(f'<pre class="tabular">{esc(s["text"])}</pre>')
            i += 1
        else:
            tagend = "/>" if rng.random() < 0.5 else ">"
            parts.append(f'<img src="{s["media_ref"]}"{tagend}')
            i += 1
    parts.append("</main>")
    if rng.random() < 0.85:
        parts.append(f"<footer>{esc(footer)}</footer>")
    parts.append("</body></html>")
    return sep().join(parts)


def render_tei(doc_id: int, spans: list[dict], source: str) -> str:
    """GROBID-style TEI-XML rendering (parsers/grobid/__main__.py:22-47):
    first span becomes the teiHeader abstract, the rest body <div> sections
    with <head>/<p>/<formula>/<figure> children; ~30% of divs carry a
    headnote <note> (chrome the walker must skip); inline formulas embed in
    mixed-content paragraphs; display formulas get whitespace padding the
    M7 normalization must strip."""
    import html as _html

    esc = _html.escape
    rng = np.random.default_rng([GLOBAL_SEED, 41, int(doc_id)])
    header_line, footer_line = _boilerplate_lines(source)
    parts = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        '<TEI xmlns="http://www.tei-c.org/ns/1.0">',
        "<teiHeader><fileDesc><titleStmt><title>%s</title></titleStmt></fileDesc>"
        % esc(source),
        "<profileDesc><abstract><p>%s</p></abstract></profileDesc></teiHeader>"
        % esc(spans[0]["text"]),
        "<text><body>",
    ]
    body_spans = spans[1:]
    i, n = 0, len(body_spans)
    while i < n:
        group = body_spans[i:i + int(rng.integers(5, 12))]
        i += len(group)
        parts.append("<div>")
        if rng.random() < 0.3:
            parts.append('<note place="headnote">%s</note>' % esc(header_line))
        first = True
        j = 0
        while j < len(group):
            s = group[j]
            k = s["kind"]
            if k == "text":
                if first and rng.random() < 0.5:
                    parts.append("<head>%s</head>" % esc(s["text"]))
                    j += 1
                else:  # mixed paragraph: join the text/inline-formula run
                    pieces = [esc(s["text"])]
                    jj = j + 1
                    while jj < len(group):
                        kj = group[jj]["kind"]
                        prev = group[jj - 1]["kind"]
                        joinable = (
                            (prev == "text" and kj == "inline-formula")
                            or (prev == "inline-formula"
                                and kj in ("inline-formula", "text"))
                        )
                        if not joinable:
                            break
                        if kj == "inline-formula":
                            pieces.append('<formula rend="inline">%s</formula>'
                                          % esc(group[jj]["text"][1:-1]))
                        else:
                            pieces.append(esc(group[jj]["text"]))
                        jj += 1
                    parts.append("<p>" + " ".join(pieces) + "</p>")
                    j = jj
            elif k == "inline-formula":
                parts.append('<p><formula rend="inline">%s</formula></p>'
                             % esc(s["text"][1:-1]))
                j += 1
            elif k == "display-formula":
                pad = " " if rng.random() < 0.5 else "\n"
                parts.append("<formula>%s</formula>"
                             % esc(pad + s["text"][2:-2] + pad))
                j += 1
            elif k == "table":
                parts.append('<figure type="table"><table>%s</table></figure>'
                             % esc(s["text"]))
                j += 1
            else:
                parts.append('<figure><graphic url="%s"/></figure>'
                             % esc(s["media_ref"]))
                j += 1
            first = False
        if rng.random() < 0.2:
            parts.append('<note place="footnote">%s</note>' % esc(footer_line))
        parts.append("</div>")
    parts.append("</body></text></TEI>")
    return "\n".join(parts)


# ---------------------------------------------------------------------------
# Layout-block fixture (dots.ocr block model + XY-cut recoverable geometry)
# ---------------------------------------------------------------------------

PAGE_W, PAGE_H = 595.0, 842.0  # A4 pt (reference synth_pdf/latex.py:239)
_TEXT_CATS = ("Text", "List-item", "Caption", "Section-header")

CATEGORY_TO_KIND = {
    "Caption": "text", "Footnote": "text", "Formula": "display-formula",
    "List-item": "text", "Picture": "image", "Section-header": "text",
    "Table": "table", "Text": "text", "Title": "text",
}


def generate_layout(doc_id: int, spans: list[dict], source: str):
    """Blocks (shuffled) + golden ordered spans for the layout path.

    Geometry guarantees XY-cut recoverability: one-column pages have >=8pt
    y-gaps between blocks; two-column pages have a 20pt mid gutter (wider
    than any y-gap, so the vertical cut wins first).
    """
    rng = np.random.default_rng([GLOBAL_SEED, 13, int(doc_id)])
    content = [s for s in spans if s["kind"] in ("text", "display-formula", "table", "image")]
    content = content[:120]  # cap pages for skew docs
    two_col = bool(rng.random() < 0.4)
    header, footer = _boilerplate_lines(source)

    blocks = []   # (page_no, bbox, category, text)
    golden = []   # ordered kept spans
    page_no, y = 0, 60.0
    col = 0
    col_x = [(50.0, 287.0), (307.0, 545.0)] if two_col else [(50.0, 545.0)]

    def new_page_chrome(p):
        blocks.append((p, [50.0, 18.0, 545.0, 34.0], "Page-header", header))
        blocks.append((p, [50.0, 806.0, 545.0, 820.0], "Page-footer", footer))

    new_page_chrome(0)
    for idx, s in enumerate(content):
        h = float(rng.integers(14, 40))
        if y + h > 780.0:
            if two_col and col == 0:
                col, y = 1, 60.0
            else:
                page_no += 1
                col, y = 0, 60.0
                new_page_chrome(page_no)
        x1, x2 = col_x[col]
        if s["kind"] == "text":
            cat = "Title" if idx == 0 else str(
                rng.choice(_TEXT_CATS + ("Footnote",), p=[0.6, 0.15, 0.1, 0.1, 0.05]))
            txt = s["text"]
        elif s["kind"] == "display-formula":
            cat, txt = "Formula", s["text"]
        elif s["kind"] == "table":
            cat, txt = "Table", s["text"]
        else:
            cat, txt = "Picture", s["media_ref"]
        blocks.append((page_no, [x1, y, x2, y + h], cat, txt))
        golden.append({"kind": CATEGORY_TO_KIND[cat],
                       "text": s["text"] if cat != "Picture" else "",
                       "media_ref": s["media_ref"]})
        y += h + 8.0 + float(rng.integers(0, 5))
    for i, g in enumerate(golden):
        g["offset"] = i
    # shuffle so only geometry can recover reading order
    order = list(range(len(blocks)))
    random.Random(doc_id * 7919 + 11).shuffle(order)
    blocks = [blocks[i] for i in order]
    return blocks, golden


# ---------------------------------------------------------------------------
# Minimal single-page(ish) PDF fixture (uncompressed content streams)
# ---------------------------------------------------------------------------

def _pdf_escape(s: str, rng=None) -> str:
    """Literal-string escape; chars >= 127 (and optionally a random ASCII
    char) are emitted as 1-3 digit octal escapes, exercising the real
    literal-string grammar (PDF 32000-1 §7.3.4.2)."""
    out = []
    oct_idx = -1
    if rng is not None and len(s) > 4 and rng.random() < 0.3:
        oct_idx = int(rng.integers(0, len(s)))
    for i, ch in enumerate(s):
        b = ord(ch)
        if ch in "()\\":
            out.append("\\" + ch)
        elif b > 255:
            out.append("?")  # matches latin-1 errors='replace' of old path
        elif b >= 127 or b < 32 or i == oct_idx:
            out.append("\\%03o" % b)
        else:
            out.append(ch)
    return "".join(out)


# Decoration line rendered via the /Differences font F2: bytes \200 \201 \202
# decode to bullet / emdash / eacute (AGL names) — golden text below.
_DECO_STREAM = "(\\200 Synthetic digest \\201 r\\202sum\\202) Tj"
_DECO_TEXT = "• Synthetic digest — résumé"

# Second decoration variant via font F3 whose /ToUnicode CMap maps
# \240→α \242→∑ \260→① (bfchar + bfrange, PDF 32000-1 §9.10.3).
_DECO2_STREAM = "(\\240\\242 weekly digest \\260) Tj"
_DECO2_TEXT = "α∑ weekly digest ①"
_TOUNICODE_CMAP = (
    b"/CIDInit /ProcSet findresource begin\nbegincmap\n"
    b"1 begincodespacerange <00> <FF> endcodespacerange\n"
    b"2 beginbfchar\n<A0> <03B1>\n<A2> <2211>\nendbfchar\n"
    b"1 beginbfrange\n<B0> <B2> <2460>\nendbfrange\n"
    b"endcmap\nend"
)

# Third decoration variant via Type0/Identity-H font F4 (2-byte CID codes):
# CMap maps <0100>..<0103> to CJK and an identity bfrange for ASCII.
_DECO3_TEXT = "数据 pipeline 测试"
_DECO3_CODES = [0x0100, 0x0101] + [ord(c) for c in " pipeline "] + [0x0102, 0x0103]
_DECO3_STREAM = "<" + "".join(f"{c:04X}" for c in _DECO3_CODES) + "> Tj"
_CID_CMAP = (
    b"begincmap\n1 begincodespacerange <0000> <FFFF> endcodespacerange\n"
    b"4 beginbfchar\n<0100> <6570>\n<0101> <636E>\n<0102> <6D4B>\n"
    b"<0103> <8BD5>\nendbfchar\n"
    b"1 beginbfrange\n<0020> <007E> <0020>\nendbfrange\nendcmap"
)


def _tj_line(ln: str, rng) -> str:
    """Render one line as a TJ array: word gaps become -250/1000 em kerning
    (re-spaced by the extractor), intra-word splits get small kerns (no
    space), and ~30% of chunks are hex strings."""
    parts: list[tuple[str, int | None]] = []
    sp = [i for i in range(1, len(ln) - 1)
          if ln[i] == " " and ln[i - 1] != " " and ln[i + 1] != " "]
    if sp and len(ln) > 8:
        i = int(sp[int(rng.integers(0, len(sp)))])
        a, b = ln[:i], ln[i + 1:]
        k = len(a) // 2
        if len(a) > 4 and rng.random() < 0.5 and a[k - 1] != " " and a[k] != " ":
            parts = [(a[:k], -40), (a[k:], -250), (b, None)]
        else:
            parts = [(a, -250), (b, None)]
    else:
        parts = [(ln, None)]
    els = []
    for chunk, kern in parts:
        if rng.random() < 0.3 and all(ord(c) < 256 for c in chunk):
            els.append("<" + chunk.encode("latin-1").hex() + ">")
        else:
            els.append("(" + _pdf_escape(chunk, rng) + ")")
        if kern is not None:
            els.append(str(kern))
    return "[" + " ".join(els) + "] TJ"


def _wrap_to_width(lines: list[str], size: float, max_w: float) -> list[str]:
    """Greedy word-wrap so no emitted line's glyph box (0.5·size·len pt, the
    extractor's advance model) overflows the column width — real typesetting
    never crosses the gutter, so the fixture must not either."""
    max_chars = max(8, int(max_w / (0.5 * size)))
    out: list[str] = []
    for ln in lines:
        if len(ln) <= max_chars:
            out.append(ln)
            continue
        cur: list[str] = []
        cur_len = 0
        for word in ln.split(" "):
            if len(word) > max_chars:  # unbreakable over-long token:
                if cur:                # hard-break so no glyph box can
                    out.append(" ".join(cur))  # cross the column gutter
                    cur, cur_len = [], 0
                for k in range(0, len(word), max_chars):
                    piece = word[k:k + max_chars]
                    if len(piece) == max_chars:
                        out.append(piece)
                    else:
                        cur, cur_len = [piece], len(piece)
                continue
            add = len(word) + (1 if cur else 0)
            if cur and cur_len + add > max_chars:
                out.append(" ".join(cur))
                cur, cur_len = [word], len(word)
            else:
                cur.append(word)
                cur_len += add
        if cur:
            out.append(" ".join(cur))
    return out


def _emit_column(x: float, y0: float, col_lines: list[str], rng,
                 size: float = 12.0,
                 max_w: float = 460.0) -> tuple[list[str], list[str]]:
    """Emit one column's text ops in one of five content-stream dialects at
    the given font size, word-wrapped to the column width. Returns
    (ops, emitted_lines) — emitted_lines is what the extractor should yield
    (wrap included), the golden for this column."""
    col_lines = _wrap_to_width(col_lines, size, max_w)
    if not col_lines:
        return [], []
    lead = size + 2.0
    style = ("tm", "td", "tstar", "tj", "hex")[int(rng.integers(0, 5))]
    ops: list[str] = []
    if style == "tm":  # one BT/ET per line, absolute Tm positioning
        y = y0
        for ln in col_lines:
            ops.append(f"BT /F1 {size:g} Tf 1 0 0 1 {x:.1f} {y:.1f} Tm "
                       f"({_pdf_escape(ln, rng)}) Tj ET")
            y -= lead
    elif style == "td":  # single BT, relative Td/TD line moves
        body = [f"BT /F1 {size:g} Tf 1 0 0 1 {x:.1f} {y0:.1f} Tm "
                f"({_pdf_escape(col_lines[0], rng)}) Tj"]
        for j, ln in enumerate(col_lines[1:]):
            mv = f"0 -{lead:g} TD" if j == 0 else f"0 -{lead:g} Td"
            body.append(f"{mv} ({_pdf_escape(ln, rng)}) Tj")
        ops.append(" ".join(body) + " ET")
    elif style == "tstar":  # TL leading + T*/' next-line shows
        body = [f"BT /F1 {size:g} Tf {lead:g} TL 1 0 0 1 {x:.1f} {y0:.1f} Tm "
                f"({_pdf_escape(col_lines[0], rng)}) Tj"]
        for ln in col_lines[1:]:
            body.append(f"({_pdf_escape(ln, rng)}) '")
        ops.append(" ".join(body) + " ET")
    elif style == "tj":  # TJ arrays with kerning + hex chunks
        body = [f"BT /F1 {size:g} Tf 1 0 0 1 {x:.1f} {y0:.1f} Tm "
                + _tj_line(col_lines[0], rng)]
        for ln in col_lines[1:]:
            body.append(f"0 -{lead:g} Td " + _tj_line(ln, rng))
        ops.append(" ".join(body) + " ET")
    else:  # hex strings via Tj
        y = y0
        for ln in col_lines:
            if all(ord(c) < 256 for c in ln):
                shown = "<" + ln.encode("latin-1").hex() + ">"
            else:
                shown = "(" + _pdf_escape(ln, rng) + ")"
            ops.append(f"BT /F1 {size:g} Tf 1 0 0 1 {x:.1f} {y:.1f} Tm "
                       f"{shown} Tj ET")
            y -= lead
    return ops, col_lines


def _assemble_modern_pdf(objs: list[bytes], use_predictor: bool) -> bytes:
    """PDF 1.5 file layout: every non-stream object packed into one /ObjStm,
    indexed by a cross-reference STREAM (type-2 entries; /W [1 4 2]),
    optionally /Predictor 12 (PNG Up) encoded — the layout modern producers
    emit. Object numbers are preserved; ObjStm = K+1, XRef = K+2."""
    import zlib as _zlib

    k = len(objs)
    objstm_num, xref_num = k + 1, k + 2
    packed = [(i + 1, b) for i, b in enumerate(objs) if b"stream" not in b]
    streams = [(i + 1, b) for i, b in enumerate(objs) if b"stream" in b]
    packed_idx = {num: j for j, (num, _) in enumerate(packed)}

    header_parts, off = [], 0
    for num, b in packed:
        header_parts.append(b"%d %d" % (num, off))
        off += len(b) + 1
    hdr = b" ".join(header_parts) + b" "
    objstm_body = hdr + b" ".join(b for _, b in packed)
    z = _zlib.compress(objstm_body)

    out = bytearray(b"%PDF-1.5\n")
    offsets: dict[int, int] = {}
    for num, b in streams:
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + b + b"\nendobj\n"
    offsets[objstm_num] = len(out)
    out += (b"%d 0 obj\n<< /Type /ObjStm /N %d /First %d /Length %d"
            b" /Filter /FlateDecode >>\nstream\n%s\nendstream\nendobj\n"
            % (objstm_num, len(packed), len(hdr), len(z), z))

    rows = []
    for num in range(xref_num + 1):
        if num == 0:
            rows.append(b"\x00" + (0).to_bytes(4, "big") + b"\xff\xff")
        elif num in packed_idx:
            rows.append(b"\x02" + objstm_num.to_bytes(4, "big")
                        + packed_idx[num].to_bytes(2, "big"))
        elif num in offsets:
            rows.append(b"\x01" + offsets[num].to_bytes(4, "big") + b"\x00\x00")
        else:  # the xref stream itself
            rows.append(b"\x01" + len(out).to_bytes(4, "big") + b"\x00\x00")
    if use_predictor:
        enc = bytearray()
        prev = bytes(7)
        for r in rows:
            enc += b"\x02" + bytes((r[j] - prev[j]) & 0xFF for j in range(7))
            prev = r
        xdata = _zlib.compress(bytes(enc))
        parms = b" /DecodeParms << /Predictor 12 /Columns 7 >>"
    else:
        xdata = _zlib.compress(b"".join(rows))
        parms = b""
    xref_at = len(out)
    out += (b"%d 0 obj\n<< /Type /XRef /Size %d /W [1 4 2] /Index [0 %d]"
            b" /Root 1 0 R /Filter /FlateDecode%s /Length %d >>\nstream\n%s"
            b"\nendstream\nendobj\n"
            % (xref_num, xref_num + 1, xref_num + 1, parms, len(xdata), xdata))
    out += b"startxref\n%d\n%%%%EOF\n" % xref_at
    return bytes(out)


def _merge_pdf_spans(entries: list[tuple]) -> list[dict]:
    """Golden (kind, text, media_ref) spans from per-line entries
    (pg, kind, text[, media_ref]): consecutive same-kind lines WITHIN a
    page merge newline-joined — exactly the pdf_spans operator's merge
    rule (kernels/pdftext._runs_to_spans). Image entries (non-empty
    media_ref) never merge."""
    merged: list[list] = []
    for entry in entries:
        pg, kind, text = entry[0], entry[1], entry[2]
        ref = entry[3] if len(entry) > 3 else ""
        if (merged and merged[-1][0] == pg and merged[-1][1] == kind
                and ref == "" and merged[-1][3] == ""):
            merged[-1][2].append(text)
        else:
            merged.append([pg, kind, [text], ref])
    return [{"offset": i, "kind": k, "text": "\n".join(ts), "media_ref": r}
            for i, (_pg, k, ts, r) in enumerate(merged)]


def generate_pdf(doc_id: int, spans: list[dict]
                 ) -> tuple[bytes, str, list, str]:
    """Multi-page PDF from the doc's text spans + expected text.

    Exercises the real PDF surface the extractor must handle (the constructs
    pypdf's extract_text supports, reference parsers/pypdf/__main__.py:30-32):
    per-page dialect mix of absolute-Tm, Td/TD-relative, TL/T*/quote, TJ
    kerning arrays and hex-string show ops; octal escapes; ~30% of pages
    carry a /Differences-encoded decoration line (F2); ~25% are US-Letter
    with a per-page /MediaBox overriding the inherited A4; ~30% of pages
    split their ops across a /Contents array of two streams; ~40% of streams
    are FlateDecode. Pages hold up to 50 lines (100 when two-column); skew
    docs become genuinely multi-page."""
    import zlib as _zlib

    rng = np.random.default_rng([GLOBAL_SEED, 29, int(doc_id)])
    lines = [s["text"] for s in spans if s["kind"] == "text"]
    pages: list[dict] = []  # {streams: [bytes], letter: bool}
    golden_entries: list[tuple[int, str, str]] = []  # (page, kind, text)
    # embedded image payloads, fixed per doc (placed per page below):
    # /Im1 — raw 4x4 DeviceGray raster; /Im2 — a REAL JPEG behind
    # /DCTDecode (baseline for even docs, five-scan PROGRESSIVE for odd
    # docs, restart intervals mixed in) so the in-PDF image decode path
    # (pdftext._image_pixels -> kernels/jpeg) is proven on both profiles
    im1_px = bytes((doc_id * 7 + k) % 256 for k in range(16))
    im1_mean = float(np.frombuffer(im1_px, dtype=np.uint8).mean()) / 255.0
    if doc_id % 2:
        im2_jpg, im2_stats, im2_arr = \
            _mk_progressive_gray_jpeg_with_stats(doc_id)
    else:
        im2_jpg, im2_stats, im2_arr = _mk_gray_jpeg_with_stats(doc_id)
    im2_w, im2_h = im2_stats["width"], im2_stats["height"]
    im2_mean = float(im2_arr.astype(np.float64).mean()) / 255.0
    # /Im3 — a bilevel scan page behind /CCITTFaxDecode (Group 4 for
    # even docs, Group 3 1-D for odd; EncodedByteAlign alternating):
    # the dominant scanned-PDF profile, decoded by kernels/ccitt
    from pdf_parse_bench_spark.kernels.ccitt import ccittfax_encode
    im3_h, im3_w = 16 + 8 * (doc_id % 3), 40 + 8 * (doc_id % 4)
    _yy3, _xx3 = np.mgrid[0:im3_h, 0:im3_w]
    im3_arr = (((_xx3 // (3 + doc_id % 5) + _yy3 // 4 + doc_id) % 2)
               * 255).astype(np.uint8)
    im3_k = -1 if doc_id % 2 == 0 else 0
    im3_ba = doc_id % 3 == 0
    im3_data = ccittfax_encode(im3_arr, k=im3_k, byte_align=im3_ba)
    im3_mean = float(im3_arr.astype(np.float64).mean()) / 255.0
    # /Im4 — a 4-component CMYK/YCCK Adobe JPEG behind /DCTDecode (the
    # print-origin profile, VERDICT r5 item 4): _image_pixels composites
    # to RGB then collapses to Rec.601 luma, so the golden mean applies
    # that exact arithmetic to the pre-encode RGB array
    im4_jpg, im4_stats, im4_arr = _mk_cmyk_jpeg_with_stats(doc_id)
    im4_w, im4_h = im4_stats["width"], im4_stats["height"]
    _l4 = np.clip(np.round(
        0.299 * im4_arr[..., 0].astype(np.float64)
        + 0.587 * im4_arr[..., 1] + 0.114 * im4_arr[..., 2]), 0, 255)
    im4_mean = float(_l4.mean()) / 255.0
    # /Im5 — a bilevel scan behind /JBIG2Decode (generic region, MQ or
    # MMR coded — the non-CCITT scanned-PDF profile, VERDICT r5 item 5)
    im5_data, im5_w, im5_h, im5_mean = _mk_jbig2_with_stats(doc_id)
    # /Im6 — a /JPXDecode stream (JPEG 2000): decode is out of profile by
    # design, but the SIZ/ihdr headers carry TRUE dims, so the stats row
    # degrades to decoded=False WITH real geometry (VERDICT r5 item 10)
    im6_w, im6_h = 64 + 16 * (doc_id % 3), 48 + 16 * (doc_id % 4)
    im6_data = _mk_jpx_stub(im6_w, im6_h, jp2=doc_id % 2 == 0)
    image_rows: list[dict] = []  # golden per painted image (M11 pixels)

    def _image_row(pg, x, ytop, w, h, pw, ph, mean, decoded=True):
        image_rows.append({
            "page_no": pg, "seq": len(image_rows),
            "media_ref": f"page_{x}_{ytop}_{w}_{h}.png",
            "px_w": pw, "px_h": ph,
            "mean_intensity": None if mean is None
            else float(np.floor(mean * 1e6 + 0.5)) / 1e6,
            "decoded": decoded})
    pos = 0
    while pos < len(lines) or not pages:
        two_col = bool(rng.random() < 0.4)
        letter = bool(rng.random() < 0.25)
        deco_draw = float(rng.random())
        math_draw = float(rng.random())
        pg = len(pages)
        # per-page font size variation: run geometry (width/height) must be
        # derived from the ACTIVE size, not a fixture constant — the
        # extractor's XY-cut sees 10pt and 12pt pages alike
        size = 10.0 if rng.random() < 0.3 else 12.0
        page_h = 792.0 if letter else 842.0
        page_w = 612.0 if letter else 595.0
        y0 = page_h - 72.0
        per_page = 100 if two_col else 50
        page_lines = lines[pos:pos + per_page]
        pos += per_page
        if two_col and len(page_lines) >= 6:
            half = (len(page_lines) + 1) // 2
            # gutter at [300, 310): column width bounds keep every wrapped
            # run's glyph box clear of the other column
            cols = [(72.0, page_lines[:half], 228.0),
                    (310.0, page_lines[half:], page_w - 310.0 - 62.0)]
        else:
            cols = [(72.0, page_lines, page_w - 144.0)]
        ops: list[str] = []
        if deco_draw < 0.3:  # /Differences-encoded chrome line (F2)
            ops.append(f"BT /F2 12 Tf 1 0 0 1 72.0 {y0:.1f} Tm "
                       + _DECO_STREAM + " ET")
            golden_entries.append((pg, "text", _DECO_TEXT))
            y0 -= 20.0  # 8pt whitespace gap: XY-cut keeps deco first
        elif deco_draw < 0.5:  # /ToUnicode-CMap-encoded line (F3)
            ops.append(f"BT /F3 12 Tf 1 0 0 1 72.0 {y0:.1f} Tm "
                       + _DECO2_STREAM + " ET")
            golden_entries.append((pg, "text", _DECO2_TEXT))
            y0 -= 20.0
        elif deco_draw < 0.65:  # Type0/Identity-H CID line (F4, 2-byte codes)
            ops.append(f"BT /F4 12 Tf 1 0 0 1 72.0 {y0:.1f} Tm "
                       + _DECO3_STREAM + " ET")
            golden_entries.append((pg, "text", _DECO3_TEXT))
            y0 -= 20.0
        elif deco_draw < 0.75:  # deco via Form XObject (Do recursion)
            ops.append("/FmL Do" if letter else "/FmA Do")
            golden_entries.append((pg, "text", _DECO_TEXT))
            y0 -= 20.0
        if math_draw < 0.35:
            # math-font (F5 -> LMMathItalic BaseFont) display line: the
            # pdf_spans path must classify it display-formula from the
            # font alone (kernels/pdftext._runs_to_spans)
            mf = f"k{doc_id % 7} = x + {doc_id % 9} / m{doc_id % 5}"
            ops.append(f"BT /F5 12 Tf 1 0 0 1 72.0 {y0:.1f} Tm "
                       f"({mf}) Tj ET")
            golden_entries.append((pg, "display-formula", mf))
            y0 -= 20.0
        elif math_draw < 0.5:
            # mixed prose/math baseline: F1 -> F5 -> F1 show sequence on
            # ONE line — the math run must come out as an INLINE formula
            # between the line's text pieces (math mass < 30%, so the
            # line stays prose; pen geometry keeps the x order)
            pre = "The measured quantity"
            mid = f" y{doc_id % 5} + {doc_id % 8} "
            post = "bounds the estimate."
            ops.append(
                f"BT /F1 12 Tf 1 0 0 1 72.0 {y0:.1f} Tm ({pre}) Tj "
                f"/F5 12 Tf ({mid}) Tj /F1 12 Tf ({post}) Tj ET")
            golden_entries.append((pg, "text", pre))
            golden_entries.append((pg, "inline-formula", mid))
            golden_entries.append((pg, "text", post))
            y0 -= 20.0
        if rng.random() < 0.3:
            # Image XObject figure (M11): /Im1 painted through an explicit
            # CTM in the top band — pdf_spans must surface it as a
            # kind='image' span with the page_<x>_<y>_<w>_<h>.png ref at
            # the right place in the sequence. Placement dims (CTM scale)
            # deliberately differ from /Im1's pixel dims.
            iw, ih = 96 + 8 * (doc_id % 5), 48 + 8 * (pg % 4)
            iy = y0 - ih
            ops.append(f"q {iw} 0 0 {ih} 72.0 {iy:.1f} cm /Im1 Do Q")
            golden_entries.append(
                (pg, "image", "",
                 f"page_72_{round(page_h - y0)}_{iw}_{ih}.png"))
            _image_row(pg, 72, round(page_h - y0), iw, ih, 4, 4, im1_mean)
            y0 -= ih + 12.0
        if rng.random() < 0.25:
            # embedded JPEG figure via /DCTDecode (/Im2): painted through
            # its own CTM; the rasterizer must ink the DECODED pixels and
            # pdf_image_stats must report its true mean
            iw2, ih2 = 120 + 8 * (doc_id % 4), 56 + 8 * (pg % 3)
            iy2 = y0 - ih2
            ops.append(f"q {iw2} 0 0 {ih2} 300.0 {iy2:.1f} cm /Im2 Do Q")
            golden_entries.append(
                (pg, "image", "",
                 f"page_300_{round(page_h - y0)}_{iw2}_{ih2}.png"))
            _image_row(pg, 300, round(page_h - y0), iw2, ih2,
                       im2_w, im2_h, im2_mean)
            y0 -= ih2 + 12.0
        if rng.random() < 0.2:
            # scanned figure via /CCITTFaxDecode (/Im3): raster inks the
            # decoded bilevel pixels; pdf_image_stats reports true mean
            iw3, ih3 = 100 + 8 * (doc_id % 3), 48 + 8 * (pg % 2)
            iy3 = y0 - ih3
            ops.append(f"q {iw3} 0 0 {ih3} 150.0 {iy3:.1f} cm /Im3 Do Q")
            golden_entries.append(
                (pg, "image", "",
                 f"page_150_{round(page_h - y0)}_{iw3}_{ih3}.png"))
            _image_row(pg, 150, round(page_h - y0), iw3, ih3,
                       im3_w, im3_h, im3_mean)
            y0 -= ih3 + 12.0
        if rng.random() < 0.15:
            # print-origin CMYK figure via /DCTDecode (/Im4): the decoder
            # composites the 4-component stream; stats report true mean
            iw4, ih4 = 88 + 8 * (doc_id % 3), 40 + 8 * (pg % 3)
            iy4 = y0 - ih4
            ops.append(f"q {iw4} 0 0 {ih4} 420.0 {iy4:.1f} cm /Im4 Do Q")
            golden_entries.append(
                (pg, "image", "",
                 f"page_420_{round(page_h - y0)}_{iw4}_{ih4}.png"))
            _image_row(pg, 420, round(page_h - y0), iw4, ih4,
                       im4_w, im4_h, im4_mean)
            y0 -= ih4 + 12.0
        if rng.random() < 0.15:
            # bilevel scan via /JBIG2Decode (/Im5): the raster inks the
            # MQ/MMR-decoded pixels; pdf_image_stats reports true mean
            iw5, ih5 = 64 + 8 * (doc_id % 3), 32 + 8 * (pg % 2)
            iy5 = y0 - ih5
            ops.append(f"q {iw5} 0 0 {ih5} 480.0 {iy5:.1f} cm /Im5 Do Q")
            golden_entries.append(
                (pg, "image", "",
                 f"page_480_{round(page_h - y0)}_{iw5}_{ih5}.png"))
            _image_row(pg, 480, round(page_h - y0), iw5, ih5,
                       im5_w, im5_h, im5_mean)
            y0 -= ih5 + 12.0
        if rng.random() < 0.12:
            # JPEG-2000 figure via /JPXDecode (/Im6): out of decode
            # profile — the degradation row must carry the TRUE dims
            # read from the stream's SIZ/ihdr headers, mean null
            iw6, ih6 = 56 + 8 * (doc_id % 3), 28 + 8 * (pg % 3)
            iy6 = y0 - ih6
            ops.append(f"q {iw6} 0 0 {ih6} 36.0 {iy6:.1f} cm /Im6 Do Q")
            golden_entries.append(
                (pg, "image", "",
                 f"page_36_{round(page_h - y0)}_{iw6}_{ih6}.png"))
            _image_row(pg, 36, round(page_h - y0), iw6, ih6,
                       im6_w, im6_h, None, decoded=False)
            y0 -= ih6 + 12.0
        for x, col_lines, max_w in cols:
            col_ops, emitted = _emit_column(x, y0, col_lines, rng,
                                            size=size, max_w=max_w)
            ops.extend(col_ops)
            golden_entries.extend((pg, "text", ln) for ln in emitted)

        pages.append({"ops": ops, "letter": letter, "page_h": page_h})
        if pos >= len(lines):
            break

    # page chrome (header/footer boilerplate the extractor must SUPPRESS —
    # north-star P2 on the raw-PDF path; never in golden): a running
    # header repeated on every page (multi-page docs only, since the
    # kernel's repetition rule needs >= 2 pages) and bare page numbers in
    # the bottom band (suppressed by the page-number rule alone)
    header = (f"Synthetic Journal of Extraction Vol. {doc_id % 9}"
              if len(pages) >= 2 and doc_id % 2 == 0 else None)
    for pg, page in enumerate(pages):
        chrome = []
        if header is not None:
            chrome.append(
                f"BT /F1 9 Tf 1 0 0 1 72.0 {page['page_h'] - 28.0:.1f} Tm "
                f"({header}) Tj ET")
        if doc_id % 3 != 2:
            chrome.append(f"BT /F1 9 Tf 1 0 0 1 300.0 24.0 Tm "
                          f"({pg + 1}) Tj ET")
        ops = chrome + page["ops"]
        if len(ops) > 2 and rng.random() < 0.3:  # /Contents array path
            cut = len(ops) // 2
            chunks = [ops[:cut], ops[cut:]]
        else:
            chunks = [ops]
        streams = []
        for chunk in chunks:
            stream = "\n".join(chunk).encode("latin-1", errors="replace")
            if rng.random() < 0.4:  # FlateDecode path
                z = _zlib.compress(stream)
                streams.append(
                    b"<< /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream"
                    % (len(z), z))
            else:
                streams.append(
                    b"<< /Length %d >>\nstream\n%s\nendstream" % (len(stream), stream))
        page["streams"] = streams

    # objects: 1=Catalog 2=Pages 3=F1 4=F2 5=F3 6=CMap 7=F4 8=CIDCMap
    # 9=FormA4 10=FormLetter 11=F5 (math face) 12=Im1 (raw image
    # XObject) 13=Im2 (DCTDecode JPEG) 14=Im3 (CCITTFaxDecode)
    # 15=Im4 (CMYK/YCCK DCTDecode) 16=Im5 (JBIG2Decode)
    # 17=Im6 (JPXDecode, dims-only), then per page:
    # streams, page dict. MediaBox + Resources live on the Pages node
    # (inheritance path); Letter pages override MediaBox locally.
    objs: list[bytes] = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"",  # Pages placeholder (needs kid numbers)
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding "
        b"<< /BaseEncoding /WinAnsiEncoding "
        b"/Differences [ 128 /bullet /emdash /eacute ] >> >>",
        b"<< /Type /Font /Subtype /TrueType /BaseFont /Synth "
        b"/ToUnicode 6 0 R >>",
        b"<< /Length %d >>\nstream\n%s\nendstream"
        % (len(_TOUNICODE_CMAP), _TOUNICODE_CMAP),
        b"<< /Type /Font /Subtype /Type0 /BaseFont /SynthCID "
        b"/Encoding /Identity-H /ToUnicode 8 0 R >>",
        b"<< /Length %d >>\nstream\n%s\nendstream"
        % (len(_CID_CMAP), _CID_CMAP),
    ]
    # Form XObjects carrying the F2 deco line (A4 / Letter top positions);
    # no own /Resources — they inherit the page's (Do recursion, §8.10)
    for ph in (842.0, 792.0):
        form = (f"BT /F2 12 Tf 1 0 0 1 72.0 {ph - 72.0:.1f} Tm "
                + _DECO_STREAM + " ET").encode("latin-1")
        objs.append(
            b"<< /Type /XObject /Subtype /Form /Length %d >>"
            b"\nstream\n%s\nendstream" % (len(form), form))
    # math face: BaseFont name carries the LM math-family marker
    objs.append(b"<< /Type /Font /Subtype /Type1 "
                b"/BaseFont /SYNTH+LMMathItalic12-Regular >>")
    # Image XObject (M11): pixel dims differ from every placement CTM so
    # the extractor provably reads geometry from the CTM, not the dict
    objs.append(b"<< /Type /XObject /Subtype /Image /Width 4 /Height 4 "
                b"/ColorSpace /DeviceGray /BitsPerComponent 8 /Length 16 >>"
                b"\nstream\n%s\nendstream" % im1_px)
    # embedded JPEG image XObject (13 = Im2): stream IS the JPEG file,
    # /Filter /DCTDecode — the dominant real-world embedded-figure layout
    objs.append(b"<< /Type /XObject /Subtype /Image /Width %d /Height %d "
                b"/ColorSpace /DeviceGray /BitsPerComponent 8 "
                b"/Filter /DCTDecode /Length %d >>\nstream\n%s\nendstream"
                % (im2_w, im2_h, len(im2_jpg), im2_jpg))
    # CCITT fax image XObject (14 = Im3): the scanned-page profile
    ba3 = b" /EncodedByteAlign true" if im3_ba else b""
    objs.append(b"<< /Type /XObject /Subtype /Image /Width %d /Height %d "
                b"/ColorSpace /DeviceGray /BitsPerComponent 1 "
                b"/Filter /CCITTFaxDecode /DecodeParms << /K %d "
                b"/Columns %d /Rows %d%s >> /Length %d >>"
                b"\nstream\n%s\nendstream"
                % (im3_w, im3_h, im3_k, im3_w, im3_h, ba3,
                   len(im3_data), im3_data))
    # CMYK/YCCK Adobe JPEG image XObject (15 = Im4): 4-component
    # DCTDecode, /DeviceCMYK colour space — the print-origin profile
    objs.append(b"<< /Type /XObject /Subtype /Image /Width %d /Height %d "
                b"/ColorSpace /DeviceCMYK /BitsPerComponent 8 "
                b"/Filter /DCTDecode /Length %d >>\nstream\n%s\nendstream"
                % (im4_w, im4_h, len(im4_jpg), im4_jpg))
    # JBIG2 image XObject (16 = Im5): embedded-format generic region
    objs.append(b"<< /Type /XObject /Subtype /Image /Width %d /Height %d "
                b"/ColorSpace /DeviceGray /BitsPerComponent 1 "
                b"/Filter /JBIG2Decode /Length %d >>\nstream\n%s\nendstream"
                % (im5_w, im5_h, len(im5_data), im5_data))
    # JPEG-2000 image XObject (17 = Im6): real headers, undecodable body
    objs.append(b"<< /Type /XObject /Subtype /Image /Width %d /Height %d "
                b"/ColorSpace /DeviceRGB /BitsPerComponent 8 "
                b"/Filter /JPXDecode /Length %d >>\nstream\n%s\nendstream"
                % (im6_w, im6_h, len(im6_data), im6_data))
    page_nums: list[int] = []
    for page in pages:
        snums = []
        for s in page["streams"]:
            objs.append(s)
            snums.append(len(objs))
        if len(snums) == 1:
            contents = b"%d 0 R" % snums[0]
        else:
            contents = b"[" + b" ".join(b"%d 0 R" % n for n in snums) + b"]"
        media = b" /MediaBox [0 0 612 792]" if page["letter"] else b""
        objs.append(b"<< /Type /Page /Parent 2 0 R%s /Contents %s >>"
                    % (media, contents))
        page_nums.append(len(objs))
    kids = b" ".join(b"%d 0 R" % n for n in page_nums)
    objs[1] = (b"<< /Type /Pages /Kids [%s] /Count %d /MediaBox [0 0 595 842] "
               b"/Resources << /Font << /F1 3 0 R /F2 4 0 R /F3 5 0 R "
               b"/F4 7 0 R /F5 11 0 R >> "
               b"/XObject << /FmA 9 0 R /FmL 10 0 R /Im1 12 0 R "
               b"/Im2 13 0 R /Im3 14 0 R /Im4 15 0 R /Im5 16 0 R "
               b"/Im6 17 0 R >> >> >>"
               % (kids, len(page_nums)))

    # ~30% of docs ship in the PDF 1.5 modern layout (xref STREAM +
    # /ObjStm-packed dicts, half of those with /Predictor 12)
    if rng.random() < 0.3:
        pdf = _assemble_modern_pdf(objs, bool(rng.random() < 0.5))
    else:
        out = bytearray(b"%PDF-1.4\n")
        offsets = []
        for i, body in enumerate(objs, start=1):
            offsets.append(len(out))
            out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
        xref_at = len(out)
        out += b"xref\n0 %d\n0000000000 65535 f \n" % (len(objs) + 1)
        for off in offsets:
            out += b"%010d 00000 n \n" % off
        out += (
            b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % (len(objs) + 1, xref_at)
        )
        pdf = bytes(out)

    # ~8% of docs are encrypted with the standard security handler, empty
    # user password (the crawl norm — permissions, not secrecy): spans the
    # four supported schemes so pdf_parse/pdf_spans goldens prove the
    # kernels/pdfcrypt decrypt path end-to-end.  AES-256/R6 is rarest: its
    # Algorithm-2.B hash costs ~0.5s/doc at extract time by design.
    enc_draw = float(rng.random())
    scheme = "none"
    if enc_draw < 0.08:
        from pdf_parse_bench_spark.kernels.pdfcrypt import (
            encrypt_pdf, sniff_label)
        # tail slices cover the crypt-filter asymmetries (strings plain /
        # streams plain) and the R6 owner-password route (user password
        # set, owner password empty — the decrypter authenticates via /O
        # and unwraps /OE); audit golden records the SNIFF label
        variant = ("rc4-128" if enc_draw < 0.028
                   else "aes-128" if enc_draw < 0.052
                   else "rc4-40" if enc_draw < 0.066
                   else "aes-256" if enc_draw < 0.072
                   else "aes-128-stmf-only" if enc_draw < 0.0755
                   else "aes-128-strf-only" if enc_draw < 0.079
                   else "aes-256-owner")
        pdf = encrypt_pdf(pdf, variant, seed=int(doc_id))
        scheme = sniff_label(variant)

    return (pdf, "\n".join(e[2] for e in golden_entries if len(e) < 4),
            _merge_pdf_spans(golden_entries), scheme, image_rows)


# ---------------------------------------------------------------------------
# Scores fixture (eval/llm_judge.py result-row model)
# ---------------------------------------------------------------------------

_PARSERS = ("engine-a", "engine-b", "engine-c")
_JUDGES = ("judge-x", "judge-y")


def generate_scores(doc_id: int, spans: list[dict]) -> list[dict]:
    rng = np.random.default_rng([GLOBAL_SEED, 31, int(doc_id)])
    rows = []
    scored = [s for s in spans if s["kind"] in ("inline-formula", "display-formula", "table")]
    for parser in _PARSERS:
        for idx, s in enumerate(scored):
            for judge in _JUDGES:
                # ~10% of judge-y evaluations are missing — feeds the
                # pending-score anti-join (eval/llm_judge.py:259-264, P5/U2)
                if judge == _JUDGES[1] and rng.random() < 0.1:
                    continue
                raw = int(rng.integers(-2, 14))  # exercises clamp (llm_judge.py:139)
                score = max(0, min(10, raw))
                errs = ["minor-spacing"] if rng.random() < 0.15 else []
                rows.append({
                    "doc_id": f"{doc_id:09d}", "index": idx, "kind": s["kind"],
                    "complexity": s["complexity"], "parser_name": parser,
                    "judge_model": judge, "score": score,
                    "raw_response": f"Score: {raw} — alignment rationale.",
                    "errors": errs,
                })
    return rows


# ---------------------------------------------------------------------------
# Orchestration
# ---------------------------------------------------------------------------

_SPAN_T = pa.struct([
    ("kind", pa.string()), ("text", pa.string()),
    ("media_ref", pa.string()), ("offset", pa.int32()),
])


def ensure_fixtures(sf_dir: str) -> Path:
    """Generate (once) and return the fixture dir for a testdata sf dir."""
    sf_name = Path(sf_dir).name
    out = FIXTURES_ROOT / sf_name
    marker = out / "_COMPLETE"
    if marker.exists() and marker.read_text().strip() == FIXTURE_VERSION:
        return out
    out.mkdir(parents=True, exist_ok=True)
    base = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text", "source"]).to_pandas()

    docs_rows, golden_rows, md_rows, html_rows = [], [], [], []
    noisy_rows, golden_noisy_rows = [], []
    blocks_rows, golden_layout_rows = [], []
    pdf_rows, pdf_text_rows, score_rows = [], [], []
    pdf_enc_rows = []
    md_refs_rows, table_rows, golden_md_refs_rows = [], [], []
    tei_rows, media_rows, media_stats_rows = [], [], []
    thumb_rows = []
    audio_rows, audio_stats_rows = [], []
    video_rows, video_stats_rows = [], []
    raster_rows = []
    web_rows = []
    render_rows = []
    pdf_span_rows = []
    pdf_image_rows = []
    pdf_locked_rows, pdf_password_rows, golden_locked_rows = [], [], []
    for rec in base.itertuples(index=False):
        did = int(rec.doc_id)
        doc_id = f"{did:09d}"
        spans = generate_doc_spans(did, rec.text)
        docs_rows.append({
            "doc_id": doc_id,
            "spans": [{"kind": s["kind"], "text": s["text"],
                       "media_ref": s["media_ref"], "offset": s["offset"]}
                      for s in spans],
        })
        for s in spans:
            golden_rows.append({"doc_id": doc_id, "offset": s["offset"],
                                "kind": s["kind"], "text": s["text"],
                                "media_ref": s["media_ref"],
                                "complexity": s["complexity"]})
        md_rows.append({"doc_id": doc_id,
                        "markdown": render_markdown(did, spans, rec.source)})
        web_rows.append({"doc_id": doc_id,
                         "text": _mk_web_text(did, rec.text)})
        # S7 render-sink requests: every formula span, plus injected
        # invalid formulas (unbalanced brace / empty inner) exercising the
        # error-image fallback contract in the ORACLE-checked path
        for s in spans:
            if s["kind"] in ("inline-formula", "display-formula"):
                render_rows.append({"doc_id": doc_id, "offset": s["offset"],
                                    "formula": s["text"]})
        if did % 6 == 0:
            render_rows.append({"doc_id": doc_id, "offset": 2000,
                                "formula": "$x_{1$"})
        if did % 11 == 0:
            render_rows.append({"doc_id": doc_id, "offset": 2001,
                                "formula": "$$   $$"})
        # backslash delimiter forms: the render kernel strips all four
        # DELIMITER_PAIRS; these rows pin the \[..\]/\(..\) branches of
        # the oracle CASE (ADVICE r3 — previously only $-forms occurred,
        # so the extra oracle branches would have been dead code)
        if did % 9 == 0:
            render_rows.append({"doc_id": doc_id, "offset": 2002,
                                "formula": f"\\[y_{{{did % 5}}} + {did % 7}\\]"})
        if did % 13 == 0:
            render_rows.append({"doc_id": doc_id, "offset": 2003,
                                "formula": f"\\(a^{did % 4} - b\\)"})
        html_rows.append({"doc_id": doc_id,
                          "html": render_html(did, spans, rec.source)})
        tei_rows.append({"doc_id": doc_id,
                         "tei": render_tei(did, spans, rec.source)})
        noisy_md, noisy_expected = render_noisy(did, spans)
        noisy_rows.append({"doc_id": doc_id, "markdown": noisy_md})
        for e in noisy_expected:
            golden_noisy_rows.append({
                "doc_id": doc_id, "offset": e["offset"], "kind": e["kind"],
                "text": e["text"], "media_ref": e["media_ref"],
            })
        blocks, golden_layout = generate_layout(did, spans, rec.source)
        for (pg, bbox, cat, txt) in blocks:
            blocks_rows.append({"doc_id": doc_id, "page_no": pg, "bbox": bbox,
                                "category": cat, "text": txt})
        for g in golden_layout:
            golden_layout_rows.append({"doc_id": doc_id, **g})
        pdf_bytes, pdf_text, pdf_span_list, enc_scheme, img_stat_rows \
            = generate_pdf(did, spans)
        pdf_rows.append({"doc_id": doc_id, "pdf_bytes": pdf_bytes})
        pdf_text_rows.append({"doc_id": doc_id, "text": pdf_text})
        pdf_enc_rows.append({"doc_id": doc_id, "scheme": enc_scheme,
                             "decrypt_ok": True})
        for ps in pdf_span_list:
            pdf_span_rows.append({"doc_id": doc_id, **ps})
        for ir in img_stat_rows:
            pdf_image_rows.append({"doc_id": doc_id, **ir})
        if did % 50 == 0:
            # password-LOCKED corpus slice + its (doc_id, password) side
            # table (VERDICT r5 item 8): both user and owner passwords
            # are set, so the empty-password audit fails closed and only
            # the side-table join flips decrypt_ok to true
            from pdf_parse_bench_spark.kernels.pdfcrypt import (
                encrypt_pdf, sniff_label)
            lv = ("rc4-128", "aes-128", "aes-256",
                  "rc4-40")[(did // 50) % 4]
            pw = f"pw-{did}"
            pdf_locked_rows.append({
                "doc_id": doc_id,
                "pdf_bytes": encrypt_pdf(pdf_bytes, lv, seed=did,
                                         user_password=pw.encode())})
            pdf_password_rows.append({"doc_id": doc_id, "password": pw})
            golden_locked_rows.append({
                "doc_id": doc_id, "scheme": sniff_label(lv),
                "decrypt_ok_empty": False, "decrypt_ok_pw": True})
        # raster-stats golden: pinned regression artifact — the deterministic
        # rasterizer is its own spec (the reference's M5 relies on fitz the
        # same way); this locks page count, pixmap geometry and ink ratio
        from pdf_parse_bench_spark.kernels.pdftext import rasterize_pdf
        for page_no, png, w, h, ink in rasterize_pdf(pdf_bytes):
            raster_rows.append({"doc_id": doc_id, "page_no": page_no,
                                "width": w, "height": h, "ink_ratio": ink})
        score_rows.extend(generate_scores(did, spans))
        # M10 fixture: page markdown with [tbl_k](tbl_k) placeholder links +
        # the (doc_id, table_id, content) side table + substituted golden
        # (mistral page assembly, parsers/mistral/__main__.py:56-64)
        ref_pieces, golden_pieces = [], []
        k = 0
        for s in spans:
            if s["kind"] == "table":
                tid = f"tbl_{k}"
                k += 1
                ref_pieces.append(f"[{tid}]({tid})")
                golden_pieces.append(s["text"])
                table_rows.append({"doc_id": doc_id, "table_id": tid,
                                   "content": s["text"]})
            elif s["kind"] == "image":
                piece = f"![]({s['media_ref']})"
                ref_pieces.append(piece)
                golden_pieces.append(piece)
            else:
                ref_pieces.append(s["text"])
                golden_pieces.append(s["text"])
        md_refs_rows.append({"doc_id": doc_id,
                             "markdown": "\n\n".join(ref_pieces)})
        golden_md_refs_rows.append({"doc_id": doc_id,
                                    "markdown": "\n\n".join(golden_pieces)})
        for s in spans:  # PNG payloads + golden decode stats per image span
            if s["kind"] == "image":
                png, stats, px = _mk_image_bytes(s["media_ref"], did)
                media_rows.append({"doc_id": doc_id, "offset": s["offset"],
                                   "media_ref": s["media_ref"],
                                   "media_bytes": png})
                media_stats_rows.append({"doc_id": doc_id,
                                         "offset": s["offset"],
                                         "media_ref": s["media_ref"], **stats})
                thumb_rows.append({"doc_id": doc_id, "offset": s["offset"],
                                   "media_ref": s["media_ref"],
                                   **_thumb_stats(px)})
        # mixed-format + corrupted media rows (media_files-only, not spans):
        # JPEGs exercise the SOF metadata path, corrupt payloads the
        # deterministic error-placeholder contract (formula_renderer.py's
        # error-image fallback analog)
        if did % 3 == 0:
            jw, jh, jch = 100 + did % 900, 80 + did % 700, 3 if did % 2 else 1
            jpg = _mk_jpeg_bytes(jw, jh, jch)
            ref = f"fig_{did}.jpg"
            media_rows.append({"doc_id": doc_id, "offset": 1000,
                               "media_ref": ref, "media_bytes": jpg})
            media_stats_rows.append({
                "doc_id": doc_id, "offset": 1000, "media_ref": ref,
                "width": jw, "height": jh, "channels": jch,
                "n_bytes": len(jpg), "mean_intensity": None,
                "status": "metadata_only"})
            # header-only stream: no pixels to thumbnail -> placeholder
            thumb_rows.append({"doc_id": doc_id, "offset": 1000,
                               "media_ref": ref,
                               **_thumb_stats(_placeholder_px(),
                                              "decode_error")})
        if did % 4 == 0:
            # real baseline grayscale JPEGs with scan data: the kernel
            # decoder must produce true pixel means ('ok'), not fall back
            # to metadata_only (VERDICT r3 item 3)
            jpg, jstats, jpx = _mk_gray_jpeg_with_stats(did)
            ref = f"scan_{did}.jpg"
            media_rows.append({"doc_id": doc_id, "offset": 1002,
                               "media_ref": ref, "media_bytes": jpg})
            media_stats_rows.append({"doc_id": doc_id, "offset": 1002,
                                     "media_ref": ref, **jstats})
            thumb_rows.append({"doc_id": doc_id, "offset": 1002,
                               "media_ref": ref, **_thumb_stats(jpx)})
        if did % 5 == 0:
            # baseline COLOR JPEGs (YCbCr 4:2:0 / 4:4:4 alternating):
            # the dominant real-world profile must decode to true RGB
            # means, not degrade to metadata_only
            jpg, jstats, jpx = _mk_color_jpeg_with_stats(did)
            ref = f"photo_{did}.jpg"
            media_rows.append({"doc_id": doc_id, "offset": 1003,
                               "media_ref": ref, "media_bytes": jpg})
            media_stats_rows.append({"doc_id": doc_id, "offset": 1003,
                                     "media_ref": ref, **jstats})
            thumb_rows.append({"doc_id": doc_id, "offset": 1003,
                               "media_ref": ref, **_thumb_stats(jpx)})
        if did % 9 == 0:
            # PROGRESSIVE (SOF2) grayscale JPEGs — the dominant web-crawl
            # profile: successive-approximation DC/AC scans, EOB runs,
            # refinement correction bits, optional in-scan restart
            # markers. Must decode to true pixel stats ('ok').
            jpg, jstats, jpx = _mk_progressive_gray_jpeg_with_stats(did)
            ref = f"prog_{did}.jpg"
            media_rows.append({"doc_id": doc_id, "offset": 1004,
                               "media_ref": ref, "media_bytes": jpg})
            media_stats_rows.append({"doc_id": doc_id, "offset": 1004,
                                     "media_ref": ref, **jstats})
            thumb_rows.append({"doc_id": doc_id, "offset": 1004,
                               "media_ref": ref, **_thumb_stats(jpx)})
        if did % 10 == 0:
            # baseline grayscale with DRI/RSTn restart markers (the
            # resync profile): decoder must resync and reset predictors
            jbh, jbw = 2 + did % 4, 3 + did % 3
            jyy, jxx = np.mgrid[0:jbh, 0:jbw]
            jblocks = ((did * 23 + jxx * 3 + jyy * 13) % 256).astype(
                np.int64)
            jw, jh = jbw * 8 - did % 8, jbh * 8 - (did * 7) % 8
            jri = 1 + did % 4
            jpg = _mk_gray_jpeg(jblocks, jw, jh, restart_interval=jri)
            jpx = np.repeat(np.repeat(jblocks, 8, 0), 8, 1)[:jh, :jw]
            jmean = float(jpx.mean()) / 255.0
            ref = f"rst_{did}.jpg"
            media_rows.append({"doc_id": doc_id, "offset": 1005,
                               "media_ref": ref, "media_bytes": jpg})
            media_stats_rows.append({
                "doc_id": doc_id, "offset": 1005, "media_ref": ref,
                "width": jw, "height": jh, "channels": 1,
                "n_bytes": len(jpg),
                "mean_intensity": float(np.floor(jmean * 1e6 + 0.5)) / 1e6,
                "status": "ok"})
            thumb_rows.append({"doc_id": doc_id, "offset": 1005,
                               "media_ref": ref,
                               **_thumb_stats(jpx.astype(np.uint8))})
        if did % 11 == 0:
            # 4-component CMYK (even) / YCCK (odd) Adobe-APP14 JPEGs —
            # the print-origin profile (VERDICT r5 item 4): must
            # composite to true RGB stats ('ok'), not degrade
            jpg, jstats, jpx = _mk_cmyk_jpeg_with_stats(did)
            ref = f"cmyk_{did}.jpg"
            media_rows.append({"doc_id": doc_id, "offset": 1006,
                               "media_ref": ref, "media_bytes": jpg})
            media_stats_rows.append({"doc_id": doc_id, "offset": 1006,
                                     "media_ref": ref, **jstats})
            thumb_rows.append({"doc_id": doc_id, "offset": 1006,
                               "media_ref": ref, **_thumb_stats(jpx)})
        if did % 7 == 0:
            junk = bytes((did * 31 + k * 17) % 256 for k in range(40))
            ref = f"corrupt_{did}.bin"
            media_rows.append({"doc_id": doc_id, "offset": 1001,
                               "media_ref": ref, "media_bytes": junk})
            media_stats_rows.append({"doc_id": doc_id, "offset": 1001,
                                     "media_ref": ref,
                                     **_placeholder_stats(len(junk))})
            thumb_rows.append({"doc_id": doc_id, "offset": 1001,
                               "media_ref": ref,
                               **_thumb_stats(_placeholder_px(),
                                              "decode_error")})
        if did % 6 == 0:
            # PCM-16 WAV rows: real sample decode ('ok')
            wav, wstats = _mk_wav_with_stats(did)
            ref = f"audio_{did}.wav"
            audio_rows.append({"doc_id": doc_id, "media_ref": ref,
                               "media_bytes": wav})
            audio_stats_rows.append({"doc_id": doc_id, "media_ref": ref,
                                     **wstats})
        if did % 15 == 0:
            # IEEE-float WAV: metadata parses, samples do not (PCM-16
            # profile only) -> metadata_only with null signal stats
            fl = _mk_wav(22050, np.zeros((50, 1), dtype=np.int16),
                         audio_format=3)
            ref = f"audio_f32_{did}.wav"
            audio_rows.append({"doc_id": doc_id, "media_ref": ref,
                               "media_bytes": fl})
            audio_stats_rows.append({
                "doc_id": doc_id, "media_ref": ref, "channels": 1,
                "sample_rate": 22050, "bits": 16, "n_samples": 50,
                "duration_ms": (50 * 1000) // 22050, "mean_abs": None,
                "peak": None, "status": "metadata_only"})
        if did % 8 == 0:
            # Y4M video rows: sampled-frame luma means ('ok')
            y4m, vrows = _mk_y4m_with_stats(did)
            ref = f"clip_{did}.y4m"
            video_rows.append({"doc_id": doc_id, "media_ref": ref,
                               "media_bytes": y4m})
            for r in vrows:
                video_stats_rows.append({"doc_id": doc_id,
                                         "media_ref": ref, **r})
        if did % 28 == 0:
            # Y4M magic but truncated frame payload -> one error row
            ref = f"clip_bad_{did}.y4m"
            video_rows.append({"doc_id": doc_id, "media_ref": ref,
                               "media_bytes":
                               b"YUV4MPEG2 W8 H8 F25:1 C420\nFRAME\nxx"})
            video_stats_rows.append({
                "doc_id": doc_id, "media_ref": ref, "frame_no": -1,
                "width": 0, "height": 0, "n_frames": 0, "fps_num": 0,
                "fps_den": 0, "y_mean": None, "status": "decode_error"})
        if did % 21 == 0:
            # RIFF magic but truncated body -> decode_error zero row
            ref = f"audio_bad_{did}.wav"
            audio_rows.append({"doc_id": doc_id, "media_ref": ref,
                               "media_bytes": b"RIFF\x10\x00\x00\x00WAVEfmt "})
            audio_stats_rows.append({
                "doc_id": doc_id, "media_ref": ref, "channels": 0,
                "sample_rate": 0, "bits": 0, "n_samples": 0,
                "duration_ms": 0, "mean_abs": None, "peak": None,
                "status": "decode_error"})

    def _write(name: str, rows: list[dict], schema: pa.Schema):
        tbl = pa.Table.from_pylist(rows, schema=schema)
        pq.write_table(tbl, out / name, compression="zstd")

    _write("spans_documents.parquet", docs_rows,
           pa.schema([("doc_id", pa.string()), ("spans", pa.list_(_SPAN_T))]))
    _write("golden_spans.parquet", golden_rows,
           pa.schema([("doc_id", pa.string()), ("offset", pa.int32()),
                      ("kind", pa.string()), ("text", pa.string()),
                      ("media_ref", pa.string()), ("complexity", pa.string())]))
    _write("parsed_markdown.parquet", md_rows,
           pa.schema([("doc_id", pa.string()), ("markdown", pa.string())]))
    _write("html_documents.parquet", html_rows,
           pa.schema([("doc_id", pa.string()), ("html", pa.string())]))
    _write("noisy_markdown.parquet", noisy_rows,
           pa.schema([("doc_id", pa.string()), ("markdown", pa.string())]))
    _write("golden_noisy_spans.parquet", golden_noisy_rows,
           pa.schema([("doc_id", pa.string()), ("offset", pa.int32()),
                      ("kind", pa.string()), ("text", pa.string()),
                      ("media_ref", pa.string())]))
    _write("layout_blocks.parquet", blocks_rows,
           pa.schema([("doc_id", pa.string()), ("page_no", pa.int32()),
                      ("bbox", pa.list_(pa.float64())),
                      ("category", pa.string()), ("text", pa.string())]))
    _write("golden_layout_spans.parquet", golden_layout_rows,
           pa.schema([("doc_id", pa.string()), ("kind", pa.string()),
                      ("text", pa.string()), ("media_ref", pa.string()),
                      ("offset", pa.int32())]))
    _write("pdf_docs.parquet", pdf_rows,
           pa.schema([("doc_id", pa.string()), ("pdf_bytes", pa.binary())]))
    _write("golden_pdf_text.parquet", pdf_text_rows,
           pa.schema([("doc_id", pa.string()), ("text", pa.string())]))
    _write("tei_documents.parquet", tei_rows,
           pa.schema([("doc_id", pa.string()), ("tei", pa.string())]))
    _write("raw_web_documents.parquet", web_rows,
           pa.schema([("doc_id", pa.string()), ("text", pa.string())]))
    _write("render_requests.parquet", render_rows,
           pa.schema([("doc_id", pa.string()), ("offset", pa.int32()),
                      ("formula", pa.string())]))
    _write("golden_pdf_spans.parquet", pdf_span_rows,
           pa.schema([("doc_id", pa.string()), ("offset", pa.int32()),
                      ("kind", pa.string()), ("text", pa.string()),
                      ("media_ref", pa.string())]))
    _write("golden_pdf_enc.parquet", pdf_enc_rows,
           pa.schema([("doc_id", pa.string()), ("scheme", pa.string()),
                      ("decrypt_ok", pa.bool_())]))
    _write("pdf_locked.parquet", pdf_locked_rows,
           pa.schema([("doc_id", pa.string()),
                      ("pdf_bytes", pa.binary())]))
    _write("pdf_passwords.parquet", pdf_password_rows,
           pa.schema([("doc_id", pa.string()), ("password", pa.string())]))
    _write("golden_pdf_locked.parquet", golden_locked_rows,
           pa.schema([("doc_id", pa.string()), ("scheme", pa.string()),
                      ("decrypt_ok_empty", pa.bool_()),
                      ("decrypt_ok_pw", pa.bool_())]))
    _write("golden_pdf_images.parquet", pdf_image_rows,
           pa.schema([("doc_id", pa.string()), ("page_no", pa.int32()),
                      ("seq", pa.int32()), ("media_ref", pa.string()),
                      ("px_w", pa.int32()), ("px_h", pa.int32()),
                      ("mean_intensity", pa.float64()),
                      ("decoded", pa.bool_())]))
    _write("golden_raster_stats.parquet", raster_rows,
           pa.schema([("doc_id", pa.string()), ("page_no", pa.int32()),
                      ("width", pa.int32()), ("height", pa.int32()),
                      ("ink_ratio", pa.float64())]))
    _write("media_files.parquet", media_rows,
           pa.schema([("doc_id", pa.string()), ("offset", pa.int32()),
                      ("media_ref", pa.string()), ("media_bytes", pa.binary())]))
    _write("audio_files.parquet", audio_rows,
           pa.schema([("doc_id", pa.string()), ("media_ref", pa.string()),
                      ("media_bytes", pa.binary())]))
    _write("golden_audio_stats.parquet", audio_stats_rows,
           pa.schema([("doc_id", pa.string()), ("media_ref", pa.string()),
                      ("channels", pa.int32()), ("sample_rate", pa.int32()),
                      ("bits", pa.int32()), ("n_samples", pa.int64()),
                      ("duration_ms", pa.int64()), ("mean_abs", pa.float64()),
                      ("peak", pa.int32()), ("status", pa.string())]))
    _write("video_files.parquet", video_rows,
           pa.schema([("doc_id", pa.string()), ("media_ref", pa.string()),
                      ("media_bytes", pa.binary())]))
    _write("golden_video_stats.parquet", video_stats_rows,
           pa.schema([("doc_id", pa.string()), ("media_ref", pa.string()),
                      ("frame_no", pa.int32()), ("width", pa.int32()),
                      ("height", pa.int32()), ("n_frames", pa.int32()),
                      ("fps_num", pa.int32()), ("fps_den", pa.int32()),
                      ("y_mean", pa.float64()), ("status", pa.string())]))
    _write("golden_thumb_stats.parquet", thumb_rows,
           pa.schema([("doc_id", pa.string()), ("offset", pa.int32()),
                      ("media_ref", pa.string()), ("thumb_w", pa.int32()),
                      ("thumb_h", pa.int32()), ("thumb_mean", pa.float64()),
                      ("thumb_png_bytes", pa.int64()),
                      ("status", pa.string())]))
    _write("golden_media_stats.parquet", media_stats_rows,
           pa.schema([("doc_id", pa.string()), ("offset", pa.int32()),
                      ("media_ref", pa.string()), ("width", pa.int32()),
                      ("height", pa.int32()), ("channels", pa.int32()),
                      ("n_bytes", pa.int64()), ("mean_intensity", pa.float64()),
                      ("status", pa.string())]))
    _write("markdown_with_refs.parquet", md_refs_rows,
           pa.schema([("doc_id", pa.string()), ("markdown", pa.string())]))
    _write("doc_tables.parquet", table_rows,
           pa.schema([("doc_id", pa.string()), ("table_id", pa.string()),
                      ("content", pa.string())]))
    _write("golden_markdown_refs.parquet", golden_md_refs_rows,
           pa.schema([("doc_id", pa.string()), ("markdown", pa.string())]))
    _write("extraction_scores.parquet", score_rows,
           pa.schema([("doc_id", pa.string()), ("index", pa.int32()),
                      ("kind", pa.string()), ("complexity", pa.string()),
                      ("parser_name", pa.string()), ("judge_model", pa.string()),
                      ("score", pa.int32()), ("raw_response", pa.string()),
                      ("errors", pa.list_(pa.string()))]))
    marker.write_text(FIXTURE_VERSION)
    return out


if __name__ == "__main__":
    import sys
    # direct-script invocation: script dir shadows the repo root on sys.path
    sys.path.insert(0, str(REPO_ROOT))
    for sf in sys.argv[1:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]:
        p = ensure_fixtures(sf)
        print("fixtures ready:", p)
