"""Layout kernels: XY-cut reading order + block → span emission.

Reproduces the reference's reading-order/boilerplate contract (dots.ocr
block model and markdown conversion, parsers/dots_ocr/__main__.py:72-99,
:125-142) with a deterministic geometric algorithm instead of a VLM:

  - reading_order: recursive XY-cut — split on the *widest* whitespace gap
    (vertical gutter beats horizontal band gaps, so two-column pages order
    column-major); depends only on geometry, never on arrival order
    (SURVEY.md §7 hard part (a)).
  - P2 boilerplate strip: drop Page-header/Page-footer categories
    (dots_ocr/__main__.py:84-86).
  - P3 media policy: keep Picture blocks as kind='image' spans (config flag;
    the reference drops them, dots_ocr/__main__.py:87-89).
"""

from __future__ import annotations

import numpy as np

CATEGORY_TO_KIND = {
    "Caption": "text", "Footnote": "text", "Formula": "display-formula",
    "List-item": "text", "Picture": "image", "Section-header": "text",
    "Table": "table", "Text": "text", "Title": "text",
}
BOILERPLATE_CATEGORIES = frozenset({"Page-header", "Page-footer"})

_GAP_EPS = 2.0  # minimum whitespace gap (pt) considered a cut


def _largest_gap(starts: np.ndarray, ends: np.ndarray) -> tuple[float, float]:
    """Widest gap in the union of [start, end] intervals.

    Returns (gap_width, cut_position); gap_width <= 0 when none.
    """
    order = np.argsort(starts, kind="stable")
    s, e = starts[order], ends[order]
    max_end = np.maximum.accumulate(e)
    gaps = s[1:] - max_end[:-1]
    if len(gaps) == 0:
        return 0.0, 0.0
    k = int(np.argmax(gaps))
    return float(gaps[k]), float((s[1:][k] + max_end[:-1][k]) / 2.0)


def reading_order(bboxes: np.ndarray) -> list[int]:
    """Return indices of blocks in reading order via recursive XY-cut.

    bboxes: (n, 4) array of [x1, y1, x2, y2], top-left origin, y down.
    """
    bboxes = np.asarray(bboxes, dtype=np.float64)
    out: list[int] = []

    def rec(idx: np.ndarray) -> None:
        if len(idx) == 0:
            return
        if len(idx) == 1:
            out.append(int(idx[0]))
            return
        bb = bboxes[idx]
        ygap, ycut = _largest_gap(bb[:, 1], bb[:, 3])
        xgap, xcut = _largest_gap(bb[:, 0], bb[:, 2])
        if max(xgap, ygap) <= _GAP_EPS:
            # (a sub-eps "narrow gutter" x-cut was tried here in round 5
            # and reverted: it fixed wrap-table column interleave on the
            # tables corpus (+3 segments) but mis-cut justified
            # paragraphs whose inline math aligned a pseudo-gutter
            # (-15 segments on 2025-q4) — full-region narrow gaps are
            # NOT reliable column evidence at < _GAP_EPS)
            # no cut: baseline-banded geometric sort — boxes whose top
            # edges chain within _GAP_EPS of each other form one visual
            # line (sub-point baseline jitter from kerning/Tm rounding
            # and sub/superscript boxes must not split a justified line
            # into x-interleaved fragments), bands top-to-bottom, boxes
            # left-to-right within a band
            order = np.argsort(bb[:, 1], kind="stable")
            ys = bb[order, 1]
            band = np.zeros(len(order), dtype=np.int64)
            if len(ys) > 1:
                band[1:] = np.cumsum(np.diff(ys) > _GAP_EPS)
            sub = np.lexsort((bb[order, 0], band))
            out.extend(int(i) for i in idx[order[sub]])
            return
        if xgap > ygap:  # widest gap wins: vertical gutter → column-major
            left = idx[bb[:, 0] < xcut]
            right = idx[bb[:, 0] >= xcut]
            rec(left)
            rec(right)
        else:
            top = idx[bb[:, 1] < ycut]
            bottom = idx[bb[:, 1] >= ycut]
            rec(top)
            rec(bottom)

    rec(np.arange(len(bboxes)))
    return out


def blocks_to_spans(blocks: list[dict], keep_media: bool = True) -> list[dict]:
    """Per-document: strip boilerplate, order pages then XY-cut within each
    page, map categories to span kinds, emit ordered spans."""
    kept = [b for b in blocks if b["category"] not in BOILERPLATE_CATEGORIES]
    if not keep_media:
        kept = [b for b in kept if b["category"] != "Picture"]
    spans: list[dict] = []
    for page in sorted({b["page_no"] for b in kept}):
        page_blocks = [b for b in kept if b["page_no"] == page]
        order = reading_order(np.array([b["bbox"] for b in page_blocks]))
        for i in order:
            b = page_blocks[i]
            kind = CATEGORY_TO_KIND[b["category"]]
            if kind == "image":
                spans.append({"kind": "image", "text": "",
                              "media_ref": b["text"]})
            else:
                spans.append({"kind": kind, "text": b["text"], "media_ref": ""})
    for i, s in enumerate(spans):
        s["offset"] = i
    return spans
