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
# narrow-gutter column evidence (wrap-table layouts leave only ~1pt
# between the table edge and the prose column): the cut is allowed below
# _GAP_EPS ONLY when the caller supplies a per-box table-likeness mask
# and the gutter separates a table-like side from a prose side across
# several rows — a pure-geometry version of this rule was measured
# net-negative in round 5 (it mis-cut justified paragraphs whose inline
# math aligned a pseudo-gutter) and the content gate is what fixes that
_XGAP_MIN = 0.5
_MIN_COL_BANDS = 4


def _n_bands(ys: np.ndarray) -> int:
    """Distinct y-bands (top edges more than _GAP_EPS apart)."""
    if len(ys) == 0:
        return 0
    s = np.sort(ys)
    return 1 + int(np.sum(np.diff(s) > _GAP_EPS))


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


# wrap-table extraction (round 6): a floating table whose rows BRIDGE a
# two-column gutter defeats every cut (no x-gap exists while the rows
# are present; y-band slicing then x-interleaves the columns line by
# line). Evidence gate: >= _WRAP_MIN_ROWS clustered table-like rows
# spanning >= _WRAP_MIN_ROWS bands, straddling a prose-only x-gap of
# >= _WRAP_GUTTER_MIN pt with real prose on BOTH sides.
_WRAP_MIN_ROWS = 3
_WRAP_GUTTER_MIN = 6.0
_WRAP_ROW_GAP = 30.0  # max y gap chaining rows into one cluster


def _wrap_table_clusters(bboxes: np.ndarray,
                         table_mask: np.ndarray) -> list[np.ndarray]:
    """Connected clusters of table-like rows (x-overlapping, y-chained
    within _WRAP_ROW_GAP) that straddle an otherwise-clean prose column
    gutter. Returns index arrays (possibly empty list)."""
    t_idx = np.flatnonzero(table_mask)
    if len(t_idx) < _WRAP_MIN_ROWS or not (~table_mask).any():
        return []
    p = bboxes[~table_mask]
    # prose-only widest x-gap: the candidate column gutter
    gap, cut = _largest_gap(p[:, 0], p[:, 2])
    if gap < _WRAP_GUTTER_MIN:
        return []
    lp, rp = p[p[:, 0] < cut], p[p[:, 0] >= cut]
    if _n_bands(lp[:, 1]) < 2 or _n_bands(rp[:, 1]) < 2:
        return []
    # cluster the table rows: sort by top, chain while y-gap small and
    # x-ranges overlap
    order = t_idx[np.argsort(bboxes[t_idx, 1], kind="stable")]
    clusters: list[list[int]] = []
    for i in order:
        placed = False
        if clusters:
            c = clusters[-1]
            prev = bboxes[c[-1]]
            b = bboxes[i]
            if (b[1] - prev[3] <= _WRAP_ROW_GAP
                    and min(b[2], max(bboxes[j][2] for j in c))
                    > max(b[0], min(bboxes[j][0] for j in c))):
                c.append(int(i))
                placed = True
        if not placed:
            clusters.append([int(i)])
    out = []
    for c in clusters:
        if len(c) < _WRAP_MIN_ROWS:
            continue
        cb = bboxes[c]
        if _n_bands(cb[:, 1]) < _WRAP_MIN_ROWS:
            continue
        x1, x2 = float(cb[:, 0].min()), float(cb[:, 2].max())
        if x1 < cut < x2:  # the cluster bridges the prose gutter
            out.append(np.array(c, dtype=np.int64))
    return out


def reading_order(bboxes: np.ndarray,
                  table_mask: np.ndarray | None = None) -> list[int]:
    """Return indices of blocks in reading order via recursive XY-cut.

    bboxes: (n, 4) array of [x1, y1, x2, y2], top-left origin, y down.
    table_mask: optional (n,) bool array marking table-like content
    (label + numeric cells); enables (a) the content-gated narrow-gutter
    column cut (see _XGAP_MIN note) and (b) wrap-table extraction —
    gutter-bridging table-row clusters lift out, the prose orders
    column-major through the now-visible gutter, and each cluster's rows
    append as one contiguous row-major block (deterministic: clusters in
    (y, x) order — W2).
    """
    bboxes = np.asarray(bboxes, dtype=np.float64)
    if table_mask is not None and len(bboxes):
        table_mask = np.asarray(table_mask, dtype=bool)
        clusters = _wrap_table_clusters(bboxes, table_mask)
        if clusters:
            lifted = np.concatenate(clusters)
            keep = np.setdiff1d(np.arange(len(bboxes)), lifted)
            order = [int(keep[k]) for k in reading_order(
                bboxes[keep], table_mask[keep])]
            for c in sorted(clusters,
                            key=lambda c: (float(bboxes[c, 1].min()),
                                           float(bboxes[c, 0].min()))):
                order.extend(int(c[k]) for k in reading_order(
                    bboxes[c], table_mask[c]))
            return order
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
        if table_mask is not None and _XGAP_MIN < xgap <= _GAP_EPS:
            lsel = bb[:, 0] < xcut
            lm = table_mask[idx[lsel]]
            rm = table_mask[idx[~lsel]]
            if (_n_bands(bb[lsel, 1]) >= _MIN_COL_BANDS
                    and _n_bands(bb[~lsel, 1]) >= _MIN_COL_BANDS
                    and len(lm) and len(rm)):
                lt, rt = float(lm.mean()), float(rm.mean())
                if (lt >= 0.7 and rt <= 0.3) or (rt >= 0.7 and lt <= 0.3):
                    # table column beside a prose column: split rather
                    # than x-interleave them band by band
                    rec(idx[lsel])
                    rec(idx[~lsel])
                    return
        if max(xgap, ygap) <= _GAP_EPS:
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
                # chaining diffs <= _GAP_EPS is transitive: a cascade of
                # tops each within 2pt of the next could merge several
                # genuinely distinct baselines, so bound a band's total
                # y-extent to ~1.5 line heights from its first top even
                # when consecutive gaps stay under _GAP_EPS
                heights = bb[:, 3] - bb[:, 1]
                max_extent = max(2.0 * _GAP_EPS,
                                 1.5 * float(np.median(heights)))
                cur = 0
                start = ys[0]
                for j in range(1, len(ys)):
                    if (ys[j] - ys[j - 1] > _GAP_EPS
                            or ys[j] - start > max_extent):
                        cur += 1
                        start = ys[j]
                    band[j] = cur
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
