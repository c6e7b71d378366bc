"""Real-PDF quality gates over the reference's own pdflatex-produced corpus
(/root/reference/data/*/pdfs — PUBLIC fixture data shipped with the
reference benchmark, reference README.md:14-16):

  - no replacement characters: every glyph reachable through /Differences,
    /ToUnicode, or the AGL/CM glyph-name tables must decode
    (reference behavior = pypdf's AGL lookup, parsers/pypdf/__main__.py:30-32)
  - >=95% of ground-truth text tokens recovered across 10 docs
  - reading order: real run geometry (font-size-derived widths) keeps
    display-formula blocks contiguous and two-column pages column-major
"""

from __future__ import annotations

import json
import re
import unicodedata
from collections import Counter
from pathlib import Path

import pytest

from pdf_parse_bench_spark.kernels.pdftext import extract_pdf_text

REF = Path("/root/reference/data/2025-q4")

pytestmark = pytest.mark.skipif(
    not REF.exists(), reason="reference fixture corpus not mounted"
)


def _toks(s: str) -> list[str]:
    return re.findall(r"[A-Za-zÀ-ÿ]+", unicodedata.normalize("NFC", s))


def test_no_replacement_chars_on_reference_corpus():
    """Every glyph in the 100 pdflatex PDFs decodes (VERDICT r2 item 4)."""
    for p in sorted(REF.glob("pdfs/*.pdf")):
        txt = extract_pdf_text(p.read_bytes())
        assert "�" not in txt, f"{p.name}: {txt.count('�')} undecoded glyphs"


def test_gt_token_coverage_10_docs():
    """>=95% of ground-truth text tokens (multiset, dehyphenated) appear in
    the extraction, aggregated over the first 10 reference docs."""
    tot_hit = tot = 0
    for p in sorted(REF.glob("pdfs/*.pdf"))[:10]:
        gt = json.loads(
            (REF / "ground_truth" / f"{p.stem}.json").read_text())
        gt_text = " ".join(s["data"] for s in gt if s["type"] == "text")
        ext = re.sub(r"-\n", "", extract_pdf_text(p.read_bytes()))
        have, need = Counter(_toks(ext)), Counter(_toks(gt_text))
        tot_hit += sum(min(have[t], c) for t, c in need.items())
        tot += sum(need.values())
    assert tot_hit / tot >= 0.95, f"coverage {tot_hit}/{tot}"


def test_001_display_formula_contiguous():
    """001.pdf: the leading display-formula block (∫cos ax dx …) must come
    out contiguous — BEFORE any body prose — instead of interleaving with
    it (the r2 fixture-constant run geometry fragmented it)."""
    txt = extract_pdf_text((REF / "pdfs" / "001.pdf").read_bytes())
    prose_at = txt.index("Immense surprendre")
    for frag in ("∫", "cos", "ax dx", "cot"):
        assert txt.index(frag) < prose_at, frag


def test_002_column_major_reading_order():
    """002.pdf is two-column: hyphenated prose continuations must follow
    their own column (column-major), and column-1 openers must precede
    column-2 content."""
    txt = extract_pdf_text((REF / "pdfs" / "002.pdf").read_bytes())
    # hyphenated continuation inside one column stays adjacent-in-column
    assert txt.index("Couvrir mouvement pro-") < txt.index(
        "poser armée précéder eaux")
    assert txt.index("Paquet point embrasser intérieur al-") < txt.index(
        "ler repas")
    # column 1 opener precedes a column-2-only sentence
    assert txt.index("Attaquer matière diriger") < txt.index(
        "Doucement hésiter essayer")


def test_gt_text_span_alignment_real_pdfs():
    """The J2 fuzzy-alignment kernel (sliding-window Levenshtein, 15%
    tolerance — segment_extractor.py:628-711 semantics) must locate >=80%
    of the reference's ground-truth TEXT spans inside our extraction of
    the corresponding real PDF, aggregated over 10 docs. Deterministic:
    fixed corpus, fixed kernel. (0.797 at round 3; round 4's real
    advance metrics raised the full-text rate too — remaining misses are
    prose interrupted by inline-formula glyph runs, which the prose-only
    pdf_spans path recovers.)"""
    from pdf_parse_bench_spark.kernels.alignment import find_original_segment

    hit = tot = 0
    for p in sorted(REF.glob("pdfs/*.pdf"))[:10]:
        gt = json.loads(
            (REF / "ground_truth" / f"{p.stem}.json").read_text())
        ext = extract_pdf_text(p.read_bytes()).replace("-\n", "").replace(
            "\n", " ")
        for s in gt:
            if s["type"] != "text":
                continue
            tot += 1
            if find_original_segment(s["data"], ext) is not None:
                hit += 1
    assert hit / tot >= 0.90, f"{hit}/{tot}"


def test_pdf_spans_classifies_real_math():
    """Font-aware span classification on the real corpus: 001.pdf's
    leading display-formula block comes out as ONE display-formula span
    containing the integral, prose stays in text spans, and inline math
    appears between them (pinned structure on the fixed corpus)."""
    from pdf_parse_bench_spark.kernels.pdftext import extract_pdf_spans

    sp = extract_pdf_spans((REF / "pdfs" / "001.pdf").read_bytes())
    kinds = [s["kind"] for s in sp]
    assert "display-formula" in kinds and "inline-formula" in kinds
    first_display = next(s for s in sp if s["kind"] == "display-formula")
    assert "∫" in first_display["text"]
    assert "cos ax dx" in first_display["text"]
    # prose is never swallowed into formulas
    prose = "\n".join(s["text"] for s in sp if s["kind"] == "text")
    assert "Immense surprendre nommer malade" in prose


def test_pdf_spans_detects_tables_on_tables_corpus():
    """Numeric-row block detection: every one of the first 10 docs of the
    tables-only reference corpus yields >=1 kind='table' span, and the
    detected rows carry real cell content."""
    tdir = Path("/root/reference/data/2026-q1-tables-only")
    if not tdir.exists():
        pytest.skip("tables corpus not mounted")
    from pdf_parse_bench_spark.kernels.pdftext import extract_pdf_spans

    for p in sorted(tdir.glob("pdfs/*.pdf"))[:10]:
        sp = extract_pdf_spans(p.read_bytes())
        tables = [s for s in sp if s["kind"] == "table"]
        assert tables, p.name
        assert any(len(t["text"].split("\n")) >= 3 for t in tables), p.name


def test_pdf_spans_prose_improves_alignment():
    """Downstream utility of pdf_spans: aligning GT text spans against the
    PROSE-ONLY span text (formula runs classified out) beats the raw
    full-text rate. Round 4 lifted prose-only 0.828 -> 0.948 via real
    /Widths+TJ-kern advance metrics (two-column gutters stay clear, so
    the XY-cut keeps columns apart), the Euler/TX/Kepler math-face tags,
    and splitting wrapped-sentence fragments out of display-formula
    baselines; floor pinned at 0.94 (round 5: baseline-banded fallback + narrow-gutter column cuts), and prose-only >= full-text."""
    from pdf_parse_bench_spark.kernels.alignment import find_original_segment
    from pdf_parse_bench_spark.kernels.pdftext import extract_pdf_spans

    hit_full = hit_prose = tot = 0
    for p in sorted(REF.glob("pdfs/*.pdf"))[:10]:
        gt = json.loads(
            (REF / "ground_truth" / f"{p.stem}.json").read_text())
        raw = p.read_bytes()
        full = extract_pdf_text(raw).replace("-\n", "").replace("\n", " ")
        prose = " ".join(s["text"] for s in extract_pdf_spans(raw)
                         if s["kind"] == "text")
        prose = prose.replace("-\n", "").replace("\n", " ").replace("- ", "")
        for s in gt:
            if s["type"] != "text":
                continue
            tot += 1
            if find_original_segment(s["data"], full) is not None:
                hit_full += 1
            if find_original_segment(s["data"], prose) is not None:
                hit_prose += 1
    assert hit_prose / tot >= 0.94, f"{hit_prose}/{tot}"
    assert hit_prose >= hit_full


def test_full_text_alignment_all_corpora():
    """Full-text GT alignment floors per reference corpus (first 10
    docs each; round 5's baseline-banded no-cut fallback lifted 2025-q4
    0.888 -> 0.918; round 6's prose-gutter rescue cut + content-aware
    float lift raised tables-only 0.872 -> 0.933 with q4/formulas
    bit-identical, then the satellite band merge lifted q4 0.916 ->
    0.954 and formulas 0.924 -> 0.959; the widened numeric-cell
    signature — fractions '0/15', scientific '0.196E+02' — lifted
    tables to 0.947; the x-cut minimum-gutter margin — an accidental
    4pt in-line gap must not beat a real 3.6pt line gap — added
    +29/+24/+2 segments with one regression). First-100 rates:
    2025-q4 0.965, formulas-only 0.968, tables-only 0.949; the
    committed floors keep a regression margin on the 10-doc sample."""
    from pdf_parse_bench_spark.kernels.alignment import find_original_segment

    floors = {"2025-q4": 0.93, "2026-q1-formulas-only": 0.94,
              "2026-q1-tables-only": 0.92}
    for corpus, floor in floors.items():
        ref = Path(f"/root/reference/data/{corpus}")
        if not ref.exists():
            continue
        hit = tot = 0
        for p in sorted(ref.glob("pdfs/*.pdf"))[:10]:
            gt = json.loads(
                (ref / "ground_truth" / f"{p.stem}.json").read_text())
            ext = extract_pdf_text(p.read_bytes()).replace(
                "-\n", "").replace("\n", " ")
            for s in gt:
                if s["type"] != "text":
                    continue
                tot += 1
                hit += find_original_segment(s["data"], ext) is not None
        assert hit / tot >= floor, f"{corpus}: {hit}/{tot}"


def test_unicode_latex_map_covers_reference_gt():
    """Unicode->LaTeX coverage pin (VERDICT r4 item 9): every non-ASCII
    character appearing anywhere in the reference's ground-truth corpus
    is either in the conversion map (incl. sub/superscripts and
    combining marks) or CJK/fullwidth (pylatexenc-style pass-through is
    the documented behavior for those). An empty `unmapped` set means
    the residual-tail item is closed by measurement, not by guesswork."""
    import unicodedata

    from pdf_parse_bench_spark.kernels.textnorm import (
        COMBINING_LATEX, UNICODE_LATEX_MAP, _SUBSCRIPT_MAP,
        _SUPERSCRIPT_MAP)

    known = (set(UNICODE_LATEX_MAP) | set(_SUBSCRIPT_MAP)
             | set(_SUPERSCRIPT_MAP) | set(COMBINING_LATEX))
    unmapped = set()
    for corpus in ("2025-q4", "2026-q1-formulas-only",
                   "2026-q1-tables-only"):
        gdir = Path(f"/root/reference/data/{corpus}/ground_truth")
        if not gdir.exists():
            continue
        for gtp in sorted(gdir.glob("*.json")):
            for s in json.loads(gtp.read_text()):
                for ch in s["data"]:
                    if ord(ch) <= 127 or ch in known:
                        continue
                    name = unicodedata.name(ch, "")
                    if "CJK" in name or "FULLWIDTH" in name:
                        continue  # pass-through by design
                    unmapped.add(ch)
    assert not unmapped, sorted(f"U+{ord(c):04X}" for c in unmapped)
