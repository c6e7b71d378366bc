"""TEI-XML extraction kernel (the GROBID flavor of the M4 structured path).

The reference converts GROBID TEI output to markdown as abstract + body
(parsers/grobid/__main__.py:22-47, via grobid_tei_xml's document walker).
This kernel is that walker from scratch over stdlib ElementTree,
namespace-agnostic, emitting the canonical span sequence:

  teiHeader > profileDesc > abstract > p      → text spans (abstract first,
                                                __main__.py:40-42)
  body > div > head                           → text span (section header)
  body > div > p  (mixed content)             → text chunks → text spans;
       <formula rend="inline">x</formula>     → inline-formula "$x$"
  body > div > formula                        → display-formula
                                                (M7-normalized $$..$$)
  body > div > figure[@type='table'] > table  → table span
  body > div > figure > graphic[@url]         → image span (media_ref)
  note[@place='headnote'|'footnote']          → skipped (page chrome — the
                                                P2 strip at the markup level)
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

from pdf_parse_bench_spark.kernels.textnorm import normalize_display_formula

_NS_RE = re.compile(r"\{[^}]*\}")
_SKIP_NOTE_PLACES = frozenset({"headnote", "footnote"})


def _tag(el: ET.Element) -> str:
    return _NS_RE.sub("", el.tag)


def _text_of(el: ET.Element) -> str:
    return "".join(el.itertext())


class _Walker:
    def __init__(self) -> None:
        self.spans: list[dict] = []

    def _emit(self, kind: str, text: str = "", media_ref: str = "") -> None:
        self.spans.append({"kind": kind, "text": text, "media_ref": media_ref})

    def _emit_text(self, chunk: str | None) -> None:
        if chunk:
            t = chunk.strip()
            if t:
                self._emit("text", t)

    def paragraph(self, p: ET.Element) -> None:
        """Mixed-content <p>: interleave text chunks with inline formulas."""
        self._emit_text(p.text)
        for child in p:
            if _tag(child) == "formula":
                # inner spacing is significant in formula runs (the $..$
                # twin keeps it verbatim, kernels/htmldoc.py) — no strip
                self._emit("inline-formula", "$" + _text_of(child) + "$")
            else:  # hi/ref/other inline markup: keep its text
                self._emit_text(_text_of(child))
            self._emit_text(child.tail)

    def figure(self, fig: ET.Element) -> None:
        if fig.get("type") == "table":
            for t in fig:
                if _tag(t) == "table":
                    self._emit("table", _text_of(t).strip())
                    return
            self._emit("table", _text_of(fig).strip())
        else:
            for g in fig.iter():
                if _tag(g) == "graphic":
                    self._emit("image", media_ref=g.get("url", ""))
                    return

    def div(self, div: ET.Element) -> None:
        for child in div:
            tag = _tag(child)
            if tag == "note" and child.get("place") in _SKIP_NOTE_PLACES:
                continue
            if tag == "head":
                self._emit_text(_text_of(child))
            elif tag == "p":
                self.paragraph(child)
            elif tag == "formula":
                self._emit(
                    "display-formula",
                    normalize_display_formula("$$" + _text_of(child) + "$$"),
                )
            elif tag == "figure":
                self.figure(child)
            elif tag == "div":  # nested sections
                self.div(child)


def parse_tei(tei_xml: str) -> list[dict]:
    """Parse one TEI document into ordered spans (kind, text, media_ref,
    offset). Abstract paragraphs come first, then the body walk — the same
    document order the reference's markdown assembly uses
    (parsers/grobid/__main__.py:38-46)."""
    try:
        root = ET.fromstring(tei_xml)
    except ET.ParseError:
        return []
    w = _Walker()
    for el in root.iter():
        if _tag(el) == "abstract":
            for p in el.iter():
                if _tag(p) == "p":
                    w.paragraph(p)
            break
    for el in root.iter():
        if _tag(el) == "body":
            for child in el:
                tag = _tag(child)
                if tag == "div":
                    w.div(child)
                elif tag == "note" and child.get("place") in _SKIP_NOTE_PLACES:
                    continue
                elif tag == "p":
                    w.paragraph(child)
                elif tag == "figure":
                    w.figure(child)
            break
    for i, s in enumerate(w.spans):
        s["offset"] = i
    return w.spans
