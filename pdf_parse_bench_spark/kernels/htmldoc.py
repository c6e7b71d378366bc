"""HTML/DOM extraction kernel (the M4/GROBID-analog path; north_rule:
"HTML boilerplate strip ... DOM heuristics").

The reference's structured-markup path converts GROBID TEI-XML to markdown
(parsers/grobid/__main__.py:22-90). This kernel generalizes it: parse HTML
with the stdlib parser, strip boilerplate subtrees by DOM role
(header / footer / nav / aside / script / style — the tag-level analog of
the category strip P2), walk <main>/<body> in document order, and emit the
canonical span sequence:

    <p>…</p> with embedded <span class="math">   → text / inline-formula runs
    <div class="math">$$..$$</div>               → display-formula (M7-normalized)
    <pre class="tabular">\\begin{tabular}…</pre> → table
    <img src="…">                                → image (media_ref)

Entities are unescaped symmetrically with the fixture writer's escaping.
"""

from __future__ import annotations

from html.parser import HTMLParser

from pdf_parse_bench_spark.kernels.textnorm import normalize_display_formula

BOILERPLATE_TAGS = frozenset({"header", "footer", "nav", "aside", "script", "style"})

# HTML void elements never get an end tag from html.parser, so they must not
# bump the skip depth inside a stripped boilerplate subtree — a bare <img>
# inside <header> would otherwise desync the depth and silently drop the
# rest of the document.
VOID_TAGS = frozenset({
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
})


class _SpanExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.spans: list[dict] = []
        self._skip_depth = 0
        self._mode: str | None = None  # 'p' | 'display' | 'table' | 'inline'
        self._buf: list[str] = []
        self._para_pieces: list[tuple[str, str]] = []  # (kind, payload)

    # -- helpers -----------------------------------------------------------
    def _emit(self, kind: str, text: str = "", media_ref: str = "") -> None:
        self.spans.append({"kind": kind, "text": text, "media_ref": media_ref})

    def _flush_para(self) -> None:
        for kind, payload in self._para_pieces:
            if kind == "text":
                t = payload.strip()
                if t:
                    self._emit("text", t)
            else:
                self._emit("inline-formula", payload)
        self._para_pieces = []

    # -- parser events -----------------------------------------------------
    def handle_starttag(self, tag, attrs):
        if self._skip_depth:
            if tag not in VOID_TAGS:
                self._skip_depth += 1
            return
        if tag in BOILERPLATE_TAGS:
            self._skip_depth = 1
            return
        a = dict(attrs)
        cls = (a.get("class") or "").split()
        if tag == "img":
            self._emit("image", media_ref=a.get("src", ""))
        elif tag == "p":
            self._mode = "p"
            self._para_pieces = []
            self._buf = []
        elif tag == "span" and "math" in cls and self._mode == "p":
            self._para_pieces.append(("text", "".join(self._buf)))
            self._buf = []
            self._mode = "inline"
        elif tag == "div" and "math" in cls:
            self._mode = "display"
            self._buf = []
        elif tag == "pre" and "tabular" in cls:
            self._mode = "table"
            self._buf = []

    def handle_startendtag(self, tag, attrs):
        if self._skip_depth:
            return
        if tag == "img":
            self._emit("image", media_ref=dict(attrs).get("src", ""))

    def handle_endtag(self, tag):
        if self._skip_depth:
            if tag not in VOID_TAGS:  # symmetric with handle_starttag
                self._skip_depth -= 1
            return
        if tag == "span" and self._mode == "inline":
            self._para_pieces.append(("math", "".join(self._buf).strip()))
            self._buf = []
            self._mode = "p"
        elif tag == "p" and self._mode == "p":
            self._para_pieces.append(("text", "".join(self._buf)))
            self._buf = []
            self._flush_para()
            self._mode = None
        elif tag == "div" and self._mode == "display":
            self._emit("display-formula",
                       normalize_display_formula("".join(self._buf)))
            self._buf = []
            self._mode = None
        elif tag == "pre" and self._mode == "table":
            self._emit("table", "".join(self._buf).strip())
            self._buf = []
            self._mode = None

    def handle_data(self, data):
        if self._skip_depth:
            return
        if self._mode is not None:
            self._buf.append(data)


def parse_html(html: str) -> list[dict]:
    """Parse one HTML document into ordered spans (kind, text, media_ref,
    offset)."""
    p = _SpanExtractor()
    p.feed(html)
    p.close()
    for i, s in enumerate(p.spans):
        s["offset"] = i
    return p.spans
